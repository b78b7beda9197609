"""Pass-level attribution of the fused measurement program's base cost
(bisect MINIMAL = objects + shape + intensity + corr + granularity) at
bench.py's operating point: 1080 px, 2 ch, batch 8, 512-cell bound.

Times each internal pass of kernels/fused_measure.fused_object_features
standalone (vmapped over the site batch, one packed fetch), plus the
object-derivation and image-level stages that make up MINIMAL. The sum
won't equal the in-program MINIMAL (XLA shares subexpressions across
passes), but the ranking tells us where the remaining s/site lives.

Usage: python benchmarks/bench_measure_passes.py [pass ...]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

B, SIZE, CELLS, N_CH = 8, 1080, 512, 2


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from saguaro_tpu.kernels.fused_measure import _lane_scan
    from saguaro_tpu.kernels.morphology import (
        granularity_spectrum,
        propagate_labels,
        tertiary_objects,
    )
    from saguaro_tpu.kernels.segment_reduce import euler_numbers
    from saguaro_tpu.pipeline.features import otsu_threshold

    rng = np.random.default_rng(0)
    image_np = rng.integers(80, 120, (B, SIZE, SIZE, N_CH)).astype(np.float32)
    labels_np = np.zeros((B, SIZE, SIZE), np.int32)
    yy, xx = np.meshgrid(np.arange(SIZE), np.arange(SIZE), indexing="ij")
    k = 0
    for cy in range(60, SIZE - 20, 64):
        for cx in range(60, SIZE - 20, 64):
            k += 1
            m = (yy - cy) ** 2 + (xx - cx) ** 2 <= 20**2
            labels_np[:, m] = k
            image_np[:, m, 0] += 2000.0
    images = jnp.asarray(image_np)
    labs = jnp.asarray(labels_np)

    def timed(jf, *args, iters=3):
        def fetch():
            out = jf(*args)
            leaves = jax.tree_util.tree_leaves(out)
            return np.asarray(
                jnp.concatenate([jnp.ravel(l).astype(jnp.float32) for l in leaves])
            )

        fetch()
        t0 = time.perf_counter()
        for _ in range(iters):
            fetch()
        return (time.perf_counter() - t0) / iters / B

    def rec(name, fn, *args):
        try:
            dt = timed(jax.jit(fn), *args)
            print(json.dumps({"pass": name, "s_per_site": round(dt, 4)}), flush=True)
        except Exception as e:
            print(json.dumps({"pass": name, "error": f"{type(e).__name__}: {e}"}), flush=True)

    want = set(sys.argv[1:])
    vm = jax.vmap

    def pick(name):
        return not want or name in want

    # --- object derivation ---
    if pick("otsu"):
        rec("otsu", lambda im: vm(otsu_threshold)(jnp.mean(im[..., 1:], axis=-1)), images)
    if pick("propagation"):
        def prop(im, l):
            body = jnp.mean(im[..., 1:], axis=-1)
            thr = otsu_threshold(body)
            return propagate_labels(l, body, thr, iterations=24)
        rec("propagation", lambda im, l: vm(prop)(im, l), images, labs)

    # --- fused passes, replicated standalone per object set count ---
    def base_arrays(l):
        h, w = l.shape
        flat = l.reshape(-1).astype(jnp.int32)
        seg = jnp.where((flat > 0) & (flat < CELLS), flat, 0)
        inside = (flat > 0).astype(jnp.float32)
        yy2, xx2 = jnp.meshgrid(
            jnp.arange(h, dtype=jnp.float32),
            jnp.arange(w, dtype=jnp.float32),
            indexing="ij",
        )
        return seg, inside, yy2.reshape(-1), xx2.reshape(-1)

    def pass_a(im, l):
        seg, inside, yf, xf = base_arrays(l)
        pad = jnp.pad(l.astype(jnp.int32), 1, constant_values=0)
        boundary = (
            (pad[:-2, 1:-1] != l) | (pad[2:, 1:-1] != l)
            | (pad[1:-1, :-2] != l) | (pad[1:-1, 2:] != l)
        ) & (l > 0)
        boundary = boundary.reshape(-1).astype(jnp.float32)
        vr = im.reshape(-1, N_CH)

        def lanes(seg_c, in_c, y_c, x_c, b_c, vr_c):
            v_c = vr_c * in_c[:, None]
            cols = [in_c, y_c * in_c, x_c * in_c, b_c, v_c,
                    y_c[:, None] * v_c, x_c[:, None] * v_c, vr_c * b_c[:, None]]
            return jnp.concatenate(
                [c if c.ndim == 2 else c[:, None] for c in cols], axis=1
            )

        return _lane_scan(seg, [inside, yf, xf, boundary, vr], lanes,
                          4 + 4 * N_CH, CELLS)

    if pick("pass_a_x3"):
        rec("pass_a_x3", lambda im, l: [vm(pass_a)(im, l) for _ in range(3)], images, labs)

    def pass_c2_lite(im, l):
        # central moments + var + cross only (the MINIMAL subset of C2)
        seg, inside, yf, xf = base_arrays(l)
        vr = im.reshape(-1, N_CH)
        cnt = jax.ops.segment_sum(inside, seg, num_segments=CELLS)
        denom = jnp.maximum(cnt, 1.0)
        cy = jax.ops.segment_sum(yf * inside, seg, num_segments=CELLS) / denom
        cx = jax.ops.segment_sum(xf * inside, seg, num_segments=CELLS) / denom
        mean = jnp.stack(
            [jax.ops.segment_sum(vr[:, c] * inside, seg, num_segments=CELLS) / denom
             for c in range(N_CH)], axis=1)

        def lanes(seg_c, in_c, y_c, x_c, vr_c):
            dy = (y_c - jnp.take(cy, seg_c)) * in_c
            dx = (x_c - jnp.take(cx, seg_c)) * in_c
            cols = [dy * dy, dy * dx, dx * dx]
            vc = (vr_c - jnp.take(mean, seg_c, axis=0)) * in_c[:, None]
            cols.append(vc * vc)
            cols.append((vc[:, 0] * vc[:, 1])[:, None])
            return jnp.concatenate(
                [c if c.ndim == 2 else c[:, None] for c in cols], axis=1
            )

        return _lane_scan(seg, [inside, yf, xf, vr], lanes, 3 + N_CH + 1, CELLS)

    if pick("pass_c2lite_x3"):
        rec("pass_c2lite_x3", lambda im, l: [vm(pass_c2_lite)(im, l) for _ in range(3)], images, labs)

    def pass_b(im, l):
        seg, inside, yf, xf = base_arrays(l)
        inside_m = inside > 0
        vr = im.reshape(-1, N_CH)
        big = jnp.float32(3.4e38)
        lanes = [
            jnp.where(inside_m, yf, big)[:, None],
            jnp.where(inside_m, xf, big)[:, None],
            jnp.where(inside_m[:, None], vr, big),
        ]
        mins = jax.ops.segment_min(
            jnp.concatenate(lanes, axis=1), seg, num_segments=CELLS
        )
        maxs = jax.ops.segment_max(
            jnp.concatenate([-x for x in lanes], axis=1), seg, num_segments=CELLS
        )
        return mins, maxs

    if pick("pass_b_x3"):
        rec("pass_b_x3", lambda im, l: [vm(pass_b)(im, l) for _ in range(3)], images, labs)

    if pick("granularity"):
        rec(
            "granularity_2ch",
            lambda im: [vm(lambda i: granularity_spectrum(i[..., c]))(im) for c in range(N_CH)],
            images,
        )
    if pick("euler_x3"):
        rec("euler_x3", lambda l: [vm(lambda li: euler_numbers(li, CELLS))(l) for _ in range(3)], labs)
    if pick("tertiary"):
        rec("tertiary", lambda l: vm(lambda li: tertiary_objects(li, li))(l), labs)

    # one-hot construction cost in isolation: a do-nothing lane scan
    def onehot_only(l):
        seg, inside, yf, xf = base_arrays(l)
        return _lane_scan(seg, [inside], lambda s, i: i[:, None], 1, CELLS)

    if pick("onehot_only_x3"):
        rec("onehot_only_x3", lambda l: [vm(onehot_only)(l) for _ in range(3)], labs)


if __name__ == "__main__":
    main()


def variant_mxutake():
    """pass_c2lite with jnp.take replaced by hi/lo one-hot matmul-takes
    reusing the contraction's label one-hot — run separately."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import time, json

    rng = np.random.default_rng(0)
    image_np = rng.integers(80, 120, (B, SIZE, SIZE, N_CH)).astype(np.float32)
    labels_np = np.zeros((B, SIZE, SIZE), np.int32)
    yy, xx = np.meshgrid(np.arange(SIZE), np.arange(SIZE), indexing="ij")
    k = 0
    for cy0 in range(60, SIZE - 20, 64):
        for cx0 in range(60, SIZE - 20, 64):
            k += 1
            m = (yy - cy0) ** 2 + (xx - cx0) ** 2 <= 20**2
            labels_np[:, m] = k
            image_np[:, m, 0] += 2000.0
    images = jnp.asarray(image_np)
    labs = jnp.asarray(labels_np)

    def c2lite_mxu(im, l):
        h, w = l.shape
        flat = l.reshape(-1).astype(jnp.int32)
        seg = jnp.where((flat > 0) & (flat < CELLS), flat, 0)
        inside = (flat > 0).astype(jnp.float32)
        yy2, xx2 = jnp.meshgrid(
            jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
            indexing="ij")
        yf, xf = yy2.reshape(-1), xx2.reshape(-1)
        vr = im.reshape(-1, N_CH)
        cnt = jax.ops.segment_sum(inside, seg, num_segments=CELLS)
        denom = jnp.maximum(cnt, 1.0)
        cyv = jax.ops.segment_sum(yf * inside, seg, num_segments=CELLS) / denom
        cxv = jax.ops.segment_sum(xf * inside, seg, num_segments=CELLS) / denom
        mean = jnp.stack(
            [jax.ops.segment_sum(vr[:, c] * inside, seg, num_segments=CELLS) / denom
             for c in range(N_CH)], axis=1)
        table = jnp.concatenate([cyv[:, None], cxv[:, None], mean], axis=1)  # (C, 2+n_ch)
        t_hi = table.astype(jnp.bfloat16)
        t_lo = (table - t_hi.astype(jnp.float32)).astype(jnp.bfloat16)

        chunk = 32768
        n = seg.shape[0]
        n_pad = (-n) % chunk
        seg_f = jnp.pad(seg, (0, n_pad))
        in_f = jnp.pad(inside, (0, n_pad))
        y_f = jnp.pad(yf, (0, n_pad))
        x_f = jnp.pad(xf, (0, n_pad))
        vr_f = jnp.pad(vr, ((0, n_pad), (0, 0)))
        n_chunks = (n + n_pad) // chunk

        def body(s, idx):
            sl = idx * chunk
            seg_c = jax.lax.dynamic_slice_in_dim(seg_f, sl, chunk)
            in_c = jax.lax.dynamic_slice_in_dim(in_f, sl, chunk)
            y_c = jax.lax.dynamic_slice_in_dim(y_f, sl, chunk)
            x_c = jax.lax.dynamic_slice_in_dim(x_f, sl, chunk)
            vr_c = jax.lax.dynamic_slice_in_dim(vr_f, sl, chunk)
            lab_oh = jax.nn.one_hot(seg_c, CELLS, dtype=jnp.bfloat16)
            dotg = lambda t: jax.lax.dot_general(
                lab_oh, t, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            g = dotg(t_hi) + dotg(t_lo)  # (chunk, 2+n_ch) matmul-take
            dy = (y_c - g[:, 0]) * in_c
            dx = (x_c - g[:, 1]) * in_c
            cols = [dy * dy, dy * dx, dx * dx]
            vc = (vr_c - g[:, 2:]) * in_c[:, None]
            cols.append(vc * vc)
            cols.append((vc[:, 0] * vc[:, 1])[:, None])
            payload = jnp.concatenate(
                [c if c.ndim == 2 else c[:, None] for c in cols], axis=1
            ).astype(jnp.float32)
            hi = payload.astype(jnp.bfloat16)
            lo = (payload - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            dot = lambda v: jax.lax.dot_general(
                lab_oh, v, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return s + dot(hi) + dot(lo), None

        s0 = jnp.zeros((CELLS, 3 + N_CH + 1), jnp.float32)
        s, _ = jax.lax.scan(body, s0, jnp.arange(n_chunks))
        return s

    jf = jax.jit(lambda im, l: [jax.vmap(c2lite_mxu)(im, l) for _ in range(3)])

    def fetch():
        out = jf(images, labs)
        leaves = jax.tree_util.tree_leaves(out)
        return np.asarray(
            jnp.concatenate([jnp.ravel(x).astype(jnp.float32) for x in leaves]))

    fetch()
    t0 = time.perf_counter()
    for _ in range(3):
        fetch()
    dt = (time.perf_counter() - t0) / 3 / B
    print(json.dumps({"pass": "pass_c2lite_mxutake_x3", "s_per_site": round(dt, 4)}), flush=True)
