"""Per-kernel attribution for the CP measurement stage + segmentation
substages, at bench.py's exact operating point (1080 px, 2 channels,
batch 8, 512-cell bound, ~289 cells/site).

Each kernel family is timed standalone (vmapped over the site batch,
result fetched as one packed array — BENCH.md relay rules). The sum of
standalone times approximates the fused program: families are separate
scan/scatter chains that XLA cannot fuse across, so attribution is
faithful to within dispatch overhead.

Usage: python benchmarks/bench_measure_families.py [measure] [segment]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

SIZE = 1080
N_CH = 2
B = 8
MAX_CELLS = 512


def _fetch(x):
    import jax

    leaves = jax.tree_util.tree_leaves(x)
    import jax.numpy as jnp

    return np.asarray(jnp.concatenate([jnp.ravel(l).astype(jnp.float32) for l in leaves]))


def timed(fn, iters=2):
    _fetch(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        _fetch(fn())
    return (time.perf_counter() - t0) / iters


def make_site():
    rng = np.random.default_rng(0)
    image = rng.integers(80, 120, (SIZE, SIZE, N_CH)).astype(np.float32)
    labels = np.zeros((SIZE, SIZE), np.int32)
    yy, xx = np.meshgrid(np.arange(SIZE), np.arange(SIZE), indexing="ij")
    k = 0
    for cy in range(60, SIZE - 20, 64):
        for cx in range(60, SIZE - 20, 64):
            k += 1
            m = (yy - cy) ** 2 + (xx - cx) ** 2 <= 20**2
            labels[m] = k
            image[m, 0] += 2000.0
            image[m, 1] += 500.0
    return image, labels, k


def bench_measure():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from saguaro_tpu.kernels.glcm import haralick_features, object_glcm
    from saguaro_tpu.kernels.moments import moments_features
    from saguaro_tpu.kernels.morphology import (
        expand_labels,
        granularity_spectrum,
        propagate_labels,
        tertiary_objects,
    )
    from saguaro_tpu.kernels.multichannel import (
        edge_intensity_multichannel,
        multichannel_stats,
        radial_distribution_multichannel,
    )
    from saguaro_tpu.kernels.objects_extra import (
        neighbor_features,
        quantile_intensity_features,
    )
    from saguaro_tpu.kernels.segment_reduce import euler_numbers, shape_features
    from saguaro_tpu.kernels.shape_extra import convex_features, radius_features
    from saguaro_tpu.kernels.zernike import zernike_features
    from saguaro_tpu.pipeline.features import otsu_threshold

    image, labels, k = make_site()
    images = jnp.asarray(np.stack([image] * B))
    labs = jnp.asarray(np.stack([labels] * B))
    body = jnp.mean(images[..., 1:], axis=-1)

    results = {}

    def rec(name, fn, *args, iters=2):
        # inputs are jit ARGUMENTS — closure capture bakes them into the
        # HLO as constants and lets XLA constant-fold, corrupting timings
        try:
            jf = jax.jit(fn)
            dt = timed(lambda: jf(*args), iters)
            results[name] = round(dt / B, 4)
            print(json.dumps({"family": name, "s_per_site": results[name]}), flush=True)
        except Exception as e:  # keep profiling even if one family breaks
            print(json.dumps({"family": name, "error": f"{type(e).__name__}: {e}"}), flush=True)

    vm = jax.vmap

    rec("otsu", lambda b: vm(otsu_threshold)(b), body)
    thr = vm(otsu_threshold)(body)
    rec(
        "propagate_labels_24it",
        lambda l, b2, t: jnp.sum(
            vm(lambda li, bi, ti: propagate_labels(li, bi, ti, iterations=24))(l, b2, t)
        ),
        labs, body, thr,
    )
    cells = vm(lambda l, b2, t: propagate_labels(l, b2, t, iterations=24))(labs, body, thr)
    rec("tertiary", lambda c, l: jnp.sum(vm(tertiary_objects)(c, l)), cells, labs)

    # one object set (x3 for the full program)
    rec("shape", lambda l: vm(lambda li: shape_features(li, MAX_CELLS))(l), labs)
    rec("euler", lambda l: vm(lambda li: euler_numbers(li, MAX_CELLS))(l), labs)
    rec("radius", lambda l: vm(lambda li: radius_features(li, MAX_CELLS, 48))(l), labs)
    rec("convex", lambda l: vm(lambda li: convex_features(li, MAX_CELLS, 72))(l), labs)
    rec("moments", lambda l: vm(lambda li: moments_features(li, MAX_CELLS))(l), labs)
    rec("zernike", lambda l: vm(lambda li: zernike_features(li, MAX_CELLS))(l), labs)
    rec("neighbors", lambda l: vm(lambda li: neighbor_features(li, MAX_CELLS, 5))(l), labs)
    rec(
        "quantiles_1ch",
        lambda im, l: vm(lambda i, li: quantile_intensity_features(i, li, MAX_CELLS))(im, l),
        images[..., 0], labs,
    )
    rec(
        "glcm_haralick_1ch",
        lambda im, l: vm(
            lambda i, li: haralick_features(object_glcm(i, li, MAX_CELLS, 16, 3))
        )(im, l),
        images[..., 0], labs,
    )
    rec(
        "multichannel_stats",
        lambda im, l: vm(lambda i, li: multichannel_stats(i, li, MAX_CELLS))(im, l),
        images, labs,
    )
    rec(
        "edge_mc",
        lambda im, l: vm(lambda i, li: edge_intensity_multichannel(i, li, MAX_CELLS))(im, l),
        images, labs,
    )
    rec(
        "radial_mc",
        lambda im, l: vm(
            lambda i, li: radial_distribution_multichannel(i, li, MAX_CELLS, 4)
        )(im, l),
        images, labs,
    )
    rec(
        "granularity_1ch",
        lambda im: vm(lambda i: granularity_spectrum(i, 16))(im),
        images[..., 0],
    )

    per_obj = sum(
        results.get(n, 0.0)
        for n in (
            "shape",
            "euler",
            "radius",
            "convex",
            "moments",
            "zernike",
            "neighbors",
            "multichannel_stats",
            "edge_mc",
            "radial_mc",
        )
    )
    per_ch_per_obj = sum(
        results.get(n, 0.0) for n in ("quantiles_1ch", "glcm_haralick_1ch")
    )
    derive = sum(
        results.get(n, 0.0) for n in ("otsu", "propagate_labels_24it", "tertiary")
    )
    est = derive + 3 * per_obj + 3 * N_CH * per_ch_per_obj + N_CH * results.get(
        "granularity_1ch", 0.0
    )
    print(
        json.dumps(
            {
                "family": "ESTIMATED_TOTAL",
                "s_per_site": round(est, 3),
                "note": "derive + 3*per_object + 3*C*per_channel + C*granularity",
            }
        ),
        flush=True,
    )


def bench_segment():
    import jax
    import jax.numpy as jnp

    from saguaro_tpu.pipeline.segment_embed import SegmentEmbedConfig, SegmentEmbedEngine
    from saguaro_tpu.models.cellpose import segment_image_batch
    from saguaro_tpu.kernels.flow_ode import (
        _masks_batch,
        compute_masks_batch,
        fill_label_holes,
        flow_qc_error,
        relabel_consecutive,
    )

    image, labels, k = make_site()
    batch = np.stack([image] * B)
    cfg = SegmentEmbedConfig(channels=["DNA", "GFP"], diameter=100.0)
    engine = SegmentEmbedEngine(cfg, seed=0)

    def net_fwd():
        flows, cellprob = segment_image_batch(
            engine.cell_model.apply,
            engine.cell_vars,
            jnp.asarray(batch),
            cfg.cellpose,
            diameter=cfg.diameter,
            at_network_resolution=True,
            n_seg=2,
        )
        return flows

    t_net = timed(net_fwd) / B
    print(json.dumps({"stage": "net_fwd+resize", "s_per_site": round(t_net, 4)}), flush=True)

    flows, cellprob = segment_image_batch(
        engine.cell_model.apply,
        engine.cell_vars,
        jnp.asarray(batch),
        cfg.cellpose,
        diameter=cfg.diameter,
        at_network_resolution=True,
        n_seg=2,
    )
    flows_np = np.asarray(flows)
    prob_np = np.asarray(cellprob)

    def masks_dev():
        return _masks_batch(
            jnp.asarray(flows_np, jnp.float32) / 5.0,
            jnp.asarray(prob_np) > cfg.cellprob_threshold,
            cfg.flow_iters,
            10.0,
            5,
            "pointer",
        )

    t_masks = timed(masks_dev) / B
    print(json.dumps({"stage": "flow_recovery_device", "s_per_site": round(t_masks, 4)}), flush=True)

    labels_low = compute_masks_batch(
        flows_np, prob_np, cellprob_threshold=cfg.cellprob_threshold,
        n_iters=cfg.flow_iters, min_size=1,
    )

    def qc_per_site():
        out = []
        for i, lab in enumerate(labels_low):
            err, cnt = flow_qc_error(
                jnp.asarray(lab), jnp.asarray(flows_np[i] / 5.0), max_cells=cfg.max_cells
            )
            out.append(np.asarray(err))
        return np.stack(out)

    t0 = time.perf_counter()
    qc_per_site()
    t_qc = (time.perf_counter() - t0)
    t0 = time.perf_counter()
    qc_per_site()
    t_qc = (time.perf_counter() - t0) / B
    print(json.dumps({"stage": "flow_qc_per_site_loop", "s_per_site": round(t_qc, 4)}), flush=True)

    t0 = time.perf_counter()
    for lab in labels_low:
        fill_label_holes(np.asarray(lab))
    t_fill = (time.perf_counter() - t0) / B
    print(json.dumps({"stage": "fill_holes_host", "s_per_site": round(t_fill, 4)}), flush=True)

    t0 = time.perf_counter()
    for lab in labels_low:
        relabel_consecutive(np.asarray(lab), min_size=1)
    t_rl = (time.perf_counter() - t0) / B
    print(json.dumps({"stage": "relabel_host", "s_per_site": round(t_rl, 4)}), flush=True)

    def full():
        out = engine.segment_batch(batch)
        return np.asarray(jnp.stack([jnp.max(jnp.asarray(l)) for l in out]))

    t_full = timed(full) / B
    print(json.dumps({"stage": "segment_batch_full", "s_per_site": round(t_full, 4)}), flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["measure", "segment"]
    if "measure" in which:
        bench_measure()
    if "segment" in which:
        bench_segment()
