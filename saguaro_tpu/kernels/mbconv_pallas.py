"""Fused MBConv block: expand 1x1 -> depthwise 3x3 -> SE -> project 1x1.

EfficientNetV2's MBConv stages (models/effnetv2._MBConv; the reference
engine's timm ``tf_efficientnetv2_l`` graph, Cellpose_GPU_s3fs.py:27)
expand channels 4-6x, run a depthwise 3x3 + squeeze-excite on the wide
tensor, and project back down. XLA executes that as ~6 HBM passes over
the 6x-wide mid tensor (expand write, depthwise read+write, SE-mean
read, SE-scale read+write, project read); the depthwise+SE fusions
alone held 44% of the embed device time at ~10x off the HBM roofline
(device profile, BENCH.md r3 handoff).

Wrapping ONLY the depthwise in a Pallas custom call regressed the
integrated model 2.5x — the call boundary broke XLA's layout/fusion
choices around the neighboring 1x1 convs (kernels/depthwise_pallas.py
STATUS). This kernel instead fuses the WHOLE stride-1 block, so the
custom-call boundary sits at the block's narrow (C_in/C_out) edges —
the natural HBM tensors XLA would materialize anyway:

    per grid step (nb images, all channels):
      expand:    row-loop   mid[r] = silu(bf16(x[r] @ We) + be)   (MXU)
      depthwise: row-loop   act[r] = silu(bf16(sum9 taps) + bd)   (VPU)
                            s_acc += sum_W f32(act[r])
      SE:        gate = sigmoid(f32 fc2(silu(fc1(s_acc/HW))))     (MXU)
      project:   row-loop   out[r] = bf16((act[r]*gate) @ Wp) + bp
                            [+ x[r] residual when C_in == C_out]  (MXU)

    HBM traffic per block: read x + write out (+ weights) — the wide
    mid/act tensors live in VMEM scratch only.

Numerics mirror the folded-BN XLA path (flax nn.Conv(dtype=bf16) +
nn.silu, f32 SE convs): bf16 tap/matmul products accumulated in f32,
ONE bf16 round per conv output, bias adds in bf16, sigmoids evaluated
in f32 and applied as bf16 multiplies. Tests pin the interpret-mode
kernel against the flax block at bf16 tolerance
(tests/test_mbconv_pallas.py).

Stride-1, kernel-3 blocks only — EffNetV2-L's three stride-2 MBConvs
(stage 3/5 firsts) stay on the XLA path. Non-residual stride-1 blocks
(C_in != C_out stage firsts) are supported.

Status: built during the 2026-08-18 TPU-relay outage; device A/B via
``SAGUARO_MBCONV_PALLAS=1`` + benchmarks/bench_effnet_ab.py decides the
default (see BENCH.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["mbconv_fused"]


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.lru_cache(maxsize=None)
def _mbconv_kernel(nb: int, h: int, w: int, residual: bool):
    def kernel(
        x_ref,  # (nb, h, w, cin) bf16
        we_ref,  # (cin, cmid) bf16
        be_ref,  # (1, cmid) f32
        wd_ref,  # (9, cmid) f32
        bd_ref,  # (1, cmid) f32
        w1_ref,  # (cmid, cse) f32
        b1_ref,  # (1, cse) f32
        w2_ref,  # (cse, cmid) f32
        b2_ref,  # (1, cmid) f32
        wp_ref,  # (cmid, cout) bf16
        bp_ref,  # (1, cout) f32
        out_ref,  # (nb, h, w, cout) bf16
        mid_ref,  # scratch (nb, h+2, w+2, cmid) bf16 — H/W zero-padded
        act_ref,  # scratch (nb, h, w, cmid) bf16
    ):
        cin = x_ref.shape[-1]
        cmid = we_ref.shape[-1]
        cout = wp_ref.shape[-1]

        wef = we_ref[...]  # bf16 (cin, cmid)
        be = be_ref[0, :].astype(jnp.bfloat16)
        wdf = wd_ref[...].astype(jnp.float32)  # (9, cmid)
        bd = bd_ref[0, :].astype(jnp.bfloat16)
        bp = bp_ref[0, :].astype(jnp.bfloat16)

        # zero the pad borders once (rows 0 / h+1, cols 0 / w+1)
        zrow = jnp.zeros((nb, w + 2, cmid), jnp.bfloat16)
        mid_ref[:, 0, :, :] = zrow
        mid_ref[:, h + 1, :, :] = zrow
        zcol = jnp.zeros((nb, 1, cmid), jnp.bfloat16)

        def expand_row(r, _):
            xr = x_ref[:, r, :, :].astype(jnp.bfloat16).reshape(nb * w, cin)
            mr = jax.lax.dot_general(
                xr,
                wef,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            yb = mr.astype(jnp.bfloat16).reshape(nb, w, cmid) + be
            sg = jax.nn.sigmoid(yb.astype(jnp.float32)).astype(jnp.bfloat16)
            mid_ref[:, r + 1, :, :] = jnp.concatenate(
                [zcol, yb * sg, zcol], axis=1
            )
            return 0

        jax.lax.fori_loop(0, h, expand_row, 0, unroll=False)

        def dw_row(r, s_acc):
            acc = None
            for dh in range(3):
                row = mid_ref[:, r + dh, :, :]  # (nb, w+2, cmid) bf16
                for dwi in range(3):
                    tap = row[:, dwi : dwi + w, :].astype(jnp.float32) * wdf[
                        3 * dh + dwi
                    ]
                    acc = tap if acc is None else acc + tap
            yb = acc.astype(jnp.bfloat16) + bd
            sg = jax.nn.sigmoid(yb.astype(jnp.float32)).astype(jnp.bfloat16)
            act = yb * sg
            act_ref[:, r, :, :] = act
            return s_acc + jnp.sum(act.astype(jnp.float32), axis=1)

        s0 = jnp.zeros((nb, cmid), jnp.float32)
        s_acc = jax.lax.fori_loop(0, h, dw_row, s0, unroll=False)

        # squeeze-excite in f32 (the XLA path's _SE uses f32 1x1 convs)
        s = s_acc / (h * w)  # (nb, cmid) f32
        z = jax.lax.dot_general(
            s, w1_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[0, :]
        z = z * jax.nn.sigmoid(z)  # f32 silu
        g = jax.lax.dot_general(
            z, w2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b2_ref[0, :]
        gate = jax.nn.sigmoid(g).astype(jnp.bfloat16)  # (nb, cmid)

        wpf = wp_ref[...]  # bf16 (cmid, cout)

        def project_row(r, _):
            ar = act_ref[:, r, :, :] * gate[:, None, :]  # bf16 (nb, w, cmid)
            pr = jax.lax.dot_general(
                ar.reshape(nb * w, cmid),
                wpf,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            yb = pr.astype(jnp.bfloat16).reshape(nb, w, cout) + bp
            if residual:
                yb = yb + x_ref[:, r, :, :].astype(jnp.bfloat16)
            out_ref[:, r, :, :] = yb
            return 0

        jax.lax.fori_loop(0, h, project_row, 0, unroll=False)

    return kernel


def mbconv_fused(
    x: jax.Array,
    we: jax.Array,
    be: jax.Array,
    wd: jax.Array,
    bd: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    wp: jax.Array,
    bp: jax.Array,
    *,
    nb: int | None = None,
):
    """One folded-BN stride-1 MBConv block, VMEM-resident.

    x (N, H, W, Cin) bf16; we (1,1,Cin,Cmid)|(Cin,Cmid); wd (3,3,1,Cmid);
    w1 (1,1,Cmid,Cse); w2 (1,1,Cse,Cmid); wp (1,1,Cmid,Cout); biases 1-D.
    Returns (N, H, W, Cout) bf16 = project(SE(dw(expand(x)))) [+ x when
    Cin == Cout]. ``nb`` = images per grid step (default fits scratch
    in ~48 MB VMEM).
    """
    n, h, w_, cin = x.shape
    we2 = we.reshape(-1, we.shape[-1]).astype(jnp.bfloat16)
    cmid = we2.shape[-1]
    wd9 = wd.reshape(9, cmid).astype(jnp.float32)
    w1m = w1.reshape(cmid, -1).astype(jnp.float32)
    cse = w1m.shape[-1]
    w2m = w2.reshape(cse, cmid).astype(jnp.float32)
    wp2 = wp.reshape(cmid, -1).astype(jnp.bfloat16)
    cout = wp2.shape[-1]
    residual = cin == cout

    if nb is None:
        import os

        env_nb = os.environ.get("SAGUARO_MBCONV_NB")  # device-sweep knob
        if env_nb:
            nb = int(env_nb)
        else:
            # scratch per image: mid (h+2)(w+2)cmid + act h*w*cmid, bf16
            per_image = ((h + 2) * (w_ + 2) + h * w_) * cmid * 2
            nb = max(1, min(n, (48 * 2**20) // max(per_image, 1)))
    nb = min(nb, n)
    while n % nb:
        nb -= 1

    f32 = jnp.float32
    (out,) = pl.pallas_call(
        _mbconv_kernel(nb, h, w_, residual),
        grid=(n // nb,),
        in_specs=[
            pl.BlockSpec((nb, h, w_, cin), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((cin, cmid), lambda i: (0, 0)),
            pl.BlockSpec((1, cmid), lambda i: (0, 0)),
            pl.BlockSpec((9, cmid), lambda i: (0, 0)),
            pl.BlockSpec((1, cmid), lambda i: (0, 0)),
            pl.BlockSpec((cmid, cse), lambda i: (0, 0)),
            pl.BlockSpec((1, cse), lambda i: (0, 0)),
            pl.BlockSpec((cse, cmid), lambda i: (0, 0)),
            pl.BlockSpec((1, cmid), lambda i: (0, 0)),
            pl.BlockSpec((cmid, cout), lambda i: (0, 0)),
            pl.BlockSpec((1, cout), lambda i: (0, 0)),
        ],
        out_specs=[pl.BlockSpec((nb, h, w_, cout), lambda i: (i, 0, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((n, h, w_, cout), jnp.bfloat16)],
        scratch_shapes=[
            pltpu.VMEM((nb, h + 2, w_ + 2, cmid), jnp.bfloat16),
            pltpu.VMEM((nb, h, w_, cmid), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=110 * 2**20,
        ),
        interpret=_interpret(),
    )(
        x.astype(jnp.bfloat16),
        we2,
        be.reshape(1, cmid).astype(f32),
        wd9,
        bd.reshape(1, cmid).astype(f32),
        w1m,
        b1.reshape(1, cse).astype(f32),
        w2m,
        b2.reshape(1, cmid).astype(f32),
        wp2,
        bp.reshape(1, cout).astype(f32),
    )
    return out
