"""Pallas depthwise 3x3 conv + bias + SiLU + SE channel means.

EfficientNetV2's MBConv stages run a 3x3 depthwise convolution between
the expand and project 1x1 convs (models/effnetv2.py:191, the reference
engine's timm ``tf_efficientnetv2_l`` graph). XLA:TPU lowers the grouped
conv poorly: device-profiled at the embed op point (chunk 128, 480
input), the depthwise+SE-mean fusions hold 3.85 s of the 8.7 s/batch
embed device time (44%) at ~10x off the HBM roofline — e.g. 1.78 ms for
a [128,30,30,1344] block whose read+write traffic is ~0.62 GB
(~0.76 ms at 819 GB/s), with the MXU idle throughout.

This kernel computes the whole depthwise epilogue VMEM-resident in one
HBM pass per tensor:

    y = bf16( silu( bf16(conv_f32_accum) + bf16(bias) ) )
    s = mean over (H, W) of f32(y)          (the SE squeeze input)

Numerics mirror the XLA path (flax nn.Conv(dtype=bf16, use_bias=True) +
nn.silu): 9 exact bf16->f32 tap products accumulated in f32, ONE bf16
round of the conv output, bf16 bias add, sigmoid evaluated in f32 and
applied as a bf16 multiply. Differences vs XLA are <=1-2 bf16 ulp (XLA's
grouped-conv accumulation order differs); tests pin the interpret-mode
kernel against the lax.conv reference at bf16 tolerance.

Stride-1 SAME only — EffNetV2-L's two stride-2 depthwise blocks (stage
3/5 firsts) stay on the XLA path (2 of 61 blocks).

STATUS: OPT-IN (``SAGUARO_DW_PALLAS=1``), off by default. The whole
model with this kernel at all 57 dispatch sites regressed embed
1.125 -> 2.81 s/site on the integrated bench (BENCH.md r3 handoff):
the custom-call boundaries around each depthwise break XLA's
layout/fusion choices for the surrounding 1x1 convs, costing far more
than the kernel saves. benchmarks/bench_effnet_ab.py is the whole-model
A/B that would justify flipping the default.

Formulations (device-swept 2026-08-18, benchmarks/bench_dw_sweep.py):

``variant="block"``: whole (nb, H, W, cb) block per grid step, 9
unrolled tap FMAs. The W-direction taps are sublane-misaligned slices;
the block-sized f32 temporaries stream through VMEM (the values are far
larger than the vector register file), so each tap is a full VMEM
read+write pass — measured 36-80 GB/s HBM-equivalent at every block
size tried (roofline ~819), no better than XLA's in-model fused
grouped conv. Kept as the fallback/reference formulation.

``variant="rows"``: fori_loop over output rows; the three input rows
ride the loop carry (each row is read from VMEM once), the 9 tap FMAs
run on (nb, W+2, cb) row values small enough for the register file, and
the SE mean accumulates in a carried (nb, cb) f32 vector. W-taps are
still sublane slices but on row-sized values.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["dw3x3_silu"]


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _cdiv(a: int, b: int) -> int:
    return (a + b - 1) // b


@functools.lru_cache(maxsize=None)
def _dw_kernel_block(nb: int, h: int, w: int, cb: int):
    def kernel(x_ref, w_ref, b_ref, y_ref, s_ref):
        # zero-padded (nb, h+2, w+2, cb) input in VMEM, kept bf16;
        # pre-shift the W direction ONCE (3 sublane relayouts instead
        # of 9 shifted tap slices)
        xp = jnp.pad(
            x_ref[...], ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=0
        )
        xs = [xp[:, :, dw : dw + w, :] for dw in range(3)]
        acc = None
        for t in range(9):
            dh, dw = divmod(t, 3)
            tap = xs[dw][:, dh : dh + h, :, :].astype(jnp.float32) * w_ref[
                t, :
            ].astype(jnp.float32)
            acc = tap if acc is None else acc + tap
        yb = acc.astype(jnp.bfloat16) + b_ref[0, :].astype(jnp.bfloat16)
        sg = jax.nn.sigmoid(yb.astype(jnp.float32)).astype(jnp.bfloat16)
        act = yb * sg
        y_ref[...] = act
        # (nb, 1, cb) block of the (N, 1, C) means — Mosaic wants the
        # block's last two dims (8k, 128k)-divisible OR equal to the
        # array dims, which a (nb, cb) 2D block violates at small nb
        s_ref[...] = (
            jnp.sum(act.astype(jnp.float32), axis=(1, 2)) / (h * w)
        )[:, None, :]

    return kernel


@functools.lru_cache(maxsize=None)
def _dw_kernel_rows(nb: int, h: int, w: int, cb: int):
    def kernel(x_ref, w_ref, b_ref, y_ref, s_ref):
        wf = w_ref[...].astype(jnp.float32)  # (9, cb)
        bias = b_ref[0, :].astype(jnp.bfloat16)  # (cb,)
        zrow = jnp.zeros((nb, w + 2, cb), jnp.bfloat16)

        def row(r):
            # input row r-1 of the UNPADDED (nb, h, w+2, cb) block
            # (W is padded in HBM by the caller; H pads are zrow)
            return x_ref[:, r, :, :]

        def body(r, carry):
            r1, r2, s_acc = carry
            r3 = jax.lax.cond(r + 1 < h, lambda: row(r + 1), lambda: zrow)
            acc = None
            for dh, rr in enumerate((r1, r2, r3)):
                for dw in range(3):
                    tap = rr[:, dw : dw + w, :].astype(jnp.float32) * wf[
                        3 * dh + dw
                    ]
                    acc = tap if acc is None else acc + tap
            yb = acc.astype(jnp.bfloat16) + bias
            sg = jax.nn.sigmoid(yb.astype(jnp.float32)).astype(jnp.bfloat16)
            act = yb * sg
            y_ref[:, r, :, :] = act
            s_acc = s_acc + jnp.sum(act.astype(jnp.float32), axis=1)
            return r2, r3, s_acc

        s0 = jnp.zeros((nb, cb), jnp.float32)
        _, _, s_acc = jax.lax.fori_loop(0, h, body, (zrow, row(0), s0))
        s_ref[...] = (s_acc / (h * w))[:, None, :]

    return kernel


def dw3x3_silu(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array,
    *,
    nb: int | None = None,
    cb: int | None = None,
    variant: str = "rows",
):
    """(N, H, W, C) bf16 x + (3, 3, 1, C) f32 w + (C,) f32 b ->
    (y (N, H, W, C) bf16, s (N, C) f32) with
    y = silu(depthwise3x3_SAME(x, w) + b), s = mean_{H,W} f32(y).

    ``nb``/``cb`` override the images/channels per grid step; see the
    module docstring for the ``variant`` formulations.
    """
    n, h, ww, c = x.shape
    x = x.astype(jnp.bfloat16)
    w9 = w.reshape(9, c).astype(jnp.float32)
    b2 = b.reshape(1, c).astype(jnp.float32)

    if variant == "rows":
        if cb is None:
            cb = min(c, 256)
        cb = min(cb, c)
        if nb is None:
            nb = 8
        nb = min(nb, n)
        while n % nb:
            nb -= 1
        # W zero-padded in HBM (fused into the producer by XLA); H pads
        # are synthesized in-kernel so the block stays (nb, h, w+2, cb)
        xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
        y, s = pl.pallas_call(
            _dw_kernel_rows(nb, h, ww, cb),
            grid=(n // nb, _cdiv(c, cb)),
            in_specs=[
                pl.BlockSpec((nb, h, ww + 2, cb), lambda i, j: (i, 0, 0, j)),
                pl.BlockSpec((9, cb), lambda i, j: (0, j)),
                pl.BlockSpec((1, cb), lambda i, j: (0, j)),
            ],
            out_specs=[
                pl.BlockSpec((nb, h, ww, cb), lambda i, j: (i, 0, 0, j)),
                pl.BlockSpec((nb, 1, cb), lambda i, j: (i, 0, j)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n, h, ww, c), jnp.bfloat16),
                jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=100 * 2**20,
            ),
            interpret=_interpret(),
        )(xp, w9, b2)
        return y, s[:, 0, :]

    if cb is None:
        cb = min(c, 384)
    cb = min(cb, c)
    if nb is None:
        # scoped-VMEM temps per image per step (validated against
        # Mosaic's own accounting: it reported 67.4 MB for a
        # (8, 30, 30, 768) block ≈ this formula's 8.4 MB/image): bf16
        # padded copy + f32 accumulator + ~2 f32 tap/sigmoid temps.
        per_image = (h + 2) * (ww + 2) * cb * 2 + h * ww * cb * (4 + 4 + 2)
        nb = max(1, min(n, (40 * 2**20) // max(per_image, 1)))
    nb = min(nb, n)
    while n % nb:
        nb -= 1

    y, s = pl.pallas_call(
        _dw_kernel_block(nb, h, ww, cb),
        grid=(n // nb, _cdiv(c, cb)),
        # the default 16 MB scoped-vmem limit caps blocks at the
        # grid-overhead-bound sizes this kernel exists to escape
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 2**20,
        ),
        in_specs=[
            pl.BlockSpec((nb, h, ww, cb), lambda i, j: (i, 0, 0, j)),
            pl.BlockSpec((9, cb), lambda i, j: (0, j)),
            pl.BlockSpec((1, cb), lambda i, j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((nb, h, ww, cb), lambda i, j: (i, 0, 0, j)),
            pl.BlockSpec((nb, 1, cb), lambda i, j: (i, 0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h, ww, c), jnp.bfloat16),
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
        ],
        interpret=_interpret(),
    )(x, w9, b2)
    return y, s[:, 0, :]
