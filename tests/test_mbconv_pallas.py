"""Fused MBConv Pallas block vs the per-op flax path.

On CPU the kernel runs in Pallas interpreter mode; on TPU the same code
compiles through Mosaic. The reference is exactly what the folded-BN
``_MBConv`` XLA branch computes (expand 1x1 + silu -> depthwise 3x3 +
silu -> SE -> project 1x1 [+ residual]) — agreement to small bf16
reround noise (accumulation orders differ inside the convs).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from saguaro_tpu.kernels.mbconv_pallas import mbconv_fused
from saguaro_tpu.models.effnetv2 import (
    EffNetV2,
    EffNetV2Config,
    StageSpec,
    _MBConv,
    fold_batchnorm,
    init_effnetv2,
)


def _folded_block(spec, x_shape, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=x_shape).astype(np.float32)).astype(
        jnp.bfloat16
    )
    block = _MBConv(spec, 1, jnp.bfloat16, fold_bn=False)
    variables = block.init(jax.random.PRNGKey(seed), x)
    folded = fold_batchnorm(variables)
    fblock = _MBConv(spec, 1, jnp.bfloat16, fold_bn=True)
    return fblock, folded, x


@pytest.mark.parametrize(
    "cin,expand,n,h",
    [
        (16, 4, 2, 10),   # residual (cin == filters)
        (16, 6, 3, 9),    # odd sizes
    ],
)
def test_fused_block_matches_flax(monkeypatch, cin, expand, n, h):
    spec = StageSpec("mbconv", expand, 3, 1, cin, 1, 0.25)
    fblock, folded, x = _folded_block(spec, (n, h, h, cin))
    monkeypatch.delenv("SAGUARO_MBCONV_PALLAS", raising=False)
    ref = np.asarray(fblock.apply(folded, x), np.float32)
    monkeypatch.setenv("SAGUARO_MBCONV_PALLAS", "1")
    out = np.asarray(fblock.apply(folded, x), np.float32)
    scale = max(1.0, float(np.abs(ref).max()))
    np.testing.assert_allclose(out, ref, atol=3 * 0.0078125 * scale)


def test_fused_block_non_residual(monkeypatch):
    """Stage-first stride-1 block: cin != filters -> no residual add."""
    spec = StageSpec("mbconv", 4, 3, 1, 24, 1, 0.25)
    fblock, folded, x = _folded_block(spec, (2, 8, 8, 16))
    monkeypatch.delenv("SAGUARO_MBCONV_PALLAS", raising=False)
    ref = np.asarray(fblock.apply(folded, x), np.float32)
    monkeypatch.setenv("SAGUARO_MBCONV_PALLAS", "1")
    out = np.asarray(fblock.apply(folded, x), np.float32)
    assert out.shape == (2, 8, 8, 24)
    scale = max(1.0, float(np.abs(ref).max()))
    np.testing.assert_allclose(out, ref, atol=3 * 0.0078125 * scale)


def test_fused_model_end_to_end(monkeypatch):
    """The tiny folded model routes its MBConv stage through the fused
    kernel under SAGUARO_MBCONV_PALLAS and reproduces the XLA path."""
    monkeypatch.delenv("SAGUARO_MBCONV_PALLAS", raising=False)
    cfg = EffNetV2Config(
        stem_filters=8,
        stages=(
            StageSpec("fused", 1, 3, 1, 8, 1),
            StageSpec("mbconv", 4, 3, 1, 16, 2, 0.25),
        ),
        head_filters=32,
        input_size=24,
        compute_dtype="bfloat16",
    )
    _, variables = init_effnetv2(cfg, seed=0, init_size=24)
    folded = fold_batchnorm(variables)
    fcfg = dataclasses.replace(cfg, fold_bn=True)
    model = EffNetV2(fcfg)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 24, 24, 3)).astype(np.float32)
    )
    ref = np.asarray(model.apply(folded, x))
    monkeypatch.setenv("SAGUARO_MBCONV_PALLAS", "1")
    out = np.asarray(model.apply(folded, x))
    np.testing.assert_allclose(out, ref, rtol=0.05, atol=0.05)


def test_fused_param_tree_matches(monkeypatch):
    """init under the fused branch creates the identical variable tree
    (names + shapes) as the per-op branch, so folded weight trees load
    interchangeably."""
    spec = StageSpec("mbconv", 4, 3, 1, 16, 1, 0.25)
    x = jnp.zeros((1, 8, 8, 16), jnp.bfloat16)
    fblock = _MBConv(spec, 1, jnp.bfloat16, fold_bn=True)
    monkeypatch.delenv("SAGUARO_MBCONV_PALLAS", raising=False)
    tree_ref = jax.tree.map(
        lambda a: (a.shape, str(a.dtype)),
        fblock.init(jax.random.PRNGKey(0), x),
    )
    monkeypatch.setenv("SAGUARO_MBCONV_PALLAS", "1")
    tree_fused = jax.tree.map(
        lambda a: (a.shape, str(a.dtype)),
        fblock.init(jax.random.PRNGKey(0), x),
    )
    assert tree_ref == tree_fused
