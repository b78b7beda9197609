"""Pallas depthwise 3x3 + SiLU kernel vs the XLA grouped-conv path.

On CPU the kernel runs in Pallas interpreter mode; on TPU the same code
compiles through Mosaic. The reference is exactly what flax
``nn.Conv(feature_group_count=C, use_bias=True, dtype=bf16)`` + ``silu``
computes (models/effnetv2._MBConv's folded-BN depthwise) — agreement to
1-2 bf16 ulp (accumulation order differs inside the conv).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from saguaro_tpu.kernels.depthwise_pallas import dw3x3_silu


def _xla_ref(x, w, b):
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16),
        w.astype(jnp.bfloat16),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )
    y = jax.nn.silu(y + b.astype(jnp.bfloat16)).astype(jnp.bfloat16)
    s = jnp.mean(y.astype(jnp.float32), axis=(1, 2))
    return y, s


@pytest.mark.parametrize(
    "n,h,c",
    [
        (4, 10, 192),   # divisible channel block
        (3, 15, 448),   # cb does not divide C, odd N/H (lane-pad garbage path)
        (2, 7, 128),
    ],
)
def test_matches_xla_grouped_conv(n, h, c):
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(n, h, h, c)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    w = jnp.asarray(rng.normal(size=(3, 3, 1, c)).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.1)
    y_ref, s_ref = jax.jit(_xla_ref)(x, w, b)
    y, s = jax.jit(dw3x3_silu)(x, w, b)
    assert y.dtype == jnp.bfloat16 and s.dtype == jnp.float32
    # 2 bf16 ulp on the activations; means agree to f32 noise of the sum
    np.testing.assert_allclose(
        np.asarray(y, np.float32),
        np.asarray(y_ref, np.float32),
        atol=2 * 0.0078125 * float(jnp.max(jnp.abs(y_ref.astype(jnp.float32)))),
    )
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), atol=2e-2)


def _tiny_folded_model():
    import dataclasses

    from saguaro_tpu.models.effnetv2 import (
        EffNetV2,
        EffNetV2Config,
        StageSpec,
        fold_batchnorm,
        init_effnetv2,
    )

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
    return EffNetV2(fcfg), folded


def test_model_dispatch_taps(monkeypatch):
    """SAGUARO_DW_TAPS routes the folded-BN depthwise through the
    pure-XLA 9-tap formulation and reproduces the grouped-conv path."""
    monkeypatch.delenv("SAGUARO_DW_TAPS", raising=False)
    model, folded = _tiny_folded_model()
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 24, 24, 3)).astype(np.float32)
    )
    ref = np.asarray(model.apply(folded, x))
    monkeypatch.setenv("SAGUARO_DW_TAPS", "1")
    out = np.asarray(model.apply(folded, x))
    np.testing.assert_allclose(out, ref, rtol=0.05, atol=0.05)


def test_model_dispatch_forced_pallas(monkeypatch):
    """The folded-BN _MBConv path routes through the kernel under
    SAGUARO_FORCE_PALLAS and reproduces the XLA fallback activations."""
    monkeypatch.delenv("SAGUARO_NO_PALLAS", raising=False)
    from saguaro_tpu.models.effnetv2 import (
        EffNetV2,
        EffNetV2Config,
        StageSpec,
        fold_batchnorm,
        init_effnetv2,
    )

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
    import dataclasses

    fcfg = dataclasses.replace(cfg, fold_bn=True)
    model = EffNetV2(fcfg)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 24, 24, 3)).astype(np.float32)
    )
    monkeypatch.setenv("SAGUARO_NO_PALLAS", "1")
    ref = np.asarray(model.apply(folded, x))
    monkeypatch.delenv("SAGUARO_NO_PALLAS")
    monkeypatch.setenv("SAGUARO_FORCE_PALLAS", "1")
    out = np.asarray(model.apply(folded, x))
    # pooled 1280-d features: small per-activation bf16 reround noise
    np.testing.assert_allclose(out, ref, rtol=0.05, atol=0.05)
