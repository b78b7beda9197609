"""Embed-preprocessing parity vs the timm processor config (VERDICT r2
item 7): ``preprocess_crops`` must reproduce what AutoImageProcessor for
``timm/tf_efficientnetv2_l.in21k`` does to the reference's uint8 RGB cell
crops (Cellpose_GPU_s3fs.py:27,177-182,191-194) — PIL bicubic resize to
480 (uint8 two-pass pipeline) + Normalize(mean=0.5, std=0.5)."""

import numpy as np
import pytest

from saguaro_tpu.models.effnetv2 import preprocess_crops

from .oracles import scale_to_8bit_oracle, timm_preprocess_oracle


class TestPreprocessCrops:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_timm_processor_oracle(self, seed):
        """Random textured crops through the full chain: ≤1 uint8 level
        from the PIL pipeline (rounding ties), tightly bounded mean."""
        rng = np.random.default_rng(seed)
        crops = rng.uniform(0, 4000, (3, 200, 200)).astype(np.float32)
        got = np.asarray(preprocess_crops(crops, 480))
        assert got.shape == (3, 480, 480, 3)
        for i in range(3):
            rgb = np.repeat(scale_to_8bit_oracle(crops[i])[..., None], 3, axis=-1)
            want = timm_preprocess_oracle(rgb, 480)
            diff_u8 = np.abs(got[i] - want) * 0.5 * 255.0
            assert diff_u8.max() <= 1.0 + 1e-3, diff_u8.max()
            assert diff_u8.mean() < 0.01, diff_u8.mean()

    def test_flat_crop_maps_to_minus_one(self):
        """scale_to_8bit zeroes a flat crop (mx == mn); after normalize
        that is exactly -1 everywhere."""
        got = np.asarray(preprocess_crops(np.full((1, 64, 64), 7.0), 96))
        np.testing.assert_array_equal(got, -1.0)

    def test_small_embed_size(self, rng):
        """The tiny test configs (embed_size 64) go through the same
        pinned path."""
        crops = rng.uniform(0, 1000, (2, 40, 40)).astype(np.float32)
        got = np.asarray(preprocess_crops(crops, 64))
        for i in range(2):
            rgb = np.repeat(scale_to_8bit_oracle(crops[i])[..., None], 3, axis=-1)
            want = timm_preprocess_oracle(rgb, 64)
            diff_u8 = np.abs(got[i] - want) * 0.5 * 255.0
            assert diff_u8.max() <= 1.0 + 1e-3, diff_u8.max()

    def test_channels_identical(self, rng):
        crops = rng.uniform(0, 1000, (1, 50, 50)).astype(np.float32)
        got = np.asarray(preprocess_crops(crops, 64))
        np.testing.assert_array_equal(got[..., 0], got[..., 1])
        np.testing.assert_array_equal(got[..., 0], got[..., 2])


class TestFoldRgbStem:
    def test_folded_single_channel_matches_rgb(self):
        """fold_rgb_stem + 1-channel preprocess == unfolded + RGB
        replicate (the stem conv is linear in its input channels and the
        three channels are identical)."""
        import dataclasses

        import jax.numpy as jnp

        from saguaro_tpu.models.effnetv2 import (
            EFFNETV2_S,
            fold_rgb_stem,
            init_effnetv2,
            preprocess_crops,
        )

        tiny = dataclasses.replace(
            EFFNETV2_S, stages=EFFNETV2_S.stages[:2], stem_filters=8,
            compute_dtype="float32",
        )
        model, variables = init_effnetv2(tiny, seed=0)
        rng = np.random.default_rng(4)
        crops = jnp.asarray(rng.integers(0, 3000, (2, 48, 48)).astype(np.float32))
        x3 = preprocess_crops(crops, out_size=64)
        x1 = preprocess_crops(crops, out_size=64, n_channels=1)
        assert x3.shape[-1] == 3 and x1.shape[-1] == 1
        ref = model.apply(variables, x3)
        folded = fold_rgb_stem(variables)
        got = model.apply(folded, x1)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5
        )
        # idempotent on an already-folded tree
        again = fold_rgb_stem(folded)
        assert (
            again["params"]["_ConvBNAct_0"]["Conv_0"]["kernel"].shape[2] == 1
        )
