"""Cellpose default input-conversion parity (VERDICT r2 item 3).

The reference segments with ``cell_model.eval(image_4ch, diameter=100)``
and NO channels argument (Cellpose_GPU_s3fs.py:143); cellpose then applies
``transforms.convert_image(x, channels=None, nchan=2)`` (keep the first 2
raw channels, zero-pad when fewer) and ``transforms.normalize_img`` (per
channel 1-99 percentile, flat channel -> 0) at the ORIGINAL resolution.
These tests pin the engine's net-input construction against a transcribed
numpy oracle of that path (tests/oracles.py:cellpose_convert_image_oracle).
"""

import numpy as np
import pytest

from saguaro_tpu.models.cellpose import convert_input, normalize_input

from .oracles import cellpose_convert_image_oracle


class TestConvertInput:
    @pytest.mark.parametrize("n_ch", [1, 2, 4, 5])
    def test_matches_cellpose_oracle(self, rng, n_ch):
        img = rng.uniform(0, 4000, (48, 56, n_ch)).astype(np.float32)
        got = np.asarray(normalize_input(convert_input(img), spatial_axes=(0, 1)))
        want = cellpose_convert_image_oracle(img)
        assert got.shape == want.shape == (48, 56, 2)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_flat_channel_zeroed(self, rng):
        img = np.stack(
            [rng.uniform(0, 100, (32, 32)), np.full((32, 32), 7.0)], axis=-1
        ).astype(np.float32)
        got = np.asarray(normalize_input(convert_input(img), spatial_axes=(0, 1)))
        assert (got[..., 1] == 0).all()
        np.testing.assert_allclose(
            got, cellpose_convert_image_oracle(img), rtol=1e-5, atol=1e-5
        )

    def test_no_averaging_of_extra_channels(self, rng):
        """The old mean-of-first-3 interpretation must be gone: changing
        channel 2 (or 3) must not change the net input."""
        img = rng.uniform(0, 4000, (32, 32, 4)).astype(np.float32)
        other = img.copy()
        other[..., 2:] = rng.uniform(0, 4000, (32, 32, 2))
        a = np.asarray(normalize_input(convert_input(img), spatial_axes=(0, 1)))
        b = np.asarray(normalize_input(convert_input(other), spatial_axes=(0, 1)))
        np.testing.assert_array_equal(a, b)

    def test_batched_conversion_matches_per_image(self, rng):
        batch = rng.uniform(0, 4000, (3, 32, 32, 4)).astype(np.float32)
        got = np.asarray(
            normalize_input(convert_input(batch), spatial_axes=(1, 2))
        )
        for i in range(3):
            np.testing.assert_allclose(
                got[i], cellpose_convert_image_oracle(batch[i]), rtol=1e-5, atol=1e-5
            )


class TestEngineUsesConversion:
    def test_engine_batch_equals_single_on_4ch(self, rng):
        """segment_batch (device-side conversion) and segment (host-side
        conversion) must produce identical labels on a 4-channel site."""
        from saguaro_tpu.models.cellpose import CellposeConfig
        from saguaro_tpu.models.effnetv2 import EffNetV2Config, StageSpec
        from saguaro_tpu.pipeline.segment_embed import (
            SegmentEmbedConfig,
            SegmentEmbedEngine,
        )

        cfg = SegmentEmbedConfig(
            channels=["DNA", "GFP", "ER", "Mito"], diameter=None, box_size=32,
            max_cells=16, embed_chunk=8, embed_size=64, flow_iters=30, min_size=3,
            cellpose=CellposeConfig(tile=64, features=(4, 8, 16, 32)),
            effnet=EffNetV2Config(
                stem_filters=4,
                stages=(StageSpec("fused", 1, 3, 1, 4, 1),),
                head_filters=1280, input_size=64,
            ),
        )
        eng = SegmentEmbedEngine(cfg, seed=0)
        yy, xx = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
        img = rng.integers(80, 120, (64, 64, 4)).astype(np.uint16)
        disk = (yy - 32) ** 2 + (xx - 32) ** 2 <= 100
        img[..., 0][disk] += 3000
        single = eng.segment(img.astype(np.float32))
        batched = np.asarray(eng.segment_batch(img[None])[0])
        np.testing.assert_array_equal(single, batched)
