"""Pallas re-binner (interpret mode on CPU) vs the XLA path."""

import numpy as np
import pytest

from saguaro_tpu.kernels.resample import lanczos_resize, lanczos_resize_batch
from saguaro_tpu.kernels.resample_pallas import (
    lanczos_resize_batch_pallas,
    lanczos_resize_pallas,
)


class TestPallasRebin:
    @pytest.mark.parametrize("in_shape,out_shape", [((512, 512), (256, 256)),
                                                    ((270, 360), (135, 180))])
    def test_matches_xla_path(self, rng, in_shape, out_shape):
        img = rng.integers(0, 65535, in_shape).astype(np.uint16)
        a = np.asarray(lanczos_resize_pallas(img, out_shape, interpret=True))
        b = np.asarray(lanczos_resize(img, out_shape))
        assert np.abs(a.astype(np.int64) - b.astype(np.int64)).max() <= 1

    def test_batch(self, rng):
        imgs = rng.integers(0, 65535, (3, 256, 256)).astype(np.uint16)
        a = np.asarray(lanczos_resize_batch_pallas(imgs, (128, 128), interpret=True))
        b = np.asarray(lanczos_resize_batch(imgs, (128, 128)))
        assert np.abs(a.astype(np.int64) - b.astype(np.int64)).max() <= 1
