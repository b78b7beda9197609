"""Golden tests: pixel kernels vs the numpy/scipy oracles."""

import numpy as np
import pytest

from saguaro_tpu.kernels import (
    illum_correct,
    lanczos_resize,
    max_project,
    max_project_batch,
    qc_metrics,
    radial_power_spectrum,
)
from saguaro_tpu.kernels.qc import qc_metrics_batch
from saguaro_tpu.kernels.resample import lanczos_resize_batch

from . import oracles


class TestMaxProjection:
    def test_matches_oracle(self, rng):
        planes = [rng.integers(0, 65535, (64, 96)).astype(np.uint16) for _ in range(5)]
        expected = oracles.max_projection_oracle(planes)
        got = np.asarray(max_project(np.stack(planes)))
        np.testing.assert_array_equal(got, expected)

    def test_batch(self, rng):
        stacks = rng.integers(0, 65535, (4, 3, 32, 48)).astype(np.uint16)
        got = np.asarray(max_project_batch(stacks))
        for b in range(4):
            np.testing.assert_array_equal(got[b], stacks[b].max(axis=0))


class TestLanczos:
    @pytest.mark.parametrize("in_shape,out_shape", [((256, 256), (128, 128)),
                                                    ((270, 360), (108, 144)),
                                                    ((64, 64), (96, 96))])
    def test_uint16_matches_exact_pil(self, rng, in_shape, out_shape):
        # PIL's own uint16 path quantizes coefficients to 8-bit fixed point;
        # parity target is the exact convolution (PIL float path).
        img = rng.integers(0, 65535, in_shape).astype(np.uint16)
        exact = oracles.pil_lanczos_exact_oracle(img, (out_shape[1], out_shape[0]))
        exact_u16 = np.clip(np.floor(exact + 0.5), 0, 65535).astype(np.int64)
        got = np.asarray(lanczos_resize(img, out_shape))
        assert got.dtype == np.uint16
        diff = np.abs(got.astype(np.int64) - exact_u16)
        assert diff.max() <= 1
        assert (diff > 0).mean() < 0.05

    def test_uint8(self, rng):
        # PIL's uint8 path quantizes coefficients to 8-bit fixed point too;
        # require exact-convolution parity and closeness to PIL's own output.
        img = rng.integers(0, 255, (200, 200)).astype(np.uint8)
        exact = oracles.pil_lanczos_exact_oracle(img, (100, 100))
        exact_u8 = np.clip(np.floor(exact + 0.5), 0, 255).astype(np.int64)
        got = np.asarray(lanczos_resize(img, (100, 100)))
        assert np.abs(got.astype(np.int64) - exact_u8).max() <= 1
        pil = oracles.pil_lanczos_oracle(img, (100, 100))
        assert np.abs(got.astype(np.int64) - pil.astype(np.int64)).max() <= 8

    def test_batch_consistent(self, rng):
        imgs = rng.integers(0, 65535, (3, 120, 120)).astype(np.uint16)
        batch = np.asarray(lanczos_resize_batch(imgs, (60, 60)))
        for b in range(3):
            single = np.asarray(lanczos_resize(imgs[b], (60, 60)))
            np.testing.assert_array_equal(batch[b], single)


class TestIllum:
    def test_division(self, rng):
        img = rng.integers(1, 65535, (32, 32)).astype(np.uint16)
        illum = rng.uniform(0.5, 2.0, (32, 32)).astype(np.float32)
        got = np.asarray(illum_correct(img, illum))
        np.testing.assert_allclose(got, img.astype(np.float32) / illum, rtol=1e-6)


class TestQC:
    def test_rps_matches_oracle(self, rng):
        img = rng.integers(0, 4095, (128, 160)).astype(np.float64)
        labels_o, magsum_o, powersum_o = oracles.rps_oracle(img.copy())
        labels, magsum, powersum = radial_power_spectrum(img)
        np.testing.assert_array_equal(labels, labels_o)
        np.testing.assert_allclose(np.asarray(magsum), magsum_o, rtol=2e-4)
        np.testing.assert_allclose(np.asarray(powersum), powersum_o, rtol=5e-4)

    def test_slope_matches_oracle(self, rng):
        img = rng.integers(0, 4095, (128, 128)).astype(np.float64)
        slope_o = oracles.slope_oracle(img)
        slope, _ = qc_metrics(img)
        np.testing.assert_allclose(float(slope), slope_o, atol=2e-3)

    def test_percent_maximal(self, rng):
        img = rng.integers(0, 100, (64, 64)).astype(np.uint16)
        img[:4, :4] = 5000  # saturated block
        _, pct = qc_metrics(img)
        np.testing.assert_allclose(
            float(pct), oracles.percent_maximal_oracle(img), rtol=1e-6
        )

    def test_structured_image_slope_negative(self, rng):
        # Natural-like image (smooth blobs) should give a negative slope.
        import scipy.ndimage as ndi

        img = ndi.gaussian_filter(rng.normal(size=(256, 256)), 8) * 1000 + 2000
        slope_o = oracles.slope_oracle(img)
        slope, _ = qc_metrics(img)
        assert slope_o < 0
        np.testing.assert_allclose(float(slope), slope_o, atol=5e-3)

    def test_batch(self, rng):
        imgs = rng.integers(0, 4095, (4, 96, 96)).astype(np.float64)
        slopes, pcts = qc_metrics_batch(imgs)
        for b in range(4):
            np.testing.assert_allclose(float(slopes[b]), oracles.slope_oracle(imgs[b]), atol=2e-3)
            np.testing.assert_allclose(
                float(pcts[b]), oracles.percent_maximal_oracle(imgs[b].astype(np.float32)), rtol=1e-6
            )

    def test_flat_image(self):
        img = np.full((64, 64), 7.0)
        slope, pct = qc_metrics(img)
        assert float(pct) == 100.0
        assert np.isfinite(float(slope)) or float(slope) == 0.0
