"""Zernike moments + illumination-function estimation."""

import numpy as np
import pytest

from saguaro_tpu.kernels.illum import estimate_illumination, illum_correct
from saguaro_tpu.kernels.zernike import ZERNIKE_INDEXES, zernike_features


def _disk(h, w, cy, cx, r):
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    return (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r


class TestZernike:
    def test_index_set(self):
        assert len(ZERNIKE_INDEXES) == 30
        assert ZERNIKE_INDEXES[0] == (0, 0)
        assert (9, 9) in ZERNIKE_INDEXES

    def test_disk_dominated_by_z00(self):
        labels = np.zeros((96, 96), np.int32)
        labels[_disk(96, 96, 48, 48, 24)] = 1
        z = np.asarray(zernike_features(labels, 8))[1]
        z00 = z[0]
        # a disk is rotationally symmetric: all m != 0 moments ~ 0
        for zi, (n, m) in enumerate(ZERNIKE_INDEXES):
            if m != 0:
                assert z[zi] < 0.05 * z00, (n, m, z[zi], z00)
        assert z00 > 0

    def test_rotation_invariance_of_magnitudes(self):
        # an ellipse and its 90-degree rotation share Zernike magnitudes
        yy, xx = np.meshgrid(np.arange(96), np.arange(96), indexing="ij")
        e1 = ((yy - 48) / 24.0) ** 2 + ((xx - 48) / 12.0) ** 2 <= 1
        e2 = ((yy - 48) / 12.0) ** 2 + ((xx - 48) / 24.0) ** 2 <= 1
        l1 = np.where(e1, 1, 0).astype(np.int32)
        l2 = np.where(e2, 1, 0).astype(np.int32)
        z1 = np.asarray(zernike_features(l1, 4))[1]
        z2 = np.asarray(zernike_features(l2, 4))[1]
        np.testing.assert_allclose(z1, z2, atol=0.02)

    def test_zero_for_missing_labels(self):
        labels = np.zeros((32, 32), np.int32)
        z = np.asarray(zernike_features(labels, 4))
        assert (z == 0).all()


class TestIllumEstimation:
    def test_recovers_smooth_field(self, rng):
        h = w = 128
        yy, xx = np.meshgrid(np.linspace(-1, 1, h), np.linspace(-1, 1, w), indexing="ij")
        true_illum = 1.0 + 0.4 * np.exp(-(yy**2 + xx**2) / 0.5)
        true_illum /= true_illum.mean()
        imgs = []
        for _ in range(16):
            base = rng.uniform(500, 1500) * np.ones((h, w))
            noise = rng.normal(0, 30, (h, w))
            imgs.append((base + noise) * true_illum)
        est = estimate_illumination(np.stack(imgs), sigma=12)
        assert est.shape == (h, w)
        np.testing.assert_allclose(est.mean(), 1.0, atol=1e-3)
        # correlation with the true field should be very high
        c = np.corrcoef(est.ravel(), true_illum.ravel())[0, 1]
        assert c > 0.98

    def test_correct_then_flat(self, rng):
        h = w = 64
        illum = np.linspace(0.5, 1.5, w)[None, :].repeat(h, 0).astype(np.float32)
        img = (1000 * illum).astype(np.float32)
        corrected = np.asarray(illum_correct(img, illum))
        np.testing.assert_allclose(corrected, 1000.0, rtol=1e-5)
