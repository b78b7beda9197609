"""CP-exact perimeter + exact EDT radius features vs scipy oracles.

Round-3 exactness work (VERDICT r2 items 4/5): AreaShape_Perimeter now
matches skimage.measure.perimeter (the regionprops property CP 4.2.8
records), and Mean/Median/MaximumRadius come from an exact label-aware
Euclidean distance transform instead of a chamfer approximation.
"""

from __future__ import annotations

import numpy as np
import pytest
import scipy.ndimage

from tests.oracles import (
    object_edt_oracle,
    object_perimeters_oracle,
    radius_stats_oracle,
    skimage_perimeter_oracle,
)


def _random_blobs(rng, size=96, n_seeds=10, sigma=3.0):
    """Smoothed-noise blobs labeled by connected components — irregular
    shapes with concavities, holes, and touching objects."""
    noise = scipy.ndimage.gaussian_filter(rng.normal(0, 1, (size, size)), sigma)
    mask = noise > np.quantile(noise, 0.7)
    labels, _ = scipy.ndimage.label(mask)
    return labels.astype(np.int32)


class TestExactPerimeter:
    def test_square_is_eight(self):
        # 3x3 square: the classic skimage perimeter = 8
        m = np.zeros((9, 9), bool)
        m[3:6, 3:6] = True
        assert skimage_perimeter_oracle(m) == pytest.approx(8.0)

    def test_oracle_transcription_matches_known_disk(self):
        yy, xx = np.meshgrid(np.arange(41), np.arange(41), indexing="ij")
        m = (yy - 20) ** 2 + (xx - 20) ** 2 <= 15**2
        # weighted-configuration perimeter of a digital disk lands within
        # ~5% above 2*pi*r (the estimator's known quantization bias)
        assert skimage_perimeter_oracle(m) == pytest.approx(
            2 * np.pi * 15, rel=0.06
        )

    def test_shape_features_matches_oracle(self):
        from saguaro_tpu.kernels.segment_reduce import shape_features

        rng = np.random.default_rng(0)
        labels = _random_blobs(rng)
        out = shape_features(labels, max_cells=64)
        want = object_perimeters_oracle(labels, 64)
        got = np.asarray(out["Perimeter"])
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)

    def test_touching_objects_isolated_masks(self):
        # two touching rectangles: each scored on its own isolated mask
        from saguaro_tpu.kernels.segment_reduce import shape_features

        labels = np.zeros((20, 20), np.int32)
        labels[5:15, 4:10] = 1
        labels[5:15, 10:16] = 2
        out = shape_features(labels, max_cells=8)
        want = object_perimeters_oracle(labels, 8)
        np.testing.assert_allclose(
            np.asarray(out["Perimeter"])[:3], want[:3], rtol=1e-5, atol=1e-4
        )

    def test_formfactor_consistent(self):
        from saguaro_tpu.kernels.segment_reduce import shape_features

        yy, xx = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
        labels = (((yy - 32) ** 2 + (xx - 32) ** 2) <= 20**2).astype(np.int32)
        out = shape_features(labels, max_cells=4)
        # disk: FormFactor = 4*pi*A/P^2 -> ~0.91 with the weighted
        # perimeter's ~5% circle bias — the value a real CP run reports
        area = np.asarray(out["Area"])[1]
        want = 4 * np.pi * area / object_perimeters_oracle(labels, 4)[1] ** 2
        assert np.asarray(out["FormFactor"])[1] == pytest.approx(want, rel=1e-4)
        assert 0.85 < want < 1.0


class TestExactEDT:
    def test_edt_matches_scipy(self):
        from saguaro_tpu.kernels.shape_extra import _label_edt

        rng = np.random.default_rng(1)
        labels = _random_blobs(rng)
        got = np.asarray(_label_edt(labels, 48))
        want = object_edt_oracle(labels)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)

    def test_edt_touching_objects(self):
        from saguaro_tpu.kernels.shape_extra import _label_edt

        labels = np.zeros((30, 30), np.int32)
        labels[5:25, 5:15] = 1
        labels[5:25, 15:25] = 2  # touching: the shared edge is 'outside'
        got = np.asarray(_label_edt(labels, 48))
        want = object_edt_oracle(labels)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)

    def test_edt_border_object(self):
        # object touching the image border: scipy EDT has no sites outside
        # the array — distances grow inward from in-array background only
        from saguaro_tpu.kernels.shape_extra import _label_edt

        labels = np.zeros((24, 24), np.int32)
        labels[0:10, 0:24] = 1  # full-width bar on the top edge
        got = np.asarray(_label_edt(labels, 48))
        want = object_edt_oracle(labels)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)

    def test_radius_features_exact(self):
        from saguaro_tpu.kernels.shape_extra import radius_features

        rng = np.random.default_rng(2)
        labels = _random_blobs(rng)
        out = {k: np.asarray(v) for k, v in radius_features(labels, 64).items()}
        mean, median, dmax = radius_stats_oracle(labels, 64)
        np.testing.assert_allclose(out["MeanRadius"], mean, rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(out["MaximumRadius"], dmax, rtol=1e-5, atol=1e-4)
        # exact np.median convention incl. even-count averaging
        np.testing.assert_allclose(out["MedianRadius"], median, rtol=1e-5, atol=1e-4)

    def test_radius_features_disk(self):
        from saguaro_tpu.kernels.shape_extra import radius_features

        yy, xx = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
        labels = (((yy - 32) ** 2 + (xx - 32) ** 2) <= 18**2).astype(np.int32)
        out = {k: np.asarray(v) for k, v in radius_features(labels, 4).items()}
        mean, median, dmax = radius_stats_oracle(labels, 4)
        assert out["MeanRadius"][1] == pytest.approx(mean[1], rel=1e-5)
        assert out["MedianRadius"][1] == pytest.approx(median[1], rel=1e-5)
        assert out["MaximumRadius"][1] == pytest.approx(dmax[1], rel=1e-5)
