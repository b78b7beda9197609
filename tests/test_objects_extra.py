"""Extended per-object measurements vs numpy oracles."""

import numpy as np
import pytest

from saguaro_tpu.kernels.objects_extra import (
    edge_intensity_features,
    neighbor_features,
    quantile_intensity_features,
    radial_distribution_features,
)


def _disk(h, w, cy, cx, r):
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    return (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r


class TestQuantiles:
    def test_exact_on_integer_grid(self, rng):
        """Exact CP order statistics for uint16 images: many objects of
        odd/even/tiny sizes, full-range values with duplicates."""
        from tests.oracles import cp_quantile_intensity

        labels = np.zeros((96, 96), np.int32)
        labels[_disk(96, 96, 24, 24, 20)] = 1     # big (even/odd mix)
        labels[_disk(96, 96, 70, 24, 9)] = 2
        labels[60, 70] = 3                         # single pixel
        labels[80:82, 80:83] = 4                   # 6 px (even count)
        img = rng.integers(0, 65536, (96, 96)).astype(np.uint16)
        img[:48] //= 64                            # clustered low values
        out = {k: np.asarray(v) for k, v in
               quantile_intensity_features(
                   img.astype(np.float32), labels, 8).items()}
        for lab in (1, 2, 3, 4):
            vals = img[labels == lab].astype(np.float64)
            med, mad, lo, hi = cp_quantile_intensity(vals)
            assert out["MedianIntensity"][lab] == med, (lab, "median")
            assert out["MADIntensity"][lab] == mad, (lab, "mad")
            assert abs(out["LowerQuartileIntensity"][lab] - lo) < 1e-3, lab
            assert abs(out["UpperQuartileIntensity"][lab] - hi) < 1e-3, lab
        assert (out["MedianIntensity"][np.array([0, 5, 6, 7])] == 0).all()

    def test_float_path_matches_cp_semantics(self, rng):
        """The adaptive-grid float path reproduces the SAME CP rank
        semantics as the integer path, within half a 16-bit grid step."""
        from tests.oracles import cp_quantile_intensity

        labels = np.zeros((64, 64), np.int32)
        labels[_disk(64, 64, 32, 32, 20)] = 1
        labels[_disk(64, 64, 12, 52, 6)] = 2
        img = rng.normal(100, 25, (64, 64)).astype(np.float32)
        out = {k: np.asarray(v) for k, v in
               quantile_intensity_features(
                   img, labels, 8, integer_grid=False).items()}
        for lab in (1, 2):
            vals = img[labels == lab].astype(np.float64)
            med, mad, lo, hi = cp_quantile_intensity(vals)
            tol = (vals.max() - vals.min()) / 65535.0 + 1e-4
            assert abs(out["MedianIntensity"][lab] - med) < tol, lab
            assert abs(out["MADIntensity"][lab] - mad) < tol, lab
            assert abs(out["LowerQuartileIntensity"][lab] - lo) < tol, lab
            assert abs(out["UpperQuartileIntensity"][lab] - hi) < tol, lab

    def test_float_fallback_matches_numpy_quantiles(self, rng):
        labels = np.zeros((64, 64), np.int32)
        labels[_disk(64, 64, 32, 32, 20)] = 1
        img = rng.normal(100, 25, (64, 64)).astype(np.float32)
        out = {k: float(np.asarray(v)[1]) for k, v in
               quantile_intensity_features(
                   img, labels, 8, integer_grid=False).items()}
        vals = img[labels == 1]
        # legacy loose bound (the adaptive grid is far tighter; see
        # test_float_path_matches_cp_semantics)
        binw = (vals.max() - vals.min()) / 256
        assert abs(out["MedianIntensity"] - np.median(vals)) < 2 * binw
        assert abs(out["LowerQuartileIntensity"] - np.quantile(vals, 0.25)) < 2 * binw
        assert abs(out["UpperQuartileIntensity"] - np.quantile(vals, 0.75)) < 2 * binw
        mad = np.median(np.abs(vals - np.median(vals)))
        assert abs(out["MADIntensity"] - mad) < 3 * binw


class TestEdge:
    def test_edge_stats(self):
        labels = np.zeros((32, 32), np.int32)
        labels[8:24, 8:24] = 1  # square: edge is the 1px border ring
        img = np.ones((32, 32), np.float32)
        img[8:24, 8:24] = 2.0
        img[9:23, 9:23] = 5.0  # interior brighter than the edge ring
        out = {k: float(np.asarray(v)[1]) for k, v in
               edge_intensity_features(img, labels, 8).items()}
        assert out["MeanIntensityEdge"] == pytest.approx(2.0)
        assert out["MaxIntensityEdge"] == pytest.approx(2.0)
        # edge count = perimeter of 16x16 square = 60
        assert out["IntegratedIntensityEdge"] == pytest.approx(2.0 * 60)


class TestRadial:
    def test_uniform_disk_fractions(self):
        labels = np.zeros((64, 64), np.int32)
        labels[_disk(64, 64, 32, 32, 20)] = 1
        img = np.ones((64, 64), np.float32)
        out = radial_distribution_features(img, labels, 8, n_rings=4)
        frac = np.asarray(out["FracAtD"])[1]
        mean_frac = np.asarray(out["MeanFrac"])[1]
        assert frac.sum() == pytest.approx(1.0, abs=1e-5)
        # uniform intensity: FracAtD proportional to ring pixel fraction,
        # so MeanFrac ~ 1 in every ring
        np.testing.assert_allclose(mean_frac, 1.0, atol=1e-4)

    def test_center_weighted(self):
        labels = np.zeros((64, 64), np.int32)
        labels[_disk(64, 64, 32, 32, 20)] = 1
        yy, xx = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
        img = np.exp(-((yy - 32.0) ** 2 + (xx - 32.0) ** 2) / 50).astype(np.float32)
        out = radial_distribution_features(img, labels, 8, n_rings=4)
        mean_frac = np.asarray(out["MeanFrac"])[1]
        assert mean_frac[0] > mean_frac[-1]  # intensity concentrated at center


class TestNeighbors:
    def test_touching_and_nearby(self):
        labels = np.zeros((48, 48), np.int32)
        labels[10:20, 10:20] = 1
        labels[10:20, 20:30] = 2   # touches 1
        labels[10:20, 33:43] = 3   # 3 px gap from 2 -> neighbor at distance 5
        labels[40:44, 40:44] = 4   # isolated
        out = neighbor_features(labels, 8, distance=5)
        n = np.asarray(out["NumberOfNeighbors"])
        assert n[1] == 1
        assert n[2] == 2   # touches 1, near 3
        assert n[3] == 1
        assert n[4] == 0
        pct = np.asarray(out["PercentTouching"])
        assert pct[1] > 0
        assert pct[4] == 0

    def test_overflow_ids_ignored(self):
        """Ids >= max_cells route to background (the _flat convention) —
        they must not alias onto cell max_cells-1 as phantom neighbors."""
        labels = np.zeros((48, 48), np.int32)
        labels[10:20, 10:20] = 7   # == max_cells - 1, isolated
        labels[30:40, 30:40] = 99  # overflow (max_cells=8), touches nothing
        labels[30:40, 40:44] = 1   # touches ONLY the overflow object
        out = neighbor_features(labels, 8, distance=5)
        n = np.asarray(out["NumberOfNeighbors"])
        pct = np.asarray(out["PercentTouching"])
        assert n[7] == 0 and pct[7] == 0   # no phantom neighbor from id 99
        assert n[1] == 0                    # overflow partner is ignored
