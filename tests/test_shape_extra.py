"""AreaShape radius + convex-hull features vs scipy oracles."""

import numpy as np
import pytest

from saguaro_tpu.kernels.shape_extra import convex_features, radius_features


def _disk(lab, cy, cx, r, value):
    h, w = lab.shape
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    lab[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = value


class TestRadius:
    def test_matches_edt(self):
        from scipy import ndimage

        lab = np.zeros((96, 96), np.int32)
        _disk(lab, 30, 30, 12, 1)
        lab[60:80, 20:70] = 2  # rectangle
        out = {k: np.asarray(v) for k, v in radius_features(lab, 8).items()}
        for i in (1, 2):
            m = lab == i
            edt = ndimage.distance_transform_edt(m)
            assert out["MeanRadius"][i] == pytest.approx(edt[m].mean(), rel=0.06)
            assert out["MedianRadius"][i] == pytest.approx(
                np.median(edt[m]), rel=0.1, abs=0.5
            )

    def test_touching_neighbor_counts_as_outside(self):
        """CP semantics: radius is distance to outside THE object — a
        touching neighbor bounds it exactly like background."""
        lab = np.zeros((32, 64), np.int32)
        lab[8:24, 8:24] = 1    # isolated 16x16 square
        lab[8:24, 30:46] = 2   # 16x16 square...
        lab[8:24, 46:62] = 3   # ...touching another
        out = {k: np.asarray(v) for k, v in radius_features(lab, 8).items()}
        # all three squares have identical radius stats
        assert out["MeanRadius"][2] == pytest.approx(out["MeanRadius"][1], rel=1e-5)
        assert out["MeanRadius"][3] == pytest.approx(out["MeanRadius"][1], rel=1e-5)


class TestConvex:
    def test_square_exact(self):
        lab = np.zeros((32, 32), np.int32)
        lab[4:14, 4:14] = 1  # 10x10 square: convex, solidity 1
        out = {k: np.asarray(v) for k, v in convex_features(lab, 8).items()}
        assert out["ConvexArea"][1] == pytest.approx(100.0, rel=0.02)
        assert out["Solidity"][1] == pytest.approx(1.0, abs=0.02)
        assert out["MaxFeretDiameter"][1] == pytest.approx(9 * np.sqrt(2), rel=0.03)
        assert out["MinFeretDiameter"][1] == pytest.approx(9.0, rel=0.03)

    def test_solidity_concave(self):
        from scipy.spatial import ConvexHull

        lab = np.zeros((64, 64), np.int32)
        lab[10:50, 10:20] = 1  # L-shape: concave
        lab[40:50, 10:50] = 1
        out = {k: np.asarray(v) for k, v in convex_features(lab, 8).items()}
        pts = np.argwhere(lab == 1).astype(float)
        hull = ConvexHull(pts)
        area = float((lab == 1).sum())
        want = area / (hull.volume + 0.5 * hull.area + 1.0)  # pixelized hull
        assert out["Solidity"][1] == pytest.approx(want, rel=0.03)
        assert out["Solidity"][1] < 0.75  # clearly concave

    def test_feret_thin_line(self):
        lab = np.zeros((32, 32), np.int32)
        lab[16, 4:28] = 1  # 24-px horizontal line
        out = {k: np.asarray(v) for k, v in convex_features(lab, 8).items()}
        assert out["MaxFeretDiameter"][1] == pytest.approx(23.0, rel=0.02)
        assert out["MinFeretDiameter"][1] == pytest.approx(0.0, abs=0.2)

    def test_disk_oracle(self):
        from scipy.spatial import ConvexHull

        lab = np.zeros((64, 64), np.int32)
        _disk(lab, 32, 32, 14, 1)
        out = {k: np.asarray(v) for k, v in convex_features(lab, 8).items()}
        pts = np.argwhere(lab == 1).astype(float)
        hull = ConvexHull(pts)
        want_area = hull.volume + 0.5 * hull.area + 1.0
        assert out["ConvexArea"][1] == pytest.approx(want_area, rel=0.01)
        want_sol = float((lab == 1).sum()) / want_area  # ~0.96 rasterized
        assert out["Solidity"][1] == pytest.approx(want_sol, rel=0.01)
        assert out["MaxFeretDiameter"][1] == pytest.approx(28.0, rel=0.05)
        assert out["MinFeretDiameter"][1] == pytest.approx(28.0, rel=0.05)
