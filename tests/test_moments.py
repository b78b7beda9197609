"""Per-object moment features vs brute-force numpy oracles
(the skimage regionprops definitions CP 4.2.8 emits)."""

import numpy as np
import pytest

from saguaro_tpu.kernels.moments import moments_features


def _oracle(mask: np.ndarray) -> dict:
    """regionprops-convention moments for one binary mask."""
    ys, xs = np.nonzero(mask)
    ymin, xmin = ys.min(), xs.min()
    yl, xl = ys - ymin, xs - xmin  # bbox-local
    area = float(len(ys))
    cy, cx = ys.mean(), xs.mean()
    out = {}
    for p in range(4):
        for q in range(4):
            out[f"SpatialMoment_{p}_{q}"] = float((yl**p * xl**q).sum())
            out[f"CentralMoment_{p}_{q}"] = float(
                ((ys - cy) ** p * (xs - cx) ** q).sum()
            )
            out[f"NormalizedMoment_{p}_{q}"] = out[f"CentralMoment_{p}_{q}"] / (
                area ** (1 + (p + q) / 2)
            )
    mu = lambda p, q: out[f"CentralMoment_{p}_{q}"]
    t00, t11, t01 = mu(2, 0) / area, mu(0, 2) / area, -mu(1, 1) / area
    out["InertiaTensor_0_0"] = t00
    out["InertiaTensor_0_1"] = t01
    out["InertiaTensor_1_1"] = t11
    tr = (t00 + t11) / 2
    d = np.sqrt(((t00 - t11) / 2) ** 2 + t01**2)
    out["InertiaTensorEigenvalues_0"] = tr + d
    out["InertiaTensorEigenvalues_1"] = tr - d
    out["EquivalentDiameter"] = np.sqrt(4 * area / np.pi)
    n = lambda p, q: out[f"NormalizedMoment_{p}_{q}"]
    out["HuMoment_0"] = n(2, 0) + n(0, 2)
    out["HuMoment_1"] = (n(2, 0) - n(0, 2)) ** 2 + 4 * n(1, 1) ** 2
    return out


class TestMoments:
    def test_matches_oracle(self, rng):
        lab = np.zeros((64, 64), np.int32)
        yy, xx = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
        lab[(yy - 20) ** 2 + (xx - 20) ** 2 <= 80] = 1        # disk
        lab[35:55, 30:60] = 2                                 # rectangle
        blob = rng.random((12, 12)) > 0.4                     # irregular
        lab[4:16, 44:56][blob] = 3

        got = {k: np.asarray(v) for k, v in moments_features(lab, 8).items()}
        for i in (1, 2, 3):
            want = _oracle(lab == i)
            area = float((lab == i).sum())
            for k, v in want.items():
                # Spatial/Central sums scale as area^(1+(p+q)/2); the hi/lo-bf16
                # one-hot matmul leaves ~1e-8..1e-5 of that scale on near-zero
                # (symmetric) moments, so the absolute floor must scale too
                fam = k.split("_")[0]
                if fam in ("SpatialMoment", "CentralMoment"):
                    p_, q_ = int(k.split("_")[1]), int(k.split("_")[2])
                    # + centroid f32 rounding propagated through order-1 sums
                    atol = 3e-8 * area ** (1 + (p_ + q_) / 2) + 1e-6 * area * 64
                else:
                    atol = 1e-6
                np.testing.assert_allclose(
                    got[k][i], v, rtol=2e-4, atol=atol,
                    err_msg=f"object {i} feature {k}",
                )

    def test_hu_translation_invariance(self):
        lab = np.zeros((64, 64), np.int32)
        lab[5:15, 5:20] = 1
        lab[40:50, 30:45] = 2  # same shape elsewhere
        got = {k: np.asarray(v) for k, v in moments_features(lab, 8).items()}
        for i in range(7):
            np.testing.assert_allclose(
                got[f"HuMoment_{i}"][1], got[f"HuMoment_{i}"][2], rtol=1e-3, atol=1e-9
            )

    def test_background_slot_zero(self):
        lab = np.zeros((16, 16), np.int32)
        lab[4:8, 4:8] = 1
        got = moments_features(lab, 4)
        for v in got.values():
            assert float(np.asarray(v)[0]) == 0.0