"""RadialDistribution_RadialCV — CP 4.2.8
measureobjectintensitydistribution anisotropy measure: each ring is split
into 8 octant wedges by (i > ic, j > jc, |di| > |dj|); RadialCV =
population std / mean of the populated wedges' mean intensities.

Ring convention note: CP bins by its propagation-normalized distance;
this framework bins by centroid distance / rmax (documented delta shared
with FracAtD/MeanFrac, docs/PARITY.md) — the oracle here uses the same
ring indexes as the kernel so it validates the wedge/CV machinery.
"""

import numpy as np

import jax.numpy as jnp

from saguaro_tpu.kernels.fused_measure import fused_object_features

MAX_CELLS = 8
N_RINGS = 4


def _cp_radial_cv(values, lab, ring, cy, cx, n_rings=N_RINGS):
    """CP wedge/CV logic given precomputed ring indexes."""
    out = np.zeros((int(lab.max()) + 1, n_rings))
    yy, xx = np.meshgrid(
        np.arange(lab.shape[0]), np.arange(lab.shape[1]), indexing="ij"
    )
    for obj in range(1, int(lab.max()) + 1):
        m = lab == obj
        if not m.any():
            continue
        di = yy[m] - cy[obj]
        dj = xx[m] - cx[obj]
        wedge = (
            (di > 0).astype(int)
            + 2 * (dj > 0).astype(int)
            + 4 * (np.abs(di) > np.abs(dj)).astype(int)
        )
        for r in range(n_rings):
            sel = ring[m] == r
            means = []
            for w in range(8):
                ws = sel & (wedge == w)
                if ws.sum() > 0:
                    means.append(values[m][ws].mean())
            if not means:
                continue
            means = np.array(means)
            mu = means.mean()
            out[obj, r] = 0.0 if mu == 0 else means.std() / mu
    return out


def test_radial_cv_matches_wedge_oracle():
    rng = np.random.default_rng(0)
    lab = np.zeros((96, 96), np.int32)
    lab[6:40, 8:44] = 1
    lab[50:90, 40:88] = 2
    img = rng.random((96, 96, 2)).astype(np.float32) * 100
    # anisotropy: brighten one octant of object 2 in channel 1
    img[55:70, 64:88, 1] += 500

    fused = fused_object_features(
        jnp.asarray(img), jnp.asarray(lab), MAX_CELLS, n_rings=N_RINGS
    )
    shape = fused["shape"]
    cy = np.asarray(shape["Center_Y"])
    cx = np.asarray(shape["Center_X"])

    # reconstruct the kernel's ring indexes (centroid distance / rmax)
    yy, xx = np.meshgrid(np.arange(96), np.arange(96), indexing="ij")
    ring = np.zeros_like(lab)
    for obj in (1, 2):
        m = lab == obj
        d = np.sqrt((yy - cy[obj]) ** 2 + (xx - cx[obj]) ** 2)
        rmax = d[m].max()
        ring[m] = np.clip(
            (d[m] / rmax * N_RINGS).astype(int), 0, N_RINGS - 1
        )

    got = np.asarray(fused["radial"]["RadialCV"])  # (cells, rings, C)
    for c in range(2):
        ref = _cp_radial_cv(img[..., c], lab, ring, cy, cx)
        np.testing.assert_allclose(
            got[1:3, :, c], ref[1:3], rtol=1e-4, atol=1e-5,
            err_msg=f"channel {c}",
        )
    # the brightened octant must show up as anisotropy
    assert got[2, :, 1].max() > got[2, :, 0].max()


def test_radial_cv_column_in_tables():
    from saguaro_tpu.pipeline.features import FeatureConfig, measure_site

    rng = np.random.default_rng(1)
    lab = np.zeros((64, 64), np.int32)
    lab[10:30, 10:30] = 1
    img = rng.integers(100, 1000, (64, 64, 2)).astype(np.uint16)
    cfg = FeatureConfig(
        channels=("DNA", "ER"), max_cells=8,
        measure_zernike=False, measure_moments=False,
        measure_convex=False, measure_radius=False,
        measure_colocalization=False, secondary_iterations=4,
    )
    tables = measure_site(img, lab, cfg)
    for obj in ("Nuclei", "Cells", "Cytoplasm"):
        for r in range(1, 5):
            assert f"RadialDistribution_RadialCV_DNA_{r}of4" in tables[obj].columns
