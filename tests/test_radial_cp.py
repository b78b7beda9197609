"""CP-exact radial-distribution binning (kernels/radial.py) vs a numpy
transcription of CellProfiler 4.2.8 measureobjectintensitydistribution:

  d_edge   = per-object EDT (touching neighbors/background = outside)
  center   = first raster argmax of d_edge (maximum_position_of_labels)
  d_center = centrosome propagate race from ALL centers over the union
             mask, step cost |step| * sqrt(lam/(1+lam)) (zero image)
  good     = race winner == own label (CP drops captured pixels)
  ring     = min(floor(d_c/(d_c+d_e+.001) * n_rings), n_rings-1)
  wedge    = (di>0) + 2*(dj>0) + 4*(|di|>|dj|)  [relative to center]
"""

import heapq

import numpy as np
import pytest

import jax.numpy as jnp


def _oracle_edt(labels):
    h, w = labels.shape
    out = np.zeros((h, w), np.float64)
    ys, xs = np.nonzero(labels >= 0)
    for y in range(h):
        for x in range(w):
            l = labels[y, x]
            if l == 0:
                continue
            diff = labels != l
            if not diff.any():
                out[y, x] = max(h, w)
                continue
            dy, dx = np.nonzero(diff)
            out[y, x] = np.sqrt(((dy - y) ** 2 + (dx - x) ** 2).min())
    return out


def _dijkstra(labels, sources, lam=1.0):
    """Shortest scaled-step distance over the union mask from sources."""
    h, w = labels.shape
    scale = np.sqrt(lam / (1.0 + lam))
    dist = np.full((h, w), np.inf)
    heap = []
    for cy, cx in sources:
        dist[cy, cx] = 0.0
        heapq.heappush(heap, (0.0, cy, cx))
    steps = [(-1, 0, 1.0), (1, 0, 1.0), (0, -1, 1.0), (0, 1, 1.0),
             (-1, -1, 2 ** 0.5), (-1, 1, 2 ** 0.5),
             (1, -1, 2 ** 0.5), (1, 1, 2 ** 0.5)]
    while heap:
        d, y, x = heapq.heappop(heap)
        if d > dist[y, x] + 1e-12:
            continue
        for dy, dx, s in steps:
            ny, nx = y + dy, x + dx
            if 0 <= ny < h and 0 <= nx < w and labels[ny, nx] > 0:
                nd = d + scale * s
                if nd < dist[ny, nx] - 1e-12:
                    dist[ny, nx] = nd
                    heapq.heappush(heap, (nd, ny, nx))
    return dist


def _oracle_race(labels, centers, lam=1.0):
    """All-centers race with the kernel's tie rule: a pixel whose OWN
    center achieves the global optimum (within eps) keeps its label."""
    per_label = {
        lab: _dijkstra(labels, [pos], lam) for pos, lab in centers.items()
    }
    dist = np.full(labels.shape, np.inf)
    won = np.zeros(labels.shape, np.int64)
    for lab, d in per_label.items():
        better = d < dist - 1e-12
        dist = np.where(better, d, dist)
        won = np.where(better, lab, won)
    for lab, d in per_label.items():
        own_tie = (labels == lab) & (d <= dist + 1e-6)
        won = np.where(own_tie, lab, won)
    return dist, won


def _oracle_ring_wedge(labels, n_rings, lam=1.0):
    d_edge = _oracle_edt(labels)
    centers = {}
    for lab in np.unique(labels):
        if lab == 0:
            continue
        masked = np.where(labels == lab, d_edge, -1.0)
        idx = int(np.argmax(masked))  # first raster maximum
        centers[(idx // labels.shape[1], idx % labels.shape[1])] = int(lab)
    dist, won = _oracle_race(labels, centers, lam)
    good = (won == labels) & (labels > 0) & np.isfinite(dist)
    norm = np.where(good, dist / (dist + d_edge + 0.001), 0.0)
    ring = np.minimum((norm * n_rings).astype(int), n_rings - 1)
    cy = np.zeros_like(labels, float)
    cx = np.zeros_like(labels, float)
    for (ccy, ccx), lab in centers.items():
        cy[labels == lab] = ccy
        cx[labels == lab] = ccx
    yy, xx = np.mgrid[: labels.shape[0], : labels.shape[1]]
    wedge = (
        (yy > cy).astype(int) + 2 * (xx > cx).astype(int)
        + 4 * (np.abs(yy - cy) > np.abs(xx - cx)).astype(int)
    )
    return np.where(good, ring * 8 + wedge, 8 * n_rings)


def _shapes():
    """Asymmetric blob + annulus + touching pair (race exclusion)."""
    lab = np.zeros((48, 64), np.int32)
    yy, xx = np.mgrid[:48, :64]
    # blob 1: off-center ellipse-ish
    lab[((yy - 12) ** 2 / 1.7 + (xx - 13) ** 2 / 3.1) <= 30] = 1
    # annulus: geodesic center distance wraps around the hole
    r2 = (yy - 30) ** 2 + (xx - 44) ** 2
    lab[(r2 <= 13 ** 2) & (r2 >= 6 ** 2)] = 2
    # touching rectangles (different sizes -> asymmetric race)
    lab[36:46, 4:12] = 3
    lab[36:44, 12:22] = 4
    return lab


class TestCpRingWedge:
    def test_codes_match_oracle(self):
        from saguaro_tpu.kernels.radial import cp_ring_wedge

        lab = _shapes()
        n_rings = 4
        want = _oracle_ring_wedge(lab, n_rings)
        got = np.asarray(
            cp_ring_wedge(jnp.asarray(lab), 16, n_rings, max_radius=32)
        )
        inside = lab > 0
        mism = (got != want) & inside
        # float-associativity ties at ring boundaries may flip a pixel;
        # anything structural (wrong center, wrong metric) flips whole
        # regions
        frac = mism.sum() / inside.sum()
        assert frac < 0.02, (
            f"{mism.sum()}/{inside.sum()} code mismatches\n"
            f"{np.argwhere(mism)[:10]}"
        )

    def test_annulus_differs_from_centroid(self):
        """For a ring-shaped object the centroid lies in the hole —
        centroid binning and CP binning must disagree (the point of the
        transcription)."""
        from saguaro_tpu.kernels.radial import cp_ring_wedge

        lab = np.zeros((48, 48), np.int32)
        yy, xx = np.mgrid[:48, :48]
        r2 = (yy - 24) ** 2 + (xx - 24) ** 2
        lab[(r2 <= 20 ** 2) & (r2 >= 10 ** 2)] = 1
        got = np.asarray(cp_ring_wedge(jnp.asarray(lab), 8, 4, max_radius=32))
        rings = got[lab > 0] // 8
        # CP: the middle of the band is ring 0/1 (near the center pixel
        # it is 0; far around the wrap it approaches the last ring)
        assert rings.min() == 0 and rings.max() == 3

    def test_race_exclusion_touching(self):
        """Pixels of a touching object STRICTLY closer to the neighbor's
        center get the overflow code (CP's cl != labels drop): a square
        attached to the end of a long bar captures the bar's near end."""
        from saguaro_tpu.kernels.radial import cp_ring_wedge

        lab = np.zeros((24, 64), np.int32)
        lab[6:18, 2:14] = 1    # square, center ~ (11, 7)
        lab[10:13, 14:60] = 2  # long bar, center ~ its middle (11, ~37)
        n_rings = 4
        got = np.asarray(
            cp_ring_wedge(jnp.asarray(lab), 8, n_rings, max_radius=32)
        )
        want = _oracle_ring_wedge(lab, n_rings)
        excl_got = (got == 8 * n_rings) & (lab > 0)
        excl_want = (want == 8 * n_rings) & (lab > 0)
        # the construction does capture: the bar's EDT-argmax center sits
        # right next to the junction (its first raster d2-max), so the
        # square's seam pixels are nearer the BAR's center than their own
        assert excl_want.sum() > 0 and excl_got.sum() > 0
        # same exclusion set up to boundary ties
        assert (excl_got != excl_want).sum() <= 3, np.argwhere(
            excl_got != excl_want
        )[:10]


class TestCenterRaceScan:
    """center_race_scan (min-plus run relaxations) must reproduce the
    1-step sweep race exactly — distances AND the own-tie winner rule."""

    @pytest.mark.parametrize("case", ["shapes", "spiral"])
    def test_matches_sweep_race(self, case):
        from saguaro_tpu.kernels.radial import center_race, center_race_scan

        if case == "shapes":
            lab = _shapes()
        else:
            # a spiral maximizes path bends — the scan's worst case
            lab = np.zeros((64, 64), np.int32)
            yy, xx = np.mgrid[:64, :64]
            th = np.arctan2(yy - 32, xx - 32)
            r = np.hypot(yy - 32, xx - 32)
            m = np.abs(r - (th + np.pi) * 4.0) < 2.5
            m |= np.abs(r - (th + 3 * np.pi) * 4.0) < 2.5
            lab[m & (r < 30)] = 1
        seeds = np.zeros_like(lab)
        for l in np.unique(lab):
            if l == 0:
                continue
            ys, xs = np.nonzero(lab == l)
            seeds[ys[len(ys) // 3], xs[len(xs) // 3]] = l
        d1, w1 = map(np.asarray, center_race(jnp.asarray(lab), jnp.asarray(seeds)))
        d2, w2 = map(
            np.asarray, center_race_scan(jnp.asarray(lab), jnp.asarray(seeds))
        )
        inside = lab > 0
        np.testing.assert_allclose(
            np.where(inside, d2, 0), np.where(inside, d1, 0), atol=1e-4
        )
        np.testing.assert_array_equal(w2[inside], w1[inside])


class TestMeasureAllCpRadial:
    def test_features_flow_and_modes_differ(self):
        from saguaro_tpu.pipeline.features import FeatureConfig, _measure_all

        lab = _shapes()
        rng = np.random.default_rng(3)
        img = rng.integers(50, 3000, lab.shape + (2,)).astype(np.float32)
        base = dict(channels=("a", "b"), max_cells=16, max_radius=32,
                    secondary_iterations=4, measure_texture=False,
                    measure_zernike=False, measure_colocalization=False)
        out_cp = _measure_all(
            jnp.asarray(img), jnp.asarray(lab),
            FeatureConfig(**base, radial_binning="cp"),
        )
        out_ce = _measure_all(
            jnp.asarray(img), jnp.asarray(lab),
            FeatureConfig(**base, radial_binning="centroid"),
        )
        key = "RadialDistribution_FracAtD_a_1of4"
        a = np.asarray(out_cp["objects"]["Nuclei"][key])
        b = np.asarray(out_ce["objects"]["Nuclei"][key])
        assert np.isfinite(a).all() and np.isfinite(b).all()
        # the annulus (object 2) must bin differently across modes
        assert not np.allclose(a[2], b[2], atol=1e-3)
        # FracAtD sums to 1 over rings for live objects (both modes)
        for out in (out_cp, out_ce):
            tot = sum(
                np.asarray(out["objects"]["Nuclei"][
                    f"RadialDistribution_FracAtD_a_{r + 1}of4"
                ])
                for r in range(4)
            )
            live = np.asarray(out["objects"]["Nuclei"]["AreaShape_Area"]) > 0
            np.testing.assert_allclose(tot[live], 1.0, rtol=1e-4)

    def test_oracle_frac_at_d(self):
        """FracAtD/MeanFrac from the fused scan vs direct sums over the
        oracle codes."""
        from saguaro_tpu.kernels.fused_measure import fused_object_features
        from saguaro_tpu.kernels.radial import cp_ring_wedge

        lab = _shapes()
        rng = np.random.default_rng(5)
        img = rng.integers(50, 3000, lab.shape + (2,)).astype(np.float32)
        n_rings = 4
        rw = cp_ring_wedge(jnp.asarray(lab), 16, n_rings, max_radius=32)
        fused = fused_object_features(
            jnp.asarray(img), jnp.asarray(lab), 16, n_rings=n_rings,
            with_moments=False, with_zernike=False, with_edge=False,
            ring_wedge=rw,
        )
        rw_np = np.asarray(rw)
        for obj in (1, 2, 3, 4):
            m_obj = lab == obj
            tot = np.array([
                img[m_obj & (rw_np // 8 == r)][:, 0].sum()
                for r in range(n_rings)
            ])
            want = tot / max(tot.sum(), 1e-12)
            got = np.asarray(fused["radial"]["FracAtD"])[obj, :, 0]
            np.testing.assert_allclose(got, want, atol=1e-5)
