"""kernels/fused_measure must reproduce every per-family reference
kernel exactly (same formulas, same reduction structure) — the fused
pass is the production path in pipeline/features._measure_all, the
per-family kernels are the tested oracles."""

import numpy as np
import pytest

from saguaro_tpu.kernels.fused_measure import fused_object_features
from saguaro_tpu.kernels.moments import moments_features
from saguaro_tpu.kernels.multichannel import (
    edge_intensity_multichannel,
    multichannel_stats,
    radial_distribution_multichannel,
)
from saguaro_tpu.kernels.objects_extra import quantile_intensity_features
from saguaro_tpu.kernels.segment_reduce import shape_features
from saguaro_tpu.kernels.zernike import zernike_features

MAX_CELLS = 32


@pytest.fixture(scope="module")
def site():
    rng = np.random.default_rng(7)
    h = w = 160
    image = rng.random((h, w, 3)).astype(np.float32) * 900
    labels = np.zeros((h, w), np.int32)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    # mixed shapes: disks, an ellipse, a square touching another square
    k = 0
    for cy, cx, r in ((30, 30, 12), (30, 100, 9), (100, 40, 14)):
        k += 1
        labels[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = k
    k += 1
    labels[((yy - 110) / 16.0) ** 2 + ((xx - 110) / 7.0) ** 2 <= 1.0] = k
    k += 1
    labels[60:76, 120:136] = k
    k += 1
    labels[60:76, 136:150] = k  # touching neighbor
    image[labels > 0] += 400
    return image, labels


@pytest.fixture(scope="module")
def fused(site):
    image, labels = site
    return fused_object_features(image, labels, MAX_CELLS, n_rings=4)


class TestFusedEquality:
    def test_shape(self, site, fused):
        _, labels = site
        ref = shape_features(labels, MAX_CELLS)
        for k, v in ref.items():
            np.testing.assert_allclose(
                np.asarray(fused["shape"][k]), np.asarray(v), rtol=1e-5, atol=1e-4,
                err_msg=f"shape {k}",
            )

    def test_moments(self, site, fused):
        _, labels = site
        ref = moments_features(labels, MAX_CELLS)
        for k, v in ref.items():
            np.testing.assert_allclose(
                np.asarray(fused["moments"][k]), np.asarray(v),
                rtol=1e-4, atol=1e-4, err_msg=f"moments {k}",
            )

    def test_zernike(self, site, fused):
        _, labels = site
        ref = zernike_features(labels, MAX_CELLS)
        np.testing.assert_allclose(
            np.asarray(fused["zernike"]), np.asarray(ref), rtol=1e-4, atol=1e-6
        )

    def test_intensity_and_corr(self, site, fused):
        image, labels = site
        ref_int, ref_corr = multichannel_stats(image, labels, MAX_CELLS)
        for k, v in ref_int.items():
            np.testing.assert_allclose(
                np.asarray(fused["intensity"][k]), np.asarray(v),
                rtol=1e-5, atol=1e-3, err_msg=f"intensity {k}",
            )
        for pair, (c, s) in ref_corr.items():
            fc, fs = fused["corr"][pair]
            np.testing.assert_allclose(np.asarray(fc), np.asarray(c), rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(np.asarray(fs), np.asarray(s), rtol=1e-5, atol=1e-5)

    def test_edge(self, site, fused):
        image, labels = site
        ref = edge_intensity_multichannel(image, labels, MAX_CELLS)
        for k, v in ref.items():
            np.testing.assert_allclose(
                np.asarray(fused["edge"][k]), np.asarray(v),
                rtol=1e-5, atol=1e-3, err_msg=f"edge {k}",
            )

    def test_radial(self, site, fused):
        image, labels = site
        ref = radial_distribution_multichannel(image, labels, MAX_CELLS, 4)
        for k, v in ref.items():
            np.testing.assert_allclose(
                np.asarray(fused["radial"][k]), np.asarray(v),
                rtol=1e-5, atol=1e-5, err_msg=f"radial {k}",
            )

    def test_quantiles_with_precomputed_stats(self, site, fused):
        image, labels = site
        cnt, vmin, vmax = fused["stats"]
        for c in range(image.shape[-1]):
            ref = quantile_intensity_features(image[..., c], labels, MAX_CELLS)
            got = quantile_intensity_features(
                image[..., c], labels, MAX_CELLS,
                stats=(cnt, vmin[:, c], vmax[:, c]),
            )
            for k in ref:
                np.testing.assert_allclose(
                    np.asarray(got[k]), np.asarray(ref[k]), rtol=1e-5, atol=1e-5,
                    err_msg=f"quantile {k} ch{c}",
                )

    def test_flags_off_skip_families(self, site):
        image, labels = site
        out = fused_object_features(
            image, labels, MAX_CELLS,
            with_moments=False, with_zernike=False,
            with_edge=False, with_radial=False,
        )
        assert out["moments"] is None and out["zernike"] is None
        assert out["edge"] is None and out["radial"] is None
        assert out["shape"]["Area"].shape == (MAX_CELLS,)

    @pytest.mark.parametrize(
        "flags",
        [
            # mixed combinations shift the gathered-table column offsets
            # (o_bbox/o_rmax/o_mean/o_emean) — both the XLA lane fns
            # (enclosing-scope offsets) and the Pallas twins (cached
            # factory offsets, fused_measure._make_lanes_c_fn_t) must
            # agree for EVERY combination, not just all-on/all-off
            dict(with_moments=False),                      # shifts o_rmax
            dict(with_zernike=False),                      # radial keeps rmax
            dict(with_zernike=False, with_radial=False),   # drops rmax col
            dict(with_edge=False),                         # drops edge mean
            dict(with_moments=False, with_edge=False, with_radial=False),
        ],
    )
    def test_mixed_flag_combos_xla_equals_pallas(self, site, flags, monkeypatch):
        import jax

        image, labels = site
        base = fused_object_features(image, labels, MAX_CELLS, n_rings=4, **flags)
        monkeypatch.setenv("SAGUARO_FORCE_PALLAS", "1")
        jax.clear_caches()
        forced = fused_object_features(image, labels, MAX_CELLS, n_rings=4, **flags)
        monkeypatch.delenv("SAGUARO_FORCE_PALLAS")
        jax.clear_caches()

        def cmp(a, b, msg):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-3, err_msg=msg
            )

        for key in ("shape", "intensity", "moments", "edge", "radial"):
            xa, xb = base[key], forced[key]
            assert (xa is None) == (xb is None), key
            if xa is None:
                continue
            for k in xa:
                cmp(xa[k], xb[k], f"{flags} {key}/{k}")
        if base["zernike"] is not None:
            cmp(base["zernike"], forced["zernike"], f"{flags} zernike")
        # anchor against an independent oracle so a shared wrong offset
        # cannot pass: intensity means must match multichannel_stats
        ref_int, _ = multichannel_stats(image, labels, MAX_CELLS)
        cmp(
            base["intensity"]["MeanIntensity"],
            ref_int["MeanIntensity"],
            f"{flags} mean anchor",
        )

    def test_overflow_labels_routed_to_background(self, site):
        image, labels = site
        hot = labels.copy()
        hot[0:4, 0:4] = MAX_CELLS + 3  # overflow id must not corrupt cells
        a = fused_object_features(image, labels, MAX_CELLS)
        b = fused_object_features(image, hot, MAX_CELLS)
        np.testing.assert_allclose(
            np.asarray(a["shape"]["Area"])[1:], np.asarray(b["shape"]["Area"])[1:]
        )
