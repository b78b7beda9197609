"""CP 4.2.8 MeasureColocalization parity — kernels/colocalization.py and
the Overlap/K lanes of kernels/fused_measure.py vs the numpy transcription
oracle (tests/oracles.py cp_colocalization_oracle).

Reference contract: the CellProfiler engine's per-object
Correlation_<Stat>_<chA>_<chB> columns are consumed wholesale by the
profile stages (/root/reference/Normalize_CP_ami.py:47-64,
Pycyto_pertime.py:61-75).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tests.oracles import cp_colocalization_oracle, cp_linear_costes_oracle


def _grid_pair(rng, shape=(96, 96), scale=255, corr=0.6):
    """Two channels whose values lie exactly on the 1/scale grid (the
    regime where the Costes joint-table formulation is exact)."""
    fi = np.round(rng.random(shape) * scale) / scale
    si = np.round(
        np.clip(corr * fi + (1 - corr) * rng.random(shape), 0, 1) * scale
    ) / scale
    return fi.astype(np.float32), si.astype(np.float32)


def _labels(shape=(96, 96)):
    lab = np.zeros(shape, np.int32)
    lab[4:28, 6:30] = 1
    lab[36:70, 10:44] = 2
    lab[50:90, 55:92] = 3
    return lab


MAX_CELLS = 8


class TestDenseRanks:
    def test_matches_lexsort_dense_ranks(self):
        from saguaro_tpu.kernels.colocalization import dense_rank_images

        rng = np.random.default_rng(0)
        lab = _labels()
        vals = rng.integers(0, 5000, lab.shape + (2,)).astype(np.float32)
        inside = (lab > 0).reshape(-1)
        codes = jnp.asarray(vals.reshape(-1, 2).astype(np.int32))
        ranks, n_distinct = dense_rank_images(codes, jnp.asarray(inside))
        ranks = np.asarray(ranks)
        for c in range(2):
            v = vals.reshape(-1, 2)[inside, c]
            order = np.lexsort([v])
            uniq = np.hstack([[False], v[order][:-1] != v[order][1:]])
            dense = np.zeros(len(v), int)
            dense[order] = np.cumsum(uniq)
            np.testing.assert_array_equal(ranks[inside, c], dense)
            assert int(np.asarray(n_distinct)[c]) == len(np.unique(v))


class TestCostesThresholds:
    @pytest.mark.parametrize("fast", [True, False])
    def test_matches_linear_costes(self, fast):
        from saguaro_tpu.kernels.colocalization import costes_thresholds

        rng = np.random.default_rng(1)
        lab = _labels()
        fi, si = _grid_pair(rng)
        inside = lab.reshape(-1) > 0
        vals = np.stack([fi.reshape(-1), si.reshape(-1)], axis=1)
        thr_f, thr_s = costes_thresholds(
            jnp.asarray(vals), jnp.asarray(inside), ((0, 1),), scale=255,
            fast=fast,
        )
        ref_f, ref_s = cp_linear_costes_oracle(
            fi.reshape(-1)[inside].astype(np.float64),
            si.reshape(-1)[inside].astype(np.float64),
            255, fast,
        )
        # the stopping Pearson is f32 on-device vs f64 in scipy: allow
        # one threshold step of slack at the costReg ~ 0 crossing
        assert abs(float(thr_f[0]) - ref_f) <= 1.0 / 255 + 1e-6
        assert abs(float(thr_s[0]) - ref_s) <= abs(ref_s) * 0.15 + 1.0 / 255


class TestCostesFineRefine:
    @pytest.mark.parametrize("fast", [True, False])
    def test_uint16_resolution_matches_cp_descent(self, fast):
        """VERDICT r4 item #7: two-level Costes at the data's own
        resolution. uint16-grid inputs where the one-level 1/255 grid
        provably lands >= 1 fine step off CP's 1/65535 descent; the
        refinement must match the f64 oracle."""
        from saguaro_tpu.kernels.colocalization import (
            costes_fine_refine,
            costes_thresholds,
        )

        rng = np.random.default_rng(3)
        shape = (96, 96)
        raw_f = rng.integers(0, 60000, shape)
        raw_s = np.clip(
            0.55 * raw_f + 0.45 * rng.integers(0, 60000, shape), 0, 65535
        ).astype(np.int64)
        fi = (raw_f / 65535).astype(np.float32)
        si = (raw_s / 65535).astype(np.float32)
        lab = _labels(shape)
        inside = lab.reshape(-1) > 0
        vals = np.stack([fi.reshape(-1), si.reshape(-1)], axis=1)

        ref_f, ref_s = cp_linear_costes_oracle(
            fi.reshape(-1)[inside].astype(np.float64),
            si.reshape(-1)[inside].astype(np.float64),
            65535, fast,
        )
        coarse_f, _, (regs, _thr_k, prev_k) = costes_thresholds(
            jnp.asarray(vals), jnp.asarray(inside), ((0, 1),),
            scale=255, fast=fast, return_bracket=True,
        )
        fine_f, fine_s = costes_fine_refine(
            jnp.asarray(vals), jnp.asarray(inside), ((0, 1),),
            regs, prev_k, scale=255, fine=65535, fast=fast,
        )
        step = 1.0 / 65535
        # the coarse grid demonstrably cannot express the CP threshold
        assert abs(float(coarse_f[0]) - ref_f) > step
        # the refinement lands on it (a couple of steps of f32 slack at
        # the costReg ~ 0 crossing; measured exact on this fixture)
        assert abs(float(fine_f[0]) - ref_f) <= 2 * step
        assert abs(float(fine_s[0]) - ref_s) <= abs(ref_s) * 1e-3 + 2 * step

    def test_config_knob_runs_through_measurement(self):
        """costes_fine_scale=65535 rides FeatureConfig through the full
        measurement program."""
        from saguaro_tpu.pipeline.features import FeatureConfig, measure_site

        rng = np.random.default_rng(4)
        lab = np.zeros((64, 64), np.int32)
        lab[10:30, 10:30] = 1
        img = rng.integers(50, 60000, (64, 64, 2)).astype(np.uint16)
        cfg = FeatureConfig(
            channels=("DNA", "ER"), max_cells=4,
            measure_zernike=False, measure_moments=False,
            measure_convex=False, measure_radius=False,
            measure_texture=False, measure_radial=False,
            measure_neighbors=False, secondary_iterations=4,
            costes_fine_scale=65535,
        )
        tables = measure_site(img, lab, cfg)
        nuc = tables["Nuclei"]
        assert "Correlation_Costes_DNA_ER" in nuc.columns
        assert np.isfinite(nuc["Correlation_Costes_DNA_ER"]).all()


class TestColocalizationFeatures:
    @pytest.fixture(scope="class")
    def case(self):
        rng = np.random.default_rng(2)
        lab = _labels()
        fi, si = _grid_pair(rng)
        image = np.stack([fi, si], axis=-1)
        ref = cp_colocalization_oracle(fi, si, lab, thr_pct=15.0,
                                       scale_max=255, fast=True)
        return image, lab, ref

    def test_thresholded_families_match_oracle(self, case):
        from saguaro_tpu.kernels.colocalization import colocalization_features
        from saguaro_tpu.kernels.fused_measure import fused_object_features

        image, lab, ref = case
        fused = fused_object_features(
            jnp.asarray(image), jnp.asarray(lab), MAX_CELLS
        )
        res = colocalization_features(
            jnp.asarray(image), jnp.asarray(lab), fused["stats"][2],
            MAX_CELLS, thr_pct=15.0, costes_scale=255, costes_fast=True,
            integer_grid=False,
        )
        st = res[(0, 1)]
        n = int(lab.max())
        sl = slice(1, n + 1)
        np.testing.assert_allclose(
            np.asarray(st["M1"])[sl], ref["M1"], rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(st["M2"])[sl], ref["M2"], rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(st["RWC1"])[sl], ref["RWC1"], rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(st["RWC2"])[sl], ref["RWC2"], rtol=1e-5, atol=1e-6
        )
        # Costes: threshold grid exactness + one f32 step of slack
        np.testing.assert_allclose(
            np.asarray(st["C1"])[sl], ref["C1"], rtol=5e-3, atol=5e-3
        )
        np.testing.assert_allclose(
            np.asarray(st["C2"])[sl], ref["C2"], rtol=5e-3, atol=5e-3
        )

    def test_overlap_k_match_oracle(self, case):
        from saguaro_tpu.kernels.fused_measure import fused_object_features

        image, lab, ref = case
        fused = fused_object_features(
            jnp.asarray(image), jnp.asarray(lab), MAX_CELLS
        )
        ov, k1, k2 = (np.asarray(v) for v in fused["coloc_quad"][(0, 1)])
        n = int(lab.max())
        sl = slice(1, n + 1)
        np.testing.assert_allclose(ov[sl], ref["Overlap"], rtol=1e-5)
        np.testing.assert_allclose(k1[sl], ref["K1"], rtol=1e-5)
        np.testing.assert_allclose(k2[sl], ref["K2"], rtol=1e-5)

    def test_integer_grid_path(self, case):
        """Raw uint16-valued inputs take integer codes; the statistics are
        scale-invariant so they must match the [0,1]-scaled oracle."""
        from saguaro_tpu.kernels.colocalization import colocalization_features
        from saguaro_tpu.kernels.fused_measure import fused_object_features

        image, lab, ref = case
        raw = np.round(image * 65535.0).astype(np.float32)
        # oracle on the SAME raw data rescaled the CP way
        ref_raw = cp_colocalization_oracle(
            raw[..., 0] / 65535.0, raw[..., 1] / 65535.0, lab,
            thr_pct=15.0, scale_max=255, fast=True,
        )
        fused = fused_object_features(
            jnp.asarray(raw), jnp.asarray(lab), MAX_CELLS
        )
        res = colocalization_features(
            jnp.asarray(raw), jnp.asarray(lab), fused["stats"][2],
            MAX_CELLS, integer_grid=True,
        )
        st = res[(0, 1)]
        n = int(lab.max())
        sl = slice(1, n + 1)
        for k_ours, k_ref in [("M1", "M1"), ("M2", "M2"),
                              ("RWC1", "RWC1"), ("RWC2", "RWC2")]:
            np.testing.assert_allclose(
                np.asarray(st[k_ours])[sl], ref_raw[k_ref],
                rtol=1e-4, atol=1e-5, err_msg=k_ours,
            )
        np.testing.assert_allclose(
            np.asarray(st["C1"])[sl], ref_raw["C1"], rtol=5e-3, atol=5e-3
        )


class TestPipelineColumns:
    def test_columns_present_in_all_object_tables(self):
        from saguaro_tpu.pipeline.features import FeatureConfig, measure_site

        rng = np.random.default_rng(3)
        lab = np.zeros((64, 64), np.int32)
        lab[8:24, 8:24] = 1
        lab[36:56, 30:52] = 2
        img = rng.integers(100, 4000, (64, 64, 2)).astype(np.uint16)
        cfg = FeatureConfig(
            channels=("DNA", "ER"), max_cells=8,
            measure_zernike=False, measure_moments=False,
            measure_convex=False, measure_radius=False,
            secondary_iterations=4,
        )
        tables = measure_site(img, lab, cfg)
        for obj in ("Nuclei", "Cells", "Cytoplasm"):
            cols = tables[obj].columns
            for stat in ("Overlap", "K", "Manders", "RWC", "Costes"):
                assert f"Correlation_{stat}_DNA_ER" in cols, (obj, stat)
            for stat in ("K", "Manders", "RWC", "Costes"):
                assert f"Correlation_{stat}_ER_DNA" in cols, (obj, stat)
            assert np.isfinite(
                tables[obj].filter(like="Correlation_").to_numpy()
            ).all()
