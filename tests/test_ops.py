"""Golden tests for the profile-math stack (pycytominer/sklearn parity)."""

import numpy as np
import pandas as pd
import pytest

from saguaro_tpu.ops import (
    annotate,
    double_sigmoid,
    feature_select,
    group_cosine_similarity,
    hit_calling,
    induction_scores,
    normalize_profiles,
    pairwise_cosine,
)
from saguaro_tpu.ops.aggregate import (
    backfill_metadata,
    compensate_missing_sites,
    failing_image_numbers,
    merge_tables,
    prefix_features,
)
from saguaro_tpu.ops.normalize import mad_robustize
from saguaro_tpu.ops.select import nan_aware_correlation

from . import oracles


class TestDoubleSigmoid:
    def test_matches_oracle(self, rng):
        x = rng.normal(size=(100,)).astype(np.float32) * 5
        got = np.asarray(double_sigmoid(x))
        np.testing.assert_allclose(got, oracles.double_sigmoid_oracle(x), rtol=1e-5)

    def test_soft_clip_range(self):
        x = np.array([-100.0, 0.0, 100.0], dtype=np.float32)
        y = np.asarray(double_sigmoid(x))
        assert y[0] == pytest.approx(-1, abs=1e-4)
        assert y[1] == 0
        assert y[2] == pytest.approx(1, abs=1e-4)


class TestMadRobustize:
    def test_matches_oracle(self, rng):
        vals = rng.normal(10, 3, size=(60, 8)).astype(np.float64)
        mask = np.zeros(60, dtype=bool)
        mask[:20] = True
        got = np.asarray(mad_robustize(vals.astype(np.float32), mask))
        expected = oracles.mad_robustize_oracle(vals, mask)
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)

    def test_with_nans(self, rng):
        vals = rng.normal(size=(40, 4))
        vals[::7, 2] = np.nan
        mask = np.ones(40, dtype=bool)
        got = np.asarray(mad_robustize(vals.astype(np.float32), mask))
        expected = oracles.mad_robustize_oracle(vals, mask)
        np.testing.assert_allclose(got[:, :2], expected[:, :2], rtol=1e-4)
        finite = ~np.isnan(expected[:, 2])
        np.testing.assert_allclose(got[finite, 2], expected[finite, 2], rtol=1e-4)


class TestNormalizeProfiles:
    def test_dmso_query(self, rng):
        df = pd.DataFrame({
            "Metadata_Compound": ["DMSO"] * 10 + ["drugA"] * 10,
            "Metadata_Timepoint": ["6"] * 20,
            "feat_a": rng.normal(5, 2, 20),
            "feat_b": rng.normal(-1, 0.5, 20),
        })
        out = normalize_profiles(
            df, samples_query="Metadata_Compound == 'DMSO' and Metadata_Timepoint == '6'"
        )
        mask = np.arange(20) < 10
        expected = oracles.mad_robustize_oracle(df[["feat_a", "feat_b"]].to_numpy(), mask)
        np.testing.assert_allclose(
            out[["feat_a", "feat_b"]].to_numpy(), expected, rtol=1e-3, atol=1e-4
        )
        # metadata preserved, metadata-first ordering
        assert list(out.columns[:2]) == ["Metadata_Compound", "Metadata_Timepoint"]


class TestAnnotate:
    def test_platemap_join(self):
        profiles = pd.DataFrame({"Metadata_Well": ["A01", "A02"], "f": [1.0, 2.0]})
        platemap = pd.DataFrame({
            "Metadata_Compound": ["DMSO", "drugA"],
            "Metadata_ConcLevel": [0, 3],
            "Metadata_Well": ["A01", "A02"],
            "Metadata_Plate": ["P1", "P1"],
        })
        out = annotate(profiles, platemap)
        assert len(out) == 2
        assert out.loc[out.Metadata_Well == "A02", "Metadata_Compound"].item() == "drugA"
        assert list(out.columns[:4]) == list(platemap.columns)


class TestCosine:
    def test_pairwise_matches_sklearn(self, rng):
        x = rng.normal(size=(12, 30)).astype(np.float32)
        got = np.asarray(pairwise_cosine(x))
        np.testing.assert_allclose(got, oracles.cosine_similarity_oracle(x), rtol=1e-4, atol=1e-5)

    def test_group_means(self, rng):
        n_per = [3, 2, 4, 1]
        rows, meta = [], []
        for g, n in enumerate(n_per):
            for _ in range(n):
                rows.append(rng.normal(size=8))
                meta.append((f"cmp{g}", "6", g))
        df = pd.DataFrame(rows, columns=[f"f{i}" for i in range(8)])
        df["Metadata_Compound"] = [m[0] for m in meta]
        df["Metadata_Timepoint"] = [m[1] for m in meta]
        df["Metadata_ConcLevel"] = [m[2] for m in meta]
        avg, raw = group_cosine_similarity(df)
        assert len(avg) == 4
        # oracle per group
        for g, n in enumerate(n_per):
            sub = df[df["Metadata_Compound"] == f"cmp{g}"][[f"f{i}" for i in range(8)]].to_numpy()
            sims = oracles.cosine_similarity_oracle(sub)
            iu = np.triu_indices(n, k=1)
            expected = np.mean(sims[iu]) if iu[0].size else np.nan
            got = avg.loc[avg["Metadata_Compound"] == f"cmp{g}", "average_cosine_similarity"].item()
            if np.isnan(expected):
                assert np.isnan(got)
            else:
                np.testing.assert_allclose(got, expected, rtol=1e-4)
        # raw records carry each group's member row labels, as the
        # reference stores group.index (Pycyto_pertime.py:150-156)
        for g, n in enumerate(n_per):
            rec = next(r for r in raw if r["Metadata_Compound"] == f"cmp{g}")
            expected_idx = list(df.index[df["Metadata_Compound"] == f"cmp{g}"])
            assert sorted(rec["Replicates"]) == expected_idx


class TestFeatureSelect:
    def test_variance_threshold_drops_constant(self, rng):
        n = 30
        df = pd.DataFrame({
            "Metadata_Well": [f"A{i:02}" for i in range(n)],
            "const": np.ones(n),
            "nearly_const": np.r_[np.ones(n - 1), 2.0],  # 1/29 < 0.05 freq_cut
            "borderline": np.r_[np.ones(n - 2), 2.0, 2.0],  # 2/28 > 0.05, but 2/30 unique... kept by freq
            "ok": rng.normal(size=n),
        })
        out = feature_select(df, operation=["variance_threshold"])
        assert "const" not in out.columns
        assert "nearly_const" not in out.columns
        assert "borderline" in out.columns  # 2/28 = 0.071 >= freq_cut, 2/30 unique ratio 0.067 >= 0.01
        assert "ok" in out.columns

    def test_drop_na_columns(self, rng):
        df = pd.DataFrame({
            "Metadata_Well": list("abcdefghij"),
            "mostly_nan": [np.nan] * 8 + [1.0, 2.0],
            "few_nan": [np.nan] + list(rng.normal(size=9)),
        })
        out = feature_select(df, operation=["drop_na_columns"], na_cutoff=0.5)
        assert "mostly_nan" not in out.columns
        assert "few_nan" in out.columns

    def test_correlation_threshold(self, rng):
        base = rng.normal(size=100)
        df = pd.DataFrame({
            "Metadata_Well": [f"w{i}" for i in range(100)],
            "a": base,
            "b": base + rng.normal(scale=1e-3, size=100),  # ~perfectly corr with a
            "c": rng.normal(size=100),
        })
        out = feature_select(df, operation=["correlation_threshold"], corr_threshold=0.9)
        kept = [c for c in out.columns if c in ("a", "b", "c")]
        assert "c" in kept
        assert len([k for k in kept if k in ("a", "b")]) == 1  # one of the pair dropped

    def test_drop_outliers(self, rng):
        df = pd.DataFrame({
            "Metadata_Well": list("abcd"),
            "huge": [1.0, 2.0, 3.0, 1e6],
            "fine": [1.0, 2.0, 3.0, 4.0],
        })
        out = feature_select(df, operation=["drop_outliers"])
        assert "huge" not in out.columns
        assert "fine" in out.columns

    def test_nan_aware_corr_matches_pandas(self, rng):
        x = rng.normal(size=(50, 6))
        x[rng.random((50, 6)) < 0.1] = np.nan
        got = nan_aware_correlation(x.astype(np.float32))
        expected = pd.DataFrame(x).corr().to_numpy()
        np.testing.assert_allclose(got, expected, rtol=1e-3, atol=2e-3)


class TestInduction:
    def _profiles(self, rng):
        rows = []
        for plate in ["P1"]:
            for tp in ["6", "24"]:
                for w in range(20):
                    compound = "DMSO" if w < 10 else f"drug{w % 3}"
                    feats = rng.uniform(0, 1, 10)
                    rows.append({
                        "Metadata_Plate": plate, "Metadata_Well": f"W{w:02}",
                        "Metadata_Timepoint": tp, "Metadata_Compound": compound,
                        "Metadata_ConcLevel": 1,
                        **{f"f{i}": feats[i] for i in range(10)},
                    })
        return pd.DataFrame(rows)

    def test_induction_score(self, rng):
        df = self._profiles(rng)
        scores = induction_scores(df, induction_threshold=0.5)
        feats = df[[f"f{i}" for i in range(10)]].to_numpy()
        expected = (feats > 0.5).sum(axis=1) / 10
        np.testing.assert_allclose(scores.to_numpy(), expected, rtol=1e-6)

    def test_hit_calling(self, rng):
        df = self._profiles(rng)
        ind_mean, thresholds, sig_ind = hit_calling(
            df, bioactive_threshold_quantile=0.5, induction_threshold=0.5
        )
        assert set(ind_mean.columns) == {
            "Metadata_Plate", "Metadata_Timepoint", "Metadata_Compound",
            "Metadata_ConcLevel", "induction_mean", "Bioactive",
        }
        assert ("P1", "6") in thresholds
        # DMSO never appears in ind_mean
        assert not (ind_mean["Metadata_Compound"] == "DMSO").any()


class TestAggregate:
    def test_backfill_and_qc(self):
        image = pd.DataFrame({
            "ImageNumber": [1, 2, 3],
            "Metadata_Well": ["A01", "A01", "A02"],
            "Metadata_Site": [1, 2, 1],
            "ImageQC_Blurry": [0, 1, 0],
        })
        nuclei = pd.DataFrame({"ImageNumber": [1, 2, 3], "AreaShape_Area": [10, 20, 30]})
        failing = failing_image_numbers(image)
        assert list(failing) == [2]
        filled = backfill_metadata(nuclei, image)
        assert "Metadata_Well" in filled.columns

    def test_prefix_and_merge(self):
        a = pd.DataFrame({"Metadata_Well": ["A01"], "Area": [1.0]})
        b = pd.DataFrame({"Metadata_Well": ["A01"], "Area": [2.0]})
        merged = merge_tables({
            "Nuclei": prefix_features(a, "DNA_"),
            "Cells": prefix_features(b, "Cell_"),
        })
        assert set(merged.columns) == {"Metadata_Well", "DNA_Area", "Cell_Area"}

    def test_missing_site_compensation(self):
        df = pd.DataFrame({
            "Metadata_Well": ["A01", "A01", "A02"],
            "Metadata_Site": [1, 2, 1],
            "Count_Cells": np.array([10, 20, 30], dtype=np.int64),
            "Intensity_Mean": [1.0, 2.0, 3.0],
        })
        out = compensate_missing_sites(df)
        # A02 has 1 of max 2 sites -> integer features scaled 2x
        a02 = out[out["Metadata_Well"] == "A02"]
        assert a02["Count_Cells"].item() == 60
        assert a02["Intensity_Mean"].item() == 3.0
