"""CLI surface tests: each entry point drives its stage on local fixtures."""

import os

import numpy as np
import pandas as pd
import pytest

from saguaro_tpu.io import tiff

from .fixtures import make_fake_plate


@pytest.fixture(scope="module")
def plate(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cliplate"))
    return make_fake_plate(root, n_wells=2, image_size=96)


class TestIlluminationQCCli:
    def test_appends_qc_columns(self, plate, tmp_path):
        from saguaro_tpu.cli.illumination_qc import main

        load_data, paths = plate
        out = str(tmp_path / "QC_Results.csv")
        main([
            "--load-data", paths["load_data"],
            "--data-path", paths["images"],
            "--illum-path", paths["root"],
            "--channels", "DNA", "GFP",
            "--output", out,
        ])
        df = pd.read_csv(out)
        for ch in ("DNA", "GFP"):
            assert f"ImageQuality_PowerLogLogSlope_{ch}" in df.columns
            assert f"ImageQuality_PercentMaximal_{ch}" in df.columns
        assert len(df) == len(load_data)
        # structured images -> negative power-log-log slope
        assert (df["ImageQuality_PowerLogLogSlope_DNA"] < 0).all()


class TestRebinCli:
    def test_rebin_outputs(self, plate):
        from saguaro_tpu.cli.rebin import main

        _, paths = plate
        main([
            "--bucket_name", paths["root"],
            "--image_folder", "Images/",
            "--resolution", "48",
        ])
        # reference rewrite is a literal 'Image' -> 'Image_binned' replace,
        # so an 'Images' folder becomes 'Image_binneds' (reference quirk,
        # Image_re-binning.py:53)
        binned_dir = paths["images"].replace("Image", "Image_binned")
        outs = [f for f in os.listdir(binned_dir)]
        assert len(outs) > 0
        img = tiff.imread(os.path.join(binned_dir, outs[0]))
        assert img.shape == (48, 48)


class TestMaxProjectionCli:
    def test_projects_groups(self, tmp_path):
        from saguaro_tpu.cli.max_projection import main

        root = tmp_path / "proj"
        (root / "Images").mkdir(parents=True)
        rng = np.random.default_rng(0)
        rows = []
        for ch in range(2):
            for p in range(3):
                name = f"ch{ch}_p{p}.tiff"
                tiff.imwrite(str(root / "Images" / name),
                             rng.integers(0, 4000, (64, 64)).astype(np.uint16))
        # interleaved rows: plane-major groups of channels*planes
        for p in range(3):
            for ch in range(2):
                rows.append({
                    "PlateID": "P1",
                    "Image_PathName": "Images",
                    "Image_FileName": f"ch{ch}_p{p}.tiff",
                })
        pd.DataFrame(rows).to_csv(root / "index.csv", index=False)
        main([
            "--bucket_data_set", str(root),
            "--data_set", "index.csv",
            "--channels", "2",
            "--planes", "3",
            "--bucket_images", str(root),
        ])
        stacked = root / "ImagesStacked"
        assert sorted(os.listdir(stacked)) == ["ch0_p0.tiff", "ch1_p0.tiff"]
        proj = tiff.imread(str(stacked / "ch0_p0.tiff"))
        expected = np.maximum.reduce([
            tiff.imread(str(root / "Images" / f"ch0_p{p}.tiff")) for p in range(3)
        ])
        np.testing.assert_array_equal(proj, expected)


def _write_cp_tables(root, plate="Plate_1", time="6", n_wells=8, n_feats=6, seed=0):
    """Synthetic CP 4-table layout under root/<plate>/<time>/."""
    rng = np.random.default_rng(seed)
    wells = [f"A{i+1:02}" for i in range(n_wells)]
    out_dir = os.path.join(root, plate, time)
    os.makedirs(out_dir, exist_ok=True)
    image_rows = []
    obj_rows = {name: [] for name in ("Nuclei", "Cells", "Cytoplasm")}
    img_num = 0
    for w in wells:
        img_num += 1
        image_rows.append({
            "ImageNumber": img_num, "Metadata_Well": w, "Metadata_Site": 1,
            "Count_Nuclei": rng.integers(5, 50),
            "Intensity_MeanIntensity_DNA": rng.random(),
        })
        for name in obj_rows:
            for o in range(3):
                obj_rows[name].append({
                    "ImageNumber": img_num, "ObjectNumber": o + 1,
                    **{f"Feat_{k}": rng.normal() for k in range(n_feats)},
                })
    pd.DataFrame(image_rows).to_csv(os.path.join(out_dir, "Image.csv"), index=False)
    for name, rows in obj_rows.items():
        pd.DataFrame(rows).to_csv(os.path.join(out_dir, f"{name}.csv"), index=False)
    compounds = ["DMSO", "DMSO", "DMSO"] + [f"drug{i}" for i in range(n_wells - 3)]
    # reference platemap naming: Plate_<id>_PlateMap.csv with bare plate ids
    pd.DataFrame({
        "Metadata_Compound": compounds[:n_wells],
        "Metadata_ConcLevel": [1] * n_wells,
        "Metadata_Well": wells,
        "Metadata_Plate": [plate] * n_wells,
    }).to_csv(os.path.join(root, f"Plate_{plate}_PlateMap.csv"), index=False)


class TestProfileCliChain:
    def test_normalize_select_hits(self, tmp_path):
        root = str(tmp_path)
        _write_cp_tables(root, plate="1")

        from saguaro_tpu.cli.normalize_cp import main as normalize_main

        normalize_main([
            "--bucket_name", root,
            "--base_folder", ".",
            "--plates", "1",
            "--times", "6",
            "--output_bucket", root,
            "--output_prefix", "normalized",
        ])
        norm_path = os.path.join(root, "normalized", "1", "Normalized_features_6.csv")
        assert os.path.exists(norm_path)
        norm = pd.read_csv(norm_path)
        assert "Metadata_Compound" in norm.columns
        assert any(c.startswith("DNA_") for c in norm.columns)

        from saguaro_tpu.cli.feature_select_cosine import main as select_main

        select_main([
            "--bucket_name", root,
            "--base_folder", "normalized",
            "--plates", "1",
            "--exp", "TestExp",
            "--output_bucket", root,
            "--output_prefix", "selected",
            "--corr_3hold", "0.95",
        ])
        dsig_path = os.path.join(root, "selected", "TestExp_CP_features_selected_allTimes_dSig.csv")
        assert os.path.exists(dsig_path)
        dsig = pd.read_csv(dsig_path)
        feats = [c for c in dsig.columns if "Metadata" not in c]
        assert len(feats) > 0
        assert (dsig[feats].abs().max() <= 1.0 + 1e-6).all()
        avg_path = os.path.join(root, "selected", "TestExp_Average_cosine_similarity.csv")
        assert os.path.exists(avg_path)

        from saguaro_tpu.cli.induction_hit import main as hit_main

        hit_main([
            "--bucket_name", root,
            "--features_key", "selected/TestExp_CP_features_selected_allTimes_dSig.csv",
            "--output_prefix", "hits",
        ])
        assert os.path.exists(os.path.join(root, "hits", "Bioactivities_per_plate_doses.csv"))
        assert os.path.exists(os.path.join(root, "hits", "venn_all_vs_bioactive.png"))

    def test_pycyto_pertime(self, tmp_path):
        root = str(tmp_path)
        _write_cp_tables(root, plate="PlateX", time="6")
        # pertime layout: tables under base_folder/<time>/ with metadata merge
        from saguaro_tpu.cli.pycyto_pertime import main

        # add the metadata columns pycyto backfills from Image.csv
        img = pd.read_csv(os.path.join(root, "PlateX", "6", "Image.csv"))
        img["Metadata_Plate"] = "PlateX"
        img["Metadata_Timepoint"] = "6"
        img["Metadata_Compound"] = ["DMSO"] * 3 + [f"drug{i}" for i in range(len(img) - 3)]
        img["Metadata_ConcLevel"] = 1
        img.to_csv(os.path.join(root, "PlateX", "6", "Image.csv"), index=False)

        main([
            "--bucket_name", root,
            "--base_folder", "PlateX",
            "--times", "6",
            "--output_bucket", root,
            "--output_prefix", "pertime",
        ])
        sel = os.path.join(root, "pertime", "6", "CP_features_selected.csv")
        assert os.path.exists(sel)
        assert os.path.exists(os.path.join(root, "pertime", "6", "CPfeatures_average_cosine_similarity.csv"))

    def test_concat_cp(self, tmp_path):
        root = str(tmp_path)
        _write_cp_tables(root, plate="P", time="6h")
        from saguaro_tpu.cli.concat_cp import main

        main([
            "--bucket_name", root,
            "--base_folder", "P",
            "--output_bucket", root,
            "--output_prefix", "concat",
            "--times", "6h",
        ])
        for ft in ("image", "nuclei", "cells", "cytoplasm"):
            assert os.path.exists(os.path.join(root, "concat", f"concatenated_{ft}.csv"))
