"""End-to-end multi-plate timecourse (BASELINE.json config 5):

fake plates x timepoints -> feature extraction (4-table contract) ->
normalize -> cross-plate select + cosine -> induction hit calling,
entirely through the stage drivers on the bucket/plate/timepoint layout.
"""

import os

import numpy as np
import pandas as pd
import pytest

from saguaro_tpu.pipeline.feature_extraction import run_batch_processing
from saguaro_tpu.pipeline.features import FeatureConfig
from saguaro_tpu.pipeline.hits import run_induction_hit
from saguaro_tpu.pipeline.profile_stages import (
    run_feature_select_cosine,
    run_normalize_cp,
)

from .fixtures import make_fake_plate

PLATES = ["1", "2"]
TIMES = ["6", "24"]
CHANNELS = ("DNA", "GFP")


@pytest.fixture(scope="module")
def screen(tmp_path_factory):
    """A miniature screen: bucket/<plate>/<time> layout with images +
    LoadData CSVs + platemaps."""
    root = str(tmp_path_factory.mktemp("screen"))
    gt_by_job = {}
    for plate in PLATES:
        for t in TIMES:
            job_root = os.path.join(root, "images", plate, t)
            load_data, paths = make_fake_plate(
                job_root,
                n_wells=8,
                image_size=96,
                channels=CHANNELS,
                timepoint=t,
                plate=plate,
                seed=hash((plate, t)) % 2**31,
            )
            load_data.to_csv(os.path.join(root, f"load_data_{plate}_{t}.csv"), index=False)
            gt_by_job[(plate, t)] = (load_data, paths)
            if t == TIMES[0]:
                pm = pd.read_csv(paths["platemap"])
                pm["Metadata_Plate"] = plate
                pm.to_csv(os.path.join(root, f"Plate_{plate}_PlateMap.csv"), index=False)
    return root, gt_by_job


class TestTimecourseEndToEnd:
    def test_full_chain(self, screen):
        root, gt_by_job = screen

        # --- stage 1: feature extraction over the (plate x time) grid ---
        class GTSegmenter:
            """Replays ground-truth masks in LoadData row order per job."""

            def __init__(self):
                self.queue = []

            def load_job(self, plate, t):
                load_data, paths = gt_by_job[(plate, t)]
                self.queue = [
                    paths["gt_masks"][(row["Metadata_Well"], row["Metadata_Site"])]
                    for _, row in load_data.iterrows()
                ]

            def __call__(self, image):
                return self.queue.pop(0)

        seg = GTSegmenter()
        fcfg = FeatureConfig(
            channels=CHANNELS, max_cells=16, glcm_levels=8,
            measure_texture=True, measure_zernike=True,
        )

        def image_path_for_job(p, t):
            return f"images/{p}/{t}/Images"

        def load_data_key_for_job(p, t):
            seg.load_job(p, t)  # hook: refill GT masks for this job
            return f"load_data_{p}_{t}.csv"

        results = run_batch_processing(
            bucket_name=root,
            base_output_path=os.path.join(root, "cp_out"),
            plates=PLATES,
            times=TIMES,
            channels=list(CHANNELS),
            image_path_for_job=image_path_for_job,
            load_data_key_for_job=load_data_key_for_job,
            segmenter=seg,
            feature_cfg=fcfg,
        )
        assert len(results) == 4
        for (p, t), written in results.items():
            assert set(written) == {"Image", "Nuclei", "Cells", "Cytoplasm"}
            nuc = pd.read_csv(written["Nuclei"])
            assert len(nuc) > 0
            assert "Metadata_Well" in nuc.columns

        # --- stage 2: normalize per plate x timepoint ---
        # platemaps live alongside the CP outputs (reference layout:
        # {base_folder}/Plate_<id>_PlateMap.csv, Normalize_CP_ami.py:42)
        for plate in PLATES:
            pm = pd.read_csv(os.path.join(root, f"Plate_{plate}_PlateMap.csv"))
            pm.to_csv(os.path.join(root, "cp_out", f"Plate_{plate}_PlateMap.csv"), index=False)
        norm_paths = run_normalize_cp(
            bucket_name=root,
            base_folder="cp_out",
            plates=PLATES,
            times=TIMES,
            output_bucket=root,
            output_prefix="normalized",
        )
        assert len(norm_paths) == 4
        norm = pd.read_csv(norm_paths[0])
        assert "Metadata_Compound" in norm.columns
        feats = [c for c in norm.columns if "Metadata" not in c]
        assert len(feats) > 50  # intensity+shape+texture+zernike across 4 tables

        # --- stage 3: cross-plate selection + cosine ---
        sel_out = run_feature_select_cosine(
            bucket_name=root,
            base_folder="normalized",
            plates=PLATES,
            exp="E2E",
            output_bucket=root,
            output_prefix="selected",
            na_cutoff=0.5,
            corr_threshold=0.95,
        )
        dsig = pd.read_csv(sel_out["dsig"])
        kept = [c for c in dsig.columns if "Metadata" not in c]
        assert len(kept) > 0
        assert (dsig[kept].abs().max() <= 1 + 1e-6).all()
        assert set(dsig["Metadata_Timepoint"].astype(str).unique()) == set(TIMES)

        # --- stage 4: hit calling ---
        hits = run_induction_hit(
            bucket_name=root,
            features_key=f"selected/E2E_CP_features_selected_allTimes_dSig.csv",
            output_prefix="hits",
        )
        assert os.path.exists(hits["bioactivities"])
        bio = pd.read_csv(hits["bioactivities"])
        assert {"Metadata_Plate", "Metadata_Timepoint", "Metadata_Compound",
                "Metadata_ConcLevel", "induction_mean"} <= set(bio.columns)
        assert len(hits["plots"]) >= 3  # histograms + venn + heatmaps


class TestSpillResume:
    def test_pipeline_resumes_from_spill(self, tmp_path):
        from saguaro_tpu.models.cellpose import CellposeConfig
        from saguaro_tpu.models.effnetv2 import EffNetV2Config, StageSpec
        from saguaro_tpu.pipeline.segment_embed import (
            SegmentEmbedConfig,
            SegmentEmbedEngine,
            run_pipeline,
        )

        root = str(tmp_path / "plate")
        load_data, paths = make_fake_plate(root, n_wells=2, image_size=96)
        cfg = SegmentEmbedConfig(
            channels=["DNA", "GFP"], diameter=None, box_size=40, max_cells=32,
            embed_chunk=8, embed_size=64, flow_iters=40, min_size=5,
            cellpose=CellposeConfig(tile=96, features=(8, 16, 32, 64)),
            effnet=EffNetV2Config(
                stem_filters=8,
                stages=(StageSpec("fused", 1, 3, 1, 8, 1),
                        StageSpec("mbconv", 2, 3, 2, 16, 1, 0.25)),
                head_filters=1280, input_size=64,
            ),
        )
        engine = SegmentEmbedEngine(cfg)
        spill = str(tmp_path / "spill")
        out1 = run_pipeline(
            load_data, paths["images"], cfg, str(tmp_path / "a.parquet"),
            engine=engine, spill_dir=spill,
        )
        counts1 = pd.read_csv(out1["counts"])
        assert os.path.exists(os.path.join(spill, "sites.jsonl"))

        # second run: all sites come from the spill (no recompute) — break
        # the engine to prove nothing is recomputed
        engine.segment_batch = None  # type: ignore[assignment]
        out2 = run_pipeline(
            load_data, paths["images"], cfg, str(tmp_path / "b.parquet"),
            engine=engine, spill_dir=spill,
        )
        counts2 = pd.read_csv(out2["counts"])
        pd.testing.assert_frame_equal(counts1, counts2)

        # review scenario: the row ORDER changes between runs (e.g. a QC
        # re-filter) — content-keyed spill must still attach each site's
        # cached features to the right well, not the right position
        reordered = load_data.iloc[::-1].reset_index(drop=True)
        out3 = run_pipeline(
            reordered, paths["images"], cfg, str(tmp_path / "c.parquet"),
            engine=engine, spill_dir=spill,
        )
        counts3 = pd.read_csv(out3["counts"]).sort_values("Metadata_Well").reset_index(drop=True)
        ref = counts1.sort_values("Metadata_Well").reset_index(drop=True)
        pd.testing.assert_series_equal(counts3["Cell_Count"], ref["Cell_Count"])
