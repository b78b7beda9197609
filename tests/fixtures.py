"""Fake-plate fixture generator (SURVEY.md §4 item 3).

Builds a miniature screening plate on local disk following the reference's
folder + LoadData contract (reference README.md:81-113): per-site channel
TIFFs, per-channel ``<ch>_illum.npy`` functions, a LoadData CSV with
``FileName_<ch>`` + ``Metadata_*`` columns, and a platemap CSV.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from saguaro_tpu.io import tiff


def make_fake_plate(
    root: str,
    n_wells: int = 4,
    sites_per_well: int = 1,
    channels: tuple[str, ...] = ("DNA", "GFP"),
    image_size: int = 96,
    cells_per_site: int = 3,
    cell_radius: int = 8,
    timepoint: str = "6",
    plate: str = "Plate_1",
    seed: int = 0,
):
    """Returns (load_data_df, paths dict). Images contain bright disks
    (cells) over noise so segmentation/QC have real structure."""
    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "Images")
    os.makedirs(img_dir, exist_ok=True)

    rows = []
    gt_masks = {}
    for wi in range(n_wells):
        well = f"{chr(65 + wi // 24)}{wi % 24 + 1:02}"
        for si in range(1, sites_per_well + 1):
            labels = np.zeros((image_size, image_size), np.int32)
            yy, xx = np.meshgrid(np.arange(image_size), np.arange(image_size), indexing="ij")
            margin = cell_radius + 2
            for ci in range(cells_per_site):
                cy = rng.integers(margin, image_size - margin)
                cx = rng.integers(margin, image_size - margin)
                m = (yy - cy) ** 2 + (xx - cx) ** 2 <= cell_radius**2
                labels[m] = ci + 1
            gt_masks[(well, si)] = labels
            row = {
                "Metadata_Plate": plate,
                "Metadata_Well": well,
                "Metadata_Site": si,
                "Metadata_Timepoint": timepoint,
            }
            for ch in channels:
                base = rng.integers(80, 120, (image_size, image_size)).astype(np.uint16)
                signal = (labels > 0).astype(np.uint16) * rng.integers(1500, 2500)
                img = (base + signal).astype(np.uint16)
                fname = f"{well}_s{si}_{ch}.tiff"
                tiff.imwrite(os.path.join(img_dir, fname), img)
                row[f"FileName_{ch}"] = fname
            rows.append(row)

    load_data = pd.DataFrame(rows)
    load_data_path = os.path.join(root, "load_data.csv")
    load_data.to_csv(load_data_path, index=False)

    for ch in channels:
        np.save(os.path.join(root, f"{ch}_illum.npy"), np.ones((image_size, image_size), np.float32))

    compounds = ["DMSO", "drugA", "drugB", "drugC"]
    platemap = pd.DataFrame({
        "Metadata_Compound": [compounds[i % len(compounds)] for i in range(n_wells)],
        "Metadata_ConcLevel": [1 + i % 3 for i in range(n_wells)],
        "Metadata_Well": load_data["Metadata_Well"].unique()[:n_wells],
        "Metadata_Plate": plate,
    })
    platemap_path = os.path.join(root, f"{plate}_PlateMap.csv")
    platemap.to_csv(platemap_path, index=False)

    return load_data, {
        "root": root,
        "images": img_dir,
        "load_data": load_data_path,
        "platemap": platemap_path,
        "gt_masks": gt_masks,
    }
