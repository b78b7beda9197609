"""Pixel-stage drivers: max projection, re-binning, illumination QC.

Each driver mirrors one reference CLI's contract (inputs, outputs, path
rewrites) while the math runs as batched jitted device programs:

* max projection (MaxProjection.py): groups of channels x planes from an
  index CSV; writes TIFFs under an ``ImagesStacked/`` rewrite of the first
  plane's path (:16-22,45-52). Same-shape groups are batched into one
  device reduction.
* re-binning (Image_re-binning.py): every image under a prefix resized to
  resolution^2, LZW TIFF under an ``Image``->``Image_binned`` rewrite
  (:18-21,53-55).
* illumination QC (Illumination_QC_mult.py): per-site, per-channel
  PowerLogLogSlope + PercentMaximal appended to the LoadData CSV
  (:219-226), with per-channel illum division when shapes match
  (:149-153) and QC_Error_<ch> strings on failures (:141-160).
"""

from __future__ import annotations

import logging
import posixpath
from collections import defaultdict

import numpy as np
import pandas as pd

from saguaro_tpu.io import storage, tiff
from saguaro_tpu.io.loaddata import load_illum_functions
from saguaro_tpu.kernels.maxproj import max_project_batch
from saguaro_tpu.kernels.qc import qc_metrics_batch
from saguaro_tpu.kernels.resample import lanczos_resize_batch

logger = logging.getLogger("saguaro_tpu.pixel_stages")

__all__ = [
    "modify_imagepath",
    "run_max_projection",
    "run_rebin",
    "run_illumination_qc",
]


def bucket_path(bucket: str, key: str = "") -> str:
    """Reference scripts address everything as (bucket, key); map that to a
    storage path: URL buckets and absolute/local dirs join directly,
    bare names become s3:// buckets."""
    if not key:
        return bucket
    if "://" in bucket or bucket.startswith("/") or bucket.startswith("."):
        return storage.join(bucket, key)
    return storage.join(f"s3://{bucket}", key)


def modify_imagepath(filepath: str) -> str:
    """Images/ -> ImagesStacked/ path rewrite (MaxProjection.py:16-22)."""
    parts = filepath.split("/")
    if "Images" not in parts:
        return filepath
    parts[parts.index("Images")] = "ImagesStacked"
    return "/".join(parts)


def run_max_projection(
    bucket_data_set: str,
    data_set: str,
    channels: int,
    planes: int,
    bucket_images: str,
    batch_size: int = 16,
) -> int:
    """Max-project plate z-stacks; returns #projections written.

    Same-shape channel groups are stacked and reduced in device batches
    instead of one boto3 round-trip per group.
    """
    df = storage.read_csv_sniffed(bucket_path(bucket_data_set, data_set))
    group_size = channels * planes
    n_written = 0

    # gather (output_key, [plane paths]) tasks, preserving the reference's
    # grouping: consecutive chunk of channels*planes rows per field
    tasks: list[tuple[str, list[str]]] = []
    for plate in df["PlateID"].unique():
        sub = df[df["PlateID"] == plate]
        for i in range(0, len(sub), group_size):
            chunk = sub.iloc[i : i + group_size]
            if len(chunk) < group_size:
                logger.warning("Skipping incomplete chunk in plate %s at %d", plate, i)
                continue
            for j in range(channels):
                try:
                    group = [
                        posixpath.join(
                            chunk.iloc[j + (p * channels)].Image_PathName,
                            chunk.iloc[j + (p * channels)].Image_FileName,
                        )
                        for p in range(planes)
                    ]
                    tasks.append((modify_imagepath(group[0]), group))
                except Exception as e:
                    logger.error("Error grouping %d in chunk %d plate %s: %s", j, i, plate, e)

    # batch same-shape stacks together for one device launch each
    pending: dict[tuple, list[tuple[str, np.ndarray]]] = defaultdict(list)

    def flush(shape_key):
        nonlocal n_written
        items = pending.pop(shape_key, [])
        if not items:
            return
        stacks = np.stack([s for _, s in items])
        projs = np.asarray(max_project_batch(stacks))
        for (out_key, _), proj in zip(items, projs):
            tiff.imwrite(bucket_path(bucket_images, out_key), proj)
            n_written += 1

    for out_key, group in tasks:
        try:
            planes_np = [tiff.imread(bucket_path(bucket_images, p)) for p in group]
            if not all(p.shape == planes_np[0].shape for p in planes_np):
                raise ValueError(f"Image shape mismatch in group: {group}")
            stack = np.stack(planes_np)
            key = (stack.shape, stack.dtype.str)
            pending[key].append((out_key, stack))
            if len(pending[key]) >= batch_size:
                flush(key)
        except Exception as e:
            logger.error("Error processing group %s: %s", out_key, e)
    for key in list(pending):
        flush(key)
    return n_written


VALID_EXTENSIONS = (".png", ".jpg", ".jpeg", ".tif", ".tiff")


def _rebin_backend():
    """Fused Pallas re-binner on TPU (2x the XLA two-matmul path — no HBM
    intermediate, banded contraction); XLA elsewhere / on kernel failure."""
    import jax

    if jax.default_backend() != "tpu":
        return lanczos_resize_batch

    from saguaro_tpu.kernels.resample_pallas import lanczos_resize_batch_pallas

    def resize(batch, out_shape):
        try:
            return lanczos_resize_batch_pallas(batch, out_shape)
        except Exception:
            logger.warning("Pallas re-binner failed; falling back to XLA", exc_info=True)
            return lanczos_resize_batch(batch, out_shape)

    return resize


def run_rebin(
    bucket_name: str,
    image_folder: str,
    resolution: int = 1080,
    batch_size: int = 16,
) -> int:
    """Re-bin every image under the prefix; returns #images written."""
    if not image_folder.endswith("/"):
        image_folder += "/"
    prefix = bucket_path(bucket_name, image_folder)
    n_done = 0
    pending: dict[tuple, list[tuple[str, np.ndarray]]] = defaultdict(list)

    resize = _rebin_backend()
    # the reference rewrites only the S3 KEY, never the bucket
    # (Image_re-binning.py:53) — scope the replace to the path from the
    # image_folder onward so a base dir containing 'Image' is never renamed
    folder_marker = image_folder.strip("/").split("/")[-1] or image_folder

    def rewrite(key: str) -> str:
        # from the folder onward (folder + filename), replace like the
        # reference's obj.key.replace; everything before stays untouched
        idx = key.find(folder_marker)
        if idx < 0:
            return key.replace("Image", "Image_binned")
        return key[:idx] + key[idx:].replace("Image", "Image_binned")

    def flush(shape_key):
        nonlocal n_done
        items = pending.pop(shape_key, [])
        if not items:
            return
        batch = np.stack([im for _, im in items])
        out = np.asarray(resize(batch, (resolution, resolution)))
        for (key, _), img in zip(items, out):
            tiff.imwrite(rewrite(key), img, compression="lzw")
            n_done += 1

    for path in storage.list_prefix(prefix):
        if path.endswith("/") or not path.lower().endswith(VALID_EXTENSIONS):
            continue
        try:
            img = tiff.imread(path)
            key = (img.shape, img.dtype.str)
            pending[key].append((path, img))
            if len(pending[key]) >= batch_size:
                flush(key)
        except Exception:
            logger.error("Failed to process '%s'", path, exc_info=True)
    for key in list(pending):
        flush(key)
    return n_done


def run_illumination_qc(
    load_data: str,
    data_path: str,
    channels: list[str],
    output: str,
    illum_path: str | None = None,
    batch_size: int = 24,
) -> pd.DataFrame:
    """Append ImageQuality_* columns to the LoadData CSV; returns the df.

    The reference fans 24 threads over scipy (Illumination_QC_mult.py:212);
    here same-shape corrected images are batched into single fused QC
    launches (FFT + ring sums + slope + saturation in one program).
    """
    df = storage.read_csv_sniffed(load_data)
    drop = [c for c in df.columns if "ImageQuality_" in c or "QC_Error" in c]
    if drop:
        df = df.drop(columns=drop)

    illum = (
        load_illum_functions(illum_path, channels) if illum_path else [None] * len(channels)
    )

    results: dict[int, dict] = defaultdict(dict)
    pending: dict[tuple, list[tuple[int, str, np.ndarray]]] = defaultdict(list)

    def flush(shape_key):
        items = pending.pop(shape_key, [])
        if not items:
            return
        batch = np.stack([im for _, _, im in items])
        slopes, pcts = qc_metrics_batch(batch)
        slopes, pcts = np.asarray(slopes), np.asarray(pcts)
        for (idx, ch, _), s, p in zip(items, slopes, pcts):
            results[idx][f"ImageQuality_PowerLogLogSlope_{ch}"] = float(s)
            results[idx][f"ImageQuality_PercentMaximal_{ch}"] = float(p)

    for idx, row in df.iterrows():
        for i, ch in enumerate(channels):
            path = bucket_path(data_path, str(row[f"FileName_{ch}"]))
            try:
                if not storage.exists(path):
                    results[idx][f"QC_Error_{ch}"] = "File Not Found"
                    continue
                img = tiff.imread(path).astype(np.float32)
                if illum[i] is not None and img.shape == illum[i].shape:
                    img = img / illum[i]
                key = (img.shape,)
                pending[key].append((idx, ch, img))
                if len(pending[key]) >= batch_size:
                    flush(key)
            except Exception as e:
                results[idx][f"QC_Error_{ch}"] = str(e)
    for key in list(pending):
        flush(key)

    qc_df = pd.DataFrame.from_dict(results, orient="index").sort_index()
    final = pd.concat([df, qc_df], axis=1)
    storage.write_csv(final, output)
    return final
