"""Segmentation + deep-embedding engine — the flagship pipeline.

TPU-native rebuild of the reference's producer/consumer GPU pipeline
(Cellpose_GPU_s3fs.py: producers :47-87, consumers :89-232, driver
:235-473). The multiprocess architecture disappears: a thread pool
prefetches TIFFs + illumination division on the host (the producer role),
and a single controller feeds static-shape site batches to jitted device
programs (the consumer role):

  1. U-Net tiled inference -> flows + cellprob        (models/cellpose.py)
  2. flow-following mask recovery -> labels           (kernels/flow_ode.py)
  3. fixed-box masked crops around centroids          (kernels/crops.py)
  4. per-channel EfficientNetV2 embeddings, fixed-chunk batches
                                                      (models/effnetv2.py)
  5. optional XGBoost dead-cell scoring               (models/xgb.py)

Outputs preserve the reference contract exactly:
  *_counts.csv                 per-site Cell_Count (+ Dead_Cells)
  *_coords.parquet             Cell_ID = {well}_{site}_cell{i}, Y/X, Is_Dead
  *_well_aggregated.parquet    (or *_filtered_well_aggregated.parquet)
                               mean_features per well + Cell_Count
  *_single_cell.parquet        exploded per-cell feature rows

Failure contract matches the reference: any per-site error yields an
empty result for that site and the run continues
(Cellpose_GPU_s3fs.py:123-125,228-232).
"""

from __future__ import annotations

import logging
import queue
import threading
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from saguaro_tpu.io import storage, tiff
from saguaro_tpu.io.loaddata import filter_qc_passing, site_image_paths
from saguaro_tpu.kernels.crops import extract_crops, label_centroids
from saguaro_tpu.kernels.flow_ode import (
    compute_masks,
    compute_masks_batch,
    fill_label_holes,
    relabel_consecutive,
)
from saguaro_tpu.models.cellpose import (
    CellposeConfig,
    init_cellpose,
    segment_image,
    segment_image_batch,
)
from saguaro_tpu.models.effnetv2 import (
    EFFNETV2_L,
    EffNetV2Config,
    init_effnetv2,
    preprocess_crops,
)

logger = logging.getLogger("saguaro_tpu.segment_embed")

__all__ = ["SegmentEmbedConfig", "SegmentEmbedEngine", "run_pipeline"]

FEATURE_LENGTH = 1280  # embedding width (Cellpose_GPU_s3fs.py:29)


@dataclass
class SegmentEmbedConfig:
    channels: list[str] = field(default_factory=list)
    diameter: float = 100.0            # reference eval setting (:143)
    box_size: int = 200                # crop box (:30)
    max_cells: int = 512               # static per-site cell bound
    embed_chunk: int = 128             # crops per embedding device program.
                                       # Measured at the 5-ch production shape
                                       # with extraction fused into the chunk
                                       # program: 128 -> 1.52 s/site vs 64 ->
                                       # 1.76 and 256 -> 1.75 (bigger chunks
                                       # amortize dispatch until the per-chunk
                                       # result fetch stops overlapping compute
                                       # through the relay)
    embed_size: int = 480              # model input resolution
    cellprob_threshold: float = 0.0
    flow_iters: int = 200
    flow_error_threshold: float | None = 0.4  # cellpose's bad-flow QC
    fill_holes: bool = True            # cellpose fills mask interior holes
    min_size: int = 15
    site_batch: int = 8                # sites per batched device program
    prefetch_workers: int = 8          # host I/O threads (producer role)
    filter_dead_cells: bool = False
    save_coords: bool = False
    single_cell: bool = False
    xgb_model_path: str | None = None
    cellpose_checkpoint: str | None = None   # saguaro_tpu checkpoint paths
    effnet_checkpoint: str | None = None
    devices: int | None = None         # mesh size for default engines
                                       # (None = all visible, 1 = no mesh)
    fold_bn: bool = True               # fold inference BN into conv weights
                                       # (profiled 23 TFLOP/s -> MXU-bound on
                                       # the stage-6 1x1 convs; ~1e-2-relative
                                       # embedding change from one fewer bf16
                                       # rounding)
    fold_rgb_stem: bool = True         # crops are GRAY replicated to RGB, so
                                       # the stem conv folds to 1 input
                                       # channel (exact in f32) and the
                                       # (chunk, 480², 3) input never
                                       # materializes
    cellpose: CellposeConfig = field(default_factory=CellposeConfig)
    effnet: EffNetV2Config = field(default_factory=lambda: EFFNETV2_L)


class SegmentEmbedEngine:
    """Holds models + jitted programs; processes sites one by one."""

    def __init__(
        self,
        cfg: SegmentEmbedConfig,
        cellpose_variables=None,
        effnet_variables=None,
        seed: int = 0,
        mesh=None,
    ):
        """``mesh``: optional jax.sharding.Mesh — site batches are sharded
        over its 'data' axis (params replicated), so one controller drives
        every chip of a slice; XLA partitions the jitted programs."""
        self.cfg = cfg
        self.mesh = mesh
        self.cell_model, cp_vars = init_cellpose(cfg.cellpose, seed=seed)
        self.feat_model, en_vars = init_effnetv2(cfg.effnet, seed=seed)
        if cellpose_variables is None and cfg.cellpose_checkpoint:
            from saguaro_tpu.models.checkpoint import load_variables

            try:
                cellpose_variables, _ = load_variables(cfg.cellpose_checkpoint, cp_vars)
            except ValueError:  # not our format: a torch CPnet file
                from saguaro_tpu.models.cellpose_weights import load_torch_cellpose

                cellpose_variables = load_torch_cellpose(
                    cfg.cellpose_checkpoint, cp_vars, cfg.cellpose
                )
            logger.info("Loaded cellpose checkpoint %s", cfg.cellpose_checkpoint)
        if effnet_variables is None and cfg.effnet_checkpoint:
            from saguaro_tpu.models.checkpoint import load_variables

            try:
                effnet_variables, _ = load_variables(cfg.effnet_checkpoint, en_vars)
            except ValueError:  # not our format: a timm/transformers file
                from saguaro_tpu.models.effnet_weights import load_torch_effnet

                effnet_variables = load_torch_effnet(
                    cfg.effnet_checkpoint, en_vars, cfg.effnet
                )
            logger.info("Loaded effnet checkpoint %s", cfg.effnet_checkpoint)
        self.cell_vars = cellpose_variables or cp_vars
        self.feat_vars = effnet_variables or en_vars
        if cfg.fold_bn:
            # inference speed: BN affines fold into conv weights AFTER any
            # checkpoint load (models/effnetv2.fold_batchnorm). Variables
            # passed in from another fold_bn engine are already folded
            # (no batch_stats) — only the model graph needs switching.
            import dataclasses

            from saguaro_tpu.models.effnetv2 import EffNetV2, fold_batchnorm

            self.feat_model = EffNetV2(dataclasses.replace(cfg.effnet, fold_bn=True))
            if "batch_stats" in self.feat_vars:
                self.feat_vars = fold_batchnorm(self.feat_vars)
        embed_in_ch = 3
        if cfg.fold_rgb_stem:
            from saguaro_tpu.models.effnetv2 import fold_rgb_stem

            # crops are gray->RGB replicated: the stem conv folds to one
            # input channel (idempotent for pre-folded variable trees)
            self.feat_vars = fold_rgb_stem(self.feat_vars)
            embed_in_ch = 1
        if mesh is not None:
            from saguaro_tpu.parallel.mesh import replicate

            self.cell_vars = replicate(self.cell_vars, mesh)
            self.feat_vars = replicate(self.feat_vars, mesh)
        self.xgb = None
        if cfg.xgb_model_path:
            from saguaro_tpu.models.xgb import XGBEnsemble

            self.xgb = XGBEnsemble.from_json(cfg.xgb_model_path)
        # NB: variables are a jit ARGUMENT, not a closure capture — closure
        # capture bakes the (potentially 100M+ param) weights into the HLO
        # as constants, exploding compile size.
        embed_size = cfg.embed_size
        apply_fn = self.feat_model.apply

        @jax.jit
        def _embed_with_vars(variables, crops):
            return apply_fn(
                variables,
                preprocess_crops(crops, embed_size, n_channels=embed_in_ch),
            )

        self._embed = lambda crops: _embed_with_vars(self.feat_vars, crops)

        max_cells, box = cfg.max_cells, cfg.box_size

        @jax.jit
        def _centroids_batch(labels):
            return jax.vmap(lambda lb: label_centroids(lb, max_cells))(labels)

        self._centroids_batch = _centroids_batch

        half = box // 2

        @jax.jit
        def _embed_chunk_fused(variables, images, labels, site_i, lab_i, ch_i, cy, cx):
            """Extract ONE chunk of masked single-channel crops directly
            from the device-resident site batch and embed it — crop
            extraction fused into the embed program, so peak memory is
            O(chunk), never the (sites x max_cells x box^2 x C) pool
            (which is ~3.3 GB for 8 five-channel sites and OOMs a v5e)."""
            h, w = images.shape[1:3]

            def one(si, li, ci, y, x):
                y0 = jnp.clip(y - half, 0, h - box)
                x0 = jnp.clip(x - half, 0, w - box)
                img = jax.lax.dynamic_slice(
                    images, (si, y0, x0, ci), (1, box, box, 1)
                )[0, :, :, 0]
                lab = jax.lax.dynamic_slice(labels, (si, y0, x0), (1, box, box))[0]
                return img * (lab == li).astype(jnp.float32)

            crops = jax.vmap(one)(site_i, lab_i, ch_i, cy, cx)
            return apply_fn(
                variables,
                preprocess_crops(crops, embed_size, n_channels=embed_in_ch),
            )

        self._embed_chunk_fused = _embed_chunk_fused

    # ---------------- per-site device path ----------------

    def segment(self, image: np.ndarray) -> np.ndarray:
        """(H, W, C) -> int32 label mask.

        The net input is cellpose's default channel conversion — the
        reference evals with NO channels argument
        (Cellpose_GPU_s3fs.py:143), so convert_image keeps the first 2
        raw channels (zero-padded if fewer); see
        models.cellpose.convert_input for the transcription.

        Cellpose parity: the flow dynamics run at the rescaled network
        resolution (diameter -> 30 px) and the label image is upsampled
        nearest back to the input resolution — ~(diameter/30)^2 cheaper
        than integrating at full resolution.
        """
        from saguaro_tpu.models.cellpose import convert_input

        cfg = self.cfg
        net_in = np.asarray(convert_input(jnp.asarray(image), cfg.cellpose.n_channels))
        flows, cellprob, _ = segment_image(
            self.cell_model.apply,
            self.cell_vars,
            net_in,
            cfg.cellpose,
            diameter=cfg.diameter,
            at_network_resolution=True,
        )
        labels_low = compute_masks(
            flows,
            cellprob,
            cellprob_threshold=cfg.cellprob_threshold,
            n_iters=cfg.flow_iters,
            min_size=0,  # min-size filter applied at full resolution below
        )
        if cfg.flow_error_threshold is not None:
            labels_low = self._drop_bad_flow_masks(labels_low, np.asarray(flows) / 5.0)
        h0, w0 = image.shape[:2]
        if labels_low.shape != (h0, w0):
            labels = np.asarray(
                jax.image.resize(
                    jnp.asarray(labels_low), (h0, w0), method="nearest"
                )
            )
        else:
            labels = labels_low
        if cfg.fill_holes:
            labels = fill_label_holes(labels)
        return relabel_consecutive(labels, min_size=cfg.min_size)

    def _drop_bad_flow_masks(self, labels: np.ndarray, flows: np.ndarray) -> np.ndarray:
        """Cellpose's flow-error QC: remove masks whose recovered shape is
        inconsistent with the predicted flow field (error > threshold)."""
        from saguaro_tpu.kernels.flow_ode import flow_qc_error

        labels = np.asarray(labels)
        n = int(labels.max())
        if n == 0:
            return labels
        err, cnt = flow_qc_error(
            jnp.asarray(labels), jnp.asarray(flows), max_cells=self.cfg.max_cells
        )
        err = np.asarray(err)
        bad = np.where((err > self.cfg.flow_error_threshold) & (np.arange(len(err)) > 0))[0]
        bad = bad[bad <= n]
        if bad.size == 0:
            return labels
        lut = np.arange(n + 1, dtype=labels.dtype)
        lut[bad] = 0
        out = lut[labels]
        return relabel_consecutive(out)

    def _drop_bad_flow_masks_batch(
        self, labels_list: list[np.ndarray], flows: np.ndarray
    ) -> list[np.ndarray]:
        """Batched flow-error QC: ONE device program scores every site
        (flow_qc_error_batch); the per-site LUT filtering stays on host.
        Identical results to _drop_bad_flow_masks per site."""
        from saguaro_tpu.kernels.flow_ode import flow_qc_error_batch

        labels_arr = np.stack([np.asarray(l) for l in labels_list])
        maxes = labels_arr.reshape(len(labels_list), -1).max(axis=1)
        if not (maxes > 0).any():
            return [labels_arr[i] for i in range(len(labels_list))]
        errs, _ = flow_qc_error_batch(
            jnp.asarray(labels_arr),
            jnp.asarray(flows, jnp.float32),
            max_cells=self.cfg.max_cells,
        )
        errs = np.asarray(errs)  # one packed fetch for the whole batch
        out = []
        for i in range(len(labels_list)):
            lab, n = labels_arr[i], int(maxes[i])
            if n == 0:
                out.append(lab)
                continue
            err = errs[i]
            bad = np.where(
                (err > self.cfg.flow_error_threshold) & (np.arange(len(err)) > 0)
            )[0]
            bad = bad[bad <= n]
            if bad.size == 0:
                out.append(lab)
                continue
            lut = np.arange(n + 1, dtype=lab.dtype)
            lut[bad] = 0
            out.append(relabel_consecutive(lut[lab]))
        return out

    def segment_batch(self, images) -> list:
        """Batched segment: (B, H, W, C) -> list of B label masks (device
        arrays at full resolution; use np.asarray to materialize).

        Tiles from the whole site batch feed the network as one device
        batch and the flow recovery for all sites runs as one program.
        ``images`` may be a device array (preferred: ship raw data once)
        or a numpy batch of any dtype.
        """
        cfg = self.cfg
        b_real = len(images)
        if self.mesh is not None:
            from saguaro_tpu.parallel.mesh import shard_batch

            # pad a partial bucket (e.g. the run's final flush) to a
            # multiple of the data axis so the batch still shards evenly;
            # padded blank sites yield zero labels and are dropped below
            images = jnp.asarray(images)
            n_data = self.mesh.shape["data"]
            pad = (-b_real) % n_data
            if pad:
                images = jnp.concatenate(
                    [images, jnp.zeros((pad,) + images.shape[1:], images.dtype)]
                )
            images = shard_batch(images, self.mesh)
        else:
            images = jnp.asarray(images)
        # net input = cellpose default conversion (first n_channels raw
        # planes, built on device; see segment()'s docstring)
        n_seg = cfg.cellpose.n_channels
        # flows/cellprob STAY on device — the mask-recovery program and the
        # flow-error QC consume them in place; fetching them only to
        # re-upload costs ~20 MB/batch through this environment's relay
        flows, cellprob = segment_image_batch(
            self.cell_model.apply,
            self.cell_vars,
            images,
            cfg.cellpose,
            diameter=cfg.diameter,
            at_network_resolution=True,
            n_seg=n_seg,
        )
        h1, w1 = flows.shape[2:]
        h0, w0 = images.shape[1:3]
        # min-size filtering happens at network resolution with an
        # area-scaled threshold, so the expensive relabel/unique passes all
        # run on the small label images; upsampling preserves compact ids.
        scale = (h1 * w1) / (h0 * w0)
        min_size_low = max(1, int(round(cfg.min_size * scale))) if cfg.min_size else 0
        labels_low = compute_masks_batch(
            flows,
            cellprob,
            cellprob_threshold=cfg.cellprob_threshold,
            n_iters=cfg.flow_iters,
            min_size=min_size_low,
        )
        if cfg.flow_error_threshold is not None:
            labels_low = self._drop_bad_flow_masks_batch(labels_low, flows / 5.0)
        if cfg.fill_holes:
            labels_low = [fill_label_holes(np.asarray(l)) for l in labels_low]
        labels_low = labels_low[:b_real]  # drop mesh-padding blanks
        if (h1, w1) == (h0, w0):
            return labels_low
        up = jax.image.resize(
            jnp.asarray(np.stack(labels_low)), (len(labels_low), h0, w0), method="nearest"
        )
        return list(up)  # device arrays; downstream crops stay on device

    def process_site_batch(
        self, site_ids: list[int], images: np.ndarray, timer=None
    ) -> dict[int, dict]:
        """Batched consumer body: segment a same-shape site batch at once,
        then crop+embed per site. Errors degrade per site.

        The raw batch is shipped to the device ONCE; segmentation, crops
        and embeddings all reuse that buffer (no label/image round-trips).
        """
        from saguaro_tpu.utils.timing import StageTimer

        timer = timer or StageTimer()
        results: dict[int, dict] = {}
        try:
            with timer.stage("segment"):
                images_dev = jnp.asarray(images)
                labels_list = self.segment_batch(images_dev)
        except Exception as e:
            logger.error("batched segmentation failed (%s); falling back per-site", e)
            images_dev = images
            labels_list = []
            for img in images:
                try:
                    labels_list.append(self.segment(np.asarray(img)))
                except Exception as e2:
                    logger.error("segment failed: %s", e2)
                    labels_list.append(np.zeros(np.asarray(img).shape[:2], np.int32))
        try:
            with timer.stage("embed"):
                per_site = self.embed_sites_pooled(images_dev, labels_list)
        except Exception as e:
            logger.error("pooled embed failed (%s); falling back per-site", e)
            per_site = []
            for img, labels in zip(images_dev, labels_list):
                try:
                    per_site.append(self.embed_site(img, labels))
                except Exception as e2:
                    logger.error("embed failed: %s", e2)
                    n_ch = np.asarray(img).shape[-1]
                    per_site.append(
                        (np.zeros((0, n_ch, FEATURE_LENGTH), np.float32),
                         np.zeros((0, 2), np.int64))
                    )
        # surface max_cells truncation: cells with ids beyond the static
        # bound are silently absent from crops/measurement, so a dense
        # site must be distinguishable from a clean one in the logs (same
        # QC contract as the hull-overflow count). Maxes are reduced ON
        # DEVICE and fetched as ONE packed scalar array per batch — a
        # per-site np.asarray(labels) would pull ~4.7 MB of full-res
        # labels each through the relay just to log (CLAUDE.md: labels
        # stay device-resident, only small results cross back).
        n_segs = np.asarray(
            jnp.stack(
                [jnp.max(jnp.asarray(l).astype(jnp.int32)) for l in labels_list]
            )
        )
        for sid, labels, n_seg, (feats, coords) in zip(
            site_ids, labels_list, n_segs, per_site
        ):
            try:
                n_seg = int(n_seg)
                n_trunc = max(0, n_seg - (self.cfg.max_cells - 1))
                if n_trunc:
                    logger.warning(
                        "site %s: %d cells segmented but max_cells=%d — "
                        "%d cells dropped from embedding/measurement",
                        sid, n_seg, self.cfg.max_cells, n_trunc,
                    )
                if len(feats) == 0:
                    results[sid] = {"status": "empty", "n_cells": 0}
                    continue
                is_dead = self.score_dead(feats)
                results[sid] = {
                    "status": "success",
                    "n_cells": len(feats),
                    "n_truncated": n_trunc,
                    "features": feats,
                    "coords": coords,
                    "is_dead": is_dead,
                }
            except Exception as e:
                logger.error("site %s failed: %s", sid, e)
                results[sid] = {"status": "empty", "n_cells": 0}
        return results

    def embed_sites_pooled(self, images, labels_list):
        """Crops + embeddings for a whole same-shape site batch at once.

        The TPU replacement for the reference's 1000-crop batched embed
        (Cellpose_GPU_s3fs.py:184-206): valid (cell, channel) crop slots
        from EVERY site in the batch are pooled into one index list,
        padded to a static global chunk of ``embed_chunk`` crops PER
        data-mesh device, sharded over the mesh 'data' axis, and each
        chunk is extracted (dynamic-slice + mask) AND embedded by one
        fused program — so a v5e-8 embeds 8*embed_chunk crops per step
        regardless of how cells are distributed across sites, and peak
        HBM stays O(chunk) instead of the full
        (sites x max_cells x box^2 x channels) crop pool (3.3 GB at the
        5-channel production shape — a v5e OOM).

        Returns a list of (features (n_i, C, 1280), coords (n_i, 2)) per
        site, identical to calling embed_site per site.
        """
        cfg = self.cfg
        images = jnp.asarray(images, jnp.float32)
        b, n_ch = images.shape[0], images.shape[-1]
        h, w = images.shape[1:3]
        labels = jnp.stack([jnp.asarray(l, jnp.int32) for l in labels_list])
        cy, cx, cnt = self._centroids_batch(labels)
        half = cfg.box_size // 2
        in_bounds = (
            (cy - half >= 0) & (cy + half <= h) & (cx - half >= 0) & (cx + half <= w)
        )
        valid = (cnt > 0) & in_bounds  # (b, max_cells), reference edge rule
        valid_np = np.asarray(valid).reshape(-1)
        cy_np = np.asarray(cy).reshape(-1)
        cx_np = np.asarray(cx).reshape(-1)
        coords_np = np.stack([cy_np, cx_np], axis=-1)
        idx = np.where(valid_np)[0]
        empty = (
            np.zeros((0, n_ch, FEATURE_LENGTH), np.float32),
            np.zeros((0, 2), np.int64),
        )
        if idx.size == 0:
            return [empty] * b

        # flat slot order: crop-major, channel-minor (the reference embeds
        # each cell's channels consecutively, Cellpose_GPU_s3fs.py:177-182)
        site_i = np.repeat(idx // cfg.max_cells, n_ch).astype(np.int32)
        lab_i = np.repeat(idx % cfg.max_cells, n_ch).astype(np.int32)
        ch_i = np.tile(np.arange(n_ch, dtype=np.int32), idx.size)
        cys = np.repeat(cy_np[idx], n_ch).astype(np.int32)
        cxs = np.repeat(cx_np[idx], n_ch).astype(np.int32)
        n_flat = site_i.size
        n_data = self.mesh.shape["data"] if self.mesh is not None else 1
        ck = cfg.embed_chunk * n_data
        n_pad = (-n_flat) % ck
        if n_pad:  # pad with repeats of slot 0 (discarded after the slice)
            pad = lambda a: np.concatenate([a, np.repeat(a[:1], n_pad)])
            site_i, lab_i, ch_i, cys, cxs = map(pad, (site_i, lab_i, ch_i, cys, cxs))
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sharding = NamedSharding(self.mesh, P("data"))
        chunks = []
        for s in range(0, n_flat + n_pad, ck):
            args = tuple(
                jnp.asarray(a[s : s + ck]) for a in (site_i, lab_i, ch_i, cys, cxs)
            )
            if self.mesh is not None:
                args = tuple(jax.device_put(a, sharding) for a in args)
            chunks.append(
                self._embed_chunk_fused(self.feat_vars, images, labels, *args)
            )
        # per-chunk fetches OVERLAP with the next chunk's compute through
        # the relay (dispatch is async); a single packed fetch at the end
        # serializes the 20 MB transfer and measured 20% slower
        feats = np.concatenate([np.asarray(c) for c in chunks])[:n_flat]
        feats = feats.reshape(idx.size, n_ch, FEATURE_LENGTH)

        out = []
        site_of = idx // cfg.max_cells
        for i in range(b):
            m = site_of == i
            out.append((feats[m], coords_np[idx[m]].astype(np.int64)))
        return out

    def embed_site(self, image, labels):
        """Crops + embeddings for one site.

        Returns (features (n_cells, C, 1280) float32, coords (n_cells, 2)).
        Crops never leave the device: extraction, chunking and the
        EfficientNet forward all run on device buffers; only the validity
        mask, coords, and final embeddings cross to the host.
        """
        cfg = self.cfg
        image = jnp.asarray(image, jnp.float32)
        n_ch = image.shape[-1]
        crops, valid, coords = extract_crops(
            image,
            jnp.asarray(labels, jnp.int32),
            max_cells=cfg.max_cells,
            box=cfg.box_size,
        )
        valid_np = np.asarray(valid)
        idx = np.where(valid_np)[0]
        if idx.size == 0:
            return (
                np.zeros((0, n_ch, FEATURE_LENGTH), np.float32),
                np.zeros((0, 2), np.int64),
            )
        coords_np = np.asarray(coords)[idx]
        # compact valid crops on device, then (n*C, box, box) channel-major
        sel = jnp.take(crops, jnp.asarray(idx), axis=0)
        flat = jnp.moveaxis(sel, -1, 1).reshape(-1, cfg.box_size, cfg.box_size)
        n_flat = flat.shape[0]
        ck = cfg.embed_chunk
        n_pad = (-n_flat) % ck
        if n_pad:
            flat = jnp.pad(flat, ((0, n_pad), (0, 0), (0, 0)))
        chunks = [
            self._embed(jax.lax.slice_in_dim(flat, s, s + ck, axis=0))
            for s in range(0, n_flat + n_pad, ck)
        ]
        # per-chunk fetches overlap with compute (see embed_sites_pooled)
        feats = np.concatenate([np.asarray(c) for c in chunks])[:n_flat]
        return feats.reshape(idx.size, n_ch, FEATURE_LENGTH), coords_np

    def score_dead(self, features: np.ndarray) -> np.ndarray:
        """(n, C, 1280) -> bool dead flags (preds > 0.5, reference :216)."""
        if self.xgb is None or len(features) == 0:
            return np.zeros(len(features), dtype=bool)
        flat = features.reshape(len(features), -1)
        return np.asarray(self.xgb.predict_dead(flat))

    def process_site(self, image: np.ndarray):
        """Full per-site result dict (the consumer loop body)."""
        labels = self.segment(image)
        if labels.max() == 0:
            return {"status": "empty", "n_cells": 0}
        feats, coords = self.embed_site(image, labels)
        if len(feats) == 0:
            return {"status": "empty", "n_cells": 0}
        is_dead = self.score_dead(feats)
        return {
            "status": "success",
            "n_cells": len(feats),
            "features": feats,
            "coords": coords,
            "is_dead": is_dead,
        }


# ----------------------------------------------------------------------------
# Host prefetch (the producer role) + driver
# ----------------------------------------------------------------------------


def _prefetch_sites(tasks, channels, illum, workers: int, out_queue: queue.Queue):
    """Thread pool reading per-site channel TIFFs (+ illum division)."""

    def load(task):
        site_id, paths = task
        try:
            chans = []
            for i, p in enumerate(paths):
                img = tiff.imread(p).astype(np.float32)
                if illum and illum[i] is not None and img.shape == illum[i].shape:
                    img = img / illum[i]
                chans.append(img)
            return site_id, np.stack(chans, axis=-1)
        except Exception as e:  # degrade-per-site, like the reference
            logger.error("prefetch failed on site %s: %s", site_id, e)
            return site_id, None

    sem = threading.Semaphore(workers * 2)

    def worker(task):
        out_queue.put(load(task))
        sem.release()

    def feeder():
        for t in tasks:
            sem.acquire()
            threading.Thread(target=worker, args=(t,), daemon=True).start()

    threading.Thread(target=feeder, daemon=True).start()


def run_pipeline(
    load_data: pd.DataFrame,
    data_base_path: str,
    cfg: SegmentEmbedConfig,
    out_data_path: str,
    engine: SegmentEmbedEngine | None = None,
    image_qc: pd.DataFrame | None = None,
    illum: list[np.ndarray | None] | None = None,
    spill_dir: str | None = None,
) -> dict[str, str]:
    """End-to-end run, mirroring Cellpose_GPU_s3fs.main's outputs.

    ``spill_dir``: when set, each completed site's features/coords/flags
    are spilled as ``site_<id>.npz`` with a JSONL manifest — the
    reference's npz spill (Cellpose_GPU_s3fs.py:218-223) made restartable:
    a re-run with the same spill_dir loads completed sites from disk and
    only computes the rest.

    Returns {output kind: path written}.
    """
    import io as _io
    import os

    outputs: dict[str, str] = {}
    if image_qc is not None:
        load_data = filter_qc_passing(load_data, image_qc)
    load_data = load_data.reset_index(drop=True)

    # Spill keys are content-based (well + site + filenames), NOT positional
    # row indices: a re-run whose QC filtering or row order differs must not
    # attach cached features to the wrong wells.
    def spill_key(idx: int) -> str:
        row = load_data.iloc[idx]
        parts = [str(row[c]) for c in ("Metadata_Well", "Metadata_Site") if c in row.index]
        parts += [str(row[c]) for c in load_data.columns if c.startswith("FileName_")]
        return "site_" + "_".join(parts).replace("/", "_") if parts else f"site_{idx}"

    manifest = None
    results: dict[int, dict] = {}
    if spill_dir:
        from saguaro_tpu.pipeline.manifest import Manifest

        manifest = Manifest(storage.join(spill_dir, "sites.jsonl"))
        for idx in range(len(load_data)):
            key = spill_key(idx)
            info = manifest.info(key)
            if info is None:
                continue
            if info.get("status") == "empty":
                results[idx] = {"status": "empty", "n_cells": 0}
            else:
                data = np.load(
                    _io.BytesIO(storage.read_bytes(storage.join(spill_dir, f"{key}.npz")))
                )
                results[idx] = {
                    "status": "success",
                    "n_cells": int(info["n_cells"]),
                    "features": data["features"],
                    "coords": data["coords"],
                    "is_dead": data["is_dead"],
                }

    tasks = [
        (idx, site_image_paths(row, cfg.channels, data_base_path))
        for idx, row in load_data.iterrows()
        if idx not in results
    ]
    n_ch = len(cfg.channels)
    if engine is None:
        # production default: shard site batches over every visible chip
        # (the reference's per-GPU consumer placement, wired into ITS
        # entry point at Cellpose_GPU_s3fs.py:288-296, done mesh-style)
        from saguaro_tpu.parallel.mesh import default_mesh

        mesh = default_mesh(cfg.devices)
        if mesh is not None:
            logger.info("run_pipeline: sharding site batches over %d devices", mesh.size)
        engine = SegmentEmbedEngine(cfg, mesh=mesh)

    from saguaro_tpu.utils.timing import StageTimer

    timer = StageTimer()

    def record(batch_results: dict[int, dict]):
        results.update(batch_results)
        if manifest is None:  # NB: an empty Manifest is falsy via __len__
            return
        for sid, r in batch_results.items():
            key = spill_key(sid)
            if r["status"] == "success":
                buf = _io.BytesIO()
                np.savez_compressed(
                    buf, features=r["features"], coords=r["coords"], is_dead=r["is_dead"]
                )
                storage.write_bytes(storage.join(spill_dir, f"{key}.npz"), buf.getvalue())
            manifest.mark_done(key, status=r["status"], n_cells=r["n_cells"])

    q: queue.Queue = queue.Queue(maxsize=cfg.prefetch_workers * 2)
    _prefetch_sites(tasks, cfg.channels, illum, cfg.prefetch_workers, q)

    # consume: bucket same-shape sites into device batches (consumer role).
    # One batch of ship-ahead: batch k+1's raw uint16 host->device transfer
    # (jnp.asarray dispatches async) is started BEFORE batch k's compute, so
    # the ~12 MB/site DMA rides under the previous batch's segment/embed/
    # measure programs instead of serializing with them.
    buckets: dict[tuple, list[tuple[int, np.ndarray]]] = {}
    pending: list[tuple[list[int], "jnp.ndarray"]] = []

    def run_pending():
        if not pending:
            return
        ids, imgs = pending.pop()
        try:
            record(engine.process_site_batch(ids, imgs, timer=timer))
        except Exception as e:  # degrade-per-site: a bad batch never kills the run
            logger.error("site batch %s failed (%s); recording empty results", ids, e)
            record({sid: {"status": "empty", "n_cells": 0} for sid in ids})

    def flush(shape_key):
        items = buckets.pop(shape_key, [])
        if not items:
            return
        ids = [sid for sid, _ in items]
        try:
            imgs = jnp.asarray(np.stack([im for _, im in items]))  # async ship
        except Exception as e:
            logger.error("site batch %s ship failed (%s); recording empty", ids, e)
            record({sid: {"status": "empty", "n_cells": 0} for sid in ids})
            return
        run_pending()  # compute batch k while k+1's transfer is in flight
        pending.append((ids, imgs))

    for _ in range(len(tasks)):
        site_id, image = q.get()
        if image is None or image.shape[-1] != n_ch:
            record({site_id: {"status": "empty", "n_cells": 0}})
            continue
        key = image.shape
        buckets.setdefault(key, []).append((site_id, image))
        if len(buckets[key]) >= cfg.site_batch:
            flush(key)
    for key in list(buckets):
        flush(key)
    run_pending()
    if timer.count:
        timer.log_summary()

    # ---------------- result assembly (reference :326-471) ----------------
    order = list(range(len(load_data)))  # includes spill-resumed sites
    site_features, site_coords, site_dead = [], [], []
    for i in order:
        r = results[i]
        if r["status"] == "empty":
            site_features.append(np.zeros((0, n_ch, FEATURE_LENGTH), np.float32))
            site_coords.append(np.zeros((0, 2), np.int64))
            site_dead.append(np.array([], dtype=bool))
        else:
            site_features.append(r["features"])
            site_coords.append(r["coords"])
            site_dead.append(r["is_dead"])

    aggregated, counts, dead_counts = [], [], []
    for feats, flags in zip(site_features, site_dead):
        if len(feats) == 0:
            aggregated.append(np.zeros((n_ch, FEATURE_LENGTH), np.float32))
            counts.append(0)
            dead_counts.append(0)
        elif cfg.xgb_model_path and cfg.filter_dead_cells:
            alive = ~flags
            n_alive = int(alive.sum())
            aggregated.append(
                feats[alive].sum(axis=0) if n_alive else np.zeros((n_ch, FEATURE_LENGTH), np.float32)
            )
            counts.append(n_alive)
            dead_counts.append(int(flags.sum()))
        else:
            aggregated.append(feats.sum(axis=0))
            counts.append(len(feats))
            dead_counts.append(int(flags.sum()))

    load_data = load_data.copy()
    load_data["Cell_Count"] = counts
    if cfg.xgb_model_path:
        load_data["Dead_Cells"] = dead_counts
    counts_path = out_data_path.replace(".parquet", "_counts.csv")
    storage.write_csv(load_data, counts_path)
    outputs["counts"] = counts_path

    if cfg.save_coords:
        recs = []
        for i, (coords, flags) in enumerate(zip(site_coords, site_dead)):
            well = load_data.loc[i, "Metadata_Well"] if "Metadata_Well" in load_data.columns else str(i)
            site = load_data.loc[i, "Metadata_Site"] if "Metadata_Site" in load_data.columns else str(i)
            for k, (y, x) in enumerate(coords):
                recs.append({
                    "Cell_ID": f"{well}_{site}_cell{k}",
                    "Y_Center": int(y),
                    "X_Center": int(x),
                    "Is_Dead": bool(flags[k]) if len(flags) else False,
                })
        if recs:
            coords_path = out_data_path.replace(".parquet", "_coords.parquet")
            with storage.open_file(coords_path, "wb") as f:
                pd.DataFrame(recs).to_parquet(f, engine="pyarrow")
            outputs["coords"] = coords_path

    # well-level aggregation: mean of per-site feature sums / total cells
    agg = load_data.copy()
    agg["sum_features"] = [a for a in aggregated]
    meta_keep = [c for c in ("Metadata_Timepoint", "Metadata_Plate") if c in agg.columns]
    agg_funcs = {"sum_features": lambda s: np.sum(np.stack(list(s.values)), axis=0), "Cell_Count": "sum"}
    for c in meta_keep:
        agg_funcs[c] = "first"
    well = agg.groupby("Metadata_Well").agg(agg_funcs).reset_index()
    well["mean_features"] = well.apply(
        lambda row: (row["sum_features"] / row["Cell_Count"]).tolist()
        if row["Cell_Count"] > 0
        else np.zeros((n_ch, FEATURE_LENGTH)).tolist(),
        axis=1,
    )
    well = well.drop(columns=["sum_features"])
    suffix = "_filtered_well_aggregated.parquet" if cfg.filter_dead_cells else "_well_aggregated.parquet"
    well_path = out_data_path.replace(".parquet", suffix)
    with storage.open_file(well_path, "wb") as f:
        well.to_parquet(f, engine="pyarrow")
    outputs["well_aggregated"] = well_path

    if cfg.single_cell:
        sc_path = out_data_path.replace(".parquet", "_single_cell.parquet")
        valid_idx = [i for i, f in enumerate(site_features) if len(f) > 0]
        if not valid_idx:
            with storage.open_file(sc_path, "wb") as f:
                load_data.to_parquet(f, engine="pyarrow")
        else:
            valid_sites = load_data.iloc[valid_idx].copy()
            repeats = [len(site_features[i]) for i in valid_idx]
            expanded = valid_sites.loc[valid_sites.index.repeat(repeats)].copy()
            expanded["Cell_Index"] = expanded.groupby(level=0).cumcount()
            stacked = np.concatenate([site_features[i] for i in valid_idx], axis=0)
            expanded["single_cell_features"] = list(stacked.reshape(stacked.shape[0], -1))
            if cfg.xgb_model_path:
                expanded["is_dead_cell"] = np.concatenate([site_dead[i] for i in valid_idx])
            if "Cell_Count" in expanded.columns:
                expanded = expanded.drop(columns=["Cell_Count"])
            with storage.open_file(sc_path, "wb") as f:
                expanded.to_parquet(f, engine="pyarrow", row_group_size=100_000)
        outputs["single_cell"] = sc_path

    return outputs
