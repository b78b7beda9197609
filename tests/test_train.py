"""Training loop closes the loop: net -> flows -> dynamics -> masks.

Trains a small CellposeUNet on synthetic nuclei and verifies the trained
network segments held-out images (the reference relies on a pretrained
checkpoint; our framework must be able to produce one).
"""

import numpy as np
import pytest

from saguaro_tpu.kernels.flow_ode import compute_masks
from saguaro_tpu.models.cellpose import CellposeConfig, CellposeUNet, segment_image
from saguaro_tpu.models.cellpose_train import (
    masks_to_flows,
    synthetic_nuclei,
    train_cellpose,
)


def _iou_matched(gt: np.ndarray, pred: np.ndarray) -> float:
    """Mean best-match IoU over GT cells."""
    ious = []
    for lab in np.unique(gt[gt > 0]):
        m = gt == lab
        ids, counts = np.unique(pred[m], return_counts=True)
        ids, counts = ids[ids > 0], counts[ids > 0]
        if ids.size == 0:
            ious.append(0.0)
            continue
        best = ids[np.argmax(counts)]
        p = pred == best
        ious.append(np.logical_and(m, p).sum() / np.logical_or(m, p).sum())
    return float(np.mean(ious)) if ious else 0.0


class TestMasksToFlows:
    def test_flows_point_inward(self):
        rng = np.random.default_rng(0)
        _, labels = synthetic_nuclei(rng, size=96, n_cells=4)
        flows = masks_to_flows(labels)
        assert flows.shape == (2, 96, 96)
        # flows vanish outside cells
        assert np.abs(flows[:, labels == 0]).max() == 0
        # advecting GT flows recovers the GT masks
        cellprob = np.where(labels > 0, 5.0, -5.0)
        rec = compute_masks(flows * 5.0, cellprob, n_iters=80, min_size=5)
        assert _iou_matched(labels, rec) > 0.85


class TestTraining:
    @pytest.mark.slow
    def test_trained_net_segments(self):
        rng = np.random.default_rng(1)
        size = 96
        cfg = CellposeConfig(
            tile=size, features=(8, 16, 32, 64), n_channels=2, flow_iters=80
        )
        images, flow_ts, prob_ts = [], [], []
        for _ in range(24):
            img, labels = synthetic_nuclei(rng, size=size, n_cells=5)
            images.append(img)
            flow_ts.append(masks_to_flows(labels))
            prob_ts.append((labels > 0).astype(np.float32))
        # CPnet (pre-activation batchconv) wants a slightly hotter schedule
        # than the round-1 post-activation net: 300 steps @ 5e-3 -> IoU 0.86
        result = train_cellpose(
            np.stack(images), np.stack(flow_ts), np.stack(prob_ts),
            cfg, n_steps=300, batch_size=8, learning_rate=5e-3,
        )
        assert result.losses[-1] < result.losses[0] * 0.5  # it learns

        # held-out segmentation quality
        model = CellposeUNet(cfg)
        test_img, test_labels = synthetic_nuclei(rng, size=size, n_cells=5)
        flows, cellprob, _ = segment_image(
            model.apply, result.variables, test_img, cfg, diameter=None
        )
        masks = compute_masks(
            np.asarray(flows), np.asarray(cellprob), n_iters=80, min_size=10
        )
        iou = _iou_matched(test_labels, masks)
        assert iou > 0.5, f"trained net IoU too low: {iou}"
