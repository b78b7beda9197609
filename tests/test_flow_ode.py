"""Mask-recovery dynamics: synthetic-flow consistency tests.

Property under test (cellpose's own invariant): flows generated from a
ground-truth label image, when integrated and clustered, must recover that
label image.
"""

import numpy as np
import pytest

from saguaro_tpu.kernels.flow_ode import (
    centroid_flows,
    compute_masks,
    flow_qc_error,
    follow_flows,
    masks_from_flows,
    relabel_consecutive,
)


def _disk_labels(h=128, w=128, centers=((32, 32), (32, 96), (96, 32), (96, 96), (64, 64)), r=14):
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    labels = np.zeros((h, w), np.int32)
    for i, (cy, cx) in enumerate(centers, start=1):
        m = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
        labels[m] = i
    return labels


def _iou(a: np.ndarray, b: np.ndarray) -> float:
    inter = np.logical_and(a, b).sum()
    union = np.logical_or(a, b).sum()
    return inter / union if union else 1.0


class TestFlowRecovery:
    @pytest.mark.parametrize("method", ["euler", "pointer"])
    def test_recovers_disks(self, method):
        gt = _disk_labels()
        flows = centroid_flows(gt) * 5.0  # network emits 5x-scaled flows
        cellprob = np.where(gt > 0, 5.0, -5.0)
        masks = compute_masks(flows, cellprob, n_iters=120, method=method)
        assert masks.max() == 5
        # each GT cell maps to exactly one recovered label with high IoU
        for lab in range(1, 6):
            m_gt = gt == lab
            ids, counts = np.unique(masks[m_gt], return_counts=True)
            best = ids[np.argmax(counts)]
            assert best > 0
            assert _iou(m_gt, masks == best) > 0.95

    def test_pointer_matches_euler_on_batch(self):
        from saguaro_tpu.kernels.flow_ode import compute_masks_batch

        gt = _disk_labels()
        flows = centroid_flows(gt) * 5.0
        cellprob = np.where(gt > 0, 5.0, -5.0)
        fb = np.stack([flows, flows])
        cb = np.stack([cellprob, cellprob])
        a = compute_masks_batch(fb, cb, n_iters=120, method="euler")
        b = compute_masks_batch(fb, cb, n_iters=120, method="pointer")
        for x, y in zip(a, b):
            # same cells found; per-cell IoU between the two integrators high
            assert x.max() == y.max() == 5
            for lab in range(1, 6):
                m = x == lab
                ids, counts = np.unique(y[m], return_counts=True)
                best = ids[np.argmax(counts)]
                assert _iou(m, y == best) > 0.9

    def test_inactive_pixels_stay(self):
        gt = _disk_labels()
        flows = centroid_flows(gt)
        active = gt > 0
        pos = np.asarray(follow_flows(flows, active, n_iters=50))
        h, w = gt.shape
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        np.testing.assert_allclose(pos[0][~active], yy[~active].astype(np.float32))
        np.testing.assert_allclose(pos[1][~active], xx[~active].astype(np.float32))

    def test_min_size_filter(self):
        gt = _disk_labels(centers=((64, 64),), r=14)
        gt[2, 2] = 9  # a single stray pixel "cell"
        flows = centroid_flows(gt) * 5.0
        cellprob = np.where(gt > 0, 5.0, -5.0)
        masks = compute_masks(flows, cellprob, n_iters=120, min_size=15)
        assert masks[2, 2] == 0  # too small, dropped
        assert masks.max() == 1

    def test_flow_qc_error_low_for_consistent(self):
        gt = _disk_labels(centers=((64, 64), (32, 32)), r=12)
        flows = centroid_flows(gt)
        err, cnt = flow_qc_error(np.asarray(gt), np.asarray(flows), max_cells=16)
        err, cnt = np.asarray(err), np.asarray(cnt)
        for lab in (1, 2):
            assert cnt[lab] > 0
            assert err[lab] < 0.1

    def test_flow_qc_batch_matches_per_site(self):
        """The engine's batched QC path (ONE device program per site batch)
        must produce exactly the per-site _drop_bad_flow_masks results."""
        from saguaro_tpu.pipeline.segment_embed import (
            SegmentEmbedConfig,
            SegmentEmbedEngine,
        )

        gt1 = _disk_labels(centers=((64, 64), (32, 32)), r=12)
        gt2 = _disk_labels(centers=((96, 96),), r=10)
        flows1 = centroid_flows(gt1)
        # site 2 carries a deliberately INCONSISTENT flow field for cell 1
        # (points away from the centroid) so the QC drops it
        flows2 = -centroid_flows(gt2)
        cfg = SegmentEmbedConfig(channels=["DNA"], flow_error_threshold=0.4)
        engine = SegmentEmbedEngine.__new__(SegmentEmbedEngine)
        engine.cfg = cfg

        per_site = [
            engine._drop_bad_flow_masks(gt1.copy(), flows1),
            engine._drop_bad_flow_masks(gt2.copy(), flows2),
        ]
        batched = engine._drop_bad_flow_masks_batch(
            [gt1.copy(), gt2.copy()], np.stack([flows1, flows2])
        )
        assert per_site[1].max() == 0  # the inconsistent site was dropped
        assert per_site[0].max() == 2  # the consistent site survived
        for a, b in zip(per_site, batched):
            np.testing.assert_array_equal(a, b)

    def test_relabel_consecutive(self):
        labels = np.array([[0, 5, 5], [9, 9, 9], [0, 0, 2]], np.int32)
        out = relabel_consecutive(labels)
        assert set(np.unique(out)) == {0, 1, 2, 3}
        out2 = relabel_consecutive(labels, min_size=2)
        assert set(np.unique(out2)) == {0, 1, 2}


class TestFillHoles:
    def test_fills_interior_keeps_border_bg(self):
        from saguaro_tpu.kernels.flow_ode import fill_label_holes

        labels = np.zeros((32, 32), np.int32)
        labels[8:24, 8:24] = 3
        labels[14:18, 14:18] = 0  # interior hole
        out = fill_label_holes(labels)
        assert (out[14:18, 14:18] == 3).all()
        assert out[0, 0] == 0  # border background untouched

    def test_two_cells_holes_get_right_labels(self):
        from saguaro_tpu.kernels.flow_ode import fill_label_holes

        labels = np.zeros((40, 40), np.int32)
        labels[2:18, 2:18] = 1
        labels[6:10, 6:10] = 0
        labels[22:38, 22:38] = 2
        labels[28:32, 28:32] = 0
        out = fill_label_holes(labels)
        assert (out[6:10, 6:10] == 1).all()
        assert (out[28:32, 28:32] == 2).all()
