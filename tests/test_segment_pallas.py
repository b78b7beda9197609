"""Pallas segment reductions vs the XLA one-hot scan path.

On CPU the kernels run in Pallas interpreter mode; on TPU the same code
compiles through Mosaic. Equality targets the XLA implementations in
``kernels/onehot_reduce`` (counts bit-exact; sums/takes to f32 ulps).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from saguaro_tpu.kernels.onehot_reduce import (
    mxu_take,
    onehot_counts,
    segment_matmul_sums,
)
from saguaro_tpu.kernels.segment_pallas import (
    seg_counts_pallas,
    seg_sums_pallas,
    seg_take_t_pallas,
)

MC = 64
N = 4000


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    labels = jnp.asarray(rng.integers(0, 40, N).astype(np.int32))
    codes = rng.integers(0, 16, (3, N)).astype(np.int32)
    valid = rng.random((3, N)) > 0.3
    values = jnp.asarray(rng.normal(size=(N, 5)).astype(np.float32) * 100)
    table = jnp.asarray(rng.normal(size=(MC, 7)).astype(np.float32))
    return labels, codes, valid, values, table


class TestCounts:
    def test_matches_xla_counts(self, data):
        labels, codes, valid, _, _ = data
        entries = [
            (jnp.asarray(codes[q]), jnp.asarray(valid[q]), 16)
            for q in range(3)
        ]
        ours = seg_counts_pallas(labels, entries, MC)
        ref = onehot_counts(labels, entries, MC)
        for a, b in zip(ours, ref):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_mixed_sizes(self, data):
        labels, codes, valid, _, _ = data
        entries = [
            (jnp.asarray(codes[0]), jnp.asarray(valid[0]), 16),
            (jnp.asarray(codes[1] * 13 % 256), jnp.asarray(valid[1]), 256),
        ]
        ours = seg_counts_pallas(labels, entries, MC)
        ref = onehot_counts(labels, entries, MC)
        for a, b in zip(ours, ref):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_single_code_space_wider_than_cap(self, data):
        """One entry wider than _COL_CAP splits by code RANGE (not just
        between entries) — e.g. neighbor counts at max_cells > 1024 —
        and the stitched histogram is bit-exact vs the XLA path."""
        from saguaro_tpu.kernels import segment_pallas

        labels, codes, valid, _, _ = data
        wide = segment_pallas._COL_CAP + 400
        rng = np.random.default_rng(11)
        c = jnp.asarray(rng.integers(0, wide, N).astype(np.int32))
        entries = [
            (c, jnp.asarray(valid[0]), wide),
            (jnp.asarray(codes[1]), jnp.asarray(valid[1]), 16),
        ]
        ours = seg_counts_pallas(labels, entries, MC)
        ref = onehot_counts(labels, entries, MC)
        assert ours[0].shape == (MC, wide)
        for a, b in zip(ours, ref):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_vmapped_batch(self, data):
        labels, codes, valid, _, _ = data
        lab_b = jnp.stack([labels, (labels + 7) % MC])
        code_b = jnp.stack([jnp.asarray(codes[0]), jnp.asarray(codes[1])])
        val_b = jnp.stack([jnp.asarray(valid[0]), jnp.asarray(valid[1])])

        def one(l, c, v):
            return seg_counts_pallas(l, [(c, v, 16)], MC)[0]

        got = jax.vmap(one)(lab_b, code_b, val_b)
        for i in range(2):
            exp = onehot_counts(
                lab_b[i], [(code_b[i], val_b[i], 16)], MC
            )[0]
            np.testing.assert_array_equal(np.asarray(got[i]), np.asarray(exp))


class TestTake:
    def test_matches_take(self, data):
        labels, _, _, _, table = data
        got = seg_take_t_pallas(table, labels, MC)
        exp = jnp.take(table, labels, axis=0).T
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(exp), rtol=0, atol=1e-4
        )

    def test_matches_mxu_take(self, data):
        labels, _, _, _, table = data
        got = seg_take_t_pallas(table, labels, MC)
        exp = mxu_take(table, labels, MC).T
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(exp), rtol=0, atol=1e-4
        )

    def test_sentinel_rows_zeroed(self, data):
        labels, _, _, _, table = data
        t = table.at[3].set(jnp.inf).at[5].set(3.4e38)
        got = seg_take_t_pallas(t, labels, MC)
        mask = np.isin(np.asarray(labels), [3, 5])
        np.testing.assert_array_equal(np.asarray(got)[:, mask], 0.0)

    def test_vmapped(self, data):
        labels, _, _, _, table = data
        lab_b = jnp.stack([labels, (labels + 3) % MC])
        got = jax.vmap(lambda l: seg_take_t_pallas(table, l, MC))(lab_b)
        for i in range(2):
            exp = jnp.take(table, lab_b[i], axis=0).T
            np.testing.assert_allclose(
                np.asarray(got[i]), np.asarray(exp), rtol=0, atol=1e-4
            )


class TestSums:
    def test_matches_segment_matmul_sums(self, data):
        labels, _, _, values, _ = data
        got = seg_sums_pallas(labels, values, MC)
        exp = segment_matmul_sums(labels, values, MC)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(exp), rtol=1e-6, atol=1e-3
        )

    def test_matches_scatter_oracle(self, data):
        labels, _, _, values, _ = data
        got = seg_sums_pallas(labels, values, MC)
        exp = jax.ops.segment_sum(values, labels, num_segments=MC)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(exp), rtol=1e-5, atol=1e-2
        )

    def test_vmapped(self, data):
        labels, _, _, values, _ = data
        lab_b = jnp.stack([labels, (labels + 11) % MC])
        val_b = jnp.stack([values, values * 2.0])
        got = jax.vmap(lambda l, v: seg_sums_pallas(l, v, MC))(lab_b, val_b)
        for i in range(2):
            exp = jax.ops.segment_sum(val_b[i], lab_b[i], num_segments=MC)
            np.testing.assert_allclose(
                np.asarray(got[i]), np.asarray(exp), rtol=1e-5, atol=1e-2
            )


class TestLaneScanDispatch:
    """The full fused measurement program through the Pallas dispatch
    (interpreter mode on CPU) vs the XLA scan path."""

    def test_fused_object_features_equal(self, monkeypatch):
        from saguaro_tpu.kernels.fused_measure import fused_object_features

        rng = np.random.default_rng(3)
        img = rng.normal(100, 25, (96, 96, 2)).astype(np.float32)
        labels = np.zeros((96, 96), np.int32)
        yy, xx = np.meshgrid(np.arange(96), np.arange(96), indexing="ij")
        for k, (cy, cx) in enumerate([(24, 24), (24, 70), (70, 40)], start=1):
            labels[(yy - cy) ** 2 + (xx - cx) ** 2 <= 12**2] = k
        img_j, lab_j = jnp.asarray(img), jnp.asarray(labels)

        ref = jax.tree.map(
            np.asarray, fused_object_features(img_j, lab_j, 8)
        )
        monkeypatch.setenv("SAGUARO_FORCE_PALLAS", "1")
        # the dispatch mode is now an explicit STATIC cache key (resolved
        # eagerly and pinned via dispatch_override) — no cache clearing
        # needed for the flip to take effect
        got = jax.tree.map(
            np.asarray, fused_object_features(img_j, lab_j, 8)
        )
        monkeypatch.delenv("SAGUARO_FORCE_PALLAS")

        flat_ref, tree_ref = jax.tree.flatten(ref)
        flat_got, tree_got = jax.tree.flatten(got)
        assert tree_ref == tree_got
        for a, b in zip(flat_got, flat_ref):
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-3)


class TestEdtSweep:
    def test_matches_xla_sweep(self, monkeypatch):
        from saguaro_tpu.kernels.shape_extra import _label_edt_sq

        rng = np.random.default_rng(5)
        labels = np.zeros((40, 56), np.int32)
        labels[4:18, 6:30] = 1
        labels[20:36, 12:52] = 2
        labels[8:12, 40:50] = 3
        lab = jnp.asarray(labels)
        ref = np.asarray(_label_edt_sq(lab, 16))
        monkeypatch.setenv("SAGUARO_FORCE_PALLAS", "1")
        # dispatch mode rides the static key now — no cache clearing
        got = np.asarray(_label_edt_sq(lab, 16))
        monkeypatch.delenv("SAGUARO_FORCE_PALLAS")
        np.testing.assert_array_equal(got, ref)

    def test_vmapped_batch(self, monkeypatch):
        from saguaro_tpu.kernels.shape_extra import _label_edt_sq

        labels = np.zeros((2, 24, 40), np.int32)
        labels[0, 2:20, 4:30] = 1
        labels[1, 6:18, 10:38] = 2
        lab = jnp.asarray(labels)
        ref = np.stack([np.asarray(_label_edt_sq(l, 8)) for l in lab])
        monkeypatch.setenv("SAGUARO_FORCE_PALLAS", "1")
        got = np.asarray(jax.vmap(lambda l: _label_edt_sq(l, 8))(lab))
        monkeypatch.delenv("SAGUARO_FORCE_PALLAS")
        np.testing.assert_array_equal(got, ref)


class TestPick2:
    """pick2_pallas (interpreter mode on CPU) vs direct numpy indexing."""

    def test_matches_numpy_pick(self):
        from saguaro_tpu.kernels.segment_pallas import pick2_pallas

        rng = np.random.default_rng(11)
        n, n_ch, k_tab = 5000, 3, 2
        hi = rng.integers(0, 256, (n, n_ch)).astype(np.int32)
        lo = rng.integers(0, 256, (n, n_ch)).astype(np.int32)
        tables = rng.integers(0, 65536, (n_ch, 256, 256, k_tab)).astype(
            np.float32
        )
        got = np.asarray(
            pick2_pallas(jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(tables))
        )
        want = np.stack(
            [
                np.stack(
                    [tables[c, hi[:, c], lo[:, c], k] for k in range(k_tab)],
                    axis=-1,
                )
                for c in range(n_ch)
            ],
            axis=1,
        )
        np.testing.assert_array_equal(got, want)

    def test_vmapped_batch(self):
        from saguaro_tpu.kernels.segment_pallas import pick2_pallas

        rng = np.random.default_rng(12)
        n, n_ch, k_tab, b = 2048, 2, 3, 3
        hi = jnp.asarray(rng.integers(0, 256, (b, n, n_ch)).astype(np.int32))
        lo = jnp.asarray(rng.integers(0, 256, (b, n, n_ch)).astype(np.int32))
        tables = jnp.asarray(
            rng.integers(0, 65536, (b, n_ch, 256, 256, k_tab)).astype(
                np.float32
            )
        )
        got = jax.vmap(pick2_pallas)(hi, lo, tables)
        for i in range(b):
            np.testing.assert_array_equal(
                np.asarray(got[i]),
                np.asarray(pick2_pallas(hi[i], lo[i], tables[i])),
            )
