"""One-hot MXU reduction primitives vs their scatter/gather equivalents.

These primitives carry every per-object reduction in the measurement
stack (segment sums, histograms, table gathers) — scatter/gather
equality here underwrites the per-family kernel equality tests.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from saguaro_tpu.kernels.onehot_reduce import (
    mxu_take,
    onehot_counts,
    segment_matmul_sums,
)

CELLS = 37  # deliberately not a multiple of any tile size


@pytest.fixture
def keys(rng):
    return jnp.asarray(rng.integers(0, CELLS, 70000).astype(np.int32))


class TestSegmentMatmulSums:
    def test_matches_segment_sum(self, rng, keys):
        vals = jnp.asarray(rng.normal(0, 10, (70000, 5)).astype(np.float32))
        got = np.asarray(segment_matmul_sums(keys, vals, CELLS))
        want = np.asarray(
            jax.ops.segment_sum(vals, keys, num_segments=CELLS)
        )
        # two-term bf16 split carries ~16 mantissa bits per element;
        # ~2000-element sums land within ~4e-5 relative of exact f32
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-3)

    def test_integer_payloads_exact(self, rng, keys):
        vals = jnp.asarray(
            rng.integers(-2, 3, (70000, 2)).astype(np.float32)
        )
        got = np.asarray(segment_matmul_sums(keys, vals, CELLS))
        want = np.asarray(jax.ops.segment_sum(vals, keys, num_segments=CELLS))
        np.testing.assert_array_equal(got, want)  # bf16-exact small ints


class TestOnehotCounts:
    def test_matches_keyed_histogram(self, rng, keys):
        nbins = 13
        codes = jnp.asarray(rng.integers(0, nbins, 70000).astype(np.int32))
        valid = jnp.asarray(rng.random(70000) < 0.7)
        (got,) = onehot_counts(keys, [(codes, valid, nbins)], CELLS)
        want = np.asarray(
            jax.ops.segment_sum(
                valid.astype(jnp.float32),
                keys * nbins + codes,
                num_segments=CELLS * nbins,
            )
        ).reshape(CELLS, nbins)
        np.testing.assert_array_equal(np.asarray(got), want)

    def test_multiple_code_planes_share_one_pass(self, rng, keys):
        c1 = jnp.asarray(rng.integers(0, 4, 70000).astype(np.int32))
        c2 = jnp.asarray(rng.integers(0, 9, 70000).astype(np.int32))
        ok = jnp.asarray(np.ones(70000, bool))
        h1, h2 = onehot_counts(keys, [(c1, ok, 4), (c2, ok, 9)], CELLS)
        assert h1.shape == (CELLS, 4) and h2.shape == (CELLS, 9)
        assert float(jnp.sum(h1)) == 70000.0 == float(jnp.sum(h2))


class TestMxuTake:
    def test_matches_take_rows(self, rng, keys):
        table = jnp.asarray(rng.normal(500, 100, (CELLS, 3)).astype(np.float32))
        got = np.asarray(mxu_take(table, keys, CELLS))
        want = np.asarray(jnp.take(table, keys, axis=0))
        np.testing.assert_allclose(got, want, rtol=2e-7, atol=1e-4)

    def test_1d_table(self, rng, keys):
        table = jnp.asarray(rng.normal(0, 1, CELLS).astype(np.float32))
        got = np.asarray(mxu_take(table, keys, CELLS))
        want = np.asarray(jnp.take(table, keys))
        np.testing.assert_allclose(got, want, rtol=2e-7, atol=1e-6)

    def test_empty_label_sentinels_do_not_poison(self, keys):
        # inf / 3.4e38 rows (empty-label min/max sentinels) must gather
        # as 0, not NaN: in a matmul-gather every row participates
        table = np.full((CELLS, 2), 7.0, np.float32)
        table[3] = np.inf
        table[5] = 3.4028235e38  # f32 max: overflows bf16 to inf
        got = np.asarray(mxu_take(jnp.asarray(table), keys, CELLS))
        assert np.isfinite(got).all()
        sel = np.asarray(keys)
        np.testing.assert_array_equal(got[(sel != 3) & (sel != 5)], 7.0)
        np.testing.assert_array_equal(got[sel == 3], 0.0)
        np.testing.assert_array_equal(got[sel == 5], 0.0)


class TestMxuTakeT:
    def test_transposed_rows_match_take(self, rng, keys):
        from saguaro_tpu.kernels.onehot_reduce import mxu_take_t

        table = jnp.asarray(rng.normal(500, 100, (CELLS, 3)).astype(np.float32))
        got = np.asarray(mxu_take_t(table, keys, CELLS))
        want = np.asarray(jnp.take(table, keys, axis=0)).T
        assert got.shape == (3, 70000)
        np.testing.assert_allclose(got, want, rtol=2e-7, atol=1e-4)

    def test_1d_table_returns_one_row(self, rng, keys):
        from saguaro_tpu.kernels.onehot_reduce import mxu_take_t

        table = jnp.asarray(rng.normal(0, 1, CELLS).astype(np.float32))
        got = np.asarray(mxu_take_t(table, keys, CELLS))
        assert got.shape == (1, 70000)
        np.testing.assert_allclose(
            got[0], np.asarray(jnp.take(table, keys)), rtol=2e-7, atol=1e-6
        )


class TestExcessPrecisionBarriers:
    def test_split_barriers_present_in_jaxpr(self):
        """The bf16 split barriers must survive refactors: this
        environment forces --xla_allow_excess_precision, under which
        XLA:TPU simplifies t - f32(bf16(t)) to 0 in fused contexts,
        collapsing the hi/mid/lo split to bf16(t) (device-reproduced:
        gathered 2112.0 from a table row holding 2119.0, emptying every
        at_max candidate set). The barrier is the fix; assert it exists."""
        import jax

        from saguaro_tpu.kernels.onehot_reduce import (
            _bf16_split3,
            segment_matmul_sums,
        )

        t = jnp.ones((8, 3), jnp.float32)
        jaxpr = str(jax.make_jaxpr(_bf16_split3)(t))
        assert "optimization_barrier" in jaxpr
        keys = jnp.zeros(64, jnp.int32)
        vals = jnp.ones((64, 2), jnp.float32)
        jaxpr2 = str(
            jax.make_jaxpr(lambda k, v: segment_matmul_sums(k, v, 8))(keys, vals)
        )
        assert "optimization_barrier" in jaxpr2
