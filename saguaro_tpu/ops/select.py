"""Feature selection: pycytominer ``feature_select`` equivalent.

The reference runs the operation list
``["variance_threshold", "drop_na_columns", "correlation_threshold",
"drop_outliers"]`` in order (Pycyto_pertime.py:95-106,
Feature_select_cosine_ami.py:65-105) with tunable ``na_cutoff`` (default
0.05 inside pycytominer; the cross-plate CLI default is 0.5) and
``corr_threshold`` (0.9).

Semantics reproduced op by op:

* variance_threshold (freq_cut=0.05, unique_cut=0.01): drop a feature if
  the ratio of its second-most-common to most-common value count is below
  freq_cut (or it has a single unique value), or if its unique-value ratio
  is below unique_cut.
* drop_na_columns: drop features whose NaN fraction exceeds na_cutoff.
* correlation_threshold: over the remaining features, compute the pairwise
  Pearson correlation (pairwise-complete, NaN-aware); for every pair with
  |corr| > threshold, drop the member with the larger total absolute
  correlation (pycytominer's determine_high_cor_pair tie-break — this
  ordering is what makes selected-column sets reproducible).
* drop_outliers (outlier_cutoff=500): drop features with any
  |value| > cutoff.

The O(F^2 N) correlation matrix is the hot spot and runs as masked matmuls
on the MXU; the greedy pair logic is tiny host work.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from saguaro_tpu.ops.normalize import split_feature_columns

__all__ = ["feature_select", "nan_aware_correlation", "DEFAULT_OPERATIONS"]

DEFAULT_OPERATIONS = [
    "variance_threshold",
    "drop_na_columns",
    "correlation_threshold",
    "drop_outliers",
]


@jax.jit
def _masked_corr(x: jax.Array) -> jax.Array:
    """Pairwise-complete Pearson correlation of columns of x (N, F).

    For every column pair (i, j) the statistics are computed over rows where
    both are non-NaN, matching pandas ``DataFrame.corr``. All terms are
    (F, F) matmuls of the masked data — MXU work.
    """
    m = (~jnp.isnan(x)).astype(jnp.float32)
    x0 = jnp.where(jnp.isnan(x), 0.0, x).astype(jnp.float32)
    dot = lambda a, b: jnp.dot(a.T, b, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    n = dot(m, m)
    sx = dot(x0, m)          # sum of x_i over joint support (i rows, j cols)
    sxy = dot(x0, x0)
    sxx = dot(x0 * x0, m)
    # covariance and variances over the joint support
    cov = sxy - sx * sx.T / n
    var_i = sxx - sx * sx / n
    var_j = sxx.T - sx.T * sx.T / n
    denom = jnp.sqrt(var_i * var_j)
    corr = jnp.where(denom > 0, cov / denom, jnp.nan)
    return jnp.where(n > 1, corr, jnp.nan)


def nan_aware_correlation(values: np.ndarray) -> np.ndarray:
    """Host wrapper over the jitted masked correlation (float64 promoted)."""
    return np.asarray(_masked_corr(jnp.asarray(values, jnp.float32)))


def _variance_threshold(
    df: pd.DataFrame, features: list[str], freq_cut: float = 0.05, unique_cut: float = 0.01
) -> list[str]:
    excluded: set[str] = set()
    n = len(df)
    for col in features:
        vc = df[col].value_counts()
        if len(vc) <= 1:
            excluded.add(col)
            continue
        if vc.iloc[1] / vc.iloc[0] < freq_cut:
            excluded.add(col)
        if df[col].nunique() / n < unique_cut:
            excluded.add(col)
    return [c for c in features if c not in excluded]


def _drop_na_columns(df: pd.DataFrame, features: list[str], na_cutoff: float) -> list[str]:
    frac = df[features].isna().mean(axis=0)
    return [c for c in features if frac[c] <= na_cutoff]


def _correlation_threshold(
    df: pd.DataFrame, features: list[str], threshold: float
) -> list[str]:
    if len(features) < 2:
        return features
    vals = df[features].to_numpy(dtype=np.float32, na_value=np.nan)
    corr = np.array(nan_aware_correlation(vals))  # writable copy
    np.fill_diagonal(corr, np.nan)
    abs_corr = np.abs(corr)
    # pycytominer: rank features by total |corr| ascending; for each
    # over-threshold pair drop the later-ranked (larger-sum) member.
    cor_sum = np.nansum(abs_corr, axis=1)
    order = np.argsort(cor_sum, kind="stable")
    rank = np.empty(len(features), dtype=int)
    rank[order] = np.arange(len(features))
    iu = np.triu_indices(len(features), k=1)
    over = np.where(np.nan_to_num(abs_corr[iu], nan=0.0) > threshold)[0]
    excluded: set[int] = set()
    for k in over:
        i, j = iu[0][k], iu[1][k]
        excluded.add(i if rank[i] > rank[j] else j)
    return [f for idx, f in enumerate(features) if idx not in excluded]


def _drop_outliers(df: pd.DataFrame, features: list[str], outlier_cutoff: float) -> list[str]:
    max_abs = df[features].abs().max(axis=0)
    return [c for c in features if not (max_abs[c] > outlier_cutoff)]


def feature_select(
    profiles: pd.DataFrame,
    features: list[str] | None = None,
    operation: list[str] = DEFAULT_OPERATIONS,
    na_cutoff: float = 0.05,
    corr_threshold: float = 0.9,
    freq_cut: float = 0.05,
    unique_cut: float = 0.01,
    outlier_cutoff: float = 500.0,
) -> pd.DataFrame:
    """Apply the selection ops in order; returns metadata + kept features."""
    if features is None:
        _, features = split_feature_columns(profiles)
    meta_cols = [c for c in profiles.columns if c not in features]
    kept = list(features)
    for op in operation:
        if op == "variance_threshold":
            kept = _variance_threshold(profiles, kept, freq_cut, unique_cut)
        elif op == "drop_na_columns":
            kept = _drop_na_columns(profiles, kept, na_cutoff)
        elif op == "correlation_threshold":
            kept = _correlation_threshold(profiles, kept, corr_threshold)
        elif op == "drop_outliers":
            kept = _drop_outliers(profiles, kept, outlier_cutoff)
        else:
            raise ValueError(f"unknown feature_select operation: {op}")
    return profiles[meta_cols + kept].copy()
