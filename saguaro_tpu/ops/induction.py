"""Induction-score hit calling.

Reference math (Inuction_Score_hit.py:39-126):

* induction score per well = fraction of (non-metadata) features above the
  induction threshold (default 0.95);
* per-(plate, timepoint) bioactivity threshold = the DMSO wells' induction
  quantile (default 0.95, pandas linear interpolation);
* mean induction per (plate, timepoint, compound, concentration);
* Bioactive = mean induction >= the (plate, timepoint) threshold
  (missing threshold -> +inf, never bioactive).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

__all__ = ["induction_scores", "dmso_thresholds", "hit_calling"]


@jax.jit
def _induction(values: jax.Array, threshold: float) -> jax.Array:
    over = (values > threshold).astype(jnp.float32)
    return jnp.sum(over, axis=1) / values.shape[1]


def induction_scores(
    profiles: pd.DataFrame,
    induction_threshold: float = 0.95,
    feature_cols: list[str] | None = None,
) -> pd.Series:
    """Per-row induction score (Inuction_Score_hit.py:50-52).

    NOTE the reference uses ``col.startswith("Metadata_")`` here (not the
    contains-Metadata rule used elsewhere).
    """
    if feature_cols is None:
        feature_cols = [c for c in profiles.columns if not c.startswith("Metadata_")]
    vals = profiles[feature_cols].to_numpy(dtype=np.float32, na_value=np.nan)
    scores = np.asarray(_induction(jnp.asarray(vals), induction_threshold))
    return pd.Series(scores, index=profiles.index, name="induction")


def dmso_thresholds(
    sig_ind: pd.DataFrame,
    quantile: float = 0.95,
    dmso: str = "DMSO",
) -> dict:
    """Per-(plate, timepoint) DMSO induction quantile
    (Inuction_Score_hit.py:59-67)."""
    dmso_rows = sig_ind[sig_ind["Metadata_Compound"] == dmso]
    return (
        dmso_rows.groupby(["Metadata_Plate", "Metadata_Timepoint"])["induction"]
        .quantile(quantile)
        .to_dict()
    )


def hit_calling(
    profiles: pd.DataFrame,
    bioactive_threshold_quantile: float = 0.95,
    induction_threshold: float = 0.95,
    dmso: str = "DMSO",
) -> tuple[pd.DataFrame, dict, pd.DataFrame]:
    """Full hit-calling pass.

    Returns (ind_mean with Bioactive flag, thresholds dict, sig_ind table).
    """
    sig = profiles.copy()
    sig["induction"] = induction_scores(sig, induction_threshold)
    sig_ind = sig[[
        "Metadata_Plate", "Metadata_Well", "Metadata_Timepoint",
        "Metadata_Compound", "Metadata_ConcLevel", "induction",
    ]]
    thresholds = dmso_thresholds(sig_ind, bioactive_threshold_quantile, dmso)

    ind_mean = (
        sig_ind[sig_ind["Metadata_Compound"] != dmso]
        .groupby(["Metadata_Plate", "Metadata_Timepoint", "Metadata_Compound", "Metadata_ConcLevel"])
        .agg(induction_mean=("induction", "mean"))
        .reset_index()
    )
    ind_mean["Bioactive"] = ind_mean.apply(
        lambda row: int(
            row["induction_mean"]
            >= thresholds.get((row["Metadata_Plate"], row["Metadata_Timepoint"]), np.inf)
        ),
        axis=1,
    )
    return ind_mean, thresholds, sig_ind
