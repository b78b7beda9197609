"""MAD-robustize normalization + platemap annotation.

pycytominer-equivalent math (the reference delegates to
``pycytominer.normalize(method="mad_robustize", samples=...)`` at
Pycyto_pertime.py:84-89 and Normalize_CP_ami.py:137-142, and to
``pycytominer.annotate`` at Normalize_CP_ami.py:132):

* fit per-feature median and MAD (scaled by 1.4826) on the *sample subset*
  only — typically the DMSO wells of one timepoint — with NaNs ignored;
* transform every row: ``(x - median) / (mad + epsilon)``,
  epsilon = 1e-18;
* annotate: inner-join the platemap onto profiles on well, platemap
  columns first.

The per-feature medians/MADs and the broadcast transform run as one jitted
XLA program; the pandas layer only routes columns.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

__all__ = ["mad_robustize", "normalize_profiles", "annotate", "split_feature_columns"]

MAD_SCALE = 1.4826
EPSILON = 1e-18


def split_feature_columns(df: pd.DataFrame) -> tuple[list[str], list[str]]:
    """The suite-wide column convention: anything containing 'Metadata' is
    metadata, everything else is a feature (Pycyto_pertime.py:82,90)."""
    meta = [c for c in df.columns if "Metadata" in c]
    feats = [c for c in df.columns if "Metadata" not in c]
    return meta, feats


@jax.jit
def _nanmedian_cols(x: jax.Array) -> jax.Array:
    return jnp.nanmedian(x, axis=0)


@jax.jit
def mad_robustize(values: jax.Array, sample_mask: jax.Array, epsilon: float = EPSILON) -> jax.Array:
    """Robust z-score per column: stats from masked rows, applied to all.

    values: (N, F) float; sample_mask: (N,) bool. NaNs outside/inside the
    subset are ignored when fitting (scipy ``nan_policy='omit'`` parity).
    """
    values = values.astype(jnp.float32)
    masked = jnp.where(sample_mask[:, None], values, jnp.nan)
    med = jnp.nanmedian(masked, axis=0)
    mad = jnp.nanmedian(jnp.abs(masked - med), axis=0) * MAD_SCALE
    return (values - med) / (mad + epsilon)


def normalize_profiles(
    profiles: pd.DataFrame,
    features: list[str] | None = None,
    sample_mask: np.ndarray | None = None,
    samples_query: str | None = None,
) -> pd.DataFrame:
    """pycytominer ``normalize(method='mad_robustize')`` equivalent.

    ``samples_query`` is a pandas query string (the reference passes e.g.
    ``"Metadata_Compound == 'DMSO' and Metadata_Timepoint == '6'"``);
    alternatively pass a boolean ``sample_mask`` directly.
    Returns metadata columns first, then normalized features.
    """
    if features is None:
        _, features = split_feature_columns(profiles)
    meta_cols = [c for c in profiles.columns if c not in features]

    if sample_mask is None:
        if samples_query is None or samples_query == "all":
            sample_mask = np.ones(len(profiles), dtype=bool)
        else:
            idx = profiles.query(samples_query).index
            sample_mask = profiles.index.isin(idx)
    sample_mask = np.asarray(sample_mask, dtype=bool)

    vals = profiles[features].to_numpy(dtype=np.float32, na_value=np.nan)
    out = np.asarray(mad_robustize(jnp.asarray(vals), jnp.asarray(sample_mask)))
    result = pd.concat(
        [
            profiles[meta_cols].reset_index(drop=True),
            pd.DataFrame(out, columns=features),
        ],
        axis=1,
    )
    return result


def annotate(
    profiles: pd.DataFrame,
    platemap: pd.DataFrame,
    join_on: tuple[str, str] = ("Metadata_Well", "Metadata_Well"),
) -> pd.DataFrame:
    """pycytominer ``annotate`` equivalent: inner-join the platemap onto the
    profiles on well (Normalize_CP_ami.py:132), platemap columns first."""
    left_key, right_key = join_on
    merged = platemap.merge(
        profiles, left_on=left_key, right_on=right_key, how="inner"
    )
    if left_key != right_key:
        merged = merged.drop(columns=[left_key])
    return merged
