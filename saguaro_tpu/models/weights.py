"""Pretrained-weight conversion: torch-style state dicts -> flax trees.

The reference's engines load pretrained checkpoints (cellpose 'nuclei',
timm/tf_efficientnetv2_l.in21k — Cellpose_GPU_s3fs.py:27-28,108-110);
numerical parity with the reference therefore runs through weight
conversion (SURVEY.md hard part 4). This module provides:

* layout converters (OIHW->HWIO convs, depthwise conv reshape, linear
  transpose);
* ``convert_state_dict``: map a torch state dict onto a flax variables
  tree via an explicit name-mapping table, with strict shape checking;
* ``convert_by_order``: structural fallback that pairs tensors by
  traversal order + shape signature and reports every decision — useful
  for checkpoints whose naming differs from ours but whose architecture
  matches block-for-block.

Checkpoint files themselves cannot be fetched in this environment; the
converters are exercised with synthetic round-trip state dicts in
tests/test_weights.py.
"""

from __future__ import annotations

import logging
from typing import Callable

import numpy as np

logger = logging.getLogger("saguaro_tpu.weights")

__all__ = [
    "conv_torch_to_flax",
    "depthwise_torch_to_flax",
    "linear_torch_to_flax",
    "flatten_tree",
    "unflatten_tree",
    "convert_state_dict",
    "convert_by_order",
]


def conv_torch_to_flax(w: np.ndarray) -> np.ndarray:
    """(O, I, kh, kw) -> (kh, kw, I, O)."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def depthwise_torch_to_flax(w: np.ndarray) -> np.ndarray:
    """torch depthwise (C, 1, kh, kw) -> flax feature-grouped (kh, kw, 1, C)."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def linear_torch_to_flax(w: np.ndarray) -> np.ndarray:
    """(out, in) -> (in, out)."""
    return np.transpose(np.asarray(w))


def flatten_tree(tree, prefix: str = "") -> dict[str, np.ndarray]:
    """Flax variables tree -> {'a/b/c': array}."""
    out: dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def unflatten_tree(flat: dict[str, np.ndarray]) -> dict:
    out: dict = {}
    for key, val in flat.items():
        node = out
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return out


def convert_state_dict(
    state_dict: dict[str, np.ndarray],
    flax_variables: dict,
    name_map: dict[str, str],
    transforms: dict[str, Callable[[np.ndarray], np.ndarray]] | None = None,
) -> dict:
    """Explicit-table conversion.

    name_map: {flax_flat_key: torch_key}; transforms: optional per-flax-key
    layout converter (default: inferred from rank — 4D conv transpose, 2D
    linear transpose, 1D copy). Shape mismatches raise.
    """
    transforms = transforms or {}
    flat = flatten_tree(flax_variables)
    new_flat: dict[str, np.ndarray] = {}
    for fkey, cur in flat.items():
        if fkey not in name_map:
            new_flat[fkey] = cur
            continue
        t = np.asarray(state_dict[name_map[fkey]])
        if fkey in transforms:
            t = transforms[fkey](t)
        elif t.ndim == 4:
            t = (
                depthwise_torch_to_flax(t)
                if t.shape[1] == 1 and cur.shape[2] == 1
                else conv_torch_to_flax(t)
            )
        elif t.ndim == 2 and t.shape != cur.shape:
            t = linear_torch_to_flax(t)
        if t.shape != cur.shape:
            raise ValueError(
                f"{fkey}: converted shape {t.shape} != expected {cur.shape} "
                f"(torch key {name_map[fkey]})"
            )
        new_flat[fkey] = t.astype(cur.dtype)
    return unflatten_tree(new_flat)


def _signature(shape: tuple[int, ...]) -> tuple:
    """Order-insensitive conv/linear signature for structural pairing."""
    return (len(shape), tuple(sorted(shape)))


def _interleaved_flax_keys(flat: dict[str, np.ndarray]) -> list[str]:
    """Order flax leaves the way a torch state dict orders tensors.

    flatten_tree yields all of ``params/`` before ``batch_stats/``, but
    torch emits each BatchNorm's running stats right after its
    weight/bias. Re-interleave: walk params in module order and splice
    each module's batch_stats (mean then var) in as the module ends.
    """
    params = [k for k in flat if k.startswith("params/")]
    stats_by_mod: dict[str, list[str]] = {}
    for k in flat:
        if k.startswith("params/"):
            continue
        mod = k.split("/", 1)[1].rsplit("/", 1)[0]
        stats_by_mod.setdefault(mod, []).append(k)
    leaf_rank = {"mean": 0, "var": 1}
    for v in stats_by_mod.values():
        v.sort(key=lambda k: leaf_rank.get(k.rsplit("/", 1)[1], 99))

    out: list[str] = []
    prev_mod: str | None = None
    for k in params:
        mod = k.split("/", 1)[1].rsplit("/", 1)[0]
        if prev_mod is not None and mod != prev_mod and prev_mod in stats_by_mod:
            out.extend(stats_by_mod.pop(prev_mod))
        out.append(k)
        prev_mod = mod
    if prev_mod is not None and prev_mod in stats_by_mod:
        out.extend(stats_by_mod.pop(prev_mod))
    for rem in stats_by_mod.values():
        out.extend(rem)
    return out


def convert_by_order(
    state_dict: dict[str, np.ndarray],
    flax_variables: dict,
    skip_torch: Callable[[str], bool] | None = None,
) -> tuple[dict, list[str]]:
    """Structural conversion: pair torch tensors with flax leaves in
    traversal order when their shape signatures match.

    Returns (converted variables, report lines). Tensors that cannot be
    paired are reported and left at their initialized values — the report
    is the parity-debugging artifact.
    """
    flat = flatten_tree(flax_variables)
    torch_items = [
        (k, np.asarray(v))
        for k, v in state_dict.items()
        if not (skip_torch and skip_torch(k)) and hasattr(v, "shape")
    ]
    report: list[str] = []
    used = [False] * len(torch_items)
    new_flat: dict[str, np.ndarray] = {}
    for fkey in _interleaved_flax_keys(flat):
        cur = flat[fkey]
        sig = _signature(cur.shape)
        found = None
        for j in range(len(torch_items)):
            tk, tv = torch_items[j]
            if used[j]:
                continue
            conv = tv
            if tv.ndim == 4:
                conv = (
                    depthwise_torch_to_flax(tv)
                    if tv.shape[1] == 1 and cur.ndim == 4 and cur.shape[2] == 1
                    else conv_torch_to_flax(tv)
                )
            elif tv.ndim == 2 and tv.shape != cur.shape:
                conv = linear_torch_to_flax(tv)
            if conv.shape == cur.shape and _signature(tv.shape) == sig:
                found = (j, tk, conv)
                break
        if found is None:
            report.append(f"UNMATCHED flax {fkey} {cur.shape}")
            new_flat[fkey] = cur
        else:
            j, tk, conv = found
            used[j] = True
            report.append(f"{fkey} <- {tk} {tuple(conv.shape)}")
            new_flat[fkey] = conv.astype(cur.dtype)
    for j, (tk, tv) in enumerate(torch_items):
        if not used[j]:
            report.append(f"UNUSED torch {tk} {tuple(tv.shape)}")
    return unflatten_tree(new_flat), report
