"""XGBoost-JSON tree-ensemble evaluator (dead-cell classifier).

Replaces the reference's ``xgb.Booster.load_model(json)`` +
``bst.predict(DMatrix(flat_features))`` dead-cell scoring
(Cellpose_GPU_s3fs.py:114-118,208-216; SURVEY.md E3) with a vectorized
JAX traversal: all trees are padded into dense (n_trees, n_nodes) arrays
and every row walks every tree simultaneously with gather steps — an
embarrassingly parallel VPU workload, no host round-trip in the embedding
pipeline.

Supported format: the xgboost >= 1.7 JSON model file
(``learner.gradient_booster.model.trees`` with per-tree
``left_children/right_children/split_indices/split_conditions/
default_left``; leaf nodes marked by ``left_children == -1`` carry their
output value in ``split_conditions``). Binary-logistic models apply a
sigmoid over the summed margins plus the stored base score.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["XGBEnsemble"]


@dataclass
class XGBEnsemble:
    left: jnp.ndarray          # (T, N) int32, -1 at leaves
    right: jnp.ndarray         # (T, N) int32
    feature: jnp.ndarray       # (T, N) int32
    threshold: jnp.ndarray     # (T, N) float32 (leaf value at leaves)
    default_left: jnp.ndarray  # (T, N) bool
    max_depth: int
    base_margin: float
    objective: str = "binary:logistic"

    @classmethod
    def from_json(cls, path_or_str: str) -> "XGBEnsemble":
        if path_or_str.lstrip().startswith("{"):
            doc = json.loads(path_or_str)
        else:
            from saguaro_tpu.io import storage

            doc = json.loads(storage.read_bytes(path_or_str).decode("utf-8"))
        learner = doc["learner"]
        objective = learner.get("objective", {}).get("name", "binary:logistic")
        base_score = float(
            learner.get("learner_model_param", {}).get("base_score", 0.5)
        )
        if objective.startswith("binary:logistic"):
            # stored base_score is a probability; margins add to its logit
            base_margin = float(np.log(base_score / (1.0 - base_score)))
        else:
            base_margin = base_score
        trees = learner["gradient_booster"]["model"]["trees"]
        n_nodes = max(len(t["left_children"]) for t in trees)

        def pad(vals, fill, dtype):
            out = np.full((len(trees), n_nodes), fill, dtype)
            for i, v in enumerate(vals):
                out[i, : len(v)] = v
            return out

        left = pad([t["left_children"] for t in trees], -1, np.int32)
        right = pad([t["right_children"] for t in trees], -1, np.int32)
        feat = pad([t["split_indices"] for t in trees], 0, np.int32)
        thr = pad([t["split_conditions"] for t in trees], 0.0, np.float32)
        dleft = pad(
            [t.get("default_left", [1] * len(t["left_children"])) for t in trees],
            1,
            np.int32,
        ).astype(bool)
        # conservative static traversal depth: longest root->leaf path
        max_depth = _max_depth(left, right)
        return cls(
            left=jnp.asarray(left),
            right=jnp.asarray(right),
            feature=jnp.asarray(feat),
            threshold=jnp.asarray(thr),
            default_left=jnp.asarray(dleft),
            max_depth=max_depth,
            base_margin=base_margin,
            objective=objective,
        )

    def predict_margin(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, F) -> (B,) summed tree margins + base margin."""
        return _predict_margin(
            x,
            self.left,
            self.right,
            self.feature,
            self.threshold,
            self.default_left,
            self.max_depth,
            self.base_margin,
        )

    def predict(self, x) -> jnp.ndarray:
        """Probability for binary:logistic, margin otherwise — parity with
        ``Booster.predict``."""
        m = self.predict_margin(jnp.asarray(x, jnp.float32))
        if self.objective.startswith("binary:logistic"):
            return jax.nn.sigmoid(m)
        return m

    def predict_dead(self, x, threshold: float = 0.5) -> jnp.ndarray:
        """The reference's dead-cell rule: preds > 0.5
        (Cellpose_GPU_s3fs.py:216)."""
        return self.predict(x) > threshold


def _max_depth(left: np.ndarray, right: np.ndarray) -> int:
    depth = 0
    for t in range(left.shape[0]):
        stack = [(0, 0)]
        while stack:
            node, d = stack.pop()
            depth = max(depth, d)
            if left[t, node] >= 0:
                stack.append((int(left[t, node]), d + 1))
                stack.append((int(right[t, node]), d + 1))
    return depth


@partial(jax.jit, static_argnames=("max_depth",))
def _predict_margin(
    x, left, right, feature, threshold, default_left, max_depth, base_margin
):
    n_trees = left.shape[0]
    tree_ids = jnp.arange(n_trees)

    def walk_row(row):
        def step(_, node):
            feat = feature[tree_ids, node]
            thr = threshold[tree_ids, node]
            val = row[feat]
            go_left = jnp.where(jnp.isnan(val), default_left[tree_ids, node], val < thr)
            l = left[tree_ids, node]
            r = right[tree_ids, node]
            nxt = jnp.where(go_left, l, r)
            return jnp.where(l < 0, node, nxt)  # stay at leaves

        node = jax.lax.fori_loop(
            0, max_depth, step, jnp.zeros(n_trees, jnp.int32)
        )
        return jnp.sum(threshold[tree_ids, node]) + base_margin

    return jax.vmap(walk_row)(x)
