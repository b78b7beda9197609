from saguaro_tpu.ops.squash import double_sigmoid
from saguaro_tpu.ops.normalize import mad_robustize, normalize_profiles, annotate
from saguaro_tpu.ops.select import feature_select
from saguaro_tpu.ops.cosine import pairwise_cosine, group_cosine_similarity
from saguaro_tpu.ops.induction import induction_scores, hit_calling

__all__ = [
    "double_sigmoid",
    "mad_robustize",
    "normalize_profiles",
    "annotate",
    "feature_select",
    "pairwise_cosine",
    "group_cosine_similarity",
    "induction_scores",
    "hit_calling",
]
