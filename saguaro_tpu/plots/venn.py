"""Two-set Venn diagram (matplotlib_venn-free fallback).

The reference uses matplotlib_venn.venn2 for the bioactivity overview
(Inuction_Score_hit.py:141,170-173); this draws the equivalent two-circle
diagram with region counts using plain matplotlib.
"""

from __future__ import annotations

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
from matplotlib.patches import Circle

__all__ = ["venn2"]


def venn2(sets, set_labels=("A", "B"), ax=None):
    a, b = (set(s) for s in sets)
    only_a, only_b, both = len(a - b), len(b - a), len(a & b)
    ax = ax or plt.gca()

    # overlap circles proportionally to the intersection
    if both and (only_a or only_b):
        d = 1.2
    elif both:
        d = 0.0 if a == b else 0.6
    else:
        d = 2.4
    r_a = max(0.6, min(1.4, 0.6 + 0.05 * len(a) ** 0.5))
    r_b = max(0.6, min(1.4, 0.6 + 0.05 * len(b) ** 0.5))
    ax.add_patch(Circle((-d / 2, 0), r_a, alpha=0.4, color="#4C72B0"))
    ax.add_patch(Circle((d / 2, 0), r_b, alpha=0.4, color="#DD8452"))
    if only_a:
        ax.text(-d / 2 - r_a / 2, 0, str(only_a), ha="center", va="center")
    if only_b:
        ax.text(d / 2 + r_b / 2, 0, str(only_b), ha="center", va="center")
    if both:
        ax.text(0, 0, str(both), ha="center", va="center")
    ax.text(-d / 2, -r_a - 0.25, str(set_labels[0]), ha="center", va="top")
    ax.text(d / 2, r_b + 0.25, str(set_labels[1]), ha="center", va="bottom")
    lim = max(r_a, r_b) + d / 2 + 0.5
    ax.set_xlim(-lim, lim)
    ax.set_ylim(-lim, lim)
    ax.set_aspect("equal")
    ax.axis("off")
    return ax
