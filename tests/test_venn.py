"""Area-proportional two-set Venn layout (plots/venn.py) — the geometry
matplotlib_venn renders for the bioactivity overview
(/root/reference/Inuction_Score_hit.py:141,170-173): subset relations as
containment, equal sets concentric, partial overlaps with a lens whose
area matches the intersection count.
"""

import math

import matplotlib.pyplot as plt
import pytest

from saguaro_tpu.plots.venn import _lens_area, solve_venn2_layout, venn2


class TestLayout:
    def test_subset_renders_contained(self):
        # every timepoint-active well is bioactive -> containment
        r_a, r_b, d = solve_venn2_layout(100, 30, 30)
        assert d + min(r_a, r_b) <= max(r_a, r_b) + 1e-9

    def test_equal_sets_concentric(self):
        r_a, r_b, d = solve_venn2_layout(50, 50, 50)
        assert d == 0.0 and r_a == pytest.approx(r_b)

    def test_disjoint_separated(self):
        r_a, r_b, d = solve_venn2_layout(40, 60, 0)
        assert d > r_a + r_b

    def test_partial_overlap_area_proportional(self):
        n_a, n_b, n_ab = 120, 80, 25
        r_a, r_b, d = solve_venn2_layout(n_a, n_b, n_ab)
        assert abs(r_a - r_b) < d < r_a + r_b
        assert _lens_area(r_a, r_b, d) == pytest.approx(n_ab, rel=1e-3)
        # areas proportional to set sizes
        assert math.pi * r_a**2 == pytest.approx(n_a, rel=1e-6)
        assert math.pi * r_b**2 == pytest.approx(n_b, rel=1e-6)

    def test_empty_sets_no_crash(self):
        solve_venn2_layout(0, 0, 0)
        solve_venn2_layout(10, 0, 0)


class TestRender:
    @pytest.mark.parametrize(
        "a,b",
        [
            (set(range(100)), set(range(30))),   # subset
            (set(range(50)), set(range(50))),    # equal
            (set(range(40)), set(range(40, 90))),  # disjoint
            (set(range(60)), set(range(40, 120))),  # partial
        ],
    )
    def test_draws_without_error(self, a, b):
        fig, ax = plt.subplots()
        venn2([a, b], set_labels=("All", "Bioactive"), ax=ax)
        # counts rendered as text
        texts = {t.get_text() for t in ax.texts}
        assert "All" in texts and "Bioactive" in texts
        if a & b:
            assert str(len(a & b)) in texts
        plt.close(fig)
