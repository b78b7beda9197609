"""CP 4.2.8 Threshold-module semantics (kernels/thresholding.py) vs
numpy transcriptions of the underlying skimage algorithms (skimage is
not installed here; the oracles transcribe threshold_otsu /
threshold_multiotsu(classes=3) / threshold_li as CP 4.2.8's threshold.py
calls them).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from saguaro_tpu.kernels.thresholding import (
    adaptive_threshold,
    global_threshold,
    smooth_for_binarize,
)


def np_otsu(data, nbins=256):
    hist, edges = np.histogram(data, bins=nbins)
    centers = (edges[:-1] + edges[1:]) / 2
    w = hist.astype(np.float64)
    c1 = np.cumsum(w)
    m1 = np.cumsum(w * centers)
    w0, w1 = c1, c1[-1] - c1
    mu0 = m1 / np.maximum(w0, 1e-12)
    mu1 = (m1[-1] - m1) / np.maximum(w1, 1e-12)
    var_b = w0 * w1 * (mu0 - mu1) ** 2
    var_b[-1] = -1
    return centers[np.argmax(var_b)]


def np_multiotsu3(data, nbins=128):
    hist, edges = np.histogram(data, bins=nbins)
    centers = (edges[:-1] + edges[1:]) / 2
    p = hist / hist.sum()
    cw = np.concatenate([[0], np.cumsum(p)])
    cm = np.concatenate([[0], np.cumsum(p * centers)])

    def seg(lo, hi):
        w = cw[hi] - cw[lo]
        m = cm[hi] - cm[lo]
        return (m * m / w) if w > 0 else 0.0

    best, arg = -1.0, (0, 1)
    for i in range(nbins - 2):
        s0 = seg(0, i + 1)
        for j in range(i + 1, nbins - 1):
            s = s0 + seg(i + 1, j + 1) + seg(j + 1, nbins)
            if s > best:
                best, arg = s, (i, j)
    return centers[arg[0]], centers[arg[1]]


def np_li(data, tolerance):
    vmin = data.min()
    img = data.astype(np.float64) - vmin
    t_next = img.mean()
    t_curr = t_next - 2 * tolerance - 1
    it = 0
    while abs(t_next - t_curr) > tolerance and it < 256:
        t_curr = t_next
        fore = img > t_curr
        mean_fore = img[fore].mean() if fore.any() else 0.0
        mean_back = img[~fore].mean() if (~fore).any() else 0.0
        if mean_back == 0:
            mean_back = tolerance
        t_next = (mean_back - mean_fore) / (np.log(mean_back) - np.log(mean_fore))
        it += 1
    return t_next + vmin


@pytest.fixture(scope="module")
def bimodal():
    rng = np.random.default_rng(0)
    lo = rng.normal(300, 40, 4000)
    hi = rng.normal(2500, 300, 1500)
    mid = rng.normal(1200, 150, 800)
    return np.clip(
        np.concatenate([lo, hi, mid]), 1, 65535
    ).astype(np.float32).reshape(90, 70)


class TestGlobalThreshold:
    def test_otsu_two_class(self, bimodal):
        final, orig = global_threshold(jnp.asarray(bimodal), method="otsu")
        ref = np_otsu(bimodal)
        assert abs(float(orig) - ref) < (bimodal.max() - bimodal.min()) / 256

    def test_otsu_three_class_both_splits(self, bimodal):
        ref_lo, ref_hi = np_multiotsu3(bimodal)
        _, t_fore = global_threshold(
            jnp.asarray(bimodal), method="otsu3", middle_foreground=True
        )
        _, t_back = global_threshold(
            jnp.asarray(bimodal), method="otsu3", middle_foreground=False
        )
        step = (bimodal.max() - bimodal.min()) / 128
        assert abs(float(t_fore) - ref_lo) < step
        assert abs(float(t_back) - ref_hi) < step
        assert float(t_fore) < float(t_back)

    def test_li_mce(self, bimodal):
        _, orig = global_threshold(
            jnp.asarray(bimodal), method="li", li_tolerance=0.5
        )
        ref = np_li(bimodal, 0.5)
        assert abs(float(orig) - ref) < 2.0  # iterate-to-half-grid

    def test_log_transform(self, bimodal):
        _, orig = global_threshold(
            jnp.asarray(bimodal), method="otsu", log_transform=True
        )
        ref = np.expm1(np_otsu(np.log1p(bimodal)))
        assert abs(float(orig) - ref) / ref < 0.02
        # the log-space split lands elsewhere than the linear one
        _, lin = global_threshold(jnp.asarray(bimodal), method="otsu")
        assert abs(float(orig) - float(lin)) > 1.0

    def test_correction_and_bounds(self, bimodal):
        final, orig = global_threshold(
            jnp.asarray(bimodal), method="otsu",
            correction=1.5, lower_bound=0.0, upper_bound=1000.0,
        )
        assert float(final) == pytest.approx(
            min(float(orig) * 1.5, 1000.0), rel=1e-6
        )


def np_adaptive(
    image, method="otsu", window=32, correction=1.0,
    lower=0.0, upper=3.0e38, log=False, li_tol=0.5,
):
    """CP 4.2.8 adaptive-scope oracle (threshold.py get_local_threshold):
    int-truncated block grid, per-block global method, block-constant
    map, [0.7, 1.5] x corrected-guide clip, then range clip."""
    h, w = image.shape
    nb_i, nb_j = h // window, w // window
    assert nb_i >= 2 and nb_j >= 2
    data = np.log1p(image) if log else image.astype(np.float64)

    def one(block):
        if block.max() <= block.min():
            return float(block.min())
        if method == "otsu":
            return np_otsu(block)
        if method == "li":
            tol = np.log1p(li_tol) * 0.5 + 1e-6 if log else li_tol
            return np_li(block, tol)
        raise AssertionError(method)

    guide = one(data)
    orig = np.zeros((h, w))
    inc_i, inc_j = h / nb_i, w / nb_j
    for i in range(nb_i):
        i0, i1 = int(i * inc_i), int((i + 1) * inc_i)
        for j in range(nb_j):
            j0, j1 = int(j * inc_j), int((j + 1) * inc_j)
            orig[i0:i1, j0:j1] = one(data[i0:i1, j0:j1])
    if log:
        guide, orig = np.expm1(guide), np.expm1(orig)
    gc = guide * correction
    final = np.clip(np.clip(orig * correction, 0.7 * gc, 1.5 * gc), lower, upper)
    return final, orig


class TestAdaptiveThreshold:
    def test_otsu_blocks_match_oracle(self, bimodal):
        # tile a gradient onto the bimodal field so blocks genuinely differ
        img = bimodal + np.linspace(0, 800, bimodal.shape[1])[None, :].astype(
            np.float32
        )
        final, guide, orig = adaptive_threshold(
            jnp.asarray(img), method="otsu", window_size=24
        )
        ref_final, ref_orig = np_adaptive(img, method="otsu", window=24)
        tol = (img.max() - img.min()) / 128  # half-ish bin width per block
        assert np.max(np.abs(np.asarray(orig) - ref_orig)) < tol
        assert np.max(np.abs(np.asarray(final) - ref_final)) < tol
        # the map is block-constant: the number of distinct values is
        # bounded by the block count
        assert len(np.unique(np.asarray(orig))) <= (90 // 24) * (70 // 24)

    def test_guide_clip_engages(self):
        """A uniformly bright block otsus near its own midpoint, far above
        the global guide (which splits just above the dark bulk); the CP
        [0.7, 1.5] x guide clip must pull it back."""
        rng = np.random.default_rng(5)
        img = rng.normal(500, 50, (64, 64)).astype(np.float32)
        img[:16, :16] = rng.normal(2500, 250, (16, 16))  # one bright block
        final, guide, orig = adaptive_threshold(
            jnp.asarray(img), method="otsu", window_size=16
        )
        g = float(guide)
        assert np.all(np.asarray(final) >= 0.7 * g - 1e-3)
        assert np.all(np.asarray(final) <= 1.5 * g + 1e-3)
        # and the bright block's raw value really was above the clip
        assert np.asarray(orig)[0, 0] > 1.5 * g

    def test_li_adaptive_matches_oracle(self):
        rng = np.random.default_rng(6)
        img = np.concatenate(
            [
                rng.normal(300, 30, (48, 24)),
                rng.normal(1500, 150, (48, 24)),
            ],
            axis=1,
        ).astype(np.float32)
        img[10:20, 4:14] += 4000
        img[30:44, 28:44] += 2500
        final, guide, orig = adaptive_threshold(
            jnp.asarray(img), method="li", window_size=16, li_tolerance=0.5
        )
        ref_final, ref_orig = np_adaptive(img, method="li", window=16)
        np.testing.assert_allclose(np.asarray(orig), ref_orig, atol=2.5)
        np.testing.assert_allclose(np.asarray(final), ref_final, atol=2.5)

    def test_window_over_half_raises(self, bimodal):
        with pytest.raises(ValueError, match="50%"):
            adaptive_threshold(jnp.asarray(bimodal), window_size=60)

    def test_pipeline_adaptive_scope(self):
        from saguaro_tpu.pipeline.features import FeatureConfig, measure_site

        rng = np.random.default_rng(7)
        lab = np.zeros((64, 64), np.int32)
        lab[12:28, 12:28] = 1
        img = rng.integers(100, 600, (64, 64, 2)).astype(np.uint16)
        img[8:36, 8:36, 1] += 2000
        cfg = FeatureConfig(
            channels=("DNA", "ER"), max_cells=8,
            measure_zernike=False, measure_moments=False,
            measure_convex=False, measure_radius=False,
            measure_colocalization=False, measure_texture=False,
            secondary_iterations=6,
            secondary_threshold_scope="adaptive",
            secondary_adaptive_window=16,
        )
        tables = measure_site(img, lab, cfg)
        row = tables["Image"].iloc[0]
        assert np.isfinite(row["Threshold_FinalThreshold_Cells"])
        assert np.isfinite(row["Threshold_OrigThreshold_Cells"])
        assert len(tables["Cells"]) >= 1

    def test_bad_scope_rejected_at_config(self):
        from saguaro_tpu.pipeline.features import FeatureConfig

        with pytest.raises(ValueError, match="secondary_threshold_scope"):
            FeatureConfig(channels=("DNA",), secondary_threshold_scope="block")


class TestSmoothing:
    def test_matches_normalized_gaussian(self):
        rng = np.random.default_rng(1)
        img = rng.random((48, 48)).astype(np.float32) * 100
        sigma = 1.3488 / 0.6744 / 2.0
        out = np.asarray(smooth_for_binarize(jnp.asarray(img), sigma))

        # oracle: constant-mode gaussian normalized by blurred ones
        radius = 32
        x = np.arange(-radius, radius + 1)
        k = np.exp(-0.5 * (x / sigma) ** 2)
        k[np.abs(x) > 4.0 * sigma + 0.5] = 0
        k = k / k.sum()

        def blur(a):
            ap = np.pad(a, radius)
            out2 = np.zeros_like(a, np.float64)
            for i, ki in enumerate(k):
                if ki == 0:
                    continue
                out2 += ki * ap[i : i + a.shape[0], radius:-radius]
            tmp = out2
            ap = np.pad(tmp, ((0, 0), (radius, radius)))
            out3 = np.zeros_like(a, np.float64)
            for i, ki in enumerate(k):
                if ki == 0:
                    continue
                out3 += ki * ap[:, i : i + a.shape[1]]
            return out3

        ref = blur(img) / blur(np.ones_like(img))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


class TestPipelineIntegration:
    def test_threshold_and_image_columns(self):
        from saguaro_tpu.pipeline.features import FeatureConfig, measure_site

        rng = np.random.default_rng(2)
        lab = np.zeros((64, 64), np.int32)
        lab[10:30, 10:30] = 1
        img = rng.integers(100, 1000, (64, 64, 2)).astype(np.uint16)
        img[8:36, 8:36, 1] += 2000
        cfg = FeatureConfig(
            channels=("DNA", "ER"), max_cells=8,
            measure_zernike=False, measure_moments=False,
            measure_convex=False, measure_radius=False,
            measure_colocalization=False, measure_texture=False,
            secondary_iterations=6,
            secondary_threshold_method="otsu3",
            secondary_threshold_smoothing=1.3488,
            secondary_threshold_correction=0.9,
        )
        tables = measure_site(img, lab, cfg)
        row = tables["Image"].iloc[0]
        assert row["Threshold_FinalThreshold_Cells"] == pytest.approx(
            row["Threshold_OrigThreshold_Cells"] * 0.9, rel=1e-5
        )
        for col in (
            "Intensity_MedianIntensity_DNA",
            "Intensity_MADIntensity_DNA",
            "Intensity_LowerQuartileIntensity_ER",
            "Intensity_UpperQuartileIntensity_ER",
            "Intensity_StdIntensity_DNA",
            "Intensity_MinIntensity_ER",
            "Intensity_PercentMaximal_DNA",
            "Intensity_TotalArea_DNA",
        ):
            assert col in row.index and np.isfinite(row[col]), col
        assert row["Intensity_TotalArea_DNA"] == 64 * 64
        # numpy-percentile parity for the quartiles
        assert row["Intensity_LowerQuartileIntensity_ER"] == pytest.approx(
            np.percentile(img[..., 1].astype(np.float32), 25), rel=1e-6
        )
        assert len(tables["Cells"]) >= 1
