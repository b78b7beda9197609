"""Multichannel fused kernels == per-channel reference kernels."""

import numpy as np

from saguaro_tpu.kernels.multichannel import (
    edge_intensity_multichannel,
    multichannel_stats,
    radial_distribution_multichannel,
)
from saguaro_tpu.kernels.objects_extra import (
    edge_intensity_features,
    radial_distribution_features,
)
from saguaro_tpu.kernels.segment_reduce import (
    correlation_features,
    intensity_features,
)


def _fixture(rng, n_ch=3):
    h = w = 96
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    lab = np.zeros((h, w), np.int32)
    for k, (cy, cx) in enumerate([(24, 24), (24, 70), (70, 48)], start=1):
        lab[(yy - cy) ** 2 + (xx - cx) ** 2 <= 150] = k
    img = (rng.random((h, w, n_ch)) * 1000).astype(np.float32)
    img[..., 1] += 200.0 * (lab > 0)
    return img, lab


class TestMultichannelStats:
    def test_intensity_matches_per_channel(self, rng):
        img, lab = _fixture(rng)
        inten_mc, _ = multichannel_stats(img, lab, 8)
        for c in range(img.shape[-1]):
            ref = intensity_features(img[..., c], lab, 8)
            for k, v in ref.items():
                np.testing.assert_allclose(
                    np.asarray(inten_mc[k])[:, c], np.asarray(v),
                    rtol=2e-4, atol=2e-3, err_msg=f"ch{c} {k}",
                )

    def test_correlation_matches_per_pair(self, rng):
        img, lab = _fixture(rng)
        _, corr_mc = multichannel_stats(img, lab, 8)
        for (a, b), (c_ab, s_ab) in corr_mc.items():
            ref = correlation_features(img[..., a], img[..., b], lab, 8)
            np.testing.assert_allclose(
                np.asarray(c_ab), np.asarray(ref["Correlation"]), rtol=1e-3, atol=1e-4
            )
            np.testing.assert_allclose(
                np.asarray(s_ab), np.asarray(ref["Slope"]), rtol=1e-3, atol=1e-4
            )


class TestEdgeMultichannel:
    def test_matches_per_channel(self, rng):
        img, lab = _fixture(rng)
        mc = edge_intensity_multichannel(img, lab, 8)
        for c in range(img.shape[-1]):
            ref = edge_intensity_features(img[..., c], lab, 8)
            for k, v in ref.items():
                np.testing.assert_allclose(
                    np.asarray(mc[k])[:, c], np.asarray(v),
                    rtol=2e-4, atol=2e-3, err_msg=f"ch{c} {k}",
                )


class TestRadialMultichannel:
    def test_matches_per_channel(self, rng):
        img, lab = _fixture(rng)
        mc = radial_distribution_multichannel(img, lab, 8, 4)
        for c in range(img.shape[-1]):
            ref = radial_distribution_features(img[..., c], lab, 8, 4)
            np.testing.assert_allclose(
                np.asarray(mc["FracAtD"])[:, :, c], np.asarray(ref["FracAtD"]),
                rtol=5e-4, atol=1e-5,
            )
            np.testing.assert_allclose(
                np.asarray(mc["MeanFrac"])[:, :, c], np.asarray(ref["MeanFrac"]),
                rtol=5e-4, atol=1e-5,
            )
