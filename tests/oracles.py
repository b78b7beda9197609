"""Numpy/scipy oracles implementing the reference math verbatim.

Each function transcribes the cited reference implementation so the JAX
kernels can be golden-tested against it (SURVEY.md §4 item 1).
"""

from __future__ import annotations

import numpy as np
import scipy.fftpack
import scipy.ndimage
import scipy.stats


def rps_oracle(img: np.ndarray):
    """centrosome rps as transcribed at Illumination_QC_mult.py:31-70."""
    assert img.ndim == 2
    radii2 = (np.arange(img.shape[0]).reshape((img.shape[0], 1)) ** 2) + (
        np.arange(img.shape[1]) ** 2
    )
    radii2 = np.minimum(radii2, np.flipud(radii2))
    radii2 = np.minimum(radii2, np.fliplr(radii2))
    maxwidth = min(img.shape[0], img.shape[1]) / 8.0
    if np.ptp(img) > 0:
        img = img / np.median(np.abs(img - np.mean(img)))
    mag = np.abs(scipy.fftpack.fft2(img - np.mean(img)))
    power = mag ** 2
    radii = np.floor(np.sqrt(radii2)).astype(int) + 1
    labels = np.arange(2, np.floor(maxwidth)).astype(int).tolist()
    if len(labels) > 0:
        magsum = scipy.ndimage.sum(mag, radii, labels)
        powersum = scipy.ndimage.sum(power, radii, labels)
        return np.array(labels), np.array(magsum), np.array(powersum)
    return np.array([2]), np.array([0]), np.array([0])


def slope_oracle(img: np.ndarray) -> float:
    """PowerLogLogSlope as at Illumination_QC_mult.py:104-114."""
    radii, _, powersum = rps_oracle(img.astype(float))
    valid = powersum > 0
    if np.sum(valid) > 2:
        slope, *_ = scipy.stats.linregress(
            np.log(radii[valid]), np.log(powersum[valid])
        )
        return float(slope)
    return 0.0


def percent_maximal_oracle(image: np.ndarray) -> float:
    """CP saturation logic as at Illumination_QC_mult.py:73-95."""
    pixel_data = image
    if pixel_data.size == 0:
        return 0.0
    max_val = np.max(pixel_data)
    return 100.0 * float(np.sum(pixel_data == max_val)) / float(pixel_data.size)


def max_projection_oracle(images: list[np.ndarray]) -> np.ndarray:
    """MaxProjection.py:45."""
    return np.maximum.reduce(images)


def pil_lanczos_oracle(img: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """PIL LANCZOS resize as at Image_re-binning.py:18 (size = (W, H))."""
    from PIL import Image

    return np.asarray(Image.fromarray(img).resize(size, resample=Image.Resampling.LANCZOS))


def pil_lanczos_exact_oracle(img: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """PIL LANCZOS via the float path (mode 'F'), which applies the exact
    double-precision convolution. PIL's native uint16 ('I;16') path quantizes
    filter coefficients to 8-bit fixed point and deviates from the true
    Lanczos result by up to ~3% of full scale; our TPU kernel implements the
    exact math, so 16-bit parity is checked against this float oracle."""
    from PIL import Image

    f = Image.fromarray(img.astype(np.float32), mode="F")
    return np.asarray(f.resize(size, resample=Image.Resampling.LANCZOS))


def scale_to_8bit_oracle(image_16bit: np.ndarray) -> np.ndarray:
    """Cellpose_GPU_s3fs.py:34-43."""
    min_val, max_val = np.min(image_16bit), np.max(image_16bit)
    if max_val == min_val:
        return np.zeros(image_16bit.shape, dtype=np.uint8)
    scaled = 255.0 * (image_16bit.astype(np.float32) - min_val) / (max_val - min_val)
    return scaled.astype(np.uint8)


def double_sigmoid_oracle(x, k: int = 3, alpha: float = 2.3538):
    """Pycyto_pertime.py:13-16."""
    return (x / alpha) ** k / np.sqrt(1 + (x / alpha) ** (2 * k))


def mad_robustize_oracle(
    values: np.ndarray, sample_mask: np.ndarray, epsilon: float = 1e-18
) -> np.ndarray:
    """pycytominer mad_robustize: per-column robust z-score where median and
    MAD (scaled by 1.4826) come from the sample subset only (SURVEY.md E5)."""
    sub = values[sample_mask]
    med = np.nanmedian(sub, axis=0)
    mad = np.nanmedian(np.abs(sub - med), axis=0) * 1.4826
    return (values - med) / (mad + epsilon)


def cosine_similarity_oracle(x: np.ndarray) -> np.ndarray:
    """sklearn pairwise cosine over rows (Pycyto_pertime.py:132)."""
    from sklearn.metrics.pairwise import cosine_similarity

    return cosine_similarity(x)
