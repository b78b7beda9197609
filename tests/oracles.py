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


def skimage_perimeter_oracle(mask: np.ndarray) -> float:
    """skimage.measure.perimeter(mask, neighbourhood=4) transcription —
    the regionprops 'perimeter' property CP 4.2.8 MeasureObjectSizeShape
    records (CellProfiler 4.2 measureobjectsizeshape uses
    skimage.measure.regionprops; consumed at Normalize_CP_ami.py:47-52).

    Border pixels (4-connected erosion residue) are scored by their 3x3
    border-neighbor configuration: value = 1 + 2*(N/S/E/W border
    neighbors) + 10*(diagonal border neighbors); weights 1, sqrt(2) and
    (1+sqrt(2))/2 on the attained configurations.
    """
    strel = scipy.ndimage.generate_binary_structure(2, 1)
    image = (mask > 0).astype(np.uint8)
    eroded = scipy.ndimage.binary_erosion(image, strel, border_value=0)
    border = image - eroded
    perimeter_weights = np.zeros(50)
    perimeter_weights[[5, 7, 15, 17, 25, 27]] = 1.0
    perimeter_weights[[21, 33]] = np.sqrt(2.0)
    perimeter_weights[[13, 23]] = (1.0 + np.sqrt(2.0)) / 2.0
    perimeter_image = scipy.ndimage.convolve(
        border,
        np.array([[10, 2, 10], [2, 1, 2], [10, 2, 10]]),
        mode="constant",
        cval=0,
    )
    return float(perimeter_weights[perimeter_image].sum())


def object_perimeters_oracle(labels: np.ndarray, max_cells: int) -> np.ndarray:
    """Per-object skimage perimeter, each object measured on its own
    isolated mask (regionprops semantics: other labels = background)."""
    out = np.zeros(max_cells)
    for l in np.unique(labels[labels > 0]):
        if l < max_cells:
            out[l] = skimage_perimeter_oracle(labels == l)
    return out


def object_edt_oracle(labels: np.ndarray) -> np.ndarray:
    """Per-object exact EDT: distance of each object pixel to the nearest
    pixel OUTSIDE the object (background or touching neighbor), computed
    per isolated mask with scipy.ndimage.distance_transform_edt — the
    centrosome distance_to_edge semantics CP 4.2.8 uses for
    Mean/Median/MaximumRadius (color-classed exact EDT)."""
    out = np.zeros(labels.shape)
    for l in np.unique(labels[labels > 0]):
        m = labels == l
        out[m] = scipy.ndimage.distance_transform_edt(m)[m]
    return out


def radius_stats_oracle(labels: np.ndarray, max_cells: int):
    """Per-object mean / np.median / max of the exact per-object EDT."""
    dist = object_edt_oracle(labels)
    mean = np.zeros(max_cells)
    median = np.zeros(max_cells)
    dmax = np.zeros(max_cells)
    for l in np.unique(labels[labels > 0]):
        if l < max_cells:
            v = dist[labels == l]
            mean[l] = v.mean()
            median[l] = np.median(v)
            dmax[l] = v.max()
    return mean, median, dmax


def propagate_dijkstra_oracle(
    labels: np.ndarray,
    intensity: np.ndarray,
    threshold: float,
    regularization: float,
) -> np.ndarray:
    """Unbounded shortest-path label propagation over the 8-connected
    grid with the centrosome propagate metric
    sqrt((dI^2 + lambda*d^2) / (1 + lambda)) — the convergence oracle for
    kernels/morphology.propagate_labels (CP IdentifySecondaryObjects
    'propagation', consumed via the Cells/Cytoplasm tables at
    Normalize_CP_ami.py:47-64)."""
    import heapq

    h, w = labels.shape
    lam = float(regularization)
    img = intensity.astype(np.float64)
    claimable = img > threshold
    dist = np.full((h, w), np.inf)
    out = labels.astype(np.int64).copy()
    heap = []
    for y, x in zip(*np.nonzero(labels > 0)):
        dist[y, x] = 0.0
        heapq.heappush(heap, (0.0, int(y), int(x)))
    steps = [
        (-1, 0, 1.0), (1, 0, 1.0), (0, -1, 1.0), (0, 1, 1.0),
        (-1, -1, 2.0), (-1, 1, 2.0), (1, -1, 2.0), (1, 1, 2.0),
    ]
    while heap:
        d, y, x = heapq.heappop(heap)
        if d > dist[y, x]:
            continue
        for dy, dx, d2 in steps:
            ny, nx = y + dy, x + dx
            if not (0 <= ny < h and 0 <= nx < w):
                continue
            if labels[ny, nx] > 0 or not claimable[ny, nx]:
                continue
            dI = img[ny, nx] - img[y, x]
            cost = np.sqrt((dI * dI + lam * d2) / (1.0 + lam))
            nd = d + cost
            if nd < dist[ny, nx]:
                dist[ny, nx] = nd
                out[ny, nx] = out[y, x]
                heapq.heappush(heap, (nd, int(ny), int(nx)))
    return out


def cellpose_convert_image_oracle(x: np.ndarray, nchan: int = 2) -> np.ndarray:
    """cellpose transforms.convert_image(x, channels=None) + normalize_img
    transcription (cellpose v2.2 transforms.py) for a (H, W, C) 2D input —
    the preprocessing CellposeModel.eval applies before the network when
    the reference calls cell_model.eval(image, diameter=100) with no
    channels argument (Cellpose_GPU_s3fs.py:143):

    * channels-last already (move_min_dim no-op for (H, W, C<=min(H,W)));
    * channels=None: keep the FIRST nchan channels (warn+truncate when
      more; zero-pad when fewer) — nchan=2 for the 'nuclei' model;
    * normalize_img: per channel, if p99 - p1 > 1e-3:
      (x - p1) / (p99 - p1) (normalize99, linear-interpolated
      percentiles); else the channel is zeroed.
    """
    x = x.astype(np.float32)
    if x.shape[-1] > nchan:
        x = x[..., :nchan]
    if x.shape[-1] < nchan:
        pad = np.zeros((*x.shape[:-1], nchan - x.shape[-1]), np.float32)
        x = np.concatenate([x, pad], axis=-1)
    out = np.zeros_like(x)
    for k in range(nchan):
        i99 = np.percentile(x[..., k], 99)
        i1 = np.percentile(x[..., k], 1)
        if i99 - i1 > 1e-3:
            out[..., k] = (x[..., k] - i1) / (i99 - i1)
        else:
            out[..., k] = 0.0
    return out


def timm_preprocess_oracle(crop_u8: np.ndarray, size: int = 480) -> np.ndarray:
    """The AutoImageProcessor transform for timm/tf_efficientnetv2_l.in21k
    (Cellpose_GPU_s3fs.py:27,191-194): timm pretrained_cfg test transform =
    Resize(size/crop_pct=480, bicubic) + CenterCrop(480) + ToTensor +
    Normalize(mean=0.5, std=0.5). For the pipeline's square uint8 RGB
    crops this is a straight PIL bicubic resize to (480, 480) then
    (x/255 - 0.5) / 0.5. Returns (size, size, 3) float32."""
    from PIL import Image

    im = Image.fromarray(crop_u8, mode="RGB").resize(
        (size, size), resample=Image.Resampling.BICUBIC
    )
    arr = np.asarray(im).astype(np.float32) / 255.0
    return (arr - 0.5) / 0.5


def cp_granularity_oracle(
    image: np.ndarray,
    length: int = 16,
    subsample_size: float = 0.25,
    image_sample_size: float = 0.25,
    element_size: int = 10,
) -> np.ndarray:
    """Transcription of CP 4.2.8 MeasureGranularity
    (cellprofiler/modules/measureimagegranularity.py, full-image mask):
    map_coordinates(order=1) subsample at coords i/subsample; background
    open (erosion+dilation, skimage disk(element_size)) on a further
    subsample, upsampled back at i*(back-1)/(new-1); spectrum of
    disk(1)-cross erosions + grayscale reconstruction to convergence."""
    import scipy.ndimage as scind

    def disk_offsets(r):
        return [
            (dy, dx)
            for dy in range(-r, r + 1)
            for dx in range(-r, r + 1)
            if dy * dy + dx * dx <= r * r
        ]

    def grey(img, r, op):
        h, w = img.shape
        out = np.full_like(img, np.inf if op is np.minimum else -np.inf)
        for dy, dx in disk_offsets(r):
            ys0, ys1 = max(0, -dy), min(h, h - dy)
            xs0, xs1 = max(0, -dx), min(w, w - dx)
            if ys1 <= ys0 or xs1 <= xs0:
                continue
            out[ys0:ys1, xs0:xs1] = op(
                out[ys0:ys1, xs0:xs1], img[ys0 + dy : ys1 + dy, xs0 + dx : xs1 + dx]
            )
        return out

    def reconstruct(seed, ceiling):
        r = seed.copy()
        while True:
            r2 = np.minimum(grey(r, 1, np.maximum), ceiling)
            if (r2 == r).all():
                return r
            r = r2

    pixels = image.astype(np.float64)
    new_shape = np.array(pixels.shape) * subsample_size
    i, j = (
        np.mgrid[0 : new_shape[0], 0 : new_shape[1]].astype(float) / subsample_size
    )
    pixels = scind.map_coordinates(pixels, (i, j), order=1)

    back_shape = np.array(pixels.shape) * image_sample_size
    i, j = (
        np.mgrid[0 : back_shape[0], 0 : back_shape[1]].astype(float)
        / image_sample_size
    )
    back_pixels = scind.map_coordinates(pixels, (i, j), order=1)
    back_pixels = grey(back_pixels, element_size, np.minimum)
    back_pixels = grey(back_pixels, element_size, np.maximum)
    i, j = np.mgrid[0 : pixels.shape[0], 0 : pixels.shape[1]].astype(float)
    i *= float(back_pixels.shape[0] - 1) / float(pixels.shape[0] - 1)
    j *= float(back_pixels.shape[1] - 1) / float(pixels.shape[1] - 1)
    back_pixels = scind.map_coordinates(back_pixels, (i, j), order=1)
    pixels = pixels - back_pixels
    pixels[pixels < 0] = 0

    startmean = np.mean(pixels)
    denom = max(startmean, np.finfo(float).eps)
    ero = pixels.copy()
    prevmean = startmean
    out = np.zeros(length)
    for k in range(length):
        ero = grey(ero, 1, np.minimum)
        rec = reconstruct(ero, pixels)
        cur = np.mean(rec)
        out[k] = (prevmean - cur) * 100.0 / denom
        prevmean = cur
    return out


def cp_quantile_intensity(vals: np.ndarray):
    """CP 4.2.8 MeasureObjectIntensity quantile semantics for one object.

    Median = the LOWER middle order statistic ``sorted[(n+1)//2 - 1]``
    (CP does not average the two middles for even counts); quartiles =
    linear interpolation at 0-based position ``(n-1)q`` between adjacent
    order statistics (numpy ``percentile`` convention); MAD = the order
    statistic at the median index of ``|v - median|``.

    Returns (median, mad, lower_quartile, upper_quartile).
    """
    v = np.sort(np.asarray(vals, np.float64))
    n = len(v)
    if n == 0:
        return 0.0, 0.0, 0.0, 0.0
    k = (n + 1) // 2 - 1
    med = v[k]
    mad = np.sort(np.abs(vals - med))[k]

    def q(p):
        pos = (n - 1) * p
        j = int(np.floor(pos))
        f = pos - j
        return v[j] * (1 - f) + v[min(j + 1, n - 1)] * f

    return med, mad, q(0.25), q(0.75)


# ---------------------------------------------------------------------------
# CP 4.2.8 MeasureColocalization (measurecolocalization.py,
# run_image_pair_objects + linear_costes) — per-object colocalization
# statistics for one channel pair. Consumed downstream as
# Correlation_<Stat>_<chA>_<chB> columns (Normalize_CP_ami.py:47-64).
# ---------------------------------------------------------------------------


def cp_linear_costes_oracle(fi, si, scale_max=255, fast=True):
    """CP 4.2.8 linear_costes: orthogonal (Deming) regression between the
    two channels, then step the first-channel threshold DOWN from the
    image maximum until the Pearson correlation of the below-threshold
    pixels reaches <= 0. ``fast`` uses CP's accelerated stepping (larger
    steps while the correlation is far from zero)."""
    import scipy.stats

    fi = np.asarray(fi, np.float64)
    si = np.asarray(si, np.float64)
    i_step = 1.0 / scale_max
    non_zero = (fi > 0) | (si > 0)
    xvar = np.var(fi[non_zero], axis=0, ddof=1)
    yvar = np.var(si[non_zero], axis=0, ddof=1)
    xmean = np.mean(fi[non_zero], axis=0)
    ymean = np.mean(si[non_zero], axis=0)
    z = fi[non_zero] + si[non_zero]
    zvar = np.var(z, axis=0, ddof=1)
    covar = 0.5 * (zvar - (xvar + yvar))
    denom = 2.0 * covar
    num = (yvar - xvar) + np.sqrt((yvar - xvar) ** 2 + 4.0 * covar**2)
    a = num / denom
    b = ymean - a * xmean

    # start one step above the maximum
    img_max = max(fi.max(), si.max())
    i = i_step * ((img_max // i_step) + 1)
    num_true = None
    fi_max = fi.max()
    si_max = si.max()

    costReg, _ = scipy.stats.pearsonr(fi, si)
    thr_fi_c = i
    thr_si_c = (a * i) + b

    # skip down while both thresholds exceed their channel maxima
    while i > fi_max and (a * i) + b > si_max:
        i -= i_step
    while i > i_step:
        thr_fi_c = i
        thr_si_c = (a * i) + b
        combt = (fi < thr_fi_c) | (si < thr_si_c)
        try:
            if (positives := np.count_nonzero(combt)) != num_true:
                costReg, _ = scipy.stats.pearsonr(fi[combt], si[combt])
                num_true = positives
            if costReg <= 0:
                break
            elif not fast or i < i_step * 10:
                i -= i_step
            elif costReg > 0.45:
                i -= i_step * 10
            elif costReg > 0.35:
                i -= i_step * 5
            elif costReg > 0.25:
                i -= i_step * 2
            else:
                i -= i_step
        except ValueError:
            break
    return thr_fi_c, thr_si_c


def cp_colocalization_oracle(
    fi_img, si_img, labels, thr_pct=15.0, scale_max=255, fast=True
):
    """CP 4.2.8 run_image_pair_objects per-object statistics.

    ``fi_img``/``si_img``: the two channels, already scaled the way CP
    sees them (floats in [0,1]); ``labels``: int labels, 0 = background.
    Returns dict of (n_objects,) arrays indexed by label-1:
    Correlation, Overlap, K1, K2, M1, M2, RWC1, RWC2, C1, C2.
    Denominator-zero entries come out nan (CP's raw division semantics).
    """
    import scipy.ndimage as scind

    mask = labels > 0
    labs = labels[mask].astype(np.int32)
    fi = np.asarray(fi_img, np.float64)[mask]
    si = np.asarray(si_img, np.float64)[mask]
    n_obj = int(labels.max())
    lrange = np.arange(n_obj, dtype=np.int32) + 1
    with np.errstate(divide="ignore", invalid="ignore"):
        area = np.asarray(scind.sum(np.ones_like(fi), labs, lrange))

        # Pearson per object
        mean1 = np.asarray(scind.mean(fi, labs, lrange))
        mean2 = np.asarray(scind.mean(si, labs, lrange))
        std1 = np.asarray(scind.standard_deviation(fi, labs, lrange))
        std2 = np.asarray(scind.standard_deviation(si, labs, lrange))
        x = fi - mean1[labs - 1]
        y = si - mean2[labs - 1]
        corr = np.asarray(
            scind.sum(x * y / (std1[labs - 1] * std2[labs - 1]), labs, lrange)
        ) / area

        # Manders / RWC thresholds: percentage of each object's maximum
        tff = (thr_pct / 100.0) * np.asarray(scind.maximum(fi, labs, lrange))
        tss = (thr_pct / 100.0) * np.asarray(scind.maximum(si, labs, lrange))
        combined_thresh = (fi > tff[labs - 1]) & (si > tss[labs - 1])
        fi_thresh = fi[combined_thresh]
        si_thresh = si[combined_thresh]
        tot_fi_thr = np.asarray(
            scind.sum(fi[fi > tff[labs - 1]], labs[fi > tff[labs - 1]], lrange)
        )
        tot_si_thr = np.asarray(
            scind.sum(si[si > tss[labs - 1]], labs[si > tss[labs - 1]], lrange)
        )

        M1 = np.asarray(
            scind.sum(fi_thresh, labs[combined_thresh], lrange)
        ) / tot_fi_thr
        M2 = np.asarray(
            scind.sum(si_thresh, labs[combined_thresh], lrange)
        ) / tot_si_thr

        # RWC: dense ranks over the full masked pixel vectors
        Rank1 = np.lexsort([fi])
        Rank2 = np.lexsort([si])
        Rank1_U = np.hstack([[False], fi[Rank1[:-1]] != fi[Rank1[1:]]])
        Rank2_U = np.hstack([[False], si[Rank2[:-1]] != si[Rank2[1:]]])
        Rank1_S = np.cumsum(Rank1_U)
        Rank2_S = np.cumsum(Rank2_U)
        Rank_im1 = np.zeros(fi.shape, dtype=int)
        Rank_im2 = np.zeros(si.shape, dtype=int)
        Rank_im1[Rank1] = Rank1_S
        Rank_im2[Rank2] = Rank2_S
        R = max(Rank_im1.max(), Rank_im2.max()) + 1
        Di = abs(Rank_im1 - Rank_im2)
        weight = (R - Di) * 1.0 / R
        weight_thresh = weight[combined_thresh]
        RWC1 = np.asarray(
            scind.sum(fi_thresh * weight_thresh, labs[combined_thresh], lrange)
        ) / tot_fi_thr
        RWC2 = np.asarray(
            scind.sum(si_thresh * weight_thresh, labs[combined_thresh], lrange)
        ) / tot_si_thr

        # Overlap + K
        fsq = np.asarray(scind.sum(fi * fi, labs, lrange))
        ssq = np.asarray(scind.sum(si * si, labs, lrange))
        pdt = np.asarray(scind.sum(fi * si, labs, lrange))
        overlap = pdt / np.sqrt(fsq * ssq)
        K1 = pdt / fsq
        K2 = pdt / ssq

        # Costes automated thresholds (image-wide over the masked pixels)
        thr_fi_c, thr_si_c = cp_linear_costes_oracle(fi, si, scale_max, fast)
        combined_thresh_c = (fi > thr_fi_c) & (si > thr_si_c)
        fi_thresh_c = fi[combined_thresh_c]
        si_thresh_c = si[combined_thresh_c]
        tot_fi_thr_c = np.asarray(
            scind.sum(fi[fi > thr_fi_c], labs[fi > thr_fi_c], lrange)
        )
        tot_si_thr_c = np.asarray(
            scind.sum(si[si > thr_si_c], labs[si > thr_si_c], lrange)
        )
        C1 = np.asarray(
            scind.sum(fi_thresh_c, labs[combined_thresh_c], lrange)
        ) / tot_fi_thr_c
        C2 = np.asarray(
            scind.sum(si_thresh_c, labs[combined_thresh_c], lrange)
        ) / tot_si_thr_c

    return {
        "Correlation": corr,
        "Overlap": overlap,
        "K1": K1,
        "K2": K2,
        "M1": M1,
        "M2": M2,
        "RWC1": RWC1,
        "RWC2": RWC2,
        "C1": C1,
        "C2": C2,
        "thr_fi_c": thr_fi_c,
        "thr_si_c": thr_si_c,
    }
