"""TIFF codec built on imageio/PIL (tifffile-free).

The reference reads screening TIFFs with ``tifffile.imread``
(Cellpose_GPU_s3fs.py:72, Illumination_QC_mult.py:145) and writes
LZW-compressed TIFFs with PIL (Image_re-binning.py:17-22) / imageio
(MaxProjection.py:47-48). This module provides the same capabilities over
the storage layer, supporting uint8/uint16/float inputs.
"""

from __future__ import annotations

import io

import numpy as np

from saguaro_tpu.io import storage

__all__ = ["imread", "imwrite", "decode", "encode"]


def decode(data: bytes) -> np.ndarray:
    """Decode TIFF/PNG/JPEG bytes to an array.

    TIFFs try the native GIL-free decoder first (io/fast_tiff.py) so
    prefetch threads decode in parallel; anything it doesn't cover falls
    back to imageio."""
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        from saguaro_tpu.io import fast_tiff

        out = fast_tiff.decode(data)
        if out is not None:
            return out
    import imageio.v3 as iio

    return np.asarray(iio.imread(io.BytesIO(data)))


def encode(image: np.ndarray, compression: str | None = None) -> bytes:
    """Encode an array as TIFF bytes; ``compression='lzw'`` matches the
    reference re-binner's ``tiff_lzw`` output (Image_re-binning.py:21)."""
    from PIL import Image

    image = np.asarray(image)
    pil = Image.fromarray(image)
    buf = io.BytesIO()
    if compression == "lzw":
        pil.save(buf, format="tiff", compression="tiff_lzw")
    else:
        pil.save(buf, format="tiff")
    return buf.getvalue()


def imread(path: str) -> np.ndarray:
    return decode(storage.read_bytes(path))


def imwrite(path: str, image: np.ndarray, compression: str | None = None) -> None:
    storage.write_bytes(path, encode(image, compression=compression))
