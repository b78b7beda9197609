"""Native TIFF decoder vs imageio/PIL round-trips."""

import numpy as np
import pytest

from saguaro_tpu.io import fast_tiff, tiff


@pytest.fixture(scope="module")
def native_ok():
    if not fast_tiff.available():
        pytest.skip("native decoder not built (no g++?)")
    return True


class TestFastTiff:
    @pytest.mark.parametrize("dtype,compression", [
        (np.uint16, None), (np.uint16, "lzw"),
        (np.uint8, None), (np.uint8, "lzw"),
    ])
    def test_roundtrip(self, native_ok, rng, dtype, compression):
        hi = 65535 if dtype == np.uint16 else 255
        img = rng.integers(0, hi, (123, 217)).astype(dtype)
        data = tiff.encode(img, compression=compression)
        out = fast_tiff.decode(data)
        assert out is not None
        assert out.dtype == dtype
        np.testing.assert_array_equal(out, img)

    def test_structured_content(self, native_ok):
        # highly compressible content exercises long LZW chains + KwKwK
        img = np.tile(np.arange(300, dtype=np.uint16) * 100, (256, 1))
        data = tiff.encode(img, compression="lzw")
        np.testing.assert_array_equal(fast_tiff.decode(data), img)
        img2 = np.full((200, 200), 7, np.uint8)
        data2 = tiff.encode(img2, compression="lzw")
        np.testing.assert_array_equal(fast_tiff.decode(data2), img2)

    def test_unsupported_returns_none(self, native_ok):
        assert fast_tiff.decode(b"not a tiff at all") is None

    def test_public_imread_uses_native_path(self, native_ok, tmp_path, rng):
        img = rng.integers(0, 65535, (64, 64)).astype(np.uint16)
        p = str(tmp_path / "x.tiff")
        tiff.imwrite(p, img, compression="lzw")
        np.testing.assert_array_equal(tiff.imread(p), img)
