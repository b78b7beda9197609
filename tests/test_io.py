"""Storage/TIFF/LoadData contract tests."""

import numpy as np
import pandas as pd
import pytest

from saguaro_tpu.io import (
    imread,
    imwrite,
    read_csv_sniffed,
    write_bytes,
    write_csv,
)
from saguaro_tpu.io.loaddata import (
    filter_qc_passing,
    load_illum_functions,
    position_to_well,
    row_col_to_well,
    site_image_paths,
    well_to_row_col,
)
from saguaro_tpu.io.storage import join, list_prefix


class TestStorage:
    def test_csv_sniffing_comma_and_semicolon(self, tmp_path):
        p1 = str(tmp_path / "a.csv")
        write_bytes(p1, b"x,y\n1,2\n")
        p2 = str(tmp_path / "b.csv")
        write_bytes(p2, b"x;y\n1;2\n")
        assert list(read_csv_sniffed(p1).columns) == ["x", "y"]
        assert list(read_csv_sniffed(p2).columns) == ["x", "y"]

    def test_write_csv_roundtrip(self, tmp_path):
        df = pd.DataFrame({"Metadata_Well": ["A01"], "f": [1.5]})
        p = str(tmp_path / "sub" / "out.csv")  # parent dir auto-created
        write_csv(df, p)
        back = read_csv_sniffed(p)
        assert back["f"].iloc[0] == 1.5

    def test_join_urls(self):
        assert join("s3://bucket", "a", "b.csv") == "s3://bucket/a/b.csv"
        assert join("/data", "a/b.csv") == "/data/a/b.csv"

    def test_list_prefix(self, tmp_path):
        (tmp_path / "d").mkdir()
        (tmp_path / "d" / "x.txt").write_text("1")
        (tmp_path / "d" / "y.txt").write_text("2")
        found = sorted(list_prefix(str(tmp_path / "d")))
        assert len(found) == 2


class TestTiff:
    @pytest.mark.parametrize("dtype,hi", [(np.uint16, 65535), (np.uint8, 255)])
    def test_roundtrip(self, tmp_path, rng, dtype, hi):
        img = rng.integers(0, hi, (48, 64)).astype(dtype)
        p = str(tmp_path / "x.tiff")
        imwrite(p, img)
        np.testing.assert_array_equal(imread(p), img)

    def test_lzw_roundtrip(self, tmp_path, rng):
        img = rng.integers(0, 65535, (32, 32)).astype(np.uint16)
        p = str(tmp_path / "x.tiff")
        imwrite(p, img, compression="lzw")
        np.testing.assert_array_equal(imread(p), img)


class TestLoadData:
    def test_well_naming(self):
        assert position_to_well(1) == "A01"
        assert position_to_well(24) == "A24"
        assert position_to_well(25) == "B01"
        assert row_col_to_well(16, 24) == "P24"
        assert well_to_row_col("P24") == (16, 24)

    def test_qc_filter(self):
        ld = pd.DataFrame({"FileName_DNA": ["a", "b", "c"]})
        qc = pd.DataFrame({"ImageQC_Blur": [0, 1, 0], "ImageQC_Sat": [0, 0, 0]})
        out = filter_qc_passing(ld, qc)
        assert list(out["FileName_DNA"]) == ["a", "c"]

    def test_illum_naming_conventions(self, tmp_path):
        np.save(tmp_path / "DNA_illum.npy", np.ones((4, 4)))
        np.save(tmp_path / "IllumGFP.npy", np.ones((4, 4)) * 2)
        illums = load_illum_functions(str(tmp_path), ["DNA", "GFP", "Missing"])
        assert illums[0] is not None and illums[1] is not None
        assert illums[2] is None
        assert illums[1][0, 0] == 2

    def test_site_paths(self):
        row = pd.Series({"FileName_DNA": "x.tiff", "FileName_GFP": "y.tiff"})
        assert site_image_paths(row, ["DNA", "GFP"], "/base") == [
            "/base/x.tiff",
            "/base/y.tiff",
        ]
