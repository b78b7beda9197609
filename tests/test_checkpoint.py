"""Checkpoint round-trip + train CLI end to end."""

import os

import numpy as np
import pytest

from saguaro_tpu.models.cellpose import CellposeConfig, init_cellpose
from saguaro_tpu.models.checkpoint import load_variables, save_variables


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        cfg = CellposeConfig(tile=32, features=(4, 8, 16, 32))
        model, variables = init_cellpose(cfg, seed=3)
        path = str(tmp_path / "ckpt.msgpack")
        save_variables(path, variables, cfg)
        _, template = init_cellpose(cfg, seed=0)
        loaded, header = load_variables(path, template)
        assert header["config"]["tile"] == 32
        # every leaf identical
        import jax

        leaves_a = jax.tree.leaves(variables)
        leaves_b = jax.tree.leaves(loaded)
        assert len(leaves_a) == len(leaves_b)
        for a, b in zip(leaves_a, leaves_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_bad_magic_raises(self, tmp_path):
        path = str(tmp_path / "junk.bin")
        with open(path, "wb") as f:
            f.write(b"not a checkpoint")
        with pytest.raises(ValueError):
            load_variables(path, {})


class TestTrainCli:
    def test_train_from_tiff_pairs(self, tmp_path):
        from saguaro_tpu.cli.train_segmenter import main
        from saguaro_tpu.io import tiff
        from saguaro_tpu.models.cellpose_train import synthetic_nuclei

        rng = np.random.default_rng(0)
        data = tmp_path / "train"
        data.mkdir()
        for i in range(4):
            img, labels = synthetic_nuclei(rng, size=64, n_cells=3)
            tiff.imwrite(str(data / f"img{i}.tiff"), (img[..., 0] * 1000).astype(np.uint16))
            tiff.imwrite(str(data / f"img{i}_masks.tiff"), labels.astype(np.uint16))
        out = str(tmp_path / "model.ckpt")
        main([
            "--data_dir", str(data),
            "--output", out,
            "--steps", "5",
            "--batch_size", "2",
            "--tile", "64",
        ])
        assert os.path.exists(out)
        # loadable by the engine
        from saguaro_tpu.models.cellpose import CellposeConfig, init_cellpose

        cfg = CellposeConfig(tile=64)
        _, template = init_cellpose(cfg)
        variables, header = load_variables(out, template)
        assert header["config"]["tile"] == 64
