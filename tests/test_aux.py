"""Auxiliary subsystems: manifest/resume, timing, weight conversion."""

import numpy as np
import pytest

from saguaro_tpu.models.weights import (
    conv_torch_to_flax,
    convert_by_order,
    convert_state_dict,
    flatten_tree,
    linear_torch_to_flax,
    unflatten_tree,
)
from saguaro_tpu.pipeline.manifest import Manifest
from saguaro_tpu.utils.timing import StageTimer


class TestManifest:
    def test_resume_cycle(self, tmp_path):
        path = str(tmp_path / "manifest.jsonl")
        m = Manifest(path)
        units = [f"site_{i}" for i in range(5)]
        assert m.pending(units) == units
        m.mark_done("site_1", n_cells=10)
        m.mark_done("site_3")
        assert m.is_done("site_1")
        assert m.pending(units) == ["site_0", "site_2", "site_4"]
        # reload from disk: state survives restart
        m2 = Manifest(path)
        assert len(m2) == 2
        assert m2.info("site_1")["n_cells"] == 10
        assert m2.pending(units) == ["site_0", "site_2", "site_4"]


class TestConfig:
    def test_yaml_stage_config(self, tmp_path):
        from saguaro_tpu.config import load_stage_config
        from saguaro_tpu.pipeline.features import FeatureConfig
        from saguaro_tpu.pipeline.segment_embed import SegmentEmbedConfig

        p = tmp_path / "suite.yaml"
        p.write_text(
            "channels: [DNA, GFP]\n"
            "segment_embed:\n  diameter: 80\n  cellpose: {tile: 128}\n"
            "features:\n  glcm_levels: 8\n"
        )
        cfg = load_stage_config(str(p), "segment_embed", SegmentEmbedConfig)
        assert cfg.diameter == 80
        assert cfg.channels == ["DNA", "GFP"]
        assert cfg.cellpose.tile == 128
        fc = load_stage_config(str(p), "features", FeatureConfig, channels=("DNA",))
        assert fc.glcm_levels == 8
        assert fc.channels == ("DNA",)  # override wins

    def test_json_config(self, tmp_path):
        from saguaro_tpu.config import load_config

        p = tmp_path / "c.json"
        p.write_text('{"channels": ["DNA"]}')
        assert load_config(str(p)) == {"channels": ["DNA"]}


class TestDistributed:
    def test_partition_jobs(self):
        from saguaro_tpu.parallel.distributed import partition_jobs

        jobs = list(range(10))
        p0 = partition_jobs(jobs, process_id=0, num_processes=3)
        p1 = partition_jobs(jobs, process_id=1, num_processes=3)
        p2 = partition_jobs(jobs, process_id=2, num_processes=3)
        assert sorted(p0 + p1 + p2) == jobs
        assert p0 == [0, 3, 6, 9]


class TestDiscoverFolders:
    def test_matches_reference_semantics(self, tmp_path):
        from saguaro_tpu.io.storage import discover_folders

        for sub in ("run/6h_P01/Image", "run/12h_P01/Image", "run/6h_P02/Image", "run/other"):
            d = tmp_path / sub
            d.mkdir(parents=True)
            (d / "x.tiff").write_bytes(b"0")
        found = discover_folders(str(tmp_path), ["P01"])
        assert len(found) == 2
        assert all("P01" in f for f in found)


class TestStageTimer:
    def test_accumulates(self):
        t = StageTimer()
        with t.stage("a"):
            pass
        with t.stage("a"):
            pass
        with t.stage("b"):
            pass
        assert t.count["a"] == 2
        assert t.count["b"] == 1
        assert "a" in t.summary()


class TestWeights:
    def test_layout_converters(self, rng):
        w = rng.normal(size=(8, 3, 5, 5))
        f = conv_torch_to_flax(w)
        assert f.shape == (5, 5, 3, 8)
        np.testing.assert_array_equal(f[0, 0, :, 0], w[0, :, 0, 0])
        l = rng.normal(size=(16, 4))
        assert linear_torch_to_flax(l).shape == (4, 16)

    def test_flatten_roundtrip(self, rng):
        tree = {"params": {"Conv_0": {"kernel": rng.normal(size=(3, 3, 2, 4))}}}
        flat = flatten_tree(tree)
        assert "params/Conv_0/kernel" in flat
        back = unflatten_tree(flat)
        np.testing.assert_array_equal(
            back["params"]["Conv_0"]["kernel"], tree["params"]["Conv_0"]["kernel"]
        )

    def test_convert_state_dict_roundtrip(self, rng):
        flax_vars = {
            "params": {
                "Conv_0": {"kernel": np.zeros((3, 3, 2, 4), np.float32),
                           "bias": np.zeros(4, np.float32)},
                "Dense_0": {"kernel": np.zeros((4, 6), np.float32)},
            }
        }
        sd = {
            "conv1.weight": rng.normal(size=(4, 2, 3, 3)).astype(np.float32),
            "conv1.bias": rng.normal(size=4).astype(np.float32),
            "fc.weight": rng.normal(size=(6, 4)).astype(np.float32),
        }
        out = convert_state_dict(
            sd,
            flax_vars,
            name_map={
                "params/Conv_0/kernel": "conv1.weight",
                "params/Conv_0/bias": "conv1.bias",
                "params/Dense_0/kernel": "fc.weight",
            },
        )
        np.testing.assert_array_equal(
            out["params"]["Conv_0"]["kernel"], conv_torch_to_flax(sd["conv1.weight"])
        )
        np.testing.assert_array_equal(out["params"]["Conv_0"]["bias"], sd["conv1.bias"])
        np.testing.assert_array_equal(
            out["params"]["Dense_0"]["kernel"], sd["fc.weight"].T
        )

    def test_convert_state_dict_shape_mismatch_raises(self):
        flax_vars = {"params": {"Conv_0": {"kernel": np.zeros((3, 3, 2, 4))}}}
        sd = {"conv1.weight": np.zeros((4, 2, 5, 5))}
        with pytest.raises(ValueError):
            convert_state_dict(sd, flax_vars, {"params/Conv_0/kernel": "conv1.weight"})

    def test_convert_by_order(self, rng):
        flax_vars = {
            "params": {
                "Conv_0": {"kernel": np.zeros((3, 3, 2, 8), np.float32), "bias": np.zeros(8, np.float32)},
                "Conv_1": {"kernel": np.zeros((3, 3, 8, 16), np.float32), "bias": np.zeros(16, np.float32)},
            }
        }
        sd = {
            "net.0.weight": rng.normal(size=(8, 2, 3, 3)).astype(np.float32),
            "net.0.bias": rng.normal(size=8).astype(np.float32),
            "net.1.weight": rng.normal(size=(16, 8, 3, 3)).astype(np.float32),
            "net.1.bias": rng.normal(size=16).astype(np.float32),
        }
        out, report = convert_by_order(sd, flax_vars)
        np.testing.assert_array_equal(
            out["params"]["Conv_0"]["kernel"], conv_torch_to_flax(sd["net.0.weight"])
        )
        np.testing.assert_array_equal(
            out["params"]["Conv_1"]["kernel"], conv_torch_to_flax(sd["net.1.weight"])
        )
        assert not any(line.startswith("UNMATCHED") for line in report)


class TestEnvironmentDriftCanary:
    """VERDICT r4 item #5: fail loudly when the package leans on
    deprecated jax API — the environment drifts under the repo (jax
    0.9.0 deprecated jax.experimental.shard_map mid-round and libtpu
    broke a kernel on 2026-08-19)."""

    def test_no_deprecated_jax_imports_in_source(self):
        """Source-level: the only jax.experimental surface the package
        may touch is pallas (the canonical kernel import path)."""
        import pathlib
        import re

        import saguaro_tpu

        root = pathlib.Path(saguaro_tpu.__file__).parent
        offenders = []
        for p in root.rglob("*.py"):
            for i, line in enumerate(p.read_text().splitlines(), 1):
                for m in re.finditer(r"jax\.experimental(\.\w+)?", line):
                    mod = m.group(1) or ""
                    if mod not in (".pallas",) and "import pallas" not in line:
                        offenders.append(f"{p.relative_to(root)}:{i}: {line.strip()}")
        assert not offenders, "\n".join(offenders)

    def test_package_imports_clean_of_jax_deprecations(self):
        """Import every saguaro_tpu module in a FRESH interpreter and
        fail on any jax DeprecationWarning (module caching makes an
        in-process check a no-op mid-suite)."""
        import subprocess
        import sys

        prog = (
            "import warnings, pkgutil, importlib\n"
            "import jax\n"
            "jax.config.update('jax_platforms', 'cpu')\n"
            "assert hasattr(jax, 'shard_map')\n"
            "import saguaro_tpu\n"
            "with warnings.catch_warnings(record=True) as w:\n"
            "    warnings.simplefilter('always')\n"
            "    for m in pkgutil.walk_packages(saguaro_tpu.__path__, 'saguaro_tpu.'):\n"
            "        importlib.import_module(m.name)\n"
            "bad = [str(x.message) for x in w\n"
            "       if issubclass(x.category, DeprecationWarning)\n"
            "       and 'jax' in str(x.message).lower()]\n"
            "assert not bad, bad\n"
            "print('CANARY_OK')\n"
        )
        r = subprocess.run(
            [sys.executable, "-c", prog], capture_output=True, text=True, timeout=300
        )
        assert r.returncode == 0 and "CANARY_OK" in r.stdout, r.stdout + r.stderr

    def test_no_module_level_jax_values(self):
        """No saguaro_tpu module may hold a jax.Array or Tracer in a
        module-level global. Measurement kernels are imported LAZILY from
        inside jitted traces, so a module-level ``jnp.<...>`` value
        materializes under the ACTIVE trace as a JitTracer that the
        global then leaks into every later trace; jax 0.9 hoists such
        captured values into executable parameters the C++ pjit fastpath
        never supplies, and same-shape re-dispatch dies with "Execution
        supplied 2 buffers but compiled program expected 5" (the r4/r5
        red-suite root cause: kernels/radial._BIG). Module constants must
        be numpy — always baked into the jaxpr as literals."""
        import importlib
        import pkgutil

        import jax
        import saguaro_tpu

        offenders = []
        for m in pkgutil.walk_packages(saguaro_tpu.__path__, "saguaro_tpu."):
            mod = importlib.import_module(m.name)
            for name, val in vars(mod).items():
                vals = (
                    list(val)
                    if isinstance(val, (tuple, list)) and len(val) <= 64
                    else [val]
                )
                for v in vals:
                    if isinstance(v, (jax.Array, jax.core.Tracer)):
                        offenders.append(
                            f"{m.name}.{name}: {type(v).__name__}"
                        )
        assert not offenders, (
            "module-level jax values (trace-leak hazard):\n"
            + "\n".join(offenders)
        )
