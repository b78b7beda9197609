"""saguaro_tpu — TPU-native high-content-screening framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
Saguaro-Biosciences/image-processing-suite (reference mounted at
/root/reference): the full image -> features -> hits pipeline for
phenotypic drug screening.

Subpackages
-----------
io        storage (s3/gcs/local via fsspec), TIFF codec, LoadData CSV contract,
          async host->device prefetch.
kernels   Pallas/XLA pixel + per-cell kernels: max projection, Lanczos
          re-binning, illumination correction, power-log-log-slope QC,
          flow-following mask recovery, segment reductions, Haralick GLCM.
models    flax Cellpose-style U-Net, EfficientNetV2, XGBoost-JSON tree
          evaluator.
ops       plate-profile math: mad-robustize normalization, annotate,
          feature selection, double-sigmoid, cosine similarity blocks,
          induction-score hit calling.
parallel  device-mesh construction and sharding helpers.
pipeline  stage drivers: segmentation+embedding engine, classical feature
          extraction, manifest/resume, error isolation.
cli       one entry point per reference script, same flags and outputs.
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: TPU compiles of the U-Net / QC / flow
# programs take tens of seconds (minutes through a remote-compile tunnel);
# caching them makes every CLI after the first run start hot. Opt out with
# SAGUARO_NO_COMPILE_CACHE=1.
#
# SAGUARO_FORCE_CPU=1 pins the CPU backend for every CLI/library entry
# (this environment's sitecustomize force-registers a TPU platform and
# ignores JAX_PLATFORMS; the config update below is the only working
# override). CPU runs get their OWN cache dir: sharing one with TPU/relay
# runs intermittently SIGABRTs on foreign XLA:CPU AOT artifacts (BENCH.md).
import os as _os

_force_cpu = _os.environ.get("SAGUARO_FORCE_CPU") == "1"
if _force_cpu:
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")
if not _os.environ.get("SAGUARO_NO_COMPILE_CACHE"):
    import jax as _jax

    try:
        if _force_cpu:
            _jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu_cli")
        else:
            _jax.config.update(
                "jax_compilation_cache_dir",
                _os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
            )
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
del _os, _force_cpu
