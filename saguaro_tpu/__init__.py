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
