"""CLI surface: one entry point per reference script, preserving flag names.

  python -m saguaro_tpu.cli.max_projection       <- MaxProjection.py
  python -m saguaro_tpu.cli.rebin                <- Image_re-binning.py
  python -m saguaro_tpu.cli.illumination_qc      <- Illumination_QC_mult.py
  python -m saguaro_tpu.cli.segment_embed        <- Cellpose_GPU_s3fs.py
  python -m saguaro_tpu.cli.feature_extraction   <- Feature_extraction_opt.py
  python -m saguaro_tpu.cli.normalize_cp         <- Normalize_CP_ami.py
  python -m saguaro_tpu.cli.pycyto_pertime       <- Pycyto_pertime.py
  python -m saguaro_tpu.cli.feature_select_cosine <- Feature_select_cosine_ami.py
  python -m saguaro_tpu.cli.induction_hit        <- Inuction_Score_hit.py
  python -m saguaro_tpu.cli.concat_cp            <- ConcatCP_exp.py

Bucket arguments accept bare S3 bucket names (reference behavior), s3://
or gs:// URLs, or local directories — everything runs identically against
local fixtures.
"""
