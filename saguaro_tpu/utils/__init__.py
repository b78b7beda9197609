from saguaro_tpu.utils.timing import StageTimer, trace_annotation

__all__ = ["StageTimer", "trace_annotation"]
