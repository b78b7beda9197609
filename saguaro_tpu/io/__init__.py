from saguaro_tpu.io.storage import (
    open_file,
    read_bytes,
    write_bytes,
    read_csv_sniffed,
    write_csv,
    list_prefix,
    exists,
)
from saguaro_tpu.io.tiff import imread, imwrite

__all__ = [
    "open_file",
    "read_bytes",
    "write_bytes",
    "read_csv_sniffed",
    "write_csv",
    "list_prefix",
    "exists",
    "imread",
    "imwrite",
]
