"""Model checkpoint save/load over the storage layer.

The reference loads engine checkpoints read-only (cellpose hub model, HF
EfficientNet, XGB json — Cellpose_GPU_s3fs.py:108-118); this module gives
the framework its own durable format so trained/converted weights travel
through the same s3/gcs/local storage plane as the data: flax msgpack
bytes + a JSON header describing the architecture config.
"""

from __future__ import annotations

import dataclasses
import json

import flax.serialization

from saguaro_tpu.io import storage

__all__ = ["save_variables", "load_variables"]

_MAGIC = b"SGTPU1\n"


def save_variables(path: str, variables: dict, config=None) -> None:
    """Serialize a flax variables tree (+ optional dataclass config)."""
    header: dict = {}
    if config is not None:
        header["config_class"] = type(config).__name__
        header["config"] = dataclasses.asdict(config)
    header_bytes = json.dumps(header, default=str).encode("utf-8")
    payload = flax.serialization.to_bytes(variables)
    blob = _MAGIC + len(header_bytes).to_bytes(8, "big") + header_bytes + payload
    storage.write_bytes(path, blob)


def load_variables(path: str, template: dict) -> tuple[dict, dict]:
    """Load variables into the structure of ``template``; returns
    (variables, header dict)."""
    blob = storage.read_bytes(path)
    if not blob.startswith(_MAGIC):
        raise ValueError(f"{path} is not a saguaro_tpu checkpoint")
    off = len(_MAGIC)
    hlen = int.from_bytes(blob[off : off + 8], "big")
    off += 8
    header = json.loads(blob[off : off + hlen].decode("utf-8"))
    variables = flax.serialization.from_bytes(template, blob[off + hlen :])
    return variables, header
