"""Run manifest: per-unit completion tracking for resumable drivers.

The reference has no checkpoint/resume — its only recovery mechanisms are
per-site npz spill files and re-runnable idempotent stages (SURVEY.md §5).
This manifest makes every driver resumable: each completed unit (site,
well, plate x time job) is recorded as one JSON line; on restart the
driver skips completed units and re-dispatches the rest deterministically.
"""

from __future__ import annotations

import json
import time

from saguaro_tpu.io import storage

__all__ = ["Manifest"]


class Manifest:
    """Append-only JSONL completion log over the storage layer."""

    def __init__(self, path: str):
        self.path = path
        self._done: dict[str, dict] = {}
        if storage.exists(path):
            text = storage.read_bytes(path).decode("utf-8")
            for line in text.splitlines():
                if not line.strip():
                    continue
                rec = json.loads(line)
                self._done[rec["unit"]] = rec

    def is_done(self, unit: str) -> bool:
        return unit in self._done

    def pending(self, units: list[str]) -> list[str]:
        return [u for u in units if u not in self._done]

    def mark_done(self, unit: str, **info) -> None:
        rec = {"unit": unit, "ts": time.time(), **info}
        self._done[unit] = rec
        # append-only write (read-modify-write for object stores)
        existing = b""
        if storage.exists(self.path):
            existing = storage.read_bytes(self.path)
        storage.write_bytes(
            self.path, existing + (json.dumps(rec) + "\n").encode("utf-8")
        )

    def info(self, unit: str) -> dict | None:
        return self._done.get(unit)

    def __len__(self) -> int:
        return len(self._done)
