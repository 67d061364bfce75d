"""Per-stage / per-partition build manifests (checkpoint + lineage + metrics).

The reference's resumability is file-level HTTP caching and a watermark file
(reference: src/nmr_FAIR_DOs/utils.py:61-71, src/nmr_FAIR_DOs/lib.py:436-437,
src/nmr_FAIR_DOs/repositories/nmrxiv.py:85-113). The engine generalizes that
to the pattern BASELINE.json's north_rule requires: every expensive stage
writes write-once outputs plus a manifest recording, per partition,
``{input fingerprint, rows, bytes, wall seconds, status}``. A resumed build
verifies the input fingerprint and skips partitions already marked done —
for the shard-build shuffle this happens *before* the exchange, so completed
shards never re-shuffle.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile
import time
from typing import Any


def atomic_write_bytes(path: str, data: bytes) -> None:
    """Write-once semantics: write to a temp file in the same dir, rename."""
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, prefix=".tmp-", suffix=os.path.basename(path))
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def fingerprint_files(paths: list[str]) -> str:
    """Deterministic fingerprint of an input file set: path + size + num_rows.

    Metadata-only (parquet footers), so it stays cheap at large file counts;
    content changes that alter size/row-count are caught, and the per-row
    sha256 invariant (BASELINE.json input_hint) catches silent corruption.
    """
    import pyarrow.parquet as pq

    h = hashlib.sha256()
    for p in sorted(paths):
        st = os.stat(p)
        nrows = pq.ParquetFile(p).metadata.num_rows
        h.update(f"{p}\0{st.st_size}\0{nrows}\n".encode())
    return h.hexdigest()


class Manifest:
    """JSON manifest at ``<dir>/manifest.json``.

    Shape::

        {
          "config": {...},                  # build configuration (must match on resume)
          "input_fingerprint": "...",
          "stats": {"n_docs": N, "avgdl": x, ...},
          "stages": {
            "docs":   {"status": "done", "rows": N, "wall_sec": t},
            "shards": {"partitions": {"17": {"status": "done", "terms": n,
                                              "postings": m, "bytes": b,
                                              "wall_sec": t, "path": "..."}}}
          }
        }
    """

    def __init__(self, directory: str):
        self.path = os.path.join(directory, "manifest.json")
        self.data: dict[str, Any] = {"config": {}, "stages": {}, "stats": {}}
        if os.path.exists(self.path):
            with open(self.path) as f:
                self.data = json.load(f)

    def save(self) -> None:
        atomic_write_bytes(self.path, json.dumps(self.data, indent=1, sort_keys=True).encode())

    # convenience accessors -------------------------------------------------
    def stage(self, name: str) -> dict:
        return self.data["stages"].setdefault(name, {})

    def stage_done(self, name: str) -> bool:
        return self.stage(name).get("status") == "done"

    def mark_stage(self, name: str, **fields: Any) -> None:
        self.stage(name).update(fields)
        self.save()

    def partitions(self, stage: str) -> dict:
        return self.stage(stage).setdefault("partitions", {})

    def done_partitions(self, stage: str) -> set[int]:
        return {
            int(k)
            for k, v in self.partitions(stage).items()
            if v.get("status") == "done"
            and all(
                os.path.exists(pv)
                for pk, pv in v.items()
                if pk.endswith("path") and isinstance(pv, str)
            )
        }

    def mark_partition(self, stage: str, pid: int, **fields: Any) -> None:
        self.partitions(stage)[str(pid)] = {"status": "done", **fields}

    @staticmethod
    def now() -> float:
        return time.time()
