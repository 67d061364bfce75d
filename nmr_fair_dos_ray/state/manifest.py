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


class PartitionLog:
    """Parquet-backed partition table for HIGH-CARDINALITY stages.

    The JSON manifest stores per-partition dicts — fine for the shard stage
    (hundreds of rows) but a driver-memory/serialization scale-killer for
    phase-1 invert at the 10^12-row target (millions of work items;
    VERDICT round-1 item 9). This log streams partition rows into parquet
    session files instead: the build driver never holds more than one result
    batch in Python, and planning reads back COLUMNS (numpy arrays at ~100
    bytes/row) rather than dicts.

    Layout: ``<dir>/manifest_parts/<stage>/session_NNNN.parquet``, one file
    per build session, written to a dot-tmp name and renamed at close —
    a crash mid-session leaves no readable file, so those work items simply
    re-run (the same semantics the JSON marking had, with less loss). Rows
    for a work item redone in a later session shadow earlier ones (read()
    dedups keeping the latest).
    """

    def __init__(self, directory: str, stage: str):
        self.dir = os.path.join(directory, "manifest_parts", stage)

    def _files(self) -> list[str]:
        if not os.path.isdir(self.dir):
            return []
        # sort NUMERICALLY by session number — lexicographic order breaks
        # past the zero-pad width (session_10000 < session_9999) and would
        # let stale partition rows shadow newer ones in latest-wins dedup
        return sorted(
            (
                os.path.join(self.dir, f)
                for f in os.listdir(self.dir)
                if f.endswith(".parquet") and not f.startswith(".")
            ),
            key=lambda p: (self._session_no(p), os.path.basename(p)),
        )

    @staticmethod
    def _session_no(path: str) -> int:
        name = os.path.basename(path)
        try:
            return int(name.split("_")[1])
        except (IndexError, ValueError):
            return -1

    def read(self, columns: list[str] | None = None):
        """-> pa.Table (possibly empty) with one row per partition, latest
        session wins for duplicated work_item_ids."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        files = self._files()
        if not files:
            return None
        cols = columns
        if cols is not None and "work_item_id" not in cols:
            cols = ["work_item_id", *cols]
        tables = [pq.read_table(f, columns=cols) for f in files]
        # permissive: sessions written by different engine versions may add
        # metric columns (e.g. cpu_sec) — missing ones become nulls
        t = pa.concat_tables(tables, promote_options="permissive")
        wi = t["work_item_id"].to_numpy(zero_copy_only=False)
        # keep the LAST occurrence per work item (files are session-ordered)
        last = {}
        for i, w in enumerate(wi):
            last[int(w)] = i
        if len(last) != len(wi):
            idx = np.sort(np.fromiter(last.values(), dtype=np.int64))
            t = t.take(pa.array(idx))
        return t

    class _Session:
        def __init__(self, log: "PartitionLog"):
            os.makedirs(log.dir, exist_ok=True)
            # next = max existing session number + 1 (not file count: crashes
            # can leave gaps that a count-based scheme would re-collide on);
            # 8-digit pad keeps even the lexicographic tiebreak consistent
            files = log._files()
            n = (max(log._session_no(f) for f in files) + 1) if files else 0
            self.final = os.path.join(log.dir, f"session_{n:08d}_{os.getpid()}.parquet")
            self.tmp = os.path.join(log.dir, f".tmp-{os.path.basename(self.final)}")
            self._writer = None
            self.rows = 0

        def write(self, batch) -> None:
            import pyarrow.parquet as pq

            if batch.num_rows == 0:
                return
            if self._writer is None:
                self._writer = pq.ParquetWriter(self.tmp, batch.schema)
            self._writer.write_table(batch)
            self.rows += batch.num_rows

        def close(self) -> None:
            if self._writer is not None:
                self._writer.close()
                os.replace(self.tmp, self.final)

    def open_session(self) -> "PartitionLog._Session":
        return PartitionLog._Session(self)

    def replace(self, table) -> None:
        """Atomically replace the whole log (keep-pruning on input change)."""
        import pyarrow.parquet as pq

        os.makedirs(self.dir, exist_ok=True)
        tmp = os.path.join(self.dir, ".tmp-replace.parquet")
        pq.write_table(table, tmp)
        for f in self._files():
            os.remove(f)
        os.replace(tmp, os.path.join(self.dir, "session_0000_kept.parquet"))

    def clear(self) -> None:
        if os.path.isdir(self.dir):
            for f in os.listdir(self.dir):
                os.remove(os.path.join(self.dir, f))
