"""Deterministic Parquet corpus source built on row-group work items.

Replaces the reference's paginated HTTP harvesters
(reference: src/nmr_FAIR_DOs/repositories/chemotion.py:138-222 — offset pages;
src/nmr_FAIR_DOs/repositories/nmrxiv.py:155-282 — cursor pages): the "scout"
that used to enumerate URL pages now enumerates Parquet row groups from file
footers (driver-side, metadata-only), and the per-page fetch becomes a
``map_batches`` stage that reads one row group per task.

Why not plain ``ray.data.read_parquet``? Because the engine needs a
**deterministic, corpus-order-free docID** per row (SURVEY.md §7.0) without a
global sort of multi-MB ``content`` rows. With work items carrying
``doc_id_base`` = prefix sum of row counts over (lexicographically sorted
file, row-group index), every row's id is
``doc_id_base + position_in_row_group`` — reproducible at any parallelism,
no shuffle, and scalable: footers are a few KB per file and the prefix sum is
a driver-side scan (parallelizable with Ray tasks at extreme file counts).
"""

from __future__ import annotations

import glob
import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def corpus_paths(source: str | list[str]) -> list[str]:
    """Expand a path / dir / glob / list into a sorted list of parquet files."""
    if isinstance(source, str):
        if os.path.isdir(source):
            paths = sorted(glob.glob(os.path.join(source, "**", "*.parquet"), recursive=True))
        elif any(c in source for c in "*?["):
            paths = sorted(glob.glob(source))
        else:
            paths = [source]
    else:
        paths = sorted(source)
    if not paths:
        raise FileNotFoundError(f"no parquet files under {source!r}")
    return paths


def work_items(paths: list[str], max_rows_per_item: int | None = 2048) -> list[dict]:
    """One work item per (file, row_group[, row slice]) with a deterministic
    doc_id base.

    Row groups larger than ``max_rows_per_item`` are subdivided into row
    slices so a single huge row group (common in small benchmark files; at
    petabyte scale row groups are already the parallelism unit) cannot
    serialize the invert phase onto one task. A sliced item re-reads its row
    group and slices — acceptable because slicing only triggers when row
    groups are oversized relative to the cluster's task budget.
    """
    items: list[dict] = []
    base = 0
    for path in paths:  # already sorted by corpus_paths
        md = pq.ParquetFile(path).metadata
        for rg in range(md.num_row_groups):
            nrows = md.row_group(rg).num_rows
            step = max_rows_per_item or nrows or 1
            off = 0
            while True:
                take = min(step, nrows - off)
                items.append(
                    {
                        "path": path,
                        "row_group": rg,
                        "row_offset": off,
                        "num_rows": take,
                        "doc_id_base": base,
                    }
                )
                base += take
                off += take
                if off >= nrows:
                    break
    return items


def read_work_item(item: dict, columns: list[str] | None = None) -> pa.Table:
    """Read one work item's rows (row group, then slice if subdivided)."""
    pf = pq.ParquetFile(item["path"])
    t = pf.read_row_group(item["row_group"], columns=columns)
    off = int(item.get("row_offset", 0))
    n = int(item["num_rows"])
    if off != 0 or n != t.num_rows:
        t = t.slice(off, n)
    return t


def work_items_dataset(paths: list[str], max_rows_per_item: int | None = 2048):
    """Work items as a Dataset — the head of every build pipeline."""
    import ray.data as rd

    return rd.from_items(work_items(paths, max_rows_per_item))


def sha256_column(texts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Per-row sha256 hex of a string column (the BASELINE.json invariant)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    return pa.array(
        [hashlib.sha256((t if t is not None else "").encode("utf-8")).hexdigest() for t in texts.to_pylist()],
        pa.string(),
    )


class RowGroupReader:
    """``map_batches`` callable: work-item rows → corpus rows with ``doc_id``.

    Use with ``batch_size=None`` is wrong here — pass ``batch_size=1`` so each
    task maps one row group to one output block (block size ≈ row-group size,
    the natural unit for backpressure and resume).
    """

    def __init__(self, columns: list[str] | None = None, with_sha256: bool = False,
                 content_col: str = "content"):
        self.columns = columns
        self.with_sha256 = with_sha256
        self.content_col = content_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: list[pa.Table] = []
        for item in batch.to_pylist():
            t = read_work_item(item, columns=self.columns)
            doc_ids = pa.array(
                np.arange(item["doc_id_base"], item["doc_id_base"] + t.num_rows, dtype=np.int64)
            )
            t = t.append_column("doc_id", doc_ids)
            if self.with_sha256 and self.content_col in t.column_names:
                t = t.append_column("sha256", sha256_column(t[self.content_col]))
            out.append(t)
        return pa.concat_tables(out) if len(out) != 1 else out[0]


def documents_as_corpus(sf_dir: str, out_path: str | None = None) -> str:
    """Adapt the driver's ``documents`` table to the corpus schema
    ``(repo, path, commit, lang, content)`` of BASELINE.json input_hint.

    Deterministic (derived purely from existing columns). Returns the path of
    the written corpus parquet (cached: rewritten only if missing).
    """
    src = os.path.join(sf_dir, "documents.parquet")
    if out_path is None:
        tag = os.path.basename(os.path.normpath(sf_dir))
        out_path = f"/tmp/nmr_fair_dos_ray/corpus/{tag}/corpus.parquet"
    if os.path.exists(out_path):
        return out_path
    t = pq.read_table(src)
    n = t.num_rows
    doc_id = t["doc_id"].to_numpy(zero_copy_only=False)
    repo = t["source"].cast(pa.string())
    path = pa.array([f"docs/{s}/{d}.txt" for s, d in zip(t["source"].to_pylist(), doc_id)])
    commit = pa.array(
        [hashlib.sha1(f"{s}/{d}".encode()).hexdigest() for s, d in zip(t["source"].to_pylist(), doc_id)]
    )
    corpus = pa.table(
        {
            "repo": repo.combine_chunks() if isinstance(repo, pa.ChunkedArray) else repo,
            "path": path,
            "commit": commit,
            "lang": t["lang"].cast(pa.string()).combine_chunks(),
            "content": t["text"].cast(pa.string()).combine_chunks(),
        }
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    tmp = out_path + ".tmp"
    pq.write_table(corpus, tmp)
    os.replace(tmp, out_path)
    return out_path
