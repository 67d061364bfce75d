"""Document lifecycle: delete, upsert and compaction over a built index.

Reference analog: the reference's Elasticsearch connector upserts by id —
``client.index(id=pid)`` replaces the previous version of a document
(reference: src/nmr_FAIR_DOs/connectors/elasticsearch.py:175-232), and
lib.py re-indexes records it detects as already existing
(reference: src/nmr_FAIR_DOs/lib.py:186-241 "Adding entries to existing
record ... update PID record"). Underneath, Lucene implements exactly the
mechanics reproduced here: delete = tombstone (a live-docs bitmask checked
during traversal), update = tombstone old + append new, physical removal
deferred to a segment merge ("expunge deletes").

Semantics — FROZEN global stats (Lucene-consistent):
  deletes remove docs from every result set immediately, but df / n_docs /
  avgdl stay as built until a full rebuild. Consequences, all tested:
    * live docs keep BIT-IDENTICAL scores through delete and compaction —
      so `compact_index` can be verified by exact result equality, and a
      DuckDB oracle can reproduce deleted-search exactly (stats over the
      full corpus, result rows filtered);
    * a stats refresh is an explicit `build_index(resume=False)` rebuild.

Scale notes (100 TB / 10^12 docs):
  * tombstones are a doc_id set SMALL relative to the corpus by design —
    compaction (an embarrassingly parallel per-shard-file rewrite, no
    shuffle) clears them before they grow; the reader loads them into every
    serving slot (same broadcast pattern as the doclen table);
  * `upsert_latest` resolves per-key winners with one hash-partitioned
    groupby over the (doc_id, key) projection of the doc store — two int64
    columns, never content;
  * `compact_index` reads shard files independently: per-shard work =
    decode → mask → re-encode, driver only sees per-shard summary rows.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TOMBSTONE_FILE = "tombstones.parquet"


def _tomb_path(index_dir: str) -> str:
    return os.path.join(index_dir, TOMBSTONE_FILE)


def read_tombstones(index_dir: str) -> np.ndarray:
    """Sorted unique tombstoned doc_ids (empty array when none)."""
    p = _tomb_path(index_dir)
    if not os.path.exists(p):
        return np.empty(0, np.int64)
    return np.unique(
        pq.read_table(p, columns=["doc_id"])["doc_id"]
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )


def _write_tombstones(index_dir: str, ids: np.ndarray) -> None:
    p = _tomb_path(index_dir)
    tmp = p + f".tmp-{os.getpid()}"
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64())}), tmp)
    os.replace(tmp, p)


def delete_docs(index_dir: str, doc_ids) -> int:
    """Tombstone ``doc_ids`` (iterable of int). Idempotent; atomic merge
    into ``tombstones.parquet``. Returns the total tombstone count.

    Readers opened AFTER this call exclude the docs from every search path
    (ranked, conjunctive, phrase, facet, exact) — already-open readers keep
    their loaded snapshot, exactly like a Lucene point-in-time reader.
    """
    new = np.asarray(list(doc_ids) if not isinstance(doc_ids, np.ndarray) else doc_ids,
                     dtype=np.int64)
    merged = np.union1d(read_tombstones(index_dir), new)
    _write_tombstones(index_dir, merged)
    return int(merged.size)


def delete_by_term(index_dir: str, term: str) -> int:
    """Tombstone every doc whose postings contain ``term`` — the ES
    delete-by-query analog, resolved from the INDEX itself (one posting-list
    decode; exact field terms like ``source:src3`` make this a precise
    predicate delete with no corpus scan). Returns docs newly deleted."""
    from nmr_fair_dos_ray.search.engine import IndexReader

    r = IndexReader(index_dir)
    docs, _ = r.postings(term)  # already excludes prior tombstones
    if docs.size:
        delete_docs(index_dir, docs)
    return int(docs.size)


def clear_tombstones(index_dir: str) -> None:
    p = _tomb_path(index_dir)
    if os.path.exists(p):
        os.remove(p)


def upsert_latest(index_dir: str, key_col: str) -> int:
    """Latest-wins upsert resolution: for every group of live docs sharing
    ``key_col`` (a stored column of the doc store), tombstone all but the
    highest doc_id. Returns the number of docs tombstoned.

    Usage mirrors the reference's re-index-existing-record flow
    (reference: src/nmr_FAIR_DOs/lib.py:186-208): append the new document
    versions via the incremental build (``build_index(..., resume=True)``
    assigns strictly increasing doc_ids to appended files), then call this
    to retire the superseded versions.

    Distributed shape: groupby over the (doc_id, key) projection only; the
    loser set shipped to the driver is bounded by the number of REPLACED
    docs (re-ingested keys), not corpus size.
    """
    import ray.data as rd

    docs_dir = os.path.join(index_dir, "docs")
    ds = rd.read_parquet(docs_dir, columns=["doc_id", key_col])
    tomb = read_tombstones(index_dir)
    n_buckets = 64  # coarse hash partitions: all of a key's rows co-locate,
    #                 groups resolve vectorized inside each partition (the
    #                 repo-wide many-tiny-groups pattern, relational.py)

    def bucketed(batch: pa.Table) -> pa.Table:
        from nmr_fair_dos_ray.tokenizer import term_hash

        h = term_hash(batch[key_col].cast(pa.string()))
        return batch.append_column(
            "_bkt", pa.array((h % n_buckets).astype(np.int64))
        )

    def losers(batch: pa.Table) -> pa.Table:
        # one coarse partition = many complete key groups; emit every live
        # doc_id that is not its key's max — all vectorized
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keys = batch[key_col].combine_chunks()
        if tomb.size:
            pos = np.searchsorted(tomb, ids)
            dead = pos < tomb.size
            dead[dead] = tomb[pos[dead]] == ids[dead]
            keep = ~dead
            ids, keys = ids[keep], keys.filter(pa.array(keep))
        if ids.size == 0:
            return pa.table({"doc_id": pa.array([], pa.int64())})
        enc = pc.dictionary_encode(keys)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = np.asarray(enc.indices)
        order = np.lexsort((-ids, codes))
        ids_s, codes_s = ids[order], codes[order]
        first = np.concatenate([[True], codes_s[1:] != codes_s[:-1]])
        return pa.table({"doc_id": pa.array(ids_s[~first], pa.int64())})

    out = (
        ds.map_batches(bucketed, batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(losers, batch_format="pyarrow")
    )
    pdf = out.to_pandas()  # bounded by number of REPLACED docs, small
    ids = pdf["doc_id"].to_numpy().astype(np.int64) if len(pdf) else np.empty(0, np.int64)
    if ids.size:
        delete_docs(index_dir, ids)
    return int(ids.size)
