"""SPIMI-style inverted-index build as a Ray Data pipeline.

Replaces the reference's Elasticsearch bulk-index path
(reference: src/nmr_FAIR_DOs/connectors/elasticsearch.py:204-232 `addPIDRecords`
and src/nmr_FAIR_DOs/lib.py:463-499 `add_all_existing_pidRecords_to_elasticsearch`)
with a native build, per BASELINE.json north_star:

Phase 1 (stateless tasks, one per Parquet row group — the SPIMI "invert" pass):
    read row group → assign deterministic doc_ids (prefix-sum base from the
    footer scout, see sources/parquet_source.py) → sha256(content) invariant →
    vectorized code-aware tokenization → per-(doc, term) tf aggregation →
    write one *posting run* file + one *docs* file per row group (atomic
    rename, write-once ⇒ per-partition checkpoint), return a manifest row.
    N and avgdl fall out of the manifest rows — no extra pass over the data.

Phase 2 (the SPIMI merge — a storage-backed map-side shuffle):
    Phase 1 writes each posting run SORTED BY shard_id with row groups
    aligned to shard boundaries, so the "exchange" is free: the merge task
    for shard ``s`` opens every run and reads ONLY its row groups (parquet
    min/max statistics prune the rest). One task per shard: sort
    (term, doc_id), per-term df/idf, 128-posting blocks with delta+varint
    compression and per-block exact max BM25 contribution (block-max
    metadata for BMW) → one shard file (atomic) → manifest row per shard.
    This replaces ``Dataset.groupby(shard).map_groups`` deliberately: a
    sort-based all-to-all moved 100% of the postings through the object
    store and measured ~10× slower than the row-group-pruned direct reads;
    write-once shuffle files are also what makes the merge stage itself
    resumable per shard. Hot terms (detected from per-run df sidecars) are
    excluded from the cold shards and merged by ``n_salts`` run-bucket
    tasks over contiguous doc ranges, then concatenated (phase 3).

Scale notes (100 TB / 10^12 rows):
  - the merge stage moves (term, doc_id, tf, doclen) rows — ~20 bytes/posting
    — never `content`;
  - shard count is the partition knob: hash(term) % num_shards balances load;
    each shard-merge task reads runs × (1/num_shards) of the posting volume;
    at extreme run counts, consolidate runs in a tree (merge B runs per
    intermediate level) to bound per-task open-file counts, and pass run
    lists by manifest path instead of task closure;
  - Zipfian hot terms (`def`, `self`, …) would otherwise serialize one
    shard's merge; terms with df ≥ hot_df_threshold are salted into
    ``n_salts`` doc-range buckets (runs are doc-contiguous), merged
    independently, and concatenated — sub-lists stay disjoint and sorted;
  - phase-1 output is partitioned by input row group ⇒ a failed run resumes
    by skipping finished row groups; phase 2 resumes per shard/bucket.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from nmr_fair_dos_ray.codec import BLOCK_SIZE, encode_group_blocks
from nmr_fair_dos_ray.search.bm25 import bm25_idf
from nmr_fair_dos_ray.sources.parquet_source import corpus_paths, read_work_item, work_items
from nmr_fair_dos_ray.state.manifest import (
    Manifest, PartitionLog, fingerprint_files,
)
from nmr_fair_dos_ray.tokenizer import Tokenizer, term_hash


@dataclass(frozen=True)
class IndexConfig:
    content_col: str = "content"
    id_col: str | None = None          # use an existing unique int64 id column
    token_cols: tuple[str, ...] = ()   # extra columns tokenized into the stream (e.g. path, lang)
    field_cols: tuple[str, ...] = ()   # exact-term fields, indexed as "<col>:<value>"
    stored_cols: tuple[str, ...] = ()  # carried into the docs table
    tokenizer_mode: str = "code"
    num_shards: int = 32
    block_size: int = BLOCK_SIZE
    k1: float = 1.2
    b: float = 0.75
    # ---- hot-term skew handling (north_rule: salted repartitioning) ----
    # Zipfian heads (`def`, `self`, `the`, …) otherwise serialize the shard
    # merge: one term's postings all land in one map_groups task. With
    # salting, terms whose df ≥ hot_df_threshold are rerouted to n_salts
    # disjoint doc-range sub-groups, merged independently, and concatenated
    # (ranges are disjoint + sorted) in a cheap final pass that fixes
    # df/idf/max_score globally.
    salt_hot_terms: bool = True
    hot_df_threshold: int | None = None  # None → max(1024, n_docs // 8)
    n_salts: int = 8
    # ---- champion lists (static-pruning experiment, VERDICT r2 item 8) ----
    # champion_m > 0 stores, per term, the doc_ids + stored tf_norm of its
    # top-m postings by impact (BM25 tf-norm; idf is constant within a term
    # so the order is global). At query time the searcher floors block-max
    # WAND's top-k threshold from the champions' exact per-term contributions
    # BEFORE traversal — results stay bit-identical (the floor is a proven
    # lower bound; see search/engine.py Searcher docstring), but early ranges
    # prune instead of being scored. Terms with df < champion_df_min store no
    # champions: the Zipf tail (df ≤ m) would duplicate its entire posting
    # list for lists BMW traverses in 1-2 blocks anyway — measured at sf0.1,
    # the cutoff shrinks champion storage ~8× at identical p50.
    # champion_df_min=None → auto (4 * champion_m).
    champion_m: int = 0
    champion_df_min: int | None = None
    # ---- positional index (phrase queries, ES match_phrase analog;
    # reference delegates phrase semantics to Elasticsearch's default
    # analyzer/index, src/nmr_FAIR_DOs/connectors/elasticsearch.py:169-173).
    # When on, every posting additionally stores the token positions of the
    # term in the doc's token stream (the same stream Tokenizer.tokenize
    # yields), delta+varint encoded into ONE byte stream per term —
    # decodable without touching the doc-id blocks. tf == position count, so
    # the stream needs no extra length metadata. Multi-source streams
    # (content + token_cols) are separated by POS_STREAM_GAP so phrases
    # never match across field boundaries (ES position_increment_gap).
    store_positions: bool = False

    def to_dict(self) -> dict:
        return {
            "content_col": self.content_col,
            "id_col": self.id_col,
            "token_cols": list(self.token_cols),
            "field_cols": list(self.field_cols),
            "stored_cols": list(self.stored_cols),
            "tokenizer_mode": self.tokenizer_mode,
            "num_shards": self.num_shards,
            "block_size": self.block_size,
            "k1": self.k1,
            "b": self.b,
            "salt_hot_terms": self.salt_hot_terms,
            "hot_df_threshold": self.hot_df_threshold,
            "n_salts": self.n_salts,
            "champion_m": self.champion_m,
            "champion_df_min": self.champion_df_min,
            "store_positions": self.store_positions,
        }

    @property
    def champ_df_min(self) -> int:
        return (
            self.champion_df_min
            if self.champion_df_min is not None
            else 4 * self.champion_m
        )


BLOCK_TYPE = pa.struct(
    [
        ("doc_base", pa.int64()),
        ("doc_last", pa.int64()),
        ("n", pa.int32()),
        ("max_score", pa.float64()),
        ("max_tf_norm", pa.float64()),
        ("docs", pa.binary()),
        ("tfs", pa.binary()),
    ]
)

POSTING_SCHEMA = pa.schema(
    [
        ("shard_id", pa.int32()),
        ("term", pa.string()),
        ("term_hash", pa.int64()),  # uint64 FNV-1a reinterpreted as int64
        ("doc_id", pa.int64()),
        ("tf", pa.int32()),
        ("doclen", pa.int32()),
    ]
)
# with store_positions: one varint byte-string of position deltas per posting
POSTING_SCHEMA_POS = POSTING_SCHEMA.append(pa.field("pos", pa.binary()))

#: positions of successive token streams (content, then each token_col) are
#: offset by this gap so phrases never match across stream boundaries
#: (Elasticsearch's position_increment_gap analog)
POS_STREAM_GAP = 100


def _bin_from_lengths(byte_lens: np.ndarray, data: np.ndarray) -> pa.Array:
    """Build a BinaryArray of len(byte_lens) values slicing ``data`` (uint8)
    consecutively — zero-copy into Arrow buffers, no per-value Python."""
    offs = np.concatenate([[0], np.cumsum(byte_lens)]).astype(np.int32)
    return pa.Array.from_buffers(
        pa.binary(), len(byte_lens),
        [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(data.tobytes())],
    )


def _encode_position_lists(pos_list: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Per-posting position lists -> per-posting varint byte strings.

    Each list is sorted ascending (group_by("list") preserves input order,
    which in code mode interleaves compound/part occurrences), delta-encoded
    (first value raw, then gaps — strictly positive: a term occupies a stream
    slot at most once), LEB128-varint packed. One vectorized pass, no per-
    posting loop.
    """
    arr = pos_list.combine_chunks() if isinstance(pos_list, pa.ChunkedArray) else pos_list
    n = len(arr)
    lens = pc.list_value_length(arr).to_numpy(zero_copy_only=False).astype(np.int64)
    flat_a = arr.flatten()
    flat = (flat_a.combine_chunks() if isinstance(flat_a, pa.ChunkedArray) else flat_a
            ).to_numpy(zero_copy_only=False).astype(np.int64)
    if flat.size == 0:
        return pa.array([b""] * n, pa.binary())
    seg = np.repeat(np.arange(n, dtype=np.int64), lens)
    order = np.lexsort((flat, seg))
    flat = flat[order]
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    deltas = np.empty_like(flat)
    deltas[1:] = flat[1:] - flat[:-1]
    deltas[starts] = flat[starts]  # segment firsts stay absolute
    from nmr_fair_dos_ray.codec import varint_encode_all

    data, nb = varint_encode_all(deltas)
    byte_lens = np.add.reduceat(nb, starts)
    return _bin_from_lengths(byte_lens, data)


class Phase1Invert:
    """map_batches callable over work items (batch_size=1): the SPIMI invert.

    Stateful actor-pool stage: the tokenizer (compiled regexes) is built once
    per actor in ``__init__`` (SURVEY.md §2.5), work happens per batch.
    """

    def __init__(self, cfg: IndexConfig, runs_dir: str, docs_dir: str,
                 df_min_cnt: int = 1):
        self.cfg = cfg
        self.tok = Tokenizer(cfg.tokenizer_mode)
        self.runs_dir = runs_dir
        self.docs_dir = docs_dir
        self.df_min_cnt = max(1, int(df_min_cnt))
        _cap_arrow_threads()

    def _read_columns(self) -> list[str] | None:
        cols = {self.cfg.content_col, *self.cfg.token_cols, *self.cfg.field_cols,
                *self.cfg.stored_cols}
        if self.cfg.id_col:
            cols.add(self.cfg.id_col)
        return sorted(cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_rows = []
        for item in batch.to_pylist():
            out_rows.append(self._one(item))
        return pa.Table.from_pylist(out_rows)

    def _one(self, item: dict) -> dict:
        t0 = time.time()
        c0 = time.process_time()
        cfg = self.cfg
        t = read_work_item(item, columns=self._read_columns())
        n = t.num_rows

        if cfg.id_col:
            doc_ids = t[cfg.id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        else:
            doc_ids = np.arange(
                item["doc_id_base"], item["doc_id_base"] + n, dtype=np.int64
            )

        content = t[cfg.content_col].cast(pa.string())
        # the one per-row loop on the build hot path: hashlib has no
        # vectorized form. Measured: sha256 of the whole 150k-doc sf-bench
        # corpus is 0.28 s single-threaded vs ~42 s of invert task CPU
        # (<1% of the stage) — revisit only if invert ever dominates again
        sha = pa.array(
            [hashlib.sha256((s or "").encode("utf-8")).hexdigest()
             for s in content.to_pylist()],
            pa.string(),
        )

        # ---- tokenize content + extra token columns (vectorized) ----
        want_pos = cfg.store_positions
        rows_parts = []
        terms_parts = []
        pos_parts = []
        stream_base = np.zeros(n, np.int64)  # per-row next-stream offset
        for src_i, col_arr in enumerate(
            [content] + [t[col].cast(pa.string()) for col in cfg.token_cols]
        ):
            r2, tm2, p2 = self.tok.batch_token_positions(col_arr, with_positions=want_pos)
            rows_parts.append(r2); terms_parts.append(tm2)
            if want_pos:
                pos_parts.append(p2 + stream_base[r2])
                stream_base += np.bincount(r2, minlength=n) + POS_STREAM_GAP
        rows = np.concatenate(rows_parts)
        terms = pa.concat_arrays(
            [x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x for x in terms_parts]
        )
        doclens = np.bincount(rows, minlength=n).astype(np.int32)

        # ---- per-(row, term) tf via Arrow group_by (C++ hash aggregation) ----
        p_pos_bin: pa.Array | None = None
        if len(terms):
            if want_pos:
                pairs = pa.table({
                    "row": pa.array(rows), "term": terms,
                    "pos": pa.array(np.concatenate(pos_parts)),
                })
                agg = pairs.group_by(["row", "term"]).aggregate(
                    [("term", "count"), ("pos", "list")]
                )
                p_pos_bin = _encode_position_lists(agg["pos_list"])
            else:
                pairs = pa.table({"row": pa.array(rows), "term": terms})
                agg = pairs.group_by(["row", "term"]).aggregate([("term", "count")])
            p_row = agg["row"].to_numpy(zero_copy_only=False)
            p_term = agg["term"].combine_chunks() if isinstance(agg["term"], pa.ChunkedArray) else agg["term"]
            p_tf = agg["term_count"].to_numpy(zero_copy_only=False).astype(np.int32)
        else:
            p_row = np.empty(0, np.int64)
            p_term = pa.array([], pa.string())
            p_tf = np.empty(0, np.int32)
            if want_pos:
                p_pos_bin = pa.array([], pa.binary())

        # ---- exact field terms ("<col>:<value>", tf=1) ----
        f_rows, f_terms = [p_row], [p_term]
        f_tfs = [p_tf]
        for colname in cfg.field_cols:
            vals = t[colname].cast(pa.string())
            # exact term "<col>:<value>"
            ft = pc.binary_join_element_wise(
                pa.array([colname + ":"] * n), pc.fill_null(vals, ""), ""
            )
            f_rows.append(np.arange(n, dtype=np.int64))
            f_terms.append(ft.combine_chunks() if isinstance(ft, pa.ChunkedArray) else ft)
            f_tfs.append(np.ones(n, np.int32))
        all_rows = np.concatenate(f_rows)
        all_terms = pa.concat_arrays(f_terms)
        all_tfs = np.concatenate(f_tfs)

        th = term_hash(all_terms)
        shard = (th % np.uint64(cfg.num_shards)).astype(np.int32)
        cols = {
            "shard_id": pa.array(shard),
            "term": all_terms,
            "term_hash": pa.array(th.view(np.int64)),
            "doc_id": pa.array(doc_ids[all_rows]),
            "tf": pa.array(all_tfs),
            "doclen": pa.array(doclens[all_rows]),
        }
        if want_pos:
            # field terms carry no positions (tf=1 synthetic exact terms,
            # outside the token stream): empty byte strings
            n_field_rows = all_rows.size - p_row.size
            cols["pos"] = pa.concat_arrays(
                [p_pos_bin, pa.array([b""] * n_field_rows, pa.binary())]
            )
        postings = pa.table(
            cols, schema=POSTING_SCHEMA_POS if want_pos else POSTING_SCHEMA
        )
        # sort by shard so the run file can be written with shard-aligned row
        # groups — the storage-backed shuffle phase 2 relies on (statistics
        # prune every row group but the target shard's)
        postings = postings.take(
            pc.sort_indices(postings, sort_keys=[("shard_id", "ascending")])
        )

        docs_cols: dict = {"doc_id": pa.array(doc_ids), "sha256": sha,
                           "doclen": pa.array(doclens)}
        for col in cfg.stored_cols:
            docs_cols[col] = t[col]
        docs = pa.table(docs_cols)

        wi = int(item["work_item_id"])
        run_path = os.path.join(self.runs_dir, f"run_{wi:06d}.parquet")
        docs_path = os.path.join(self.docs_dir, f"docs_{wi:06d}.parquet")
        df_path = os.path.join(self.runs_dir, f"df_{wi:06d}.parquet")
        _atomic_write_run(postings, run_path)
        _atomic_write_parquet(docs, docs_path)
        # partial document frequencies (term_hash → rows-in-run): a tiny
        # sidecar per run so hot-term detection is a merge of pre-aggregated
        # sketches instead of a full shuffle of the posting rows. Rows with
        # cnt < df_min_cnt are dropped — Zipf-tail terms can't reach the hot
        # threshold anyway (detection is a skew heuristic, not a correctness
        # boundary: salting any superset/subset of the true hot set yields an
        # identical index, only the merge balance differs).
        u_th, u_cnt = np.unique(th, return_counts=True)
        if self.df_min_cnt > 1:
            keep_hot = u_cnt >= self.df_min_cnt
            u_th, u_cnt = u_th[keep_hot], u_cnt[keep_hot]
        _atomic_write_parquet(
            pa.table({"term_hash": pa.array(u_th.view(np.int64)),
                      "cnt": pa.array(u_cnt.astype(np.int64))}),
            df_path,
        )

        return {
            "work_item_id": wi,
            "path": item["path"],
            "row_group": int(item["row_group"]),
            "row_offset": int(item.get("row_offset", 0)),
            "doc_id_base": int(item["doc_id_base"]),
            "n_docs": int(n),
            "doc_min": int(doc_ids.min()) if n else 0,
            "doc_max": int(doc_ids.max()) if n else -1,
            "sum_doclen": int(doclens.sum()),
            "n_postings": int(postings.num_rows),
            "run_path": run_path,
            "docs_path": docs_path,
            "df_path": df_path,
            "bytes": int(os.path.getsize(run_path) + os.path.getsize(docs_path)),
            "wall_sec": time.time() - t0,
            # per-task CPU (whole worker process incl. arrow threads): the
            # wall/CPU pair per stage is what distinguishes "engine got
            # slower" from "host inflated per-task CPU" in scaling runs
            "cpu_sec": time.process_time() - c0,
        }


def _clear_dir(d: str) -> None:
    """Remove stale stage outputs (they are all rebuilt by the next pass)."""
    import shutil

    shutil.rmtree(d, ignore_errors=True)


def _cap_arrow_threads(n: int = 2) -> None:
    """Cap pyarrow's global thread pools inside Ray worker processes.

    Each Ray task gets ONE scheduled CPU, but pyarrow defaults both its CPU
    and IO pools to the machine's core count — with 32 concurrent workers
    that is 32×32 threads and throughput *drops* as workers are added
    (measured: the 32-CPU build ran 2× slower than the 8-CPU one before this
    cap). Parallelism belongs to Ray's scheduler, not nested thread pools.
    """
    try:
        if pa.cpu_count() > n:
            pa.set_cpu_count(n)
        if pa.io_thread_count() > 2 * n:
            pa.set_io_thread_count(2 * n)
    except Exception:
        pass


def _atomic_write_parquet(table: pa.Table, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + f".tmp-{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)


def _atomic_write_run(postings: pa.Table, path: str) -> None:
    """Write a posting run (already sorted by shard_id) with one row group
    per shard, so downstream per-shard readers prune on statistics."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + f".tmp-{os.getpid()}"
    sh = postings["shard_id"].to_numpy(zero_copy_only=False)
    bounds = np.concatenate(
        [[0], np.flatnonzero(np.diff(sh)) + 1, [len(sh)]]
    ) if len(sh) else np.array([0, 0])
    with pq.ParquetWriter(tmp, postings.schema) as w:
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e > s:
                w.write_table(postings.slice(int(s), int(e - s)))
    os.replace(tmp, path)


_EMPTY_SHARD = pa.schema(
    [("term", pa.string()), ("term_hash", pa.int64()), ("df", pa.int64()),
     ("cf", pa.int64()), ("blocks", pa.list_(BLOCK_TYPE))]
)

_CHAMP_FIELDS = [
    ("champ_docs", pa.list_(pa.int64())),
    ("champ_tfn", pa.list_(pa.float64())),
]


def _top_m_per_segment(
    doc_ids: np.ndarray, tfn: np.ndarray, counts: np.ndarray, m: int,
    seg_df: np.ndarray | None = None, df_min: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Indices of each segment's top-m elements by (tfn desc, doc asc), plus
    the per-segment champion counts — one global lexsort, no per-term loop.

    Segments are contiguous runs of ``counts`` elements (term order).
    Segments whose df (``seg_df``, default ``counts``) is below ``df_min``
    get an EMPTY champion list — the Zipf tail isn't worth the bytes.
    """
    n = doc_ids.size
    if seg_df is None:
        seg_df = counts
    seg = np.repeat(np.arange(counts.size, dtype=np.int64), counts)
    order = np.lexsort((doc_ids, -tfn, seg))  # primary: seg, then tfn desc
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = np.arange(n, dtype=np.int64) - np.repeat(starts, counts)
    eligible = np.repeat(seg_df >= df_min, counts)
    take = order[(pos < m) & eligible]
    return take, np.where(seg_df >= df_min, np.minimum(counts, m), 0)


def build_group_table(
    group: pa.Table, cfg: IndexConfig, n_docs: int, avgdl: float,
    hot_part: bool = False,
) -> pa.Table:
    """Merge+compress one group of postings (columns term/term_hash/doc_id/
    tf/doclen) into a shard table: sort (term, doc_id) once, slice per term
    via dictionary change points, encode every block in one vectorized pass.

    df computed here is exact iff the group holds EVERY posting of its terms
    (cold shards); for hot doc-range parts it is partial and finalized by
    :func:`merge_hot_parts` (stored max_tf_norm makes that a metadata
    rewrite, not a posting decode).
    """
    if group.num_rows == 0:
        schema = _EMPTY_SHARD
        if cfg.champion_m > 0:
            for name, typ in _CHAMP_FIELDS:
                schema = schema.append(pa.field(name, typ))
        if cfg.store_positions:
            schema = schema.append(pa.field("pos_stream", pa.binary()))
        return schema.empty_table()
    idx = pc.sort_indices(
        group, sort_keys=[("term", "ascending"), ("doc_id", "ascending")]
    )
    g = group.take(idx)
    terms = g["term"].combine_chunks() if isinstance(g["term"], pa.ChunkedArray) else g["term"]
    doc_ids = g["doc_id"].to_numpy(zero_copy_only=False)
    tfs = g["tf"].to_numpy(zero_copy_only=False)
    doclens = g["doclen"].to_numpy(zero_copy_only=False)
    hashes = g["term_hash"].to_numpy(zero_copy_only=False)

    # term boundaries via dictionary-encoded change points
    enc = pc.dictionary_encode(terms)
    codes = (enc.combine_chunks().indices.to_numpy(zero_copy_only=False)
             if isinstance(enc, pa.ChunkedArray) else enc.indices.to_numpy(zero_copy_only=False))
    change = np.flatnonzero(np.diff(codes)) + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [len(codes)]])
    counts = ends - starts

    # idf per term via the scalar bm25_idf (math.log) so stored block maxes
    # are bit-consistent with query-time idf; O(terms), not O(postings).
    idfs = np.array([bm25_idf(int(c), n_docs) for c in counts], np.float64)
    blocks_list = encode_group_blocks(
        doc_ids, tfs, doclens, counts, idfs,
        cfg.k1, cfg.b, avgdl, block_size=cfg.block_size,
    )
    cols = {
        "term": terms.take(pa.array(starts)),
        "term_hash": pa.array(hashes[starts], pa.int64()),
        "df": pa.array(counts, pa.int64()),
        "cf": pa.array(np.add.reduceat(tfs, starts), pa.int64()),
        "blocks": blocks_list,
    }
    if cfg.champion_m > 0:
        # champion lists: per term, the doc_ids of the top-m postings by
        # impact (tf_norm; idf constant per term ⇒ same order as BM25 score).
        # tfn is stored too so salted hot-term parts can be re-merged by
        # impact without decoding postings (merge_hot_parts).
        from nmr_fair_dos_ray.search.bm25 import bm25_tf_norm

        tfn = bm25_tf_norm(tfs, doclens, cfg.k1, cfg.b, avgdl)
        # hot doc-range parts see only partial df, so the Zipf-tail cutoff is
        # deferred to merge_hot_parts where global df is known.
        take, c_counts = _top_m_per_segment(
            doc_ids, tfn, counts, cfg.champion_m,
            df_min=0 if hot_part else cfg.champ_df_min,
        )
        offs = pa.array(
            np.concatenate([[0], np.cumsum(c_counts)]).astype(np.int32), pa.int32()
        )
        cols["champ_docs"] = pa.ListArray.from_arrays(
            offs, pa.array(doc_ids[take], pa.int64())
        )
        cols["champ_tfn"] = pa.ListArray.from_arrays(
            offs, pa.array(tfn[take], pa.float64())
        )
    if cfg.store_positions and "pos" in g.column_names:
        # per-term position stream: the sorted postings' varint byte strings
        # concatenate directly (each is self-delimiting; count = that
        # posting's tf, recovered from the decoded tf array at read time)
        seg_offs = pa.array(
            np.concatenate([starts, [len(codes)]]).astype(np.int32), pa.int32()
        )
        pos_col = g["pos"].combine_chunks() if isinstance(g["pos"], pa.ChunkedArray) else g["pos"]
        cols["pos_stream"] = pc.binary_join(
            pa.ListArray.from_arrays(seg_offs, pos_col), pa.scalar(b"", pa.binary())
        )
    return pa.table(cols)


def build_index(
    source: str | list[str],
    index_dir: str,
    cfg: IndexConfig = IndexConfig(),
    *,
    resume: bool = True,
    concurrency: int | None = None,
) -> dict:
    """Run the full build. Returns the manifest dict (stats + per-partition).

    ``resume=True`` skips row groups whose phase-1 outputs exist and shards
    whose phase-2 outputs exist, provided the input fingerprint and config
    match (otherwise the build restarts clean).
    """
    import ray.data as rd

    paths = corpus_paths(source)
    items = work_items(paths)
    for i, it in enumerate(items):
        it["work_item_id"] = i
    # fingerprint covers the partition boundaries too: a slicing-config change
    # must invalidate stale per-partition manifests
    boundary_sig = hashlib.sha256(
        json.dumps(
            [(it["path"], it["row_group"], it["row_offset"], it["num_rows"]) for it in items]
        ).encode()
    ).hexdigest()
    fp = hashlib.sha256((fingerprint_files(paths) + boundary_sig).encode()).hexdigest()
    runs_dir = os.path.join(index_dir, "runs")
    docs_dir = os.path.join(index_dir, "docs")
    shards_dir = os.path.join(index_dir, "shards")
    man = Manifest(index_dir)

    cfg_json = json.dumps(cfg.to_dict(), sort_keys=True)
    cfg_changed = (
        man.data.get("config")
        and json.dumps(man.data["config"], sort_keys=True) != cfg_json
    )
    fp_changed = man.data.get("input_fingerprint") not in (None, fp)
    if not resume or cfg_changed:
        man.data = {"config": cfg.to_dict(), "stages": {}, "stats": {}}
        _clear_dir(shards_dir)
        _clear_dir(os.path.join(index_dir, "hotparts"))
        # runs/ and docs/ too: IndexReader scans the docs/ DIRECTORY, so a
        # rebuild onto a smaller corpus must not leave stale docs_NNNNNN
        # files injecting phantom doc_ids/doclens into every search.
        _clear_dir(runs_dir)
        _clear_dir(docs_dir)
        PartitionLog(index_dir, "invert").clear()
    elif fp_changed:
        # Incremental append (reference analog: per-doc ES index call K1 —
        # "incremental add = append partition + delta-merge", SURVEY.md §2.2):
        # keep every invert partition whose identity (path, row group, slice,
        # docID base) is unchanged under the new work-item list — true for
        # all existing partitions when files are only ADDED after them in
        # sort order — and re-run only the merge stages over old + new runs.
        # A file inserted mid-order shifts docID bases, so nothing matches
        # and the build correctly degrades to a full rebuild.
        plog = PartitionLog(index_dir, "invert")
        old = plog.read()
        keep_tbl = None
        if old is not None and old.num_rows:
            # vectorized identity match against the new work-item list
            wi = old["work_item_id"].to_numpy(zero_copy_only=False)
            in_range = wi < len(items)
            it_path = np.array([items[w]["path"] if r else "" for w, r in zip(wi, in_range)])
            it_rg = np.array([items[w]["row_group"] if r else -1 for w, r in zip(wi, in_range)])
            it_off = np.array([items[w]["row_offset"] if r else -1 for w, r in zip(wi, in_range)])
            it_base = np.array([items[w]["doc_id_base"] if r else -1 for w, r in zip(wi, in_range)])
            it_n = np.array([items[w]["num_rows"] if r else -1 for w, r in zip(wi, in_range)])
            m = (
                in_range
                & (old["path"].to_numpy(zero_copy_only=False) == it_path)
                & (old["row_group"].to_numpy(zero_copy_only=False) == it_rg)
                & (old["row_offset"].to_numpy(zero_copy_only=False) == it_off)
                & (old["doc_id_base"].to_numpy(zero_copy_only=False) == it_base)
                & (old["n_docs"].to_numpy(zero_copy_only=False) == it_n)
            )
            if m.any():
                keep_tbl = old.filter(pa.array(m))
        man.data["stages"] = {}
        man.data["stats"] = {}
        if keep_tbl is not None:
            plog.replace(keep_tbl)
        else:
            plog.clear()
        _clear_dir(shards_dir)
        _clear_dir(os.path.join(index_dir, "hotparts"))
        # prune phase-1 outputs not carried over by ``keep`` (file removed /
        # shrunk / reordered) — directory-scanning readers must never see
        # run/docs/sidecar files of abandoned work items
        keep_files = set()
        if keep_tbl is not None:
            for col in ("run_path", "docs_path", "df_path"):
                for p in keep_tbl[col].to_pylist():
                    if p:
                        keep_files.add(os.path.abspath(p))
        for d in (runs_dir, docs_dir):
            if os.path.isdir(d):
                for fn in os.listdir(d):
                    p = os.path.abspath(os.path.join(d, fn))
                    if p not in keep_files:
                        os.remove(p)
    man.data["config"] = cfg.to_dict()
    man.data["input_fingerprint"] = fp
    man.save()

    # ---------------- phase 1: invert (per row group, resumable) ----------
    # Partition rows live in a parquet PartitionLog, streamed from workers —
    # the driver never materializes the result list or per-item dicts
    # (VERDICT round-1 item 9: memory honest at millions of work items).
    t0 = time.time()
    plog = PartitionLog(index_dir, "invert")
    done_p1: set[int] = set()
    if resume:
        prev = plog.read(columns=["run_path", "docs_path"])
        if prev is not None:
            for w, rp, dp in zip(
                prev["work_item_id"].to_pylist(),
                prev["run_path"].to_pylist(),
                prev["docs_path"].to_pylist(),
            ):
                if os.path.exists(rp) and os.path.exists(dp):
                    done_p1.add(int(w))
    todo = [it for it in items if it["work_item_id"] not in done_p1]
    # planned hot threshold (doc count known up front from the footer scout)
    # drives the sidecar pre-filter: per-run counts below thr/(4*num_items)
    # can't plausibly belong to a hot term (Zipf heads are spread ~uniformly
    # across doc-contiguous runs), so the tail never hits the sidecars
    planned_docs = sum(it["num_rows"] for it in items)
    thr_planned = cfg.hot_df_threshold or max(1024, planned_docs // 8)
    df_min_cnt = (
        max(1, thr_planned // (4 * max(1, len(items))))
        if cfg.salt_hot_terms
        else 1
    )
    if todo:
        ds = rd.from_items(todo)
        stage = Phase1Invert(cfg, runs_dir, docs_dir, df_min_cnt=df_min_cnt)
        kwargs: dict = {"batch_size": 1, "batch_format": "pyarrow"}
        if concurrency:
            kwargs["concurrency"] = concurrency
        session = plog.open_session()
        try:
            for batch in ds.map_batches(stage, **kwargs).iter_batches(
                batch_format="pyarrow"
            ):
                session.write(batch)
        finally:
            session.close()

    parts_tbl = plog.read()
    if parts_tbl is None:
        parts_tbl = pa.table({
            "work_item_id": pa.array([], pa.int64()),
            "n_docs": pa.array([], pa.int64()),
            "sum_doclen": pa.array([], pa.int64()),
            "n_postings": pa.array([], pa.int64()),
            "doc_min": pa.array([], pa.int64()),
            "doc_max": pa.array([], pa.int64()),
            "run_path": pa.array([], pa.string()),
            "df_path": pa.array([], pa.string()),
        })
    nd_col = parts_tbl["n_docs"].to_numpy(zero_copy_only=False)
    n_docs = int(nd_col.sum())
    sum_doclen = int(parts_tbl["sum_doclen"].to_numpy(zero_copy_only=False).sum())
    avgdl = (sum_doclen / n_docs) if n_docs else 0.0
    nonempty_m = nd_col > 0
    doc_lo = (
        int(parts_tbl["doc_min"].to_numpy(zero_copy_only=False)[nonempty_m].min())
        if nonempty_m.any() else 0
    )
    doc_hi = (
        int(parts_tbl["doc_max"].to_numpy(zero_copy_only=False)[nonempty_m].max())
        if nonempty_m.any() else -1
    )
    man.data["stats"] = {
        "n_docs": n_docs,
        "sum_doclen": sum_doclen,
        "avgdl": avgdl,
        "n_postings": int(parts_tbl["n_postings"].to_numpy(zero_copy_only=False).sum()),
        "doc_min": doc_lo,
        "doc_max": doc_hi,
        "k1": cfg.k1,
        "b": cfg.b,
    }
    _task_sums = {
        f"task_{name}_sum": round(
            # nansum: resumed logs may carry null metrics from older sessions
            float(np.nansum(parts_tbl[c].to_numpy(zero_copy_only=False))), 3
        )
        for name, c in (("wall", "wall_sec"), ("cpu", "cpu_sec"))
        if c in parts_tbl.column_names
    }
    man.mark_stage("invert", status="done", wall_sec=time.time() - t0, **_task_sums)
    # doc-contiguity of hot run-buckets requires WORK-ITEM order, not path
    # order: 'run_1000000' sorts lexicographically before 'run_999999', which
    # would break bucket doc-range disjointness past 10^6 work items
    _wi_order = np.argsort(parts_tbl["work_item_id"].to_numpy(zero_copy_only=False))
    _rp = parts_tbl["run_path"].to_pylist()
    run_paths = [_rp[i] for i in _wi_order]

    # -------- phase 1.5: hot-term detection (salted-repartition prep) -----
    # Cheap: per-block partial df counts (one row per distinct term per run)
    # → tiny groupby-sum → filter ≥ threshold. The shuffle carries
    # (term_hash, partial_count), never postings. Hot hashes are persisted in
    # the manifest so a resumed build reroutes identically.
    hot_hashes = np.empty(0, dtype=np.int64)
    if cfg.salt_hot_terms and n_docs > 0:
        if resume and man.stage("hot").get("status") == "done":
            hot_hashes = np.array(man.stage("hot").get("hot_hashes", []), dtype=np.int64)
        else:
            thr = cfg.hot_df_threshold or max(1024, n_docs // 8)
            t_hot = time.time()
            # merge the per-run partial-df sidecars (already aggregated in
            # phase 1): rows here = Σ distinct-terms-per-run, read threaded
            # by pyarrow and summed with one sort+reduceat — no Ray shuffle.
            # At extreme corpus scale (Σ distinct terms beyond driver memory)
            # this merge tree gains one Ray map_batches level, same math.
            import pyarrow.dataset as pads

            df_paths = sorted(
                pth for pth in parts_tbl["df_path"].to_pylist() if pth
            )
            t = pads.dataset(df_paths).to_table(columns=["term_hash", "cnt"])
            th_all = t["term_hash"].to_numpy(zero_copy_only=False)
            cnt_all = t["cnt"].to_numpy(zero_copy_only=False)
            est_hot_postings = 0
            if th_all.size:
                order = np.argsort(th_all, kind="stable")
                th_s, cnt_s = th_all[order], cnt_all[order]
                starts = np.flatnonzero(
                    np.concatenate([[True], th_s[1:] != th_s[:-1]])
                )
                sums = np.add.reduceat(cnt_s, starts)
                is_hot = sums >= thr
                hot_hashes = np.sort(th_s[starts][is_hot]).astype(np.int64)
                est_hot_postings = int(sums[is_hot].sum())
            else:
                hot_hashes = np.empty(0, np.int64)
            man.mark_stage(
                "hot", status="done", threshold=int(thr),
                n_hot=int(hot_hashes.size),
                hot_hashes=[int(h) for h in hot_hashes],
                est_hot_postings=est_hot_postings,
                wall_sec=time.time() - t_hot,
            )
    hot_sorted = np.sort(hot_hashes)
    # hot run-buckets: contiguous slices of the doc-ordered run list, so each
    # bucket covers a disjoint doc-id range and the final merge is a concat.
    # Bucket count adapts to the estimated hot posting volume (target ≈250k
    # postings per task keeps per-task working sets small — which matters
    # both for worker heap reuse and for straggler-free scheduling) and is
    # persisted so a resumed build slices identically.
    n_buckets = 0
    if hot_sorted.size:
        est = int(man.stage("hot").get("est_hot_postings", 0))
        n_buckets = int(man.stage("hot").get("n_buckets", 0))
        if not n_buckets:
            n_buckets = max(cfg.n_salts, min(128, -(-est // 250_000)))
            n_buckets = min(n_buckets, len(run_paths))
            man.mark_stage("hot", n_buckets=int(n_buckets))
    buckets = [[str(p) for p in c] for c in np.array_split(run_paths, n_buckets)
               if len(c)] if n_buckets else []

    # ------------- phase 2: per-shard merge (storage-backed shuffle) ------
    # No Dataset.groupby: phase-1 run files are sorted by shard_id with
    # shard-aligned row groups, so each merge task reads only its shard's row
    # groups (parquet statistics pruning) — the exchange happens through
    # write-once files, which is also what makes this stage resumable and
    # measured ~10× faster than the sort-based all-to-all it replaces.
    t1 = time.time()
    hotparts_dir = os.path.join(index_dir, "hotparts")
    done_shards = man.done_partitions("shards") if resume else set()
    todo_merge: list[dict] = []
    for s in range(cfg.num_shards):
        if s not in done_shards:
            todo_merge.append({"pid": s, "kind": "cold"})
    for bkt in range(len(buckets)):
        if cfg.num_shards + bkt not in done_shards:
            todo_merge.append({"pid": cfg.num_shards + bkt, "kind": "hot"})
    if todo_merge and n_docs > 0:
        import pyarrow.dataset as pads

        hot_list = pa.array(hot_sorted, pa.int64())
        num_shards = cfg.num_shards

        def merge_task(batch: pa.Table) -> pa.Table:
            # one descriptor per batch (batch_size=1): read → build → write
            _cap_arrow_threads()
            rows = []
            for it in batch.to_pylist():
                t0m = time.time()
                c0m = time.process_time()
                pid = int(it["pid"])
                merge_cols = ["term", "term_hash", "doc_id", "tf", "doclen"]
                if cfg.store_positions:
                    merge_cols.append("pos")
                if it["kind"] == "cold":
                    g = pads.dataset(run_paths).to_table(
                        columns=merge_cols,
                        filter=pc.field("shard_id") == pid,
                    )
                    if len(hot_list):
                        g = g.filter(
                            pc.invert(pc.is_in(g["term_hash"], value_set=hot_list))
                        )
                    path = os.path.join(shards_dir, f"shard_{pid:05d}.parquet")
                else:
                    g = pads.dataset(buckets[pid - num_shards]).to_table(
                        columns=merge_cols,
                        filter=pc.field("term_hash").isin(hot_list),
                    )
                    path = os.path.join(hotparts_dir, f"part_{pid:06d}.parquet")
                shard_table = build_group_table(
                    g, cfg, n_docs, avgdl, hot_part=(it["kind"] != "cold")
                )
                _atomic_write_parquet(shard_table, path)
                rows.append(
                    {
                        "shard_id": pid,
                        "n_terms": shard_table.num_rows,
                        "n_postings": int(g.num_rows),
                        "bytes": int(os.path.getsize(path)),
                        "path": path,
                        "wall_sec": time.time() - t0m,
                        "cpu_sec": time.process_time() - c0m,
                    }
                )
            return pa.Table.from_pylist(rows)

        kwargs2: dict = {"batch_size": 1, "batch_format": "pyarrow"}
        res = rd.from_items(todo_merge).map_batches(merge_task, **kwargs2).take_all()
        for r in res:
            man.mark_partition("shards", r["shard_id"], **{
                k: r[k]
                for k in ("n_terms", "n_postings", "bytes", "path", "wall_sec",
                          "cpu_sec")
            })
        parts = man.partitions("shards").values()
        man.mark_stage(
            "shards", status="done", wall_sec=time.time() - t1,
            task_wall_sum=round(sum(p.get("wall_sec", 0.0) for p in parts), 3),
            task_cpu_sum=round(sum(p.get("cpu_sec", 0.0) for p in parts), 3),
        )
    elif not man.stage_done("shards"):
        man.mark_stage("shards", status="done", wall_sec=0.0)  # nothing to do

    # -------- phase 3: finalize hot terms (concat disjoint doc ranges) ----
    hotmerge_complete = man.stage_done("hotmerge") and (
        (p := man.stage("hotmerge").get("path")) is None or os.path.exists(p)
    )
    if hot_sorted.size and not hotmerge_complete:
        t2 = time.time()
        out_path = merge_hot_parts(
            hotparts_dir, shards_dir, n_docs, champion_m=cfg.champion_m,
            champ_df_min=cfg.champ_df_min,
        )
        man.mark_stage(
            "hotmerge", status="done", n_hot=int(hot_sorted.size),
            path=out_path, wall_sec=time.time() - t2,
        )
    # size/compression metrics: final searchable footprint vs posting volume
    def _dir_bytes(d: str) -> int:
        if not os.path.isdir(d):
            return 0
        return sum(
            os.path.getsize(os.path.join(d, p))
            for p in os.listdir(d) if p.endswith(".parquet")
        )

    shards_bytes = _dir_bytes(shards_dir)
    n_postings = man.data["stats"].get("n_postings", 0)
    man.data["stats"]["shards_bytes"] = shards_bytes
    man.data["stats"]["docs_bytes"] = _dir_bytes(docs_dir)
    man.data["stats"]["runs_bytes"] = _dir_bytes(runs_dir)
    man.data["stats"]["bytes_per_posting"] = (
        round(shards_bytes / n_postings, 3) if n_postings else 0.0
    )
    man.data["stats"]["build_wall_sec"] = time.time() - t0
    man.save()
    return man.data


def merge_hot_parts(
    hotparts_dir: str, shards_dir: str, n_docs: int, champion_m: int = 0,
    champ_df_min: int = 0,
) -> str | None:
    """Concatenate each hot term's salted doc-range parts into one final
    posting list with globally-correct df/idf/max_score.

    Pure metadata work: parts are already compressed block runs over disjoint
    increasing doc ranges, so the merge concatenates block lists (ordered by
    doc_base) and rewrites max_score = idf(global df) * stored max_tf_norm —
    no posting is decoded. Cost is O(hot terms × blocks-per-term metadata);
    hot terms are the Zipf head, a tiny fixed set, so this runs driver-side.
    """
    if not os.path.isdir(hotparts_dir):
        return None
    part_files = sorted(
        os.path.join(hotparts_dir, p)
        for p in os.listdir(hotparts_dir)
        if p.endswith(".parquet")
    )
    if not part_files:
        return None
    # fully vectorized: sort part rows by (term_hash, first block doc_base) —
    # after that, every term's blocks are already concatenated in doc order
    # in the flattened struct array; only the per-term list offsets and the
    # max_score field (now with the true global idf) need rebuilding.
    t = pa.concat_tables(
        [pq.read_table(p) for p in part_files]
    ).combine_chunks()
    blocks = t["blocks"].combine_chunks()
    offs = blocks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = blocks.flatten()
    first_base = flat.field("doc_base").to_numpy(zero_copy_only=False)[offs[:-1]]
    th = t["term_hash"].to_numpy(zero_copy_only=False)
    order = np.lexsort((first_base, th))
    t = t.take(pa.array(order))
    blocks = t["blocks"].combine_chunks()
    offs = blocks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = blocks.flatten()
    th = t["term_hash"].to_numpy(zero_copy_only=False)
    dfs = t["df"].to_numpy(zero_copy_only=False)
    cfs = t["cf"].to_numpy(zero_copy_only=False)
    n_blocks_per_row = np.diff(offs)

    starts = np.flatnonzero(np.concatenate([[True], th[1:] != th[:-1]]))
    df_tot = np.add.reduceat(dfs, starts)
    cf_tot = np.add.reduceat(cfs, starts)
    # disjointness check: within a term, each row's first base must follow
    # the previous row's last block doc_last
    lasts_flat = flat.field("doc_last").to_numpy(zero_copy_only=False)
    row_last = lasts_flat[offs[1:] - 1]
    same_term = th[1:] == th[:-1]
    if np.any(same_term & (first_base[order][1:] <= row_last[:-1])):
        raise AssertionError("hot-term doc ranges overlap across salted parts")

    idfs = np.array([bm25_idf(int(d), n_docs) for d in df_tot], np.float64)
    blocks_per_term = np.add.reduceat(n_blocks_per_row, starts)
    idf_of_block = np.repeat(idfs, blocks_per_term)
    new_max = idf_of_block * flat.field("max_tf_norm").to_numpy(zero_copy_only=False)
    fields = {f: flat.field(f) for f in
              ("doc_base", "doc_last", "n", "max_tf_norm", "docs", "tfs")}
    new_flat = pa.StructArray.from_arrays(
        [fields["doc_base"], fields["doc_last"], fields["n"],
         pa.array(new_max, pa.float64()), fields["max_tf_norm"],
         fields["docs"], fields["tfs"]],
        names=["doc_base", "doc_last", "n", "max_score", "max_tf_norm",
               "docs", "tfs"],
    )
    new_offsets = np.concatenate([[0], np.cumsum(blocks_per_term)]).astype(np.int32)
    cols = {
        "term": t["term"].combine_chunks().take(pa.array(starts)),
        "term_hash": pa.array(th[starts], pa.int64()),
        "df": pa.array(df_tot, pa.int64()),
        "cf": pa.array(cf_tot, pa.int64()),
        "blocks": pa.ListArray.from_arrays(
            pa.array(new_offsets, pa.int32()), new_flat
        ),
    }
    if champion_m > 0 and "champ_docs" in t.column_names:
        # champion re-merge: each salted part kept its top-m by impact over a
        # disjoint doc range (so no duplicate docs per term); the global
        # top-m is the top-m of the per-part champions' union — pure metadata
        # work on ≤ m × parts values per term, postings never decoded.
        cd = t["champ_docs"].combine_chunks()
        ct = t["champ_tfn"].combine_chunks()
        per_row = np.diff(cd.offsets.to_numpy(zero_copy_only=False).astype(np.int64))
        flat_docs = cd.flatten().to_numpy(zero_copy_only=False)
        flat_tfn = ct.flatten().to_numpy(zero_copy_only=False)
        term_of_row = np.cumsum(
            np.concatenate([[0], (th[1:] != th[:-1]).astype(np.int64)])
        )
        seg_counts = np.bincount(
            np.repeat(term_of_row, per_row), minlength=starts.size
        ).astype(np.int64)
        take, c_counts = _top_m_per_segment(
            flat_docs, flat_tfn, seg_counts, champion_m,
            seg_df=df_tot, df_min=champ_df_min,
        )
        c_offs = pa.array(
            np.concatenate([[0], np.cumsum(c_counts)]).astype(np.int32), pa.int32()
        )
        cols["champ_docs"] = pa.ListArray.from_arrays(
            c_offs, pa.array(flat_docs[take], pa.int64())
        )
        cols["champ_tfn"] = pa.ListArray.from_arrays(
            c_offs, pa.array(flat_tfn[take], pa.float64())
        )
    if "pos_stream" in t.column_names:
        # parts are already in (term, doc-range) order; their per-part varint
        # streams concatenate to the term's global stream (first values are
        # absolute, so part boundaries need no fix-up)
        ps = t["pos_stream"].combine_chunks()
        seg_offs = pa.array(
            np.concatenate([starts, [len(th)]]).astype(np.int32), pa.int32()
        )
        cols["pos_stream"] = pc.binary_join(
            pa.ListArray.from_arrays(seg_offs, ps), pa.scalar(b"", pa.binary())
        )
    out = pa.table(cols)
    path = os.path.join(shards_dir, "shard_hot.parquet")
    _atomic_write_parquet(out, path)
    return path
