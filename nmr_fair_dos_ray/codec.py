"""Posting-list compression: delta + varint (LEB128) with fixed-size blocks.

The reference stores postings inside Elasticsearch/Lucene (a black box behind
reference: src/nmr_FAIR_DOs/connectors/elasticsearch.py:204-229); this module
is the engine's own codec, per BASELINE.json ``north_star``: docID-sorted
lists, delta-encoded gaps, varint (LEB128) byte packing, 128-posting blocks,
per-block max-score metadata for block-max WAND.

Both encode and decode are numpy-vectorized: they loop over *byte positions*
(≤10 passes for uint64), never over values, so a multi-million-posting shard
compresses without per-value Python overhead.

Block layout per term (Arrow struct, stored in shard parquet files):
    doc_base   int64    absolute first docID of the block
    doc_last   int64    absolute last docID (skip pointer for WAND)
    n          int32    number of postings in the block
    max_score  float64  upper bound of BM25 contribution within the block
                        (float64 on purpose: a float32-rounded bound could
                        fall below the true score and break BMW pruning)
    max_tf_norm float64 idf-free part of max_score: max over the block of
                        tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)). Lets a later
                        pass recompute max_score = idf * max_tf_norm when the
                        term's global df is only known after merging salted
                        doc-range sub-shards (hot-term skew handling).
    docs       binary   varint gaps for postings 1..n-1 (first is doc_base)
    tfs        binary   varint term frequencies for postings 0..n-1
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128


# ---------------------------------------------------------------- varint ----
def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode an array of non-negative ints (vectorized)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # bytes needed per value: ceil(bit_length / 7), min 1
    nb = np.ones(v.size, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nb += (tmp > 0).astype(np.int64)
        tmp = tmp >> np.uint64(7)
    starts = np.concatenate([[0], np.cumsum(nb)[:-1]])
    out = np.zeros(int(nb.sum()), dtype=np.uint8)
    for j in range(10):
        m = nb > j
        if not m.any():
            break
        byte = (v[m] >> np.uint64(7 * j)) & np.uint64(0x7F)
        cont = np.where(nb[m] > j + 1, 0x80, 0).astype(np.uint64)
        out[starts[m] + j] = (byte | cont).astype(np.uint8)
    return out.tobytes()


def varint_decode(buf: bytes, n: int | None = None) -> np.ndarray:
    """Decode LEB128 bytes back to uint64 values (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        if n:
            raise ValueError(f"empty varint stream, expected {n} values")
        return np.empty(0, np.uint64)
    is_last = (b & 0x80) == 0
    n_vals = int(is_last.sum())
    if n is not None and n != n_vals:
        raise ValueError(f"varint stream has {n_vals} values, expected {n}")
    # value id per byte; position of byte within its value
    starts_mask = np.concatenate([[True], is_last[:-1]])
    val_id = np.cumsum(starts_mask) - 1
    starts = np.flatnonzero(starts_mask)
    pos = np.arange(b.size) - starts[val_id]
    vals = np.zeros(n_vals, dtype=np.uint64)
    payload = (b & 0x7F).astype(np.uint64)
    for j in range(int(pos.max()) + 1):
        m = pos == j
        vals[val_id[m]] |= payload[m] << np.uint64(7 * j)
    return vals


# ---------------------------------------------------------------- deltas ----
def delta_encode(sorted_doc_ids: np.ndarray) -> tuple[int, np.ndarray]:
    """-> (first_value, gaps[1:]) for a strictly increasing int64 array."""
    d = np.asarray(sorted_doc_ids, dtype=np.int64)
    if d.size == 0:
        raise ValueError("empty posting list")
    gaps = np.diff(d)
    if gaps.size and gaps.min() <= 0:
        raise ValueError("doc_ids must be strictly increasing")
    return int(d[0]), gaps.astype(np.uint64)


def delta_decode(first: int, gaps: np.ndarray) -> np.ndarray:
    out = np.empty(gaps.size + 1, dtype=np.int64)
    out[0] = first
    if gaps.size:
        out[1:] = first + np.cumsum(gaps.astype(np.int64))
    return out


# ---------------------------------------------------------------- blocks ----
def encode_blocks(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    doclens: np.ndarray,
    idf: float,
    k1: float,
    b: float,
    avgdl: float,
    block_size: int = BLOCK_SIZE,
) -> list[dict]:
    """Split one term's docID-sorted postings into compressed blocks.

    ``max_score`` is the exact maximum BM25 contribution of the term within
    the block (computed from tf and the posting's true doclen), the block-max
    metadata driving BMW pruning (SURVEY.md §2.8 O1). Because idf > 0 and
    multiplication by a positive constant is monotone in IEEE float64,
    ``max_score == idf * max_tf_norm`` exactly — so a merge pass that learns
    the true global df later can rewrite max_score without decoding postings.
    """
    from nmr_fair_dos_ray.search.bm25 import bm25_tf_norm

    blocks = []
    for s in range(0, doc_ids.size, block_size):
        e = min(s + block_size, doc_ids.size)
        d = doc_ids[s:e]
        t = tfs[s:e]
        tf_norm = bm25_tf_norm(t, doclens[s:e], k1, b, avgdl)
        max_tf_norm = float(tf_norm.max())
        first, gaps = delta_encode(d)
        blocks.append(
            {
                "doc_base": int(d[0]),
                "doc_last": int(d[-1]),
                "n": int(e - s),
                "max_score": idf * max_tf_norm,
                "max_tf_norm": max_tf_norm,
                "docs": varint_encode(gaps),
                "tfs": varint_encode(t.astype(np.uint64)),
            }
        )
    return blocks


def decode_block(block: dict) -> tuple[np.ndarray, np.ndarray]:
    """-> (doc_ids int64, tfs int64) of one block."""
    gaps = varint_decode(block["docs"], block["n"] - 1)
    doc_ids = delta_decode(block["doc_base"], gaps)
    tfs = varint_decode(block["tfs"], block["n"]).astype(np.int64)
    return doc_ids, tfs
