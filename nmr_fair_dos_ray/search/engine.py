"""Query serving: index reader + BM25 top-k (TAAT and block-max WAND).

Engine analog of the reference's read path
(reference: src/nmr_FAIR_DOs/connectors/elasticsearch.py:234-313
``searchForPID``: `multi_match best_fields` top-1 + exact-equality
verification). Generalized to top-k; the exact-equality check becomes exact
field terms (``repo:<v>``, ``path:<v>``, …) whose postings intersect the
candidate set — a cheap conjunctive filter served from the same index.

Serving model (SURVEY.md §2.5 "index-shard actors"): ``QueryScorer`` is a
callable class for ``ds.map_batches(QueryScorer, concurrency=N)`` — the index
(shard parquet read with ``memory_map=True``) and doclen arrays load once per
actor in ``__init__``; each batch of queries scores against actor-local
state. On a multi-node cluster the same class shards by ``term_hash %
num_shards`` with scatter-gather across shard actors; in this sandbox each
actor holds all shards of the (small) fixture index.

Determinism: scores are float64; per-doc accumulation order is the
lexicographic order of the unique query terms in BOTH algorithms, so TAAT,
BMW and the pure-Python oracle produce bit-identical scores
(SURVEY.md §7.3 item 1). Tie-break: (score desc, doc_id asc).
"""

from __future__ import annotations

import heapq
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from nmr_fair_dos_ray.codec import decode_block
from nmr_fair_dos_ray.search.bm25 import bm25_idf, bm25_one, bm25_term_scores
from nmr_fair_dos_ray.tokenizer import Tokenizer


class IndexReader:
    """Loads an index directory built by ``pipelines.index_build``."""

    def __init__(self, index_dir: str):
        with open(os.path.join(index_dir, "manifest.json")) as f:
            self.manifest = json.load(f)
        cfg = self.manifest["config"]
        self.tokenizer = Tokenizer(cfg["tokenizer_mode"])
        self.k1 = float(cfg["k1"])
        self.b = float(cfg["b"])
        stats = self.manifest["stats"]
        self.n_docs = int(stats["n_docs"])
        self.avgdl = float(stats["avgdl"])

        # term -> {"df": int, "blocks": list[dict]}
        self.terms: dict[str, dict] = {}
        shards_dir = os.path.join(index_dir, "shards")
        if os.path.isdir(shards_dir):
            for p in sorted(os.listdir(shards_dir)):
                if not p.endswith(".parquet"):
                    continue
                t = pq.read_table(os.path.join(shards_dir, p), memory_map=True)
                terms = t["term"].to_pylist()
                dfs = t["df"].to_numpy(zero_copy_only=False)
                blocks_col = t["blocks"].to_pylist()
                for term, df, blocks in zip(terms, dfs, blocks_col):
                    self.terms[term] = {"df": int(df), "blocks": blocks}

        # doclen lookup: sorted doc_id array + parallel doclen array
        docs_dir = os.path.join(index_dir, "docs")
        docs = pq.read_table(docs_dir, columns=["doc_id", "doclen"], memory_map=True)
        order = np.argsort(docs["doc_id"].to_numpy(zero_copy_only=False), kind="stable")
        self._doc_ids_sorted = docs["doc_id"].to_numpy(zero_copy_only=False)[order]
        self._doclens_sorted = docs["doclen"].to_numpy(zero_copy_only=False)[order]

    def doclens(self, doc_ids: np.ndarray) -> np.ndarray:
        pos = np.searchsorted(self._doc_ids_sorted, doc_ids)
        return self._doclens_sorted[pos]

    def postings(self, term: str) -> tuple[np.ndarray, np.ndarray]:
        """Full decoded (doc_ids, tfs) of a term (doc_id-sorted)."""
        e = self.terms.get(term)
        if e is None:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        ds, ts = [], []
        for blk in e["blocks"]:
            d, f = decode_block(blk)
            ds.append(d); ts.append(f)
        return np.concatenate(ds), np.concatenate(ts)

    def idf(self, term: str) -> float:
        e = self.terms.get(term)
        return bm25_idf(e["df"], self.n_docs) if e else 0.0


class _Cursor:
    """Block-wise posting cursor for WAND (decodes blocks lazily)."""

    __slots__ = ("term", "idf", "blocks", "bi", "pi", "docs", "tfs", "ub", "exhausted")

    def __init__(self, term: str, idf: float, blocks: list[dict]):
        self.term = term
        self.idf = idf
        self.blocks = blocks
        self.bi = 0
        self.pi = 0
        self.exhausted = not blocks
        self.ub = max((b["max_score"] for b in blocks), default=0.0)  # global UB
        self._load()

    def _load(self) -> None:
        if self.exhausted:
            self.docs = np.empty(0, np.int64)
            self.tfs = np.empty(0, np.int64)
            return
        self.docs, self.tfs = decode_block(self.blocks[self.bi])
        self.pi = 0

    @property
    def doc(self) -> int:
        return int(self.docs[self.pi]) if not self.exhausted else 1 << 62

    @property
    def tf(self) -> int:
        return int(self.tfs[self.pi])

    def block_max(self) -> float:
        return self.blocks[self.bi]["max_score"] if not self.exhausted else 0.0

    def next_geq(self, target: int) -> None:
        """Advance to the first posting with doc_id >= target (skip blocks)."""
        if self.exhausted:
            return
        while self.blocks[self.bi]["doc_last"] < target:
            self.bi += 1
            if self.bi >= len(self.blocks):
                self.exhausted = True
                return
            self._load()
        if self.docs[self.pi] < target:
            self.pi = int(np.searchsorted(self.docs, target, side="left"))
            if self.pi >= len(self.docs):  # cannot happen: doc_last >= target
                self.exhausted = True

    def advance(self) -> None:
        self.pi += 1
        if self.pi >= len(self.docs):
            self.bi += 1
            if self.bi >= len(self.blocks):
                self.exhausted = True
            else:
                self._load()


class Searcher:
    """Top-k BM25 search over an :class:`IndexReader`."""

    def __init__(self, reader: IndexReader):
        self.r = reader

    # ------------------------------------------------------------------ api
    def search(self, query: str, k: int = 10, algorithm: str = "bmw") -> list[tuple[int, float]]:
        """-> [(doc_id, score)] ranked by (score desc, doc_id asc), ≤ k rows.

        ``field:value`` atoms are conjunctive exact filters; remaining terms
        are BM25-ranked. Exact-only queries return matches ordered by doc_id
        with score 0.0 (the reference's exact-verification path,
        elasticsearch.py:295-306, needs no relevance order).
        """
        terms, exact = self.r.tokenizer.tokenize_query(query)
        allowed = self._exact_candidates(exact)
        if not terms:
            if allowed is None:
                return []
            docs = np.sort(allowed)[:k]
            return [(int(d), 0.0) for d in docs]
        if algorithm == "taat":
            return self._taat(terms, k, allowed)
        if algorithm == "bmw":
            return self._bmw(terms, k, allowed)
        raise ValueError(f"unknown algorithm {algorithm!r}")

    def _exact_candidates(self, exact_terms: list[str]) -> np.ndarray | None:
        """Intersection of exact-field posting lists (None = no filter)."""
        allowed: np.ndarray | None = None
        for t in exact_terms:
            docs, _ = self.r.postings(t)
            allowed = docs if allowed is None else np.intersect1d(allowed, docs)
        return allowed

    # ----------------------------------------------------------------- taat
    def _taat(self, terms: list[str], k: int, allowed: np.ndarray | None) -> list[tuple[int, float]]:
        """Term-at-a-time, fully vectorized.

        One vectorized add per term, applied in sorted term order (indices are
        unique within a term, so ``acc[pos] += scores`` is well-defined) ⇒
        per-doc addition order equals the sorted term order ⇒ bit-equal to
        BMW and to the pure-Python oracle.
        """
        r = self.r
        doc_parts, score_parts = [], []
        for t in terms:  # already sorted unique
            docs, tfs = r.postings(t)
            if docs.size == 0:
                continue
            idf = r.idf(t)
            scores = bm25_term_scores(tfs, r.doclens(docs), idf, r.k1, r.b, r.avgdl)
            doc_parts.append(docs)
            score_parts.append(scores)
        if not doc_parts:
            return []
        uniq = np.unique(np.concatenate(doc_parts))
        acc = np.zeros(uniq.size, np.float64)
        for docs, scores in zip(doc_parts, score_parts):
            acc[np.searchsorted(uniq, docs)] += scores
        if allowed is not None:
            m = np.isin(uniq, allowed)
            uniq, acc = uniq[m], acc[m]
        if uniq.size == 0:
            return []
        kk = min(k, uniq.size)
        # rank by (score desc, doc_id asc): lexsort with doc desc then score asc, reversed
        order = np.lexsort((uniq, -acc))[:kk]
        return [(int(uniq[i]), float(acc[i])) for i in order]

    # ------------------------------------------------------------------ bmw
    def _bmw(self, terms: list[str], k: int, allowed: np.ndarray | None) -> list[tuple[int, float]]:
        """Block-max WAND (Ding & Suel 2011 structure, simplified shallow moves).

        Maintains a size-k heap keyed (score, -doc_id); candidates arrive in
        increasing doc_id, so pruning at ``ub <= threshold`` preserves the
        (score desc, doc_id asc) tie-break exactly.
        """
        r = self.r
        cursors = [
            _Cursor(t, r.idf(t), r.terms[t]["blocks"]) for t in terms if t in r.terms
        ]
        cursors = [c for c in cursors if not c.exhausted]
        if not cursors:
            return []
        allowed_set = None
        if allowed is not None:
            allowed_set = allowed  # sorted np array; membership via searchsorted
        heap: list[tuple[float, int]] = []  # (score, -doc_id), min-heap of k best

        def threshold() -> float:
            return heap[0][0] if len(heap) >= k else -1.0

        while True:
            live = [c for c in cursors if not c.exhausted]
            if not live:
                break
            live.sort(key=lambda c: c.doc)
            # pivot: first prefix whose global-UB sum reaches threshold
            ub_sum = 0.0
            pivot_idx = -1
            th = threshold()
            for i, c in enumerate(live):
                ub_sum += c.ub
                if ub_sum > th:
                    pivot_idx = i
                    break
            if pivot_idx < 0:
                break  # no candidate can beat threshold
            pivot_doc = live[pivot_idx].doc
            if live[0].doc == pivot_doc:
                # block-max refinement: exact UB from current blocks
                bm_sum = 0.0
                for c in live:
                    if c.doc > pivot_doc:
                        break
                    c.next_geq(pivot_doc)  # aligns block for block_max
                    if not c.exhausted and c.doc <= pivot_doc:
                        pass
                for c in live:
                    if not c.exhausted and c.doc == pivot_doc:
                        bm_sum += c.block_max()
                if bm_sum > th:
                    ok = allowed_set is None or _in_sorted(allowed_set, pivot_doc)
                    if ok:
                        score = 0.0
                        for c in sorted(
                            (c for c in live if not c.exhausted and c.doc == pivot_doc),
                            key=lambda c: c.term,
                        ):
                            score += bm25_one(
                                c.tf, int(r.doclens(np.array([pivot_doc]))[0]),
                                c.idf, r.k1, r.b, r.avgdl,
                            )
                        if len(heap) < k:
                            heapq.heappush(heap, (score, -pivot_doc))
                        elif (score, -pivot_doc) > heap[0]:
                            heapq.heapreplace(heap, (score, -pivot_doc))
                for c in live:
                    if not c.exhausted and c.doc == pivot_doc:
                        c.advance()
            else:
                # advance the earliest cursor to the pivot doc
                live[0].next_geq(pivot_doc)
        out = sorted(heap, key=lambda s: (-s[0], -s[1]))
        return [(-d, s) for s, d in out]


def _in_sorted(arr: np.ndarray, v: int) -> bool:
    i = np.searchsorted(arr, v)
    return i < arr.size and arr[i] == v


class QueryScorer:
    """Actor-pool stage: batch of queries → top-k rows.

    ``queries_ds.map_batches(QueryScorer, fn_constructor_kwargs={"index_dir": ...},
    concurrency=N, batch_format="pyarrow")`` — index loads once per actor.
    Output schema: (query_id int64, rank int32, doc_id int64, score float64).
    """

    def __init__(self, index_dir: str, k: int = 10, algorithm: str = "bmw"):
        self.searcher = Searcher(IndexReader(index_dir))
        self.k = k
        self.algorithm = algorithm

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docs, scores = [], [], [], []
        ks = batch["k"].to_pylist() if "k" in batch.column_names else [self.k] * batch.num_rows
        for qid, query, k in zip(
            batch["query_id"].to_pylist(), batch["query"].to_pylist(), ks
        ):
            hits = self.searcher.search(query, k=int(k or self.k), algorithm=self.algorithm)
            for rank, (doc, score) in enumerate(hits, 1):
                qids.append(qid); ranks.append(rank); docs.append(doc); scores.append(score)
        return pa.table(
            {
                "query_id": pa.array(qids, pa.int64()),
                "rank": pa.array(ranks, pa.int32()),
                "doc_id": pa.array(docs, pa.int64()),
                "score": pa.array(scores, pa.float64()),
            }
        )
