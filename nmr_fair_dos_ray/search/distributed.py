"""Term-sharded distributed serving: shard actors + scatter-gather router.

The multi-node serving layout promised by the engine design (SURVEY.md §2.5
"index-shard actors", BASELINE.json north_star "actor pool holding
memory-mapped index shards"): each :class:`ShardActor` holds ONLY the shard
files whose ``shard_id % pool_size`` equals its slot (plus its slice of the
finalized hot-term shard, routed by the same key), so index memory is
partitioned — not replicated — across the pool, and capacity scales by
adding actors/nodes.

A query routes each term to the one actor owning it (``term_hash %
num_shards % pool_size``), scatters one ``score_terms`` call per involved
actor, and gathers per-term ``(doc_id, contribution)`` arrays. The router
accumulates them in sorted term order — the same accumulation order as the
local TAAT/BMW paths and the oracle — so results are bit-identical to a
single-process search. Doc lengths and global stats are broadcast once via
``ray.put`` (zero-copy views from the node's object store).

Latency note: scatter-gather returns whole per-term contribution lists; for
Zipf-head terms the actors cap work by (a) the same decoded-postings LRU the
local reader uses and (b) contributions being computed vectorized. A
block-max pushdown (actors returning only blocks that can beat a routed
threshold) is the natural next refinement and needs no layout change.
"""

from __future__ import annotations

import json
import os
from collections import defaultdict

import numpy as np

import ray

from nmr_fair_dos_ray.search.bm25 import bm25_idf, bm25_term_scores
from nmr_fair_dos_ray.tokenizer import Tokenizer, term_hash_one


def _doclen_state(index_dir: str):
    """(doc_ids_sorted, doclens_sorted, manifest) — the broadcast side."""
    import pyarrow.parquet as pq

    with open(os.path.join(index_dir, "manifest.json")) as f:
        manifest = json.load(f)
    docs = pq.read_table(
        os.path.join(index_dir, "docs"), columns=["doc_id", "doclen"],
        memory_map=True,
    )
    ids = docs["doc_id"].to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="stable")
    return ids[order], docs["doclen"].to_numpy(zero_copy_only=False)[order], manifest


@ray.remote
class ShardActor:
    """Holds the posting lists of its shard slice; scores terms on demand."""

    def __init__(self, index_dir: str, slot: int, pool_size: int, doclen_ref):
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from nmr_fair_dos_ray.codec import decode_block

        self._decode_block = decode_block
        # top-level ObjectRef args are auto-resolved by Ray; accept both
        state = (
            ray.get(doclen_ref)
            if isinstance(doclen_ref, ray.ObjectRef)
            else doclen_ref
        )
        ids, lens, manifest = state
        self._doc_ids_sorted = ids
        self._doclens_sorted = lens
        n = ids.size
        self._dense = bool(n and ids[-1] - ids[0] == n - 1)
        self._dense_base = int(ids[0]) if n else 0
        stats = manifest["stats"]
        cfg = manifest["config"]
        self.n_docs = int(stats["n_docs"])
        self.avgdl = float(stats["avgdl"])
        self.k1, self.b = float(cfg["k1"]), float(cfg["b"])
        self.num_shards = int(cfg["num_shards"])

        shards_dir = os.path.join(index_dir, "shards")
        self._terms: dict[str, dict] = {}
        for p in sorted(os.listdir(shards_dir)):
            if not p.endswith(".parquet"):
                continue
            if p.startswith("shard_hot"):
                t = pq.read_table(os.path.join(shards_dir, p), memory_map=True)
                th = t["term_hash"].to_numpy(zero_copy_only=False).view(np.uint64)
                mine = (th % np.uint64(self.num_shards)) % np.uint64(pool_size) == slot
                t = t.filter(pa.array(mine))
            else:
                sid = int(p[len("shard_"):-len(".parquet")])
                if sid % pool_size != slot:
                    continue
                t = pq.read_table(os.path.join(shards_dir, p), memory_map=True)
            for term, df, blocks in zip(
                t["term"].to_pylist(),
                t["df"].to_numpy(zero_copy_only=False),
                t["blocks"].to_pylist(),
            ):
                self._terms[term] = {"df": int(df), "blocks": blocks}
        self._cache: dict[str, tuple[np.ndarray, np.ndarray]] = {}

    def _doclens(self, doc_ids: np.ndarray) -> np.ndarray:
        if self._dense:
            return self._doclens_sorted[doc_ids - self._dense_base]
        return self._doclens_sorted[np.searchsorted(self._doc_ids_sorted, doc_ids)]

    def score_terms(self, terms: list[str]) -> dict:
        """{term: (doc_ids, contributions)} for the terms this actor owns."""
        out = {}
        for term in terms:
            e = self._terms.get(term)
            if e is None:
                continue
            hit = self._cache.get(term)
            if hit is None:
                ds, ts = [], []
                for blk in e["blocks"]:
                    d, f = self._decode_block(blk)
                    ds.append(d)
                    ts.append(f)
                docs = np.concatenate(ds)
                tfs = np.concatenate(ts)
                idf = bm25_idf(e["df"], self.n_docs)
                scores = bm25_term_scores(
                    tfs, self._doclens(docs), idf, self.k1, self.b, self.avgdl
                )
                hit = (docs, scores)
                if len(self._cache) >= 128:
                    self._cache.pop(next(iter(self._cache)))
                self._cache[term] = hit
            out[term] = hit
        return out

    def term_count(self) -> int:
        return len(self._terms)

    def exact_docs(self, term: str) -> np.ndarray:
        e = self._terms.get(term)
        if e is None:
            return np.empty(0, np.int64)
        return np.concatenate([self._decode_block(b)[0] for b in e["blocks"]])


class ShardedSearcher:
    """Scatter-gather top-k over a :class:`ShardActor` pool."""

    def __init__(self, index_dir: str, pool_size: int = 4):
        with open(os.path.join(index_dir, "manifest.json")) as f:
            manifest = json.load(f)
        cfg = manifest["config"]
        self.tokenizer = Tokenizer(cfg["tokenizer_mode"])
        self.num_shards = int(cfg["num_shards"])
        self.pool_size = pool_size
        doclen_ref = ray.put(_doclen_state(index_dir))
        self.actors = [
            ShardActor.remote(index_dir, slot, pool_size, doclen_ref)
            for slot in range(pool_size)
        ]

    def _route(self, term: str) -> int:
        return (term_hash_one(term) % self.num_shards) % self.pool_size

    def search(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        terms, exact = self.tokenizer.tokenize_query(query)
        # exact filters route like any term
        allowed: np.ndarray | None = None
        for t in exact:
            docs = ray.get(self.actors[self._route(t)].exact_docs.remote(t))
            allowed = docs if allowed is None else np.intersect1d(allowed, docs)
        if not terms:
            if allowed is None:
                return []
            return [(int(d), 0.0) for d in np.sort(allowed)[:k]]

        by_actor: dict[int, list[str]] = defaultdict(list)
        for t in terms:  # sorted unique (tokenize_query guarantees)
            by_actor[self._route(t)].append(t)
        futures = {
            slot: self.actors[slot].score_terms.remote(ts)
            for slot, ts in by_actor.items()
        }
        gathered: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        for slot, fut in futures.items():
            gathered.update(ray.get(fut))
        parts = [gathered[t] for t in terms if t in gathered]
        if not parts:
            return []
        uniq = np.unique(np.concatenate([d for d, _ in parts]))
        acc = np.zeros(uniq.size, np.float64)
        for docs, scores in parts:  # sorted term order ⇒ bit-equal to TAAT
            acc[np.searchsorted(uniq, docs)] += scores
        if allowed is not None:
            m = np.isin(uniq, allowed)
            uniq, acc = uniq[m], acc[m]
        if uniq.size == 0:
            return []
        order = np.lexsort((uniq, -acc))[: min(k, uniq.size)]
        return [(int(uniq[i]), float(acc[i])) for i in order]

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []
