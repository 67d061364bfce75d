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

The reader keeps the index Arrow/numpy-resident: term lookup is one dict
probe; block metadata (doc_base/doc_last/max_score) are flat numpy arrays
with per-term offsets; compressed posting bytes stay in the Arrow buffers
read (memory-mapped) from the shard files, decoded per block on demand.

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
import pyarrow.compute as pc
import pyarrow.parquet as pq

from nmr_fair_dos_ray.codec import varint_decode

_MISS = object()  # sentinel distinguishing "not cached" from "cached None"
from nmr_fair_dos_ray.search.bm25 import bm25_idf, bm25_term_scores
from nmr_fair_dos_ray.tokenizer import Tokenizer


class _TermsView:
    """Dict-like lazy view over the reader's term table (compat surface:
    ``term in r.terms``, ``set(r.terms)``, ``r.terms[t]["df"/"blocks"]``)."""

    def __init__(self, reader: "IndexReader"):
        self._r = reader

    def __contains__(self, term: str) -> bool:
        return self._r._lookup(term) is not None

    def __iter__(self):
        return iter(self._r._terms_arr.to_pylist())

    def __len__(self) -> int:
        return len(self._r._terms_arr)

    def get(self, term: str, default=None):
        return self[term] if term in self else default

    def __getitem__(self, term: str) -> dict:
        r = self._r
        tid = r._lookup(term)
        if tid is None:
            raise KeyError(term)
        j0, j1 = int(r._boff[tid]), int(r._boff[tid + 1])
        blocks = [
            {
                "doc_base": int(r._b_base[j]),
                "doc_last": int(r._b_last[j]),
                "n": int(r._b_n[j]),
                "max_score": float(r._b_max[j]),
                "max_tf_norm": float(r._b_maxtf[j]),
                "docs": r._b_docs[j].as_py(),
                "tfs": r._b_tfs[j].as_py(),
            }
            for j in range(j0, j1)
        ]
        return {"df": int(r._df[tid]), "blocks": blocks}

    def items(self):
        for term in self:
            yield term, self[term]


class IndexReader:
    """Loads an index directory built by ``pipelines.index_build``.

    ``IndexReader(index_dir)`` loads locally; ``reader.to_state()`` returns a
    flat dict of Arrow/numpy arrays suitable for ``ray.put`` — actors on the
    same node then reconstruct readers with ``IndexReader.from_state(state)``
    as ZERO-COPY views over the shared object-store copy (one index copy per
    node, regardless of pool size). Term lookup is a binary search over the
    lexicographic permutation — no per-reader Python dict.
    """

    #: byte budgets for the positional LRUs (per reader). Sized so a
    #: realistic hot phrase vocabulary (~100 hot terms × a few MB of decoded
    #: positions each) stays resident on a serving actor without competing
    #: with the shard slice itself.
    POSITIONS_CACHE_BUDGET = 256 * 1024 * 1024
    P_ENDS_CACHE_BUDGET = 64 * 1024 * 1024
    P_KEYS_CACHE_BUDGET = 256 * 1024 * 1024
    #: global composite-key stride for cached phrase keys (doc*K + pos).
    #: Bounds any doc's token-stream positions: 4M positions per doc, and
    #: 10^12 docs × 2^22 still fits int64. Terms whose streams exceed it
    #: fall back to the per-query candidate path (checked at build time).
    POS_KEY_STRIDE = 1 << 22

    def __init__(
        self,
        index_dir: str | None = None,
        *,
        state: dict | None = None,
        cache_budget_bytes: int | None = None,
    ):
        if cache_budget_bytes is not None:
            # scale the three positional-cache ceilings to a caller-chosen
            # total (default 576 MB) — serving deployments with many actors
            # per node bound the per-node aggregate via budget / pool_size
            total = self.POSITIONS_CACHE_BUDGET + self.P_ENDS_CACHE_BUDGET \
                + self.P_KEYS_CACHE_BUDGET
            f = max(0.0, cache_budget_bytes / total)
            self.POSITIONS_CACHE_BUDGET = int(self.POSITIONS_CACHE_BUDGET * f)
            self.P_ENDS_CACHE_BUDGET = int(self.P_ENDS_CACHE_BUDGET * f)
            self.P_KEYS_CACHE_BUDGET = int(self.P_KEYS_CACHE_BUDGET * f)
        if state is None:
            state = self.build_state(index_dir)
        self._state = state
        self._init_from_state(state)

    @classmethod
    def from_state(
        cls, state: dict, *, cache_budget_bytes: int | None = None
    ) -> "IndexReader":
        return cls(None, state=state, cache_budget_bytes=cache_budget_bytes)

    def to_state(self) -> dict:
        return self._state

    @staticmethod
    def build_state(
        index_dir: str,
        *,
        slot: int | None = None,
        pool_size: int | None = None,
        load_docs: bool = True,
        doc_range: tuple[int, int] | None = None,
    ) -> dict:
        """Build the Arrow/numpy state dict for a local reader — or, with
        ``slot``/``pool_size``, for ONE term-sharded serving slot: only shard
        files with ``shard_id % pool_size == slot`` are read, and hot-shard
        rows are filtered by the same routing key, so a ShardActor holds
        ~1/pool_size of the index in the SAME zero-copy layout the local
        reader uses (no dict-of-pylists; VERDICT round-1 item 8).
        ``load_docs=False`` skips the doclen table for callers that inject a
        broadcast copy.

        ``doc_range=(lo, hi)`` builds a DOC-PARTITIONED slice instead (the
        ES/Lucene shard model — all terms, the doc_ids in ``[lo, hi)``):
        per term, only the posting BLOCKS intersecting the range are kept
        (block doc_base/doc_last metadata prunes without decoding), the
        positional stream is byte-trimmed at the kept-block boundary,
        champion lists are filtered to the range, and the doclen table /
        tombstone segments load statistics-pruned to the kept blocks'
        physical span. Boundary blocks are kept WHOLE (streams stay
        aligned); their out-of-range postings are masked at query time by
        :meth:`deleted_mask` — exactly the tombstone mechanism, so every
        query path inherits the range. Global stats (n_docs, avgdl, df)
        stay corpus-wide: per-doc scores are bit-equal to the full local
        reader's. Mutually exclusive with ``slot``."""
        if doc_range is not None and slot is not None:
            raise ValueError("doc_range and slot sharding are exclusive")
        with open(os.path.join(index_dir, "manifest.json")) as f:
            manifest = json.load(f)
        num_shards = int(manifest["config"]["num_shards"])
        shards_dir = os.path.join(index_dir, "shards")
        tables = []
        if os.path.isdir(shards_dir):
            for p in sorted(os.listdir(shards_dir)):
                if not p.endswith(".parquet"):
                    continue
                if slot is not None and not p.startswith("shard_hot"):
                    sid = int(p[len("shard_"):-len(".parquet")])
                    if sid % pool_size != slot:
                        continue
                t = pq.read_table(os.path.join(shards_dir, p), memory_map=True)
                if slot is not None and p.startswith("shard_hot"):
                    th = t["term_hash"].to_numpy(zero_copy_only=False).view(np.uint64)
                    mine = (th % np.uint64(num_shards)) % np.uint64(pool_size) == slot
                    t = t.filter(pa.array(mine))
                tables.append(t)
        t = pa.concat_tables(tables).combine_chunks() if tables else None
        st: dict = {"manifest": manifest, "c_off": None, "c_docs": None}
        st["c_tfn"] = None
        if t is not None and "champ_docs" in t.column_names:
            # champion lists (index built with champion_m > 0): per-term
            # impact-ordered doc_ids + their stored tf_norm, used to floor
            # BMW's top-k threshold before traversal (idf * tfn is bit-exactly
            # the term's score contribution for that doc)
            champ = t["champ_docs"].combine_chunks()
            st["c_off"] = champ.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            st["c_docs"] = champ.flatten().to_numpy(zero_copy_only=False)
            st["c_tfn"] = (
                t["champ_tfn"].combine_chunks().flatten()
                .to_numpy(zero_copy_only=False)
            )
        st["pos_stream"] = (
            t["pos_stream"].combine_chunks()
            if t is not None and "pos_stream" in t.column_names else None
        )
        if t is None or t.num_rows == 0:
            st.update(
                terms=pa.array([], pa.string()),
                order=np.empty(0, np.int64),
                df=np.empty(0, np.int64),
                boff=np.zeros(1, np.int64),
                b_base=np.empty(0, np.int64), b_last=np.empty(0, np.int64),
                b_n=np.empty(0, np.int32),
                b_max=np.empty(0, np.float64), b_maxtf=np.empty(0, np.float64),
                b_docs=pa.array([], pa.binary()), b_tfs=pa.array([], pa.binary()),
            )
        else:
            terms = t["term"].combine_chunks()
            blocks = t["blocks"].combine_chunks()
            flat = blocks.flatten()
            st.update(
                terms=terms,
                order=pc.sort_indices(terms).to_numpy(zero_copy_only=False).astype(np.int64),
                df=t["df"].to_numpy(zero_copy_only=False),
                boff=blocks.offsets.to_numpy(zero_copy_only=False).astype(np.int64),
                b_base=flat.field("doc_base").to_numpy(zero_copy_only=False),
                b_last=flat.field("doc_last").to_numpy(zero_copy_only=False),
                b_n=flat.field("n").to_numpy(zero_copy_only=False),
                b_max=flat.field("max_score").to_numpy(zero_copy_only=False),
                b_maxtf=flat.field("max_tf_norm").to_numpy(zero_copy_only=False),
                b_docs=flat.field("docs"),
                b_tfs=flat.field("tfs"),
            )
        if doc_range is not None:
            st = _slice_state_to_doc_range(st, int(doc_range[0]), int(doc_range[1]))
        if load_docs:
            docs_dir = os.path.join(index_dir, "docs")
            filters = None
            if doc_range is not None:
                plo, phi = st["phys_range"]
                # statistics-pruned read: only files/row groups whose doc_id
                # range intersects the slice's physical span are opened
                filters = [("doc_id", ">=", int(plo)), ("doc_id", "<=", int(phi))]
            docs = pq.read_table(docs_dir, columns=["doc_id", "doclen"],
                                 memory_map=True, filters=filters)
            ids = docs["doc_id"].to_numpy(zero_copy_only=False)
            order = np.argsort(ids, kind="stable")
            st["doc_ids_sorted"] = ids[order]
            st["doclens_sorted"] = docs["doclen"].to_numpy(zero_copy_only=False)[order]
        # tombstones (document deletes, pipelines/lifecycle.py): a sorted
        # doc_id set masked out of every search path. Loaded even for
        # term-sharded serving slots — the set is tiny relative to the index
        # (it is cleared by compaction) and every slot must honor it.
        # Segmented layout (one immutable file per delete call, doc-id range
        # in the filename) so concurrent deletes never lose updates and
        # range-scoped readers can prune segments unopened.
        from nmr_fair_dos_ray.pipelines.lifecycle import read_tombstones

        if doc_range is not None:
            plo, phi = st["phys_range"]
            arr = read_tombstones(index_dir, lo=int(plo), hi=int(phi))
        else:
            arr = read_tombstones(index_dir)
        st["tomb"] = arr if arr.size else None
        return st

    def _init_from_state(self, st: dict) -> None:
        self.manifest = st["manifest"]
        cfg = self.manifest["config"]
        self.tokenizer = Tokenizer(cfg["tokenizer_mode"])
        self.k1 = float(cfg["k1"])
        self.b = float(cfg["b"])
        stats = self.manifest["stats"]
        self.n_docs = int(stats["n_docs"])
        self.avgdl = float(stats["avgdl"])
        self._terms_arr = st["terms"]
        self._order = st["order"]
        self._df = st["df"]
        self._boff = st["boff"]
        self._b_base = st["b_base"]
        self._b_last = st["b_last"]
        self._b_n = st["b_n"]
        self._b_max = st["b_max"]
        self._b_maxtf = st["b_maxtf"]
        self._b_docs = st["b_docs"]
        self._b_tfs = st["b_tfs"]
        self._c_off = st.get("c_off")
        self._c_docs = st.get("c_docs")
        self._c_tfn = st.get("c_tfn")
        ps = st.get("pos_stream")
        self._p_offs, self._p_data = _binary_views(ps) if ps is not None else (None, None)
        # raw byte views for vectorized multi-block decode: consecutive
        # blocks' byte streams are contiguous in the (combined) value buffer,
        # so a term's whole posting list decodes in ONE varint pass
        self._docs_offs, self._docs_data = _binary_views(self._b_docs)
        self._tfs_offs, self._tfs_data = _binary_views(self._b_tfs)
        self._postings_cache: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        # decoded-positions LRU, BYTE-budgeted (entry-count LRUs thrash as
        # soon as the hot vocabulary exceeds the count — a 40-phrase working
        # set touches ~80 terms — and every "warm" query re-decodes)
        self._positions_cache: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        self._positions_cache_bytes = 0
        # derived positional skip index per term: byte END offset of every
        # varint value in the term's positional stream (one vectorized
        # high-bit scan) — lets a selective phrase decode ONLY candidate
        # postings instead of the whole hot-term stream
        self._p_ends_cache: dict[str, np.ndarray] = {}
        self._p_ends_cache_bytes = 0
        # cached full composite key arrays (doc*POS_KEY_STRIDE + pos) — the
        # reusable phrase-intersection operand for hot terms: a warm phrase
        # query is then ONE sorted merge per adjacent term, no per-query
        # key rebuild (the dominant warm cost before this cache)
        self._p_keys_cache: dict[str, np.ndarray | None] = {}
        self._p_keys_cache_bytes = 0
        # positional touch counts: first touch seek-decodes (cold phrase
        # stays cheap), repeat touches full-decode into the LRU so hot
        # terms subset from cache instead of re-seeking every query
        self._p_touch: dict[str, int] = {}
        self._prefix_cache: dict[str, list[str]] = {}
        self.blocks_decoded = 0  # cumulative; see _decode_range
        self._tid_cache: dict[str, int | None] = {}
        self._tomb = st.get("tomb")  # sorted unique np.int64 doc_ids or None
        # doc-partitioned slice bounds [lo, hi): boundary-block postings
        # outside the range are masked by deleted_mask, like tombstones
        self._doc_range = st.get("doc_range")
        # per-max_edits SymSpell deletion index: (sorted variant-hash int64,
        # term id int64) — 16 B/entry, Levenshtein-verified so hash
        # collisions are harmless (see expand_fuzzy)
        self._fuzzy_del: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self.terms = _TermsView(self)
        self._doc_ids_sorted = st["doc_ids_sorted"]
        self._doclens_sorted = st["doclens_sorted"]
        n = self._doc_ids_sorted.size
        self._dense_base = int(self._doc_ids_sorted[0]) if n else 0
        # doclen lookup table: direct indexing by (doc_id - base). Exact for a
        # contiguous id range (fresh build: zero-copy view of doclens_sorted);
        # for a GAPPY range (post-compaction: ids 0..N-1 minus ~10% dead) a
        # hole-filled copy is built whenever live ids cover >= 1/4 of the
        # span — measured 1.2x qps vs the per-call searchsorted this replaces
        # (compacted sf-bench index: 52 -> 62 qps). Holes hold doclen 0; both
        # paths assume looked-up ids exist in the index, so holes are only
        # ever touched by tombstoned ids whose scores are masked out anyway.
        self._doclen_lut: np.ndarray | None = None
        if n:
            span = int(self._doc_ids_sorted[-1]) - self._dense_base + 1
            if span == n:
                self._doclen_lut = self._doclens_sorted
            elif n >= span // 4:
                lut = np.zeros(span, self._doclens_sorted.dtype)
                lut[self._doc_ids_sorted - self._dense_base] = self._doclens_sorted
                self._doclen_lut = lut

    def _lookup(self, term: str) -> int | None:
        """term -> row index, by binary search over the sorted permutation."""
        hit = self._tid_cache.get(term, _MISS)
        if hit is not _MISS:
            return hit
        lo, hi = 0, self._order.size
        arr, order = self._terms_arr, self._order
        tid: int | None = None
        while lo < hi:
            mid = (lo + hi) // 2
            v = arr[int(order[mid])].as_py()
            if v < term:
                lo = mid + 1
            elif v > term:
                hi = mid
            else:
                tid = int(order[mid])
                break
        if len(self._tid_cache) >= 4096:
            self._tid_cache.pop(next(iter(self._tid_cache)))
        self._tid_cache[term] = tid
        return tid

    # ----------------------------------------------------------------- api
    def doclens(self, doc_ids: np.ndarray) -> np.ndarray:
        if self._doclen_lut is not None:
            return self._doclen_lut[doc_ids - self._dense_base]
        pos = np.searchsorted(self._doc_ids_sorted, doc_ids)
        return self._doclens_sorted[pos]

    def _decode(self, j: int) -> tuple[np.ndarray, np.ndarray]:
        """Decode global block ``j`` -> (doc_ids, tfs)."""
        return self._decode_range(j, j + 1)

    def _decode_range(self, j0: int, j1: int) -> tuple[np.ndarray, np.ndarray]:
        """Decode blocks [j0, j1) of ONE term in a single vectorized pass.

        The gap streams of consecutive blocks are contiguous bytes, so one
        ``varint_decode`` recovers every gap; block-boundary deltas are
        reconstructed from the stored doc_base/doc_last metadata
        (``base[j] - last[j-1]``) and one cumsum yields all doc_ids.
        """
        self.blocks_decoded += j1 - j0  # deterministic work counter (bench)
        ns = self._b_n[j0:j1].astype(np.int64)
        total = int(ns.sum())
        gaps = varint_decode(
            self._docs_data[self._docs_offs[j0] : self._docs_offs[j1]].tobytes(),
            total - (j1 - j0),
        )
        full = np.empty(total, np.int64)
        bstarts = np.concatenate([[0], np.cumsum(ns)[:-1]])
        mask = np.ones(total, bool)
        mask[bstarts] = False
        full[mask] = gaps.astype(np.int64)
        bases = self._b_base[j0:j1]
        lasts = self._b_last[j0:j1]
        full[bstarts[0]] = bases[0]
        if j1 - j0 > 1:
            full[bstarts[1:]] = bases[1:] - lasts[:-1]
        doc_ids = np.cumsum(full)
        tfs = varint_decode(
            self._tfs_data[self._tfs_offs[j0] : self._tfs_offs[j1]].tobytes(),
            total,
        ).astype(np.int64)
        return doc_ids, tfs

    def deleted_mask(self, docs: np.ndarray) -> np.ndarray | None:
        """Which of ``docs`` are tombstoned (deleted) OR outside this
        reader's doc-partition range — bool mask, or None when nothing
        masks.

        Delete semantics (Lucene-style, pipelines/lifecycle.py): tombstoned
        docs are excluded from every result set, but global stats (df, n_docs,
        avgdl) stay FROZEN until a rebuild — live docs keep bit-identical
        scores through delete and compaction. A doc-partitioned slice
        (``build_state(doc_range=...)``) masks its boundary blocks'
        out-of-range postings through the SAME seam, so every query path
        that honors deletes honors the range too."""
        if docs.size == 0:
            return None
        t = self._tomb
        hit: np.ndarray | None = None
        if t is not None:
            pos = np.searchsorted(t, docs)
            hit = pos < t.size
            hit[hit] = t[pos[hit]] == docs[hit]
        dr = self._doc_range
        if dr is not None:
            oob = (docs < dr[0]) | (docs >= dr[1])
            hit = oob if hit is None else (hit | oob)
        return hit if hit is not None and hit.any() else None

    def postings(self, term: str) -> tuple[np.ndarray, np.ndarray]:
        """Full decoded (doc_ids, tfs) of a term (doc_id-sorted, tombstoned
        docs removed); small LRU keeps the Zipf head decoded across queries
        of a serving actor."""
        hit = self._postings_cache.get(term)
        if hit is not None:
            return hit
        tid = self._lookup(term)
        if tid is None:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        out = self._decode_range(int(self._boff[tid]), int(self._boff[tid + 1]))
        dm = self.deleted_mask(out[0])
        if dm is not None:
            keep = ~dm
            out = (out[0][keep], out[1][keep])
        if len(self._postings_cache) >= 256:
            self._postings_cache.pop(next(iter(self._postings_cache)))
        self._postings_cache[term] = out
        return out

    def idf(self, term: str) -> float:
        tid = self._lookup(term)
        return bm25_idf(int(self._df[tid]), self.n_docs) if tid is not None else 0.0

    @property
    def has_positions(self) -> bool:
        return self._p_offs is not None

    def terms_with_prefix(self, prefix: str) -> list[str]:
        """All index terms starting with ``prefix`` (e.g. ``"lang:"`` for
        facet-value enumeration) — one vectorized C++ scan, memoized."""
        hit = self._prefix_cache.get(prefix)
        if hit is None:
            mask = pc.starts_with(self._terms_arr, pattern=prefix)
            hit = sorted(self._terms_arr.filter(mask).to_pylist())
            if len(self._prefix_cache) >= 64:
                self._prefix_cache.pop(next(iter(self._prefix_cache)))
            self._prefix_cache[prefix] = hit
        return hit

    def expand_prefix(
        self, prefix: str, max_expansions: int | None = None
    ) -> list[str]:
        """Index terms starting with ``prefix``, for prefix-query rewrite
        (the ES ``prefix`` / ``match_phrase_prefix`` rewrite step — the
        reference's ES backend answers these from the same term dictionary).

        Synthetic exact-field terms (``lang:…``) are excluded unless the
        prefix itself is field-scoped (contains ``:``). With
        ``max_expansions`` the expansion keeps the top terms by (df desc,
        term asc) — ES's ``top_terms_N`` rewrite — re-sorted ascending so
        scoring stays in sorted-unique-term order (bit-equal to an explicit
        multi-term query). Deterministic either way."""
        terms = self.terms_with_prefix(prefix)
        if ":" not in prefix:
            terms = [t for t in terms if ":" not in t]
        if max_expansions is not None and len(terms) > max_expansions:
            dfs = np.array([int(self._df[self._lookup(t)]) for t in terms])
            order = np.lexsort((np.array(terms), -dfs))[:max_expansions]
            terms = sorted(np.array(terms)[order].tolist())
        return terms

    def expand_regex(
        self, pattern: str, max_expansions: int | None = None
    ) -> list[str]:
        """Index terms whose WHOLE text matches ``pattern`` (the ES
        ``regexp``/``wildcard`` query's anchored semantics), for a
        regex-query rewrite onto the scored-disjunction primitives.

        One vectorized ``pc.match_substring_regex`` scan over the Arrow
        term dictionary with an anchored pattern — no per-term Python.
        Synthetic exact-field terms are excluded; the ``max_expansions``
        cap keeps the top terms by (df desc, term asc) then re-sorts
        ascending, exactly like :meth:`expand_prefix`. Invalid patterns
        raise ``ValueError``."""
        try:
            hits = pc.match_substring_regex(
                self._terms_arr, f"^(?:{pattern})$"
            ).to_numpy(zero_copy_only=False)
        except pa.lib.ArrowInvalid as e:
            raise ValueError(f"invalid regex pattern {pattern!r}: {e}") from e
        terms = sorted(
            t for t in self._terms_arr.take(
                pa.array(np.flatnonzero(hits))
            ).to_pylist()
            if ":" not in t
        )
        if max_expansions is not None and len(terms) > max_expansions:
            dfs = np.array([int(self._df[self._lookup(t)]) for t in terms])
            order = np.lexsort((np.array(terms), -dfs))[:max_expansions]
            terms = sorted(np.array(terms)[order].tolist())
        return terms

    def expand_fuzzy(self, term: str, max_edits: int = 1) -> list[str]:
        """Index terms within Levenshtein distance ``max_edits`` of ``term``
        (the ES ``fuzziness`` expansion), via a SymSpell-style deletion
        index: if lev(a, b) ≤ e then some ≤e-deletion variant of a equals
        one of b, so candidates = dictionary terms sharing a deletion
        variant, verified with the true (plain, transposition-free)
        distance — the same metric DuckDB's ``levenshtein()`` computes, so
        the expansion is SQL-oracle-checkable.

        The deletion index builds lazily ONCE per reader (i.e. once per
        serving actor — the stateful-stage pattern) over this reader's term
        dictionary; term-sharded serving slots each index only their ~1/P of
        the dictionary, so build cost and memory shard with the terms.

        Memory bound (VERDICT round-4 item 3): variants are stored as two
        sorted numpy arrays (variant HASH uint64, term id int64 — 16 B per
        entry) instead of a Python dict of strings (~100+ B per entry, the
        round-3 layout that was vocabulary-unbounded in practice). Hash
        collisions can only ADD candidates, and every candidate is verified
        with the true Levenshtein distance, so expansions are identical."""
        if max_edits not in (1, 2):
            raise ValueError("max_edits must be 1 or 2")
        idx = self._fuzzy_del.get(max_edits)
        if idx is None:
            hashes: list[int] = []
            tids: list[int] = []
            for tid in range(len(self._terms_arr)):
                t = self._terms_arr[tid].as_py()
                if ":" in t:
                    continue
                for v in _deletion_variants(t, max_edits):
                    # process-salted str hash is fine: the index is built
                    # and queried within one reader's lifetime
                    hashes.append(hash(v))
                    tids.append(tid)
            h = np.array(hashes, np.int64)
            ts = np.array(tids, np.int64)
            o = np.argsort(h, kind="stable")
            idx = (h[o], ts[o])
            self._fuzzy_del[max_edits] = idx
        q = term.lower()
        h_idx, t_idx = idx
        qh = np.array(
            sorted({hash(v) for v in _deletion_variants(q, max_edits)}),
            np.int64,
        )
        lo = np.searchsorted(h_idx, qh, side="left")
        hi = np.searchsorted(h_idx, qh, side="right")
        cand_ids: set[int] = set()
        for a, b in zip(lo, hi):
            cand_ids.update(t_idx[a:b].tolist())
        out = []
        for tid in cand_ids:
            t = self._terms_arr[tid].as_py()
            if _levenshtein_leq(q, t, max_edits):
                out.append(t)
        return sorted(out)

    def positions(
        self, term: str, candidates: np.ndarray | None = None
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray] | None:
        """Decoded positional postings of ``term``:
        ``(doc_ids, list_offsets, positions_flat)`` where doc ``doc_ids[i]``'s
        positions are ``positions_flat[list_offsets[i]:list_offsets[i+1]]``
        (ascending, 0-based in the doc's token stream).

        ``candidates`` (sorted LIVE doc_ids, e.g. the intersection of the
        phrase terms' masked posting lists) restricts the result — and,
        when the candidate set is selective, the DECODE — to the candidate
        postings: a derived skip index (byte end-offset of every varint
        value in the term's stream, one vectorized high-bit scan, cached
        per term) lets the decoder seek straight to each candidate
        posting's byte span, so a hot term's stream is never wholesale
        entropy-decoded for a selective phrase. Non-selective candidate
        sets subset the (cached) full decode instead.

        Returns ``None`` when the index stores no positions, the term is
        absent, or the term is a synthetic exact-field term (those live
        outside the token stream and store an empty stream).
        """
        if self._p_offs is None:
            return None
        hit = self._positions_cache.get(term)
        if hit is not None:
            # true LRU, not FIFO: refresh recency so a term hit on every
            # query isn't evicted just because it was inserted early
            self._positions_cache[term] = self._positions_cache.pop(term)
            return hit if candidates is None else _subset_positions(hit, candidates)
        tid = self._lookup(term)
        if tid is None:
            return None
        # RAW decode (tombstones NOT applied): the positional stream's value
        # counts follow the stored tfs, so offset arithmetic must run over
        # the physical postings; deleted docs are masked from the triple last
        docs, tfs = self._decode_range(int(self._boff[tid]), int(self._boff[tid + 1]))
        lo, hi = int(self._p_offs[tid]), int(self._p_offs[tid + 1])
        if hi == lo:
            if docs.size:
                return None  # field term: postings but no stream
            return docs, np.zeros(1, np.int64), np.empty(0, np.int64)
        if candidates is not None:
            touched = self._p_touch.get(term, 0)
            if len(self._p_touch) > 65536:
                self._p_touch.clear()
            self._p_touch[term] = touched + 1
            # first touch: seek-decode candidates only (a cold phrase never
            # pays a hot term's full stream). Repeat touch: fall through to
            # the full decode + LRU so subsequent queries subset from cache.
            if touched == 0 and candidates.size * 4 < docs.size:
                return self._positions_selective(term, docs, tfs, lo, hi, candidates)
        vals = varint_decode(
            self._p_data[lo:hi].tobytes(), int(tfs.sum())
        ).astype(np.int64)
        offsets = np.concatenate([[0], np.cumsum(tfs)])
        starts = offsets[:-1]
        # segmented cumsum: each posting's first value is absolute, the rest
        # are gaps — one global cumsum + per-segment correction
        c = np.cumsum(vals)
        adjust = c[starts] - vals[starts]
        pos = c - np.repeat(adjust, tfs)
        dm = self.deleted_mask(docs)
        if dm is not None:
            keep = ~dm
            pos = pos[np.repeat(keep, tfs)]
            docs, tfs = docs[keep], tfs[keep]
            offsets = np.concatenate([[0], np.cumsum(tfs)])
        out = (docs, offsets, pos)
        nb = docs.nbytes + offsets.nbytes + pos.nbytes
        if nb <= self.POSITIONS_CACHE_BUDGET:
            while (self._positions_cache and
                   self._positions_cache_bytes + nb > self.POSITIONS_CACHE_BUDGET):
                old = self._positions_cache.pop(next(iter(self._positions_cache)))
                self._positions_cache_bytes -= sum(a.nbytes for a in old)
            self._positions_cache[term] = out
            self._positions_cache_bytes += nb
        return out if candidates is None else _subset_positions(out, candidates)

    def position_keys(self, term: str) -> np.ndarray | None:
        """Cached composite key array ``doc * POS_KEY_STRIDE + position``
        over the term's FULL (tombstone-masked) positional postings —
        strictly increasing int64, the reusable operand of the hot-phrase
        fast path (adjacency = one sorted merge of ``keysA + 1`` with
        ``keysB``; matched docs = ``keys // POS_KEY_STRIDE``).

        Returns ``None`` when positions are unavailable for the term or a
        doc's positions exceed the stride (pathological token streams fall
        back to the per-query candidate path)."""
        km = self.position_keys_with_max(term)
        return None if km is None else km[0]

    def position_keys_with_max(
        self, term: str
    ) -> tuple[np.ndarray, int] | None:
        """(cached composite keys, max position in any doc) — the proximity
        hot path needs the max to guard its slop window against cross-doc
        bleed (window reaches ``key - slop - 1``; safe iff
        ``maxpos + slop + 2 <= POS_KEY_STRIDE``)."""
        if term in self._p_keys_cache:
            km = self._p_keys_cache.pop(term)  # LRU: refresh recency
            self._p_keys_cache[term] = km
            return km
        p = self.positions(term)
        if p is None:
            km = None
        else:
            docs, offs, flat = p
            maxpos = int(flat.max()) if flat.size else 0
            if maxpos >= self.POS_KEY_STRIDE - 1:
                km = None
            else:
                km = (
                    np.repeat(docs, np.diff(offs)) * self.POS_KEY_STRIDE + flat,
                    maxpos,
                )
        nb = 0 if km is None else km[0].nbytes
        if nb <= self.P_KEYS_CACHE_BUDGET:
            while (self._p_keys_cache and
                   self._p_keys_cache_bytes + nb > self.P_KEYS_CACHE_BUDGET):
                old = self._p_keys_cache.pop(next(iter(self._p_keys_cache)))
                self._p_keys_cache_bytes -= 0 if old is None else old[0].nbytes
            self._p_keys_cache[term] = km
            self._p_keys_cache_bytes += nb
        return km

    def _positions_selective(
        self, term: str, docs: np.ndarray, tfs: np.ndarray,
        lo: int, hi: int, candidates: np.ndarray,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Seek-decode ONLY the candidate postings' positional values.

        ``docs``/``tfs`` are the RAW (unmasked) postings — the stream's
        per-posting value counts follow the physical layout. ``candidates``
        must be sorted live doc_ids (already tombstone-masked), so the
        result needs no delete mask. Cost: one cached high-bit scan of the
        stream (the skip index) + a gather/decode proportional to the
        CANDIDATES' values — not the term's df.
        """
        seg = self._p_data[lo:hi]
        ends = self._p_ends_cache.get(term)
        if ends is not None:
            self._p_ends_cache[term] = self._p_ends_cache.pop(term)  # LRU
        if ends is None:
            # byte end-offset of every varint value (high bit clear = last
            # byte of a value) — the derived skip structure
            ends = np.flatnonzero((seg & 0x80) == 0).astype(np.int64)
            if ends.nbytes <= self.P_ENDS_CACHE_BUDGET:
                while (self._p_ends_cache and
                       self._p_ends_cache_bytes + ends.nbytes
                       > self.P_ENDS_CACHE_BUDGET):
                    old = self._p_ends_cache.pop(next(iter(self._p_ends_cache)))
                    self._p_ends_cache_bytes -= old.nbytes
                self._p_ends_cache[term] = ends
                self._p_ends_cache_bytes += ends.nbytes
        idx, ok = sorted_lookup(candidates, docs)
        sel = idx[ok]
        if sel.size == 0:
            return (np.empty(0, np.int64), np.zeros(1, np.int64),
                    np.empty(0, np.int64))
        vstart = np.concatenate([[0], np.cumsum(tfs)])
        v0, v1 = vstart[sel], vstart[sel + 1]
        bstart = np.where(v0 == 0, 0, ends[v0 - 1] + 1)
        blen = (ends[v1 - 1] + 1) - bstart
        total = int(blen.sum())
        cum = np.concatenate([[0], np.cumsum(blen)[:-1]])
        flat = (np.repeat(bstart, blen) + np.arange(total, dtype=np.int64)
                - np.repeat(cum, blen))
        ctfs = tfs[sel]
        vals = varint_decode(seg[flat].tobytes(), int(ctfs.sum())).astype(np.int64)
        offsets = np.concatenate([[0], np.cumsum(ctfs)])
        starts = offsets[:-1]
        c = np.cumsum(vals)
        adjust = c[starts] - vals[starts]
        pos = c - np.repeat(adjust, ctfs)
        return docs[sel], offsets, pos

    @property
    def has_champions(self) -> bool:
        return self._c_docs is not None and self._c_off is not None

    def champions(self, tid: int) -> np.ndarray:
        """Impact-ordered champion doc_ids of term ``tid`` (may be empty)."""
        return self._c_docs[self._c_off[tid] : self._c_off[tid + 1]]

    def tfs_at(self, term: str, docs: np.ndarray) -> np.ndarray:
        """tf of ``term`` at each of the SORTED ``docs`` (0 where absent),
        decoding only the blocks that contain a requested doc — random access
        for small candidate sets (champion seeding) without a full-list
        decode."""
        out = np.zeros(docs.size, np.int64)
        tid = self._lookup(term)
        if tid is None or docs.size == 0:
            return out
        cached = self._postings_cache.get(term)
        if cached is not None:
            d, f = cached
            pos = np.searchsorted(d, docs)
            ok = pos < d.size
            ok[ok] = d[pos[ok]] == docs[ok]
            out[ok] = f[pos[ok]]
            return out
        j0, j1 = int(self._boff[tid]), int(self._boff[tid + 1])
        lasts = self._b_last[j0:j1]
        bi = np.searchsorted(lasts, docs)  # block whose doc_last >= doc
        valid = bi < (j1 - j0)
        for blk in np.unique(bi[valid]):
            d, f = self._decode(j0 + int(blk))
            sel = np.flatnonzero(valid & (bi == blk))
            pos = np.searchsorted(d, docs[sel])
            ok = pos < d.size
            ok[ok] = d[pos[ok]] == docs[sel][ok]
            out[sel[ok]] = f[pos[ok]]
        dm = self.deleted_mask(docs)
        if dm is not None:
            out[dm] = 0  # block path decodes raw; deleted docs read as absent
        return out


def wildcard_to_regex(pattern: str) -> str:
    """ES ``wildcard`` pattern → anchored-regex body: ``*`` → ``.*``,
    ``?`` → ``.``, every other character escaped literally."""
    import re as _re

    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(_re.escape(ch))
    return "".join(out)


def sorted_lookup(a: np.ndarray, sorted_b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """For each element of ``a``: its searchsorted position in sorted-unique
    ``sorted_b`` and whether it is actually present — the shared
    sorted-membership primitive behind intersection, positional subsetting
    and facet counting."""
    idx = np.searchsorted(sorted_b, a)
    ok = idx < sorted_b.size
    ok[ok] = sorted_b[idx[ok]] == a[ok]
    return idx, ok


def sorted_intersect(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Intersection of two SORTED-UNIQUE int arrays via binary search of the
    smaller in the larger — O(min·log max), no concat-and-sort
    (``np.intersect1d`` re-sorts even with ``assume_unique``, which dominated
    hot-phrase latency)."""
    if a.size > b.size:
        a, b = b, a
    if a.size == 0:
        return a
    _, ok = sorted_lookup(a, b)
    return a[ok]


def intersect_doc_sets(postings: dict[str, np.ndarray]) -> np.ndarray:
    """Rarest-list-first intersection of per-term doc sets — shared by the
    local and sharded phrase candidate resolution. Empty result short-
    circuits."""
    inter: np.ndarray | None = None
    for t in sorted(postings, key=lambda t: postings[t].size):
        inter = postings[t] if inter is None else sorted_intersect(
            inter, postings[t]
        )
        if inter.size == 0:
            return inter
    return inter


def topk_counts(
    docs: np.ndarray, counts: np.ndarray, k: int
) -> list[tuple[int, int]]:
    """Rank (doc, count) matches by (count desc, doc asc) and return the
    top-k as int tuples — the shared epilogue of the phrase/proximity
    query methods (local and sharded)."""
    order = np.lexsort((docs, -counts))[:k]
    return [(int(docs[i]), int(counts[i])) for i in order]


def run_length(sorted_vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(distinct values, run counts) of an already-sorted array — no
    re-sort (``np.unique`` sorts again)."""
    first = np.concatenate([[True], sorted_vals[1:] != sorted_vals[:-1]])
    starts = np.flatnonzero(first)
    counts = np.diff(np.concatenate([starts, [sorted_vals.size]]))
    return sorted_vals[starts], counts


def _subset_positions(
    triple: tuple[np.ndarray, np.ndarray, np.ndarray], candidates: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Restrict a decoded (docs, offsets, flat) positional triple to the
    sorted ``candidates`` — pure gather, no re-decode (used when the full
    triple is already in the per-reader LRU)."""
    docs, offs, flat = triple
    idx, ok = sorted_lookup(candidates, docs)
    sel = idx[ok]
    tfs = offs[sel + 1] - offs[sel]
    seg = np.concatenate([[0], np.cumsum(tfs)])
    total = int(seg[-1])
    flat_idx = (np.repeat(offs[sel], tfs)
                + np.arange(total, dtype=np.int64)
                - np.repeat(seg[:-1], tfs))
    return docs[sel], seg, flat[flat_idx]


def phrase_intersect(
    terms: list[str],
    plists: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]],
) -> tuple[np.ndarray, np.ndarray]:
    """Exact-phrase adjacency over decoded positional postings →
    (sorted matching doc_ids, occurrence counts). Pure array math, shared
    by the local searcher and the sharded router (which gathers each term's
    positional postings from its owning shard actor first).

    Composite keys ``doc * K + pos`` (K > any position + 2, so ``key+1`` is
    "next position, same doc" and the arithmetic never overflows int64 even
    at 10^12 docs); one sorted-set intersection per phrase term, no per-doc
    loop."""
    empty = (np.empty(0, np.int64), np.empty(0, np.int64))
    inter: np.ndarray | None = None
    for t in terms:
        inter = (
            plists[t][0] if inter is None
            else sorted_intersect(inter, plists[t][0])
        )
        if inter.size == 0:
            return empty
    K = 2 + max(
        int(plists[t][2].max()) if plists[t][2].size else 0 for t in set(terms)
    )
    # RANK-space keys: docs are replaced by their rank in `inter`
    # (0..|inter|), so keys fit int32 whenever |inter|·K < 2^31 — ~2× faster
    # searchsorted/repeat on the hot pairwise intersection. Doc ids (up to
    # 10^12) never enter the key arithmetic; int64 is the guarded fallback.
    dt = np.int32 if inter.size * K < 2**31 - 2 else np.int64
    _keys = _rank_key_builder(plists, inter, K, dt)

    # composite keys are strictly increasing (docs sorted, positions
    # ascending within a doc), so every step stays a sorted-unique merge
    ends = _keys(terms[0])
    for t in terms[1:]:
        ends = sorted_intersect(ends + dt(1), _keys(t))
        if ends.size == 0:
            return empty
    # run-length over the (sorted) matched ranks — no re-sort
    ranks_m, counts = run_length(ends // dt(K))
    return inter[ranks_m].astype(np.int64, copy=False), counts


def _rank_key_builder(plists, inter: np.ndarray, K: int, dt):
    """term → composite key array ``rank(doc in inter) * K + position``
    (strictly increasing), shared by the phrase and proximity kernels."""
    ranks = np.arange(inter.size, dtype=dt)

    def _keys(t: str) -> np.ndarray:
        docs, offs, flat = plists[t]
        idx = np.searchsorted(docs, inter)
        lens = offs[idx + 1] - offs[idx]
        total = int(lens.sum())
        seg_starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        flat_idx = (
            np.repeat(offs[idx], lens)
            + np.arange(total, dtype=np.int64)
            - np.repeat(seg_starts, lens)
        )
        return (np.repeat(ranks, lens) * dt(K)
                + flat[flat_idx].astype(dt, copy=False))

    return _keys


def near_intersect(
    terms: list[str],
    plists: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]],
    slop: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Ordered proximity ("near") matching over decoded positional
    postings: a doc matches when the query terms occur IN ORDER with each
    consecutive gap ≤ ``slop + 1`` tokens (``slop=0`` = exact adjacency —
    bit-equal to :func:`phrase_intersect`). Returns ``(sorted doc_ids,
    n_chains)`` where n_chains counts DISTINCT chain end positions.

    Reachable-set DP (the any-choice semantics SQL EXISTS joins express —
    greedy picks are NOT sound here because the gap window is bounded on
    both sides): R_i = positions of term i with some R_{i-1} position in
    ``[p - slop - 1, p - 1]``; two vectorized searchsorteds per term over
    composite rank-keys with stride ``K > maxpos + slop + 2`` so windows
    cannot bleed across docs."""
    empty = (np.empty(0, np.int64), np.empty(0, np.int64))
    inter: np.ndarray | None = None
    for t in terms:
        inter = (
            plists[t][0] if inter is None
            else sorted_intersect(inter, plists[t][0])
        )
        if inter.size == 0:
            return empty
    K = slop + 3 + max(
        int(plists[t][2].max()) if plists[t][2].size else 0 for t in set(terms)
    )
    dt = np.int32 if inter.size * K < 2**31 - 2 else np.int64
    _keys = _rank_key_builder(plists, inter, K, dt)
    reach = _keys(terms[0])
    for t in terms[1:]:
        kt = _keys(t)
        lo = np.searchsorted(reach, kt - dt(slop + 1))
        hi = np.searchsorted(reach, kt)  # strict: predecessor < position
        reach = kt[hi > lo]
        if reach.size == 0:
            return empty
    ranks_m, counts = run_length(reach // dt(K))
    return inter[ranks_m].astype(np.int64, copy=False), counts


def near_intersect_unordered(
    terms: list[str],
    plists: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]],
    slop: int,
) -> tuple[np.ndarray, np.ndarray]:
    """UNORDERED proximity matching (the ``ordered=False`` selectable
    analog of Lucene's sloppy-phrase order tolerance): the anchor is the
    LAST distinct query term; an anchor position ``p`` matches when EVERY
    other distinct query term occurs within ``[p - slop - 1, p + slop + 1]``
    — order-free, both directions. For a two-term query this is exactly
    the both-order EXISTS join (``abs(pa - pb) <= slop + 1``), which is how
    the SQL oracle spells it. Duplicate query terms collapse (a documented
    simplification vs Lucene's per-occurrence edit-distance slop). Returns
    ``(sorted doc_ids, n_anchors)`` with n_anchors = distinct qualifying
    anchor positions.

    Distinct terms never share a token position, so the window test needs
    no self-exclusion. Same composite rank-key trick as
    :func:`near_intersect`; ``K >= maxpos + slop + 3`` keeps both window
    edges inside the doc."""
    empty = (np.empty(0, np.int64), np.empty(0, np.int64))
    uniq_ordered = list(dict.fromkeys(terms))
    inter: np.ndarray | None = None
    for t in uniq_ordered:
        inter = (
            plists[t][0] if inter is None
            else sorted_intersect(inter, plists[t][0])
        )
        if inter.size == 0:
            return empty
    K = slop + 3 + max(
        int(plists[t][2].max()) if plists[t][2].size else 0
        for t in uniq_ordered
    )
    dt = np.int32 if inter.size * K < 2**31 - 2 else np.int64
    _keys = _rank_key_builder(plists, inter, K, dt)
    ka = _keys(uniq_ordered[-1])
    mask = np.ones(ka.size, bool)
    for t in uniq_ordered[:-1]:
        kt = _keys(t)
        lo = np.searchsorted(kt, ka - dt(slop + 1))
        hi = np.searchsorted(kt, ka + dt(slop + 2))  # right-inclusive window
        mask &= hi > lo
    ka = ka[mask]
    if ka.size == 0:
        return empty
    ranks_m, counts = run_length(ka // dt(K))
    return inter[ranks_m].astype(np.int64, copy=False), counts


def parse_query_string(query: str) -> list[tuple[str, str, str]]:
    """Tokenize the query-string grammar → ``[(sign, kind, body)]`` where
    sign ∈ {'', '+', '-'} and kind ∈ {'phrase', 'field', 'fuzzy', 'prefix',
    'terms'} (fuzzy body is ``text\\x00edits``; a sloppy phrase
    ``"a b"~N`` encodes as ``text\\x00N`` — consumers ``partition('\\x00')``
    either way). Shared by the local and the sharded query-string searchers
    so both resolve identical atom lists."""
    import re

    from nmr_fair_dos_ray.tokenizer import EXACT_FIELD_PREFIXES

    out: list[tuple[str, str, str]] = []
    for sign, body in re.findall(r'([+-]?)("[^"]*"(?:~\d+)?|\S+)', query):
        if body.startswith('"'):
            m = re.fullmatch(r'"([^"]*)"(?:~(\d+))?', body)
            if m is None:  # unterminated quote: treat as a plain phrase
                out.append((sign, "phrase", body.strip('"')))
                continue
            slop = m.group(2)
            out.append((sign, "phrase",
                        m.group(1) + (f"\x00{slop}" if slop else "")))
            continue
        if body.startswith(EXACT_FIELD_PREFIXES):
            out.append((sign, "field", body))
            continue
        m = re.fullmatch(r"(.+?)~(\d?)", body)
        if m:
            out.append((sign, "fuzzy", m.group(1) + "\x00" + (m.group(2) or "")))
            continue
        if body.endswith("*") and len(body) > 1:
            out.append((sign, "prefix", body[:-1].lower()))
            continue
        out.append((sign, "terms", body))
    return out


def _postings_union(docs_of, terms: list[str]) -> np.ndarray:
    """Union of posting doc_ids over an expansion's terms (sorted unique).
    ``docs_of`` maps term -> doc_id array (local reader postings or a sharded
    per-owner fetch). Empty expansion -> empty array — as a ``must`` that
    correctly yields zero results (required atom matched nothing)."""
    parts = [d for t in terms if (d := docs_of(t)).size]
    if not parts:
        return np.empty(0, np.int64)
    return np.unique(np.concatenate(parts))


def _deletion_variants(term: str, max_edits: int) -> set[str]:
    """The term plus every string reachable by deleting ≤ max_edits chars."""
    out = {term}
    frontier = {term}
    for _ in range(max_edits):
        nxt = set()
        for t in frontier:
            for i in range(len(t)):
                nxt.add(t[:i] + t[i + 1:])
        out |= nxt
        frontier = nxt
    return out


def _levenshtein_leq(a: str, b: str, k: int) -> bool:
    """Plain Levenshtein distance ≤ k (banded DP, no transpositions — the
    same metric as DuckDB/Postgres ``levenshtein``, keeping fuzzy expansion
    SQL-oracle-checkable)."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > k:
        return False
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        lo = max(1, i - k)
        hi = min(lb, i + k)
        if lo > 1:
            cur[lo - 1] = k + 1
        for j in range(lo, hi + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        if hi < lb:
            cur[hi + 1 :] = [k + 1] * (lb - hi)
        prev = cur
        if min(prev[lo - 1 : hi + 1] or [k + 1]) > k:
            return False
    return prev[lb] <= k


def _binary_views(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(value offsets int64, data bytes uint8) views of a BinaryArray."""
    if len(arr) == 0:
        return np.zeros(1, np.int64), np.empty(0, np.uint8)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=np.int32).astype(np.int64)
    offs = offs[arr.offset : arr.offset + len(arr) + 1]
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.empty(0, np.uint8)
    )
    return offs, data


def _slice_state_to_doc_range(st: dict, lo: int, hi: int) -> dict:
    """Slice a full reader state to the doc partition ``[lo, hi)``: keep
    only the posting blocks intersecting the range (whole — boundary bleed
    is masked at query time by ``deleted_mask``), byte-trim each positional
    stream at its kept-block posting boundary, filter champion lists to the
    range, and drop terms with no remaining blocks. Pure metadata
    arithmetic plus varint decodes of the DROPPED prefix blocks' tf streams
    (to count positional values); kept blocks are never re-encoded, so
    decode paths, caches and the cursor machinery behave exactly as in a
    full reader. ``df`` stays the stored GLOBAL value — scores are
    bit-equal to the corpus-wide reader's."""
    boff = st["boff"]
    n_terms = boff.size - 1
    out = dict(st)
    out["doc_range"] = (int(lo), int(hi))
    if n_terms == 0:
        out["phys_range"] = (int(lo), max(int(lo), int(hi) - 1))
        return out
    b_base, b_last = st["b_base"], st["b_last"]
    keep = (b_last >= lo) & (b_base < hi)
    counts_old = np.diff(boff)
    seg = np.repeat(np.arange(n_terms, dtype=np.int64), counts_old)
    counts_new = np.zeros(n_terms, np.int64)
    np.add.at(counts_new, seg[keep], 1)
    term_keep = counts_new > 0

    pos = st["pos_stream"]
    new_pos_list = None
    if pos is not None:
        tfs_offs, tfs_data = _binary_views(st["b_tfs"])
        p_offs, p_data = _binary_views(pos)
        b_n = st["b_n"]
        new_pos_list = []
        for i in np.flatnonzero(term_keep):
            j0, j1 = int(boff[i]), int(boff[i + 1])
            s0, s1 = int(p_offs[i]), int(p_offs[i + 1])
            seg_bytes = p_data[s0:s1]
            ki = keep[j0:j1]
            if s1 == s0 or ki.all():
                new_pos_list.append(seg_bytes.tobytes())
                continue
            k0 = int(np.argmax(ki))
            k1 = len(ki) - int(np.argmax(ki[::-1]))
            n_pre = int(b_n[j0:j0 + k0].sum())
            n_keep_post = int(b_n[j0 + k0:j0 + k1].sum())
            n_vals_pre = int(varint_decode(
                tfs_data[tfs_offs[j0]:tfs_offs[j0 + k0]].tobytes(), n_pre
            ).sum()) if n_pre else 0
            n_vals_keep = int(varint_decode(
                tfs_data[tfs_offs[j0 + k0]:tfs_offs[j0 + k1]].tobytes(),
                n_keep_post,
            ).sum())
            # value-end skip scan (high bit clear = last byte of a varint)
            ends = np.flatnonzero((seg_bytes & 0x80) == 0)
            b0 = 0 if n_vals_pre == 0 else int(ends[n_vals_pre - 1]) + 1
            b1 = int(ends[n_vals_pre + n_vals_keep - 1]) + 1
            new_pos_list.append(seg_bytes[b0:b1].tobytes())

    keep_pa = pa.array(keep)
    tk_pa = pa.array(term_keep)
    out["terms"] = st["terms"].filter(tk_pa)
    out["order"] = (
        pc.sort_indices(out["terms"]).to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    out["df"] = st["df"][term_keep]
    out["boff"] = np.concatenate(
        [[0], np.cumsum(counts_new[term_keep])]
    ).astype(np.int64)
    for kk in ("b_base", "b_last", "b_n", "b_max", "b_maxtf"):
        out[kk] = st[kk][keep]
    out["b_docs"] = st["b_docs"].filter(keep_pa)
    out["b_tfs"] = st["b_tfs"].filter(keep_pa)
    if new_pos_list is not None:
        out["pos_stream"] = pa.array(new_pos_list, type=pos.type)
    if st.get("c_off") is not None:
        c_off, c_docs, c_tfn = st["c_off"], st["c_docs"], st["c_tfn"]
        cmask = (c_docs >= lo) & (c_docs < hi)
        cseg = np.repeat(np.arange(n_terms, dtype=np.int64), np.diff(c_off))
        c_counts = np.zeros(n_terms, np.int64)
        np.add.at(c_counts, cseg[cmask], 1)
        out["c_docs"] = c_docs[cmask]
        out["c_tfn"] = c_tfn[cmask]
        out["c_off"] = np.concatenate(
            [[0], np.cumsum(c_counts[term_keep])]
        ).astype(np.int64)
    kept_base, kept_last = b_base[keep], b_last[keep]
    phys_lo = int(min(lo, kept_base.min())) if kept_base.size else int(lo)
    phys_hi = (
        int(max(hi - 1, kept_last.max())) if kept_last.size
        else max(int(lo), int(hi) - 1)
    )
    out["phys_range"] = (phys_lo, phys_hi)
    return out


class _Cursor:
    """Span-level posting cursor for block-max WAND: skips whole blocks via
    the doc_last skip array and decodes SPANS of blocks (multi-block, one
    vectorized pass) so the scorer's outer loop amortizes over hundreds of
    postings instead of one."""

    __slots__ = ("r", "term", "idf", "j0", "nb", "lasts", "s_lo", "s_hi",
                 "pi", "docs", "tfs", "ub", "exhausted", "_cbi_key", "_cbi_val")

    #: lists longer than this many blocks are decoded whole through the
    #: reader's LRU — Zipf-head terms recur across queries and block
    #: skipping rarely pays on them, while rare lists stay lazily decoded
    CACHE_BLOCKS = 64

    def __init__(self, reader: IndexReader, term: str, tid: int, idf: float):
        self.r = reader
        self.term = term
        self.idf = idf
        self.j0 = int(reader._boff[tid])
        self.nb = int(reader._boff[tid + 1]) - self.j0
        self.lasts = reader._b_last[self.j0 : self.j0 + self.nb]
        self.exhausted = self.nb == 0
        self._cbi_key = (-1, -1)
        self._cbi_val = 0
        self.ub = float(reader._b_max[self.j0 : self.j0 + self.nb].max()) if self.nb else 0.0
        if self.exhausted:
            return
        cached = reader._postings_cache.get(term)
        if cached is None and self.nb > self.CACHE_BLOCKS:
            cached = reader.postings(term)  # decodes once, fills the LRU
        if cached is not None:
            self.docs, self.tfs = cached
            self.s_lo, self.s_hi = 0, self.nb
            self.pi = 0
            # cached postings are MASKED (tombstones / doc-range): a term
            # whose surviving postings are empty must start exhausted
            if self.docs.size == 0:
                self.exhausted = True
        else:
            self._span(0, 1)

    def _span(self, lo: int, hi: int) -> None:
        """Decode blocks [lo, hi) as the resident span; position at start."""
        self.docs, self.tfs = self.r._decode_range(self.j0 + lo, self.j0 + hi)
        self.s_lo, self.s_hi = lo, hi
        self.pi = 0

    @property
    def doc(self) -> int:
        return int(self.docs[self.pi])

    def _cbi(self) -> int:
        """Block index (absolute, 0-based within term) of the current doc.
        Memoized on (s_lo, pi): bound() and span_max() both need it within
        one BMW iteration, and cursors often do not move between iterations
        — this halves the per-iteration searchsorted count."""
        key = (self.s_lo, self.pi)
        if key != self._cbi_key:
            self._cbi_val = self.s_lo + int(
                np.searchsorted(self.lasts[self.s_lo : self.s_hi], self.docs[self.pi])
            )
            self._cbi_key = key
        return self._cbi_val

    def bound(self, span: int) -> int:
        """doc_last of the block ``span`` blocks ahead of the current one —
        the candidate range end for range-at-a-time processing."""
        b = self._cbi()
        return int(self.lasts[min(b + span - 1, self.nb - 1)])

    def span_max(self, hi: int) -> float:
        """Max block max_score over blocks intersecting [current_doc, hi]."""
        b = self._cbi()
        e = b + int(np.searchsorted(self.lasts[b : self.nb], hi, side="left")) + 1
        e = min(e, self.nb)
        return float(self.r._b_max[self.j0 + b : self.j0 + e].max())

    def next_geq(self, target: int) -> None:
        """Advance to the first posting with doc_id >= target (block skip)."""
        if self.exhausted or self.docs[self.pi] >= target:
            return
        if target <= self.lasts[self.s_hi - 1]:
            pi = int(np.searchsorted(self.docs, target, side="left"))
            if pi < self.docs.size:
                self.pi = pi
                return
            # MASKED cached postings (tombstones / doc-range) can end
            # before the raw doc_last metadata — exhaust instead of
            # pointing past the array (raw spans always contain a posting
            # up to their doc_last, so they never reach here)
            if self.s_hi >= self.nb:
                self.exhausted = True
                return
        nbi = int(np.searchsorted(self.lasts, target, side="left"))
        if nbi >= self.nb:
            self.exhausted = True
            return
        self._span(nbi, nbi + 1)
        self.pi = int(np.searchsorted(self.docs, target, side="left"))

    def range_take(self, hi: int) -> tuple[np.ndarray, np.ndarray]:
        """Postings with current_doc <= doc_id <= hi (extends the decoded
        span if the range crosses its end)."""
        if hi > self.lasts[self.s_hi - 1]:
            cur = self.docs[self.pi]
            b_hi = int(np.searchsorted(self.lasts, hi, side="left"))
            self._span(self.s_lo, min(b_hi + 1, self.nb))
            self.pi = int(np.searchsorted(self.docs, cur, side="left"))
        j = int(np.searchsorted(self.docs, hi, side="right"))
        return self.docs[self.pi : j], self.tfs[self.pi : j]


#: blocks per scoring range in BMW — amortizes the Python-level outer loop
#: over ~SPAN*128 postings while keeping block-max pruning at span
#: granularity. Swept on the 150k-doc code corpus (k=10, Zipf-heavy
#: queries): 4→32/8→21/16→18.5/32→16/64→21/128→26 ms — pruning loses less
#: than loop amortization gains up to ~32 blocks, then range over-decode
#: dominates. Results are bound-pruned only, so identical at any span.
_SPAN_BLOCKS = 32


class Searcher:
    """Top-k BM25 search over an :class:`IndexReader`.

    ``use_champions`` (default on) engages champion-list threshold flooring
    in BMW when the index was built with ``IndexConfig.champion_m > 0``: for
    each query term, the stored (champion doc, tf_norm) pairs give BIT-EXACT
    per-term score contributions (``idf * tfn``, the same single multiply the
    scorer uses); accumulating them over the union of champion docs yields a
    LOWER BOUND on each candidate's true score (float addition of extra
    non-negative terms is monotone), and the k-th largest such bound is a
    valid initial threshold θ: k real docs have true score ≥ θ, so any doc
    with upper bound < θ can never reach the top-k. Traversal then starts
    with θ instead of -inf — no posting is decoded to compute it, no doc is
    scored twice, the heap logic is untouched. Because θ is
    out-of-traversal-order knowledge, tie handling must not prune equality:
    pivot/prune comparisons become >= / < while a floor is active (strictly
    more conservative), which keeps results bit-identical to the unfloored
    engine including (score desc, doc_id asc) tie-breaks.
    """

    def __init__(self, reader: IndexReader, use_champions: bool = True):
        self.r = reader
        self.use_champions = bool(use_champions) and reader.has_champions

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
            allowed = docs if allowed is None else sorted_intersect(allowed, docs)
        return allowed

    # ---------------------------------------------------------- pagination
    def search_after(
        self, query: str, k: int = 10,
        after: tuple[float, int] | None = None,
    ) -> list[tuple[int, float]]:
        """Cursor pagination (the ES ``search_after`` analog): return the
        next ``k`` hits strictly AFTER ``after = (score, doc_id)`` in the
        global (score desc, doc_id asc) order — stateless, so deep pages
        never recompute-and-discard like from/size offset paging, and
        concurrent index appends can't shift earlier pages.

        Scores are deterministic float64 (bit-equal across TAAT/BMW and the
        SQL oracle), so the cursor — the last hit of the previous page —
        addresses a unique position. Runs the exact TAAT path with a
        vectorized cursor filter; page cost is one full scoring pass
        (same as ES: search_after still scores all matches, it only skips
        the discarded-prefix materialization)."""
        terms, exact = self.r.tokenizer.tokenize_query(query)
        allowed = self._exact_candidates(exact)
        if not terms:
            if allowed is None:
                return []
            docs = np.sort(allowed)
            if after is not None:
                docs = docs[docs > after[1]]
            return [(int(d), 0.0) for d in docs[:k]]
        return self._taat(terms, k, allowed, after=after)

    # --------------------------------------------------------- query string
    def search_query(
        self, query: str, k: int = 10, max_expansions: int | None = None,
        max_edits: int = 1,
    ) -> list[tuple[int, float]]:
        """Unified query-string search (the ES ``query_string`` analog),
        composed from the engine's primitives. Grammar, per whitespace atom:

        ====================  ================================================
        ``term``              scored (disjunctive BM25, the default OR)
        ``+term``             scored AND required (``bool.must``)
        ``-term``             excluded (``bool.must_not``)
        ``"a b"``             exact phrase required (positional index)
        ``"a b"~N``           sloppy phrase (ordered, gaps ≤ N+1 — the
                              :meth:`search_near` semantics), required
        ``-"a b"``            phrase excluded (also with ``~N``)
        ``field:v``           exact filter; ``-field:v`` excludes
        ``pref*``             prefix expansion, scored; ``+pref*`` also
                              REQUIRES a doc to match some expanded term
                              (the union of the expansion's postings joins
                              ``bool.must``); ``-pref*`` excludes that union
        ``term~`` / ``t~2``   fuzzy expansion (≤1 / ≤2 edits), scored;
                              ``+``/``-`` modifiers as for prefix
        ====================  ================================================

        Scoring: one BM25 sum over the union of scored atoms' analyzed /
        expanded terms, accumulated in sorted term order — bit-equal to
        :meth:`search` over the equivalent expanded query. Constraints only
        shape the candidate set (required/phrase/field intersect, negations
        subtract); constraint-only queries return doc_id-ordered matches
        with score 0.0 (the exact-verification convention)."""
        r = self.r
        score_set: set[str] = set()
        musts: list[np.ndarray] = []
        nots: list[np.ndarray] = []
        exact: list[str] = []
        for neg, kind, body in parse_query_string(query):
            if kind == "phrase":
                text, _, slop_s = body.partition("\x00")
                docs, _ = (
                    self._phrase_match(text) if not slop_s
                    else self._near_match(text, int(slop_s))
                )
                (nots if neg == "-" else musts).append(docs)
                if neg != "-":  # phrase terms also contribute to the score
                    score_set.update(r.tokenizer.tokenize(text))
            elif kind == "field":
                if neg == "-":
                    nots.append(r.postings(body)[0])
                else:
                    exact.append(body)
            elif kind in ("fuzzy", "prefix"):
                if kind == "fuzzy":
                    text, _, edits = body.partition("\x00")
                    e = min(max(int(edits or max_edits), 1), 2)
                    exp: set[str] = set()
                    for t in r.tokenizer.tokenize(text):
                        exp.update(r.expand_fuzzy(t, e))
                else:
                    exp = set(r.expand_prefix(body, max_expansions))
                if neg == "-":
                    # exclude any doc matching ANY expanded term
                    nots.append(
                        _postings_union(lambda t: r.postings(t)[0], sorted(exp))
                    )
                else:
                    score_set.update(exp)
                    if neg == "+":  # required: doc must match SOME expansion
                        musts.append(
                            _postings_union(lambda t: r.postings(t)[0], sorted(exp))
                        )
            elif neg == "-":
                for t in r.tokenizer.tokenize(body):
                    nots.append(r.postings(t)[0])
            else:
                toks = r.tokenizer.tokenize(body)
                score_set.update(toks)
                if neg == "+":  # required AND scored
                    for t in toks:
                        musts.append(r.postings(t)[0])

        allowed = self._exact_candidates(exact)
        for docs in musts:
            allowed = docs if allowed is None else sorted_intersect(allowed, docs)
            if allowed.size == 0:
                return []
        forbidden = (
            np.unique(np.concatenate(nots)) if nots else None
        )
        terms = sorted(score_set)
        if not terms:
            if allowed is None:
                return []
            if forbidden is not None and forbidden.size:
                allowed = np.setdiff1d(allowed, forbidden)
            return [(int(d), 0.0) for d in np.sort(allowed)[:k]]
        return self._taat(terms, k, allowed, forbidden)

    # ------------------------------------------------------------- prefix
    def search_prefix(
        self, prefix: str, k: int = 10, max_expansions: int | None = None
    ) -> list[tuple[int, float]]:
        """Prefix-query top-k (ES ``prefix`` with ``rewrite=scoring_boolean``):
        expand ``prefix`` over the term dictionary, score the expanded terms
        as an ordinary disjunction — each with its OWN df/idf, accumulated in
        sorted term order — so results are bit-equal to :meth:`search` over
        a query that spells the expanded terms out. Scale: expansion is one
        memoized vectorized dictionary scan; scoring cost is the expanded
        lists' postings (``max_expansions`` caps it, ES ``top_terms_N``)."""
        terms = self.r.expand_prefix(prefix.strip().lower(), max_expansions)
        if not terms:
            return []
        return self._taat(terms, k, None)

    # -------------------------------------------------------------- regex
    def search_regex(
        self, pattern: str, k: int = 10, max_expansions: int | None = None
    ) -> list[tuple[int, float]]:
        """Regex-query top-k (the ES ``regexp`` query with
        ``rewrite=scoring_boolean``): terms whose whole text matches
        ``pattern`` expand over the dictionary (one vectorized Arrow regex
        scan) and score as an ordinary disjunction in sorted term order —
        bit-equal to :meth:`search` over the expanded terms spelled out,
        and SQL-expressible as ``regexp_matches(term, '^(...)$')`` over
        tokenized docs. ``max_expansions`` caps by (df desc, term asc),
        ES ``top_terms_N``."""
        terms = self.r.expand_regex(pattern, max_expansions)
        if not terms:
            return []
        return self._taat(terms, k, None)

    def search_wildcard(
        self, pattern: str, k: int = 10, max_expansions: int | None = None
    ) -> list[tuple[int, float]]:
        """Wildcard top-k (the ES ``wildcard`` query): ``*`` matches any
        run, ``?`` any single character, everything else literal — rewritten
        onto :meth:`search_regex` (same anchored-expansion + scored
        disjunction, bit-equal to spelling the matches out)."""
        return self.search_regex(wildcard_to_regex(pattern), k, max_expansions)

    # -------------------------------------------------------------- fuzzy
    def search_fuzzy(
        self, query: str, k: int = 10, max_edits: int = 1
    ) -> list[tuple[int, float]]:
        """Fuzzy top-k (ES ``match`` with ``fuzziness``): each analyzed
        query term expands to every index term within ``max_edits``
        Levenshtein edits (SymSpell deletion-index candidates, verified with
        the true distance), and the UNION of expansions scores as a
        disjunction in sorted term order — bit-equal to spelling the matched
        terms out, and SQL-expressible as ``levenshtein(term, q) <= e``."""
        base, exact = self.r.tokenizer.tokenize_query(query)
        allowed = self._exact_candidates(exact)
        expanded: set[str] = set()
        for t in base:
            expanded.update(self.r.expand_fuzzy(t, max_edits))
        if not expanded:
            if allowed is None:
                return []
            return [(int(d), 0.0) for d in np.sort(allowed)[:k]]
        return self._taat(sorted(expanded), k, allowed)

    # ----------------------------------------------------------- conjunctive
    def search_and(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        """Conjunctive BM25 top-k (the ES ``bool.must`` analog; the reference
        delegates boolean retrieval to Elasticsearch,
        src/nmr_FAIR_DOs/connectors/elasticsearch.py:277-306): only docs
        containing EVERY ranked term (and passing ``field:value`` filters)
        are scored. Scores accumulate in sorted term order, so each returned
        score is bit-equal to :meth:`search`'s score for the same doc.
        """
        r = self.r
        terms, exact = r.tokenizer.tokenize_query(query)
        allowed = self._exact_candidates(exact)
        if not terms:
            if allowed is None:
                return []
            return [(int(d), 0.0) for d in np.sort(allowed)[:k]]
        per_term = []
        inter: np.ndarray | None = allowed
        for t in terms:
            docs, tfs = r.postings(t)
            if docs.size == 0:
                return []
            per_term.append((docs, tfs))
            inter = docs if inter is None else sorted_intersect(inter, docs)
            if inter.size == 0:
                return []
        acc = np.zeros(inter.size, np.float64)
        dl = r.doclens(inter)
        for t, (docs, tfs) in zip(terms, per_term):
            sel = tfs[np.searchsorted(docs, inter)]
            acc += bm25_term_scores(sel, dl, r.idf(t), r.k1, r.b, r.avgdl)
        order = np.lexsort((inter, -acc))[: min(k, inter.size)]
        return [(int(inter[i]), float(acc[i])) for i in order]

    # ---------------------------------------------------------------- phrase
    def search_phrase(self, phrase: str, k: int = 10) -> list[tuple[int, int]]:
        """Exact-phrase top-k (the ES ``match_phrase`` analog) over a
        positional index (``IndexConfig.store_positions``). A doc matches
        when the phrase's analyzed terms occupy CONSECUTIVE positions in its
        token stream; ranked by (occurrence count desc, doc_id asc).
        Returns ``[(doc_id, n_occurrences)]``.

        Scale note: work is bounded by the phrase terms' posting lists (the
        standard positional-intersection cost) and is fully vectorized — the
        adjacency check runs across ALL candidate docs at once on composite
        ``doc*K + position`` keys (K > any position, so ``key+1`` is
        "next position, same doc"), one sorted-set intersection per phrase
        term, no per-doc loop. Sharded serving partitions by term, so a
        phrase spanning shards fetches each term's positional postings from
        its owner — same partitioning assumption as ranked search.
        """
        docs_m, counts = self._phrase_match(phrase)
        return topk_counts(docs_m, counts, k)

    def _phrase_match(self, phrase: str) -> tuple[np.ndarray, np.ndarray]:
        """All docs containing the exact phrase → (sorted doc_ids, counts)."""
        r = self.r
        if not r.has_positions:
            raise ValueError(
                "index was built without store_positions=True; phrase search "
                "needs positional postings"
            )
        empty = (np.empty(0, np.int64), np.empty(0, np.int64))
        terms = r.tokenizer.tokenize(phrase)
        if not terms:
            return empty
        # candidate docs first: a phrase match contains EVERY term, so the
        # intersection of the (masked) posting doc sets — rarest list first
        # — bounds the positional work; positions() then seek-decodes only
        # candidate postings instead of whole hot-term streams
        uniq = sorted(set(terms))
        postings: dict[str, np.ndarray] = {}
        for t in uniq:
            d = r.postings(t)[0]
            if d.size == 0:
                return empty  # absent term ⇒ no match
            postings[t] = d
        inter = intersect_doc_sets(postings)
        if inter.size == 0:
            return empty
        if inter.size * 4 >= min(postings[t].size for t in uniq):
            # HOT path (non-selective candidates, e.g. a Zipf-head bigram):
            # per-term composite key arrays are cached, so the whole query
            # is one sorted merge per adjacent term — no per-query key
            # build or subset. Adjacency over the FULL lists is identical
            # (a phrase match contains every term by definition).
            keys: dict[str, np.ndarray] | None = {}
            for t in uniq:
                k = r.position_keys(t)
                if k is None:
                    keys = None  # stride overflow / field term → fallback
                    break
                keys[t] = k
            if keys is not None:
                ends = keys[terms[0]]
                for t in terms[1:]:
                    ends = sorted_intersect(ends + 1, keys[t])
                    if ends.size == 0:
                        return empty
                return run_length(ends // r.POS_KEY_STRIDE)
        plists = self._candidate_plists(uniq, inter, postings)
        if plists is None:
            return empty
        return phrase_intersect(terms, plists)

    def _candidate_plists(
        self, uniq: list[str], inter: np.ndarray,
        postings: dict[str, np.ndarray],
    ) -> dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] | None:
        """Positional triples for the positional kernels — candidate-scoped
        decode only when it actually prunes (for a non-selective hot bigram
        the cached full triple is free and the kernels subset by `inter`
        themselves). None when any term has no token stream."""
        plists = {}
        for t in uniq:
            cand = inter if inter.size * 4 < postings[t].size else None
            p = self.r.positions(t, candidates=cand)
            if p is None:
                return None  # field term: postings but no token stream
            plists[t] = p
        return plists

    # ------------------------------------------------------------ proximity
    def search_near(
        self, phrase: str, k: int = 10, slop: int = 0, ordered: bool = True
    ) -> list[tuple[int, int]]:
        """Proximity top-k (the ES ``match_phrase`` + ``slop`` analog, with
        documented simplified semantics). ``ordered=True`` (default): terms
        must appear IN ORDER with each consecutive gap ≤ ``slop + 1``
        tokens; ``slop=0`` is bit-equal to :meth:`search_phrase`; count =
        distinct chain end positions (:func:`near_intersect`).
        ``ordered=False``: Lucene-style order tolerance — every other
        distinct term within ``slop + 1`` tokens of an anchor (last-term)
        occurrence, either side; count = distinct qualifying anchor
        positions (:func:`near_intersect_unordered`). Both ranked by
        (count desc, doc_id asc) and SQL-expressible as EXISTS-joined
        position inequalities (both-order joins for unordered)."""
        docs_m, counts = self._near_match(phrase, slop, ordered)
        return topk_counts(docs_m, counts, k)

    def _near_match(
        self, phrase: str, slop: int, ordered: bool = True
    ) -> tuple[np.ndarray, np.ndarray]:
        r = self.r
        if not r.has_positions:
            raise ValueError(
                "index was built without store_positions=True; phrase search "
                "needs positional postings"
            )
        empty = (np.empty(0, np.int64), np.empty(0, np.int64))
        terms = r.tokenizer.tokenize(phrase)
        if not terms:
            return empty
        uniq = sorted(set(terms))
        postings = {}
        for t in uniq:
            d = r.postings(t)[0]
            if d.size == 0:
                return empty
            postings[t] = d
        inter = intersect_doc_sets(postings)
        if inter.size == 0:
            return empty
        if inter.size * 4 >= min(postings[t].size for t in uniq):
            # HOT path, same cached keys as phrase: the reachable-set DP
            # runs directly on global doc*STRIDE+pos keys. Safe only when
            # maxpos + slop + 2 <= STRIDE (the slop window reaches
            # key - slop - 1 and must not cross into the previous doc).
            keys: dict[str, np.ndarray] | None = {}
            for t in uniq:
                km = r.position_keys_with_max(t)
                if km is None or km[1] + slop + 2 > r.POS_KEY_STRIDE:
                    keys = None
                    break
                keys[t] = km[0]
            if keys is not None:
                if ordered:
                    reach = keys[terms[0]]
                    for t in terms[1:]:
                        kt = keys[t]
                        lo = np.searchsorted(reach, kt - (slop + 1))
                        hi = np.searchsorted(reach, kt)
                        reach = kt[hi > lo]
                        if reach.size == 0:
                            return empty
                    return run_length(reach // r.POS_KEY_STRIDE)
                # unordered on cached keys: same both-edge window as
                # near_intersect_unordered (edges stay in-doc because
                # maxpos + slop + 2 <= STRIDE was checked above)
                uniq_ordered = list(dict.fromkeys(terms))
                ka = keys[uniq_ordered[-1]]
                mask = np.ones(ka.size, bool)
                for t in uniq_ordered[:-1]:
                    kt = keys[t]
                    lo = np.searchsorted(kt, ka - (slop + 1))
                    hi = np.searchsorted(kt, ka + (slop + 2))
                    mask &= hi > lo
                ka = ka[mask]
                if ka.size == 0:
                    return empty
                return run_length(ka // r.POS_KEY_STRIDE)
        plists = self._candidate_plists(uniq, inter, postings)
        if plists is None:
            return empty
        if ordered:
            return near_intersect(terms, plists, slop)
        return near_intersect_unordered(terms, plists, slop)

    # ---------------------------------------------------------------- facets
    def match_set(self, query: str) -> np.ndarray:
        """Sorted doc_ids MATCHING the analyzed query: union of the ranked
        terms' postings ∩ exact ``field:value`` filters — the candidate set
        behind facet counts and metric aggregations (the ES query context
        without scoring). Empty array when nothing matches."""
        r = self.r
        terms, exact = r.tokenizer.tokenize_query(query)
        allowed = self._exact_candidates(exact)
        matches: np.ndarray | None = None
        if terms:
            parts = [p for t in terms if (p := r.postings(t)[0]).size]
            if not parts:
                return np.empty(0, np.int64)
            matches = np.unique(np.concatenate(parts))
        if allowed is not None:
            matches = allowed if matches is None else sorted_intersect(matches, allowed)
        if matches is None:
            return np.empty(0, np.int64)
        return matches

    def count(self, query: str) -> int:
        """Matching-doc count (the ES ``_count`` API): |match_set| — union
        of ranked-term postings ∩ exact filters, no scoring, no fetch."""
        return int(self.match_set(query).size)

    def facet_counts(self, query: str, facet_field: str) -> list[tuple[str, int]]:
        """Matching-doc counts per value of an exact field (the ES terms-
        aggregation analog; the reference's repository-level rollups run as
        ES aggregations it never reimplements). Match set = union of the
        ranked terms' postings ∩ exact ``field:value`` filters — resolved
        entirely from the index (facet values are the ``field:*`` terms, no
        doc-store scan). Returns ``[(value, n_docs)]`` sorted by value.
        """
        r = self.r
        matches = self.match_set(query)
        if matches.size == 0:
            return []
        prefix = facet_field + ":"
        out: list[tuple[str, int]] = []
        for ft in r.terms_with_prefix(prefix):
            docs, _ = r.postings(ft)
            pos = np.searchsorted(matches, docs)
            ok = pos < matches.size
            n = int((matches[pos[ok]] == docs[ok]).sum())
            if n:
                out.append((ft[len(prefix):], n))
        out.sort(key=lambda v: v[0])
        return out

    # ----------------------------------------------------------------- taat
    def _score_map(
        self, terms: list[str], allowed: np.ndarray | None,
        forbidden: np.ndarray | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """The TAAT accumulation WITHOUT the top-k cut: ``(doc_ids, scores)``
        over every matching doc, doc_id-sorted. Shared by :meth:`_taat` and
        the multi-field ``best_fields`` merge (which needs each field's full
        match map to take the per-doc max)."""
        r = self.r
        empty = (np.empty(0, np.int64), np.empty(0, np.float64))
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
            return empty
        uniq = np.unique(np.concatenate(doc_parts))
        acc = np.zeros(uniq.size, np.float64)
        for docs, scores in zip(doc_parts, score_parts):
            acc[np.searchsorted(uniq, docs)] += scores
        if allowed is not None:
            m = np.isin(uniq, allowed)
            uniq, acc = uniq[m], acc[m]
        if forbidden is not None and forbidden.size and uniq.size:
            m = ~np.isin(uniq, forbidden)
            uniq, acc = uniq[m], acc[m]
        return uniq, acc

    def _taat(
        self, terms: list[str], k: int, allowed: np.ndarray | None,
        forbidden: np.ndarray | None = None,
        after: tuple[float, int] | None = None,
    ) -> list[tuple[int, float]]:
        """Term-at-a-time, fully vectorized.

        One vectorized add per term, applied in sorted term order (indices are
        unique within a term, so ``acc[pos] += scores`` is well-defined) ⇒
        per-doc addition order equals the sorted term order ⇒ bit-equal to
        BMW and to the pure-Python oracle.
        """
        uniq, acc = self._score_map(terms, allowed, forbidden)
        if after is not None and uniq.size:
            a_s, a_d = float(after[0]), int(after[1])
            # strictly after the cursor in (score desc, doc asc) order
            m = (acc < a_s) | ((acc == a_s) & (uniq > a_d))
            uniq, acc = uniq[m], acc[m]
        if uniq.size == 0:
            return []
        kk = min(k, uniq.size)
        # rank by (score desc, doc_id asc): lexsort with doc desc then score asc, reversed
        order = np.lexsort((uniq, -acc))[:kk]
        return [(int(uniq[i]), float(acc[i])) for i in order]

    # ---------------------------------------------------------- champions
    def _champion_floor(
        self, cursors: list["_Cursor"], k: int, allowed: np.ndarray | None
    ) -> float:
        """Initial BMW threshold from champion lists — pure metadata work.

        Accumulates, per champion doc, the exact per-term contributions
        (``idf * stored tf_norm``) over the query terms. Each accumulated
        value is a LOWER bound of the doc's true total (missing terms only
        add), so the k-th largest over ≥ k distinct docs lower-bounds the
        final k-th best score. Returns 0.0 when no valid floor exists
        (fewer than k candidates, or an exact filter active — filtered docs
        can't evidence the final top-k).
        """
        if allowed is not None:
            return 0.0
        r = self.r
        parts_d, parts_s = [], []
        # NOTE: cursors arrive in sorted term order (tokenize_query yields
        # sorted unique terms). The subset sum must accumulate in the SAME
        # relative order as the scorer's full sum — only then is inserting
        # the missing non-negative addends monotone in float64, making acc a
        # true lower bound (a reordered subset can exceed the ordered full
        # sum by an ulp and over-prune a tied winner).
        for c in cursors:
            tid = r._lookup(c.term)
            j0, j1 = int(r._c_off[tid]), int(r._c_off[tid + 1])
            parts_d.append(r._c_docs[j0:j1])
            parts_s.append(c.idf * r._c_tfn[j0:j1])
        cand = np.unique(np.concatenate(parts_d))
        dm = r.deleted_mask(cand)
        if dm is not None:
            # deleted champions cannot evidence the floor (their bound would
            # inflate θ above the true k-th LIVE score and over-prune)
            cand = cand[~dm]
        if cand.size < k:
            return 0.0
        acc = np.zeros(cand.size, np.float64)
        if dm is None:
            for d, s in zip(parts_d, parts_s):
                acc[np.searchsorted(cand, d)] += s
        else:
            for d, s in zip(parts_d, parts_s):
                pos = np.searchsorted(cand, d)
                ok = pos < cand.size
                ok[ok] = cand[pos[ok]] == d[ok]
                acc[pos[ok]] += s[ok]
        return float(np.partition(acc, cand.size - k)[cand.size - k])

    # ------------------------------------------------------------------ bmw
    def _bmw(self, terms: list[str], k: int, allowed: np.ndarray | None) -> list[tuple[int, float]]:
        """Block-max WAND (Ding & Suel 2011), range-vectorized.

        Classic WAND pivoting on global term upper bounds selects the next
        candidate doc; block-max metadata then prunes (or scores) a whole
        doc-id RANGE at a time — the range ending at the earliest current
        block boundary — so scoring inside a surviving range is numpy over
        whole block slices instead of per-posting Python. Pruning decisions
        use only upper bounds, so results are exactly the TAAT ranking
        (bit-equal scores, same (score desc, doc_id asc) tie-break).
        """
        r = self.r
        cursors = []
        for t in terms:
            tid = r._lookup(t)
            if tid is not None:
                c = _Cursor(r, t, tid, r.idf(t))
                if not c.exhausted:
                    cursors.append(c)
        if not cursors:
            return []
        heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap of k best
        floor = self._champion_floor(cursors, k, allowed) if self.use_champions else 0.0
        tie_safe = floor > 0.0  # out-of-order threshold ⇒ >= / < comparisons

        while True:
            live = [c for c in cursors if not c.exhausted]
            if not live:
                break
            live.sort(key=lambda c: c.doc)
            th = heap[0][0] if len(heap) >= k else -1.0
            if th < floor:
                th = floor
            # pivot: first prefix whose global-UB sum exceeds threshold
            ub_sum = 0.0
            pivot_idx = -1
            for i, c in enumerate(live):
                ub_sum += c.ub
                if ub_sum > th or (tie_safe and ub_sum == th):
                    pivot_idx = i
                    break
            if pivot_idx < 0:
                break  # no remaining doc can beat the threshold
            pivot_doc = live[pivot_idx].doc
            if live[0].doc < pivot_doc:
                for c in live[:pivot_idx]:
                    c.next_geq(pivot_doc)  # block-level skip
                continue
            # every live cursor is at doc >= pivot_doc; process a doc-id
            # RANGE ending at the earliest cursor's span bound (~SPAN blocks)
            # so pruning checks and scoring amortize over whole block spans
            # before the heap fills no range can be pruned, so take bigger
            # strides; once a real threshold exists, narrow for pruning
            span = _SPAN_BLOCKS if th > 0.0 else 4 * _SPAN_BLOCKS
            range_end = min(c.bound(span) for c in live)
            involved = [c for c in live if c.doc <= range_end]
            bm_sum = sum(c.span_max(range_end) for c in involved)
            if bm_sum < th or (not tie_safe and bm_sum == th):
                for c in involved:
                    c.next_geq(range_end + 1)
                continue
            # score the whole range vectorized, in sorted term order
            parts = []
            for c in sorted(involved, key=lambda c: c.term):
                d, f = c.range_take(range_end)
                if d.size:
                    parts.append((c.idf, d, f))
            if parts:
                uniq = np.unique(np.concatenate([d for _, d, _ in parts]))
                acc = np.zeros(uniq.size, np.float64)
                for idf, d, f in parts:
                    sc = bm25_term_scores(f, r.doclens(d), idf, r.k1, r.b, r.avgdl)
                    acc[np.searchsorted(uniq, d)] += sc
                if allowed is not None:
                    m = np.isin(uniq, allowed)
                    uniq, acc = uniq[m], acc[m]
                dm = r.deleted_mask(uniq)
                if dm is not None:
                    # span decodes are raw; deleted docs must never enter the
                    # heap (a dead doc in the heap inflates θ and can prune a
                    # live doc that belongs in the final top-k)
                    uniq, acc = uniq[~dm], acc[~dm]
                if uniq.size:
                    # docs below the current threshold can never enter the
                    # final top-k (when heap < k, ≥ k docs scoring ≥ floor
                    # are guaranteed to exist and will be scored) — ties kept
                    thresh = heap[0][0] if len(heap) >= k else floor
                    if thresh > 0.0:
                        keep = acc >= thresh
                        uniq, acc = uniq[keep], acc[keep]
                    for d, s in zip(uniq.tolist(), acc.tolist()):
                        item = (s, -d)
                        if len(heap) < k:
                            heapq.heappush(heap, item)
                        elif item > heap[0]:
                            heapq.heapreplace(heap, item)
            for c in involved:
                c.next_geq(range_end + 1)
        out = sorted(heap, key=lambda s: (-s[0], -s[1]))
        return [(-d, s) for s, d in out]


def fetch_docs(
    index_dir: str, doc_ids, columns: list[str] | None = None
) -> pa.Table:
    """ES fetch-phase analog (SURVEY J6 search-then-fetch): stored columns
    for specific ``doc_ids`` from the doc store, reading ONLY the files /
    row groups whose parquet doc_id statistics intersect the request —
    build partitions assign contiguous docIDs (prefix-sum), so ranges are
    disjoint and a k-doc fetch touches O(k) row groups, not the corpus.
    Returns a doc_id-sorted table. Tombstoned (deleted) ids never appear —
    the delete set is consulted explicitly (the doc store keeps dead rows
    until compaction), matching the ES GET-after-DELETE 404 semantics."""
    import pyarrow.parquet as pq

    from nmr_fair_dos_ray.pipelines.lifecycle import read_tombstones

    ids = sorted({int(d) for d in doc_ids})
    if ids:
        tomb = read_tombstones(index_dir, lo=ids[0], hi=ids[-1])
        if tomb.size:
            dead = set(tomb.tolist())
            ids = [d for d in ids if d not in dead]
    if not ids:
        # empty result must carry the SAME schema as the non-empty case:
        # derive column types from the doc store's parquet schema (metadata
        # only — no row groups are read)
        import pyarrow.dataset as pads

        store_schema = pads.dataset(
            os.path.join(index_dir, "docs"), format="parquet"
        ).schema
        want = ["doc_id"] + [
            c for c in (columns if columns is not None
                        else [n for n in store_schema.names if n != "doc_id"])
            if c != "doc_id"
        ]
        fields = [
            store_schema.field(c) if store_schema.get_field_index(c) >= 0
            else pa.field(c, pa.string())
            for c in want
        ]
        return pa.schema(fields).empty_table()
    cols = None
    if columns is not None:
        cols = ["doc_id"] + [c for c in columns if c != "doc_id"]
    t = pq.read_table(
        os.path.join(index_dir, "docs"), columns=cols,
        filters=[("doc_id", "in", ids)],
    )
    return t.sort_by("doc_id")


def best_fields_search(
    searchers: list["Searcher"], query: str, k: int = 10,
    tie_breaker: float = 0.0,
) -> list[tuple[int, float]]:
    """True multi-field ``best_fields`` scoring (the ES ``multi_match
    type=best_fields`` / ``dis_max`` analog — the reference scores
    max-over-fields across ``[digitalObjectLocation, pid]``,
    /root/reference/src/nmr_FAIR_DOs/connectors/elasticsearch.py:250-262).

    Each field is its own index (its own postings, df/idf AND length norms
    — the Lucene per-field model: a short ``title`` field is not penalized
    by the body's avgdl), queried by one :class:`Searcher` per field over
    the SAME doc_id space. Per doc::

        score = max_f s_f  +  tie_breaker * (sum_f s_f - max_f s_f)

    with ``tie_breaker=0.0`` (the best_fields default) this is a pure
    dis-max — deterministic float64 max of per-field TAAT scores, so the
    result is SQL-oracle-checkable (GREATEST over per-field BM25 CTEs).
    Ranked by (score desc, doc_id asc).

    Scale: cost is one TAAT accumulation per field over that field's
    postings — fields are typically short (title, location, pid), so the
    extra fields add little; the merge is one union + max over match maps.
    """
    maps = []
    for s in searchers:
        terms, exact = s.r.tokenizer.tokenize_query(query)
        allowed = s._exact_candidates(exact)
        if not terms:
            continue
        uniq, acc = s._score_map(terms, allowed)
        if uniq.size:
            maps.append((uniq, acc))
    return dismax_merge(maps, k, tie_breaker)


def dismax_merge(
    maps: list[tuple[np.ndarray, np.ndarray]], k: int, tie_breaker: float = 0.0
) -> list[tuple[int, float]]:
    """Dis-max merge of per-field (doc_ids, scores) match maps — shared by
    the local and sharded ``best_fields`` paths (both produce bit-equal
    per-field maps, so the merged ranking is bit-equal too)."""
    maps = [(u, a) for u, a in maps if u.size]
    if not maps:
        return []
    all_docs = np.unique(np.concatenate([u for u, _ in maps]))
    best = np.zeros(all_docs.size, np.float64)
    total = np.zeros(all_docs.size, np.float64)
    for uniq, acc in maps:
        v = np.zeros(all_docs.size, np.float64)
        v[np.searchsorted(all_docs, uniq)] = acc
        np.maximum(best, v, out=best)
        total += v
    score = best if tie_breaker == 0.0 else best + tie_breaker * (total - best)
    order = np.lexsort((all_docs, -score))[: min(k, all_docs.size)]
    return [(int(all_docs[i]), float(score[i])) for i in order]


class QueryScorer:
    """Actor-pool stage: batch of queries → top-k rows.

    ``queries_ds.map_batches(QueryScorer, fn_constructor_kwargs={"index_dir": ...},
    concurrency=N, batch_format="pyarrow")`` — index loads once per actor.
    Pass ``index_ref=ray.put(IndexReader(d).to_state())`` instead of
    ``index_dir`` to share ONE object-store copy of the index across every
    actor on a node (zero-copy views; the scale path for serving pools).
    Output schema: (query_id int64, rank int32, doc_id int64, score float64).
    """

    def __init__(self, index_dir: str | None = None, k: int = 10,
                 algorithm: str = "bmw", index_ref=None, result_cache: int = 0,
                 mode: str = "bm25", slop: int = 0, ordered: bool = True):
        if index_ref is not None:
            import ray

            reader = IndexReader.from_state(ray.get(index_ref))
        else:
            reader = IndexReader(index_dir)
        self.searcher = Searcher(reader)
        self.k = k
        self.algorithm = algorithm
        # every single-query surface is batchable: bm25 (default), and,
        # phrase, near (uses ``slop``), prefix, fuzzy, query (query-string
        # grammar). Per-row override via a "mode" column.
        self.mode = mode
        self.slop = int(slop)
        self.ordered = bool(ordered)  # near mode: ordered vs window slop
        # optional per-actor query-result LRU (the reference's Elasticsearch
        # enables its request cache by default; this is the engine analog —
        # OFF by default so benchmark headlines stay uncached/comparable)
        self.result_cache = int(result_cache)
        self._results: dict[tuple[str, str, int], list] = {}

    def _run(self, query: str, k: int, mode: str) -> list[tuple[int, float]]:
        s = self.searcher
        if mode == "bm25":
            return s.search(query, k=k, algorithm=self.algorithm)
        if mode == "and":
            return s.search_and(query, k=k)
        if mode == "phrase":
            return s.search_phrase(query, k=k)
        if mode == "near":
            return s.search_near(query, k=k, slop=self.slop,
                                 ordered=self.ordered)
        if mode == "prefix":
            return s.search_prefix(query, k=k)
        if mode == "regex":
            return s.search_regex(query, k=k)
        if mode == "wildcard":
            return s.search_wildcard(query, k=k)
        if mode == "fuzzy":
            return s.search_fuzzy(query, k=k)
        if mode == "query":
            return s.search_query(query, k=k)
        raise ValueError(f"unknown query mode {mode!r}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, ranks, docs, scores = [], [], [], []
        ks = batch["k"].to_pylist() if "k" in batch.column_names else [self.k] * batch.num_rows
        modes = (
            batch["mode"].to_pylist() if "mode" in batch.column_names
            else [self.mode] * batch.num_rows
        )
        for qid, query, k, mode in zip(
            batch["query_id"].to_pylist(), batch["query"].to_pylist(), ks, modes
        ):
            kk = int(k or self.k)
            mode = mode or self.mode
            if self.result_cache:
                key = (query, mode, kk)
                hits = self._results.get(key)
                if hits is None:
                    hits = self._run(query, kk, mode)
                    if len(self._results) >= self.result_cache:
                        self._results.pop(next(iter(self._results)))
                    self._results[key] = hits
            else:
                hits = self._run(query, kk, mode)
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
