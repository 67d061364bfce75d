"""Pure-Python reference BM25 index — the conformance oracle (SURVEY.md §5.2).

A deliberately naive, single-process, dict-based inverted index over the same
corpus, same tokenizer, same BM25 parameters and the same accumulation order
(sorted unique query terms) as the Ray engine. The engine's top-k must be
rank-identical with bit-equal float64 scores on every fixture query.

This is the stand-in for the reference's external Elasticsearch black box
(reference: src/nmr_FAIR_DOs/connectors/elasticsearch.py:250-306) — it defines
the *observable semantics* the distributed build must reproduce.
"""

from __future__ import annotations

import hashlib
from collections import Counter

from nmr_fair_dos_ray.search.bm25 import bm25_idf, bm25_one
from nmr_fair_dos_ray.tokenizer import Tokenizer


class OracleIndex:
    def __init__(self, tokenizer_mode: str = "code", k1: float = 1.2, b: float = 0.75):
        self.tok = Tokenizer(tokenizer_mode)
        self.k1 = k1
        self.b = b
        self.postings: dict[str, list[tuple[int, int]]] = {}  # term -> [(doc, tf)]
        self.doclen: dict[int, int] = {}
        self.sha256: dict[int, str] = {}
        self.n_docs = 0
        self.sum_doclen = 0

    # ------------------------------------------------------------ indexing
    def add_document(
        self,
        doc_id: int,
        content: str,
        token_fields: list[str] = (),
        exact_fields: dict[str, str] | None = None,
    ) -> None:
        counts = Counter(self.tok.tokenize(content))
        for extra in token_fields:
            counts.update(self.tok.tokenize(extra))
        dl = sum(counts.values())
        for colname, value in (exact_fields or {}).items():
            counts[f"{colname}:{value if value is not None else ''}"] += 1
        for term, tf in counts.items():
            self.postings.setdefault(term, []).append((doc_id, tf))
        self.doclen[doc_id] = dl
        self.sha256[doc_id] = hashlib.sha256((content or "").encode("utf-8")).hexdigest()
        self.n_docs += 1
        self.sum_doclen += dl

    def finalize(self) -> None:
        for plist in self.postings.values():
            plist.sort()
        self.avgdl = self.sum_doclen / self.n_docs if self.n_docs else 0.0

    # ------------------------------------------------------------- search
    def df(self, term: str) -> int:
        return len(self.postings.get(term, ()))

    def search(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        terms, exact = self.tok.tokenize_query(query)
        allowed: set[int] | None = None
        for t in exact:
            docs = {d for d, _ in self.postings.get(t, ())}
            allowed = docs if allowed is None else (allowed & docs)
        if not terms:
            if allowed is None:
                return []
            return [(d, 0.0) for d in sorted(allowed)[:k]]
        acc: dict[int, float] = {}
        for t in terms:  # sorted unique — fixed accumulation order
            plist = self.postings.get(t)
            if not plist:
                continue
            idf = bm25_idf(len(plist), self.n_docs)
            for doc, tf in plist:
                acc[doc] = acc.get(doc, 0.0) + bm25_one(
                    tf, self.doclen[doc], idf, self.k1, self.b, self.avgdl
                )
        items = [(d, s) for d, s in acc.items() if allowed is None or d in allowed]
        items.sort(key=lambda x: (-x[1], x[0]))
        return items[:k]


def oracle_from_parquet(
    paths: list[str],
    content_col: str = "content",
    id_col: str | None = None,
    token_cols: tuple[str, ...] = (),
    field_cols: tuple[str, ...] = (),
    tokenizer_mode: str = "code",
) -> OracleIndex:
    """Build the oracle from the same parquet files, same doc_id assignment
    (file order × row-group order × row order — matching
    sources/parquet_source.work_items)."""
    import pyarrow.parquet as pq

    idx = OracleIndex(tokenizer_mode)
    base = 0
    for path in sorted(paths):
        pf = pq.ParquetFile(path)
        for rg in range(pf.metadata.num_row_groups):
            t = pf.read_row_group(rg)
            rows = t.to_pylist()
            for i, row in enumerate(rows):
                doc_id = int(row[id_col]) if id_col else base + i
                idx.add_document(
                    doc_id,
                    row[content_col] or "",
                    token_fields=[str(row[c] or "") for c in token_cols],
                    exact_fields={c: row[c] for c in field_cols},
                )
            base += len(rows)
    idx.finalize()
    return idx
