"""Code-aware tokenizer (the analyzer both the index build and queries share).

The reference delegates analysis to Elasticsearch's default analyzer
(reference: src/nmr_FAIR_DOs/connectors/elasticsearch.py:169-173 — index
created with no mapping, ES dynamic defaults). This engine defines its own
analyzer, per BASELINE.json ``north_star``: lowercase, split on
non-alphanumerics, camelCase/snake_case identifier splitting, path
segmentation, plus exact field terms (``repo:``/``path:``/``lang:``) that
reproduce the reference's exact-equality check on pid/digitalObjectLocation
(reference: src/nmr_FAIR_DOs/connectors/elasticsearch.py:295-306).

Two modes:

- ``"code"`` (default): raw tokens are ``[A-Za-z0-9_]+`` runs. Each raw token
  emits its lowercase form (compound, underscores preserved) and, when
  identifier splitting changes anything, its camelCase/snake_case/digit-boundary
  parts as additional terms. Non-ASCII characters act as separators.
- ``"simple"``: lowercase, split on ``[^a-z0-9]+`` — deliberately chosen to be
  reproducible in ANSI SQL (DuckDB ``string_split_regex``) so the driver's
  oracle can verify df / BM25 pipelines value-for-value.

Both a per-row reference implementation (used by the conformance oracle) and a
vectorized pyarrow implementation (used in ``map_batches`` hot paths) are
provided; tests assert they produce identical term multisets.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Camel/digit boundary rules. Applied SEQUENTIALLY (non-overlapping global
# replace), identically in Python `re` and RE2 (pyarrow.compute), so the two
# implementations agree by construction. No lookarounds (RE2 lacks them).
_BOUNDARY_RULES: list[tuple[str, str]] = [
    (r"([a-z0-9])([A-Z])", r"\1 \2"),      # fooBar      -> foo Bar
    (r"([A-Z]+)([A-Z][a-z])", r"\1 \2"),   # HTMLParser  -> HTML Parser
    (r"([A-Za-z])([0-9])", r"\1 \2"),      # utf8        -> utf 8
    (r"([0-9])([A-Za-z])", r"\1 \2"),      # 8bit        -> 8 bit
]
_RAW_TOKEN_RE = re.compile(r"[A-Za-z0-9_]+")
_SIMPLE_SPLIT_RE = re.compile(r"[^a-z0-9]+")
_BOUNDARY_RES = [(re.compile(p), r) for p, r in _BOUNDARY_RULES]

#: SQL fragment equivalent to simple-mode tokenization of a text column —
#: used by oracle_sql() entries. Produces one row per token when unnested.
SIMPLE_MODE_SQL_SPLIT = (
    "list_filter(string_split_regex(lower({col}), '[^a-z0-9]+'), x -> x <> '')"
)

EXACT_FIELD_PREFIXES = ("repo:", "path:", "lang:", "source:")


def _split_identifier(token: str) -> list[str]:
    """camelCase/snake_case/digit-boundary parts of one raw token, lowercased."""
    s = token
    for rx, rep in _BOUNDARY_RES:
        s = rx.sub(rep, s)
    s = s.replace("_", " ")
    return s.lower().split()


class Tokenizer:
    """Shared analyzer for documents and queries.

    ``mode`` is ``"code"`` or ``"simple"``; both index build and query paths
    MUST use the same instance/config or scores will not match.
    """

    def __init__(self, mode: str = "code"):
        if mode not in ("code", "simple"):
            raise ValueError(f"unknown tokenizer mode: {mode!r}")
        self.mode = mode

    # ------------------------------------------------------------------ rows
    def tokenize(self, text: str) -> list[str]:
        """Reference (per-row) implementation. Order = occurrence order."""
        if not text:
            return []
        if self.mode == "simple":
            return [t for t in _SIMPLE_SPLIT_RE.split(text.lower()) if t]
        out: list[str] = []
        for raw in _RAW_TOKEN_RE.findall(text):
            compound = raw.lower()
            out.append(compound)
            parts = _split_identifier(raw)
            if parts != [compound]:
                out.extend(parts)
        return out

    def term_counts(self, text: str) -> Counter:
        return Counter(self.tokenize(text))

    def tokenize_query(self, query: str) -> tuple[list[str], list[str]]:
        """-> (ranked_terms, exact_terms).

        ``field:value`` atoms (repo:/path:/lang:/source:) become exact filter
        terms — the engine analog of the reference's exact-equality
        verification on pid / digitalObjectLocation
        (reference: src/nmr_FAIR_DOs/connectors/elasticsearch.py:295-306).
        Everything else is analyzed exactly like document content. Ranked
        terms are deduplicated and sorted so score accumulation order is
        deterministic (SURVEY.md §7.3 item 1).
        """
        exact: list[str] = []
        rest: list[str] = []
        for atom in query.split():
            if atom.startswith(EXACT_FIELD_PREFIXES):
                exact.append(atom)
            else:
                rest.append(atom)
        terms = sorted(set(self.tokenize(" ".join(rest))))
        return terms, exact

    # --------------------------------------------------------------- batches
    def batch_token_rows(self, texts: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, pa.Array]:
        """Vectorized tokenization of a column of texts.

        Returns ``(row_idx, term)`` — parallel arrays with one element per
        token occurrence (tf = count of identical (row_idx, term) pairs).
        Built on pyarrow.compute kernels; no per-row Python in the hot path.
        """
        rows, terms, _ = self.batch_token_positions(texts, with_positions=False)
        return rows, terms

    def batch_token_positions(
        self, texts: pa.Array | pa.ChunkedArray, with_positions: bool = True
    ) -> tuple[np.ndarray, pa.Array, np.ndarray | None]:
        """Like :meth:`batch_token_rows` plus each occurrence's POSITION in
        its row's token stream (0-based, the same stream :meth:`tokenize`
        yields — in code mode identifier parts sit right after their
        compound). Foundation of the positional index (phrase queries).
        """
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.fill_null(texts, "")
        n = len(texts)
        if n == 0:
            return np.empty(0, np.int64), pa.array([], pa.string()), (
                np.empty(0, np.int64) if with_positions else None
            )

        if self.mode == "simple":
            lowered = pc.utf8_lower(texts)
            split = pc.split_pattern_regex(lowered, pattern="[^a-z0-9]+")
            flat = pc.list_flatten(split)
            rows = np.repeat(
                np.arange(n, dtype=np.int64),
                pc.list_value_length(split).to_numpy(zero_copy_only=False),
            )
            keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
            rows = rows[keep]
            pos = None
            if with_positions:
                # kept tokens are in stream order; position within row =
                # running index minus the row's first kept-token index
                counts = np.bincount(rows, minlength=n)
                starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
                pos = np.arange(rows.size, dtype=np.int64) - starts[rows]
            return rows, flat.filter(pa.array(keep)), pos

        # code mode — raw tokens
        split = pc.split_pattern_regex(texts, pattern="[^A-Za-z0-9_]+")
        flat = pc.list_flatten(split)
        rows = np.repeat(
            np.arange(n, dtype=np.int64),
            pc.list_value_length(split).to_numpy(zero_copy_only=False),
        )
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        raw = flat.filter(pa.array(keep))
        raw_rows = rows[keep]

        compound = pc.utf8_lower(raw)

        # fast path: pure-lowercase or pure-digit tokens can never produce
        # identifier parts different from their compound — skip the (regex-
        # and bandwidth-heavy) boundary chain for them entirely
        simple = pc.match_substring_regex(
            raw, r"^([a-z]+|[0-9]+)$"
        ).to_numpy(zero_copy_only=False)
        cand_mask = ~simple
        cand = raw.filter(pa.array(cand_mask))
        cand_compound = compound.filter(pa.array(cand_mask))
        cand_src = np.flatnonzero(cand_mask)  # candidate idx -> raw idx

        s = cand
        for pat, rep in _BOUNDARY_RULES:
            s = pc.replace_substring_regex(s, pattern=pat, replacement=rep)
        s = pc.replace_substring(s, pattern="_", replacement=" ")
        s = pc.utf8_lower(s)
        parts_list = pc.split_pattern(s, pattern=" ")
        parts_flat = pc.list_flatten(parts_list)
        parts_lens = pc.list_value_length(parts_list).to_numpy(zero_copy_only=False)
        parts_token_idx = np.repeat(np.arange(len(cand), dtype=np.int64), parts_lens)

        # Keep parts only for tokens where splitting changed something:
        # i.e. NOT (exactly one non-empty part equal to the compound).
        nonempty = pc.not_equal(parts_flat, "").to_numpy(zero_copy_only=False)
        nonempty_per_token = np.zeros(len(cand), np.int64)
        np.add.at(nonempty_per_token, parts_token_idx, nonempty.astype(np.int64))
        eq_compound = pc.equal(
            parts_flat, cand_compound.take(pa.array(parts_token_idx))
        ).to_numpy(zero_copy_only=False)
        one_part = nonempty_per_token == 1
        # token has exactly one nonempty part AND that part equals compound
        eq_per_token = np.zeros(len(cand), np.int64)
        np.add.at(eq_per_token, parts_token_idx, (nonempty & eq_compound).astype(np.int64))
        single_same = one_part & (eq_per_token == 1)

        keep_part = nonempty & ~single_same[parts_token_idx]
        part_terms = parts_flat.filter(pa.array(keep_part))
        part_raw_idx = cand_src[parts_token_idx[keep_part]]  # part -> raw idx
        part_rows = raw_rows[part_raw_idx]

        out_rows = np.concatenate([raw_rows, part_rows])
        out_terms = pa.concat_arrays(
            [compound.combine_chunks() if isinstance(compound, pa.ChunkedArray) else compound,
             part_terms.combine_chunks() if isinstance(part_terms, pa.ChunkedArray) else part_terms]
        )
        pos = None
        if with_positions:
            # stream width of raw token i = 1 (compound) + its kept parts;
            # compound position = exclusive per-row cumsum of widths
            n_raw = raw_rows.size
            parts_per_raw = np.zeros(n_raw, np.int64)
            np.add.at(parts_per_raw, part_raw_idx, 1)
            widths = parts_per_raw + 1
            w_excl = np.concatenate([[0], np.cumsum(widths)[:-1]])
            row_counts = np.bincount(raw_rows, minlength=n)
            row_first = np.concatenate([[0], np.cumsum(row_counts)[:-1]])
            compound_pos = w_excl - w_excl[row_first[raw_rows]]
            # part j of raw token i sits at compound_pos[i] + 1 + j
            kept_idx = parts_token_idx[keep_part]  # ascending candidate ids
            kcnt = np.bincount(kept_idx, minlength=len(cand)) if len(cand) else np.empty(0, np.int64)
            kstart = np.concatenate([[0], np.cumsum(kcnt)[:-1]]) if len(cand) else kcnt
            j_within = np.arange(kept_idx.size, dtype=np.int64) - kstart[kept_idx]
            part_pos = compound_pos[part_raw_idx] + 1 + j_within
            pos = np.concatenate([compound_pos, part_pos])
        return out_rows, out_terms, pos


def term_hash(terms: pa.Array | pa.ChunkedArray | list[str]) -> np.ndarray:
    """Deterministic 64-bit FNV-1a hash of terms, vectorized over bytes.

    Used as the shuffle key for posting-list construction (SURVEY.md §4.2).
    Python's ``hash`` is salted per process — never use it for shuffling.
    """
    if isinstance(terms, list):
        terms = pa.array(terms, pa.string())
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    if len(terms) == 0:
        return np.empty(0, np.uint64)
    # vectorize FNV-1a over byte positions (≤ max term length passes)
    buf = terms.cast(pa.binary())
    arr = buf.combine_chunks() if isinstance(buf, pa.ChunkedArray) else buf
    lengths = pc.binary_length(arr).to_numpy(zero_copy_only=False).astype(np.int64)
    bufs = arr.buffers()
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.empty(0, np.uint8)
    )
    offs = np.frombuffer(bufs[1], dtype=np.int32).astype(np.int64)
    # for a sliced array the offsets buffer is shared; index with arr.offset
    o = arr.offset
    starts = offs[o : o + len(arr)]
    h = np.full(len(arr), np.uint64(0xCBF29CE484222325))
    prime = np.uint64(0x100000001B3)
    maxlen = int(lengths.max()) if len(lengths) else 0
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            m = lengths > j
            if not m.any():
                break
            b = data[starts[m] + j].astype(np.uint64)
            h[m] = (h[m] ^ b) * prime
    return h


def term_hash_one(term: str) -> int:
    """Scalar FNV-1a (must match :func:`term_hash`)."""
    h = 0xCBF29CE484222325
    for byte in term.encode("utf-8"):
        h = ((h ^ byte) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h
