"""Text analysis for training-data curation: language-ID, quality scoring,
token counting, document fingerprinting. All vectorized/batched map_batches
stages over the ``documents`` table shape (doc_id, text, lang, source).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from nmr_fair_dos_ray.tokenizer import Tokenizer

# n-gram-free heuristic language ID: stopword hit ratios per language.
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "for", "with", "as", "are"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu"},
    "fr": {"le", "la", "les", "et", "est", "des", "une", "pour", "dans", "que"},
    "es": {"el", "la", "los", "de", "que", "y", "en", "un", "una", "por"},
}

#: BPE-ish token pattern: words, numbers, contractions, punctuation runs —
#: the shape of GPT-2-style pre-tokenization, regex-only (no vocab files).
BPE_ISH_RE = re.compile(r"'[a-z]+|[A-Za-z]+|[0-9]{1,3}|[^\sA-Za-z0-9]+")

_WS_RE = re.compile(r"\S+")
_PUNCT_RE = re.compile(r"[^\w\s]")


class QualityStage:
    """Per-doc quality features (stateless-cheap, but regexes compile once).

    Emits: n_chars, n_tokens (whitespace), n_bpe_tokens (BPE-ish regex),
    punct_ratio, upper_ratio, mean_token_len, stop_ratio_en, lang_guess.
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.tok = Tokenizer("simple")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch[self.text_col].to_pylist()]
        n = len(texts)
        n_chars = np.array([len(t) for t in texts], np.int64)
        ws_tokens = [_WS_RE.findall(t) for t in texts]
        n_tokens = np.array([len(ts) for ts in ws_tokens], np.int64)
        n_bpe = np.array([len(BPE_ISH_RE.findall(t)) for t in texts], np.int64)
        n_punct = np.array([len(_PUNCT_RE.findall(t)) for t in texts], np.int64)
        n_upper = np.array([sum(1 for c in t if c.isupper()) for t in texts], np.int64)
        mean_tok = np.array(
            [float(np.mean([len(w) for w in ts])) if ts else 0.0 for ts in ws_tokens],
            np.float64,
        )
        lang_guess, stop_en = [], []
        for ts in ws_tokens:
            lower = [w.lower() for w in ts]
            ratios = {
                lang: (sum(1 for w in lower if w in sw) / len(lower) if lower else 0.0)
                for lang, sw in _STOPWORDS.items()
            }
            stop_en.append(ratios["en"])
            best = max(ratios.items(), key=lambda kv: (kv[1], kv[0]))
            lang_guess.append(best[0] if best[1] > 0.03 else "unknown")
        safe_chars = np.maximum(n_chars, 1)
        return batch.append_column("n_chars_q", pa.array(n_chars)) \
            .append_column("n_tokens", pa.array(n_tokens)) \
            .append_column("n_bpe_tokens", pa.array(n_bpe)) \
            .append_column("punct_ratio", pa.array(n_punct / safe_chars)) \
            .append_column("upper_ratio", pa.array(n_upper / safe_chars)) \
            .append_column("mean_token_len", pa.array(mean_tok)) \
            .append_column("stop_ratio_en", pa.array(stop_en, pa.float64())) \
            .append_column("lang_guess", pa.array(lang_guess, pa.string()))


def quality_features(docs: Dataset, text_col: str = "text") -> Dataset:
    return docs.map_batches(
        QualityStage, fn_constructor_kwargs={"text_col": text_col},
        batch_format="pyarrow", concurrency=(1, 8),
    )


def token_counts_per_doc(docs: Dataset, text_col: str = "text") -> Dataset:
    """Whitespace token counts, fully vectorized in Arrow (no Python rows)."""

    def count(batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch[text_col].combine_chunks() if isinstance(batch[text_col], pa.ChunkedArray) else batch[text_col], "")
        split = pc.split_pattern_regex(texts, pattern=r"\s+")
        flat = pc.list_flatten(split)
        lens = pc.list_value_length(split).to_numpy(zero_copy_only=False).astype(np.int64)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False).astype(np.int64)
        rows = np.repeat(np.arange(len(texts)), lens)
        counts = np.zeros(len(texts), np.int64)
        np.add.at(counts, rows, nonempty)
        return pa.table({"doc_id": batch["doc_id"], "n_ws_tokens": pa.array(counts)})

    return docs.map_batches(count, batch_format="pyarrow")


_FPRINT_WINDOW = 8
_FPRINT_KEEP = 16


def rolling_fingerprint(text: str) -> list[int]:
    """Winnowing-style doc fingerprint: rolling polynomial hash over token
    windows, keep the _FPRINT_KEEP smallest (order-free, content-robust)."""
    tok = Tokenizer("simple")
    toks = tok.tokenize(text or "")
    if not toks:
        return []
    B = 1000003
    M = (1 << 61) - 1
    hs = []
    for t in toks:
        h = 0
        for c in t.encode():
            h = (h * 131 + c) % M
        hs.append(h)
    if len(hs) < _FPRINT_WINDOW:
        window_hashes = [sum(h * pow(B, i, M) % M for i, h in enumerate(hs)) % M]
    else:
        window_hashes = []
        for i in range(len(hs) - _FPRINT_WINDOW + 1):
            acc = 0
            for j in range(_FPRINT_WINDOW):
                acc = (acc * B + hs[i + j]) % M
            window_hashes.append(acc)
    return sorted(set(window_hashes))[:_FPRINT_KEEP]


class FingerprintStage:
    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        fps = [rolling_fingerprint(t) for t in batch[self.text_col].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "fingerprint": pa.array(fps, pa.list_(pa.int64())),
            }
        )


def doc_fingerprints(docs: Dataset, text_col: str = "text") -> Dataset:
    return docs.map_batches(
        FingerprintStage, fn_constructor_kwargs={"text_col": text_col},
        batch_format="pyarrow", concurrency=(1, 8),
    )
