"""Positional index (store_positions) + phrase / conjunctive / facet search.

The contract: positions reproduce the Tokenizer.tokenize stream exactly
(code mode: identifier parts right after their compound; multi-source
streams separated by POS_STREAM_GAP), phrase results equal a brute-force
recompute from the raw corpus, conjunctive scores are bit-equal to the
disjunctive engine's scores for the same docs, and everything survives the
salted hot-term merge and per-partition resume.
"""

import os
import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

from nmr_fair_dos_ray.pipelines.index_build import (
    POS_STREAM_GAP, IndexConfig, build_index,
)
from nmr_fair_dos_ray.search.engine import IndexReader, Searcher
from nmr_fair_dos_ray.tokenizer import Tokenizer

BASE = dict(
    token_cols=("path", "lang"),
    field_cols=("repo", "lang"),
    stored_cols=("repo", "path"),
    num_shards=4,
)
DIR_POS = "/tmp/nmr_fair_dos_ray/test_index_positions"
DIR_POS_SALT = "/tmp/nmr_fair_dos_ray/test_index_positions_salt"

PHRASES = ["user name", "get user name", "def return", "return self",
           "the the", "zz nope", ""]


@pytest.fixture(scope="module")
def pos_index(sf_unit):
    for d in (DIR_POS, DIR_POS_SALT):
        shutil.rmtree(d, ignore_errors=True)
    build_index(sf_unit["corpus"], DIR_POS,
                IndexConfig(store_positions=True, **BASE))
    # tiny hot threshold: positional streams must survive the salted merge
    build_index(
        sf_unit["corpus"], DIR_POS_SALT,
        IndexConfig(store_positions=True, salt_hot_terms=True,
                    hot_df_threshold=8, n_salts=3, **BASE),
    )
    return IndexReader(DIR_POS), IndexReader(DIR_POS_SALT), sf_unit


def _streams(fx, cfg_cols=("content", "path", "lang")):
    """Brute-force per-doc {term: [positions]} from the raw corpus."""
    corpus = pq.read_table(fx["corpus"])
    tok = Tokenizer("code")
    out = {}
    for i in range(corpus.num_rows):
        doc = corpus["doc_id"][i].as_py() if "doc_id" in corpus.column_names else i
        stream: dict = {}
        base = 0
        for c in cfg_cols:
            toks = tok.tokenize(str(corpus[c][i].as_py() or ""))
            for j, t in enumerate(toks):
                stream.setdefault(t, []).append(base + j)
            base += len(toks) + POS_STREAM_GAP
        out[doc] = stream
    return out


def test_positions_match_reference_stream(pos_index):
    r, r_salt, fx = pos_index
    assert r.has_positions and r_salt.has_positions
    streams = _streams(fx)
    for reader in (r, r_salt):
        for t in list(reader.terms)[::13]:
            p = reader.positions(t)
            if p is None:  # field term
                assert t.split(":", 1)[0] in ("repo", "lang")
                continue
            docs, offs, flat = p
            for di, d in enumerate(docs.tolist()):
                exp = streams[d].get(t, [])
                got = flat[offs[di]: offs[di + 1]].tolist()
                assert got == exp, (t, d)


def _brute_phrase(streams, words, k):
    out = []
    for d, st in streams.items():
        P = np.array(st.get(words[0], []), dtype=np.int64) if words else np.empty(0)
        for w in words[1:]:
            P = np.intersect1d(P + 1, np.array(st.get(w, []), dtype=np.int64))
            if P.size == 0:
                break
        if P.size:
            out.append((d, int(P.size)))
    out.sort(key=lambda h: (-h[1], h[0]))
    return out[:k]


def test_phrase_matches_brute_force(pos_index):
    r, r_salt, fx = pos_index
    streams = _streams(fx)
    tok = Tokenizer("code")
    extra = [q["query"] for q in pq.read_table(fx["queries"]).to_pylist()][:5]
    for phrase in PHRASES + extra:
        words = tok.tokenize(phrase)
        exp = _brute_phrase(streams, words, 20) if words else []
        assert Searcher(r).search_phrase(phrase, k=20) == exp, phrase
        assert Searcher(r_salt).search_phrase(phrase, k=20) == exp, phrase


def test_phrase_requires_positions(sf_unit):
    d = "/tmp/nmr_fair_dos_ray/test_index_nopos"
    shutil.rmtree(d, ignore_errors=True)
    build_index(sf_unit["corpus"], d, IndexConfig(**BASE))
    r = IndexReader(d)
    assert not r.has_positions
    assert r.positions("def") is None
    with pytest.raises(ValueError, match="store_positions"):
        Searcher(r).search_phrase("a b")
    # the sharded router honors the same contract — a non-positional index
    # RAISES on phrase/query-string search instead of silently returning
    # empty results (ADVICE r3: the old behavior broke the bit-equal claim)
    from nmr_fair_dos_ray.search.distributed import ShardedSearcher

    pool = ShardedSearcher(d, pool_size=2)
    try:
        with pytest.raises(ValueError, match="store_positions"):
            pool.search_phrase("a b")
        with pytest.raises(ValueError, match="store_positions"):
            pool.search_query('"a b"')
    finally:
        pool.shutdown()


def test_and_scores_bit_equal_to_taat(pos_index):
    r, _, fx = pos_index
    s = Searcher(r)
    queries = [q["query"] for q in pq.read_table(fx["queries"]).to_pylist()]
    queries += ["def return self", "lang:python def class", "zz nope", ""]
    for q in queries:
        hits = s.search_and(q, k=25)
        full = dict(s.search(q, k=r.n_docs, algorithm="taat"))
        terms, exact = r.tokenizer.tokenize_query(q)
        for d, sc in hits:
            assert full[d] == sc, (q, d)  # bit-equal, not approx
            for t in terms:  # conjunctive: doc contains every term
                docs, _ = r.postings(t)
                assert d in docs, (q, d, t)
        # completeness: every fully-matching doc with a top-25 score is found
        if terms and len(hits) < 25:
            n_conj = sum(
                1 for d in full
                if all(d in r.postings(t)[0] for t in terms)
                and (not exact or all(d in r.postings(t2)[0] for t2 in exact))
            )
            assert len(hits) == n_conj, q


def test_facet_counts_match_pandas(pos_index):
    r, _, fx = pos_index
    s = Searcher(r)
    corpus = pq.read_table(fx["corpus"]).to_pandas()
    tok = Tokenizer("code")
    for q, field in (("def return", "lang"), ("getUserName", "repo"),
                     ("zz nope", "lang")):
        terms, _ = r.tokenizer.tokenize_query(q)
        match_ids = set()
        for t in terms:
            docs, _ = r.postings(t)
            match_ids.update(docs.tolist())
        sub = corpus[corpus["doc_id"].isin(match_ids)] if "doc_id" in corpus else corpus.iloc[sorted(match_ids)]
        exp = sorted(sub.groupby(field).size().items())
        assert s.facet_counts(q, field) == [(str(v), int(n)) for v, n in exp], q


def test_positions_survive_resume(pos_index, sf_unit):
    r, _, _ = pos_index
    before = Searcher(r).search_phrase("user name", k=10)
    victim = sorted(os.listdir(f"{DIR_POS}/shards"))[1]
    os.remove(f"{DIR_POS}/shards/{victim}")
    build_index(sf_unit["corpus"], DIR_POS, IndexConfig(store_positions=True, **BASE))
    r2 = IndexReader(DIR_POS)
    assert r2.has_positions
    assert Searcher(r2).search_phrase("user name", k=10) == before


# --------------------------------------------------------------- proximity
def _brute_near(streams, words, slop, k):
    """Reachable-set DP per doc in plain Python sets; counts distinct chain
    end positions (the documented any-choice semantics)."""
    out = []
    for d, st in streams.items():
        reach = set(st.get(words[0], []))
        for w in words[1:]:
            nxt = set(st.get(w, []))
            reach = {
                p for p in nxt
                if any(p - slop - 1 <= q <= p - 1 for q in reach)
            }
            if not reach:
                break
        if reach:
            out.append((d, len(reach)))
    out.sort(key=lambda h: (-h[1], h[0]))
    return out[:k]


def test_near_slop0_is_bit_equal_to_phrase(pos_index):
    r, r_salt, fx = pos_index
    s, s_salt = Searcher(r), Searcher(r_salt)
    for phrase in PHRASES:
        assert s.search_near(phrase, k=20, slop=0) == s.search_phrase(
            phrase, k=20
        ), phrase
        assert s_salt.search_near(phrase, k=20, slop=0) == s_salt.search_phrase(
            phrase, k=20
        ), phrase


def test_near_matches_brute_force(pos_index):
    r, r_salt, fx = pos_index
    streams = _streams(fx)
    tok = Tokenizer("code")
    for phrase in PHRASES:
        words = tok.tokenize(phrase)
        for slop in (1, 2, 4):
            exp = _brute_near(streams, words, slop, 20) if words else []
            assert Searcher(r).search_near(phrase, k=20, slop=slop) == exp, (
                phrase, slop,
            )
            assert Searcher(r_salt).search_near(phrase, k=20, slop=slop) == exp


def test_near_intersect_nongreedy_counterexample():
    """The bounded gap window defeats both greedy directions: with B at
    {2, 4} and C at {3}, slop=2, the only completing chain is A0→B2→C3 —
    largest-eligible greedy would pick B4 and miss it. The reachable-set
    DP must find it."""
    from nmr_fair_dos_ray.search.engine import near_intersect

    plists = {
        "a": (np.array([0]), np.array([0, 1]), np.array([0])),
        "b": (np.array([0]), np.array([0, 2]), np.array([2, 4])),
        "c": (np.array([0]), np.array([0, 1]), np.array([3])),
    }
    docs, counts = near_intersect(["a", "b", "c"], plists, slop=2)
    assert docs.tolist() == [0] and counts.tolist() == [1]
    # slop=0 (adjacency) finds nothing: 0→1? no b at 1
    docs0, _ = near_intersect(["a", "b", "c"], plists, slop=0)
    assert docs0.size == 0


def test_sharded_near_matches_local(pos_index):
    from nmr_fair_dos_ray.search.distributed import ShardedSearcher

    r, _, fx = pos_index
    s = Searcher(r)
    pool = ShardedSearcher(DIR_POS, pool_size=2)
    try:
        for phrase in PHRASES:
            for slop in (0, 2):
                assert pool.search_near(phrase, k=20, slop=slop) == \
                    s.search_near(phrase, k=20, slop=slop), (phrase, slop)
    finally:
        pool.shutdown()


# ----------------------------------------------------- unordered proximity
def _brute_near_unordered(streams, words, slop, k):
    """Anchor-window semantics in plain Python: an anchor (last distinct
    term) position counts when every other distinct term occurs within
    slop+1 tokens on either side."""
    uniq = list(dict.fromkeys(words))
    anchor, others = uniq[-1], uniq[:-1]
    out = []
    for d, st in streams.items():
        anchors = [
            p for p in st.get(anchor, [])
            if all(
                any(abs(p - q) <= slop + 1 for q in st.get(w, []))
                for w in others
            )
        ]
        if anchors:
            out.append((d, len(anchors)))
    out.sort(key=lambda h: (-h[1], h[0]))
    return out[:k]


def test_near_unordered_matches_brute_force(pos_index):
    r, r_salt, fx = pos_index
    streams = _streams(fx)
    tok = Tokenizer("code")
    for phrase in PHRASES:
        words = tok.tokenize(phrase)
        for slop in (0, 1, 2, 4):
            exp = _brute_near_unordered(streams, words, slop, 20) if words else []
            got = Searcher(r).search_near(phrase, k=20, slop=slop, ordered=False)
            assert got == exp, (phrase, slop)
            got_salt = Searcher(r_salt).search_near(
                phrase, k=20, slop=slop, ordered=False
            )
            assert got_salt == exp, (phrase, slop)


def test_near_unordered_superset_of_ordered(pos_index):
    """Every ordered match doc also matches unordered at the same slop
    (the unordered window contains the ordered chain's last gap for
    two-term queries)."""
    r, _, fx = pos_index
    s = Searcher(r)
    for phrase in PHRASES:
        if len(set(Tokenizer("code").tokenize(phrase))) != 2:
            continue
        for slop in (0, 2):
            ordered_docs = {d for d, _ in s.search_near(phrase, k=100, slop=slop)}
            unordered_docs = {
                d for d, _ in s.search_near(phrase, k=100, slop=slop,
                                            ordered=False)
            }
            assert ordered_docs <= unordered_docs, (phrase, slop)


def test_near_unordered_kernel_reversed_terms():
    """A doc with the terms in REVERSE order matches only unordered: stream
    'b . . a' — ordered a→b needs b after a; unordered anchors on b with a
    within the window on the right."""
    from nmr_fair_dos_ray.search.engine import (
        near_intersect, near_intersect_unordered,
    )

    plists = {
        "a": (np.array([0]), np.array([0, 1]), np.array([3])),
        "b": (np.array([0]), np.array([0, 1]), np.array([0])),
    }
    docs, _ = near_intersect(["a", "b"], plists, slop=2)
    assert docs.size == 0
    docs_u, counts_u = near_intersect_unordered(["a", "b"], plists, slop=2)
    assert docs_u.tolist() == [0] and counts_u.tolist() == [1]
    # outside the window (|3-0| = 3 > slop+1 = 2) neither matches
    docs_u1, _ = near_intersect_unordered(["a", "b"], plists, slop=1)
    assert docs_u1.size == 0


def test_sharded_near_unordered_matches_local(pos_index):
    from nmr_fair_dos_ray.search.distributed import ShardedSearcher

    r, _, fx = pos_index
    s = Searcher(r)
    pool = ShardedSearcher(DIR_POS, pool_size=2)
    try:
        for phrase in PHRASES:
            for slop in (0, 2):
                assert pool.search_near(phrase, k=20, slop=slop, ordered=False) \
                    == s.search_near(phrase, k=20, slop=slop, ordered=False), \
                    (phrase, slop)
    finally:
        pool.shutdown()
