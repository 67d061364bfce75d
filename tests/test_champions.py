"""Champion-list threshold seeding (static-pruning experiment).

An index built with ``IndexConfig.champion_m > 0`` stores, per term, the
doc_ids of its top-m postings by impact. The searcher uses them to seed
block-max WAND's top-k threshold with exactly-scored candidates before
traversal. The contract: results are BIT-IDENTICAL to the unseeded engine
(and to TAAT) for every query/k — champions only change how much work
pruning saves, never the ranking.
"""

import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

from nmr_fair_dos_ray.pipelines.index_build import IndexConfig, build_index
from nmr_fair_dos_ray.search.bm25 import bm25_tf_norm
from nmr_fair_dos_ray.search.engine import IndexReader, Searcher

BASE = dict(
    token_cols=("path", "lang"),
    field_cols=("repo", "lang"),
    stored_cols=("repo", "path"),
    num_shards=4,
)
DIR_OFF = "/tmp/nmr_fair_dos_ray/test_index_champ_off"
DIR_ON = "/tmp/nmr_fair_dos_ray/test_index_champ_on"
DIR_ON_SALT = "/tmp/nmr_fair_dos_ray/test_index_champ_salt"
M = 8  # small m so seed-rejection and sub-k champion lists both occur


@pytest.fixture(scope="module")
def champ_indexes(sf_unit):
    for d in (DIR_OFF, DIR_ON, DIR_ON_SALT):
        shutil.rmtree(d, ignore_errors=True)
    build_index(sf_unit["corpus"], DIR_OFF, IndexConfig(**BASE))
    # df_min=1: exhaustive champion coverage so parity tests exercise every
    # term; the default (4*m) Zipf-tail cutoff is covered by its own test
    build_index(
        sf_unit["corpus"], DIR_ON,
        IndexConfig(champion_m=M, champion_df_min=1, **BASE),
    )
    # tiny hot threshold: champions must survive the salted doc-range merge
    build_index(
        sf_unit["corpus"], DIR_ON_SALT,
        IndexConfig(champion_m=M, champion_df_min=1, salt_hot_terms=True,
                    hot_df_threshold=8, n_salts=3, **BASE),
    )
    return IndexReader(DIR_OFF), IndexReader(DIR_ON), IndexReader(DIR_ON_SALT), sf_unit


def _queries(fx) -> list[str]:
    qs = [r["query"] for r in pq.read_table(fx["queries"]).to_pylist()]
    qs += [
        "def return self",
        "the the the",
        "getUserName merge",
        "repo:repo1 def",
        "lang:python def class self import return value",
        "zz_unseen_term",
    ]
    return qs


def test_champion_columns_present(champ_indexes):
    r_off, r_on, r_salt, _ = champ_indexes
    assert not r_off.has_champions
    assert r_on.has_champions and r_salt.has_champions
    # every term has 1..M champions
    lens = np.diff(r_on._c_off)
    assert lens.min() >= 1 and lens.max() <= M
    assert len(lens) == len(r_on._terms_arr)


def test_champions_are_top_m_by_impact(champ_indexes):
    """Champions must equal a direct top-m recompute from decoded postings."""
    _, r_on, _, _ = champ_indexes
    cfg = r_on.manifest["config"]
    for term in list(r_on.terms)[::37]:  # sample every 37th term
        tid = r_on._lookup(term)
        docs, tfs = r_on.postings(term)
        tfn = bm25_tf_norm(tfs, r_on.doclens(docs), cfg["k1"], cfg["b"], r_on.avgdl)
        order = np.lexsort((docs, -tfn))[:M]
        expect = docs[order]
        got = r_on.champions(tid)
        assert np.array_equal(got, expect), term


def test_bit_identical_results(champ_indexes):
    r_off, r_on, r_salt, fx = champ_indexes
    s_off = Searcher(r_off)
    s_on = Searcher(r_on)
    s_on_forced_off = Searcher(r_on, use_champions=False)
    s_salt = Searcher(r_salt)
    assert s_on.use_champions and not s_on_forced_off.use_champions
    for q in _queries(fx):
        for k in (1, 3, 10, 50):
            base = s_off.search(q, k=k, algorithm="bmw")
            assert s_off.search(q, k=k, algorithm="taat") == base
            assert s_on.search(q, k=k, algorithm="bmw") == base, (q, k)
            assert s_on_forced_off.search(q, k=k, algorithm="bmw") == base, (q, k)
            assert s_salt.search(q, k=k, algorithm="bmw") == base, (q, k)


def test_tfs_at_matches_full_decode(champ_indexes):
    _, r_on, _, _ = champ_indexes
    rng = np.random.default_rng(7)
    for term in list(r_on.terms)[::53]:
        docs, tfs = r_on.postings(term)
        # mix of present docs, absent mid-range ids, and out-of-range ids
        probe = np.unique(np.concatenate([
            rng.choice(docs, size=min(5, docs.size), replace=False),
            np.array([docs.max() + 3, -1 if docs.min() > 0 else docs.min() - 1]),
            rng.integers(0, max(2, int(docs.max())), size=5),
        ]))
        r_on._postings_cache.clear()  # force the block-targeted path
        got = r_on.tfs_at(term, probe)
        lut = dict(zip(docs.tolist(), tfs.tolist()))
        expect = np.array([lut.get(int(d), 0) for d in probe], np.int64)
        assert np.array_equal(got, expect), term


def test_df_min_cutoff(champ_indexes, sf_unit):
    """With the Zipf-tail cutoff, low-df terms store NO champions, high-df
    terms keep exactly top-m, and results stay bit-identical (skipping a
    term's floor contributions only lowers the floor — still a valid bound).
    """
    import shutil as _sh

    r_off, _, _, fx = champ_indexes
    d = "/tmp/nmr_fair_dos_ray/test_index_champ_dfmin"
    _sh.rmtree(d, ignore_errors=True)
    df_min = 16
    build_index(
        sf_unit["corpus"], d,
        IndexConfig(champion_m=M, champion_df_min=df_min, **BASE),
    )
    r = IndexReader(d)
    assert r.has_champions
    lens = np.diff(r._c_off)
    dfs = r._df
    assert np.all(lens[dfs < df_min] == 0)
    np.testing.assert_array_equal(
        lens[dfs >= df_min], np.minimum(dfs[dfs >= df_min], M)
    )
    assert lens.sum() < dfs.sum()  # strictly smaller than full duplication
    s, s_off = Searcher(r), Searcher(r_off)
    for q in _queries(fx):
        assert s.search(q, k=10) == s_off.search(q, k=10), q


def test_seed_survives_resume(champ_indexes, sf_unit):
    import os

    _, r_on, _, _ = champ_indexes
    s_before = Searcher(r_on)
    q = "def return self"
    before = s_before.search(q, k=10)
    victim = sorted(os.listdir(f"{DIR_ON}/shards"))[1]
    os.remove(f"{DIR_ON}/shards/{victim}")
    build_index(sf_unit["corpus"], DIR_ON, IndexConfig(champion_m=M, **BASE))
    r2 = IndexReader(DIR_ON)
    assert r2.has_champions
    assert Searcher(r2).search(q, k=10) == before
