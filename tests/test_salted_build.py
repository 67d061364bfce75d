"""Hot-term salted repartitioning (north_rule skew handling).

A build with salting enabled must be semantically identical to the unsalted
build: same term inventory, same df/cf, same decoded postings, bit-identical
top-k scores — the only difference is the physical grouping of the shuffle
(hot terms merged per doc-range sub-group, concatenated in the finalize
pass). Also validates every stored block max_score is a true upper bound.
"""

import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

from nmr_fair_dos_ray.pipelines.index_build import IndexConfig, build_index
from nmr_fair_dos_ray.search.bm25 import bm25_term_scores
from nmr_fair_dos_ray.search.engine import IndexReader, Searcher

BASE = dict(
    token_cols=("path", "lang"),
    field_cols=("repo", "lang"),
    stored_cols=("repo", "path"),
    num_shards=4,
)
DIR_PLAIN = "/tmp/nmr_fair_dos_ray/test_index_plain"
DIR_SALT = "/tmp/nmr_fair_dos_ray/test_index_salted"


@pytest.fixture(scope="module")
def both_indexes(sf_unit):
    shutil.rmtree(DIR_PLAIN, ignore_errors=True)
    shutil.rmtree(DIR_SALT, ignore_errors=True)
    cfg_plain = IndexConfig(salt_hot_terms=False, **BASE)
    # tiny threshold so plenty of terms actually go through the salted path
    cfg_salt = IndexConfig(salt_hot_terms=True, hot_df_threshold=8, n_salts=3, **BASE)
    build_index(sf_unit["corpus"], DIR_PLAIN, cfg_plain)
    man = build_index(sf_unit["corpus"], DIR_SALT, cfg_salt)
    return IndexReader(DIR_PLAIN), IndexReader(DIR_SALT), man, sf_unit


def test_salting_triggered(both_indexes):
    _, _, man, _ = both_indexes
    assert man["stages"]["hot"]["n_hot"] > 0, "fixture corpus must have hot terms"
    assert man["stages"]["hotmerge"]["status"] == "done"


def test_same_term_inventory_and_postings(both_indexes):
    plain, salted, _, _ = both_indexes
    assert set(plain.terms) == set(salted.terms)
    for term, entry in plain.terms.items():
        s_entry = salted.terms[term]
        assert entry["df"] == s_entry["df"], term
        d1, t1 = plain.postings(term)
        d2, t2 = salted.postings(term)
        np.testing.assert_array_equal(d1, d2)
        np.testing.assert_array_equal(t1, t2)


def test_block_max_is_true_upper_bound(both_indexes):
    from nmr_fair_dos_ray.codec import decode_block

    _, salted, _, _ = both_indexes
    for term, entry in salted.terms.items():
        idf = salted.idf(term)
        for blk in entry["blocks"]:
            docs, tfs = decode_block(blk)
            scores = bm25_term_scores(
                tfs, salted.doclens(docs), idf, salted.k1, salted.b, salted.avgdl
            )
            # exact: score == idf * tf_norm bit-identically (bm25.py keeps
            # the same float64 association as the stored bound)
            assert scores.max() <= blk["max_score"], term


def test_identical_topk(both_indexes):
    plain, salted, _, sf = both_indexes
    queries = [r["query"] for r in pq.read_table(sf["queries"]).to_pylist()]
    sp, ss = Searcher(plain), Searcher(salted)
    for q in queries:
        for algo in ("taat", "bmw"):
            hp = sp.search(q, k=10, algorithm=algo)
            hs = ss.search(q, k=10, algorithm=algo)
            assert hp == hs, (q, algo)


def test_salted_resume_identical(both_indexes, sf_unit):
    """Interrupt after phase 1 + partial phase 2; resume must finish to the
    same inventory (manifest-driven skip covers the hot path too)."""
    import glob
    import os

    _, salted, _, _ = both_indexes
    dir_resume = "/tmp/nmr_fair_dos_ray/test_index_salted_resume"
    shutil.rmtree(dir_resume, ignore_errors=True)
    cfg = IndexConfig(salt_hot_terms=True, hot_df_threshold=8, n_salts=3, **BASE)
    build_index(sf_unit["corpus"], dir_resume, cfg)
    # simulate a crash that lost some phase-2 outputs (manifest says done,
    # files gone → done_partitions drops them → they rebuild)
    victims = sorted(glob.glob(os.path.join(dir_resume, "shards", "shard_0000*.parquet")))[:2]
    victims += sorted(glob.glob(os.path.join(dir_resume, "hotparts", "*.parquet")))[:2]
    for v in victims:
        os.unlink(v)
    # drop the stage-done flags so the build re-enters phase 2/3
    import json

    mp = os.path.join(dir_resume, "manifest.json")
    man = json.load(open(mp))
    man["stages"]["shards"].pop("status", None)
    man["stages"].pop("hotmerge", None)
    json.dump(man, open(mp, "w"))
    build_index(sf_unit["corpus"], dir_resume, cfg, resume=True)
    resumed = IndexReader(dir_resume)
    assert set(resumed.terms) == set(salted.terms)
    for term in salted.terms:
        d1, t1 = salted.postings(term)
        d2, t2 = resumed.postings(term)
        np.testing.assert_array_equal(d1, d2)
        np.testing.assert_array_equal(t1, t2)
