"""Incremental append: adding corpus files after the existing ones (in sort
order) must reuse every existing phase-1 partition untouched, re-run only the
merge stages, and produce an index identical to a from-scratch build over the
full corpus (reference analog: ES incremental add, SURVEY.md §2.2 K1)."""

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nmr_fair_dos_ray.fixtures import make_corpus
from nmr_fair_dos_ray.pipelines.index_build import IndexConfig, build_index
from nmr_fair_dos_ray.search.engine import IndexReader, Searcher

BASE = "/tmp/nmr_fair_dos_ray/test_incr"
CFG = IndexConfig(
    token_cols=("path", "lang"), field_cols=("repo", "lang"),
    stored_cols=("repo", "path"), num_shards=4,
)


@pytest.fixture(scope="module")
def corpus_dirs():
    shutil.rmtree(BASE, ignore_errors=True)
    os.makedirs(f"{BASE}/grow", exist_ok=True)
    os.makedirs(f"{BASE}/full", exist_ok=True)
    # two initial files + one appended file (named to sort AFTER the others)
    src = make_corpus(300, f"{BASE}/src.parquet", rows_per_group=100)
    t = pq.read_table(src)
    pq.write_table(t.slice(0, 100), f"{BASE}/grow/a.parquet", row_group_size=50)
    pq.write_table(t.slice(100, 100), f"{BASE}/grow/b.parquet", row_group_size=50)
    pq.write_table(t.slice(0, 100), f"{BASE}/full/a.parquet", row_group_size=50)
    pq.write_table(t.slice(100, 100), f"{BASE}/full/b.parquet", row_group_size=50)
    pq.write_table(t.slice(200, 100), f"{BASE}/full/c.parquet", row_group_size=50)
    return t


def test_append_reuses_invert_and_matches_full_build(corpus_dirs):
    t = corpus_dirs
    idx_grow = f"{BASE}/idx_grow"
    idx_full = f"{BASE}/idx_full"
    build_index(f"{BASE}/grow", idx_grow, CFG)
    run0 = os.path.join(idx_grow, "runs", "run_000000.parquet")
    mtime_before = os.path.getmtime(run0)

    # append file c (sorts after a, b) and rebuild incrementally
    pq.write_table(t.slice(200, 100), f"{BASE}/grow/c.parquet", row_group_size=50)
    man = build_index(f"{BASE}/grow", idx_grow, CFG, resume=True)
    assert os.path.getmtime(run0) == mtime_before, "existing run was rebuilt"
    assert man["stats"]["n_docs"] == 300

    build_index(f"{BASE}/full", idx_full, CFG)
    rg, rf = IndexReader(idx_grow), IndexReader(idx_full)
    assert set(rg.terms) == set(rf.terms)
    for term in rf.terms:
        dg, tg = rg.postings(term)
        dff, tf = rf.postings(term)
        np.testing.assert_array_equal(dg, dff)
        np.testing.assert_array_equal(tg, tf)
    sg, sf_ = Searcher(rg), Searcher(rf)
    for q in ("def return config", "getUserName merge", "data_loader"):
        assert sg.search(q, k=10) == sf_.search(q, k=10)
        # post-append BMW top-k must be bit-identical to the from-scratch
        # build's (block bounds are rebuilt in the merge, not carried over)
        assert sg.search(q, k=10, algorithm="bmw") \
            == sf_.search(q, k=10, algorithm="bmw")


def test_mid_order_insert_degrades_to_full_rebuild(corpus_dirs):
    """A file inserted BETWEEN existing ones shifts docID bases — the build
    must detect it and produce correct results (full rebuild path)."""
    t = corpus_dirs
    d = f"{BASE}/mid"
    os.makedirs(d, exist_ok=True)
    pq.write_table(t.slice(0, 100), f"{d}/a.parquet", row_group_size=50)
    pq.write_table(t.slice(200, 100), f"{d}/c.parquet", row_group_size=50)
    idx = f"{BASE}/idx_mid"
    build_index(d, idx, CFG)
    pq.write_table(t.slice(100, 100), f"{d}/b.parquet", row_group_size=50)
    build_index(d, idx, CFG, resume=True)
    rf = IndexReader(f"{BASE}/idx_full")
    rm = IndexReader(idx)
    assert rm.n_docs == 300
    assert set(rm.terms) == set(rf.terms)
    for q in ("def return config", "getUserName merge"):
        assert Searcher(rm).search(q, k=10) == Searcher(rf).search(q, k=10)
