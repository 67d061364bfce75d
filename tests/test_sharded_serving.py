"""Term-sharded scatter-gather serving must be bit-identical to local search
and actually partition the index across the actor pool."""

import numpy as np
import pyarrow.parquet as pq
import pytest
import ray

from nmr_fair_dos_ray.search.distributed import ShardedSearcher
from nmr_fair_dos_ray.search.engine import IndexReader, Searcher


@pytest.fixture(scope="module")
def sharded(sf_unit):
    import shutil

    from nmr_fair_dos_ray.pipelines.index_build import IndexConfig, build_index

    idx = "/tmp/nmr_fair_dos_ray/test_index_sharded"
    shutil.rmtree(idx, ignore_errors=True)
    cfg = IndexConfig(
        token_cols=("path", "lang"), field_cols=("repo", "path", "lang"),
        stored_cols=("repo",), num_shards=8,
        salt_hot_terms=True, hot_df_threshold=8, n_salts=2,
    )
    build_index(sf_unit["corpus"], idx, cfg)
    s = ShardedSearcher(idx, pool_size=3)
    yield s, idx, sf_unit
    s.shutdown()


def test_results_identical_to_local(sharded):
    s, idx, sf = sharded
    local = Searcher(IndexReader(idx))
    queries = [r["query"] for r in pq.read_table(sf["queries"]).to_pylist()]
    for q in queries:
        assert s.search(q, k=10) == local.search(q, k=10, algorithm="bmw"), q


def test_and_and_facets_identical_to_local(sharded):
    """Sharded conjunctive search and facet counts are bit-equal to local."""
    s, idx, sf = sharded
    local = Searcher(IndexReader(idx))
    queries = [r["query"] for r in pq.read_table(sf["queries"]).to_pylist()][:8]
    for q in queries:
        assert s.search_and(q, k=10) == local.search_and(q, k=10), q
        assert s.facet_counts(q, "lang") == local.facet_counts(q, "lang"), q
    # exact-filter + no-match edges
    lv = local.r.terms_with_prefix("lang:")[0]
    assert s.search_and(f"config {lv}", k=10) == local.search_and(
        f"config {lv}", k=10
    )
    # code mode splits "zzqxnope9" into ("zzqxnope", "9") and "9" can match,
    # so compare against local rather than asserting emptiness
    for miss in ("zzqxnope", "zzqxnope9"):
        assert s.search_and(miss, k=10) == local.search_and(miss, k=10)
        assert s.facet_counts(miss, "lang") == local.facet_counts(miss, "lang")


def test_sharded_best_fields_identical_to_local(sf_unit):
    import shutil

    from nmr_fair_dos_ray.pipelines.index_build import IndexConfig, build_index
    from nmr_fair_dos_ray.search.distributed import best_fields_search_sharded
    from nmr_fair_dos_ray.search.engine import best_fields_search

    dirs = {}
    for col in ("path", "lang"):
        d = f"/tmp/nmr_fair_dos_ray/test_bf_sharded_{col}"
        shutil.rmtree(d, ignore_errors=True)
        build_index(sf_unit["corpus"], d, IndexConfig(
            token_cols=(col,), field_cols=("repo",), stored_cols=("repo",),
            num_shards=4,
        ))
        dirs[col] = d
    locals_ = [Searcher(IndexReader(dirs[c])) for c in ("path", "lang")]
    pools = [ShardedSearcher(dirs[c], pool_size=2) for c in ("path", "lang")]
    try:
        for q in ("config python merge", "def return", "zzqxnope"):
            for tb in (0.0, 0.3):
                assert best_fields_search_sharded(
                    pools, q, k=20, tie_breaker=tb
                ) == best_fields_search(locals_, q, k=20, tie_breaker=tb), (q, tb)
    finally:
        for p in pools:
            p.shutdown()


def test_search_after_pages_identical_to_local(sharded):
    """Sharded cursor pagination is bit-equal to the local engine page by
    page, and a local cursor resumes on the pool (stateless cursors)."""
    s, idx, sf = sharded
    local = Searcher(IndexReader(idx))
    queries = [r["query"] for r in pq.read_table(sf["queries"]).to_pylist()][:4]
    for q in queries:
        cursor = None
        pages = 0
        while pages < 4:
            want = local.search_after(q, k=7, after=cursor)
            got = s.search_after(q, k=7, after=cursor)
            assert got == want, (q, cursor)
            if not want:
                break
            cursor = (want[-1][1], want[-1][0])
            pages += 1
    # pages partition the full ranking: page1 ∪ page2 == top-2k, disjoint
    q = queries[0]
    p1 = s.search_after(q, k=7)
    p2 = s.search_after(q, k=7, after=(p1[-1][1], p1[-1][0]))
    assert p1 + p2 == local.search(q, k=14, algorithm="taat")


def test_index_is_partitioned_not_replicated(sharded):
    s, idx, _ = sharded
    counts = ray.get([a.term_count.remote() for a in s.actors])
    # partitioned: the actors' disjoint slices add up to the full inventory,
    # and no single actor holds everything
    assert sum(counts) == len(IndexReader(idx).terms)
    assert max(counts) < sum(counts)


def test_query_scorer_shared_state_pool(sharded):
    """QueryScorer with index_ref (one object-store copy shared by all
    actors) must equal per-actor directory loads and the local searcher."""
    import ray.data as rd

    from nmr_fair_dos_ray.search.engine import QueryScorer

    _, idx, sf = sharded
    reader = IndexReader(idx)
    ref = ray.put(reader.to_state())
    queries = [r["query"] for r in pq.read_table(sf["queries"]).to_pylist()][:10]
    qds = rd.from_items(
        [{"query_id": i, "query": q, "k": 5} for i, q in enumerate(queries)]
    )
    out = qds.map_batches(
        QueryScorer, fn_constructor_kwargs={"index_ref": ref},
        concurrency=2, batch_size=4, batch_format="pyarrow",
    ).take_all()
    local = Searcher(reader)
    for i, q in enumerate(queries):
        got = [(r["doc_id"], r["score"]) for r in out if r["query_id"] == i]
        assert got == local.search(q, k=5), q


def test_memory_partitioned_bytes(sharded):
    """Each actor's Arrow-resident slice is ~1/pool of the total posting
    bytes — partitioned, not replicated (VERDICT #6)."""
    s, idx, _ = sharded
    sizes = ray.get([a.state_nbytes.remote() for a in s.actors])
    total = sum(sizes)
    assert total > 0
    # with 8 shards over 3 slots the worst slot holds 3/8 of the shards;
    # assert no actor approaches the whole index
    assert max(sizes) < 0.7 * total, sizes


def test_pruned_and_unpruned_identical(sharded):
    """The block-max threshold pushdown must not change any returned result
    (lossless pruning argument in the module docstring)."""
    s, idx, sf = sharded
    queries = [r["query"] for r in pq.read_table(sf["queries"]).to_pylist()]
    local = Searcher(IndexReader(idx))
    for q in queries:
        pruned = s.search(q, k=5, prune=True)
        unpruned = s.search(q, k=5, prune=False)
        assert pruned == unpruned == local.search(q, k=5, algorithm="bmw"), q


def test_term_meta_cache_eviction_not_lossy(sharded):
    """Crossing the router meta-cache cap mid-call must still return the
    metadata fetched in that very call (regression: the cache was cleared
    BEFORE building the return dict, silently yielding zero results)."""
    s, idx, sf = sharded
    queries = [r["query"] for r in pq.read_table(sf["queries"]).to_pylist()]
    multi = [q for q in queries
             if len(s.tokenizer.tokenize_query(q)[0]) > 1][:3]
    assert multi, "fixture has no multi-term queries"
    local = Searcher(IndexReader(idx))
    for q in multi:
        s._meta_cache.clear()
        # pre-fill with junk so the fetch in _term_meta crosses the cap
        s._meta_cache.update(
            {f"__pad_{i}": (1, 1.0) for i in range(65536)}
        )
        got = s.search(q, k=10)
        assert got == local.search(q, k=10, algorithm="bmw"), q
        assert len(s._meta_cache) <= 65536  # eviction did happen
    s._meta_cache.clear()


def test_query_scorer_result_cache_identical(sharded):
    """result_cache must not change any output, only skip recompute."""
    import ray.data as rd

    from nmr_fair_dos_ray.search.engine import QueryScorer

    _, idx, sf = sharded
    reader = IndexReader(idx)
    ref = ray.put(reader.to_state())
    queries = [r["query"] for r in pq.read_table(sf["queries"]).to_pylist()][:6]
    rows = [{"query_id": i, "query": q, "k": 5}
            for i, q in enumerate(queries * 3)]  # repeats exercise the cache
    qds = rd.from_items(rows)
    base = qds.map_batches(
        QueryScorer, fn_constructor_kwargs={"index_ref": ref},
        concurrency=1, batch_size=4, batch_format="pyarrow",
    ).to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    cached = qds.map_batches(
        QueryScorer, fn_constructor_kwargs={"index_ref": ref, "result_cache": 64},
        concurrency=1, batch_size=4, batch_format="pyarrow",
    ).to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert base.equals(cached)


def test_query_scorer_modes(sharded):
    """QueryScorer batches any query surface: per-row mode column, results
    identical to the single-query methods."""
    import ray.data as rd

    from nmr_fair_dos_ray.search.engine import QueryScorer

    import shutil

    from nmr_fair_dos_ray.pipelines.index_build import IndexConfig, build_index

    _, _, sf = sharded
    idx = "/tmp/nmr_fair_dos_ray/test_index_scorer_modes"
    shutil.rmtree(idx, ignore_errors=True)
    build_index(sf["corpus"], idx, IndexConfig(
        token_cols=("path", "lang"), field_cols=("repo", "lang"),
        stored_cols=("repo",), num_shards=4, store_positions=True,
    ))
    local = Searcher(IndexReader(idx))
    rows = [
        (0, "def return self", "bm25"),
        (1, "def config", "and"),
        (2, "user name", "phrase"),
        (3, "user name", "near"),
        (4, "conf", "prefix"),
        (5, "retrn", "fuzzy"),
        (6, 'def +config -merge', "query"),
    ]
    t = rd.from_items([
        {"query_id": q, "query": text, "mode": m} for q, text, m in rows
    ])
    out = t.map_batches(
        QueryScorer,
        fn_constructor_kwargs={"index_dir": idx, "k": 5, "slop": 2},
        batch_format="pyarrow", concurrency=1,
    ).to_pandas().sort_values(["query_id", "rank"])
    want = {
        0: local.search("def return self", k=5, algorithm="bmw"),
        1: local.search_and("def config", k=5),
        2: local.search_phrase("user name", k=5),
        3: local.search_near("user name", k=5, slop=2),
        4: local.search_prefix("conf", k=5),
        5: local.search_fuzzy("retrn", k=5),
        6: local.search_query('def +config -merge', k=5),
    }
    for qid, hits in want.items():
        sub = out[out["query_id"] == qid]
        assert sub["doc_id"].tolist() == [d for d, _ in hits], qid
        assert sub["score"].tolist() == [float(sc) for _, sc in hits], qid
