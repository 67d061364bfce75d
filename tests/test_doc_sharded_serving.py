"""Doc-partitioned scatter-gather serving (the ES/Lucene shard model):
every query mode must be bit-identical to the local Searcher at pool sizes
{2, 4, 8}, the router merge must be O(pool × k), and the actors must hold
disjoint doc ranges (partitioned posting bytes, not replicas)."""

import shutil

import pyarrow.parquet as pq
import pytest
import ray

from nmr_fair_dos_ray.pipelines.index_build import IndexConfig, build_index
from nmr_fair_dos_ray.search.distributed import DocShardedSearcher
from nmr_fair_dos_ray.search.engine import IndexReader, Searcher

IDX = "/tmp/nmr_fair_dos_ray/test_index_docsharded"


@pytest.fixture(scope="module")
def doc_sharded(sf_unit):
    shutil.rmtree(IDX, ignore_errors=True)
    cfg = IndexConfig(
        token_cols=("path", "lang"), field_cols=("repo", "path", "lang"),
        stored_cols=("repo",), num_shards=8, store_positions=True,
        salt_hot_terms=True, hot_df_threshold=8, n_salts=2,
        # small blocks so a 200-doc corpus genuinely exercises block-level
        # range pruning + boundary-bleed masking (128-doc blocks would all
        # span every range and nothing would prune)
        block_size=16,
    )
    build_index(sf_unit["corpus"], IDX, cfg)
    pools = {p: DocShardedSearcher(IDX, pool_size=p) for p in (2, 4, 8)}
    yield pools, sf_unit
    for p in pools.values():
        p.shutdown()


def test_all_modes_identical_to_local(doc_sharded):
    pools, sf = doc_sharded
    local = Searcher(IndexReader(IDX))
    queries = [r["query"] for r in pq.read_table(sf["queries"]).to_pylist()]
    lang_term = local.r.terms_with_prefix("lang:")[0]
    for p, pool in pools.items():
        for q in queries:
            assert pool.search(q, k=10) == local.search(q, k=10), (p, q)
        for q in queries[:6]:
            assert pool.search_and(q, k=10) == local.search_and(q, k=10), (p, q)
            assert pool.count(q) == local.count(q), (p, q)
            assert pool.facet_counts(q, "lang") == \
                local.facet_counts(q, "lang"), (p, q)
        # exact filters (field:value atoms) and misses
        for q in (f"config {lang_term}", lang_term, "zzqxnope"):
            assert pool.search(q, k=10) == local.search(q, k=10), (p, q)
        # positional surface: phrase / near ordered+unordered
        for phrase in ("user name", "def config"):
            assert pool.search_phrase(phrase, k=10) == \
                local.search_phrase(phrase, k=10), (p, phrase)
            for slop in (0, 2):
                assert pool.search_near(phrase, k=10, slop=slop) == \
                    local.search_near(phrase, k=10, slop=slop), (p, phrase)
                assert pool.search_near(phrase, k=10, slop=slop, ordered=False) \
                    == local.search_near(phrase, k=10, slop=slop,
                                         ordered=False), (p, phrase)
        # expansions + query-string grammar
        assert pool.search_prefix("conf", k=10) == local.search_prefix("conf", k=10)
        assert pool.search_regex("get.*", k=10) == local.search_regex("get.*", k=10)
        assert pool.search_wildcard("get*", k=10) == \
            local.search_wildcard("get*", k=10)
        assert pool.search_fuzzy("retrn merge", k=10) == \
            local.search_fuzzy("retrn merge", k=10)
        q = 'merge -lang:go user* +"user name"'
        assert pool.search_query(q, k=10) == local.search_query(q, k=10), p


def test_search_after_pages_identical(doc_sharded):
    pools, sf = doc_sharded
    local = Searcher(IndexReader(IDX))
    queries = [r["query"] for r in pq.read_table(sf["queries"]).to_pylist()][:4]
    pool = pools[4]
    for q in queries:
        cursor = None
        for _ in range(4):
            want = local.search_after(q, k=7, after=cursor)
            assert pool.search_after(q, k=7, after=cursor) == want, (q, cursor)
            if not want:
                break
            cursor = (want[-1][1], want[-1][0])


def test_doc_ranges_partition_the_corpus(doc_sharded):
    """Ranges are disjoint, cover every doc, and each actor's reader only
    ever RETURNS docs in its range (boundary-block bleed is masked)."""
    pools, sf = doc_sharded
    pool = pools[4]
    corpus_ids = sorted(
        pq.read_table(sf["corpus"], columns=["doc_id"])["doc_id"].to_pylist()
    ) if "doc_id" in pq.read_schema(sf["corpus"]).names else None
    lo0 = pool.ranges[0][0]
    hi_last = pool.ranges[-1][1]
    for (a_lo, a_hi), (b_lo, b_hi) in zip(pool.ranges, pool.ranges[1:]):
        assert a_hi == b_lo  # contiguous, disjoint
        assert a_lo < a_hi
    r = IndexReader(IDX)
    assert lo0 == int(r._doc_ids_sorted[0])
    assert hi_last == int(r._doc_ids_sorted[-1]) + 1
    # per-actor result containment on a match-everything-ish query
    futs = [a.search.remote("def return config user", 10_000, "taat")
            for a in pool.actors]
    for (lo, hi), hits in zip(pool.ranges, ray.get(futs)):
        assert all(lo <= d < hi for d, _ in hits), (lo, hi)
    # union over actors == local full match set
    local = Searcher(r)
    got = sorted(d for hits in ray.get(futs) for d, _ in hits)
    want = sorted(d for d, _ in local.search("def return config user",
                                             k=10_000, algorithm="taat"))
    assert got == want


def test_doc_range_state_is_sliced_not_replicated(doc_sharded):
    """Each actor's state holds ~1/pool of the posting bytes: block-level
    pruning genuinely slices (kept whole-blocks only bleed at range edges)."""
    from nmr_fair_dos_ray.search.engine import _binary_views

    pools, _ = doc_sharded
    pool = pools[4]
    full = IndexReader.build_state(IDX)
    full_bytes = _binary_views(full["b_docs"])[1].size
    slice_bytes = []
    for lo, hi in pool.ranges:
        st = IndexReader.build_state(IDX, doc_range=(lo, hi))
        slice_bytes.append(_binary_views(st["b_docs"])[1].size)
    # bleed is bounded by one block per term per edge; on this corpus the
    # slices must each be well under half the full index
    assert max(slice_bytes) < 0.6 * full_bytes, (slice_bytes, full_bytes)


def test_doc_sharded_with_tombstones(doc_sharded, sf_unit):
    """Deletes compose with range slicing: a fresh pool over an index with
    tombstones matches the local searcher's post-delete results."""
    from nmr_fair_dos_ray.pipelines.lifecycle import delete_docs

    idx2 = "/tmp/nmr_fair_dos_ray/test_index_docsharded_del"
    shutil.rmtree(idx2, ignore_errors=True)
    build_index(sf_unit["corpus"], idx2, IndexConfig(
        token_cols=("path", "lang"), field_cols=("repo", "lang"),
        stored_cols=("repo",), num_shards=4, store_positions=True,
    ))
    local_pre = Searcher(IndexReader(idx2))
    victims = [d for d, _ in local_pre.search("def return", k=3)]
    delete_docs(idx2, victims)
    local = Searcher(IndexReader(idx2))
    pool = DocShardedSearcher(idx2, pool_size=3)
    try:
        for q in ("def return", "config python", "user name"):
            assert pool.search(q, k=10) == local.search(q, k=10), q
        assert pool.search_phrase("user name", k=10) == \
            local.search_phrase("user name", k=10)
        assert pool.count("def return") == local.count("def return")
    finally:
        pool.shutdown()


def test_positions_unavailable_raises(sf_unit):
    idx3 = "/tmp/nmr_fair_dos_ray/test_index_docsharded_nopos"
    shutil.rmtree(idx3, ignore_errors=True)
    build_index(sf_unit["corpus"], idx3, IndexConfig(
        token_cols=("path",), field_cols=("repo",), stored_cols=("repo",),
        num_shards=4,
    ))
    pool = DocShardedSearcher(idx3, pool_size=2)
    try:
        with pytest.raises(ValueError, match="store_positions"):
            pool.search_phrase("user name", k=5)
        with pytest.raises(ValueError, match="store_positions"):
            pool.search_near("user name", k=5, slop=1)
    finally:
        pool.shutdown()


def test_cursor_masked_cache_exhaustion_regression(doc_sharded):
    """BMW over a doc-range reader whose postings LRU holds MASKED lists:
    next_geq targets past the masked end (but inside the raw doc_last
    metadata) must exhaust the cursor, not index past the array. Found by
    the sharding bench at 50k docs; also reachable with tombstones."""
    pools, sf = doc_sharded
    lo, hi = pools[2].ranges[0]
    r = IndexReader.from_state(IndexReader.build_state(IDX, doc_range=(lo, hi)))
    s = Searcher(r)
    local = Searcher(IndexReader(IDX))
    queries = [row["query"] for row in pq.read_table(sf["queries"]).to_pylist()]
    for q in queries:
        s.search_and(q, k=10)  # warm the masked postings cache via TAAT
        got = s.search(q, k=10, algorithm="bmw")
        full = local.search(q, k=100_000, algorithm="taat")
        want = [(d, sc) for d, sc in full if lo <= d < hi][:10]
        assert got == want, q


def test_doc_sharded_best_fields_identical_to_local(sf_unit):
    """Multi-field dis-max over the range pool: each actor holds ALL field
    slices for its range, so the router merge stays O(pool*k)."""
    from nmr_fair_dos_ray.search.engine import best_fields_search

    dirs = {}
    for col in ("path", "lang"):
        d = f"/tmp/nmr_fair_dos_ray/test_bf_docsharded_{col}"
        shutil.rmtree(d, ignore_errors=True)
        build_index(sf_unit["corpus"], d, IndexConfig(
            token_cols=(col,), field_cols=("repo",), stored_cols=("repo",),
            num_shards=4, block_size=16,
        ))
        dirs[col] = d
    locals_ = [Searcher(IndexReader(dirs[c])) for c in ("path", "lang")]
    pool = DocShardedSearcher(dirs["path"], pool_size=3,
                              field_dirs=[dirs["lang"]])
    try:
        for q in ("config python merge", "def return", "zzqxnope"):
            for tb in (0.0, 0.3):
                assert pool.best_fields(q, k=20, tie_breaker=tb) == \
                    best_fields_search(locals_, q, k=20, tie_breaker=tb), (q, tb)
    finally:
        pool.shutdown()
