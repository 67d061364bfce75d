"""Champion-seeding benchmark: BMW qps/latency with and without champion
lists (IndexConfig.champion_m), same corpus, bit-identical results asserted.

Builds two indexes over the sf-bench fixture corpus (150k docs), runs the
fixture query set sequentially (p50/p99) and as a 5000-query shared-state
actor pool, champion seeding on vs off. Prints one JSON line; numbers
recorded in BASELINE.md.

Usage: RAY_GRAFT_CPUS=32 python tools/bench_champions.py [champion_m] [df_min]
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# keep worker heaps warm on this slow-first-touch VM (see bench.py)
_MALLOC_ENV = {"MALLOC_MMAP_THRESHOLD_": "1073741824", "MALLOC_TRIM_THRESHOLD_": "-1"}
if os.environ.get("MALLOC_MMAP_THRESHOLD_") != _MALLOC_ENV["MALLOC_MMAP_THRESHOLD_"]:
    os.execve(sys.executable, [sys.executable] + sys.argv, {**os.environ, **_MALLOC_ENV})

NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
M = int(sys.argv[1]) if len(sys.argv) > 1 else 32
DF_MIN = int(sys.argv[2]) if len(sys.argv) > 2 else None


def main() -> dict:
    import logging

    import numpy as np
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from nmr_fair_dos_ray.fixtures import fixture_dir
    from nmr_fair_dos_ray.pipelines.index_build import IndexConfig, build_index
    from nmr_fair_dos_ray.search.engine import IndexReader, QueryScorer, Searcher

    fx = fixture_dir("sf-bench")
    queries = [r["query"] for r in pq.read_table(fx["queries"]).to_pylist()]
    lat_queries = (queries * (200 // max(1, len(queries)) + 1))[:200]
    pool_queries = (queries * (5000 // max(1, len(queries)) + 1))[:5000]

    base = dict(token_cols=("path", "lang"), field_cols=("repo", "path", "lang"),
                stored_cols=("repo", "path", "commit", "lang"), num_shards=64)
    out: dict = {"metric": "champion_seeding_onoff", "champion_m": M,
                 "champion_df_min": DF_MIN, "num_cpus": NUM_CPUS, "n_docs": 0}
    results: dict[str, list] = {}
    searchers: dict[str, Searcher] = {}
    for name, m in (("off", 0), ("on", M)):
        idx = f"/tmp/nmr_fair_dos_ray/bench_champ_{name}"
        shutil.rmtree(idx, ignore_errors=True)
        t0 = time.time()
        man = build_index(
            fx["corpus"], idx,
            IndexConfig(champion_m=m, champion_df_min=DF_MIN, **base),
        )
        t_build = time.time() - t0
        out["n_docs"] = man["stats"]["n_docs"]
        s = Searcher(IndexReader(idx))
        assert s.use_champions == (m > 0)
        searchers[name] = s
        index_ref = ray.put(s.r.to_state())
        pool_kwargs = dict(
            fn_constructor_kwargs={"index_ref": index_ref},
            concurrency=max(2, NUM_CPUS), batch_size=32, batch_format="pyarrow",
        )
        warm = rd.from_items(
            [{"query_id": i, "query": q, "k": 10}
             for i, q in enumerate(pool_queries[: 16 * max(2, NUM_CPUS)])]
        )
        warm.map_batches(QueryScorer, **pool_kwargs).count()
        qds = rd.from_items(
            [{"query_id": i, "query": q, "k": 10}
             for i, q in enumerate(pool_queries)]
        )
        t0 = time.time()
        qds.map_batches(QueryScorer, **pool_kwargs).count()
        t_pool = time.time() - t0
        out[name] = {
            "build_sec": round(t_build, 3),
            "index_bytes": man["stats"]["shards_bytes"],
            "qps_pool": round(len(pool_queries) / t_pool, 1),
        }

    # ---- sequential latency: INTERLEAVED min-of-rounds (this VM has 2-4x
    # run-to-run noise; alternating configs within one process and keeping
    # the best round per config cancels it), plus a DETERMINISTIC work
    # metric: posting blocks decoded per query set (reader counter).
    for s in searchers.values():  # warm decode LRU + page cache, untimed
        for q in lat_queries[:50]:
            s.search(q, k=10, algorithm="bmw")
    walls: dict[str, list] = {"off": [], "on": []}
    lats: dict[str, list] = {"off": [], "on": []}
    for rnd in range(5):
        for name, s in searchers.items():
            s.r.blocks_decoded = 0
            per_q = []
            t0 = time.time()
            res = []
            for q in lat_queries:
                q0 = time.time()
                res.append(s.search(q, k=10, algorithm="bmw"))
                per_q.append((time.time() - q0) * 1000)
            walls[name].append(time.time() - t0)
            if min(walls[name]) == walls[name][-1]:
                lats[name] = per_q
            if rnd == 0:
                results[name] = res
                out[name]["blocks_decoded"] = int(s.r.blocks_decoded)
    for name in ("off", "on"):
        arr = np.array(lats[name])
        out[name]["p50_ms"] = round(float(np.percentile(arr, 50)), 2)
        out[name]["p99_ms"] = round(float(np.percentile(arr, 99)), 2)
        out[name]["seq_wall_best_sec"] = round(min(walls[name]), 3)

    # the whole point: seeding must not change a single result
    assert results["on"] == results["off"], "champion seeding changed results"
    out["results_identical"] = True
    out["qps_speedup"] = round(out["on"]["qps_pool"] / out["off"]["qps_pool"], 3)
    out["p50_speedup"] = round(out["off"]["p50_ms"] / out["on"]["p50_ms"], 3)
    out["seq_speedup"] = round(
        out["off"]["seq_wall_best_sec"] / out["on"]["seq_wall_best_sec"], 3
    )
    out["decode_ratio"] = round(
        out["off"]["blocks_decoded"] / max(1, out["on"]["blocks_decoded"]), 3
    )
    ray.shutdown()
    return out


if __name__ == "__main__":
    print(json.dumps(main()))
