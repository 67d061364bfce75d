"""Micro-bench: vectorized flatten_records collapse vs the round-2
per-(pid, field) Python loop, on a synthetic 500k-entry slice.

Usage: python tools/bench_flatten.py [n_entries]
Prints one JSON line; numbers recorded in BASELINE.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd


def make_slice(n_entries: int) -> pd.DataFrame:
    rng = np.random.RandomState(7)
    n_pids = max(1, n_entries // 15)  # ~15 fields/record like the fixtures
    pids = np.array([f"pid{i:07d}" for i in range(n_pids)])
    fields = np.array([f"field{i}" for i in range(18)])
    return pd.DataFrame({
        "pid": pids[rng.randint(0, n_pids, n_entries)],
        "field": fields[rng.randint(0, 18, n_entries)],
        "value_json": [f'"v{v}"' for v in rng.randint(0, 40, n_entries)],
    })


def loop_collapse(g: pd.DataFrame) -> pd.DataFrame:
    """The round-2 implementation (records.py@5d0f5f7:94-104), verbatim."""
    ALWAYS_AS_LIST = {"isMetadataFor", "hasMetadata", "contact"}
    rows = []
    for (pid, field), grp in g.groupby(["pid", "field"], sort=False):
        vals = sorted(set(grp["value_json"].tolist()))
        rows.append(
            (pid, field, vals, len(vals),
             field in ALWAYS_AS_LIST or len(vals) > 1)
        )
    return pd.DataFrame(
        rows, columns=["pid", "field", "values", "n_values", "as_list"]
    )


def main() -> None:
    from nmr_fair_dos_ray.pipelines import records as R

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    g = make_slice(n)
    g["part_id"] = 0

    # capture the in-partition collapse closure exactly as the stage runs it
    import ray.data  # noqa: F401  (records imports Dataset types)

    captured = {}
    real_map_groups = None

    class _FakeGrouped:
        def __init__(self, inner):
            self._inner = inner

        def map_groups(self, fn, **kw):
            captured["fn"] = fn
            return None

    class _FakeDs:
        def map_batches(self, fn, **kw):
            return self

        def groupby(self, key):
            return _FakeGrouped(self)

    R.flatten_records(_FakeDs(), now_iso="2026-01-01T00:00:00")
    vec_fn = captured["fn"]

    def timeit(fn, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(g)
            best = min(best, time.perf_counter() - t0)
        return best, out

    t_loop, out_loop = timeit(loop_collapse)
    t_vec, out_vec = timeit(vec_fn)

    # sanity: identical collapsed groups (ignore the new timestamp rows and
    # list container type differences)
    import pyarrow as pa

    vec_df = out_vec.to_pandas() if isinstance(out_vec, pa.Table) else out_vec
    vec_cmp = (
        vec_df[vec_df["field"] != "timestamp"]
        .assign(values=lambda d: d["values"].map(tuple))
        .sort_values(["pid", "field"]).reset_index(drop=True)
    )
    loop_cmp = (
        out_loop.assign(values=lambda d: d["values"].map(tuple))
        .sort_values(["pid", "field"]).reset_index(drop=True)
    )
    assert len(vec_cmp) == len(loop_cmp)
    assert (vec_cmp["values"].values == loop_cmp["values"].values).all()
    assert (vec_cmp["n_values"].values == loop_cmp["n_values"].values).all()

    print(json.dumps({
        "metric": "flatten_collapse_microbench",
        "n_entries": n,
        "loop_sec": round(t_loop, 3),
        "vectorized_sec": round(t_vec, 3),
        "speedup": round(t_loop / t_vec, 2),
    }))


if __name__ == "__main__":
    main()
