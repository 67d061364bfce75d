"""PIDRecord data-processing operators in long format, Ray-Data-native.

The reference's core record type is a multimap ``pid -> {key -> [entries]}``
(reference: src/nmr_FAIR_DOs/domain/pid_record.py:28-69) mutated through
module-global lists and callbacks (src/nmr_FAIR_DOs/lib.py:60-63,120-274).
Here every operation is a Dataset transform over the long format
``(pid, key, name, value_json)`` — exactly the reference's own
``exportSimpleFormatJSON`` shape (pid_record.py:301-316) — so dedup, merge,
argmax and the relationship join become vectorized groupbys/joins instead of
shared mutable state (SURVEY.md §1.4, §2.6 J1, §2.7 A1-A3).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Count, Max, Min

# Data-type PIDs the reference treats specially (observed key set).
KEY_DIGITAL_OBJECT_LOCATION = "21.T11148/b8457812905b83046284"
KEY_HAS_METADATA = "21.T11148/d0773859091aeb451528"
KEY_IS_METADATA_FOR = "21.T11148/4fe7cde52629b61e3b82"
KEY_PRIMARY_SOURCE = "21.T11148/a753134738da82809fc1"

#: DTR key → human-readable name (reference: src/nmr_FAIR_DOs/domain/dataType.py:29-65
#: resolves these via network; here a broadcast static dict — SURVEY.md §2.6 J4).
DTR_NAMES = {
    KEY_DIGITAL_OBJECT_LOCATION: "digitalObjectLocation",
    "21.T11148/6ae999552a0d2dca14d6": "name",
    KEY_HAS_METADATA: "hasMetadata",
    KEY_IS_METADATA_FOR: "isMetadataFor",
    "21.T11148/aafd5fb4c7222e2d950a": "dateCreated",
    "21.T11148/397d831aa3a9d18eb52c": "dateModified",
    "21.T11969/d15381199a44a16dc88d": "characterizedCompound",
    "21.T11148/1c699a5d1b4ad3ba4956": "digitalObjectType",
    "21.T11148/076759916209e5d62bd5": "kernelInformationProfile",
    KEY_PRIMARY_SOURCE: "hadPrimarySource",
    "21.T11148/1a73af9e7ae00182733b": "contact",
    # inner compound-value keys (reference resolves these through the DTR
    # like any other; names per the reference's own inline comments —
    # nmrxiv.py:656-666 "molecular weight" / "PubChem-URL")
    "21.T11969/6c4d3deac9a49b65886a": "molecularWeight",
    "21.T11969/f9cb9b53273ce0da7739": "pubchemUrl",
}

#: dateCreated key — source of the flattened doc's ``timestamp`` field
#: (reference: src/nmr_FAIR_DOs/connectors/elasticsearch.py:116-124).
KEY_DATE_CREATED = "21.T11148/aafd5fb4c7222e2d950a"

#: Keys whose flattened value is always a list
#: (reference: src/nmr_FAIR_DOs/connectors/elasticsearch.py:38).
ALWAYS_AS_LIST = {"isMetadataFor", "hasMetadata", "contact"}


# ----------------------------------------------------------- A1: dedup/merge
def dedup_merge(records: Dataset) -> Dataset:
    """Exact dedup + merge by pid in long format.

    Reference semantics: collision merge unions entries with per-(key,value)
    dedup (src/nmr_FAIR_DOs/lib.py:502-527; pid_record.py:369-402,92-109).
    The reference keeps the *first-seen* name per (key,value) — insertion-order
    dependent; for parallel determinism we keep the minimum non-null name
    (canonical order, SURVEY.md §2.10). One hash-partitioned groupby.
    """
    return records.groupby(["pid", "key", "value_json"]).aggregate(
        Min("name", alias_name="name")
    )


# --------------------------------------------------- M12: flatten + rename
def flatten_records(records: Dataset, now_iso: str | None = None) -> Dataset:
    """ES-doc projection: DTR-renamed keys, dict values exploded to
    ``key.subkey`` fields, repeated values collapsed to lists, and a
    per-record ``timestamp`` field (dateCreated, else "now").

    Reference: src/nmr_FAIR_DOs/connectors/elasticsearch.py:41-124 — dict-
    valued entries never surface under their own key; each non-null inner
    (k, v) becomes ``f"{name(key)}.{name(k)}"`` (:87-106), and every doc is
    stamped with ``timestamp`` = first dateCreated value or the wall clock
    (:116-124). Pass ``now_iso`` to make the fallback deterministic (oracle
    runs do); the reference's insertion-order list build is canonicalized to
    sorted-distinct as everywhere else in this repo.

    Output is the long "searchable doc" table ``(pid, field,
    values: list<string>, n_values, as_list)``; dynamic (open key set) so
    the wide form stays long. One coarse hash(pid) shuffle; the per-(pid,
    field) collapse is ONE sort + run-boundary scan per partition — no
    per-group Python (VERDICT round-2 item 2).
    """
    import json as _json

    if now_iso is None:
        from datetime import datetime

        now_iso = datetime.now().isoformat()
    now_json = _json.dumps(now_iso)

    n_parts = 32

    def rename(batch: pa.Table) -> pa.Table:
        from nmr_fair_dos_ray.tokenizer import term_hash

        keys = batch["key"].to_pylist()
        fields = np.array([DTR_NAMES.get(k, k) for k in keys], object)
        vj_col = (batch["value_json"].combine_chunks()
                  if isinstance(batch["value_json"], pa.ChunkedArray)
                  else batch["value_json"])
        is_dict = pc.starts_with(vj_col, "{").to_numpy(zero_copy_only=False)
        pid_col = (batch["pid"].combine_chunks()
                   if isinstance(batch["pid"], pa.ChunkedArray)
                   else batch["pid"])
        if is_dict.any():
            # dict-valued rows are the rare case (compound values): only
            # they pay the per-row JSON parse; scalars stay vectorized
            pids_py = pid_col.to_pylist()
            vals_py = vj_col.to_pylist()
            keep = ~is_dict
            out_pid = list(np.asarray(pids_py, object)[keep])
            out_field = list(fields[keep])
            out_val = list(np.asarray(vals_py, object)[keep])
            for i in np.flatnonzero(is_dict):
                try:
                    d = _json.loads(vals_py[i])
                except (ValueError, TypeError):
                    d = None
                if not isinstance(d, dict):  # defensive: treat as scalar
                    out_pid.append(pids_py[i])
                    out_field.append(fields[i])
                    out_val.append(vals_py[i])
                    continue
                for k, v in d.items():
                    if v is None:
                        continue
                    out_pid.append(pids_py[i])
                    out_field.append(f"{fields[i]}.{DTR_NAMES.get(k, k)}")
                    out_val.append(_json.dumps(v, separators=(",", ":")))
            pid_arr = pa.array(out_pid, pa.string())
            field_arr = pa.array(out_field, pa.string())
            val_arr = pa.array(out_val, pa.string())
        else:
            pid_arr = pid_col
            field_arr = pa.array(fields, pa.string())
            val_arr = vj_col
        # ONE coarse shuffle key (pid hash): the (pid, field) groups resolve
        # inside each partition — per-group map_groups overhead across
        # n_records × n_fields tiny groups dominated this stage otherwise
        part = (term_hash(pid_arr) % np.uint64(n_parts)).astype(np.int64)
        return pa.table({
            "part_id": pa.array(part),
            "pid": pid_arr,
            "field": field_arr,
            "value_json": val_arr,
        })

    renamed = records.map_batches(rename, batch_format="pyarrow")

    def collapse_partition(g: pd.DataFrame) -> pa.Table:
        # vectorized collapse: one sort, run boundaries by shift-compare,
        # list column via ListArray offsets (pattern: relational.py
        # sessionization) — replaces the per-(pid, field) Python loop
        sub = g[["pid", "field", "value_json"]].drop_duplicates()
        sub = sub.sort_values(["pid", "field", "value_json"])
        n = len(sub)
        if n == 0:
            return pa.table({
                "pid": pa.array([], pa.string()),
                "field": pa.array([], pa.string()),
                "values": pa.array([], pa.list_(pa.string())),
                "n_values": pa.array([], pa.int64()),
                "as_list": pa.array([], pa.bool_()),
            })
        pidv = sub["pid"].to_numpy()
        fld = sub["field"].to_numpy()
        val = sub["value_json"].to_numpy()
        newgrp = np.ones(n, bool)
        newgrp[1:] = (pidv[1:] != pidv[:-1]) | (fld[1:] != fld[:-1])
        starts = np.flatnonzero(newgrp)
        counts = np.diff(np.append(starts, n))
        g_pid, g_fld = pidv[starts], fld[starts]
        # timestamp per pid: first (= min, runs are sorted) dateCreated
        # value, else the injected/now fallback — all of a pid's rows are in
        # this partition because the shuffle key is hash(pid)
        pid_starts = np.ones(len(starts), bool)
        pid_starts[1:] = g_pid[1:] != g_pid[:-1]
        uniq_pids = g_pid[pid_starts]
        dc = g_fld == "dateCreated"
        dc_pids, dc_vals = g_pid[dc], val[starts[dc]]
        ts_vals = np.full(len(uniq_pids), now_json, object)
        if dc_pids.size:
            idx = np.searchsorted(dc_pids, uniq_pids)
            idx_c = np.minimum(idx, dc_pids.size - 1)
            has = dc_pids[idx_c] == uniq_pids
            ts_vals[has] = dc_vals[idx_c[has]]
        # assemble: collapsed runs then one timestamp row per pid
        offsets = np.concatenate(
            [starts, n + np.arange(len(uniq_pids) + 1)]
        ).astype(np.int32)
        values = pa.ListArray.from_arrays(
            pa.array(offsets),
            pa.array(np.concatenate([val, ts_vals]), pa.string()),
        )
        as_list = np.isin(g_fld, sorted(ALWAYS_AS_LIST)) | (counts > 1)
        return pa.table({
            "pid": pa.array(np.concatenate([g_pid, uniq_pids]), pa.string()),
            "field": pa.array(
                np.concatenate(
                    [g_fld, np.full(len(uniq_pids), "timestamp", object)]
                ),
                pa.string(),
            ),
            "values": values,
            "n_values": pa.array(
                np.concatenate(
                    [counts, np.ones(len(uniq_pids), np.int64)]
                ).astype(np.int64)
            ),
            "as_list": pa.array(
                np.concatenate([as_list, np.zeros(len(uniq_pids), bool)])
            ),
        })

    return renamed.groupby("part_id").map_groups(
        collapse_partition, batch_format="pandas"
    )


# ------------------------------------------------------- A2/A3: reductions
def _argmax_first(ds: Dataset, value_col: str) -> Dataset:
    """argmax by (value desc, pid asc) WITHOUT a global sort: per-block
    partial argmax inside map_batches, then a driver merge of one row per
    block (the top-k-without-shuffle pattern; a Dataset.sort here is an
    all-to-all paying only for row 1)."""
    import numpy as np
    import ray.data as rd

    def block_best(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        vals = b[value_col].to_numpy(zero_copy_only=False)
        pids = b["pid"].to_numpy(zero_copy_only=False)
        i = int(np.lexsort((pids, -vals))[0])
        return b.take(pa.array([i]))

    parts = ds.map_batches(block_best, batch_format="pyarrow").to_pandas()
    best = parts.sort_values([value_col, "pid"], ascending=[False, True]).head(1)
    return rd.from_pandas(best.reset_index(drop=True))


def biggest_record(records: Dataset) -> Dataset:
    """argmax over records of max entries-per-key
    (reference `extractBiggestFAIRDO`, src/nmr_FAIR_DOs/lib.py:652-685)."""
    per_key = records.groupby(["pid", "key"]).aggregate(Count(alias_name="n_entries"))
    per_pid = per_key.groupby("pid").aggregate(Max("n_entries", alias_name="max_entries"))
    return _argmax_first(per_pid, "max_entries")


def most_datatypes(records: Dataset) -> Dataset:
    """argmax of distinct keys per record
    (reference `extractRecordWithMostDataTypes`, src/nmr_FAIR_DOs/lib.py:688-718)."""
    distinct = records.groupby(["pid", "key"]).aggregate(Count(alias_name="_c"))
    per_pid = distinct.groupby("pid").aggregate(Count(alias_name="n_datatypes"))
    return _argmax_first(per_pid, "n_datatypes")


# ------------------------------------------------- J1: two-key edge resolve

#: lookup sides at or below this many keys (distinct pids + location rows)
#: resolve via the broadcast path — one ray.put, zero shuffles; beyond it
#: the hash-partitioned `resolve_edges_join` runs (same auto-gate pattern
#: as dedup.MINHASH_DRIVER_VERIFY_MAX_PAIRS)
RESOLVE_BROADCAST_MAX_KEYS = 2_000_000


def resolve_edges(edges: Dataset, records: Dataset, mode: str = "auto") -> Dataset:
    """The reference's `addRelationship` lookup-join, as data (no callbacks).

    Reference: src/nmr_FAIR_DOs/lib.py:120-274 — an entry batch targets a
    record by exact PID *or* by digitalObjectLocation, probed in priority
    order, with a retry queue (`future_entries`, lib.py:250-261,343-371) whose
    unresolved remainder dead-letters into `errors`.

    Here: two broadcast-hash lookups (pid first, then location — the probe
    order), applied in ``map_batches``; rows unresolved after both passes get
    ``resolved_pid = null`` (the dead-letter set). The lookup side (pid +
    location per record) is a small projection of the record corpus —
    broadcast once via ``ray.put``, read per actor, never re-shipped per batch
    (SURVEY.md §2.6 J1: two-key join = union of two equi-joins with priority).

    ``mode``: ``"broadcast"`` forces this path, ``"join"`` delegates to
    :func:`resolve_edges_join`, ``"auto"`` (default) picks by lookup-side
    size — at most ``RESOLVE_BROADCAST_MAX_KEYS`` keys broadcast; beyond
    that the hash-partitioned join runs (a lookup side that no longer fits
    a worker heap must shuffle, not ship).
    """
    import ray

    if mode == "join":
        return resolve_edges_join(edges, records)

    # materialize the (small, aggregated) lookup-side projections once —
    # the auto gate's count() and the broadcast build below then reuse the
    # same blocks instead of re-running the groupby/filter
    pids_t = (
        records.groupby("pid").aggregate(Count(alias_name="_c"))
        .drop_columns(["_c"]).materialize()
    )
    loc_rows = records.filter(
        expr=f"key == '{KEY_DIGITAL_OBJECT_LOCATION}'"
    ).select_columns(["pid", "value_json"]).materialize()
    if mode == "auto":
        n_keys = pids_t.count() + loc_rows.count()
        if n_keys > RESOLVE_BROADCAST_MAX_KEYS:
            return resolve_edges_join(edges, records)

    pids = pa.array(sorted(pids_t.to_pandas()["pid"]), pa.string())
    # determinism: if two records share a location, keep the smallest pid
    loc_df = (
        loc_rows.to_pandas()
        .sort_values(["value_json", "pid"])
        .drop_duplicates("value_json", keep="first")
    )
    loc_keys = pa.array(loc_df["value_json"], pa.string())
    loc_vals = pa.array(loc_df["pid"], pa.string())
    ref = ray.put((pids, loc_keys, loc_vals))

    class Resolve:
        def __init__(self):
            # zero-copy plasma read, once per actor
            self.pids, self.loc_keys, self.loc_vals = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            t = batch["presumed_target"]
            # probe 1: exact PID membership; probe 2: location → min pid
            # (both vectorized Arrow hash-probes; priority = if_else order)
            in_pid = pc.is_in(t, value_set=self.pids)
            loc_hit = pc.take(self.loc_vals, pc.index_in(t, value_set=self.loc_keys))
            resolved = pc.if_else(in_pid, t, loc_hit).cast(pa.string())
            how = pc.if_else(
                in_pid, pa.scalar("pid"),
                pc.if_else(
                    pc.is_valid(loc_hit), pa.scalar("location"),
                    pa.scalar("unresolved"),
                ),
            )
            return batch.append_column(
                "resolved_pid", resolved
            ).append_column("resolved_by", how.cast(pa.string()))

    return edges.map_batches(Resolve, batch_format="pyarrow", concurrency=(1, 4))


REVERSE_RELATION = {
    "hasMetadata": "isMetadataFor",
    "isMetadataFor": "hasMetadata",
    "hadPrimarySource": "isMetadataFor",
}


def bidirectional_edges(resolved: Dataset) -> Dataset:
    """Union of forward + reverse edges, deduplicated.

    Replaces the reference's `onSuccess` reverse-edge callbacks
    (src/nmr_FAIR_DOs/repositories/nmrxiv.py:929-959, chemotion.py:616-646):
    a projection swap + union + exact dedup — no shared state.
    """
    ok = resolved.map_batches(
        lambda b: b.filter(pc.is_valid(b["resolved_pid"])), batch_format="pyarrow"
    )

    def fwd(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": batch["source_pid"],
                "dst": batch["resolved_pid"],
                "relation": batch["relation"],
            }
        )

    def rev(batch: pa.Table) -> pa.Table:
        rels = [REVERSE_RELATION.get(r, r) for r in batch["relation"].to_pylist()]
        return pa.table(
            {
                "src": batch["resolved_pid"],
                "dst": batch["source_pid"],
                "relation": pa.array(rels, pa.string()),
            }
        )

    both = ok.map_batches(fwd, batch_format="pyarrow").union(
        ok.map_batches(rev, batch_format="pyarrow")
    )
    return both.groupby(["src", "dst", "relation"]).aggregate(Count(alias_name="_c")).drop_columns(["_c"])


#: M13 — the reference's Type-API schema workaround (reference:
#: src/nmr_FAIR_DOs/connectors/tpm_connector.py:292-342; note its call sites
#: are commented out there — implemented for parity, opt-in here too).
TYPE_API_FIXES = {
    "21.T11969/8710d753ad10f371189b": "landingPageLocation",
    "21.T11148/f3f0cbaa39fa9966b279": "identifier",
    "21.T11969/7a19f6d5c8e63dd6bfcb": "NMR_Method",
    "21.T11148/7fdada5846281ef5d461": "locationPreview/Sample",
}


def apply_type_api_fixes(batch: pa.Table) -> pa.Table:
    """Long-format M13: for the four affected keys, rewrap value_json as the
    internal JSON string ``{"<fixName>": "<value>"}`` (exact reference string
    construction, including no escaping — it is a verbatim port of the
    workaround's concatenation)."""
    keys = batch["key"].to_pylist()
    vals = batch["value_json"].to_pylist()
    out = [
        '{"' + TYPE_API_FIXES[k] + '": "' + v + '"}' if k in TYPE_API_FIXES else v
        for k, v in zip(keys, vals)
    ]
    return batch.set_column(
        batch.schema.get_field_index("value_json"), "value_json",
        pa.array(out, pa.string()),
    )


def resolve_edges_join(
    edges: Dataset, records: Dataset, num_partitions: int = 8
) -> Dataset:
    """J1 two-key priority resolve as a DISTRIBUTED repartition-join — the
    scale path for :func:`resolve_edges`, whose broadcast lookup
    materializes every record pid on the driver (fine for harvest-sized
    corpora, not for 10^12 records).

    One hash shuffle: edge rows and lookup rows (record pids + min-pid per
    digitalObjectLocation) are co-partitioned by ``hash(join key) %
    num_partitions``; inside each group the two probes run in priority order
    against group-local dicts — semantics identical to the broadcast version
    (tested). Built on ``groupby().map_groups`` rather than ``Dataset.join``
    because Ray 2.49's hash join emits schema-less empty partitions that
    crash Arrow's join on sparse keys.

    ``edges`` must carry (source_pid, presumed_target, relation).
    """
    from nmr_fair_dos_ray.tokenizer import term_hash

    def _part_of(keys: pa.Array) -> pa.Array:
        h = term_hash(keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys)
        return pa.array((h % np.uint64(num_partitions)).astype(np.int64))

    def tag_edges(b: pa.Table) -> pa.Table:
        if "presumed_target" not in b.column_names:
            return _combined_empty()
        return pa.table({
            "part_id": _part_of(b["presumed_target"]),
            "side": pa.array(np.zeros(b.num_rows, np.int8)),
            "source_pid": b["source_pid"].cast(pa.string()),
            "presumed_target": b["presumed_target"].cast(pa.string()),
            "relation": b["relation"].cast(pa.string()),
            "match_kind": pa.nulls(b.num_rows, pa.string()),
            "match_key": pa.nulls(b.num_rows, pa.string()),
            "match_val": pa.nulls(b.num_rows, pa.string()),
        })

    def _combined_empty() -> pa.Table:
        return pa.table({
            "part_id": pa.array([], pa.int64()),
            "side": pa.array([], pa.int8()),
            "source_pid": pa.array([], pa.string()),
            "presumed_target": pa.array([], pa.string()),
            "relation": pa.array([], pa.string()),
            "match_kind": pa.array([], pa.string()),
            "match_key": pa.array([], pa.string()),
            "match_val": pa.array([], pa.string()),
        })

    def _lookup_rows(kind: str, keys: pa.Array, vals: pa.Array) -> pa.Table:
        n = len(keys)
        return pa.table({
            "part_id": _part_of(keys),
            "side": pa.array(np.ones(n, np.int8)),
            "source_pid": pa.nulls(n, pa.string()),
            "presumed_target": pa.nulls(n, pa.string()),
            "relation": pa.nulls(n, pa.string()),
            "match_kind": pa.array([kind] * n, pa.string()),
            "match_key": keys.combine_chunks().cast(pa.string()) if isinstance(keys, pa.ChunkedArray) else keys.cast(pa.string()),
            "match_val": vals.combine_chunks().cast(pa.string()) if isinstance(vals, pa.ChunkedArray) else vals.cast(pa.string()),
        })

    def tag_pids(b: pa.Table) -> pa.Table:
        if "pid" not in b.column_names:
            return _combined_empty()
        return _lookup_rows("pid", b["pid"], b["pid"])

    def tag_locs(b: pa.Table) -> pa.Table:
        if "value_json" not in b.column_names:
            return _combined_empty()
        return _lookup_rows("loc", b["value_json"], b["loc_pid"])

    def _loc_filter(b: pa.Table) -> pa.Table:
        if "key" not in b.column_names:
            return pa.table({"pid": pa.array([], pa.string()),
                             "value_json": pa.array([], pa.string())})
        return b.filter(
            pc.equal(b["key"], KEY_DIGITAL_OBJECT_LOCATION)
        ).select(["pid", "value_json"])

    pids = (
        records.groupby("pid")
        .aggregate(Count(alias_name="_c"))
        .map_batches(tag_pids, batch_format="pyarrow")
    )
    locs = (
        records.map_batches(_loc_filter, batch_format="pyarrow")
        .groupby("value_json")
        .aggregate(Min("pid", alias_name="loc_pid"))
        .map_batches(tag_locs, batch_format="pyarrow")
    )
    combined = edges.map_batches(tag_edges, batch_format="pyarrow").union(pids, locs)

    def resolve_group(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["side"] == 0]
        right = g[g["side"] == 1]
        pid_set = set(right.loc[right["match_kind"] == "pid", "match_key"])
        loc_map = dict(zip(
            right.loc[right["match_kind"] == "loc", "match_key"],
            right.loc[right["match_kind"] == "loc", "match_val"],
        ))
        resolved, how = [], []
        for t in left["presumed_target"]:
            if t in pid_set:
                resolved.append(t); how.append("pid")
            elif t in loc_map:
                resolved.append(loc_map[t]); how.append("location")
            else:
                resolved.append(None); how.append("unresolved")
        out = left[["source_pid", "presumed_target", "relation"]].copy()
        out["resolved_pid"] = pd.Series(resolved, index=left.index, dtype=object)
        out["resolved_by"] = how
        return out

    return combined.groupby("part_id").map_groups(resolve_group, batch_format="pandas")
