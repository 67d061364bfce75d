"""Relational pipelines over the driver's TPC-H-ish testdata tables.

These exercise the reference's data-processing operator classes (SURVEY.md §2:
filters M16, dedup-merge A1, argmax A2/A3, two-key join J1, reverse edges,
union/dedup §2.9) against tables the grading driver can oracle-check with
DuckDB. Every aggregate column is explicitly named and floats are rounded
identically on both sides so value-hashes match.

Dimension tables (customer, supplier, nation) are broadcast with ``ray.put``
and probed inside ``map_batches`` — no shuffle for small-side joins
(SURVEY.md §2.6). Fact-side aggregations pre-aggregate per batch only where
that reduces shuffle volume; groupbys run on the named key columns.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data import Dataset
from ray.data.aggregate import Count, Min

from nmr_fair_dos_ray.functions.rounding import round_half_away
from nmr_fair_dos_ray.sources import sized_read_parquet


def _t(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def q01_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1-shaped pricing summary (groupby-aggregate over lineitem)."""
    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                 "l_discount", "l_shipdate"],
    )

    def partial(b: pa.Table) -> pa.Table:
        # per-batch partial aggregation via Arrow C++ group_by: the shuffle
        # is replaced by a ≤6-rows-per-batch partial stream merged on the
        # driver — Ray's sort-based Aggregate has ~4 s fixed cost at 32 CPUs
        # on this VM, pure overhead for single-digit group cardinality
        b = b.filter(pc.less_equal(b["l_shipdate"], pa.scalar(pd.Timestamp("2024-06-30"))))
        disc = pc.multiply(b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"]))
        b = b.append_column("disc_price", disc)
        return b.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("l_extendedprice", "sum"),
             ("disc_price", "sum"), ("l_quantity", "count")]
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    df = (
        parts.groupby(["l_returnflag", "l_linestatus"], as_index=False)
        .agg(
            sum_qty=("l_quantity_sum", "sum"),
            sum_base_price=("l_extendedprice_sum", "sum"),
            sum_disc_price=("disc_price_sum", "sum"),
            count_order=("l_quantity_count", "sum"),
        )
    )
    df["avg_qty"] = round_half_away(df["sum_qty"] / df["count_order"], 4)
    for c in ("sum_qty", "sum_base_price", "sum_disc_price"):
        df[c] = round_half_away(df[c], 2)
    return df[
        ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
         "sum_disc_price", "avg_qty", "count_order"]
    ].sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def q03_top_building_orders(sf_dir: str) -> pd.DataFrame:
    """Broadcast semi-join (customer segment filter) + top-k.

    Top-10 via per-batch PARTIAL top-k folded into the semi-join stage plus
    one driver-side merge of ≤ 10×n_batches rows — no all-to-all
    ``Dataset.sort`` (VERDICT round-1 item 7; same pattern as ann.py's
    brute-force merge)."""
    cust = sized_read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"])
    keys = set(
        cust.filter(expr="c_mktsegment == 'BUILDING'").to_pandas()["c_custkey"]
    )
    ref = ray.put(np.array(sorted(keys), dtype=np.int64))
    k = 10

    class SemiJoinTopK:
        def __init__(self):
            self.keys = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            m = np.isin(b["o_custkey"].to_numpy(zero_copy_only=False), self.keys)
            f = b.filter(pa.array(m))
            if f.num_rows <= k:
                return f
            price = f["o_totalprice"].to_numpy(zero_copy_only=False)
            okey = f["o_orderkey"].to_numpy(zero_copy_only=False)
            # top-k by (price desc, orderkey asc): lexsort is ascending, so
            # sort by (-price, orderkey) and take the first k
            order = np.lexsort((okey, -price))[:k]
            return f.take(pa.array(np.sort(order)))

    orders = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )
    partial = orders.map_batches(
        SemiJoinTopK, batch_format="pyarrow", concurrency=(1, 4)
    )
    df = partial.to_pandas()  # ≤ 10 rows per input batch
    df = df.sort_values(
        ["o_totalprice", "o_orderkey"], ascending=[False, True]
    ).head(k).reset_index(drop=True)
    df["o_totalprice"] = round_half_away(df["o_totalprice"], 2)
    return df[["o_orderkey", "o_custkey", "o_totalprice"]]


def q05_revenue_by_nation(sf_dir: str) -> pd.DataFrame:
    """lineitem ⋈ supplier ⋈ nation revenue rollup — two broadcast lookups
    plus one partial-aggregated groupby (pre-aggregate per batch, then a
    small shuffle over ≤ |nation| × |batches| rows)."""
    supp = sized_read_parquet(_t(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"]).to_pandas()
    nat = sized_read_parquet(_t(sf_dir, "nation"), columns=["n_nationkey", "n_name"]).to_pandas()
    # dense array lookups, not dicts: suppkey → nation index is one `take`
    # per batch (the former per-row dict loop cost ~17 µs/row on this VM)
    nat_sorted = nat.sort_values("n_nationkey").reset_index(drop=True)
    nation_idx_of = np.full(int(supp["s_suppkey"].max()) + 2, -1, np.int64)
    key_to_idx = {k: i for i, k in enumerate(nat_sorted["n_nationkey"])}
    nation_idx_of[supp["s_suppkey"].to_numpy()] = (
        supp["s_nationkey"].map(key_to_idx).to_numpy()
    )
    n_nations = len(nat_sorted)
    ref = ray.put(nation_idx_of)

    class RevenuePartial:
        def __init__(self):
            self.nation_idx_of = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            sk = b["l_suppkey"].to_numpy(zero_copy_only=False)
            rev = (
                b["l_extendedprice"].to_numpy(zero_copy_only=False)
                * (1.0 - b["l_discount"].to_numpy(zero_copy_only=False))
            )
            # suppkeys outside the supplier table (out of range, or mapped to
            # the -1 sentinel) are dropped — inner-join semantics, and keeps
            # bincount from raising on negative / out-of-bounds indices
            ni = self.nation_idx_of[
                np.clip(sk, 0, len(self.nation_idx_of) - 1)
            ]
            valid = (ni >= 0) & (sk >= 0) & (sk < len(self.nation_idx_of))
            sums = np.bincount(
                ni[valid], weights=rev[valid], minlength=n_nations
            )
            return pa.table(
                {"nation_idx": pa.array(np.arange(n_nations, dtype=np.int64)),
                 "revenue": pa.array(sums, pa.float64())}
            )

    li = sized_read_parquet(_t(sf_dir, "lineitem"), columns=["l_suppkey", "l_extendedprice", "l_discount"])
    # ≤ |nation| rows per batch — merged on the driver, no Aggregate shuffle
    parts = li.map_batches(
        RevenuePartial, batch_format="pyarrow", concurrency=(1, 4)
    ).to_pandas()
    totals = parts.groupby("nation_idx")["revenue"].sum()
    df = pd.DataFrame(
        {"n_name": nat_sorted["n_name"], "revenue": totals.reindex(range(n_nations), fill_value=0.0).to_numpy()}
    )
    df["revenue"] = round_half_away(df["revenue"], 2)
    return df.sort_values("n_name").reset_index(drop=True)


def q_events_window(sf_dir: str) -> pd.DataFrame:
    """Time-range filter + rollup (the reference's harvest-window predicate,
    src/nmr_FAIR_DOs/repositories/nmrxiv.py:222-260 / SURVEY.md M16)."""
    ev = sized_read_parquet(_t(sf_dir, "events"), columns=["ts", "event_type", "value"])

    def window_partial(b: pa.Table) -> pa.Table:
        # filter + per-batch Arrow group_by partials; single-digit group
        # cardinality merges on the driver (no Aggregate all-to-all)
        lo = pa.scalar(pd.Timestamp("2024-01-10"))
        hi = pa.scalar(pd.Timestamp("2024-01-20"))
        b = b.filter(pc.and_(pc.greater_equal(b["ts"], lo), pc.less(b["ts"], hi)))
        return b.group_by("event_type").aggregate(
            [("value", "count"), ("value", "sum")]
        )

    parts = ev.map_batches(window_partial, batch_format="pyarrow").to_pandas()
    df = parts.groupby("event_type", as_index=False).agg(
        n_events=("value_count", "sum"), sum_value=("value_sum", "sum")
    )
    df["sum_value"] = round_half_away(df["sum_value"], 2)
    return df.sort_values("event_type").reset_index(drop=True)


def q_record_merge(sf_dir: str) -> pd.DataFrame:
    """Dedup-merge by (user_id, event_type): first fragment + fragment count —
    the reference's pid-keyed merge A1 (src/nmr_FAIR_DOs/lib.py:502-527) with
    deterministic first = min(event_id)."""
    ev = sized_read_parquet(_t(sf_dir, "events"), columns=["user_id", "event_type", "event_id"])
    agg = ev.groupby(["user_id", "event_type"]).aggregate(
        Min("event_id", alias_name="first_event_id"), Count(alias_name="n_rows")
    )
    return agg.to_pandas().sort_values(["user_id", "event_type"]).reset_index(drop=True)


def _argmax_first(ds: Dataset, value_col: str, id_col: str) -> pd.DataFrame:
    """argmax by (value desc, id asc) with per-block partials + a one-row-
    per-block driver merge — no all-to-all Dataset.sort for row 1."""

    def block_best(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        vals = b[value_col].to_numpy(zero_copy_only=False)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        i = int(np.lexsort((ids, -vals))[0])
        return b.take(pa.array([i]))

    parts = ds.map_batches(block_best, batch_format="pyarrow").to_pandas()
    return (
        parts.sort_values([value_col, id_col], ascending=[False, True])
        .head(1).reset_index(drop=True)
    )


def q_biggest_record(sf_dir: str) -> pd.DataFrame:
    """argmax user by event count (A2, src/nmr_FAIR_DOs/lib.py:652-685)."""
    ev = sized_read_parquet(_t(sf_dir, "events"), columns=["user_id"])
    per = ev.groupby("user_id").aggregate(Count(alias_name="n_events"))
    return _argmax_first(per, "n_events", "user_id")


def q_most_event_types(sf_dir: str) -> pd.DataFrame:
    """argmax user by distinct event types (A3, src/nmr_FAIR_DOs/lib.py:688-718)."""
    ev = sized_read_parquet(_t(sf_dir, "events"), columns=["user_id", "event_type"])
    distinct = ev.groupby(["user_id", "event_type"]).aggregate(Count(alias_name="_c"))
    per = distinct.groupby("user_id").aggregate(Count(alias_name="n_types"))
    return _argmax_first(per, "n_types", "user_id")


def q_twokey_resolve(sf_dir: str) -> pd.DataFrame:
    """The two-key priority lookup join J1 (src/nmr_FAIR_DOs/lib.py:120-274):
    probe events.user_id against suppliers first, customers second,
    dead-letter the rest; rollup by resolution path. (Supplier-first because
    user_ids 0-99 exist in BOTH tables — the priority order is what's being
    verified, mirroring the reference's records_to_create → pid_records → ES
    probe sequence.)"""
    cust = set(sized_read_parquet(_t(sf_dir, "customer"), columns=["c_custkey"]).to_pandas()["c_custkey"])
    supp = set(sized_read_parquet(_t(sf_dir, "supplier"), columns=["s_suppkey"]).to_pandas()["s_suppkey"])
    ref = ray.put((np.array(sorted(cust), np.int64), np.array(sorted(supp), np.int64)))

    class Resolve:
        def __init__(self):
            self.cust, self.supp = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            uid = b["user_id"].to_numpy(zero_copy_only=False)
            in_c = np.isin(uid, self.cust)
            in_s = np.isin(uid, self.supp)
            how = np.where(in_s, "supplier", np.where(in_c, "customer", "unresolved"))
            return pa.table({"resolved_by": pa.array(how.tolist(), pa.string())})

    ev = sized_read_parquet(_t(sf_dir, "events"), columns=["user_id"])
    agg = (
        ev.map_batches(Resolve, batch_format="pyarrow", concurrency=(1, 4))
        .groupby("resolved_by")
        .aggregate(Count(alias_name="n_events"))
    )
    return agg.to_pandas().sort_values("resolved_by").reset_index(drop=True)


def q_bidirectional_edges(sf_dir: str) -> pd.DataFrame:
    """Reverse-edge union + dedup + degree rollup (the reference's
    bidirectional relationship emission, src/nmr_FAIR_DOs/lib.py:120-274 with
    onSuccess callbacks — here a projection swap + union + groupby)."""
    orders = sized_read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_orderkey"])
    n_parts = 32

    def both_directions(b: pa.Table) -> pa.Table:
        # emit fwd+rev in ONE pass (the old two-branch union re-executed the
        # read per branch), pre-partitioned by src hash so dedup, degree AND
        # top-k all resolve inside one shuffle — the former chain paid three
        # all-to-alls (two groupbys + a global sort) for a 20-row answer
        ck = b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ok_ = b["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate([ck, ok_])
        dst = np.concatenate([ok_, ck])
        return pa.table({
            "part_id": pa.array(src % n_parts),
            "src": pa.array(src),
            "dst": pa.array(dst),
        })

    def degree_topk(g: pd.DataFrame) -> pd.DataFrame:
        deg = (
            g.drop_duplicates(["src", "dst"])
            .groupby("src", as_index=False).agg(n_out=("dst", "count"))
        )
        return deg.sort_values(["n_out", "src"], ascending=[False, True]).head(20)

    parts = (
        orders.map_batches(both_directions, batch_format="pyarrow")
        .groupby("part_id")
        .map_groups(degree_topk, batch_format="pandas")
        .to_pandas()
    )
    return (
        parts.sort_values(["n_out", "src"], ascending=[False, True])
        .head(20).reset_index(drop=True)
    )


def q_session_windows(sf_dir: str) -> pd.DataFrame:
    """Gap-based session windows over the event stream (30-minute gap).

    The streaming-window custom operator the reference lacks (SURVEY.md
    §2.10: the reference is batch-only; its closest analog is the
    incremental-harvest time window, src/nmr_FAIR_DOs/lib.py:426-440).
    Composition: ``groupby(user_id).map_groups`` with an in-group sort —
    sessionization needs the user's full ordered history, so the partitioning
    assumption is "one user's events fit one task", which holds at any corpus
    scale because groups shard by user hash.
    """
    ev = sized_read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts", "event_id", "value"])
    gap = pd.Timedelta(minutes=30)
    n_parts = 32

    def add_part(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        return b.append_column("part_id", pa.array((uid % n_parts).astype(np.int64)))

    def sessions_partition(g: pd.DataFrame) -> pd.DataFrame:
        # fully vectorized sessionization over ALL the partition's users:
        # one sort, one shifted-compare, one cumsum, one groupby-agg — the
        # former per-user map_groups paid task overhead per user
        g = g.sort_values(["user_id", "ts", "event_id"])
        new = g["user_id"].ne(g["user_id"].shift()) | (g["ts"].diff() > gap)
        g = g.assign(_sid=new.cumsum())
        out = (
            g.groupby("_sid", sort=True)
            .agg(user_id=("user_id", "first"),
                 first_event_id=("event_id", "min"),
                 n_events=("event_id", "count"),
                 sum_value=("value", "sum"))
            .reset_index(drop=True)
        )
        out["session_idx"] = out.groupby("user_id").cumcount()
        out["sum_value"] = out["sum_value"].map(lambda v: round_half_away(v, 2))
        return out[["user_id", "session_idx", "first_event_id", "n_events", "sum_value"]]

    res = (
        ev.map_batches(add_part, batch_format="pyarrow")
        .groupby("part_id")
        .map_groups(sessions_partition, batch_format="pandas")
    )
    return (
        res.to_pandas()
        .astype({"session_idx": "int64", "n_events": "int64"})
        .sort_values(["user_id", "session_idx"])
        .reset_index(drop=True)
    )


def q_date_parse(sf_dir: str) -> pd.DataFrame:
    """parseDateTime cascade parity (reference: src/nmr_FAIR_DOs/utils.py:170-211
    — ISO-8601 first, then fallback strptime formats, else error).

    Events' timestamps are deterministically rendered into four string
    formats by event_id, re-parsed through the cascade, and returned as epoch
    seconds — the oracle renders/parses with the equivalent SQL strftime/
    strptime per format, so a cascade bug breaks the value hash.
    """
    from nmr_fair_dos_ray.functions.scalar import parse_datetime

    ev = sized_read_parquet(_t(sf_dir, "events"), columns=["event_id", "ts"])
    fmts = ["%Y-%m-%dT%H:%M:%S", "%Y-%m-%d %H:%M:%S", "%Y-%m-%d", "%d.%m.%Y"]

    from datetime import timezone

    def render_parse(b: pa.Table) -> pa.Table:
        ids = b["event_id"].to_pylist()
        tss = b["ts"].to_pandas()
        rendered, parsed = [], []
        for eid, ts in zip(ids, tss):
            f = fmts[eid % 4]
            s = ts.strftime(f)
            rendered.append(s)
            # pin UTC: naive datetime.timestamp() would use the host tz
            parsed.append(
                int(parse_datetime(s).replace(tzinfo=timezone.utc).timestamp())
            )
        return pa.table(
            {"event_id": pa.array(ids, pa.int64()),
             "rendered": pa.array(rendered, pa.string()),
             "epoch": pa.array(parsed, pa.int64())}
        )

    df = ev.map_batches(render_parse, batch_format="pyarrow").to_pandas()
    return df.sort_values("event_id").reset_index(drop=True)


def q_json_extract(sf_dir: str) -> pd.DataFrame:
    """JSON value extraction with the reference's parse-attempt semantics
    (reference: src/nmr_FAIR_DOs/domain/pid_record_entry.py:69-78 — string
    values are eagerly json.loads-ed, kept as-is on failure) plus the
    validity-guard dead-letter pattern (M17, e.g. src/nmr_FAIR_DOs/
    repositories/nmrxiv.py:122-153): rows whose payload parses contribute an
    extracted value; failures are counted, never dropped silently.
    Rollup: per extracted-k bucket (k % 10), count + share of parse failures.
    """
    import json as _json

    from nmr_fair_dos_ray.functions.scalar import try_parse_json

    ev = sized_read_parquet(_t(sf_dir, "events"), columns=["event_id", "props"])

    def extract(b: pa.Table) -> pa.Table:
        buckets, ok = [], []
        for s in b["props"].to_pylist():
            v = try_parse_json(s)
            k = v.get("k") if isinstance(v, dict) else None
            # bool is an int subclass in Python but a non-castable value in
            # the SQL oracle; DuckDB's % keeps the dividend's sign, Python's
            # doesn't — use truncated (fmod) modulo to match on negative k
            if isinstance(k, int) and not isinstance(k, bool):
                buckets.append(int(math.fmod(k, 10)))
                ok.append(True)
            else:
                buckets.append(-1)  # dead-letter bucket
                ok.append(False)
        return pa.table(
            {"bucket": pa.array(buckets, pa.int64()),
             "parsed": pa.array(ok, pa.bool_())}
        )

    agg = (
        ev.map_batches(extract, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Count(alias_name="n_events"))
    )
    return agg.to_pandas().sort_values("bucket").reset_index(drop=True)


_LICENSE_ROTATION = [
    "MIT",                                                        # id match
    "mit license",                                                # name, case-insensitive
    "CC-BY-4.0",                                                  # id match
    "https://creativecommons.org/licenses/by-sa/4.0/legalcode",   # seeAlso URL
    "http://www.apache.org/licenses/LICENSE-2.0.html",            # seeAlso, http/.html variant
    "GNU General Public License v3.0 only",                       # name match
    "not-a-license",                                              # unmatched → null
]


def q_license_normalize(sf_dir: str) -> pd.DataFrame:
    """SPDX normalize-join as a pipeline stage (J3/F3 — reference:
    src/nmr_FAIR_DOs/utils.py:214-340 parseSPDXLicenseURL over the SPDX list
    with id/name/seeAlso/fuzzy-URL rules, memoized).

    The license column is synthesized deterministically from doc_id
    (rotation over id/name/seeAlso/unmatched variants, mirrored by the SQL
    oracle); the SPDX side table is broadcast ONCE via ``ray.put`` and the
    match runs inside ``map_batches`` with a per-actor memo over the
    (Zipf-repetitive) raw values — the reference's ``known_licenses`` cache
    as actor state. Rollup: (license_raw, license_url) → count.
    """
    from nmr_fair_dos_ray.functions.scalar import normalize_license, spdx_license_table
    from ray.data.aggregate import Count

    table_ref = ray.put(spdx_license_table())
    rotation = _LICENSE_ROTATION

    class Normalize:
        def __init__(self):
            self.table = ray.get(table_ref)
            self.memo: dict[str, str | None] = {}

        def __call__(self, b: pa.Table) -> pa.Table:
            d = b["doc_id"].to_numpy(zero_copy_only=False)
            raw = [rotation[int(x) % len(rotation)] for x in d]
            urls = []
            for v in raw:
                if v not in self.memo:
                    self.memo[v] = normalize_license(v, self.table)
                urls.append(self.memo[v])
            return pa.table(
                {"license_raw": pa.array(raw, pa.string()),
                 "license_url": pa.array(urls, pa.string())}
            )

    docs = sized_read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])
    agg = (
        docs.map_batches(Normalize, batch_format="pyarrow", concurrency=(1, 4))
        .groupby(["license_raw", "license_url"])
        .aggregate(Count(alias_name="n"))
    )
    df = agg.to_pandas()
    return df.sort_values(["license_raw"]).reset_index(drop=True)
