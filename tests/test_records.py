"""PIDRecord long-format operator tests against the fixtures (FIXTURES.md §4)."""

import pandas as pd
import pytest

import ray.data as rd

from nmr_fair_dos_ray.pipelines.records import (
    KEY_DIGITAL_OBJECT_LOCATION,
    bidirectional_edges,
    biggest_record,
    dedup_merge,
    flatten_records,
    most_datatypes,
    resolve_edges,
)


@pytest.fixture(scope="module")
def records_ds(sf_unit):
    return rd.read_parquet(sf_unit["records_long"])


@pytest.fixture(scope="module")
def edges_ds(sf_unit):
    return rd.read_parquet(sf_unit["edges"])


def test_dedup_merge_semantics(records_ds, sf_unit):
    """After merge: exactly one row per (pid, key, value) — the reference's
    add-time dedup (pid_record.py:92-109) + pid-collision merge."""
    merged = dedup_merge(records_ds).to_pandas()
    assert merged.duplicated(["pid", "key", "value_json"]).sum() == 0
    raw = rd.read_parquet(sf_unit["records_long"]).to_pandas()
    assert set(map(tuple, merged[["pid", "key", "value_json"]].values)) == set(
        map(tuple, raw[["pid", "key", "value_json"]].drop_duplicates().values)
    )
    assert len(merged) < len(raw)  # fixtures contain duplicates by construction


def test_flatten_rename_and_lists(records_ds):
    flat = flatten_records(records_ds).to_pandas()
    # keys were renamed to human names (no data-type PIDs remain)
    assert not flat["field"].str.startswith("21.T").any()
    assert {"digitalObjectLocation", "name", "dateCreated"} <= set(flat["field"])
    # repeated values collapse into lists
    multi = flat[flat["n_values"] > 1]
    assert (multi["values"].map(len) == multi["n_values"]).all()


def test_flatten_dict_explosion_and_timestamp():
    """M12 parity (elasticsearch.py:87-124): dict values explode to
    key.subkey fields (nulls skipped, the outer key never surfaces), every
    pid gains a timestamp = first dateCreated value or the injected now."""
    import pyarrow as pa

    from nmr_fair_dos_ray.pipelines.records import KEY_DATE_CREATED

    compound_key = "21.T11969/d15381199a44a16dc88d"
    rows = [
        # p1: compound dict (one null inner value) + dateCreated
        ("p1", compound_key, None,
         '{"21.T11969/6c4d3deac9a49b65886a":2.5,'
         '"21.T11969/f9cb9b53273ce0da7739":"https://u","x":null}'),
        ("p1", KEY_DATE_CREATED, None, '"2020-05-06T07:08:09"'),
        ("p1", "21.T11148/6ae999552a0d2dca14d6", None, '"somename"'),
        # p2: no dateCreated → injected now
        ("p2", "21.T11148/6ae999552a0d2dca14d6", None, '"other"'),
    ]
    t = pa.table({
        "pid": pa.array([r[0] for r in rows]),
        "key": pa.array([r[1] for r in rows]),
        "name": pa.array([r[2] for r in rows], pa.string()),
        "value_json": pa.array([r[3] for r in rows]),
    })
    flat = flatten_records(
        rd.from_arrow(t), now_iso="2026-01-01T00:00:00"
    ).to_pandas().set_index(["pid", "field"]).sort_index()

    assert (("p1", compound_key) not in flat.index
            and ("p1", "characterizedCompound") not in flat.index)
    assert list(flat.loc[("p1", "characterizedCompound.molecularWeight"), "values"]) == ["2.5"]
    assert list(flat.loc[("p1", "characterizedCompound.pubchemUrl"), "values"]) == ['"https://u"']
    assert not any(f.endswith(".x") for _, f in flat.index)  # null skipped
    assert list(flat.loc[("p1", "timestamp"), "values"]) == ['"2020-05-06T07:08:09"']
    assert list(flat.loc[("p2", "timestamp"), "values"]) == ['"2026-01-01T00:00:00"']
    assert flat.loc[("p1", "timestamp"), "as_list"] == False  # noqa: E712


def test_argmax_reductions(records_ds):
    raw = records_ds.to_pandas()
    # oracle via pandas
    per_key = raw.groupby(["pid", "key"]).size().reset_index(name="n")
    expect_big = (
        per_key.groupby("pid")["n"].max().reset_index(name="max_entries")
        .sort_values(["max_entries", "pid"], ascending=[False, True]).iloc[0]
    )
    got = biggest_record(records_ds).to_pandas().iloc[0]
    assert got["pid"] == expect_big["pid"] and got["max_entries"] == expect_big["max_entries"]

    expect_most = (
        per_key.groupby("pid").size().reset_index(name="n_datatypes")
        .sort_values(["n_datatypes", "pid"], ascending=[False, True]).iloc[0]
    )
    got2 = most_datatypes(records_ds).to_pandas().iloc[0]
    assert got2["pid"] == expect_most["pid"]
    assert got2["n_datatypes"] == expect_most["n_datatypes"]


def test_two_key_resolve_and_reverse(records_ds, edges_ds, sf_unit):
    resolved = resolve_edges(edges_ds, records_ds).to_pandas()
    edges_raw = rd.read_parquet(sf_unit["edges"]).to_pandas()
    records_raw = rd.read_parquet(sf_unit["records_long"]).to_pandas()
    pids = set(records_raw["pid"])
    locs = records_raw[records_raw["key"] == KEY_DIGITAL_OBJECT_LOCATION]
    loc_map = (
        locs.sort_values(["value_json", "pid"])
        .drop_duplicates("value_json")
        .set_index("value_json")["pid"]
        .to_dict()
    )
    assert len(resolved) == len(edges_raw)
    for _, row in resolved.iterrows():
        t = row["presumed_target"]
        if t in pids:  # probe order: pid first
            assert row["resolved_by"] == "pid" and row["resolved_pid"] == t
        elif t in loc_map:
            assert row["resolved_by"] == "location" and row["resolved_pid"] == loc_map[t]
        else:
            assert row["resolved_by"] == "unresolved" and row["resolved_pid"] is None
    # dangling targets exist in the fixture (the dead-letter path)
    assert (resolved["resolved_by"] == "unresolved").any()
    assert (resolved["resolved_by"] == "location").any()

    bidir = bidirectional_edges(
        resolve_edges(edges_ds, records_ds)
    ).to_pandas()
    # every forward edge has its reverse
    pairs = set(map(tuple, bidir[["src", "dst"]].values))
    for s, d in pairs:
        assert (d, s) in pairs
    assert bidir.duplicated(["src", "dst", "relation"]).sum() == 0


def test_apply_type_api_fixes():
    import pyarrow as pa

    from nmr_fair_dos_ray.pipelines.records import apply_type_api_fixes

    b = pa.table(
        {
            "pid": ["p", "p"],
            "key": ["21.T11969/8710d753ad10f371189b", "other-key"],
            "value_json": ["https://x.example/lp", "keep-me"],
        }
    )
    out = apply_type_api_fixes(b)
    assert out["value_json"].to_pylist() == [
        '{"landingPageLocation": "https://x.example/lp"}', "keep-me",
    ]


def test_resolve_edges_join_matches_broadcast(ray_session):
    """Distributed hash-join two-key resolve must match the broadcast
    version row-for-row, including probe priority and dead letters."""
    import pyarrow as pa
    import ray.data as rd

    from nmr_fair_dos_ray.pipelines.records import (
        KEY_DIGITAL_OBJECT_LOCATION, resolve_edges, resolve_edges_join,
    )

    records = rd.from_items(
        [
            # pid-probe target
            {"pid": "P1", "key": "k", "name": "n", "value_json": "v"},
            # location-probe targets: two records share LOC2 → min pid wins
            {"pid": "P2", "key": KEY_DIGITAL_OBJECT_LOCATION, "name": "l",
             "value_json": "LOC1"},
            {"pid": "P4", "key": KEY_DIGITAL_OBJECT_LOCATION, "name": "l",
             "value_json": "LOC2"},
            {"pid": "P3", "key": KEY_DIGITAL_OBJECT_LOCATION, "name": "l",
             "value_json": "LOC2"},
            # a record that is BOTH a pid target and holds a location: the
            # pid probe must win for target "P2"
        ]
    ).repartition(3)
    edges = rd.from_items(
        [
            {"source_pid": "S", "presumed_target": "P1", "relation": "hasMetadata"},
            {"source_pid": "S", "presumed_target": "LOC1", "relation": "hasMetadata"},
            {"source_pid": "S", "presumed_target": "LOC2", "relation": "hasMetadata"},
            {"source_pid": "S", "presumed_target": "P2", "relation": "hasMetadata"},
            {"source_pid": "S", "presumed_target": "missing", "relation": "x"},
        ]
    ).repartition(2)

    cols = ["source_pid", "presumed_target", "relation", "resolved_pid", "resolved_by"]
    a = (resolve_edges(edges, records).to_pandas()[cols]
         .sort_values(cols).reset_index(drop=True))
    b = (resolve_edges_join(edges, records).to_pandas()[cols]
         .sort_values(cols).reset_index(drop=True))
    assert a.equals(b), (a, b)
    got = dict(zip(a["presumed_target"], zip(a["resolved_pid"], a["resolved_by"])))
    assert got["P1"] == ("P1", "pid")
    assert got["LOC1"] == ("P2", "location")
    assert got["LOC2"] == ("P3", "location")  # min pid across duplicates
    assert got["P2"] == ("P2", "pid")
    assert got["missing"] == (None, "unresolved")
