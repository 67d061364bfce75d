"""Extraction mapper family (M1-M11) unit + pipeline tests."""

from __future__ import annotations

import json

import pytest

from nmr_fair_dos_ray.pipelines.extract import (
    EXTRACTORS,
    KEY_COMPOUND,
    KEY_CONTACT,
    KEY_DATE_CREATED,
    KEY_HAS_METADATA,
    KEY_NAME,
    KEY_PRIMARY_SOURCE,
    ExtractStage,
    PIDRecordBuilder,
    TerminologyLookup,
    extract_chemotion,
    extract_contact_field,
    extract_nmrxiv,
    prune_descriptions,
    register_extractor,
    repository_fdo_rows,
)
from nmr_fair_dos_ray.sources.envelopes import build_envelope


def test_builder_value_dedup():
    b = PIDRecordBuilder("p")
    b.add("k", "v", "first")
    b.add("k", "v", "second")  # same (key,value) → dropped, first name wins
    b.add("k", "v2", "third")
    assert b.rows() == [("p", "k", "first", "v"), ("p", "k", "third", "v2")]
    b.update("k", "v3")  # delete-then-add with name=None (reference semantics)
    assert b.rows() == [("p", "k", None, "v3")]


def test_builder_dict_value_canonical():
    b = PIDRecordBuilder("p")
    b.add("k", {"b": 1, "a": 2.0}, "n")
    b.add("k", {"a": 2.0, "b": 1}, "m")  # same dict, different order → dedup
    assert b.rows() == [("p", "k", "n", '{"a":2.0,"b":1}')]


def test_contact_field_variants():
    assert extract_contact_field("author", {"author": {"identifier": "X"}}) == ["X"]
    assert extract_contact_field("author", {"author": {"@id": "Y"}}) == ["Y"]
    # in-field dedup; identifier preferred over @id
    assert extract_contact_field(
        "author", {"author": [{"identifier": "X"}, {"@id": "X"}, {"name": "no-id"}]}
    ) == ["X"]
    assert extract_contact_field("author", {}) == []
    assert extract_contact_field("author", {"author": "a string"}) == []


def test_cross_field_contact_dedup_via_add_entry():
    # d%4==2 envelope: author list + creator dict all yield the same id →
    # ONE contact entry (addEntry value-dedup, not extractor dedup)
    env = build_envelope(22)  # 22%3=1 (study), 22%4=2, 22%17!=0
    res = json.loads(env["payload"])
    fdo, _ = extract_chemotion(res)
    contacts = fdo.values(KEY_CONTACT)
    assert contacts == ["https://orcid.org/0000-A22"]


def test_chemotion_dispatch_errors():
    with pytest.raises(ValueError):
        extract_chemotion({})
    with pytest.raises(ValueError):
        extract_chemotion({"@type": "Text", "@id": "https://doi.org/x"})


def test_nmrxiv_dispatch_errors():
    with pytest.raises(ValueError):
        extract_nmrxiv({"original": {}, "bioschema": {}})  # no doi
    with pytest.raises(ValueError):
        extract_nmrxiv({"original": {"doi": "x", "identifier": "NMRXIV:X1"},
                        "bioschema": {}})  # unknown letter


def test_prune_descriptions_recursive():
    r = {
        "description": "top",
        "sdf": "blob",
        "hasPart": [{"description": "nested", "isPartOf": {"description": "deep"}}],
        "isPartOf": {"description": "single"},
    }
    out = prune_descriptions(r)
    assert out["description"] is None and out["sdf"] is None
    assert out["hasPart"][0]["description"] is None
    # single dict children are normalized to lists (reference behavior)
    assert out["isPartOf"][0]["description"] is None
    assert r["description"] == "top"  # input not mutated


def test_no_description_leaks_into_entries():
    term = TerminologyLookup()
    for d in range(0, 120):
        env = build_envelope(d)
        try:
            fdo, edges = EXTRACTORS[env["repo"]](json.loads(env["payload"]), term)
        except (ValueError, KeyError, TypeError):
            continue
        for row in fdo.rows():
            assert "VERBOSE" not in row[3] and "SDF-BLOB" not in row[3]


def test_chemotion_dataset_parent_date_fallback():
    # d=10: 10%3... 10%3=1 → study. Need kind 0 with d%5==0 and d%10==0: d=30.
    env = build_envelope(30)
    res = json.loads(env["payload"])
    fdo, _ = extract_chemotion(res)
    vals = fdo.values(KEY_DATE_CREATED)
    assert len(vals) == 1 and vals[0].startswith("2024-01-01T03:30:00")


def test_nmrxiv_dataset_name_rewrite_and_formula():
    # D-subtype requires d%3==2 and (d//3)%3==0: d ≡ 2 (mod 9) → d=2 has part
    # name → updateEntry with name=None
    fdo, _ = extract_nmrxiv(json.loads(build_envelope(2)["payload"]))
    assert fdo.entries(KEY_NAME) == [(KEY_NAME, "nmr record 2-part2", None)]
    # d=29: 29%9=2 ✓ and 29%8=5 → chemicalFormula C6H6 replaces the name
    fdo, _ = extract_nmrxiv(json.loads(build_envelope(29)["payload"]))
    assert fdo.entries(KEY_NAME) == [(KEY_NAME, "nmr record 29-C6H6", "name")]


def test_terminology_lookup_memoizes():
    from nmr_fair_dos_ray.state.ontology import OntologySearcher

    s = OntologySearcher(
        {"URL": {"label": "x", "ontology": "o"},
         "p": {"label": "parent", "ontology": "o"}},
        {"p": ["URL"]},
    )
    t = TerminologyLookup(s)
    assert t.search("X ", "o", "p") == "URL"
    assert t.search("miss", "o", "p") is None
    assert ("o", "p", "miss") in t._memo  # negative result cached too


def test_ontology_search_validate_disambiguate():
    """Port-parity tests for terminology.py:77-330: CHEBI node validation,
    single-survivor return, _findParent candidate-containment then
    most-children disambiguation, allChildrenOf restriction, query cache."""
    from nmr_fair_dos_ray.state.ontology import (
        OntologySearcher, default_ontology, validate_chebi,
    )

    FORMULA = "http://purl.obolibrary.org/obo/chebi/formula"
    MASS = "http://purl.obolibrary.org/obo/chebi/mass"

    # validateCHEBI: any of the 5 chemical property keys ⇒ valid
    assert validate_chebi({FORMULA: "CHCl3"})
    assert validate_chebi({MASS: "1.008"})
    assert not validate_chebi({"label": "deprecated thing"})

    # the default graph: label collision where one candidate fails
    # validation → exactly the valid node wins (reference ignores invalid
    # entities before disambiguation, terminology.py:160-168)
    ont = default_ontology()
    from nmr_fair_dos_ray.state.ontology import PARENT_NMR_SOLVENT
    assert ont.search_for_term("CDCl3", "chebi", PARENT_NMR_SOLVENT) \
        == "http://purl.obolibrary.org/obo/CHEBI_85365"

    # ambiguity resolved by candidate-containment: parent candidate has the
    # other candidate among its direct children
    nodes = {
        "iri:benzene": {"label": "benzene", "ontology": "chebi", FORMULA: "C6H6"},
        "iri:benzene-child": {"label": "benzene", "ontology": "chebi", FORMULA: "C6H6"},
        "root": {"label": "root", "ontology": "chebi"},
    }
    children = {
        "root": ["iri:benzene", "iri:benzene-child"],
        "iri:benzene": ["iri:benzene-child"],
    }
    s = OntologySearcher(nodes, children)
    assert s.search_for_term("benzene", "chebi", "root") == "iri:benzene"

    # ambiguity with no containment: most children wins
    nodes2 = {
        "iri:a": {"label": "t", "ontology": "chebi", FORMULA: "X"},
        "iri:b": {"label": "t", "ontology": "chebi", FORMULA: "Y"},
        "root": {"label": "root", "ontology": "chebi"},
        "k1": {"label": "k1", "ontology": "chebi"},
        "k2": {"label": "k2", "ontology": "chebi"},
        "k3": {"label": "k3", "ontology": "chebi"},
    }
    children2 = {"root": ["iri:a", "iri:b"], "iri:a": ["k1"],
                 "iri:b": ["k2", "k3"]}
    s2 = OntologySearcher(nodes2, children2)
    assert s2.search_for_term("t", "chebi", "root") == "iri:b"

    # no children anywhere → _findParent returns None → search returns None
    nodes3 = {
        "iri:a": {"label": "t", "ontology": "chebi", FORMULA: "X"},
        "iri:b": {"label": "t", "ontology": "chebi", FORMULA: "Y"},
        "root": {"label": "root", "ontology": "chebi"},
    }
    s3 = OntologySearcher(nodes3, {"root": ["iri:a", "iri:b"]})
    assert s3.search_for_term("t", "chebi", "root") is None

    # allChildrenOf restriction is transitive and excludes non-descendants
    nodes4 = {
        "iri:deep": {"label": "q", "ontology": "chebi", FORMULA: "Z"},
        "iri:outside": {"label": "q", "ontology": "chebi", FORMULA: "W"},
        "mid": {"label": "mid", "ontology": "chebi"},
        "root": {"label": "root", "ontology": "chebi"},
    }
    s4 = OntologySearcher(
        nodes4, {"root": ["mid"], "mid": ["iri:deep"]}
    )
    assert s4.search_for_term("q", "chebi", "root") == "iri:deep"
    # fresh searcher (the query cache is query-keyed): unrestricted search is
    # ambiguous with no children anywhere → None
    s4b = OntologySearcher(nodes4, {"root": ["mid"], "mid": ["iri:deep"]})
    assert s4b.search_for_term("q", "chebi", None) is None

    # cache is query-keyed (reference quirk, terminology.py:111-114):
    # a second call returns the cached IRI even if the graph changed
    s5 = default_ontology()
    got = s5.search_for_term("D2O", "chebi", PARENT_NMR_SOLVENT)
    s5._by_label.clear()
    assert s5.search_for_term("D2O", "chebi", PARENT_NMR_SOLVENT) == got


def test_sample_edges_push_previews_and_compounds():
    # S-subtype: d%3==2, (d//3)%3==1 → d ≡ 5 (mod 9); d=5 odd → compound
    fdo, edges = extract_nmrxiv(json.loads(build_envelope(5)["payload"]))
    kinds = [e.key for e in edges]
    assert KEY_HAS_METADATA in kinds and KEY_COMPOUND in kinds
    tgt = {e.presumed_target for e in edges}
    assert len(tgt) == 1  # all pushes target the same hasPart dataset


def test_registry_extension():
    def custom(resource, term):
        b = PIDRecordBuilder("custom-pid")
        b.add("k", resource["x"], "n")
        return b, []

    register_extractor("customrepo", custom)
    try:
        assert "customrepo" in EXTRACTORS
        import pyarrow as pa

        stage = ExtractStage(primary_source=False)
        out = stage(
            pa.table(
                {
                    "envelope_id": pa.array([1], pa.int64()),
                    "repo": pa.array(["customrepo"]),
                    "payload": pa.array([json.dumps({"x": "v"})]),
                }
            )
        )
        assert out.num_rows == 1 and out["kind"][0].as_py() == "entry"
    finally:
        del EXTRACTORS["customrepo"]


def test_extract_stage_primary_source_and_errors():
    import pyarrow as pa

    rows = [build_envelope(d) for d in (1, 17, 2)]  # valid, invalid, valid
    stage = ExtractStage()
    out = stage(
        pa.table(
            {
                "envelope_id": pa.array([r["envelope_id"] for r in rows], pa.int64()),
                "repo": pa.array([r["repo"] for r in rows]),
                "payload": pa.array([r["payload"] for r in rows]),
            }
        )
    )
    kinds = out["kind"].to_pylist()
    assert kinds.count("error") == 1
    entries = out.filter(pa.compute.equal(out["kind"], "entry"))
    keys = entries["key"].to_pylist()
    assert keys.count(KEY_PRIMARY_SOURCE) == 2  # one per valid record


def test_repo_fdo_rows_constant():
    rows = repository_fdo_rows("nmrxiv")
    assert len(rows) == 6
    assert all(r[0] == rows[0][0] for r in rows)  # single pid
    assert repository_fdo_rows("nmrxiv") == rows  # deterministic


def test_extract_records_dataset(ray_session):
    """End-to-end over a Ray Dataset built from synthesized envelopes."""
    import ray.data as rd

    from nmr_fair_dos_ray.pipelines.extract import extract_records

    envs = rd.from_items([build_envelope(d) for d in range(60)])
    out = extract_records(envs).to_pandas()
    assert set(out["kind"].unique()) <= {"entry", "edge", "error"}
    n_err = (out["kind"] == "error").sum()
    assert n_err == len([d for d in range(60) if d % 17 == 0])
    # every valid envelope produced a primary-source entry
    ps = out[(out["kind"] == "entry") & (out["key"] == KEY_PRIMARY_SOURCE)]
    assert len(ps) == 60 - n_err
