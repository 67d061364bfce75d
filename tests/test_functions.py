"""Scalar function semantics (reference: src/nmr_FAIR_DOs/utils.py + domain)."""

from datetime import datetime

import pytest

from nmr_fair_dos_ray.functions.rounding import round_half_away
from nmr_fair_dos_ray.functions.scalar import (
    decode_from_base64,
    encode_in_base64,
    normalize_license,
    normalize_url_for_similarity,
    parse_datetime,
    strip_doi_prefix,
    text_is_similar,
    try_parse_json,
)


def test_base64_roundtrip():
    doi = "10.5281/zenodo.123456"
    assert decode_from_base64(encode_in_base64(doi)) == doi
    with pytest.raises(ValueError):
        encode_in_base64("")


def test_parse_datetime_cascade():
    assert parse_datetime("2024-03-21T10:30:00") == datetime(2024, 3, 21, 10, 30)
    assert parse_datetime("2024-03-21 10:30:00") == datetime(2024, 3, 21, 10, 30)
    assert parse_datetime("2024-03-21") == datetime(2024, 3, 21)
    assert parse_datetime("21.03.2024") == datetime(2024, 3, 21)
    assert parse_datetime("2024-03-21T10:30:00Z").year == 2024
    with pytest.raises(ValueError):
        parse_datetime("not a date")


def test_doi_strip():
    assert strip_doi_prefix("https://doi.org/10.1/x") == "10.1/x"
    assert strip_doi_prefix("10.1/x") == "10.1/x"


def test_try_parse_json_preserves_reference_semantics():
    # strings parse eagerly; failures silently stay strings
    # (src/nmr_FAIR_DOs/domain/pid_record_entry.py:69-78)
    assert try_parse_json('{"a": 1}') == {"a": 1}
    assert try_parse_json("[1, 2]") == [1, 2]
    assert try_parse_json("plain text") == "plain text"
    assert try_parse_json("{broken") == "{broken"
    assert try_parse_json(42) == 42


def test_url_similarity_rules():
    # scheme/www/extension/legalcode/licenses normalization (utils.py:281-340)
    assert text_is_similar(
        "https://www.creativecommons.org/licenses/by/4.0/legalcode",
        "http://creativecommons.org/license/by/4.0/",
    )
    assert normalize_url_for_similarity("HTTPS://Example.org/a.html") == "example.org/a"
    assert not text_is_similar("https://a.org/x", "https://b.org/x")


def test_license_normalization():
    url = "https://spdx.org/licenses/CC-BY-4.0.json"
    assert normalize_license("CC-BY-4.0") == url
    assert normalize_license("Creative Commons Attribution 4.0 International") == url
    assert normalize_license("https://creativecommons.org/licenses/by/4.0/") == url
    assert normalize_license("no-such-license") is None
    assert normalize_license("") is None


def test_round_half_away_matches_duckdb():
    import duckdb

    vals = [4.40625, 4.5312, -4.40625, 0.00005, 2.675, 141 / 32, 1.0, 0.0]
    for v in vals:
        for d in (2, 4):
            expect = duckdb.sql(f"select round({v!r}::DOUBLE, {d})").fetchone()[0]
            assert round_half_away(v, d) == expect, (v, d)
