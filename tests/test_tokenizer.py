"""Tokenizer unit tests: row/batch equivalence, identifier splitting, hashing."""

from collections import Counter

import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from nmr_fair_dos_ray.tokenizer import Tokenizer, term_hash, term_hash_one


CASES = [
    "def getUserName(self): return self.user_name",
    "HTMLParser utf8 x42 __init__ snake_case_name ABCdef",
    "",
    "   \n\t ",
    "naïve café 测试 😀 mixed123Case",
    "a_B_c __ _x_ 42 A",
    "path/to/some_file.py",
    None,
]


@pytest.mark.parametrize("mode", ["code", "simple"])
def test_batch_matches_row_impl(mode):
    tok = Tokenizer(mode)
    rows, terms = tok.batch_token_rows(pa.array(CASES, pa.string()))
    got: dict[int, Counter] = {}
    for r, t in zip(rows.tolist(), terms.to_pylist()):
        got.setdefault(r, Counter())[t] += 1
    for i, text in enumerate(CASES):
        assert got.get(i, Counter()) == Counter(tok.tokenize(text or "")), (mode, text)


def test_identifier_splitting():
    tok = Tokenizer("code")
    assert tok.tokenize("getUserName") == ["getusername", "get", "user", "name"]
    assert tok.tokenize("snake_case") == ["snake_case", "snake", "case"]
    assert tok.tokenize("HTMLParser") == ["htmlparser", "html", "parser"]
    assert tok.tokenize("utf8") == ["utf8", "utf", "8"]
    assert tok.tokenize("plain") == ["plain"]  # no duplicate emission
    assert tok.tokenize("__init__") == ["__init__", "init"]


def test_simple_mode_matches_sql_semantics():
    import duckdb

    tok = Tokenizer("simple")
    for text in ["Hello, World_x 42", "a+b=c", "ÜBER maß"]:
        sql = duckdb.sql(
            "select list_filter(string_split_regex(lower(?), '[^a-z0-9]+'), x -> x <> '')",
            params=[text],
        ).fetchone()[0]
        assert tok.tokenize(text) == sql


def test_query_tokenizer_exact_fields():
    tok = Tokenizer("code")
    terms, exact = tok.tokenize_query("getUser path:src/a.py repo:org1/repo2 foo")
    assert exact == ["path:src/a.py", "repo:org1/repo2"]
    assert terms == sorted(set(terms))
    assert "foo" in terms and "getuser" in terms


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(max_size=40), max_size=8), st.sampled_from(["code", "simple"]))
def test_batch_row_equivalence_property(texts, mode):
    tok = Tokenizer(mode)
    rows, terms = tok.batch_token_rows(pa.array(texts, pa.string()))
    got: dict[int, Counter] = {}
    for r, t in zip(rows.tolist(), terms.to_pylist()):
        got.setdefault(r, Counter())[t] += 1
    for i, text in enumerate(texts):
        assert got.get(i, Counter()) == Counter(tok.tokenize(text))


@given(st.lists(st.text(min_size=0, max_size=30), min_size=1, max_size=20))
@settings(max_examples=50, deadline=None)
def test_term_hash_vectorized_matches_scalar(terms):
    h = term_hash(pa.array(terms, pa.string()))
    assert h.tolist() == [term_hash_one(t) for t in terms]
