"""Deterministic fixture generation per FIXTURES.md (no external data).

Generates, at any scale, the conformance tables:

- ``corpus``       (repo, path, commit, lang, content) — BASELINE.json input_hint
- ``queries``      (query_id, query, k) — reference-query-set analog
- ``records_long`` (pid, key, name, value_json) — PIDRecord long format
                   (reference: src/nmr_FAIR_DOs/domain/pid_record.py:301-316
                   ``exportSimpleFormatJSON``)
- ``edges``        (presumed_target, source_pid, relation) — the two-key
                   relationship join input (reference: src/nmr_FAIR_DOs/lib.py:120-274)

Everything derives from fixed seeds and row indices — same output at any
parallelism, any time, any machine. Edge cases by construction: exact-dup
content pairs, empty/whitespace rows, unicode, ≥2 MB wide rows, hot terms in
≥60% of rows, single-row rare terms.
"""

from __future__ import annotations

import base64
import hashlib
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 1729

LANGS = ["python", "javascript", "java", "go", "rust", "c", "markdown", "other"]
LANG_W = [0.35, 0.15, 0.12, 0.10, 0.08, 0.08, 0.07, 0.05]
LANG_KEYWORDS = {
    "python": ["def", "class", "return", "self", "import", "lambda", "yield"],
    "javascript": ["function", "const", "let", "return", "async", "await"],
    "java": ["public", "class", "static", "void", "return", "final"],
    "go": ["func", "package", "return", "defer", "struct", "interface"],
    "rust": ["fn", "let", "impl", "match", "return", "trait"],
    "c": ["int", "void", "return", "static", "struct", "sizeof"],
    "markdown": ["the", "and", "usage", "install", "example", "note"],
    "other": ["begin", "end", "return", "value", "item", "block"],
}
HOT_TERMS = ["def", "self", "return", "config"]

_WORDS = [
    "get", "set", "user", "name", "query", "plan", "index", "token", "batch",
    "shard", "merge", "score", "count", "parse", "read", "write", "block",
    "cache", "hash", "list", "node", "edge", "graph", "data", "field", "value",
    "store", "fetch", "record", "entry", "meta", "type", "handle", "remote",
    "local", "buffer", "stream", "group", "filter", "map", "join", "sort",
    "limit", "term", "doc", "file", "path", "repo", "commit", "lang", "text",
    "build", "load", "dump", "save", "sync", "async", "retry", "error", "state",
]
_SEG_VOCAB = ["src", "lib", "core", "utils", "internal", "pkg", "api", "tests",
              "docs", "cmd", "common", "engine", "io", "net", "fmt"]
_EXT = {"python": "py", "javascript": "js", "java": "java", "go": "go",
        "rust": "rs", "c": "c", "markdown": "md", "other": "txt"}


def _rng(i: int, salt: str) -> np.random.RandomState:
    h = int.from_bytes(hashlib.sha256(f"{SEED}:{salt}:{i}".encode()).digest()[:4], "big")
    return np.random.RandomState(h)


def _identifier(rng: np.random.RandomState) -> str:
    k = rng.randint(2, 4)
    ws = [_WORDS[rng.randint(len(_WORDS))] for _ in range(k)]
    if rng.rand() < 0.5:  # camelCase
        return ws[0] + "".join(w.capitalize() for w in ws[1:])
    return "_".join(ws)  # snake_case


def _content_for_row(i: int, lang: str) -> str:
    rng = _rng(i, "content")
    mod = i % 53
    if mod == 5:
        return ""
    if mod == 6:
        return "   \n\t  \n"
    n_lines = max(2, int(rng.lognormal(np.log(18.0), 0.9)))
    kws = LANG_KEYWORDS[lang]
    lines = []
    for _ in range(n_lines):
        r = rng.rand()
        if r < 0.45:
            lines.append(
                f"{kws[rng.randint(len(kws))]} {_identifier(rng)}({_identifier(rng)}):"
            )
        elif r < 0.7:
            lines.append(f"    {_identifier(rng)} = {_identifier(rng)}.{_identifier(rng)}")
        elif r < 0.85:
            lines.append(f"# {' '.join(_WORDS[rng.randint(len(_WORDS))] for _ in range(4))}")
        else:
            lines.append(f'    msg = "{ _identifier(rng) } {rng.randint(1000)}"')
    if (i * 2654435761) % 10 < 6:  # hot terms in ≥60% of rows
        lines.append("def config self return")
    if i % 37 == 3:  # rare term in exactly this row
        lines.append(f"uniqrare{i}qz")
    if i % 41 == 7:  # unicode
        lines.append("# naïve café 测试 données 😀")
    text = "\n".join(lines)
    if i % 10000 == 9999:  # one very large file per 10k rows (≥ 2 MB)
        text = (text + "\n") * max(1, (2_000_001 // (len(text) + 1)) + 1)
    return text


def make_corpus(n_rows: int, out_path: str, rows_per_group: int = 1000) -> str:
    """Write the corpus parquet (row-group size fixed → stable work items)."""
    if os.path.exists(out_path):
        return out_path
    repos, paths, commits, langs, contents = [], [], [], [], []
    lang_cum = np.cumsum(LANG_W)
    for i in range(n_rows):
        rng = _rng(i, "meta")
        lang = LANGS[int(np.searchsorted(lang_cum, rng.rand()))]
        nseg = rng.randint(1, 7)
        segs = [_SEG_VOCAB[rng.randint(len(_SEG_VOCAB))] for _ in range(nseg - 1)]
        fname = f"{_identifier(rng).replace('_', '')}{i}.{_EXT[lang]}"
        path = "/".join(segs + [fname])
        commit = hashlib.sha1(f"{SEED}:commit:{i}".encode()).hexdigest()
        content = _content_for_row(i, lang)
        if i % 29 == 1 and i > 0:  # exact duplicate of previous row's content
            content = contents[-1]
            lang = langs[-1]
        repos.append(f"org{i % 7}/repo{i % 23}")
        paths.append(path)
        commits.append(commit)
        langs.append(lang)
        contents.append(content)
    table = pa.table(
        {
            "repo": pa.array(repos, pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": pa.array(commits, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "content": pa.array(contents, pa.string()),
        }
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    tmp = out_path + ".tmp"
    pq.write_table(table, tmp, row_group_size=rows_per_group)
    os.replace(tmp, out_path)
    return out_path


def make_queries(n_queries: int, corpus_path: str, out_path: str) -> str:
    """Query mix per FIXTURES.md §2 (rare/hot/conjunction/compound/exact)."""
    if os.path.exists(out_path):
        return out_path
    t = pq.read_table(corpus_path, columns=["repo", "path"])
    repos = t["repo"].to_pylist()
    paths = t["path"].to_pylist()
    n_rows = len(repos)
    qs: list[str] = []
    ks: list[int] = []
    for q in range(n_queries):
        rng = _rng(q, "query")
        r = rng.rand()
        if r < 0.20:  # single rare term
            cand = [i for i in range(3, n_rows, 37)]
            i = cand[rng.randint(len(cand))]
            qs.append(f"uniqrare{i}qz")
        elif r < 0.30:  # single hot term
            qs.append(HOT_TERMS[rng.randint(len(HOT_TERMS))])
        elif r < 0.80:  # 2–5 term conjunction from vocabulary
            k = rng.randint(2, 6)
            qs.append(" ".join(_WORDS[rng.randint(len(_WORDS))] for _ in range(k)))
        elif r < 0.90:  # identifier compound — matches only after splitting
            w1, w2 = (_WORDS[rng.randint(len(_WORDS))] for _ in range(2))
            qs.append(f"{w1}{w2.capitalize()}Zx{q}")  # compound itself absent from corpus
        else:  # exact-field lookup (reference exact-match semantics)
            i = rng.randint(n_rows)
            if rng.rand() < 0.5:
                qs.append(f"path:{paths[i]}")
            else:
                qs.append(f"repo:{repos[i]} config")
        ks.append(int([10, 10, 10, 1, 100][rng.randint(5)]))
    table = pa.table(
        {
            "query_id": pa.array(np.arange(n_queries, dtype=np.int64)),
            "query": pa.array(qs, pa.string()),
            "k": pa.array(ks, pa.int32()),
        }
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    tmp = out_path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, out_path)
    return out_path


# ---------------------------------------------------------- records fixture
DT_KEYS = [
    ("21.T11148/b8457812905b83046284", "digitalObjectLocation"),
    ("21.T11148/6ae999552a0d2dca14d6", "name"),
    ("21.T11148/d0773859091aeb451528", "hasMetadata"),
    ("21.T11148/4fe7cde52629b61e3b82", "isMetadataFor"),
    ("21.T11148/aafd5fb4c7222e2d950a", "dateCreated"),
    ("21.T11148/397d831aa3a9d18eb52c", "dateModified"),
    ("21.T11969/d15381199a44a16dc88d", "characterizedCompound"),
    ("21.T11148/1c699a5d1b4ad3ba4956", "digitalObjectType"),
    ("21.T11148/076759916209e5d62bd5", "kernelInformationProfile"),
    ("21.T11148/a753134738da82809fc1", "hadPrimarySource"),
]


def _pid(i: int) -> str:
    doi = f"10.5281/fixture.{i:06d}"
    return base64.b64encode(doi.encode()).decode()


def make_records_long(n_records: int, out_path: str) -> str:
    """PIDRecord long format with duplicate fragments + duplicate entries."""
    if os.path.exists(out_path):
        return out_path
    pids, keys, names, values = [], [], [], []

    def add(i: int, key_idx: int, value: str):
        pids.append(_pid(i))
        k, nm = DT_KEYS[key_idx]
        keys.append(k)
        names.append(nm)
        values.append(value)

    for i in range(n_records):
        rng = _rng(i, "record")
        n_frag = 3 if i % 10 == 0 else (2 if i % 10 == 1 else 1)  # ~10%+10% dup pids
        for frag in range(n_frag):
            add(i, 0, f"https://example.org/records/{i}")  # digitalObjectLocation
            add(i, 1, f"record {_identifier(rng)} {i}")
            add(i, 4, f"2024-0{1 + i % 9}-1{i % 10}T0{i % 10}:00:00")
            if rng.rand() < 0.4:
                add(i, 6, json.dumps(
                    {"21.T11969/6c4d3deac9a49b65886a": 180.16 + (i % 50),
                     "21.T11969/f9cb9b53273ce0da7739": f"https://pubchem.ncbi.nlm.nih.gov/compound/{i}"},
                    sort_keys=True))
            if rng.rand() < 0.5:  # duplicate (pid,key,value) — add-time dedup case
                add(i, 1, f"record {_identifier(rng)} {i}")
            if frag > 0 and rng.rand() < 0.7:  # fragment-specific extra key
                add(i, 7, f"type-{frag}")
    table = pa.table(
        {
            "pid": pa.array(pids, pa.string()),
            "key": pa.array(keys, pa.string()),
            "name": pa.array(names, pa.string()),
            "value_json": pa.array(values, pa.string()),
        }
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    tmp = out_path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, out_path)
    return out_path


def make_edges(n_records: int, n_edges: int, out_path: str) -> str:
    """Edges with pid targets (~70%), location targets (~30%), dangling (~5%)."""
    if os.path.exists(out_path):
        return out_path
    targets, sources, relations = [], [], []
    for e in range(n_edges):
        rng = _rng(e, "edge")
        src = _pid(rng.randint(n_records))
        rel = "hasMetadata" if rng.rand() < 0.5 else "isMetadataFor"
        r = rng.rand()
        if r < 0.05:  # dangling
            tgt = _pid(n_records + 1000 + e)
        elif r < 0.35:  # digitalObjectLocation target
            tgt = f"https://example.org/records/{rng.randint(n_records)}"
        else:  # pid target
            tgt = _pid(rng.randint(n_records))
        targets.append(tgt)
        sources.append(src)
        relations.append(rel)
    table = pa.table(
        {
            "presumed_target": pa.array(targets, pa.string()),
            "source_pid": pa.array(sources, pa.string()),
            "relation": pa.array(relations, pa.string()),
        }
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    tmp = out_path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, out_path)
    return out_path


def fixture_dir(scale: str, root: str = "/tmp/nmr_fair_dos_ray/fixtures") -> dict[str, str]:
    """Materialize all fixtures at a named scale; returns table paths."""
    n = {"sf-unit": 200, "sf-test": 2000, "sf-bench": 150000}[scale]
    # cache key includes the row count so a scale redefinition can't collide
    # with a previously generated corpus
    d = os.path.join(root, f"{scale}-{n}")
    os.makedirs(d, exist_ok=True)
    corpus = make_corpus(n, os.path.join(d, "corpus.parquet"))
    queries = make_queries(max(40, n // 20), corpus, os.path.join(d, "queries.parquet"))
    records = make_records_long(max(50, n // 4), os.path.join(d, "records_long.parquet"))
    edges = make_edges(max(50, n // 4), max(80, n // 2), os.path.join(d, "edges.parquet"))
    return {"corpus": corpus, "queries": queries, "records_long": records, "edges": edges}
