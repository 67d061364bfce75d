"""SnippetStage: deterministic best-window highlight extraction."""

import pyarrow as pa

from nmr_fair_dos_ray.pipelines.textops import SnippetStage


def _run(texts, terms, window=4):
    stage = SnippetStage(query_terms=terms, window=window)
    b = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    return stage(b).to_pylist()


def test_best_window_counts_and_ties():
    rows = _run(
        [
            "x q y q z q a b c",      # best window of 4 starting at first q
            "a b c d",                # no match
            "q",                      # single token doc
            "a a a q b q",            # window must start at a match
        ],
        ["q"],
        window=4,
    )
    # doc 0: windows starting at matches: pos1→{q,y,q,z}=2, pos3→{q,z,q,a}=2,
    # pos5→1 ⇒ earliest tie wins (start=1)
    assert rows[0]["n_matched"] == 2 and rows[0]["snippet"] == "q y q z"
    assert rows[1]["n_matched"] == 0 and rows[1]["snippet"] == ""
    assert rows[2]["n_matched"] == 1 and rows[2]["snippet"] == "q"
    # doc 3: start=3 covers {q,b,q} (clipped) with 2 matches
    assert rows[3]["n_matched"] == 2 and rows[3]["snippet"] == "q b q"


def test_window_clips_at_doc_end_and_multiterm():
    rows = _run(["alpha beta gamma beta", "beta"], ["beta", "gamma"], window=3)
    # doc 0: start=1 → {beta,gamma,beta} = 3 matches
    assert rows[0]["n_matched"] == 3 and rows[0]["snippet"] == "beta gamma beta"
    assert rows[1]["snippet"] == "beta"


def test_code_mode_matches_per_row_bruteforce():
    """ADVICE r3: code mode's token stream arrives grouped
    [all compounds] + [all identifier parts], not (row, pos) order — the
    stage must re-sort before the window count / gather. Checked against a
    brute-force per-row scan over the tokenizer's own stream."""
    from nmr_fair_dos_ray.tokenizer import Tokenizer

    texts = [
        "def getUserName(self): return user_name",
        "snake_case camelCase SIMPLE then snake again",
        "no hits here at all",
        "",
    ]
    terms = ["user", "name", "snake", "simple"]
    window = 5
    stage = SnippetStage(query_terms=terms, window=window, mode="code")
    b = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    got = stage(b).to_pylist()
    tok = Tokenizer("code")
    tset = set(terms)
    for i, t in enumerate(texts):
        stream = tok.tokenize(t)
        bc, bs = 0, 0
        for j, w in enumerate(stream):
            if w not in tset:
                continue  # windows start at a matched token
            c = sum(1 for x in stream[j:j + window] if x in tset)
            if c > bc:
                bc, bs = c, j
        assert got[i]["n_matched"] == bc, (i, stream)
        assert got[i]["snippet"] == (
            " ".join(stream[bs:bs + window]) if bc else ""
        ), (i, stream)


def test_empty_batch():
    stage = SnippetStage(query_terms=["q"], window=4)
    b = pa.table({"doc_id": pa.array([], pa.int64()),
                  "text": pa.array([], pa.string())})
    out = stage(b)
    assert out.num_rows == 0
