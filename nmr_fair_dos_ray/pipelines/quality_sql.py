"""SQL-checkable quality features (the subset of textops.QualityStage whose
semantics DuckDB can reproduce exactly — see __ray_entry__.oracle_sql)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


from nmr_fair_dos_ray.functions.rounding import round_half_away


def quality_sql_features(sf_dir: str) -> pd.DataFrame:
    """Per-doc: n_chars_q (char count), n_tokens (whitespace tokens),
    mean_token_len (non-ws chars / tokens, round 4). Fully Arrow-vectorized."""
    from nmr_fair_dos_ray.sources import sized_read_parquet

    docs = sized_read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def feats(b: pa.Table) -> pa.Table:
        texts = b["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.fill_null(texts, "")
        n_chars = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.int64)
        nonws = pc.utf8_length(
            pc.replace_substring_regex(texts, pattern=r"\s", replacement="")
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        split = pc.split_pattern_regex(texts, pattern=r"\s+")
        flat = pc.list_flatten(split)
        lens = pc.list_value_length(split).to_numpy(zero_copy_only=False).astype(np.int64)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False).astype(np.int64)
        rows = np.repeat(np.arange(b.num_rows), lens)
        n_tokens = np.zeros(b.num_rows, np.int64)
        np.add.at(n_tokens, rows, nonempty)
        mean_len = round_half_away(nonws / np.maximum(n_tokens, 1), 4)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_chars_q": pa.array(n_chars),
                "n_tokens": pa.array(n_tokens),
                "mean_token_len": pa.array(mean_len, pa.float64()),
            }
        )

    return (
        docs.map_batches(feats, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
