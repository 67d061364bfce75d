"""Corpus sources: deterministic row-group work items over Parquet."""

from nmr_fair_dos_ray.sources.parquet_source import (  # noqa: F401
    RowGroupReader,
    corpus_paths,
    work_items,
    work_items_dataset,
    documents_as_corpus,
)
