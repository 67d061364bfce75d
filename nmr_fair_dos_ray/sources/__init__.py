"""Corpus sources: deterministic row-group work items over Parquet."""

from nmr_fair_dos_ray.sources.parquet_source import (  # noqa: F401
    RowGroupReader,
    corpus_paths,
    work_items,
    work_items_dataset,
    documents_as_corpus,
)

# ---------------------------------------------------------------------------
# §2.11 extension surface: corpus-source registry. The reference registers
# repositories by name behind AbstractRepository
# (reference: src/nmr_FAIR_DOs/lib.py:66-117); the engine's analog lets a new
# corpus format plug into the index build without touching pipeline code:
# a source is any callable ``(uri) -> list[work_item]`` plus a reader
# ``(work_item, columns) -> pyarrow.Table``.
from collections.abc import Callable

SOURCE_REGISTRY: dict[str, dict[str, Callable]] = {}


def register_source(name: str, *, work_items: Callable, read_work_item: Callable,
                    corpus_paths: Callable) -> None:
    SOURCE_REGISTRY[name] = {
        "work_items": work_items,
        "read_work_item": read_work_item,
        "corpus_paths": corpus_paths,
    }


def get_source(name: str) -> dict[str, Callable]:
    try:
        return SOURCE_REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown corpus source {name!r}; registered: {sorted(SOURCE_REGISTRY)}"
        ) from None


def _register_builtin() -> None:
    from nmr_fair_dos_ray.sources import parquet_source as ps

    register_source(
        "parquet",
        work_items=ps.work_items,
        read_work_item=ps.read_work_item,
        corpus_paths=ps.corpus_paths,
    )


_register_builtin()
