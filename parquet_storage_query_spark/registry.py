"""Central query registry.

Every operator in SURVEY.md §2 registers here as (name, spark builder,
optional DuckDB oracle SQL). `__spark_entry__.py` exposes the registry to
the driver; `tests/` and `bench.py` iterate it. One source of truth keeps
the three consumers (driver correctness gate, pytest, bench) in lockstep.

Builders have signature (spark, sf_dir) -> DataFrame. Oracle SQL runs on
DuckDB with the corpus tables pre-registered as views. Queries without an
oracle (approximate / non-SQL-expressible, e.g. LSH, streaming) register
oracle=None and get a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    builder: Builder
    oracle: str | None
    doc: str


_REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None):
    """Decorator: register a builder under `name` with its oracle SQL."""

    def deco(fn: Builder) -> Builder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QueryDef(name=name, builder=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def all_queries() -> dict[str, QueryDef]:
    _ensure_loaded()
    return dict(_REGISTRY)


def builders() -> dict[str, Builder]:
    return {n: d.builder for n, d in all_queries().items()}


def oracles() -> dict[str, str]:
    return {n: d.oracle for n, d in all_queries().items() if d.oracle is not None}


_loaded = False


def _ensure_loaded() -> None:
    """Import every operator module for its registration side effects."""
    global _loaded
    if _loaded:
        return
    from .operators import (  # noqa: F401
        advanced,
        dedup,
        multimodal,
        reference,
        relational,
        similarity,
        text,
        windows,
    )
    from .functions import scalar  # noqa: F401
    from .streaming import joins as stream_joins  # noqa: F401
    from .streaming import stateful as stream_stateful  # noqa: F401
    from .streaming import windows as stream_windows  # noqa: F401

    _loaded = True
