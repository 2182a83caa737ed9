"""Plan-audit helpers: capture `.explain("formatted")` output and assert
the physical properties that matter at 100 TB — filters pushed to the
parquet scan, columns pruned, dimension joins broadcast, top-k planned as
TakeOrderedAndProject, aggregates split partial/final.

The reference encodes these properties by hand (filters inside the
per-blob SQL, QueryOrchestration.cs:232/315/338; one-column SELECT,
QO:202); here Catalyst provides them, and these helpers are how tests and
developers PROVE the plan stayed right instead of assuming it."""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The physical plan as text (df.explain prints; we capture)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(plan: str) -> list[str]:
    """All PushedFilters entries across scans (flattened)."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        entry = m.group(1).strip()
        if entry:
            out.extend(p.strip() for p in entry.split(","))
    return out


def read_schemas(plan: str) -> list[str]:
    """ReadSchema struct strings, one per file scan."""
    return [m.group(1) for m in re.finditer(r"ReadSchema: (struct<[^\n]*)", plan)]


def has_broadcast_join(plan: str) -> bool:
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def has_sort_merge_or_shuffle_join(plan: str) -> bool:
    return "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def has_take_ordered(plan: str) -> bool:
    return "TakeOrderedAndProject" in plan


def has_partial_final_agg(plan: str) -> bool:
    """Two-phase aggregation: a partial HashAggregate below the exchange
    and a final one above — the plan shape that IS the reference's
    per-blob-partial + client-merge (SURVEY §2.3)."""
    return plan.count("HashAggregate") >= 2 or plan.count("SortAggregate") >= 2


def whole_stage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (`*(N)` markers) in the executed
    plan. Under AQE the final plan only exists after execution, so this
    runs the query (collect) first."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(set(re.findall(r"\*\((\d+)\)", plan)))


def executed_plan(df: DataFrame) -> str:
    """Final (post-AQE) physical plan string; executes the query."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()
