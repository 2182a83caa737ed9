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


def _split_top_level(s: str) -> list[str]:
    """Split on commas not nested inside (), [] — In(col, [a,b]) is ONE
    filter, not four fragments."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        out.append(tail)
    return out


def pushed_filters(plan: str) -> list[str]:
    """All PushedFilters entries across scans (flattened). Greedy to the
    line's last ']' so bracketed filter arguments (In(col, [a,b])) stay
    intact."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*)\]", plan):
        entry = m.group(1).strip()
        if entry:
            out.extend(_split_top_level(entry))
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
    per-blob-partial + client-merge (SURVEY §2.3). Counts NODES via their
    '(n) HashAggregate' detail headers: raw substring counting sees every
    node twice in formatted output (tree line + detail section), which
    made a single-aggregate plan look two-phase."""
    nodes = re.findall(r"\(\d+\) (?:HashAggregate|SortAggregate|ObjectHashAggregate)", plan)
    return len(nodes) >= 2


def _execute_row_free(df: DataFrame) -> None:
    """Run the query without materializing rows in the driver: counting
    the SAME QueryExecution's internal RDD JVM-side finalizes the AQE plan
    exactly like collect(), but a plan audit on a wide result can't OOM
    the driver. (A noop-format write does NOT work: it executes a separate
    QueryExecution, leaving df's own AQE plan unfinalized.)"""
    df._jdf.queryExecution().toRdd().count()


def whole_stage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (`*(N)` markers) in the executed
    plan. Under AQE the final plan only exists after execution, so this
    runs the query (row-free) first."""
    _execute_row_free(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(set(re.findall(r"\*\((\d+)\)", plan)))


def executed_plan(df: DataFrame) -> str:
    """Final (post-AQE) physical plan string; executes the query row-free."""
    _execute_row_free(df)
    return df._jdf.queryExecution().executedPlan().toString()


def static_broadcast_hints(df: DataFrame) -> int:
    """Number of STATIC broadcast hints in the analyzed logical plan —
    the hint-policy audit primitive: a `broadcast()` wrapped around a
    corpus-proportional side is an OOM at 1000 executors, so growing
    sides must show ZERO here and let AQE choose at runtime; only
    constant-size sides (nation/region, literal models, 1-row scalars)
    may hint. Counted on the ANALYZED plan because the optimizer consumes
    hints into join strategies later."""
    analyzed = df._jdf.queryExecution().analyzed().toString()
    return len(re.findall(r"ResolvedHint \(strategy=broadcast\)", analyzed))
