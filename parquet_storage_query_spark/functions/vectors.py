"""Vector math over `array<float>` columns — pure JVM expressions.

No UDFs: dot products and norms are `F.aggregate`/`F.zip_with` folds, which
run inside codegen and vectorize fine. Arrays are cast to double before any
arithmetic so results are bit-comparable with a double-math oracle
(float32 accumulation would drift from DuckDB's double accumulation).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def lit_long_array(vals) -> Column:
    """array<bigint> literal built as ONE parsed SQL expression.

    `F.array(*[F.lit(v) for v in vals])` makes 2+ py4j round trips per
    element — a 1024-word bloom bitmap cost ~2s of pure plan-construction
    latency per query on a slow control socket (guide §4: control how the
    boundary is crossed). The parsed literal tree is identical (foldable
    CreateArray of bigint Literals), so plans and results are unchanged."""
    return F.expr("array(" + ",".join(f"{int(v)}L" for v in vals) + ")")


def as_double(arr: Column | str) -> Column:
    c = F.col(arr) if isinstance(arr, str) else arr
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢbᵢ — left-to-right fold, same order DuckDB's list_dot_product uses.

    Kept as a zip_with/aggregate HOF deliberately: an unrolled 64-term
    element_at chain (bit-identical math) was benchmarked on the LSH hot
    paths and was 2-6× SLOWER — the deep Add tree falls out of
    whole-stage codegen and the per-term array extraction dominates."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two double arrays."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
