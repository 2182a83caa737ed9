"""Canonical result fingerprint for dual-engine comparison (reference D6:
QueryOrchestration.cs:371-401 runs storage + ADX back-to-back; here Spark +
DuckDB results reduce to (row count, sorted column names, order-insensitive
value hash)).

ONE implementation shared by tools/check.py (the local driver-gate
emulation) and runner.py's differential mode — round 1 carried two copies
whose drift masked a real divergence (ADVICE r1: runner's norm lacked the
isfinite guard; check.py's canonicalized int-valued floats, hiding the
prep_binpack_plan HUGEINT mismatch the driver caught).

STRICT float rendering: int-valued floats keep their ".0" — the driver
renders a float64 cell as "149174.0" while Spark's BIGINT renders
"149174", so an engine type divergence must fingerprint differently here
too (the oracle then needs a CAST, not the comparator a pardon).
"""

from __future__ import annotations

import hashlib
import math


def norm_cell(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(bool(v)).lower()
    if isinstance(v, float):
        if not math.isfinite(v):  # int(v)/repr paths must not raise on nan/inf
            return repr(v)
        if v == 0.0:  # fold -0.0 into 0.0 (same value on both engines)
            return "0.0"
        return repr(v)
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def result_fingerprint(cols: list[str], rows: list[tuple]) -> tuple[int, tuple[str, ...], str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.md5("\n".join(lines).encode()).hexdigest()
    return len(rows), tuple(sorted(cols)), h
