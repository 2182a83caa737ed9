"""Regression gate for the round-7 hash-anomaly root cause.

Every CORRECTNESS_r04-r06 hash-red (rows/schema green, hash red,
irreproducible by fetchall-based emulation) traced to one mechanism:
DuckDB oracle output columns of implicit type HUGEINT (SUM over BIGINT)
or DECIMAL render float64 under the pandas fetch path while Spark's
BIGINT stays int64. This test bans those oracle output types — and bare
DATE, whose rendering flips with the fetch path on BOTH engines —
permanently: a new query whose oracle forgets the CAST fails here, at
sf0.001, in seconds, instead of red-flagging a driver round later.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tests.conftest import SF_SMOKE
from tools.type_audit import audit_oracle_types


def test_no_fetch_path_dependent_oracle_types():
    problems = audit_oracle_types(SF_SMOKE)
    assert problems == [], "\n".join(problems)
