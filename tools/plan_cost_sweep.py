"""Plan-CONSTRUCTION cost sweep (guide §1/§4): time builder() twice per
headline query without executing the returned DataFrame. build2 is the
steady-state Python-side plan construction cost (py4j round trips +
internal memoized actions already amortized); build1 - build2 is one-time
model/fixture work. Prints a sorted JSON report.

Usage: python tools/plan_cost_sweep.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/plan_cost_sweep.json"
    os.environ.setdefault("SPARK_GRAFT_INDEX_DIR", tempfile.mkdtemp(prefix="sweep_idx_"))

    import bench
    from parquet_storage_query_spark.registry import all_queries
    from parquet_storage_query_spark.session import get_spark

    spark = get_spark("plan_cost_sweep")
    qs = all_queries()
    spark.range(1).count()
    rows = []
    for name in bench.HEADLINE:
        qd = qs[name]
        try:
            t0 = time.perf_counter()
            qd.builder(spark, sf_dir)
            b1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            qd.builder(spark, sf_dir)
            b2 = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001
            rows.append({"name": name, "error": str(e)[:200]})
            continue
        rows.append({"name": name, "build1": round(b1, 3), "build2": round(b2, 3)})
        print(f"# {name}: build1={b1:.3f}s build2={b2:.3f}s", file=sys.stderr, flush=True)
    rows.sort(key=lambda r: -r.get("build2", 0))
    with open(out_path, "w") as fh:
        json.dump(rows, fh, indent=1)
    tot1 = sum(r.get("build1", 0) for r in rows)
    tot2 = sum(r.get("build2", 0) for r in rows)
    print(json.dumps({"total_build1": round(tot1, 1), "total_build2": round(tot2, 1),
                      "n": len(rows), "out": out_path}))


if __name__ == "__main__":
    main()
