"""Per-query profiling for the optimization rounds (guide §1).

For each named query: run it twice in this session against a fresh index
dir (run1 - run2 = one-time fixture/memo/build cost; run2 = steady-state
serve), force execution through the same internal-RDD count bench.py uses,
and optionally dump .explain("formatted") to plans/<tag>/<name>_<when>.txt.

Usage:
  python tools/profile_queries.py [--explain-dir plans/r11] [--tag before] \
      [--sf-dir /root/testdata/sf0.1] name [name ...]

Prints one JSON line per query: {"name":..., "run1":..., "run2":..., "rows":...}
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--tag", default="before")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    idx = tempfile.mkdtemp(prefix="profile_idx_")
    os.environ["SPARK_GRAFT_INDEX_DIR"] = idx
    import atexit

    atexit.register(lambda: shutil.rmtree(idx, ignore_errors=True))

    from parquet_storage_query_spark.registry import all_queries
    from parquet_storage_query_spark.session import get_spark

    spark = get_spark("profile")
    qs = all_queries()
    # same warmup as bench.py
    spark.range(1).count()
    qs["ref_total_count"].builder(spark, args.sf_dir)._jdf.queryExecution().toRdd().count()

    for name in args.names:
        qd = qs[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        times = []
        rows = 0
        build_s = None  # --runs 0 would otherwise NameError below (ADVICE r11)
        for i in range(args.runs):
            t0 = time.perf_counter()
            df = qd.builder(spark, args.sf_dir)
            built = time.perf_counter() - t0
            rows = df._jdf.queryExecution().toRdd().count()
            times.append(round(time.perf_counter() - t0, 3))
            if i == 0:
                build_s = round(built, 3)
        if args.explain_dir:
            out = Path(args.explain_dir)
            out.mkdir(parents=True, exist_ok=True)
            df = qd.builder(spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            (out / f"{name}_{args.tag}.txt").write_text(plan)
        spark.sparkContext.setJobDescription(None)
        rec = {"name": name, "runs": times, "plan_build_s": build_s, "rows": rows}
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
