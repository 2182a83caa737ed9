"""Local emulation of the driver's correctness gate.

Runs every registered query on Spark at the given sf_dir AND its DuckDB
oracle on the same parquet files, then compares row count, sorted column
names, and an order-insensitive value hash. Stricter than tolerant — if
this passes, the driver's CORRECTNESS check should too.

Usage: python tools/check.py [--threads N] [--pandas] [sf_dir] [query ...]

`--threads N` fans the SPARK side across N concurrent threads of one
session before the sequential oracle comparison — the emulation of a
harness that runs registered queries in parallel. This is the one mode
that could reproduce the CORRECTNESS_r05 artifact-corruption signature
pre-round-6 (concurrent overwrite of a shared artifact dir); with the
committed-artifact protocol it must stay green.

`--pandas` fetches BOTH engines' results through their pandas paths
(Spark `toPandas()`, DuckDB `.df()`) instead of collect()/fetchall().
This is the ROUND-7 DISCOVERY mode: a driver that fetches via pandas
sees DuckDB HUGEINT (the implicit result type of SUM(BIGINT)) and
DECIMAL columns as float64 while Spark's BIGINT stays int64 — "42.0"
vs "42" — a hash mismatch invisible to every fetchall()-based
emulation. All 20 CORRECTNESS_r06 hash-reds, and ONLY those among the
sampled queries, had a HUGEINT/DECIMAL oracle output column. A query
is done only when it passes this gate in BOTH fetch modes.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from parquet_storage_query_spark.catalog import TABLES, table_path
from parquet_storage_query_spark.fingerprint import (  # noqa: F401  (re-export)
    norm_cell,
    result_fingerprint,
)
from parquet_storage_query_spark.registry import all_queries, resolve_oracle
from parquet_storage_query_spark.session import get_spark


def pandas_rows(pdf) -> list[tuple]:
    """Render a pandas frame the way a repr-based comparator would see it:
    numpy scalars keep their dtype identity (str(np.float64(42.0)) ==
    '42.0'), so int64-vs-float64 engine divergence must fingerprint
    differently here — that is the point of the mode."""
    return [tuple(r) for r in pdf.itertuples(index=False, name=None)]


def main() -> int:
    # order-insensitive flag parsing: `--pandas --threads 4` and
    # `--threads 4 --pandas` must both compose (ADVICE r7: the old
    # positional loop silently consumed --pandas as the sf_dir)
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--threads", type=int, default=0)
    ap.add_argument("--pandas", dest="use_pandas", action="store_true")
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("queries", nargs="*")
    ns = ap.parse_args()
    threads = ns.threads
    use_pandas = ns.use_pandas
    sf_dir = ns.sf_dir
    only = set(ns.queries)
    unknown = only - set(all_queries())
    if unknown:
        # a typo'd name must not yield a green "0 ok, 0 failed" gate
        print(f"unknown queries: {sorted(unknown)}", file=sys.stderr)
        return 2
    spark = get_spark("check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')")

    qs = all_queries()
    todo = [n for n in sorted(qs) if not only or n in only]

    spark_results: dict[str, tuple[list[str], list[tuple]] | Exception] = {}
    if threads:
        # concurrent-driver emulation: run every Spark side first, N-wide
        from concurrent.futures import ThreadPoolExecutor

        def run_spark(name: str) -> None:
            try:
                sdf = qs[name].builder(spark, sf_dir)
                rows = pandas_rows(sdf.toPandas()) if use_pandas else [tuple(r) for r in sdf.collect()]
                spark_results[name] = (sdf.columns, rows)
            except Exception as e:  # noqa: BLE001
                spark_results[name] = e

        with ThreadPoolExecutor(max_workers=threads) as pool:
            list(pool.map(run_spark, todo))

    failures, passed, rows_only = [], 0, 0
    for name in todo:
        qd = qs[name]
        t0 = time.perf_counter()
        try:
            if threads:
                got = spark_results[name]
                if isinstance(got, Exception):
                    raise got
                scols, srows = got
            else:
                sdf = qd.builder(spark, sf_dir)
                scols = sdf.columns
                if use_pandas:
                    srows = pandas_rows(sdf.toPandas())
                else:
                    srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            continue
        if qd.oracle is None:
            rows_only += 1
            print(f"rows  {name}: {len(srows)} rows ({time.perf_counter()-t0:.1f}s) [no oracle]")
            continue
        try:
            if use_pandas:
                opdf = con.sql(resolve_oracle(qd.oracle, sf_dir)).df()
                ocols = list(opdf.columns)
                orows = pandas_rows(opdf)
            else:
                cur = con.execute(resolve_oracle(qd.oracle, sf_dir))
                ocols = [d[0] for d in cur.description]
                orows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            continue
        sfp = result_fingerprint(scols, srows)
        ofp = result_fingerprint(ocols, orows)
        if sfp == ofp:
            passed += 1
            print(f"ok    {name}: {sfp[0]} rows ({time.perf_counter()-t0:.1f}s)")
        else:
            failures.append((name, "mismatch"))
            print(f"FAIL  {name}: spark={sfp[0]} rows cols={sfp[1]} hash={sfp[2][:8]}")
            print(f"      oracle={ofp[0]} rows cols={ofp[1]} hash={ofp[2][:8]}")
            if sfp[1] != ofp[1]:
                print("      COLUMN MISMATCH")
            elif sfp[0] == ofp[0]:
                smap = {l for l in ("|".join(norm_cell(r[i]) for i in sorted(range(len(scols)), key=lambda i: scols[i])) for r in srows)}
                omap = {l for l in ("|".join(norm_cell(r[i]) for i in sorted(range(len(ocols)), key=lambda i: ocols[i])) for r in orows)}
                for d in list(smap - omap)[:3]:
                    print(f"      spark-only : {d[:200]}")
                for d in list(omap - smap)[:3]:
                    print(f"      oracle-only: {d[:200]}")
    print(f"\n{passed} ok, {rows_only} rows-only, {len(failures)} failed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
