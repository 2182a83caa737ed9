"""FINGERPRINTS.json side-channel (VERDICT r6 next-round #3).

At round close, record the builder's own result fingerprint for every
priority-head query at BOTH driver-relevant scales and under BOTH fetch
paths (native collect/fetchall AND pandas toPandas/.df() — the round-7
root-cause axis). The next judge can then diff a red driver row against
this file in seconds and tell "the driver computed a different hash"
from "the driver computed a different result", per fetch mode.

Usage: python tools/dump_fingerprints.py [n_head] [out_path]
Writes: {query: {"<sfname>": {"rows": n,
                              "native": {"spark": h, "oracle": h, "match": b},
                              "pandas": {"spark": h, "oracle": h, "match": b}}}}
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from parquet_storage_query_spark.catalog import TABLES, table_path
from parquet_storage_query_spark.fingerprint import result_fingerprint
from parquet_storage_query_spark.registry import all_queries, resolve_oracle
from parquet_storage_query_spark.session import get_spark

SCALES = {"sf0.001": "/root/testdata/sf0.001", "sf0.01": "/root/testdata/sf0.01"}


def pandas_rows(pdf) -> list[tuple]:
    return [tuple(r) for r in pdf.itertuples(index=False, name=None)]


def main() -> int:
    n_head = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    out_path = sys.argv[2] if len(sys.argv) > 2 else "FINGERPRINTS.json"
    spark = get_spark("fingerprints")
    qs = all_queries()
    head = list(qs)[:n_head]
    out: dict[str, dict] = {}
    for sf_name, sf_dir in SCALES.items():
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
            )
        for name in head:
            qd = qs[name]
            rec = out.setdefault(name, {}).setdefault(sf_name, {})
            try:
                sdf = qd.builder(spark, sf_dir)
                scols = sdf.columns
                native_rows = [tuple(r) for r in sdf.collect()]
                pd_rows = pandas_rows(sdf.toPandas())
                rec["rows"] = len(native_rows)
                s_native = result_fingerprint(scols, native_rows)[2]
                s_pandas = result_fingerprint(scols, pd_rows)[2]
                if qd.oracle is None:
                    rec["native"] = {"spark": s_native, "oracle": None, "match": None}
                    rec["pandas"] = {"spark": s_pandas, "oracle": None, "match": None}
                    continue
                sql = resolve_oracle(qd.oracle, sf_dir)
                cur = con.execute(sql)
                ocols = [d[0] for d in cur.description]
                o_native = result_fingerprint(ocols, cur.fetchall())[2]
                opdf = con.sql(sql).df()
                o_pandas = result_fingerprint(list(opdf.columns), pandas_rows(opdf))[2]
                rec["native"] = {
                    "spark": s_native, "oracle": o_native, "match": s_native == o_native,
                }
                rec["pandas"] = {
                    "spark": s_pandas, "oracle": o_pandas, "match": s_pandas == o_pandas,
                }
            except Exception as e:  # noqa: BLE001
                rec["error"] = str(e)[:200]
        con.close()
    Path(out_path).write_text(json.dumps(out, indent=1, sort_keys=True))
    bad = [
        (n, sf, m)
        for n, scales in out.items()
        for sf, rec in scales.items()
        for m in ("native", "pandas")
        if rec.get(m, {}).get("match") is False
    ]
    print(f"wrote {out_path}: {len(out)} queries x {len(SCALES)} scales")
    for n, sf, m in bad:
        print(f"MISMATCH {n} @ {sf} [{m}]")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
