"""Recall-vs-exact for the approximate ANN tiers at scale (VERDICT r4
'Next round' #8): run sim_lsh_topk / sim_ivf_topk against the brute-force
baseline on an arbitrary sf dir — in particular the 10× corpus built by
tools/make_scaled_sf.py — and verify the recall@5 floors pinned at small
SF (tests/test_dedup_synthetic.py::test_ann_recall_vs_bruteforce: IVF
0.5, LSH 0.4) still hold. The scaled corpus preserves within-replica
cosine structure exactly (coordinate permutations are orthogonal), so a
recall collapse here would mean the index parameters — not the data —
stop working at scale.

Usage: python tools/check_recall_at_scale.py [sf_dir] [out_json]
Prints one JSON line; exit 1 if any tier is under its floor.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from parquet_storage_query_spark.session import get_spark

FLOORS = {"ivf": 0.5, "lsh": 0.4}


def topk_sets(df) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark("recall-check")

    from parquet_storage_query_spark.operators.similarity import (
        sim_bruteforce_topk,
        sim_ivf_topk,
        sim_lsh_topk,
    )

    exact = topk_sets(sim_bruteforce_topk(spark, sf_dir))
    total = sum(len(v) for v in exact.values())
    report: dict[str, object] = {"sf_dir": sf_dir, "n_queries": len(exact), "k_total": total}
    ok = True
    for name, builder in (("ivf", sim_ivf_topk), ("lsh", sim_lsh_topk)):
        approx = topk_sets(builder(spark, sf_dir))
        assert set(approx) <= set(exact), f"{name}: phantom query ids"
        hits = sum(len(approx.get(q, set()) & exact[q]) for q in exact)
        recall = round(hits / total, 4)
        report[f"recall_at_5_{name}"] = recall
        report[f"floor_{name}"] = FLOORS[name]
        if recall < FLOORS[name]:
            ok = False
    report["ok"] = ok
    line = json.dumps(report)
    print(line)
    if out_path:
        Path(out_path).write_text(line + "\n", encoding="utf-8")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
