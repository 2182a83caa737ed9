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

# PQ floor context: this corpus is near-random (max pair cosine ~0.51 —
# see similarity.py SEM_THRESHOLD note), the hardest possible regime for
# a 12-bit code; measured recall@5 is 0.28 at sf0.1 and a parameter sweep
# (S x K x iters up to 16x16x3) tops out at 0.32. The floor is a collapse
# detector, not a quality bar — real clustered embedding corpora sit far
# higher at the same code budget.
#
# On make_scaled_sf corpora the floor is REPORT-ONLY for pq: the scaler
# gives every replica its own coordinate permutation, so one global
# codebook faces a mixture of incompatible bases — measured 0.16 at 10x,
# and GROWING K makes it worse (0.08 at K=32: finer cells split along
# replica bases, not neighbor structure). That is a real PQ lesson —
# heterogeneous shard mixtures need per-partition codebooks (IVF+PQ
# trains PQ within coarse cells for exactly this reason) — but it is a
# property of the synthetic permutation scaling, not of the operator;
# ivf/lsh are unaffected because their structures are per-vector.
# IVF+PQ's floor is pinned at pq's: cell confinement can only LOSE
# candidates vs flat PQ scoring everything, but with N_PROBE=4 of 10
# cells the measured recall matches flat PQ on this corpus (the true
# neighbors' cells are almost always probed — cell assignment uses the
# full vector while PQ quantizes subspaces independently). Both PQ
# floors are enforced on /root/testdata dirs and report-only on
# permutation-scaled corpora.
# pq_refine (round 9, VERDICT r8 #7): the ADC-shortlist + exact-refine
# composition (sim_pq_refine_topk) converts the same 12-bit codes into
# recall@5 ≈ 0.6 by re-ranking R=50 candidates per probe with exact
# cosine — its floor is a real QUALITY bar (0.4), enforced on testdata
# like the other pq floors. Its baseline is the cosine brute force (the
# refine stage ranks by cosine, so no metric mixing).
# lsh_mp (round 10, VERDICT r9 #6): Hamming-1 multi-probe over the same
# banded index converts base-LSH's 0.52 into 0.96 at sf0.1 by also
# probing the 6 one-plane-flip neighbor buckets per band — its floor is
# a real quality bar (0.6), enforced everywhere like pq_refine's.
FLOORS = {
    "ivf": 0.5,
    "lsh": 0.4,
    "lsh_mp": 0.6,
    "pq": 0.2,
    "ivfpq": 0.2,
    "pq_refine": 0.4,
    # enforced on EVERY corpus (the sentinel escalation is the mechanism
    # that keeps it true at scale — see the pq_adaptive block below)
    "pq_adaptive": 0.2,
    # sq8 (round 11): per-dimension 8-bit lattice, asymmetric
    # reconstruction cosine — measured 0.88 at sf0.01 / 1.0 at sf0.1;
    # 8 bits/dim barely dents a cosine ranking, so a drop below 0.6 is
    # a collapse signal, enforced everywhere (quantization is
    # per-vector, so permutation scaling cannot break it the way it
    # breaks one global PQ codebook)
    "sq8": 0.6,
}


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
        sim_lsh_multiprobe_topk,
        sim_lsh_topk,
    )

    exact = topk_sets(sim_bruteforce_topk(spark, sf_dir))
    total = sum(len(v) for v in exact.values())
    report: dict[str, object] = {"sf_dir": sf_dir, "n_queries": len(exact), "k_total": total}
    ok = True
    from parquet_storage_query_spark.operators.similarity import sim_sq8_topk

    for name, builder in (
        ("ivf", sim_ivf_topk),
        ("lsh", sim_lsh_topk),
        ("lsh_mp", sim_lsh_multiprobe_topk),
        ("sq8", sim_sq8_topk),
    ):
        approx = topk_sets(builder(spark, sf_dir))
        assert set(approx) <= set(exact), f"{name}: phantom query ids"
        hits = sum(len(approx.get(q, set()) & exact[q]) for q in exact)
        recall = round(hits / total, 4)
        report[f"recall_at_5_{name}"] = recall
        report[f"floor_{name}"] = FLOORS[name]
        if recall < FLOORS[name]:
            ok = False
    # PQ ranks by L2 ADC, so its honest baseline is exact-L2 top-k (the
    # cosine brute force above would mix metrics); exact-L2 is a 10-line
    # inline builder on the same probe convention.
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from parquet_storage_query_spark.functions.vectors import as_double
    from parquet_storage_query_spark.catalog import load_parallel
    from parquet_storage_query_spark.operators.similarity import (
        N_QUERY_VECS,
        TOP_K,
        sim_pq_topk,
    )

    e = load_parallel(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("v")
    )
    q = e.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    d2 = F.aggregate(
        F.zip_with("qv", "v", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    w = W.partitionBy("query_id").orderBy(F.col("d2").asc(), F.col("neighbor_id"))
    exact_l2 = (
        e.join(F.broadcast(q), F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), d2.alias("d2"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
    )
    exact_l2_sets = topk_sets(exact_l2)
    l2_total = sum(len(v) for v in exact_l2_sets.values())
    from parquet_storage_query_spark.operators.similarity import sim_ivfpq_topk

    pq_enforced = sf_dir.startswith("/root/testdata")
    for name, builder in (("pq", sim_pq_topk), ("ivfpq", sim_ivfpq_topk)):
        approx = topk_sets(builder(spark, sf_dir))
        hits = sum(len(approx.get(qid, set()) & exact_l2_sets[qid]) for qid in exact_l2_sets)
        recall = round(hits / l2_total, 4)
        report[f"recall_at_5_{name}"] = recall
        report[f"floor_{name}"] = FLOORS[name]
        report[f"{name}_floor_enforced"] = pq_enforced
        if pq_enforced and recall < FLOORS[name]:
            ok = False

    # pq_refine re-ranks by exact COSINE, so its baseline is the cosine
    # brute force (`exact` above), not exact-L2
    from parquet_storage_query_spark.operators.similarity import sim_pq_refine_topk

    approx = topk_sets(sim_pq_refine_topk(spark, sf_dir))
    hits = sum(len(approx.get(qid, set()) & exact[qid]) for qid in exact)
    recall = round(hits / total, 4)
    report["recall_at_5_pq_refine"] = recall
    report["floor_pq_refine"] = FLOORS["pq_refine"]
    report["pq_refine_floor_enforced"] = pq_enforced
    if pq_enforced and recall < FLOORS["pq_refine"]:
        ok = False

    # pq_adaptive (round 11, VERDICT r10 missing #2): the sentinel-gated
    # tier escalates to exact-refine when sampled ADC recall collapses,
    # so its floor is enforced EVERYWHERE — including permutation-scaled
    # corpora, where flat pq stays report-only but the adaptive tier must
    # hold by escalating (measured: sentinel 3/25 at /tmp/sf1 -> refine
    # path, recall 0.44). Baseline: exact cosine when the refine path is
    # chosen; exact-L2 when the flat-ADC path is chosen (same
    # metric-honesty split as the tiers above).
    from parquet_storage_query_spark.operators.similarity import (
        LAST_PQ_GUARD,
        sim_pq_adaptive_topk,
    )

    adf = sim_pq_adaptive_topk(spark, sf_dir)
    path = adf.select("path").first()["path"]
    approx = topk_sets(adf)
    base = exact if path == "pq_refine" else exact_l2_sets
    base_total = total if path == "pq_refine" else l2_total
    hits = sum(len(approx.get(qid, set()) & base[qid]) for qid in base)
    recall = round(hits / base_total, 4)
    report["recall_at_5_pq_adaptive"] = recall
    report["floor_pq_adaptive"] = FLOORS["pq_adaptive"]
    report["pq_adaptive_path"] = path
    report["pq_adaptive_sentinel"] = dict(LAST_PQ_GUARD)
    report["pq_adaptive_floor_enforced"] = True
    if recall < FLOORS["pq_adaptive"]:
        ok = False

    report["ok"] = ok
    line = json.dumps(report)
    print(line)
    if out_path:
        Path(out_path).write_text(line + "\n", encoding="utf-8")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
