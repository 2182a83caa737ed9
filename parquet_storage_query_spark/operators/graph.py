"""Graph analytics over corpus-derived graphs (SURVEY.md §2.12).

The near-duplicate pair table IS a graph — docs are nodes, verified
MinHash pairs are edges — and the connected-components operator
(dedup_clusters) already walks it. This module adds the other classic
iterative graph computation: PageRank over that graph, which ranks
boilerplate/template HUBS (docs similar to many other docs score high —
exactly the pages a curation pipeline wants a human to look at first,
since dropping one hub's cluster removes the most redundancy).

Like sim_kmeans_train and text_bpe_vocab_train, the iterative loop is
fully hash-checked: the DuckDB oracle unrolls every power iteration as a
chained CTE over the SAME md5-seeded MinHash pair derivation, and each
iteration's ranks are rounded (8 decimals) so the float replay is exact
across engines and across partition orders — rounding per step is also
what makes a 1000-executor merge deterministic run-to-run.

Reference analogue: none (the reference has no iterative operators);
cites the fan-out principle QueryOrchestration.cs:478-496 — per-iteration
work is one keyed shuffle, never a driver-side matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cache import session_memo
from ..registry import query
from .dedup import _MH_JACCARD_TAIL, _mh_duck_ctes

PR_DAMP = 0.85
PR_ITERS = 4
PR_ROUND = 8  # per-iteration rank rounding — cross-engine/ordering exactness


def _pagerank_oracle() -> str:
    """Unrolled power iteration over the minhash pair graph. r0 is the
    uniform vector; each r{i} pulls contributions along reversed edges
    (undirected graph → symmetric edge list, so every node has in-degree
    ≥ 1 and no dangling mass exists)."""
    steps = []
    for i in range(1, PR_ITERS + 1):
        steps.append(
            f"""r{i} AS (
        SELECT e.dst AS doc, round((1 - {PR_DAMP}) / nn.n
               + {PR_DAMP} * sum(r.pr / deg.d), {PR_ROUND}) AS pr
        FROM edges e
        JOIN r{i - 1} r ON r.doc = e.src
        JOIN deg ON deg.src = e.src
        CROSS JOIN nn
        GROUP BY e.dst, nn.n)"""
        )
    chain = ",\n    ".join(steps)
    return f"""
    WITH {_mh_duck_ctes()},
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bnd a JOIN bnd b
               ON a.band = b.band AND a.bhash = b.bhash AND a.doc_id < b.doc_id),
    {_MH_JACCARD_TAIL},
    pairs AS (SELECT doc_a, doc_b FROM j WHERE jac >= 0.5),
    edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
              UNION ALL
              SELECT doc_b AS src, doc_a AS dst FROM pairs),
    deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
    nodes AS (SELECT DISTINCT src AS doc FROM edges),
    nn AS (SELECT count(*) AS n FROM nodes),
    r0 AS (SELECT doc, round(1.0 / nn.n, {PR_ROUND}) AS pr
           FROM nodes CROSS JOIN nn),
    {chain}
    SELECT doc AS doc_id, round(pr, 6) AS pagerank
    FROM r{PR_ITERS}
    ORDER BY pagerank DESC, doc_id
    LIMIT 50
    """


@query("graph_pagerank", oracle=_pagerank_oracle())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the near-duplicate graph: top-50 boilerplate hubs.

    Distributed power iteration — per iteration ONE join of the edge list
    with the current rank vector and one dst-keyed partial-merged
    aggregate; the node count is a one-row aggregate broadcast into the
    plan (never collected). The edge/degree tables are built once from
    the shared minhash pair query and localCheckpoint-ed so the 4
    iterations scan a cached RDD instead of replaying the LSH pipeline
    4×. At 100 TB: |edges| ≈ O(docs) for a banded near-dup graph, so an
    iteration is one linear keyed shuffle; ranks round to 8 decimals per
    step, which both pins the cross-engine hash and makes the result
    independent of executor merge order."""

    def build() -> DataFrame:
        from .dedup import dedup_minhash_lsh

        pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
        edges = (
            pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
            .unionAll(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
            .localCheckpoint(eager=True)
        )
        deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
        nodes = edges.select(F.col("src").alias("doc")).distinct()
        nn = nodes.agg(F.count(F.lit(1)).alias("n"))
        ranks = nodes.crossJoin(F.broadcast(nn)).select(
            "doc", F.round(F.lit(1.0) / F.col("n"), PR_ROUND).alias("pr")
        )
        contrib_src = edges.join(deg, "src")
        for _ in range(PR_ITERS):
            ranks = (
                contrib_src.join(ranks, contrib_src.src == ranks.doc)
                .select("dst", (F.col("pr") / F.col("d")).alias("c"))
                .groupBy("dst")
                .agg(F.sum("c").alias("_s"))
                .crossJoin(F.broadcast(nn))
                .select(
                    F.col("dst").alias("doc"),
                    F.round(
                        (1 - PR_DAMP) / F.col("n") + PR_DAMP * F.col("_s"), PR_ROUND
                    ).alias("pr"),
                )
            )
        return (
            ranks.select("doc", F.round("pr", 6).alias("pagerank"))
            .select(F.col("doc").alias("doc_id"), "pagerank")
            .orderBy(F.col("pagerank").desc(), "doc_id")
            .limit(50)
        )

    return session_memo(spark, sf_dir, "graph_pagerank", build)
