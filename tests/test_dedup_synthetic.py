"""Recall tests for the hash-seeded dedup operators (no DuckDB oracle):
plant known near-duplicates and verify MinHash-LSH / SimHash find them.
The corpus tables contain no real dups (all 500 sf0.001 texts distinct),
so these tests construct them."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parquet_storage_query_spark.operators.dedup import (
    N_MINHASH,
    minhash_signature,
    shingle_hashes,
    shingles_col,
)


@pytest.fixture(scope="module")
def corpus(spark):
    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep dark forest while the hunter watches quietly"
    )
    near = base.replace("quietly", "silently")  # one token changed
    other = (
        "completely different content about spark query engines and "
        "columnar storage with predicate pushdown at massive scale"
    )
    # moderate-similarity pair: last 6 tokens rewritten → 3-gram shingle
    # Jaccard ≈ 0.556. The 16-band × 2-row LSH must still surface it (the
    # old 4×4 banding caught only ~26% of pairs at this similarity).
    moderate = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep dark wolf sleeps nearby tonight peacefully under"
    )
    return spark.createDataFrame(
        [(1, base), (2, near), (3, other), (4, base), (5, moderate)],
        "doc_id long, text string",
    )


def test_minhash_finds_planted_near_dups(corpus):
    docs = (
        corpus.select("doc_id", shingles_col().alias("sh"))
        .withColumn("hs", F.array_distinct(shingle_hashes(F.col("sh"))))
        .withColumn("sig", minhash_signature("hs"))
    )
    rows = {r["doc_id"]: r["sig"] for r in docs.collect()}
    assert len(rows[1]) == N_MINHASH
    # the seeds must actually differ (regression: lambda-bytecode dedup
    # once collapsed all 32 seeds into one hash function)
    assert len(set(rows[1])) > N_MINHASH // 2
    # exact dup → identical signature
    assert rows[1] == rows[4]
    # near dup → mostly-matching signature
    matches_near = sum(a == b for a, b in zip(rows[1], rows[2]))
    matches_other = sum(a == b for a, b in zip(rows[1], rows[3]))
    assert matches_near >= N_MINHASH // 2
    assert matches_other <= 2


def test_lsh_pipeline_emits_planted_pair(spark, corpus, tmp_path, monkeypatch):
    """End-to-end dedup_minhash_lsh over a corpus containing planted dups:
    the (1,4) exact pair and (1,2) near pair must surface."""
    # write the synthetic corpus as the documents table of a fake sf_dir
    sf = str(tmp_path)
    corpus.withColumn("lang", F.lit("en")).withColumn("source", F.lit("t")).withColumn(
        "n_chars", F.length("text").cast("long")
    ).write.parquet(f"{sf}/documents.parquet")

    from parquet_storage_query_spark.operators.dedup import dedup_minhash_lsh

    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup_minhash_lsh(spark, sf).collect()
    }
    assert pairs.get((1, 4)) == 1.0
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.7
    # moderate pair (shingle Jaccard ≈ 0.556): the banding must catch it,
    # not just the near-identical pairs
    assert (1, 5) in pairs and 0.5 <= pairs[(1, 5)] < 0.7
    assert all(3 not in p for p in pairs)


def test_simhash_close_for_near_dups(spark, corpus, tmp_path):
    sf = str(tmp_path)
    corpus.withColumn("lang", F.lit("en")).withColumn("source", F.lit("t")).withColumn(
        "n_chars", F.length("text").cast("long")
    ).write.parquet(f"{sf}/documents.parquet")

    from parquet_storage_query_spark.operators.dedup import dedup_simhash

    sims = {r["doc_id"]: r["simhash"] for r in dedup_simhash(spark, sf).collect()}
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(sims[1], sims[4]) == 0  # exact dup
    assert ham(sims[1], sims[2]) <= 8  # near dup: few bits differ
    assert ham(sims[1], sims[3]) >= 16  # unrelated: many bits differ


def test_cosine_lsh_finds_planted_near_dup_vectors(spark):
    """Banded hyperplane LSH must surface a planted high-cosine pair via
    the band-bucket equi-join (dedup_embedding_cosine's candidate stage),
    and must not emit the orthogonal distractor."""
    import numpy as np

    from parquet_storage_query_spark.operators.dedup import (
        lsh_band_keys,
        lsh_band_pairs,
    )

    rng = np.random.RandomState(7)
    base = rng.standard_normal(64)
    near = base + 0.05 * rng.standard_normal(64)  # cos ≈ 0.999
    other = rng.standard_normal(64)  # cos ≈ 0 vs base
    cos = lambda a, b: float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))  # noqa: E731
    assert cos(base, near) > 0.99 and abs(cos(base, other)) < 0.4

    e = spark.createDataFrame(
        [(1, [float(x) for x in base]), (2, [float(x) for x in near]),
         (3, [float(x) for x in other])],
        "vec_id long, v array<double>",
    )
    pairs = {(r["vec_a"], r["vec_b"]) for r in lsh_band_pairs(e, lsh_band_keys(e)).collect()}
    assert (1, 2) in pairs  # P(miss) = (1-p^8)^16 ≈ 1e-9 at cos 0.999
    assert (1, 3) not in pairs and (3, 1) not in pairs
