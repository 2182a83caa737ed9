"""Physical-plan audits: prove the scale-critical plan properties hold
(SURVEY.md §4) rather than assuming Catalyst did the right thing.

These are the Spark equivalents of what the reference hand-encodes:
filters inside the per-blob SQL (pushdown), one-column SELECT (pruning),
partial-per-blob + client-merge (two-phase agg)."""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_storage_query_spark.catalog import load
from parquet_storage_query_spark.operators.relational import (
    join_range,
    join_star_revenue,
    q1_pricing_summary,
    topk_orders,
)
from parquet_storage_query_spark.plans.explain import (
    formatted_plan,
    has_broadcast_join,
    has_partial_final_agg,
    has_take_ordered,
    pushed_filters,
    read_schemas,
    static_broadcast_hints,
    whole_stage_codegen_spans,
)

from .conftest import SF_SMOKE


def test_filter_pushdown_reaches_parquet_scan(spark):
    """P5: l_shipdate predicate must appear in PushedFilters (row-group
    stats skipping at scale)."""
    plan = formatted_plan(q1_pricing_summary(spark, SF_SMOKE))
    pf = " ".join(pushed_filters(plan))
    assert "l_shipdate" in pf, plan


def test_column_pruning(spark):
    """P2: a two-column projection must not scan all 11 lineitem columns."""
    df = load(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity").filter(
        F.col("l_quantity") > 40
    )
    schemas = read_schemas(formatted_plan(df))
    assert schemas, "no scan found"
    assert all("l_extendedprice" not in s and "l_comment" not in s for s in schemas)
    assert any("l_orderkey" in s and "l_quantity" in s for s in schemas)


def test_dimension_joins_are_broadcast(spark):
    """Star join must broadcast the dims (no shuffle of the fact side for
    nation/region at any scale) — while the GROWING customer side must
    carry no static broadcast hint: exactly the two constant-size dim
    hints may appear in the analyzed plan, and AQE handles customer at
    runtime (hint policy, VERDICT r5 What's-wrong #2)."""
    df = join_star_revenue(spark, SF_SMOKE)
    plan = formatted_plan(df)
    assert has_broadcast_join(plan), plan
    assert static_broadcast_hints(df) == 2, "only nation+region may hint"


def test_q3_and_consensus_are_hint_free(spark):
    """The segment-filtered customer keys (~20% of a growing table) and
    the consensus drop-lists (proportional to the corpus's duplicate
    count) must join hint-free — AQE broadcasts while small, degrades to
    shuffle when not."""
    from parquet_storage_query_spark.operators.advanced import q3_shipping_priority
    from parquet_storage_query_spark.operators.similarity import (
        pipeline_dedup_consensus,
    )
    from parquet_storage_query_spark.operators.text import text_tfidf_keywords
    from parquet_storage_query_spark.streaming.joins import stream_enrich_static

    assert static_broadcast_hints(q3_shipping_priority(spark, SF_SMOKE)) == 0
    assert static_broadcast_hints(stream_enrich_static(spark, SF_SMOKE)) == 0
    assert static_broadcast_hints(pipeline_dedup_consensus(spark, SF_SMOKE)) == 0
    # tfidf keeps exactly one hint: the 1-row corpus count; the growing
    # vocabulary-sized IDF side must be hint-free
    assert static_broadcast_hints(text_tfidf_keywords(spark, SF_SMOKE)) == 1


def test_setsim_dfreq_join_is_hint_free_and_aqe_broadcast(spark):
    """The prefix-filter join's shingle document-frequency table grows
    with the corpus (27k shingles at sf0.1, billions at 100 TB), so it
    must carry NO static broadcast hint (VERDICT r10 #1 — a pinned hint
    is a guaranteed OOM at scale); at bench SF AQE must still pick a
    broadcast join for it at runtime, so dropping the hint costs nothing
    where it fit anyway. Audited on the LAZY prefix plan (the serving
    path checkpoints it once per session, which would hide the join);
    the registered query is additionally asserted hint-free end to end."""
    from parquet_storage_query_spark.catalog import load_parallel
    from parquet_storage_query_spark.operators.dedup import (
        _SHINGLES,
        dedup_setsim_prefix,
        setsim_prefix_plan,
        words_col,
    )
    from pyspark.sql import functions as F

    docs = (
        load_parallel(spark, SF_SMOKE, "documents")
        .select("doc_id", words_col().alias("ws"))
        .select("doc_id", F.expr(_SHINGLES).alias("sh"))
    )
    pre = setsim_prefix_plan(docs)
    assert static_broadcast_hints(pre) == 0, "dfreq must be hint-free"
    # AQE decisions only materialize in the executed plan
    pre.collect()
    executed = pre._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in executed, executed
    assert static_broadcast_hints(dedup_setsim_prefix(spark, SF_SMOKE)) == 0


def test_funnel_is_single_scan(spark):
    """events_funnel must read the events table ONCE: the running-min
    window rewrite replaced the per-stage-arm form that scanned events 7
    times (VERDICT r5 What's-wrong #6). At 100 TB the difference is one
    corpus pass vs seven."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from tools.plan_audit import audit_plan

    from parquet_storage_query_spark.operators.events import events_funnel

    df = events_funnel(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    audit = audit_plan(plan)
    assert audit["scans"] == 1, audit


def test_range_join_is_broadcast_nested_loop(spark):
    plan = formatted_plan(join_range(spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_topk_plans_take_ordered(spark):
    """orderBy+limit must plan TakeOrderedAndProject, not a global sort."""
    plan = formatted_plan(topk_orders(spark, SF_SMOKE))
    assert has_take_ordered(plan), plan


def test_aggregate_is_two_phase(spark):
    """A1-A7's partial-per-blob + merge shape = partial/final agg split."""
    from parquet_storage_query_spark.operators.reference import ref_max_by

    plan = formatted_plan(ref_max_by(spark, SF_SMOKE))
    assert has_partial_final_agg(plan), plan


def test_scan_agg_stays_in_codegen(spark):
    """The hot path must be inside WholeStageCodegen spans."""
    assert whole_stage_codegen_spans(q1_pricing_summary(spark, SF_SMOKE)) >= 1


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    """Bucketing for co-located joins (the 100 TB fact⋈fact answer): two
    tables bucketed on the join key join WITHOUT any Exchange on either
    side — the shuffle happened once at write time, amortized over every
    future join. Verified from the physical plan."""
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    load(spark, SF_SMOKE, "orders").write.bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).mode("overwrite").saveAsTable("b_orders")
    load(spark, SF_SMOKE, "lineitem").write.bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).mode("overwrite").saveAsTable("b_lineitem")
    try:
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders").hint("merge"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = formatted_plan(joined)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan  # co-located: zero shuffles
        assert joined.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_aqe_coalesces_shuffle_partitions(spark):
    """AQE must collapse the configured shuffle fan-out down to what the
    data actually needs (tiny agg → 1 partition instead of 8/32) — the
    runtime right-sizing that keeps small stages from scheduling thousands
    of empty tasks at cluster scale."""
    from parquet_storage_query_spark.plans.explain import executed_plan

    df = load(spark, SF_SMOKE, "orders").groupBy("o_orderstatus").count()
    plan = executed_plan(df)
    assert "AQEShuffleRead" in plan and "coalesced" in plan, plan


def test_partitioned_layout_prunes(spark, tmp_path):
    """Hive-partitioned layout + a filter on the partition column must
    prune at planning time: the scan's PartitionFilters carries the
    predicate and only the matching directory is read — the layout-level
    analogue of row-group skipping, and the reason 100 TB tables are laid
    out by date/tenant."""
    dest = str(tmp_path / "events_by_type")
    load(spark, SF_SMOKE, "events").write.partitionBy("event_type").parquet(dest)

    df = spark.read.parquet(dest).filter(F.col("event_type") == "click")
    plan = formatted_plan(df)
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1].split("]")[0], plan
    n_click = load(spark, SF_SMOKE, "events").filter(F.col("event_type") == "click").count()
    assert df.count() == n_click


def test_asof_join_single_shuffle(spark):
    """The as-of join must plan exactly ONE exchange for the window pass —
    not a quadratic inequality join (no NestedLoop anywhere)."""
    import re

    from parquet_storage_query_spark.operators.advanced import join_asof

    plan = formatted_plan(join_asof(spark, SF_SMOKE))
    assert "NestedLoop" not in plan, plan
    n_exchanges = len(re.findall(r"\bExchange\b", plan))
    assert n_exchanges <= 2, plan  # hashpartition on user_id (+AQE read)


def test_ivf_assignment_is_map_side(spark):
    """IVF cell assignment must not shuffle the corpus: the only exchanges
    allowed are the probe-side broadcast and the final top-k window."""
    from parquet_storage_query_spark.operators.similarity import sim_ivf_topk

    plan = formatted_plan(sim_ivf_topk(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan, plan


def test_cosine_dedup_has_no_nested_loop(spark):
    """dedup_embedding_cosine's candidate stage must be the band-bucket
    equi-join — round 1's O(n²) BroadcastNestedLoopJoin is a scale-killer
    (VERDICT r1 'What's wrong' #2)."""
    from parquet_storage_query_spark.operators.dedup import dedup_embedding_cosine

    plan = formatted_plan(dedup_embedding_cosine(spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_cosine_bucket_cap_is_partitioned_and_rank_limited(spark):
    """The scale guard's per-(band,bucket) cap must be a PARTITIONED
    window (never SinglePartition — an unpartitioned rank would drag the
    whole index through one task) and must plan as WindowGroupLimit so
    rows beyond the budget are dropped before the full sort. Exchanges
    stay bounded: one per window side (band-key rows only — ~131k at 10×,
    trivial vs the ~44M-pair verify they prevent) plus the final
    pair-dedup shuffle."""
    import re

    from parquet_storage_query_spark.cache import _MEMO
    from parquet_storage_query_spark.operators.dedup import dedup_embedding_cosine

    # audit the PRE-execution plan: once another test has executed the
    # memoized query, formatted_plan returns the adaptive output (Final +
    # Initial sections) and every node is listed twice more
    for k in [k for k in _MEMO if k[2] == "cos_lsh_query"]:
        _MEMO.pop(k)
    plan = formatted_plan(dedup_embedding_cosine(spark, SF_SMOKE))
    assert "SinglePartition" not in plan, plan
    assert "WindowGroupLimit" in plan, plan
    # formatted plans list every node twice (tree + detail): 3 physical
    # exchanges (2 window sides + 1 pair-dedup) = 6 matches
    assert len(re.findall(r"\bExchange\b", plan)) <= 6, plan


def test_training_hash_ops_are_map_side(spark):
    """Deterministic split/sample must be pure map work: zero exchanges —
    at 100 TB these are full scans but never shuffles."""
    import re

    from parquet_storage_query_spark.operators.training import (
        train_split_hash,
        train_stratified_sample,
    )

    for fn in (train_split_hash, train_stratified_sample):
        plan = formatted_plan(fn(spark, SF_SMOKE))
        assert not re.findall(r"\bExchange\b", plan), plan


def test_seq_pack_window_is_partitioned(spark):
    """Sequence packing must window per language — a single-partition
    global window (prep_binpack's documented metadata-only exception)
    would serialize the whole corpus through one task."""
    import re

    from parquet_storage_query_spark.operators.training import train_seq_pack_plan

    plan = formatted_plan(train_seq_pack_plan(spark, SF_SMOKE))
    assert "SinglePartition" not in plan, plan
    assert len(re.findall(r"\bExchange\b", plan)) <= 2, plan


def test_interleave_has_no_global_window(spark):
    """train_interleave must compute global positions WITHOUT an
    unpartitioned window: rounds 1-3 planned `row_number() OVER (ORDER BY
    h)` — an Exchange SinglePartition + whole-corpus WindowExec on one
    task (VERDICT r3 'What's wrong' #1). The fix windows per pinned range
    partition and adds driver-computed offsets, so the executed plan must
    contain no SinglePartition exchange and the window must be keyed on
    the partition id."""
    from parquet_storage_query_spark.operators.training import train_interleave
    from parquet_storage_query_spark.plans.explain import executed_plan

    plan = executed_plan(train_interleave(spark, SF_SMOKE))
    assert "SinglePartition" not in plan, plan
    assert "hashpartitioning(_pid" in plan, plan


def test_profile_stats_aggregate_is_two_phase(spark):
    """The one-pass profile must partial-aggregate map-side (shuffles O(1)
    co-moment partials, not rows)."""
    from parquet_storage_query_spark.operators.profile import profile_numeric_stats
    from parquet_storage_query_spark.plans.explain import has_partial_final_agg

    plan = formatted_plan(profile_numeric_stats(spark, SF_SMOKE))
    assert has_partial_final_agg(plan), plan


def test_zorder_layout_is_map_side(spark):
    """The z-value is a pure projection: the layout plan must contain NO
    window and NO join — one two-phase aggregate over a mapped scan is the
    whole query, so it scales as a single scan + 16-group shuffle."""
    from parquet_storage_query_spark.operators.advanced import prep_zorder_layout

    plan = formatted_plan(prep_zorder_layout(spark, SF_SMOKE))
    assert "Window" not in plan and "Join" not in plan, plan
    assert has_partial_final_agg(plan), plan


def test_upsert_merge_broadcasts_delta(spark):
    """CDC merge: the delta side (≪ snapshot) must broadcast into the
    anti-join — the 100 TB snapshot never shuffles."""
    from parquet_storage_query_spark.operators.advanced import prep_upsert_snapshot

    plan = formatted_plan(prep_upsert_snapshot(spark, SF_SMOKE))
    assert has_broadcast_join(plan), plan
    assert "SortMergeJoin" not in plan, plan


def test_lm_score_model_is_broadcast(spark):
    """Unigram LM scoring: the vocabulary model joins back onto the token
    stream via broadcast — the document side must not shuffle for the join."""
    from parquet_storage_query_spark.operators.text import text_ngram_lm_score

    plan = formatted_plan(text_ngram_lm_score(spark, SF_SMOKE))
    assert has_broadcast_join(plan), plan


def test_shard_pipeline_pushdown_and_bounded_shuffles(spark):
    """The composed corpus-prep pipeline must stay ONE lean plan: the lang
    equality reaches the parquet scan (PushedFilters), and only three
    exchanges exist — the local-parallelism repartition, the content-hash
    dedup window, and the final manifest aggregate. A fourth exchange
    would mean a stage recomputes or re-shuffles the corpus."""
    import re

    from parquet_storage_query_spark.operators.training import pipeline_training_shard

    plan = formatted_plan(pipeline_training_shard(spark, SF_SMOKE))
    pf = " ".join(pushed_filters(plan))
    assert "lang" in pf, plan
    n_exchanges = len(set(re.findall(r"\((\d+)\) Exchange", plan)))
    assert n_exchanges <= 3, plan


def test_contamination_eval_grams_are_broadcast(spark):
    """The eval side of the contamination join must broadcast — the corpus
    side never shuffles for the join (eval sets are tiny next to 100 TB)."""
    from parquet_storage_query_spark.operators.text import text_contamination_check

    plan = formatted_plan(text_contamination_check(spark, SF_SMOKE))
    assert has_broadcast_join(plan), plan
    assert "SortMergeJoin" not in plan, plan


def test_substring_runs_single_scan(spark):
    """Repeated-span detection must scan documents ONCE: the min/max
    digest-window form (round 4) replaced a posting-list join-back that
    re-scanned and re-shingled the corpus."""
    import re

    from parquet_storage_query_spark.operators.dedup import dedup_substring_runs

    plan = formatted_plan(dedup_substring_runs(spark, SF_SMOKE))
    # one scan NODE: the formatted detail section headers each scan once
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1, plan


def test_snapshot_diff_single_keyed_shuffle(spark):
    """prep_snapshot_diff must reduce both snapshots to digest projections
    map-side and classify via ONE keyed full-outer join — documents never
    ride the shuffle, and nothing else exchanges."""
    import re

    from parquet_storage_query_spark.operators.advanced import prep_snapshot_diff

    plan = formatted_plan(prep_snapshot_diff(spark, SF_SMOKE))
    assert "FullOuter" in plan, plan
    tree = plan.split("\n\n")[0]
    assert len(re.findall(r"\bExchange\b", tree)) <= 2, plan  # one per side


def test_semantic_dedup_assignment_materialized_once(spark):
    """dedup_semantic's serving plan must read the checkpointed assignment
    artifact (RDD scans), not re-scan the corpus per branch — the k-cosine
    assignment fold runs once per corpus, and the cell self-join
    broadcasts one side (cells are model-bounded)."""
    from parquet_storage_query_spark.cache import _MEMO

    for k in [k for k in _MEMO if k[2] == "dedup_semantic_query"]:
        _MEMO.pop(k)
    from parquet_storage_query_spark.operators.similarity import dedup_semantic

    plan = formatted_plan(dedup_semantic(spark, SF_SMOKE))
    tree = plan.split("\n\n")[0]
    assert "Scan parquet" not in tree and "FileScan" not in tree, plan
    assert "ExistingRDD" in tree, plan


def test_quality_classifier_is_map_side(spark):
    """The hashed linear classifier is model-inlined scoring: a full scan
    but ZERO exchanges at any corpus size (the fastText-filter shape)."""
    import re

    from parquet_storage_query_spark.operators.text import text_quality_classifier

    plan = formatted_plan(text_quality_classifier(spark, SF_SMOKE))
    assert not re.findall(r"\bExchange\b", plan), plan


def test_domain_mixture_broadcasts_rate_table(spark):
    """train_domain_mixture's per-source rate table is O(sources) — it must
    broadcast back onto the corpus (no sort-merge join, no corpus
    shuffle), leaving only the tiny count/renormalize aggregates as keyed
    exchanges."""
    from parquet_storage_query_spark.operators.training import train_domain_mixture
    from parquet_storage_query_spark.plans.explain import has_sort_merge_or_shuffle_join

    plan = formatted_plan(train_domain_mixture(spark, SF_SMOKE))
    assert has_broadcast_join(plan), plan
    assert not has_sort_merge_or_shuffle_join(plan), plan


def test_paragraph_dedup_shuffles_digests_not_documents(spark):
    """dedup_paragraphs must ride its two keyed exchanges (block-digest
    window, per-doc rollup) WITHOUT the document text: only digest/count
    columns shuffle, and nothing plans a single-partition window."""
    import re

    from parquet_storage_query_spark.operators.dedup import dedup_paragraphs

    plan = formatted_plan(dedup_paragraphs(spark, SF_SMOKE))
    assert "SinglePartition" not in plan, plan
    tree = plan.split("\n\n")[0]
    assert len(re.findall(r"\bExchange\b", tree)) <= 2, plan
    # the text column is consumed by the map-side block/digest projection
    # and must not appear in any exchange's output schema
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", tree):
        assert "text" not in m.group(1), plan


def test_range_search_broadcasts_probes(spark):
    """sim_range_search: probes broadcast against the band index; no
    nested-loop join, no window/rank step (threshold filter is map-side)."""
    from parquet_storage_query_spark.operators.similarity import sim_range_search

    plan = formatted_plan(sim_range_search(spark, SF_SMOKE))
    assert has_broadcast_join(plan), plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Window" not in plan.split("\n\n")[0], plan


def test_entropy_profile_aggregate_is_two_phase(spark):
    """profile_column_entropy folds from value counts: both aggregate
    levels must be partial/final splits (the reference's per-blob-partial
    shape), never a single-node pass."""
    from parquet_storage_query_spark.operators.profile import profile_column_entropy

    plan = formatted_plan(profile_column_entropy(spark, SF_SMOKE))
    assert has_partial_final_agg(plan), plan


def test_sampled_percentiles_bottomk_is_take_ordered(spark):
    """The bottom-k hash sample must plan TakeOrderedAndProject (per-
    partition bottom-k + k-row merge — the mergeable-sketch shape), never
    a global sort of the input."""
    from parquet_storage_query_spark.operators.advanced import agg_sampled_percentiles

    plan = formatted_plan(agg_sampled_percentiles(spark, SF_SMOKE))
    assert has_take_ordered(plan), plan


def test_persisted_ann_serving_reads_only_the_index(spark):
    """sim_persisted_topk must serve from the on-disk band partitions
    alone: every parquet scan in the plan is over the ann_index location,
    never the embeddings table (the standing-index no-rebuild contract),
    and the probes broadcast."""
    import re

    from parquet_storage_query_spark.operators.similarity import sim_persisted_topk

    plan = formatted_plan(sim_persisted_topk(spark, SF_SMOKE))
    tree = plan.split("\n\n")[0]
    assert "embeddings.parquet" not in plan, plan
    assert "ann_index" in plan, plan
    assert has_broadcast_join(plan), plan


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    """DPP: a filter on a NON-partition dim column must translate at
    runtime into partition pruning on the fact side (the dim's surviving
    join keys become a dynamicpruning subquery in the fact scan) — the
    Catalyst feature that makes star joins over date-partitioned 100 TB
    facts read only the qualifying partitions."""
    from parquet_storage_query_spark.catalog import load

    ev = load(spark, SF_SMOKE, "events")
    fdir = str(tmp_path / "fact")
    ev.withColumn("day", F.to_date("ts")).write.partitionBy("day").parquet(fdir)
    fact = spark.read.parquet(fdir)
    days = [r["day"] for r in fact.select("day").distinct().collect()]
    dim = spark.createDataFrame(
        [(d, f"r{i % 3}") for i, d in enumerate(days)], "day date, region string"
    )
    ddir = str(tmp_path / "dim")
    dim.write.parquet(ddir)
    j = (
        fact.join(spark.read.parquet(ddir).filter(F.col("region") == "r0"), "day")
        .groupBy("region")
        .agg(F.sum("value"))
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan


def test_q6_all_predicates_pushed(spark):
    """TPC-H Q6 is the pushdown-decides-everything query: ship-date range,
    discount band, and quantity cap must ALL reach the lineitem parquet
    scan, and the scan must read only the 4 referenced columns."""
    from parquet_storage_query_spark.operators.tpch import q6_forecast_revenue

    plan = formatted_plan(q6_forecast_revenue(spark, SF_SMOKE))
    pf = " ".join(pushed_filters(plan))
    assert "l_shipdate" in pf and "l_discount" in pf and "l_quantity" in pf, plan
    schemas = read_schemas(plan)
    assert any("l_extendedprice" in s for s in schemas)
    assert all("l_returnflag" not in s and "l_partkey" not in s for s in schemas)


def test_q19_factored_implicates_prune_both_scans(spark):
    """Q19's mixed-table OR cannot push as-is; the hand-factored
    single-table implicates must: the lineitem scan carries the quantity
    band 1-30 and the part side joins by broadcast."""
    from parquet_storage_query_spark.operators.tpch import q19_disjunctive_revenue

    plan = formatted_plan(q19_disjunctive_revenue(spark, SF_SMOKE))
    pf = " ".join(pushed_filters(plan))
    assert "l_quantity" in pf, plan
    assert has_broadcast_join(plan), plan


def test_q5_dims_broadcast_facts_shuffle_once_each(spark):
    """Q5's supplier⋈nation⋈region must collapse into broadcast dims; the
    only exchanges are the two fact keys (custkey, orderkey) plus the
    final 25-row aggregate — never a fact-side broadcast or extra
    repartition."""
    from parquet_storage_query_spark.operators.tpch import q5_local_supplier_volume

    plan = formatted_plan(q5_local_supplier_volume(spark, SF_SMOKE))
    assert has_broadcast_join(plan), plan
    assert has_partial_final_agg(plan), plan


def test_q15_scalar_max_no_unpartitioned_window(spark):
    """Q15's scalar max must be an aggregate broadcast back, not a window
    over a single partition (the plan-audit smell) and not a collect."""
    from parquet_storage_query_spark.operators.tpch import q15_top_supplier

    plan = formatted_plan(q15_top_supplier(spark, SF_SMOKE))
    assert "Window" not in plan, plan
    assert has_broadcast_join(plan), plan


def test_q17_correlated_avg_confined_to_brand_slice(spark):
    """Q17's per-part average must aggregate the brand-filtered rows only:
    every lineitem scan in the plan carries the broadcast-join semi-
    reduction, and the avg side joins back by broadcast (|brand parts|
    rows), so no full-corpus shuffle exists."""
    from parquet_storage_query_spark.operators.tpch import q17_small_quantity

    plan = formatted_plan(q17_small_quantity(spark, SF_SMOKE))
    assert has_broadcast_join(plan), plan
    # the partkey pushdown from the broadcast part slice is IsNotNull only;
    # the load-bearing check is that no SortMergeJoin-scale exchange of the
    # raw fact appears for the correlated side
    assert "SortMergeJoin" not in plan, plan


def test_incremental_rollup_never_rescans_history(spark):
    """Materialized-view maintenance contract: the serving plan's ONLY
    events scan carries the pushed ts >= cutoff filter (new rows), and
    the standing daily_rollup parquet appears as its own scan — historical
    raw events are never re-read."""
    from parquet_storage_query_spark.operators.advanced import agg_incremental_rollup

    plan = formatted_plan(agg_incremental_rollup(spark, SF_SMOKE))
    assert "daily_rollup" in plan, plan
    pf = [p for p in pushed_filters(plan) if "ts" in p]
    assert pf and all("GreaterThanOrEqual" in p or "IsNotNull" in p for p in pf), plan
    # exactly one events scan (the fresh slice)
    assert plan.count("events.parquet") == 1, plan


def test_metadata_count_pushes_aggregate_to_footers(spark):
    """ref_total_count_meta must answer COUNT(*) from parquet footers:
    the DSv2 scan carries PushedAggregation and no row-group decode."""
    from parquet_storage_query_spark.operators.reference import ref_total_count_meta

    df = ref_total_count_meta(spark, SF_SMOKE)
    plan = formatted_plan(df)
    assert "PushedAggregation: [COUNT(*)]" in plan, plan
    assert df.collect()[0]["cnt"] > 0


def test_footer_stats_push_count_min_max(spark):
    """profile_minmax_meta folds count + numeric extents from row-group
    footer statistics — the full aggregate list must appear as
    PushedAggregation."""
    from parquet_storage_query_spark.operators.profile import profile_minmax_meta

    plan = formatted_plan(profile_minmax_meta(spark, SF_SMOKE))
    assert "PushedAggregation: [COUNT(*), MIN(l_quantity), MAX(l_quantity)" in plan, plan


def test_partitioned_serve_prunes_to_one_day(spark):
    """prep_partitioned_serve's day predicate must be a partition filter
    (directory pruning), not a data filter: PartitionFilters carries
    `day`, PushedFilters carries nothing for it."""
    from parquet_storage_query_spark.operators.advanced import prep_partitioned_serve

    plan = formatted_plan(prep_partitioned_serve(spark, SF_SMOKE))
    assert "PartitionFilters" in plan and "day" in plan.split("PartitionFilters", 1)[1][:200], plan
    pf = " ".join(pushed_filters(plan))
    assert "day" not in pf, plan


def test_sql_surface_parity(spark):
    """The engine's SQL string surface (S8 external-table DDL analog:
    register_all temp views + spark.sql) must produce the identical
    result set as the DataFrame builder for a representative composite
    query (TPC-H Q3) — one engine, two front-ends."""
    from parquet_storage_query_spark.catalog import register_all
    from parquet_storage_query_spark.operators.advanced import q3_shipping_priority
    from parquet_storage_query_spark.registry import all_queries, resolve_oracle

    register_all(spark, SF_SMOKE)
    sql = resolve_oracle(all_queries()["q3_shipping_priority"].oracle, SF_SMOKE)
    got = [tuple(r) for r in spark.sql(sql).collect()]
    want = [tuple(r) for r in q3_shipping_priority(spark, SF_SMOKE).collect()]
    assert got == want and len(got) > 0


def test_chunk_windows_is_map_side(spark):
    """Document chunking must be pure map-side: no hash exchange anywhere
    (the only exchange is the output-ordering range partition) — at
    100 TB it runs at scan throughput."""
    from parquet_storage_query_spark.operators.text import text_chunk_windows

    plan = formatted_plan(text_chunk_windows(spark, SF_SMOKE))
    assert "hashpartitioning" not in plan, plan


def test_attribution_single_corpus_shuffle(spark):
    """Last-touch attribution: exactly one corpus-sized exchange (the
    user_id window) plus the O(types) credit-rollup exchange — never a
    second shuffle of raw events."""
    from parquet_storage_query_spark.operators.events import events_attribution

    plan = formatted_plan(events_attribution(spark, SF_SMOKE))
    assert plan.count("hashpartitioning") == 2, plan


def test_aqe_splits_skewed_join_partitions(spark):
    """The runtime half of the skew story (join_salted_skew is the manual
    half): a 90%-one-key join under AQE must be re-planned with the
    skewed partition SPLIT — the final adaptive plan carries
    SortMergeJoin(skew=true) over an `AQEShuffleRead skewed` node.
    Thresholds are scoped to a derived session; production tuning sets
    the same knobs cluster-wide."""
    from pyspark.sql import functions as F

    ns = spark.newSession()
    for k, v in {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.shuffle.partitions": "8",
    }.items():
        ns.conf.set(k, v)
    fact = ns.range(0, 400000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 1000).alias("k"),
        F.concat(F.lit("x" * 32), F.col("id").cast("string")).alias("pad"),
    )
    dim = ns.range(0, 1001).select(F.col("id").alias("k"), F.lit("d").alias("attr"))
    j = fact.join(dim, "k").select("pad", "attr")
    assert j._jdf.queryExecution().toRdd().count() == 400000
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, plan
    assert "AQEShuffleRead skewed" in plan, plan


def test_join_aqe_skew_query_fires_skew_rewrite(spark):
    """The REGISTERED AQE-skew query (join_aqe_skew — the automatic twin
    of join_salted_skew, VERDICT r7 next-round #6) must actually trigger
    the rewrite on its own corpus-backed frame, not just on a synthetic:
    after execution, the final adaptive plan carries
    SortMergeJoin(skew=true) over an `AQEShuffleRead skewed` node. The
    hash-checked result rides the registry gate; this pins the plan."""
    from parquet_storage_query_spark.operators.advanced import aqe_skew_agg

    ns, agg = aqe_skew_agg(spark, SF_SMOKE)
    rows = agg.collect()
    assert len(rows) == 3  # buckets 0/1/2 — non-vacuous
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, plan
    assert "AQEShuffleRead skewed" in plan, plan


def test_bloom_prefilter_probe_is_map_side(spark):
    """join_bloom_prefilter's 8 KB bitmap probe must run as a plain
    Filter expression on the fact side (shiftright/element_at inside
    codegen) BEFORE the exact semi-join — that ordering is the entire
    point: non-matching rows die before they ever reach the exchange."""
    from parquet_storage_query_spark.operators.relational import join_bloom_prefilter

    plan = formatted_plan(join_bloom_prefilter(spark, SF_SMOKE))
    assert "shiftright" in plan, plan
    assert "LeftSemi" in plan, plan
    # the probe filter must sit BELOW the semi-join in the tree: the
    # first (outermost) LeftSemi line appears before the shiftright
    # filter line in formatted output only if the filter is its child
    assert plan.index("LeftSemi") < plan.index("shiftright"), plan


def test_global_prefix_never_plans_single_partition(spark):
    """window_global_prefix exists to AVOID `Exchange SinglePartition`
    (the no-PARTITION-BY global window). Its plan must not contain one —
    phase 2 windows are bucket-partitioned, phase 3 is a B-row broadcast
    join."""
    from parquet_storage_query_spark.operators.windows import window_global_prefix

    plan = formatted_plan(window_global_prefix(spark, SF_SMOKE))
    assert "SinglePartition" not in plan, plan
    assert "Window" in plan  # the per-bucket windows ARE there


def test_ohlc_is_one_scan_no_window(spark):
    """timeseries_ohlc's open/close are struct-min/max AGGREGATES, not
    first/last windows: the plan must show one events scan, a
    partial/final aggregate, and no Window node at all."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from tools.plan_audit import audit_plan

    from parquet_storage_query_spark.operators.advanced import timeseries_ohlc

    df = timeseries_ohlc(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    audit = audit_plan(plan)
    assert audit["scans"] == 1, audit
    assert "Window" not in plan, plan
    assert has_partial_final_agg(formatted_plan(df))


def test_keyword_search_serves_off_shared_postings(spark):
    """text_keyword_search must serve from the session-shared posting
    table (localCheckpoint), never rescanning the documents parquet —
    the prepared-view contract the docstring claims (build once, every
    search reuses)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from tools.plan_audit import audit_plan

    from parquet_storage_query_spark.operators.text import (
        text_inverted_index,
        text_keyword_search,
    )

    text_inverted_index(spark, SF_SMOKE).collect()  # build the shared postings
    df = text_keyword_search(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    audit = audit_plan(plan)
    assert audit["scans"] == 0, audit  # zero parquet scans at serve time
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan, plan


def test_join_partition_pruned_has_dpp(spark):
    """The round-7 DPP REGISTRY operator must plan a dynamicpruning
    subquery on the fact scan (runtime partition pruning, not a static
    literal): only qualifying day-directories are read at any corpus
    size."""
    from parquet_storage_query_spark.registry import all_queries

    df = all_queries()["join_partition_pruned"].builder(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan


def test_join_bucketed_colocated_zero_exchange(spark):
    """The round-7 bucketed-join REGISTRY operator: the SortMergeJoin
    subtree must contain NO Exchange — the shuffle was paid once at
    bucket-write time. (The rollup above the join may exchange; assert on
    the join input subtree.)"""
    from parquet_storage_query_spark.operators.advanced import ensure_bucketed_pair

    to, tl = ensure_bucketed_pair(spark, SF_SMOKE)
    joined = spark.table(tl).join(
        spark.table(to).hint("merge"), F.col("l_orderkey") == F.col("o_orderkey")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan


def test_interval_density_guard_census_and_cap(spark):
    """The interval-join density guard (VERDICT r8 #4 — the cos-LSH
    guard's pattern applied to the suite's steepest 10x ratio): (a) on a
    deliberately HOT synthetic bucket the census must measure the exact
    candidate-pair count and engage; (b) with a per-bucket budget the cap
    bounds each side and reports dropped rows; (c) on the real corpus at
    smoke SF the registered query runs guard-on with budget=None and its
    result is untouched (the oracle hash stays green in tools/check.py —
    the guard may only ever LOG for the exact query)."""
    from pyspark.sql import functions as F

    from parquet_storage_query_spark.operators import advanced

    # (a)+(b): 200 probes and 300 builds in one bucket, 1 pair elsewhere
    clicks = spark.range(201).select(
        F.col("id").alias("click_id"),
        F.col("id").cast("timestamp").alias("cts"),
        F.when(F.col("id") < 200, F.lit(7)).otherwise(F.lit(99)).alias("bkt"),
    )
    errors = spark.range(301).select(
        F.col("id").cast("timestamp").alias("ets"),
        F.when(F.col("id") < 300, F.lit(7)).otherwise(F.lit(99)).alias("bkt"),
    )
    c2, e2 = advanced.interval_density_guard(clicks, errors)
    g = dict(advanced.LAST_INTERVAL_GUARD)
    assert g["pairs"] == 200 * 300 + 1 and g["worst_bucket_pairs"] == 200 * 300
    assert g["engaged"] and g["capped_rows"] == 0  # log-only by default
    assert c2.count() == 201 and e2.count() == 301  # sides untouched

    c3, e3 = advanced.interval_density_guard(clicks, errors, budget=50)
    g = dict(advanced.LAST_INTERVAL_GUARD)
    assert g["engaged"] and g["capped_rows"] == (200 - 50) + (300 - 50)
    assert c3.groupBy("bkt").count().agg(F.max("count")).collect()[0][0] <= 50
    assert e3.groupBy("bkt").count().agg(F.max("count")).collect()[0][0] <= 50

    # (c): the registered exact query runs with the guard in log-only
    # mode and still produces rows (hash parity is tools/check.py's job)
    n = advanced.join_interval_bucketed(spark, SF_SMOKE).count()
    assert n > 0
    assert advanced.LAST_INTERVAL_GUARD["capped_rows"] == 0


def test_spatial_grid_join_is_equi_join(spark):
    """join_spatial_grid's scale claim: the radius join must execute as
    a plain equi-join on the (cx, cy) cell key — a hashed/sort-merge
    shuffle join, never BroadcastNestedLoop/Cartesian (which is what a
    naive theta-join on |dx|<=R would plan); and the 3x3 replication
    must appear as a bounded Generate (explode), not a join blowup."""
    from parquet_storage_query_spark.operators.relational import join_spatial_grid

    plan = formatted_plan(join_spatial_grid(spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Generate" in plan, plan  # the 3x3 neighbor explode


def test_exif_metadata_single_pass_no_shuffle(spark):
    """mm_exif_metadata's footer-only claim, plan side: the IFD walk is
    one mapInPandas pass over the fixture scan with no aggregate and no
    join — the only exchange allowed is the final orderBy's range
    partitioning."""
    from parquet_storage_query_spark.operators.multimodal import mm_exif_metadata

    plan = formatted_plan(mm_exif_metadata(spark, SF_SMOKE))
    assert "MapInPandas" in plan, plan
    assert "HashAggregate" not in plan, plan
    assert "Join" not in plan, plan


def test_inet_and_geohash_stay_in_codegen(spark):
    """scalar_inet / scalar_geohash are map-only function packs: a
    single parquet scan each, zero joins/aggregates, and the expression
    work inside WholeStageCodegen (the geohash interleave fold is a
    codegen-able higher-order function, not a Python boundary)."""
    from parquet_storage_query_spark.functions.scalar import scalar_geohash, scalar_inet

    for fn in (scalar_inet, scalar_geohash):
        df = fn(spark, SF_SMOKE)
        plan = formatted_plan(df)
        assert "Join" not in plan and "HashAggregate" not in plan, plan
        assert "Pandas" not in plan and "BatchEvalPython" not in plan, plan
        assert whole_stage_codegen_spans(df) >= 1, plan


def test_knn_graph_candidates_are_equi_join(spark):
    """sim_knn_graph must generate candidates through the (band, bucket)
    equi-join of the LSH index with its budgeted self — never a
    cross/nested-loop pairing of the corpus with itself."""
    from parquet_storage_query_spark.operators.similarity import sim_knn_graph

    plan = formatted_plan(sim_knn_graph(spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
