"""Event-sequence analytics over the `events` stream: per-user Markov
transition structure and ordered funnel conversion — the behavioral-
analytics queries an event log exists to answer (and the batch twins of
what the streaming sessionizer feeds).

Both are partial-merge aggregates over user-keyed windows/joins: the
100 TB cost is one shuffle keyed by user_id (the natural partitioning of
an event stream), then O(users)- or O(type²)-sized state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query


@query(
    "events_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events),
    t AS (SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
          FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2)
    SELECT from_type, to_type, n,
           round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type), 4) AS p
    FROM t
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior: for each
    ordered pair of event types, how often one follows the other within a
    user's timeline, and the row-normalized transition probability — the
    "what happens next" table behind session modeling and anomaly
    scoring (an (error → purchase) cell suddenly growing is a signal).

    Shape: ONE user-keyed window (the stream's natural partitioning — no
    global ordering anywhere), then the transition rollup collapses to
    O(types²) rows; the probability window runs over that tiny matrix.
    Tie-broken by event_id so the sequence — and therefore the hash — is
    deterministic under any task ordering."""
    seq = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.lead("event_type")
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("next_type"),
    )
    t = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return t.select(
        "from_type",
        "to_type",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(W.partitionBy("from_type")), 4
        ).alias("p"),
    )


FUNNEL = ("view", "click", "purchase")


@query(
    "events_funnel",
    oracle=f"""
    WITH u AS (SELECT count(DISTINCT user_id) AS n_total FROM events),
    s1 AS (SELECT user_id, min(ts) AS t1 FROM events
           WHERE event_type = '{FUNNEL[0]}' GROUP BY user_id),
    s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
           WHERE e.event_type = '{FUNNEL[1]}' AND e.ts > s1.t1 GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
           WHERE e.event_type = '{FUNNEL[2]}' AND e.ts > s2.t2 GROUP BY e.user_id),
    c AS (SELECT (SELECT n_total FROM u)    AS n_total,
                 (SELECT count(*) FROM s1)  AS n1,
                 (SELECT count(*) FROM s2)  AS n2,
                 (SELECT count(*) FROM s3)  AS n3)
    SELECT stage, n_users,
           (2000000 * n_users + prev_n) // (2 * prev_n)   AS conv_from_prev_e6,
           (2000000 * n_users + n_total) // (2 * n_total) AS conv_from_all_e6
    FROM (
        SELECT 1 AS ord, '{FUNNEL[0]}' AS stage, n1 AS n_users, n_total AS prev_n, n_total FROM c
        UNION ALL
        SELECT 2, '{FUNNEL[1]}', n2, n1, n_total FROM c
        UNION ALL
        SELECT 3, '{FUNNEL[2]}', n3, n2, n_total FROM c)
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion (view → click → purchase, each stage
    strictly AFTER the previous stage's first occurrence — not mere
    co-occurrence): users per stage plus step and overall conversion
    rates. The sequential-constraint join is what separates a funnel from
    three filters.

    SINGLE-SCAN shape (VERDICT r5 What's-wrong #6 — the per-stage-arm
    form scanned events 7 times): one pass over the user-time-ordered
    window computes, per row, the running min view-ts, then the running
    min of clicks strictly after it, then purchases strictly after that.
    The running mins are correct stand-ins for the global stage times
    because the window is ts-ordered: a click qualifies against the
    running view-min iff it qualifies against the user's overall first
    view (any view with smaller ts is already inside the running frame;
    ties fail the strict > either way). The chained selects reuse ONE
    user_id partitioning — plan audit shows a single events scan and a
    single exchange — and the per-user verdict collapses to three
    qualifying flags, partial-merged to four scalar counts. Conversions
    are round-half-up integer millionths (the driver-proof integer
    policy: no double cells)."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    step1 = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.min(F.when(F.col("event_type") == FUNNEL[0], F.col("ts"))).over(w).alias("t1r"),
    )
    step2 = step1.select(
        "user_id",
        "ts",
        "event_type",
        "t1r",
        F.min(
            F.when(
                (F.col("event_type") == FUNNEL[1]) & (F.col("ts") > F.col("t1r")),
                F.col("ts"),
            )
        )
        .over(w)
        .alias("t2r"),
    )
    per_user = (
        step2.groupBy("user_id")
        .agg(
            F.max(F.col("t1r").isNotNull()).alias("s1"),
            F.max(F.col("t2r").isNotNull()).alias("s2"),
            F.max(
                (F.col("event_type") == FUNNEL[2]) & (F.col("ts") > F.col("t2r"))
            ).alias("s3"),
        )
    )
    c = per_user.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.col("s1").cast("long")).alias("n1"),
        F.sum(F.col("s2").cast("long")).alias("n2"),
        F.sum(F.col("s3").cast("long")).alias("n3"),
    )
    rows = c.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(FUNNEL[0]).alias("stage"),
                    F.col("n1").alias("n_users"),
                    F.col("n_total").alias("prev_n"),
                    F.col("n_total").alias("n_total"),
                ),
                F.struct(
                    F.lit(FUNNEL[1]).alias("stage"),
                    F.col("n2").alias("n_users"),
                    F.col("n1").alias("prev_n"),
                    F.col("n_total").alias("n_total"),
                ),
                F.struct(
                    F.lit(FUNNEL[2]).alias("stage"),
                    F.col("n3").alias("n_users"),
                    F.col("n2").alias("prev_n"),
                    F.col("n_total").alias("n_total"),
                ),
            )
        ).alias("s")
    ).select("s.stage", "s.n_users", "s.prev_n", "s.n_total")
    return rows.select(
        "stage",
        "n_users",
        F.expr("(2000000 * n_users + prev_n) DIV (2 * prev_n)").alias(
            "conv_from_prev_e6"
        ),
        F.expr("(2000000 * n_users + n_total) DIV (2 * n_total)").alias(
            "conv_from_all_e6"
        ),
    )


def _first_seen(ev: DataFrame) -> DataFrame:
    """Per-user signup-cohort table (day of first event) — the shared
    input of the cohort family (retention triangle, LTV curve): one
    user-keyed partial-merge min, date_trunc'd identically on both
    engines so cohort keys match bit-for-bit."""
    return ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_day")
    )


LAG_BUCKETS = (60, 3600, 86400)  # ≤1min, ≤1h, ≤1day, >1day


@query(
    "events_conversion_lag",
    oracle=f"""
    WITH t1 AS (SELECT user_id, min(ts) AS t1 FROM events
                WHERE event_type = '{FUNNEL[0]}' GROUP BY user_id),
    tp AS (SELECT e.user_id,
                  (epoch_us(min(e.ts)) - epoch_us(any_value(t1.t1))) // 1000000
                    AS lag_sec
           FROM events e JOIN t1 USING (user_id)
           WHERE e.event_type = '{FUNNEL[2]}' AND e.ts > t1.t1
           GROUP BY e.user_id),
    b AS (SELECT CASE WHEN lag_sec <= {LAG_BUCKETS[0]} THEN 'a_under_1m'
                      WHEN lag_sec <= {LAG_BUCKETS[1]} THEN 'b_under_1h'
                      WHEN lag_sec <= {LAG_BUCKETS[2]} THEN 'c_under_1d'
                      ELSE 'd_over_1d' END AS bucket,
                 lag_sec
          FROM tp)
    SELECT bucket, count(*) AS n_users,
           min(lag_sec) AS min_lag_sec, max(lag_sec) AS max_lag_sec,
           CAST(sum(lag_sec) AS BIGINT) AS sum_lag_sec,
           CAST((20000 * sum(lag_sec) + count(*)) // (2 * count(*))
                AS BIGINT) AS avg_lag_sec_e4
    FROM b GROUP BY bucket
    """,
)
def events_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-TO-CONVERT distribution — the funnel's latency readout: for
    every user who purchases after their first view, the lag from first
    view to first qualifying purchase, bucketed into the product-analytics
    grid (≤1 min / ≤1 h / ≤1 day / longer) with per-bucket whole-second
    min/max/sum and a round-half-up e4 average. Answers "how long does
    conversion take", which the stage-count funnel cannot.

    Exactness: lags are whole-second integers (µs difference floor-div),
    buckets are integer comparisons, the average is integer DIV — pure
    BIGINT/STRING output. int64 headroom: 2·10⁴·Σlag needs Σlag <
    4.6×10¹⁴ s per bucket (~10⁸ converting users at week-long lags);
    beyond that, lift the display division to DECIMAL(38,0) — the same
    bound note as events_session_stats. Shape: two user-keyed
    partial-merge mins and one O(4)-row rollup; events shuffle once on
    user_id, nothing else moves."""
    ev = load(spark, sf_dir, "events")
    t1 = (
        ev.filter(F.col("event_type") == FUNNEL[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    lag = (
        ev.filter(F.col("event_type") == FUNNEL[2])
        .join(t1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(
            (
                (F.unix_micros(F.min("ts")) - F.unix_micros(F.first("t1")))
                / 1_000_000
            )
            .cast("long")
            .alias("lag_sec")
        )
    )
    bucket = (
        F.when(F.col("lag_sec") <= LAG_BUCKETS[0], "a_under_1m")
        .when(F.col("lag_sec") <= LAG_BUCKETS[1], "b_under_1h")
        .when(F.col("lag_sec") <= LAG_BUCKETS[2], "c_under_1d")
        .otherwise("d_over_1d")
    )
    return (
        lag.select(bucket.alias("bucket"), "lag_sec")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.min("lag_sec").alias("min_lag_sec"),
            F.max("lag_sec").alias("max_lag_sec"),
            F.sum("lag_sec").alias("sum_lag_sec"),
            F.expr(
                "(20000 * sum(lag_sec) + count(1)) DIV (2 * count(1))"
            ).alias("avg_lag_sec_e4"),
        )
    )


@query(
    "events_cohort_ltv",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, time_bucket(INTERVAL '1 day', min(ts)) AS cohort_day
        FROM events GROUP BY user_id),
    sizes AS (SELECT cohort_day, count(*) AS cohort_n
              FROM first_seen GROUP BY cohort_day),
    rev AS (
        SELECT f.cohort_day,
               CAST(date_diff('day', f.cohort_day,
                              time_bucket(INTERVAL '1 day', e.ts)) AS BIGINT)
                 AS day_n,
               sum(CAST(round(e.value * 100) AS BIGINT)) AS rev_cents
        FROM events e JOIN first_seen f USING (user_id)
        WHERE e.event_type = 'purchase'
        GROUP BY 1, 2),
    grid AS (
        SELECT s.cohort_day, s.cohort_n, t.d AS day_n
        FROM sizes s, unnest(range(8)) AS t(d)),
    curve AS (
        SELECT g.cohort_day, g.cohort_n, g.day_n,
               coalesce(r.rev_cents, 0) AS rev_cents
        FROM grid g LEFT JOIN rev r
          ON r.cohort_day = g.cohort_day AND r.day_n = g.day_n)
    SELECT strftime(CAST(cohort_day AS DATE), '%Y-%m-%d') AS cohort_day,
           day_n, cohort_n,
           CAST(sum(rev_cents) OVER (PARTITION BY cohort_day ORDER BY day_n
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cum_revenue_cents,
           CAST((2 * sum(rev_cents) OVER (PARTITION BY cohort_day ORDER BY day_n
                                          ROWS UNBOUNDED PRECEDING) + cohort_n)
                // (2 * cohort_n) AS BIGINT) AS ltv_cents_per_user
    FROM curve
    """,
)
def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LIFETIME-VALUE curve — retention's revenue twin and the
    third consumer of the first-seen table: for each signup cohort (day
    of first event) and each day offset 0..7, the CUMULATIVE purchase
    revenue and the per-user LTV at that age. The question every growth
    team asks of an event log ("how much is a day-N user worth?"),
    missing from the family until now.

    Exactness and shape: revenue accumulates in integer cents, the LTV
    display is round-half-up integer DIV, and the cohort key renders as
    an ISO string — pure BIGINT/STRING output (driver-proof policy).
    Dense day grid 0..7 (explode on Spark, range() on DuckDB) so cohorts
    with zero-revenue days still show a flat curve instead of gaps. One
    user-keyed shuffle builds first-seen; the revenue join re-uses the
    user key; the cumulative window runs over the O(cohorts × 8) curve
    table, never the corpus."""
    ev = load(spark, sf_dir, "events")
    first_seen = _first_seen(ev)
    sizes = first_seen.groupBy("cohort_day").agg(F.count(F.lit(1)).alias("cohort_n"))
    rev = (
        ev.filter(F.col("event_type") == "purchase")
        .join(first_seen, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.date_trunc("day", F.col("ts")), F.col("cohort_day"))
            .cast("long")
            .alias("day_n"),
        )
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("rev_cents"))
    )
    grid = sizes.select(
        "cohort_day",
        "cohort_n",
        F.explode(F.sequence(F.lit(0), F.lit(7))).alias("d"),
    ).select("cohort_day", "cohort_n", F.col("d").cast("long").alias("day_n"))
    curve = grid.join(rev, ["cohort_day", "day_n"], "left").select(
        "cohort_day",
        "cohort_n",
        "day_n",
        F.coalesce("rev_cents", F.lit(0)).alias("rev_cents"),
    )
    wcum = (
        W.partitionBy("cohort_day")
        .orderBy("day_n")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # ONE window definition: the LTV division derives from the aliased
    # cumulative column, so both outputs share the same frame by
    # construction (review finding: the F.expr twin spelled the window a
    # second time in SQL syntax)
    return (
        curve.select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            "day_n",
            "cohort_n",
            F.sum("rev_cents").over(wcum).alias("cum_revenue_cents"),
        )
        .withColumn(
            "ltv_cents_per_user",
            F.expr("(2 * cum_revenue_cents + cohort_n) DIV (2 * cohort_n)"),
        )
    )


@query(
    "events_retention_cohorts",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, time_bucket(INTERVAL '1 day', min(ts)) AS cohort_day
        FROM events GROUP BY user_id),
    activity AS (
        SELECT DISTINCT e.user_id, f.cohort_day,
               CAST(date_diff('day', f.cohort_day,
                              time_bucket(INTERVAL '1 day', e.ts)) AS BIGINT) AS day_n
        FROM events e JOIN first_seen f USING (user_id)),
    sizes AS (SELECT cohort_day, count(DISTINCT user_id) AS cohort_n
              FROM first_seen GROUP BY cohort_day)
    SELECT a.cohort_day, a.day_n,
           count(*) AS n_active,
           round(CAST(count(*) AS DOUBLE) / any_value(s.cohort_n), 4) AS retention
    FROM activity a JOIN sizes s USING (cohort_day)
    WHERE a.day_n <= 7
    GROUP BY a.cohort_day, a.day_n
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day, then the
    fraction of each cohort active again N days later (the retention
    triangle, first week) — the canonical product-analytics rollup and a
    second consumer of the first-seen table the funnel family builds.

    Shape: first-seen is one user-keyed partial-merge min; activity
    re-joins it user-keyed (broadcastable at O(users) — the event table
    itself never self-joins); the triangle is O(cohorts × days) rows.
    Day bucketing uses date_trunc on BOTH engines so cohort keys match
    bit-for-bit."""
    ev = load(spark, sf_dir, "events")
    first_seen = _first_seen(ev)
    activity = (
        ev.join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.date_trunc("day", F.col("ts")), F.col("cohort_day"))
            .cast("long")
            .alias("day_n"),
        )
        .distinct()
    )
    sizes = first_seen.groupBy("cohort_day").agg(
        F.countDistinct("user_id").alias("cohort_n")
    )
    return (
        activity.filter(F.col("day_n") <= 7)
        .join(sizes, "cohort_day")
        .groupBy("cohort_day", "day_n")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.round(
                F.count(F.lit(1)).cast("double") / F.any_value("cohort_n"), 4
            ).alias("retention"),
        )
    )


@query(
    "events_anomaly_zscore",
    oracle="""
    WITH hourly AS (
        SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS hour_start,
               count(*) AS n
        FROM events GROUP BY 1, 2),
    scored AS (
        SELECT event_type, hour_start, n,
               avg(n) OVER w  AS base_mean,
               stddev_samp(n) OVER w AS base_std
        FROM hourly
        WINDOW w AS (PARTITION BY event_type ORDER BY hour_start
                     ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING))
    SELECT event_type, hour_start, n,
           round(base_mean, 4) AS base_mean,
           round((n - base_mean) / base_std, 4) AS zscore,
           abs((n - base_mean) / base_std) > 3.0 AS is_anomaly
    FROM scored
    WHERE base_std IS NOT NULL AND base_std > 0
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection: each (event_type, hour) count scored
    against the TRAILING six hours' mean/std (rows 6-preceding to
    1-preceding — the current hour never contaminates its own baseline),
    flagged at |z| > 3 — the monitoring rule that pages when an error
    type spikes. Warm-up hours (fewer than two baseline points) are
    excluded rather than scored against a degenerate std.

    Shape: the hourly rollup is one partial-merge aggregate; the trailing
    window partitions by event_type over O(types × hours) rows — tiny
    state no matter how many raw events feed it. The same plan runs
    incrementally as a streaming windowed-agg + foreachBatch scorer."""
    hourly = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("hour_start"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return score_hourly_counts(hourly)


def score_hourly_counts(hourly: DataFrame) -> DataFrame:
    """Trailing-window z-scoring of an (event_type, hour_start, n) table —
    shared by the batch operator above and the live foreachBatch monitor
    (streaming/windows.streaming_anomaly_zscore), which scores each
    micro-batch SNAPSHOT of its streaming hourly counts with this exact
    plan."""
    w = (
        W.partitionBy("event_type")
        .orderBy("hour_start")
        .rowsBetween(-6, -1)
    )
    scored = hourly.select(
        "event_type",
        "hour_start",
        "n",
        F.avg("n").over(w).alias("base_mean"),
        F.stddev_samp("n").over(w).alias("base_std"),
    )
    z = (F.col("n") - F.col("base_mean")) / F.col("base_std")
    return scored.filter(F.col("base_std").isNotNull() & (F.col("base_std") > 0)).select(
        "event_type",
        "hour_start",
        "n",
        F.round("base_mean", 4).alias("base_mean"),
        F.round(z, 4).alias("zscore"),
        (F.abs(z) > 3.0).alias("is_anomaly"),
    )


@query(
    "events_attribution",
    oracle="""
    WITH touched AS (
        SELECT event_type, value,
               last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                          IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS touch_type,
               last_value(CASE WHEN event_type <> 'purchase' THEN ts END
                          IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS touch_ts,
               ts
        FROM events
    )
    SELECT touch_type, count(*) AS n_purchases,
           round(sum(value), 2) AS attributed_value
    FROM touched
    WHERE event_type = 'purchase' AND touch_type IS NOT NULL
      AND ts - touch_ts <= INTERVAL 7 DAY
    GROUP BY touch_type
    ORDER BY touch_type
    """,
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase is credited to the user's most
    recent preceding non-purchase event within a 7-day window — the
    marketing-analytics standard that asks "what did the user do right
    before converting".

    Shape: ONE user-keyed window pass carrying two ignore-nulls running
    `last` values (the latest touch's type and time); the purchase filter
    and the 7-day lookback are per-row predicates after it, and the credit
    rollup is O(types). Exactly one shuffle at any corpus size — the same
    user_id partitioning every other event operator uses, so a multi-query
    session reuses the exchange. Tie-broken by event_id for a
    deterministic hash."""
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    touch_type = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")), ignorenulls=True
    ).over(w)
    touch_ts = F.last(
        F.when(F.col("event_type") != "purchase", F.col("ts")), ignorenulls=True
    ).over(w)
    touched = load(spark, sf_dir, "events").select(
        "event_type",
        "value",
        "ts",
        touch_type.alias("touch_type"),
        touch_ts.alias("touch_ts"),
    )
    return (
        touched.filter(
            (F.col("event_type") == "purchase")
            & F.col("touch_type").isNotNull()
            & (F.col("ts") <= F.col("touch_ts") + F.expr("INTERVAL 7 DAYS"))
        )
        .groupBy("touch_type")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum("value"), 2).alias("attributed_value"),
        )
        .orderBy("touch_type")
    )


@query(
    "events_path_topk",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type, 1) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS t2,
               lead(event_type, 2) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS t3
        FROM events
    )
    SELECT event_type || ' > ' || t2 || ' > ' || t3 AS path, count(*) AS n
    FROM seq WHERE t3 IS NOT NULL
    GROUP BY path
    ORDER BY n DESC, path
    LIMIT 15
    """,
)
def events_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 three-step behavior paths (event-type trigrams over each
    user's timeline) — the path-analysis view that surfaces dominant
    flows (view > click > purchase) and pathological loops
    (error > error > error).

    Shape: the same single user-keyed window as the transition matrix,
    two leads instead of one; the trigram rollup is O(types³) ≤ 125 rows
    here, and top-15 is TakeOrderedAndProject. One shuffle total."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = load(spark, sf_dir, "events").select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    )
    return (
        seq.filter(F.col("t3").isNotNull())
        .groupBy(
            F.concat_ws(" > ", "event_type", "t2", "t3").alias("path")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(15)
    )


@query(
    "events_dau_mau",
    oracle="""
    WITH mau AS (SELECT count(DISTINCT user_id) AS m FROM events),
    dau AS (SELECT CAST(ts AS DATE) AS day, count(DISTINCT user_id) AS dau
            FROM events GROUP BY day)
    SELECT strftime(day, '%Y-%m-%d') AS day, dau, m AS mau,
           CAST((2 * 10000 * dau + m) // (2 * m) AS BIGINT) AS stickiness_e4
    FROM dau, mau
    ORDER BY day
    """,
)
def events_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness: daily active users over the month's active
    users, per day — the engagement ratio every consumer product tracks.
    (The corpus is exactly one month, so MAU is the corpus-wide distinct.)

    Shape: two count-distinct aggregates over the same scan — the daily
    one keyed by day (two-phase distinct), the monthly one a single-row
    sketch-sized result broadcast back as a cross join. At 100 TB the
    rolling-window variant maintains per-day KMV/HLL sketches
    (agg_windowed_hll / agg_kmv_distinct) and unions 30 of them per day
    instead of rescanning — the merge property those operators pin."""
    ev = load(spark, sf_dir, "events")
    mau = ev.agg(F.countDistinct("user_id").alias("mau"))
    dau = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.countDistinct("user_id").alias("dau")
    )
    return (
        dau.crossJoin(F.broadcast(mau))
        .select(
            # ISO day string + round-half-up e4 integer: DATE cells render
            # datetime64 under a pandas fetch but datetime.date natively —
            # strings and int64 render identically under every fetch path
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dau",
            "mau",
            F.expr("CAST((2 * 10000 * dau + mau) DIV (2 * mau) AS BIGINT)").alias(
                "stickiness_e4"
            ),
        )
        .orderBy("day")
    )


@query(
    "events_ab_lift",
    oracle="""
    WITH assign AS (
        SELECT DISTINCT user_id,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 2 AS bucket
        FROM events
    ), conv AS (
        SELECT DISTINCT user_id FROM events
        WHERE event_type = 'purchase' AND value > 180.0
    ), cells AS (
        SELECT a.bucket,
               count(*) AS n_users,
               sum(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)
                 AS n_converted
        FROM assign a LEFT JOIN conv c ON a.user_id = c.user_id
        GROUP BY a.bucket
    ), wide AS (
        SELECT
            max(CASE WHEN bucket = 0 THEN n_users END)     AS n_a,
            max(CASE WHEN bucket = 0 THEN n_converted END) AS conv_a,
            max(CASE WHEN bucket = 1 THEN n_users END)     AS n_b,
            max(CASE WHEN bucket = 1 THEN n_converted END) AS conv_b
        FROM cells
    )
    SELECT n_a, CAST(conv_a AS BIGINT) AS conv_a,
           n_b, CAST(conv_b AS BIGINT) AS conv_b,
           CAST((2000000 * conv_a + n_a) // (2 * n_a) AS BIGINT) AS rate_a_e6,
           CAST((2000000 * conv_b + n_b) // (2 * n_b) AS BIGINT) AS rate_b_e6,
           CASE WHEN conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b
                THEN NULL
                ELSE (CASE WHEN conv_b * n_a < conv_a * n_b THEN -1 ELSE 1 END)
                 * CAST(
                     ((conv_b * n_a - conv_a * n_b)::HUGEINT
                      * (conv_b * n_a - conv_a * n_b)
                      * (n_a + n_b) * 1000000)
                     // ((n_a)::HUGEINT * n_b * (conv_a + conv_b)
                         * (n_a + n_b - conv_a - conv_b))
                   AS BIGINT) END AS z2_e6_signed
    FROM wide
    """,
)
def events_ab_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B conversion analysis: users deterministically hash-bucketed into
    two arms (md5 — reproducible assignment, the same no-rand() contract
    as train_split_hash), purchase conversion per arm, and the pooled
    two-proportion z-score — the experiment-readout query every product
    analytics stack runs.

    Exactness: every cell is an integer count and every OUTPUT cell is a
    BIGINT — no doubles anywhere. Rates are round-half-up integer
    millionths ((2·10⁶·c + n) DIV 2n: pure int64 arithmetic, identical
    on any engine). The significance readout is the SQUARED pooled
    z-score in millionths, signed by the lift direction: z² of the
    two-proportion test is exactly rational — z² = (c_b·n_a − c_a·n_b)²
    ·N / (n_a·n_b·C·(N−C)) with C=c_a+c_b, N=n_a+n_b — so it's computed
    by one 128-bit integer division (DECIMAL(38,0) / HUGEINT), never
    touching sqrt or floating point. z²·10⁶ ≥ 3.84×10⁶ ⇔ 95%
    significance; the sign carries the lift direction. int128 headroom:
    D²·N·10⁶ stays under 10³⁸ for arms up to ~10⁷ users each — beyond
    that, drop the 10⁶ scale into the denominator and report z²·10³ (or
    divide D by gcd(D, n_a·n_b) first); the experiment-arm cap, not the
    corpus, is the bound. (The original
    rounded-double rate/z columns were CORRECTNESS_r05's only red cells
    here while every local emulation matched bit-for-bit — the integer
    surface removes the entire float canonicalization channel.) Shape:
    one distinct-user reduction, one semi-reduction for converters, a
    2-row cell table — the corpus is touched twice, the statistics are
    O(1)."""
    ev = load(spark, sf_dir, "events")
    assign = ev.select("user_id").distinct().select(
        "user_id",
        (
            F.conv(F.substring(F.md5(F.col("user_id").cast("string").cast("binary")), 1, 8), 16, 10)
            .cast("long")
            % 2
        ).alias("bucket"),
    )
    conv = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 180.0))
        .select("user_id")
        .distinct()
    )
    cells = (
        assign.join(conv.withColumn("c", F.lit(1)), "user_id", "left")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(F.coalesce(F.col("c"), F.lit(0))).alias("n_converted"),
        )
    )
    wide = cells.agg(
        F.max(F.when(F.col("bucket") == 0, F.col("n_users"))).alias("n_a"),
        F.max(F.when(F.col("bucket") == 0, F.col("n_converted"))).alias("conv_a"),
        F.max(F.when(F.col("bucket") == 1, F.col("n_users"))).alias("n_b"),
        F.max(F.when(F.col("bucket") == 1, F.col("n_converted"))).alias("conv_b"),
    )
    z2 = F.expr(
        """CASE WHEN conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b THEN NULL
           ELSE (CASE WHEN conv_b * n_a < conv_a * n_b THEN -1L ELSE 1L END)
            * ((CAST(conv_b * n_a - conv_a * n_b AS DECIMAL(38,0))
                * CAST(conv_b * n_a - conv_a * n_b AS DECIMAL(38,0))
                * (n_a + n_b) * 1000000)
               DIV (CAST(n_a AS DECIMAL(38,0)) * n_b * (conv_a + conv_b)
                    * (n_a + n_b - conv_a - conv_b)))
           END"""
    )
    return wide.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.expr("(2000000 * conv_a + n_a) DIV (2 * n_a)").alias("rate_a_e6"),
        F.expr("(2000000 * conv_b + n_b) DIV (2 * n_b)").alias("rate_b_e6"),
        z2.alias("z2_e6_signed"),
    )


@query(
    "events_session_stats",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts, event_type, value,
               CASE WHEN lag(ts) OVER w IS NULL
                     OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id, ts, event_type, value,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM marked
    ), per_session AS (
        SELECT user_id, session_id, count(*) AS depth,
               (epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000
                 AS duration_sec,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 AS converted,
               sum(CAST(round(value * 100) AS BIGINT)) AS value_cents
        FROM sess GROUP BY user_id, session_id
    )
    SELECT count(*) AS n_sessions,
           CAST((20000 * sum(depth) + count(*)) // (2 * count(*)) AS BIGINT)
             AS avg_depth_e4,
           CAST((20000 * sum(duration_sec) + count(*)) // (2 * count(*))
                AS BIGINT) AS avg_duration_sec_e4,
           CAST(sum(converted) AS BIGINT) AS converted_sessions,
           CAST((2000000 * sum(converted) + count(*)) // (2 * count(*))
                AS BIGINT) AS conversion_e6,
           CAST(sum(value_cents) AS BIGINT) AS total_value_cents
    FROM per_session
    """,
)
def events_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-level product metrics on top of the 30-minute-gap
    sessionizer: how many sessions, how deep, how long, how often a
    session converts, and total session value — the funnel/sessionize
    follow-on every analytics stack reports.

    One user_id shuffle serves BOTH windows (gap-lag and the running
    session-id sum reuse the partitioning, same as window_sessionize),
    the per-session rollup groups on the same key, and the corpus-level
    summary is a single-row partial-merged aggregate. Durations are
    whole-second integers and session values integer cents, so every
    average is a ratio of exact integers — displayed as ROUND-HALF-UP
    integer 10⁻⁴/10⁻⁶ units ((2·scale·sum + n) DIV 2n), keeping the
    output schema pure BIGINT: no double cell exists for an engine or
    harness to render differently (the rounded-double averages were this
    query's only red cells in CORRECTNESS_r05 despite bit-identical
    local values). int64 headroom: 2·10⁴·Σdepth needs Σdepth < 4.6×10¹⁴
    events — beyond that, lift the two display divisions to
    DECIMAL(38,0), nothing else changes."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    df = load(spark, sf_dir, "events")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag(F.col("ts")).over(w))
    per_session = (
        df.withColumn(
            "new_session",
            F.when(gap.isNull() | (gap >= 30 * 60 * 1_000_000), F.lit(1)).otherwise(F.lit(0)),
        )
        .withColumn("session_id", F.sum("new_session").over(run))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("depth"),
            (
                (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))) / 1_000_000
            ).cast("long").alias("duration_sec"),
            F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("converted"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
    )
    return per_session.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("depth").alias("sd"),
        F.sum("duration_sec").alias("sdur"),
        F.sum("converted").alias("converted_sessions"),
        F.sum("value_cents").alias("total_value_cents"),
    ).select(
        "n_sessions",
        F.expr("(20000 * sd + n_sessions) DIV (2 * n_sessions)").alias("avg_depth_e4"),
        F.expr("(20000 * sdur + n_sessions) DIV (2 * n_sessions)").alias(
            "avg_duration_sec_e4"
        ),
        "converted_sessions",
        F.expr(
            "(2000000 * converted_sessions + n_sessions) DIV (2 * n_sessions)"
        ).alias("conversion_e6"),
        "total_value_cents",
    )


@query(
    "events_running_distinct",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, event_type, min(ts) AS fts
        FROM events GROUP BY user_id, event_type),
    ranked AS (
        SELECT user_id, fts,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY fts, event_type) AS k
        FROM first_seen)
    SELECT CAST(k AS BIGINT) AS k,
           strftime(CAST(date_trunc('day', fts) AS DATE), '%Y-%m-%d') AS day,
           count(*) AS n_users
    FROM ranked GROUP BY k, day
    """,
)
def events_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT-count curve, the scale-correct way: the day each
    user's cumulative distinct-event-type count first reached k, rolled
    up to a (k, day) → users "time to breadth" distribution (how fast do
    users discover their 2nd, 3rd, ... feature?).

    The naive running distinct (collect_set over an ever-growing window)
    buffers every key per row — O(corpus) memory at 100 TB. The correct
    decomposition: distinct-count only changes on FIRST occurrences, so
    reduce to the first-seen table (one (user, type)-keyed partial-merge
    min — O(users × types) rows), rank first-seens per user (window over
    ≤|types| rows per user), and the k-th rank's timestamp IS the moment
    the running distinct count hit k. Ties broken by type name so the
    rank — and the hash — is engine-order independent."""
    ev = load(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id", "event_type").agg(F.min("ts").alias("fts"))
    ranked = first_seen.select(
        "fts",
        F.row_number()
        .over(W.partitionBy("user_id").orderBy("fts", "event_type"))
        .cast("long")
        .alias("k"),
    )
    return (
        ranked.groupBy(
            "k", F.date_format(F.date_trunc("day", "fts"), "yyyy-MM-dd").alias("day")
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "events_rfm_bands",
    oracle="""
    WITH now_t AS (SELECT date_trunc('day', max(ts)) AS now_day FROM events),
    u AS (
        SELECT user_id, count(*) AS f,
               sum(CAST(round(value * 100) AS BIGINT)) AS m,
               date_diff('day', date_trunc('day', max(ts)),
                         (SELECT now_day FROM now_t)) AS r
        FROM events WHERE event_type = 'purchase' GROUP BY user_id),
    b AS (
        SELECT CAST(CASE WHEN r <= 1 THEN 4 WHEN r <= 3 THEN 3
                         WHEN r <= 7 THEN 2 ELSE 1 END AS BIGINT) AS r_band,
               CAST(CASE WHEN f >= 20 THEN 4 WHEN f >= 13 THEN 3
                         WHEN f >= 8 THEN 2 ELSE 1 END AS BIGINT) AS f_band,
               CAST(CASE WHEN m >= 120000 THEN 4 WHEN m >= 90000 THEN 3
                         WHEN m >= 50000 THEN 2 ELSE 1 END AS BIGINT) AS m_band,
               m
        FROM u)
    SELECT r_band, f_band, m_band, count(*) AS n_users,
           CAST(sum(m) AS BIGINT) AS total_cents
    FROM b GROUP BY r_band, f_band, m_band
    """,
)
def events_rfm_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (recency / frequency / monetary) with
    FIXED business bands — the marketing-analytics rollup behind
    churn/win-back targeting. Each purchasing user scores 1-4 on days
    since last purchase, purchase count, and lifetime cents; the output
    is the O(4³)-cell segment census with its revenue.

    Fixed bands, not ntile quantiles, on purpose: quantile banding needs
    a global rank over all users (a single-partition window — the one
    shape that cannot scale), while fixed thresholds are pure map-side
    arithmetic after one user-keyed rollup; the band census then folds
    to ≤64 rows. "Now" is the corpus max-ts, recovered from the SAME
    user rollup (max of per-user maxima — one corpus scan total: the
    O(users) rollup is materialized once via the suite's
    localCheckpoint/session_memo prepared-view pattern, q15-style,
    because it feeds both the census and its own 1-row "now" scalar and
    Catalyst does not reuse the exchange across the two consumers).
    Integer cents and integer day arithmetic end to end."""
    from ..cache import session_memo

    def _per_user() -> DataFrame:
        ev = load(spark, sf_dir, "events")
        return (
            ev.groupBy("user_id")
            .agg(
                F.max("ts").alias("any_last"),
                F.count(F.when(F.col("event_type") == "purchase", 1)).alias("f"),
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        F.round(F.col("value") * 100).cast("long"),
                    )
                ).alias("m"),
                F.date_trunc(
                    "day",
                    F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))),
                ).alias("last_day"),
            )
            .localCheckpoint(eager=True)
        )

    per_user = session_memo(spark, sf_dir, "rfm_per_user_view", _per_user)
    now_t = per_user.agg(F.date_trunc("day", F.max("any_last")).alias("now_day"))
    u = (
        per_user.filter(F.col("f") > 0)
        .crossJoin(now_t)
        .withColumn("r", F.datediff("now_day", "last_day").cast("long"))
    )
    b = u.select(
        F.when(F.col("r") <= 1, 4).when(F.col("r") <= 3, 3)
        .when(F.col("r") <= 7, 2).otherwise(1).cast("long").alias("r_band"),
        F.when(F.col("f") >= 20, 4).when(F.col("f") >= 13, 3)
        .when(F.col("f") >= 8, 2).otherwise(1).cast("long").alias("f_band"),
        F.when(F.col("m") >= 120000, 4).when(F.col("m") >= 90000, 3)
        .when(F.col("m") >= 50000, 2).otherwise(1).cast("long").alias("m_band"),
        "m",
    )
    return b.groupBy("r_band", "f_band", "m_band").agg(
        F.count(F.lit(1)).alias("n_users"), F.sum("m").alias("total_cents")
    )


@query(
    "events_error_bursts",
    oracle="""
    WITH err AS (
        SELECT user_id, ts, event_id,
               CASE WHEN date_diff('microsecond',
                        lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                        ts) <= 3600000000 THEN 0 ELSE 1 END AS brk
        FROM events WHERE event_type = 'error'),
    runs AS (
        SELECT user_id,
               sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS run_id
        FROM err),
    sizes AS (SELECT user_id, run_id, count(*) AS len
              FROM runs GROUP BY user_id, run_id)
    SELECT user_id, count(*) AS n_bursts, max(len) AS longest_burst,
           CAST(sum(len) AS BIGINT) AS total_burst_errors
    FROM sizes WHERE len >= 2
    GROUP BY user_id
    """,
)
def events_error_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-BURST detection per user — gaps-and-islands run grouping
    over the event stream (the alerting twin of the sessionizer): a
    burst is ≥2 consecutive error events for the same user with ≤1 hour
    between them; the report is each affected user's burst count,
    longest burst, and total bursty errors. "Errors come in clusters" is
    the shape retry storms and broken clients leave in a log; a run
    detector finds them where per-day counts (events_anomaly_zscore)
    smear them away.

    Shape: errors filter → ONE user-keyed window pass (lag for the gap
    break flag, running sum for run ids — both over the same window, one
    shuffle), then two partial-merge rollups over O(runs) and O(users)
    rows. Gap arithmetic in integer microseconds on both engines; NULL
    lag (the user's first error) compares to NULL → else-branch 1, which
    correctly opens a run."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    err = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w) <= 3_600_000_000,
            0,
        )
        .otherwise(1)
        .alias("brk"),
    )
    runs = err.select(
        "user_id",
        F.sum("brk").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).alias("run_id"),
    )
    sizes = runs.groupBy("user_id", "run_id").agg(F.count(F.lit(1)).alias("len"))
    return (
        sizes.filter(F.col("len") >= 2)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_bursts"),
            F.max("len").alias("longest_burst"),
            F.sum("len").alias("total_burst_errors"),
        )
    )


@query(
    "events_attribution_multitouch",
    oracle="""
    WITH p AS (SELECT event_id AS pid, user_id, ts,
                      CAST(round(value * 100) AS BIGINT) AS cents
               FROM events WHERE event_type = 'purchase'),
    t AS (SELECT user_id, ts AS tts, event_type AS channel
          FROM events WHERE event_type IN ('view', 'click')),
    pairs AS (
        SELECT p.pid, p.cents, t.channel,
               count(*) OVER (PARTITION BY p.pid) AS n_touches
        FROM p JOIN t ON p.user_id = t.user_id
         AND t.tts >= p.ts - INTERVAL 7 DAY AND t.tts < p.ts)
    SELECT channel,
           count(*) AS n_touchpoints,
           count(DISTINCT pid) AS n_purchases,
           CAST(sum((1000 * cents) // n_touches) AS BIGINT) AS credit_millicents
    FROM pairs GROUP BY channel
    """,
)
def events_attribution_multitouch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR multi-touch attribution — the fair-share twin of
    `events_attribution` (last-touch): every view/click in the 7 days
    before a purchase splits that purchase's value equally, and the
    report is each channel's earned credit. Last-touch over-rewards the
    final click; linear credit is the standard first correction and the
    same join produces time-decay/U-shaped variants by changing one
    weight expression.

    Shape: one user_id-keyed equi-join (the stream's natural
    partitioning — both sides already cluster by user at 100 TB) with
    the 7-day interval as a residual predicate; per-purchase touch
    counts come from a purchase-keyed window over the pair set (bounded:
    a purchase's touches are one user's single week of activity); the
    channel rollup is a partial-merge aggregate over O(channels) groups.
    Credit is floor-divided integer millicents — deterministic on both
    engines; the sub-millicent remainder per purchase is the documented
    display loss (the exact-cents total still lives in the purchase
    table)."""
    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("puser"),
        F.col("ts").alias("pts"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    t = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("user_id").alias("tuser"),
        F.col("ts").alias("tts"),
        F.col("event_type").alias("channel"),
    )
    pairs = p.join(t, p.puser == t.tuser).filter(
        (F.col("tts") >= F.col("pts") - F.expr("INTERVAL 7 DAYS"))
        & (F.col("tts") < F.col("pts"))
    )
    wp = W.partitionBy("pid")
    credited = pairs.select(
        "pid",
        "channel",
        "cents",
        F.count(F.lit(1)).over(wp).alias("n_touches"),
    )
    return credited.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_touchpoints"),
        F.count_distinct("pid").alias("n_purchases"),
        F.sum(F.expr("(1000 * cents) DIV n_touches")).alias("credit_millicents"),
    )


@query(
    "events_streaks",
    oracle="""
    WITH d AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day
               FROM events WHERE event_type = 'purchase'),
    r AS (SELECT user_id,
                 CAST(day AS DATE)
                   - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
                          AS INTEGER) AS grp
          FROM d),
    s AS (SELECT user_id, grp, count(*) AS streak FROM r GROUP BY 1, 2),
    m AS (SELECT user_id, max(streak) AS best_streak FROM s GROUP BY 1)
    SELECT best_streak, count(*) AS n_users
    FROM m GROUP BY best_streak
    """,
)
def events_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity STREAK per user (purchase days),
    rolled to a streak-length census — the engagement metric behind
    every "don't break the chain" product loop, and the calendar-grain
    cousin of `events_error_bursts` (same gaps-and-islands identity, on
    days instead of timestamps): within a user, day − row_number(day) is
    constant exactly along a run of consecutive days, so one user-keyed
    window + two partial-merge rollups find every streak.

    Scale shape: the corpus reduces FIRST to distinct (user, day) — at
    most users × days rows ride the window shuffle, never raw events;
    the census output is O(max streak) rows. Integer day arithmetic on
    both engines (date − rank stays a date; grouping needs no epoch
    math)."""
    ev = load(spark, sf_dir, "events")
    d = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.date_trunc("day", "ts").alias("day"))
        .distinct()
    )
    r = d.select(
        "user_id",
        F.date_sub(
            F.col("day").cast("date"),
            F.row_number().over(W.partitionBy("user_id").orderBy("day")),
        ).alias("grp"),
    )
    s = r.groupBy("user_id", "grp").agg(F.count(F.lit(1)).alias("streak"))
    m = s.groupBy("user_id").agg(F.max("streak").alias("best_streak"))
    return m.groupBy("best_streak").agg(F.count(F.lit(1)).alias("n_users"))


@query(
    "events_activity_heatmap",
    oracle="""
    WITH census AS (
        SELECT date_diff('day', DATE '2024-01-01', date_trunc('day', ts)) % 7 AS dow,
               hour(ts) AS hour,
               count(*) AS n_events
        FROM events GROUP BY 1, 2),
    tot AS (SELECT sum(n_events) AS n FROM census)
    SELECT CAST(dow AS BIGINT) AS dow, CAST(hour AS BIGINT) AS hour, n_events,
           CAST((2 * 1000000 * n_events + n) // (2 * n) AS BIGINT) AS share_e6
    FROM census, tot
    ORDER BY dow, hour
    """,
)
def events_activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly activity heatmap: the (day-of-week × hour) event census with
    global share — the seasonality grid behind every ops dashboard and
    the input to load-aware batch scheduling.

    The day-of-week is deliberately NOT the engines' dayofweek(): Spark
    counts 1=Sunday, DuckDB 0=Sunday, ISO weeks differ again — the exact
    cross-engine trap the differential fuzzer's 7th grammar excludes by
    construction. Instead dow = days-since-a-known-Monday mod 7
    (0=Monday), pure integer date arithmetic with one convention on both
    engines — the portable form a multi-engine lakehouse should use
    anyway. One partial-merged aggregate over the scan into a ≤168-row
    grid; the global total is a 1-row aggregate of THAT grid broadcast
    back as a cross join; share is the engine's DIV-rounded e6 integer.
    Nothing after the first aggregate touches corpus-sized data."""
    ev = load(spark, sf_dir, "events")
    dow = (
        F.datediff(F.date_trunc("day", "ts"), F.to_date(F.lit("2024-01-01"))) % 7
    ).cast("long")
    census = ev.groupBy(
        dow.alias("dow"), F.hour("ts").cast("long").alias("hour")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    tot = census.agg(F.sum("n_events").alias("n"))
    return (
        census.crossJoin(F.broadcast(tot))
        .select(
            "dow",
            "hour",
            "n_events",
            F.expr("(2 * 1000000 * n_events + n) DIV (2 * n)").alias("share_e6"),
        )
        .orderBy("dow", "hour")
    )


SURVIVAL_HORIZON = 14  # days


@query(
    "events_survival_curve",
    oracle=f"""
    WITH spans AS (
        SELECT user_id,
               date_diff('day', min(date_trunc('day', ts)),
                         max(date_trunc('day', ts))) AS lifespan
        FROM events GROUP BY 1),
    hist AS (SELECT lifespan, count(*) AS n_users FROM spans GROUP BY 1),
    tot AS (SELECT sum(n_users) AS total FROM hist),
    curve AS (
        SELECT t.n AS day_n,
               coalesce(sum(CASE WHEN h.lifespan >= t.n
                                 THEN h.n_users END), 0) AS survivors
        FROM unnest(range({SURVIVAL_HORIZON + 1})) AS t(n) CROSS JOIN hist h
        GROUP BY t.n)
    SELECT CAST(day_n AS BIGINT) AS day_n,
           CAST(survivors AS BIGINT) AS survivors,
           CAST((2 * 1000000 * survivors + total) // (2 * total) AS BIGINT)
             AS survival_e6
    FROM curve, tot ORDER BY day_n
    """,
)
def events_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User survival curve — the retention chart product reviews open
    with: for each day N in 0..14, the fraction of users still active N
    or more days after their first event (lifespan = last-day minus
    first-day). Monotone by construction; where it cliffs is where the
    product loses people. The cohort-retention triangle
    (events_retention_cohorts) slices this same quantity per signup
    cohort; this is the corpus-wide marginal curve.

    Scale shape: lifespans fold in ONE user-keyed min/max aggregate
    (partial-merged; the only corpus-sized shuffle), then collapse to a
    lifespan histogram of O(observed-span) rows; the 15-point curve is a
    range-join of the broadcast horizon grid against that tiny histogram
    — the survivors-at-N sum never rescans users. Integer-only output
    (round-half-up e6 shares)."""
    ev = load(spark, sf_dir, "events")
    spans = ev.groupBy("user_id").agg(
        F.datediff(
            F.max(F.date_trunc("day", "ts")), F.min(F.date_trunc("day", "ts"))
        ).alias("lifespan")
    )
    hist = spans.groupBy("lifespan").agg(F.count(F.lit(1)).alias("n_users"))
    tot = hist.agg(F.sum("n_users").alias("total"))
    grid = spark.range(SURVIVAL_HORIZON + 1).select(F.col("id").alias("day_n"))
    return (
        F.broadcast(grid)
        .join(hist, F.col("lifespan") >= F.col("day_n"), "left")
        .groupBy("day_n")
        .agg(F.coalesce(F.sum("n_users"), F.lit(0)).alias("survivors"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("day_n").cast("long").alias("day_n"),
            F.col("survivors").cast("long").alias("survivors"),
            F.expr(
                "(2 * 1000000 * survivors + total) DIV (2 * total)"
            ).alias("survival_e6"),
        )
        .orderBy("day_n")
    )


# (pattern name, regex over the 1-char event codes c/e/p/s/v) — FIRST match
# wins, so order is load-bearing. Constructs are the portable common core of
# Java regex and RE2: anchors, classes, bounded/unbounded repetition.
_JOURNEY_PATTERNS = [
    ("instant_buyer", "^.{0,2}p"),       # purchase within the first 3 events
    ("research_buyer", "^[vc]+p"),       # only views/clicks, then purchase
    ("error_recovery", "e.*p"),          # bought despite an earlier error
    ("churned_after_error", "e[^p]*$"),  # an error never followed by purchase
    ("window_shopper", "^[vc]+$"),       # browsed only, never converted
    ("converter_other", "p"),            # remaining purchase journeys
]

_JOURNEY_CAP = 6  # onboarding prefix: the user's first 6 events


@query(
    "events_sequence_pattern",
    oracle=f"""
    WITH j AS (
        SELECT user_id,
               left(string_agg(left(event_type, 1), '' ORDER BY ts, event_id),
                    {_JOURNEY_CAP}) AS journey
        FROM events GROUP BY user_id),
    c AS (
        SELECT CASE
            {' '.join(f"WHEN regexp_matches(journey, '{rx}') THEN '{name}'"
                      for name, rx in _JOURNEY_PATTERNS)}
            ELSE 'other' END AS pattern
        FROM j),
    n AS (SELECT count(*) AS total FROM c)
    SELECT pattern, count(*) AS n_users,
           CAST((2000000 * count(*) + total) // (2 * total) AS BIGINT)
               AS share_e6
    FROM c, n GROUP BY pattern, total ORDER BY pattern
    """,
)
def events_sequence_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style sequential pattern classification of each
    user's ONBOARDING journey: the first {_JOURNEY_CAP} events become a
    code string (one deterministic char per event — the five event types
    have unique initials), and a first-match-wins regex panel assigns
    every user a behavioral class (instant buyer / research-then-buy /
    error recovery / churned after error / window shopper). Row-pattern
    matching is the one sequence operator SQL engines bolt on as special
    syntax (MATCH_RECOGNIZE); over a bounded alphabet it is exactly
    regular-language matching, so the portable formulation IS a regex
    over the code string — the same panel runs unchanged on both
    engines, making an order-sensitive sequence operator hash-checkable.
    (The prefix is the right unit too: full-lifetime strings converge to
    "contains everything" — measured: 66-event mean journeys collapse
    the panel to 3 classes; the 6-event prefix populates all 7.)

    Shape: ONE user-keyed window ranks events in time (ts, event_id —
    total order), the prefix filter keeps ≤{_JOURNEY_CAP} rows per user
    BEFORE the collect (a firehose user costs the window pass, never an
    unbounded string), array_sort makes collect order irrelevant, and
    the regex panel is a map-side CASE. The census is O(patterns); the
    events scan dominates at 100 TB."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    j = (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            "ts",
            "event_id",
            F.expr("substring(event_type, 1, 1)").alias("code"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= _JOURNEY_CAP)
        .groupBy("user_id")
        .agg(
            F.expr(
                "array_join(transform(array_sort(collect_list("
                "struct(rn, code))), x -> x.code), '')"
            ).alias("journey")
        )
    )
    case = " ".join(
        f"WHEN journey RLIKE '{rx}' THEN '{name}'" for name, rx in _JOURNEY_PATTERNS
    )
    census = (
        j.select(F.expr(f"CASE {case} ELSE 'other' END").alias("pattern"))
        .groupBy("pattern")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .localCheckpoint(eager=True)  # O(patterns) rows: the census feeds
        # both the share denominator and the output — one corpus scan total
    )
    n = census.agg(F.sum("n_users").alias("total"))
    return (
        census.crossJoin(n)  # 1-row scalar broadcast
        .select(
            "pattern",
            "n_users",
            F.expr(
                "CAST((2000000 * n_users + total) DIV (2 * total) AS BIGINT)"
            ).alias("share_e6"),
        )
        .orderBy("pattern")
    )


@query(
    "events_interarrival_dispersion",
    oracle="""
    WITH g AS (
        SELECT event_type,
               (epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts, event_id)) // 1000 AS gap_ms
        FROM events),
    m AS (
        SELECT event_type, count(*) AS n,
               sum(gap_ms)::HUGEINT AS sx,
               sum(gap_ms::HUGEINT * gap_ms) AS sxx
        FROM g WHERE gap_ms IS NOT NULL GROUP BY 1)
    SELECT event_type, CAST(n AS BIGINT) AS n_gaps,
           CAST((2 * sx + n) // (2 * n) AS BIGINT) AS mean_gap_ms,
           CASE WHEN sx = 0 THEN NULL ELSE
               CAST((2 * 1000000 * (n * sxx - sx * sx) + sx * sx)
                    // (2 * sx * sx) AS BIGINT) END AS cv2_e6
    FROM m ORDER BY event_type
    """,
)
def events_interarrival_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness diagnosis of each event stream: the squared coefficient
    of variation CV² = Var/Mean² of per-user interarrival gaps. CV² = 1
    is the memoryless (Poisson) baseline, < 1 means regular/heartbeat
    traffic, > 1 means bursty sessions — the number that decides whether
    rate limits, anomaly baselines, and capacity plans can assume
    exponential arrivals (events_anomaly_zscore's z-model quietly does).

    CV² is dimensionless and a pure rational of three distributive
    moments: (n·Σx² − (Σx)²)/(Σx)², folded in ONE pass over the gaps.
    Gaps are exact integers (epoch-microseconds differenced per
    (user, type) — both engines' µs renderings of the same parquet
    values — floor-divided to ms, keeping n·Σx² inside DECIMAL(38,0)/
    HUGEINT at 30×), and the readout is the round-half-up e6 DIV.
    Shape: one (user_id, event_type)-keyed window — the stream's
    natural partitioning — then an O(types) moment fold; degenerate
    streams (all-zero gaps) yield NULL on both engines."""
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    g = (
        load(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr("unix_micros(ts)").alias("us"),
            F.lag(F.expr("unix_micros(ts)")).over(w).alias("prev_us"),
        )
        .filter(F.col("prev_us").isNotNull())
        .select("event_type", F.expr("(us - prev_us) DIV 1000").alias("gap_ms"))
    )
    m = g.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("CAST(gap_ms AS DECIMAL(38,0))")).alias("sx"),
        F.sum(F.expr("CAST(gap_ms AS DECIMAL(38,0)) * gap_ms")).alias("sxx"),
    )
    return m.select(
        "event_type",
        F.col("n").cast("long").alias("n_gaps"),
        F.expr("CAST((2 * sx + n) DIV (2 * n) AS BIGINT)").alias("mean_gap_ms"),
        F.expr(
            """CASE WHEN sx = 0 THEN NULL ELSE
               CAST((2 * 1000000 * (n * sxx - sx * sx) + sx * sx)
                    DIV (2 * sx * sx) AS BIGINT) END"""
        ).alias("cv2_e6"),
    ).orderBy("event_type")


_WM_THRESHOLDS_S = (0, 60, 300, 3600)
_WM_BUCKETS = 32
_WM_MAX_DELAY_S = 7200  # simulated upload delay range [0, 2h)


@query(
    "stream_watermark_audit",
    oracle=f"""
    WITH arr AS (
        SELECT event_id, epoch_us(ts) AS us,
               epoch_us(ts)
               + (('0x' || substr(md5('wm:' || event_id), 1, 15))::BIGINT
                  % {_WM_MAX_DELAY_S}) * 1000000 AS arrival_us
        FROM events),
    lag AS (
        SELECT greatest(0, coalesce(
                   max(us) OVER (ORDER BY arrival_us, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING) - us, 0))
                   AS lateness_us
        FROM arr),
    n AS (SELECT count(*) AS total FROM lag),
    t AS (SELECT unnest([{', '.join(str(t) for t in _WM_THRESHOLDS_S)}])
              AS threshold_s)
    SELECT t.threshold_s,
           CAST(sum(CASE WHEN lateness_us > t.threshold_s::BIGINT * 1000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
           CAST((2000000 * sum(CASE WHEN lateness_us > t.threshold_s::BIGINT
                                         * 1000000
                                    THEN 1 ELSE 0 END) + total)
                // (2 * total) AS BIGINT) AS drop_share_e6
    FROM lag, t, n
    GROUP BY t.threshold_s, total ORDER BY t.threshold_s
    """,
)
def stream_watermark_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-tuning audit: replay the stream in ARRIVAL order and
    count how many events each candidate watermark delay
    {_WM_THRESHOLDS_S}s would DROP (an event is late iff its event time
    is more than `delay` behind the max event time already arrived).
    This is the number you need BEFORE picking `withWatermark` on any of
    this repo's streaming operators: the delay that drops 0.1% is cheap
    state; the delay that drops 10% is a correctness bug in production.

    Arrival model: the synthetic log is PERFECTLY time-ordered (measured:
    0 late rows at every threshold — a vacuous census), so arrival =
    event time + a deterministic md5 upload delay in [0, {_WM_MAX_DELAY_S}s)
    — the buffering-mobile-client disorder model, reproducible on both
    engines, which makes the machinery and the census real. On a genuine
    out-of-order log, drop the simulated delay and keep the pipeline.

    The running "max event time arrived so far" is a GLOBAL exclusive
    prefix-max over arrival order — the window shape that cannot scale
    naively — so it uses window_global_prefix's decomposition, bucketed
    by ARRIVAL-TIME RANGE (pure arithmetic on arrival_us, order-
    consistent like the Gini value buckets): per-bucket exclusive
    prefix-max + ≤B collected bucket maxima as cross-bucket offsets.
    Lateness is exact integer µs; shares are e6 DIVs."""
    from ..cache import session_memo

    def _base() -> DataFrame:
        return (
            load(spark, sf_dir, "events")
            .select(
                "event_id",
                F.expr("unix_micros(ts)").alias("us"),
                F.expr(
                    "unix_micros(ts) + (conv(substring(md5(CAST("
                    f"concat('wm:', event_id) AS BINARY)), 1, 15), 16, 10) "
                    f"% {_WM_MAX_DELAY_S}) * 1000000L"
                ).alias("arrival_us"),
            )
            .localCheckpoint(eager=True)  # one corpus scan feeds all 3 jobs
        )

    base = session_memo(spark, sf_dir, "wm_arrival_replay", _base)
    lo, hi = base.agg(F.min("arrival_us"), F.max("arrival_us")).collect()[0]
    span = max(1, -(-(int(hi) - int(lo) + 1) // _WM_BUCKETS))
    bucketed = base.withColumn(
        "bucket", ((F.col("arrival_us") - int(lo)) / span).cast("long")
    )
    w = (
        W.partitionBy("bucket")
        .orderBy("arrival_us", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    local = bucketed.withColumn("local_prevmax", F.max("us").over(w))
    maxima = sorted(
        bucketed.groupBy("bucket").agg(F.max("us").alias("m")).collect(),
        key=lambda r: r["bucket"],
    )  # ≤ B rows — fixed driver state
    run, offsets = None, []
    for r in maxima:
        offsets.append((int(r["bucket"]), run))
        run = int(r["m"]) if run is None else max(run, int(r["m"]))
    off_df = spark.createDataFrame(offsets, "bucket long, off_max long")
    late = (
        local.join(F.broadcast(off_df), "bucket")
        .select(
            F.greatest(
                F.lit(0),
                F.coalesce(
                    F.greatest(
                        F.coalesce("local_prevmax", F.col("off_max")),
                        F.coalesce("off_max", F.col("local_prevmax")),
                    )
                    - F.col("us"),
                    F.lit(0),
                ),
            ).alias("lateness_us")
        )
        .localCheckpoint(eager=True)  # census reads it once per threshold set
    )
    n = late.agg(F.count(F.lit(1)).alias("total"))
    t = spark.createDataFrame(
        [(s,) for s in _WM_THRESHOLDS_S], "threshold_s long"
    )
    return (
        late.crossJoin(F.broadcast(t))
        .groupBy("threshold_s")
        .agg(
            F.sum(
                F.when(
                    F.col("lateness_us") > F.col("threshold_s") * 1_000_000, 1
                ).otherwise(0)
            ).alias("n_dropped")
        )
        .crossJoin(n)  # 1-row scalar broadcast
        .select(
            "threshold_s",
            F.col("n_dropped").cast("long").alias("n_dropped"),
            F.expr(
                "CAST((2000000 * n_dropped + total) DIV (2 * total) AS BIGINT)"
            ).alias("drop_share_e6"),
        )
        .orderBy("threshold_s")
    )


_SESSION_GAPS_S = (300, 1800, 7200)


@query(
    "events_session_gap_tuning",
    oracle=f"""
    WITH g AS (
        SELECT user_id,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        FROM events),
    n AS (SELECT count(*) AS n_events,
                 count(DISTINCT user_id) AS n_users FROM events),
    t AS (SELECT unnest([{', '.join(str(s) for s in _SESSION_GAPS_S)}])
              AS gap_s)
    SELECT t.gap_s,
           CAST(n_users + sum(CASE WHEN gap_us > t.gap_s::BIGINT * 1000000
                                   THEN 1 ELSE 0 END) AS BIGINT)
               AS n_sessions,
           CAST((2000000 * n_events
                 + (n_users + sum(CASE WHEN gap_us > t.gap_s::BIGINT * 1000000
                                       THEN 1 ELSE 0 END)))
                // (2 * (n_users
                         + sum(CASE WHEN gap_us > t.gap_s::BIGINT * 1000000
                               THEN 1 ELSE 0 END))) AS BIGINT)
               AS events_per_session_e6
    FROM g, t, n WHERE gap_us IS NOT NULL
    GROUP BY t.gap_s, n_users, n_events ORDER BY t.gap_s
    """,
)
def events_session_gap_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionizer SENSITIVITY census: how many sessions (and how many
    events per session) each candidate inactivity gap {_SESSION_GAPS_S}s
    produces — the parameter audit behind every 30-minute-gap convention
    (this repo's sessionize/session_stats included): if halving the gap
    doubles the session count, the boundary is load-bearing and session
    metrics are fragile; if the census barely moves, the choice is safe.
    The identity doing the work: sessions = users + (inter-event gaps
    exceeding g) — so ONE user-keyed window pass computing each user's
    gaps prices EVERY candidate simultaneously; no per-candidate
    re-sessionization, no second corpus scan. Gaps are exact integer µs
    (the engines' µs renderings of the same parquet values); the
    events-per-session readout is the e6 DIV."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    g = (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            (
                F.expr("unix_micros(ts)")
                - F.lag(F.expr("unix_micros(ts)")).over(w)
            ).alias("gap_us"),
        )
        .localCheckpoint(eager=True)  # O(corpus) gaps: totals + census
    )
    n = g.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("gap_us").alias("n_gaps"),
    )
    # n_events = rows; n_users = rows − gaps (each user has one null gap)
    t = spark.createDataFrame([(s,) for s in _SESSION_GAPS_S], "gap_s long")
    return (
        g.filter(F.col("gap_us").isNotNull())
        .crossJoin(F.broadcast(t))
        .groupBy("gap_s")
        .agg(
            F.sum(
                F.when(F.col("gap_us") > F.col("gap_s") * 1_000_000, 1).otherwise(0)
            ).alias("n_breaks")
        )
        .crossJoin(n)  # 1-row scalar broadcast
        .select(
            "gap_s",
            (F.col("n_rows") - F.col("n_gaps") + F.col("n_breaks"))
            .cast("long")
            .alias("n_sessions"),
            F.expr(
                """CAST((2000000 * n_rows + (n_rows - n_gaps + n_breaks))
                       DIV (2 * (n_rows - n_gaps + n_breaks)) AS BIGINT)"""
            ).alias("events_per_session_e6"),
        )
        .orderBy("gap_s")
    )


@query(
    "events_cooccurrence_lift",
    oracle="""
    WITH s AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS brk
        FROM events),
    s2 AS (SELECT user_id, event_type,
                  sum(brk) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS sid
           FROM s),
    st AS (SELECT DISTINCT user_id, sid, event_type FROM s2),
    n AS (SELECT count(DISTINCT (user_id, sid)) AS n_sessions FROM st),
    per AS (SELECT event_type, count(*) AS n_t FROM st GROUP BY 1),
    ab AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               count(*) AS n_ab
        FROM st a JOIN st b
          ON a.user_id = b.user_id AND a.sid = b.sid
         AND a.event_type < b.event_type
        GROUP BY 1, 2)
    SELECT ab.type_a, ab.type_b, CAST(ab.n_ab AS BIGINT) AS n_ab,
           CAST((2000000 * ab.n_ab::HUGEINT * n_sessions
                 + pa.n_t::HUGEINT * pb.n_t)
                // (2 * pa.n_t::HUGEINT * pb.n_t) AS BIGINT) AS lift_e6
    FROM ab JOIN per pa ON pa.event_type = ab.type_a
            JOIN per pb ON pb.event_type = ab.type_b, n
    ORDER BY ab.type_a, ab.type_b
    """,
)
def events_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session market-basket lift between event types — "which behaviors
    happen TOGETHER in a session": lift(a,b) = P(a,b)/(P(a)·P(b)) over
    sessions, the SET-co-occurrence complement to the transition
    matrix's SEQUENCE view (errors may rarely *precede* purchases yet
    strongly co-occur with them — only lift sees that). Lift > 1e6
    (e6 units) is attraction, < 1e6 is repulsion; this is the same
    statistic text_collocations_pmi monotonically ranks for bigrams,
    here on the behavioral alphabet.

    Shape: the 30-min-gap sessionizer (the repo's standard convention)
    is one user-keyed window; sessions reduce to DISTINCT (session,
    type) rows — ≤ types per session regardless of event volume — so
    the pair join explodes each session to at most C(types,2) = 10
    rows; counts and margins are partial-merged; lift reads out as the
    exact e6 DIV in HUGEINT/DECIMAL (n_ab·n_sessions passes 10¹⁸ near
    10⁹ sessions — the headroom rule)."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    brk = (
        F.when(
            (F.expr("unix_micros(ts)") - F.lag(F.expr("unix_micros(ts)")).over(w))
            > 1800 * 1_000_000,
            1,
        ).otherwise(0)
    )
    st = (
        load(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type", brk.alias("brk"))
        .withColumn(
            "sid",
            F.sum("brk").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
        )
        .select("user_id", "sid", "event_type")
        .distinct()
        .localCheckpoint(eager=True)  # ≤ sessions×types rows, 4 consumers
    )
    n = st.select("user_id", "sid").distinct().agg(
        F.count(F.lit(1)).alias("n_sessions")
    )
    per = st.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_t"))
    a = st.select("user_id", "sid", F.col("event_type").alias("type_a"))
    b = st.select("user_id", "sid", F.col("event_type").alias("type_b"))
    ab = (
        a.join(b, ["user_id", "sid"])
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    return (
        ab.join(
            per.withColumnRenamed("event_type", "type_a").withColumnRenamed(
                "n_t", "na"
            ),
            "type_a",
        )
        .join(
            per.withColumnRenamed("event_type", "type_b").withColumnRenamed(
                "n_t", "nb"
            ),
            "type_b",
        )
        .crossJoin(n)  # 1-row scalar broadcast
        .select(
            "type_a",
            "type_b",
            F.col("n_ab").cast("long").alias("n_ab"),
            F.expr(
                """CAST((2000000 * CAST(n_ab AS DECIMAL(38,0)) * n_sessions
                        + CAST(na AS DECIMAL(38,0)) * nb)
                       DIV (2 * CAST(na AS DECIMAL(38,0)) * nb) AS BIGINT)"""
            ).alias("lift_e6"),
        )
        .orderBy("type_a", "type_b")
    )


# ---------------------------------------------------------------------------
# Markov removal-effect attribution (round 7): the model-based attribution
# that answers "what fraction of conversions does channel c CAUSE" —
# first/last/linear-touch's principled sibling (Anderl et al. 2014)
# ---------------------------------------------------------------------------

MARKOV_CHANNELS = ("click", "error", "signup", "view")
MARKOV_ROUNDS = 12
_MK_E6 = 1_000_000


def _markov_base_ctes() -> str:
    """Journey -> transition-count CTEs shared by every scenario: per user,
    events ordered by (ts, event_id) and truncated at the FIRST purchase
    (the absorbing CONV state); journeys without a purchase absorb in
    NULL. Unique ordering key => identical counts on both engines."""
    return f"""
    seq AS (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events),
    cut AS (SELECT user_id, min(rn) AS prn FROM seq
            WHERE event_type = 'purchase' GROUP BY user_id),
    kept AS (
        SELECT s.user_id, s.event_type, s.rn
        FROM seq s LEFT JOIN cut c USING (user_id)
        WHERE c.prn IS NULL OR s.rn <= c.prn),
    edges AS (
        SELECT coalesce(lag(event_type) OVER (PARTITION BY user_id ORDER BY rn),
                        'START') AS src,
               CASE WHEN event_type = 'purchase' THEN 'CONV'
                    ELSE event_type END AS dst
        FROM kept
        UNION ALL
        SELECT event_type AS src, 'NULL' AS dst
        FROM (SELECT user_id, event_type,
                     row_number() OVER (PARTITION BY user_id ORDER BY rn DESC) AS rrn
              FROM kept)
        WHERE rrn = 1 AND event_type <> 'purchase'),
    counts AS MATERIALIZED (SELECT src, dst, count(*) AS n
                            FROM edges GROUP BY src, dst),
    tot AS MATERIALIZED (SELECT src, sum(n) AS tot FROM counts GROUP BY src)"""


def _markov_oracle() -> str:
    ctes = [_markov_base_ctes().strip()]
    for scen in ("full",) + MARKOV_CHANNELS:
        removed = "" if scen == "full" else scen
        excl = f"WHERE src <> '{removed}'" if removed else ""
        ctes.append(
            f"p_{scen}_0 AS MATERIALIZED (SELECT src AS s, CAST(0 AS BIGINT) AS v "
            f"FROM tot {excl})"
        )
        cexcl = f"WHERE c.src <> '{removed}'" if removed else ""
        for r in range(1, MARKOV_ROUNDS + 1):
            ctes.append(
                f"""p_{scen}_{r} AS MATERIALIZED (
                SELECT c.src AS s,
                       CAST(sum(c.n * (CASE WHEN c.dst = 'CONV' THEN {_MK_E6}
                                            WHEN c.dst = 'NULL' THEN 0
                                            ELSE coalesce(p.v, 0) END))
                            // any_value(t.tot) AS BIGINT) AS v
                FROM counts c JOIN tot t ON t.src = c.src
                LEFT JOIN p_{scen}_{r - 1} p ON p.s = c.dst
                {cexcl}
                GROUP BY c.src)"""
            )
    k = MARKOV_ROUNDS
    arms = "\n    UNION ALL ".join(
        f"SELECT '{ch}' AS channel, "
        f"(SELECT v FROM p_full_{k} WHERE s = 'START') AS full_conv_e6, "
        f"(SELECT v FROM p_{ch}_{k} WHERE s = 'START') AS removal_conv_e6"
        for ch in MARKOV_CHANNELS
    )
    return f"""
    WITH {', '.join(ctes)}
    SELECT channel, full_conv_e6, removal_conv_e6,
           CAST(CASE WHEN full_conv_e6 = 0 THEN 0
                     ELSE {_MK_E6} - (removal_conv_e6 * {_MK_E6}) // full_conv_e6
                END AS BIGINT) AS removal_effect_e6
    FROM ({arms})
    ORDER BY channel
    """


@query("events_attribution_markov", oracle=_markov_oracle())
def events_attribution_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-chain REMOVAL-EFFECT attribution: model user journeys as a
    first-order chain over channel states absorbing in CONV (first
    purchase) or NULL (journey ends unconverted); a channel's credit is
    how much the START->CONV absorption probability DROPS when every
    transition into that channel is redirected to NULL — the causal
    counterfactual that position rules (first/last/linear touch,
    events_attribution*) cannot express.

    Exactness: absorption probabilities come from {MARKOV_ROUNDS} rounds
    of value iteration on the e6 integer lattice with floor division —
    the HITS/pagerank discipline — so both engines produce bit-identical
    fixed points; every output cell is bigint.

    Scale shape: the DISTRIBUTED work is exactly two user-keyed window
    passes + one (src, dst) count rollup — one corpus shuffle; the chain
    itself is O(channels²) counts (≤36 cells at ANY corpus size), so the
    5-scenario value iteration runs driver-side on collected guard-stat
    rows, and the oracle unrolls the identical integer iteration in SQL.
    At 100 TB the transition matrix is still 36 longs — this is the
    textbook case for aggregate-then-iterate-small."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("rn", F.row_number().over(w))
    prn = (
        seq.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("rn").alias("prn"))
    )
    kept = seq.join(prn, "user_id", "left").filter(
        F.col("prn").isNull() | (F.col("rn") <= F.col("prn"))
    )
    wk = W.partitionBy("user_id").orderBy("rn")
    main = kept.select(
        F.coalesce(F.lag("event_type").over(wk), F.lit("START")).alias("src"),
        F.when(F.col("event_type") == "purchase", F.lit("CONV"))
        .otherwise(F.col("event_type"))
        .alias("dst"),
    )
    last = (
        kept.withColumn(
            "rrn", F.row_number().over(W.partitionBy("user_id").orderBy(F.col("rn").desc()))
        )
        .filter((F.col("rrn") == 1) & (F.col("event_type") != "purchase"))
        .select(F.col("event_type").alias("src"), F.lit("NULL").alias("dst"))
    )
    rows = (
        main.unionByName(last)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    n = {(r["src"], r["dst"]): r["n"] for r in rows}
    tot = {}
    for (s, _t), c in n.items():
        tot[s] = tot.get(s, 0) + c

    def absorb(removed: str | None) -> int:
        trans = [s for s in tot if s != removed]
        p = {s: 0 for s in trans}
        for _ in range(MARKOV_ROUNDS):
            new = {}
            for s in trans:
                acc = 0
                for (src, dst), c in n.items():
                    if src != s:
                        continue
                    if dst == "CONV":
                        acc += c * _MK_E6
                    elif dst == "NULL":
                        pass
                    else:
                        acc += c * p.get(dst, 0)
                new[s] = acc // tot[s]
            p = new
        return p.get("START", 0)

    full = absorb(None)
    out = []
    for ch in sorted(MARKOV_CHANNELS):
        rem = absorb(ch)
        eff = 0 if full == 0 else _MK_E6 - (rem * _MK_E6) // full
        out.append((ch, full, rem, eff))
    return spark.createDataFrame(
        out,
        "channel string, full_conv_e6 long, removal_conv_e6 long, removal_effect_e6 long",
    ).orderBy("channel")


# ---------------------------------------------------------------------------
# Growth accounting (round 7): the new/retained/resurrected/churned user
# ledger — the standard growth decomposition (a16z-style) that retention
# cohorts and DAU/MAU do not express
# ---------------------------------------------------------------------------


@query(
    "events_growth_accounting",
    oracle="""
    WITH active AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    marked AS (
        SELECT user_id, day,
               lag(day) OVER (PARTITION BY user_id ORDER BY day) AS prev_day
        FROM active),
    classified AS (
        SELECT day,
               CASE WHEN prev_day IS NULL THEN 'new'
                    WHEN date_diff('day', prev_day, day) = 1 THEN 'retained'
                    ELSE 'resurrected' END AS state
        FROM marked),
    churn AS (
        SELECT day + INTERVAL 1 DAY AS day, 'churned' AS state
        FROM (SELECT user_id, day,
                     lead(day) OVER (PARTITION BY user_id ORDER BY day) AS next_day,
                     max(day) OVER () AS last_day
              FROM active)
        WHERE (next_day IS NULL OR date_diff('day', day, next_day) > 1)
          AND day < last_day),
    all_states AS (
        SELECT strftime(CAST(day AS DATE), '%Y-%m-%d') AS day, state
        FROM classified
        UNION ALL
        SELECT strftime(CAST(day AS DATE), '%Y-%m-%d') AS day, state FROM churn)
    SELECT day, state, count(*) AS n_users
    FROM all_states GROUP BY day, state ORDER BY day, state
    """,
)
def events_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily growth accounting: every active (user, day) classified as NEW
    (first day ever), RETAINED (also active yesterday), or RESURRECTED
    (returning after a gap), plus the CHURNED ledger (active on day d,
    not on d+1 — booked against d+1, the day the loss shows). The
    additivity identity growth teams audit — DAU(d) = new + retained +
    resurrected, DAU(d) - DAU(d-1) = new + resurrected - churned — falls
    out of the census; retention cohorts and DAU/MAU answer neither.

    Shape: ONE corpus scan — the distinct (user, day) projection is
    checkpointed (it is the active-pairs table, orders of magnitude
    smaller than raw events; production serves it from the standing
    daily rollup) and the classified/churn/last-day branches read the
    cached copy; one user-keyed window pass for lag/lead (the
    sessionizer's shuffle), then an O(days×4) census. ISO day strings +
    bigint counts (driver-proof policy). The corpus-wide max(day) guard
    keeps the final day from booking phantom churn (nobody can churn
    after the observation window ends)."""
    ev = load(spark, sf_dir, "events")
    active = (
        ev.select("user_id", F.to_date("ts").alias("day"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    w = W.partitionBy("user_id").orderBy("day")
    marked = active.withColumn("prev_day", F.lag("day").over(w)).withColumn(
        "next_day", F.lead("day").over(w)
    )
    last_day = active.agg(F.max("day").alias("last_day"))
    classified = marked.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.when(F.col("prev_day").isNull(), F.lit("new"))
        .when(F.datediff("day", "prev_day") == 1, F.lit("retained"))
        .otherwise(F.lit("resurrected"))
        .alias("state"),
    )
    churn = (
        marked.crossJoin(F.broadcast(last_day))
        .filter(
            (F.col("next_day").isNull() | (F.datediff("next_day", "day") > 1))
            & (F.col("day") < F.col("last_day"))
        )
        .select(
            F.date_format(F.date_add("day", 1), "yyyy-MM-dd").alias("day"),
            F.lit("churned").alias("state"),
        )
    )
    return (
        classified.unionByName(churn)
        .groupBy("day", "state")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("day", "state")
    )


# Shapley attribution: channel index map and the 24x factorial weights
# s!(3-s)! for coalition size s (n=4 channels, denominator n!=24)
SHAP_CHANNELS = ("click", "view", "signup", "error")
SHAP_W24 = (6, 2, 2, 6)


def _shapley_oracle() -> str:
    ch_case = " ".join(
        f"WHEN '{c}' THEN {1 << i}" for i, c in enumerate(SHAP_CHANNELS)
    )
    arms = []
    for ci, c in enumerate(SHAP_CHANNELS):
        bit = 1 << ci
        terms = []
        for S in range(16):
            if S & bit:
                continue
            s_size = bin(S).count("1")
            terms.append(
                f"{SHAP_W24[s_size]} * ((SELECT v FROM v WHERE s = {S | bit})"
                f" - (SELECT v FROM v WHERE s = {S}))"
            )
        arms.append(
            f"SELECT '{c}' AS channel, CAST({' + '.join(terms)} AS BIGINT) AS phi_e24"
        )
    return f"""
    WITH fp AS MATERIALIZED (
        SELECT user_id, min(epoch_us(ts)) AS fp_us
        FROM events WHERE event_type = 'purchase' GROUP BY user_id),
    masks AS MATERIALIZED (
        SELECT fp.user_id,
               coalesce(bit_or(CASE e.event_type {ch_case} ELSE 0 END), 0) AS mask
        FROM fp LEFT JOIN events e
          ON e.user_id = fp.user_id AND epoch_us(e.ts) < fp.fp_us
             AND e.event_type <> 'purchase'
        GROUP BY fp.user_id),
    cnt AS MATERIALIZED (
        SELECT mask, count(*) AS n FROM masks WHERE mask <> 0 GROUP BY mask),
    v AS MATERIALIZED (
        SELECT t.s AS s, coalesce(sum(c.n), 0) AS v
        FROM range(16) t(s) LEFT JOIN cnt c ON (c.mask & t.s) = c.mask
        GROUP BY t.s)
    SELECT channel, phi_e24 FROM ({" UNION ALL ".join(arms)}) ORDER BY channel
    """


@query("events_attribution_shapley", oracle=_shapley_oracle())
def events_attribution_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHAPLEY-VALUE channel attribution — the fourth attribution model
    beside last-touch, linear, and Markov removal (Shapley 1953; the
    data-driven marketing formulation of Zhao et al. 2018): the
    coalition game is v(S) = number of converters whose pre-first-
    purchase channel set is a non-empty subset of S, and each channel's
    credit is its exact Shapley value. With n = 4 channels the weights
    s!(n−1−s)!/n! have common denominator 24, so φ·24 is a pure BIGINT
    (no float anywhere) and the efficiency axiom Σφ = v(full) − v(∅)
    holds exactly on the lattice. Channel sets compare at MICROsecond
    grain (epoch_us on both engines — the events table's nanos fold
    identically).

    Scale shape: per-user masks are one bit_or aggregate after an
    equi-join against the first-purchase table (user-keyed shuffles,
    O(events)); everything after runs on the 15-row mask census — the
    2^n subset enumeration (the thing that makes exact Shapley
    intractable) happens on the CENSUS, not the corpus, so n caps the
    cost and the corpus never re-enters. Output: one φ·24 per channel."""
    ch_map = F.create_map(
        *[x for i, c in enumerate(SHAP_CHANNELS) for x in (F.lit(c), F.lit(1 << i))]
    )
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("us").alias("fp_us"))
    )
    masks = (
        fp.join(
            ev.filter(F.col("event_type") != "purchase").withColumnRenamed(
                "user_id", "uid"
            ),
            (F.col("uid") == F.col("user_id")) & (F.col("us") < F.col("fp_us")),
            "left",
        )
        .groupBy("user_id")
        .agg(
            F.coalesce(
                F.bit_or(ch_map[F.col("event_type")]), F.lit(0)
            ).alias("mask")
        )
    )
    cnt = (
        masks.filter(F.col("mask") != 0)
        .groupBy("mask")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    subsets = spark.range(16).select(F.col("id").cast("int").alias("s"))
    v = (
        subsets.join(
            F.broadcast(cnt),
            (F.col("mask").bitwiseAND(F.col("s"))) == F.col("mask"),
            "left",
        )
        .groupBy("s")
        .agg(F.coalesce(F.sum("n"), F.lit(0)).alias("v"))
        .localCheckpoint(eager=True)
    )
    rows = []
    for ci, c in enumerate(SHAP_CHANNELS):
        bit = 1 << ci
        for S in range(16):
            if S & bit:
                continue
            rows.append((c, S | bit, S, SHAP_W24[bin(S).count("1")]))
    terms = spark.createDataFrame(rows, "channel string, s_with int, s_without int, w24 long")
    v1 = v.select(F.col("s").alias("s_with"), F.col("v").alias("v_with"))
    v0 = v.select(F.col("s").alias("s_without"), F.col("v").alias("v_without"))
    return (
        terms.join(F.broadcast(v1), "s_with")
        .join(F.broadcast(v0), "s_without")
        .groupBy("channel")
        .agg(
            F.sum(F.col("w24") * (F.col("v_with") - F.col("v_without"))).alias(
                "phi_e24"
            )
        )
        .orderBy("channel")
    )
