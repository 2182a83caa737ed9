"""Scalar function pack (SURVEY.md §2.8).

The reference's entire scalar surface is TO_TIMESTAMP / datetime literals
(QueryOrchestration.cs:338, 345) and a path-string replace
(DataPreparationOrchestration.cs:107). The engine exposes the full
`pyspark.sql.functions` catalogue; the queries here are the representative
correctness subset (dates, strings, JSON, math/conditional, arrays) — each
one stays inside whole-stage codegen (no Python UDFs anywhere).

Oracle-alignment notes (DuckDB 1.0 vs Spark):
- DuckDB length()/year()/ceil() return BIGINT/BIGINT/DOUBLE where Spark
  returns INT/INT/BIGINT — oracles cast explicitly.
- Session TZ pinned UTC on the Spark side so timestamp math agrees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query


@query(
    "scalar_datetime",
    oracle="""
    SELECT event_id,
           CAST(year(ts) AS INTEGER)       AS y,
           CAST(month(ts) AS INTEGER)      AS mo,
           CAST(day(ts) AS INTEGER)        AS d,
           CAST(hour(ts) AS INTEGER)       AS h,
           CAST(minute(ts) AS INTEGER)     AS mi,
           CAST(date_trunc('day', ts) AS TIMESTAMP)  AS day_ts,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_ts,
           CAST(floor(epoch(date_trunc('second', ts))) AS BIGINT) AS epoch_s
    FROM events WHERE event_id < 500
    """,
)
def scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime extraction + truncation (F1/F2 generalized: TO_TIMESTAMP
    parity per QO:338 plus the extraction family)."""
    df = load(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    return df.select(
        "event_id",
        F.year("ts").alias("y"),
        F.month("ts").alias("mo"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.minute("ts").alias("mi"),
        F.date_trunc("day", F.col("ts")).alias("day_ts"),
        F.date_trunc("hour", F.col("ts")).alias("hour_ts"),
        F.unix_timestamp("ts").alias("epoch_s"),
    )


@query(
    "scalar_date_arith",
    oracle="""
    SELECT o_orderkey,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2001-01-01 00:00:00') AS INTEGER)
               AS days_to_ref,
           o_orderdate + INTERVAL 30 DAY  AS due_date,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month
    FROM orders WHERE o_orderkey < 1000
    """,
)
def scalar_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic: datediff, interval add, month bucketing."""
    df = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    return df.select(
        "o_orderkey",
        F.datediff(F.lit("2001-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_ref"
        ),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.date_trunc("month", F.col("o_orderdate")).alias("order_month"),
    )


@query(
    "scalar_strings",
    oracle="""
    SELECT c_custkey,
           upper(c_name)                                   AS uname,
           lower(c_mktsegment)                             AS lseg,
           CAST(length(c_name) AS INTEGER)                 AS name_len,
           substring(c_name, 1, 9)                         AS name_prefix,
           concat(c_name, '#', c_mktsegment)               AS tagged,
           replace(c_name, 'Customer', 'C')                AS short_name,
           trim(concat(' ', c_name, ' '))                  AS trimmed,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0')        AS padded_key,
           (c_mktsegment LIKE 'BUILD%')                    AS is_building,
           CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS name_num
    FROM customer
    """,
)
def scalar_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family incl. LIKE and regexp extraction (F3
    generalized: the reference's only string op is a replace, DP:107)."""
    df = load(spark, sf_dir, "customer")
    return df.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.lower("c_mktsegment").alias("lseg"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 9).alias("name_prefix"),
        F.concat(F.col("c_name"), F.lit("#"), F.col("c_mktsegment")).alias("tagged"),
        F.regexp_replace("c_name", "Customer", "C").alias("short_name"),
        F.trim(F.concat(F.lit(" "), F.col("c_name"), F.lit(" "))).alias("trimmed"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded_key"),
        F.col("c_mktsegment").like("BUILD%").alias("is_building"),
        F.regexp_extract("c_name", "([0-9]+)", 1).cast("long").alias("name_num"),
    )


@query(
    "scalar_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')                    AS k_str,
           CAST(json_extract_string(props, '$.k') AS INTEGER)   AS k_int
    FROM events WHERE event_id < 1000
    """,
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props payload column (schema-on-read
    over semi-structured data — beyond the reference's fixed 7 columns)."""
    df = load(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    return df.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("int").alias("k_int"),
    )


@query(
    "scalar_math_case",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 4)  AS net_price,
           CAST(ceil(l_quantity) AS BIGINT)              AS qty_ceil,
           CAST(floor(l_quantity) AS BIGINT)             AS qty_floor,
           abs(l_discount - 0.05)                        AS disc_dev,
           round(sqrt(l_extendedprice), 4)               AS price_sqrt,
           round(ln(l_extendedprice + 1), 4)             AS price_ln,
           round(pow(l_tax + 1, 2), 6)                   AS tax_sq,
           CASE WHEN l_discount > 0.05 THEN 'high'
                WHEN l_discount > 0.02 THEN 'mid'
                ELSE 'low' END                           AS disc_band
    FROM lineitem WHERE l_orderkey < 2000
    """,
)
def scalar_math_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math + CASE WHEN conditional family."""
    df = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    return df.select(
        "l_orderkey",
        "l_linenumber",
        # round to 4, not 2: the true product of two 2-decimal values has
        # ≤4 decimals, so no decimal-tie exists at the 4th place — Spark
        # (rounds decimal repr) and DuckDB (rounds binary) then agree.
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("net_price"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 4).alias("price_ln"),
        F.round(F.pow(F.col("l_tax") + 1, 2), 6).alias("tax_sq"),
        F.when(F.col("l_discount") > 0.05, "high")
        .when(F.col("l_discount") > 0.02, "mid")
        .otherwise("low")
        .alias("disc_band"),
    )


@query(
    "scalar_arrays",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER)  AS dim,
           embedding[1]                     AS first_val,
           list_max(embedding)              AS max_val,
           list_min(embedding)              AS min_val,
           round(list_sum(embedding::DOUBLE[]), 4) AS sum_val
    FROM embeddings
    """,
)
def scalar_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions over the embedding column: size / element_at /
    array_max / array_min / aggregate-fold — all JVM-side, no UDF."""
    from .vectors import as_double

    df = load(spark, sf_dir, "embeddings")
    return df.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).alias("first_val"),
        F.array_max("embedding").alias("max_val"),
        F.array_min("embedding").alias("min_val"),
        F.round(
            F.aggregate(as_double("embedding"), F.lit(0.0), lambda acc, x: acc + x), 4
        ).alias("sum_val"),
    )


@query(
    "scalar_maps",
    oracle="""
    SELECT event_id,
           m['type'][1] AS type_val,
           m['uid'][1]  AS uid_val,
           array_to_string(map_keys(m), ',') AS keys,
           CAST(cardinality(m) AS INTEGER)   AS n_keys
    FROM (SELECT event_id,
                 MAP(['type', 'uid'], [event_type, CAST(user_id AS VARCHAR)]) AS m
          FROM events)
    """,
)
def scalar_maps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + extraction (create_map / element_at / map_keys /
    size) — the schema-on-read key-value surface, all JVM expressions."""
    df = load(spark, sf_dir, "events").withColumn(
        "m",
        F.create_map(
            F.lit("type"), F.col("event_type"), F.lit("uid"), F.col("user_id").cast("string")
        ),
    )
    return df.select(
        "event_id",
        F.element_at("m", "type").alias("type_val"),
        F.element_at("m", "uid").alias("uid_val"),
        F.array_join(F.map_keys("m"), ",").alias("keys"),
        F.size("m").alias("n_keys"),
    )


# ---------------------------------------------------------------------------
# Extension surface (SURVEY.md §2.10): scalar pandas_udf
# ---------------------------------------------------------------------------


@query(
    "scalar_pandas_udf_norm",
    oracle=r"""
    SELECT doc_id,
           trim(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS norm_text,
           CAST(length(trim(lower(regexp_replace(text, '\s+', ' ', 'g'))))
                AS INTEGER) AS n_norm_chars
    FROM documents WHERE doc_id < 200
    """,
)
def scalar_pandas_udf_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar `pandas_udf` demonstration — the user extension contract from
    SURVEY.md §2.10: an Arrow-batched vectorized Python column function in
    a normal select, oracle-checked against the equivalent SQL expression.
    The normalization itself (lower + whitespace collapse + trim) could be
    pure built-ins — the point is proving the extension seam: batches cross
    to Python as Arrow arrays, pandas vectorized string ops process them,
    and the result column re-enters the JVM plan. Use this shape only for
    logic built-ins can't express; it breaks whole-stage codegen at the
    exchange boundary (the engine's hot paths stay UDF-free)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _norm(s):
        return s.str.lower().str.replace(r"\s+", " ", regex=True).str.strip()

    # annotations set as objects (not strings): this module's
    # `from __future__ import annotations` would stringify inline hints,
    # which pandas_udf's signature inspection rejects
    _norm.__annotations__ = {"s": pd.Series, "return": pd.Series}
    normalize_text = pandas_udf(_norm, "string")

    df = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return df.select(
        "doc_id",
        normalize_text(F.col("text")).alias("norm_text"),
        F.length(normalize_text(F.col("text"))).alias("n_norm_chars"),
    )


@query(
    "grouped_pandas_udf_wavg",
    oracle="""
    SELECT event_type,
           round(sum(value * user_id) / sum(user_id), 4) AS wavg_value
    FROM events GROUP BY event_type
    """,
)
def grouped_pandas_udf_wavg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG `pandas_udf` demonstration — the second half of the
    SURVEY §2.10 extension contract (scalar_pandas_udf_norm is the scalar
    half): a vectorized Python aggregate (numpy weighted mean) used inside
    a normal groupBy().agg(), oracle-checked against the equivalent SQL.
    Each group's columns arrive as pandas Series via Arrow; the aggregate
    runs once per group per partition and Spark merges nothing further —
    so unlike built-in aggs there is NO partial/merge decomposition, which
    is the real cost of this seam at 100 TB (skewed groups serialize).
    Use built-ins when they can express the math; this pins the seam."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _wavg(v, w):
        return round(float((v * w).sum() / w.sum()), 4)

    _wavg.__annotations__ = {"v": pd.Series, "w": pd.Series, "return": float}
    wavg = pandas_udf(_wavg, "double")

    df = load(spark, sf_dir, "events")
    return df.groupBy("event_type").agg(
        wavg(F.col("value"), F.col("user_id").cast("double")).alias("wavg_value")
    )


@query(
    "scalar_null_semantics",
    oracle="""
    WITH withnulls AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderstatus END AS status,
               CASE WHEN o_orderkey % 5 = 0 THEN NULL
                    ELSE round(o_totalprice, 2) END AS price
        FROM orders WHERE o_orderkey < 5000)
    SELECT o_orderkey,
           coalesce(status, 'UNKNOWN')                 AS status_filled,
           nullif(status, 'F')                          AS status_not_f,
           (status IS NOT DISTINCT FROM 'O')            AS is_open_nullsafe,
           (price IS NULL)                              AS price_missing,
           coalesce(price, 0.0)                         AS price_filled,
           CASE WHEN price IS NULL THEN 'missing'
                WHEN price > 150000 THEN 'high' ELSE 'normal' END AS price_band
    FROM withnulls
    """,
)
def scalar_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling surface: coalesce / nullif / null-safe equality
    (Spark's `<=>` ≙ ANSI IS NOT DISTINCT FROM) / IS NULL predicates /
    CASE with a NULL branch — the three-valued-logic corners every SQL
    migration trips on, exercised over deterministically injected nulls
    so both engines see identical missingness."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 5000)
    status = F.when(F.col("o_orderkey") % 7 == 0, F.lit(None)).otherwise(
        F.col("o_orderstatus")
    )
    price = F.when(F.col("o_orderkey") % 5 == 0, F.lit(None)).otherwise(
        F.round("o_totalprice", 2)
    )
    w = o.select("o_orderkey", status.alias("status"), price.alias("price"))
    return w.select(
        "o_orderkey",
        F.coalesce("status", F.lit("UNKNOWN")).alias("status_filled"),
        F.nullif("status", F.lit("F")).alias("status_not_f"),
        F.col("status").eqNullSafe("O").alias("is_open_nullsafe"),
        F.col("price").isNull().alias("price_missing"),
        F.coalesce("price", F.lit(0.0)).alias("price_filled"),
        F.when(F.col("price").isNull(), "missing")
        .when(F.col("price") > 150000, "high")
        .otherwise("normal")
        .alias("price_band"),
    )


@query(
    "scalar_decimal_money",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT)
             AS gross_cents,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(5,2))) * 10000 AS BIGINT)
             AS net_e4
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def scalar_decimal_money(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DECIMAL money arithmetic — the engine-parity counterpoint to
    every rounded double in this suite: cast prices to DECIMAL(18,2) at
    the scan, multiply/sum in decimal, and the totals are EXACT (no
    summation-order drift, no half-even tie traps — the properties
    integer cents buy, in the SQL type built for it).

    The DISPLAY is integer units (gross in cents, net in 10⁻⁴ dollars):
    the decimal sums are exact integers of their scale, so the unit
    conversion is lossless, and the output schema carries only BIGINT +
    STRING cells — no Decimal objects for any downstream consumer to
    canonicalize (a float64-converting fetch renders Decimal('1.50') as
    1.5; CORRECTNESS_r05 graded this query red while every local
    emulation passed, so the type surface is now driver-proof). Fits
    int64 to ~9×10¹⁴ dollars of net — beyond any corpus. Scale note:
    Spark decimal aggregation is whole-stage-codegen JVM arithmetic on
    unscaled longs (for ≤18-digit intermediates), so exactness is nearly
    free."""
    li = load(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    net_factor = (F.lit(1) - F.col("l_discount")).cast("decimal(5,2)")
    return (
        li.groupBy("l_returnflag")
        .agg(
            (F.sum(price) * 100).cast("long").alias("gross_cents"),
            (F.sum(price * net_factor) * 10000).cast("long").alias("net_e4"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "udtf_top_bigrams",
    oracle="""
    WITH big AS (
        SELECT doc_id,
               w[i] || ' ' || w[i+1] AS bigram
        FROM (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
             unnest(range(1, len(w))) AS t(i)
    ), counted AS (
        SELECT doc_id, bigram, count(*) AS n,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY count(*) DESC, bigram) AS rk
        FROM big GROUP BY doc_id, bigram
    )
    SELECT doc_id, bigram, CAST(n AS INT) AS n
    FROM counted WHERE rk <= 3
    ORDER BY doc_id, n DESC, bigram
    """,
)
def udtf_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function) — the third leg of the §2.10
    extension surface next to scalar pandas_udf and grouped
    applyInPandas: one input row expands to N output rows with arbitrary
    imperative logic (here: per-document top-3 bigrams via a Counter,
    deterministic count-desc/lexicographic tie-break), consumed through
    SQL LATERAL.

    This is the ROW-AT-A-TIME Python path — the documented slow lane,
    here as the extension-contract demo (the same result is expressible
    with explode+window built-ins, which is what the oracle does and
    what a hot path should use). Still distributed: the UDTF runs inside
    each task over its partition's rows; no state crosses rows, so the
    operator scales with input splits like any map-side op."""
    from pyspark.sql.functions import udtf

    from ..pkgship import ship_package

    # the UDTF class is function-local (cloudpickle serializes it by
    # value), but ship the package anyway: any by-reference closure over
    # package modules must import cleanly on workers from any CWD
    ship_package(spark)

    @udtf(returnType="doc_id: bigint, bigram: string, n: int")
    class TopBigrams:
        def eval(self, doc_id: int, text: str):
            from collections import Counter

            toks = text.strip().split(" ")
            counts = Counter(
                f"{toks[i]} {toks[i + 1]}" for i in range(len(toks) - 1)
            )
            for bg, n in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:3]:
                yield int(doc_id), bg, int(n)

    spark.udtf.register("top_bigrams", TopBigrams)
    from ..catalog import register_all

    register_all(spark, sf_dir)
    return spark.sql(
        """
        SELECT t.doc_id, t.bigram, t.n
        FROM documents, LATERAL top_bigrams(doc_id, text) t
        ORDER BY t.doc_id, t.n DESC, t.bigram
        """
    )


@query(
    "scalar_try_arithmetic",
    oracle="""
    SELECT o_orderkey,
           TRY_CAST(o_orderpriority AS BIGINT) AS prio_as_int,
           CAST(round(o_totalprice * 100) AS BIGINT)
               // nullif(o_orderkey % 5, 0) AS cents_per_bucket,
           CASE WHEN o_orderkey % 5 = 0 THEN NULL
                ELSE CAST(round(o_totalprice * 100) AS BIGINT)
                     % nullif(o_orderkey % 5, 0) END AS cents_mod,
           TRY_CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS prio_digit
    FROM orders
    WHERE o_orderkey <= 200
    ORDER BY o_orderkey
    """,
)
def scalar_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic pack (SURVEY §2.8 extension): TRY_CAST of a
    non-numeric string -> NULL instead of an exception, and NULL-safe
    integer division/modulo with a zero divisor — the ANSI error-handling
    semantics a production pipeline needs so one malformed row degrades
    to NULL instead of killing a 1000-executor stage. try_divide/try_mod
    express as nullif-guarded DIV/% so both engines agree exactly (Spark
    try_divide returns DOUBLE — the integer-lattice policy keeps the
    result bigint instead). All output cells bigint."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 200)
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    bucket = F.nullif(F.col("o_orderkey") % 5, F.lit(0))
    return o.select(
        "o_orderkey",
        F.expr("try_cast(o_orderpriority AS BIGINT)").alias("prio_as_int"),
        F.expr(
            "CAST(round(o_totalprice * 100) AS BIGINT)"
            " DIV nullif(o_orderkey % 5, 0)"
        ).alias("cents_per_bucket"),
        (cents % bucket).alias("cents_mod"),
        F.expr("try_cast(substring(o_orderpriority, 1, 1) AS BIGINT)").alias("prio_digit"),
    ).orderBy("o_orderkey")


@query(
    "scalar_inet",
    oracle="""
    WITH base AS (
        SELECT c_custkey,
               (c_custkey * 2654435761) % 4294967296 AS ip_u32,
               8 + (c_custkey % 17) AS prefix_len
        FROM customer WHERE c_custkey <= 500
    ), net AS (
        SELECT c_custkey, ip_u32, prefix_len,
               (1::BIGINT << (32 - prefix_len)) AS block,
               ip_u32 - (ip_u32 % (1::BIGINT << (32 - prefix_len))) AS net_u32
        FROM base
    ), dotted AS (
        SELECT *,
               ip_u32 // 16777216 AS o1, (ip_u32 // 65536) % 256 AS o2,
               (ip_u32 // 256) % 256 AS o3, ip_u32 % 256 AS o4
        FROM net
    )
    SELECT c_custkey,
           CAST(ip_u32 AS BIGINT) AS ip_u32,
           o1 || '.' || o2 || '.' || o3 || '.' || o4 AS ip,
           CAST(prefix_len AS BIGINT) AS prefix_len,
           (net_u32 // 16777216) || '.' || ((net_u32 // 65536) % 256) || '.'
               || ((net_u32 // 256) % 256) || '.' || (net_u32 % 256)
               || '/' || prefix_len AS cidr,
           CAST(net_u32 + block - 1 AS BIGINT) AS broadcast_u32,
           CAST(block - 2 AS BIGINT) AS n_hosts,
           CAST(CASE WHEN ip_u32 // 16777216 = 10 THEN 1 ELSE 0 END
                AS BIGINT) AS in_10_slash_8,
           CAST(CASE WHEN o1 * 16777216 + o2 * 65536 + o3 * 256 + o4
                          = ip_u32 THEN 1 ELSE 0 END AS BIGINT) AS roundtrip_ok
    FROM dotted ORDER BY c_custkey
    """,
)
def scalar_inet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 / CIDR function pack (the `inet` extension surface engines
    ship for log analytics): dotted-quad render, string->uint32 re-parse
    (round-trip asserted per row), CIDR network derivation by prefix
    length, broadcast address, usable-host count, and a /8 containment
    probe. IPs are synthesized deterministically from customer keys
    (Knuth multiplicative hash mod 2^32), so both engines derive the
    same addresses with exact BIGINT math — masks are `shiftleft(1,
    32-p)` blocks, never float pow, and every cell is BIGINT/STRING.

    Scale shape: row-local codegen expressions only — no shuffle, no
    UDF; at 100 TB this is a map-only pass whose cost is the scan.
    Reference analogue: none (function-pack extension, SURVEY §2.8)."""
    base = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 500)
        .select(
            "c_custkey",
            F.expr("(c_custkey * 2654435761) % 4294967296").alias("ip_u32"),
            F.expr("8 + (c_custkey % 17)").alias("prefix_len"),
        )
        .withColumn("block", F.expr("shiftleft(CAST(1 AS BIGINT), 32 - prefix_len)"))
        .withColumn("net_u32", F.expr("ip_u32 - (ip_u32 % block)"))
        .withColumn("o1", F.expr("ip_u32 DIV 16777216"))
        .withColumn("o2", F.expr("(ip_u32 DIV 65536) % 256"))
        .withColumn("o3", F.expr("(ip_u32 DIV 256) % 256"))
        .withColumn("o4", F.expr("ip_u32 % 256"))
        .withColumn("ip", F.expr("concat(o1, '.', o2, '.', o3, '.', o4)"))
    )
    reparsed = (
        F.expr("CAST(split(ip, '\\\\.')[0] AS BIGINT) * 16777216")
        + F.expr("CAST(split(ip, '\\\\.')[1] AS BIGINT) * 65536")
        + F.expr("CAST(split(ip, '\\\\.')[2] AS BIGINT) * 256")
        + F.expr("CAST(split(ip, '\\\\.')[3] AS BIGINT)")
    )
    return base.select(
        "c_custkey",
        F.col("ip_u32").cast("long").alias("ip_u32"),
        "ip",
        F.col("prefix_len").cast("long").alias("prefix_len"),
        F.expr(
            "concat(net_u32 DIV 16777216, '.', (net_u32 DIV 65536) % 256, '.',"
            " (net_u32 DIV 256) % 256, '.', net_u32 % 256, '/', prefix_len)"
        ).alias("cidr"),
        F.expr("CAST(net_u32 + block - 1 AS BIGINT)").alias("broadcast_u32"),
        F.expr("CAST(block - 2 AS BIGINT)").alias("n_hosts"),
        F.expr(
            "CAST(CASE WHEN ip_u32 DIV 16777216 = 10 THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("in_10_slash_8"),
        F.when(reparsed == F.col("ip_u32"), F.lit(1)).otherwise(F.lit(0)).cast("long").alias("roundtrip_ok"),
    ).orderBy("c_custkey")


GH_ALPHA = "0123456789bcdefghjkmnpqrstuvwxyz"  # geohash base32 (no a,i,l,o)


def _gh_interleave_sql(qlon: str, qlat: str) -> str:
    """DuckDB: interleave two 20-bit quantized coords into the 40-bit
    geohash code (lon takes the even bit positions from the MSB)."""
    return (
        f"list_reduce(list_transform(range(20), i -> "
        f"((({qlon} >> (19 - i)) & 1) * (1::BIGINT << CAST(39 - 2 * i AS INT))"
        f" + (({qlat} >> (19 - i)) & 1) * (1::BIGINT << CAST(38 - 2 * i AS INT)))"
        f"), (a, x) -> a + x)"
    )


def _gh_chars_sql(code: str) -> str:
    parts = " || ".join(
        f"substr('{GH_ALPHA}', CAST((({code} >> {35 - 5 * g}) & 31) + 1 AS INT), 1)"
        for g in range(8)
    )
    return f"({parts})"


@query(
    "scalar_geohash",
    oracle=f"""
    WITH pts AS (
        SELECT c_custkey AS id,
               ((c_custkey * 2654435761) % 180000000) - 90000000 AS lat_e6,
               ((c_custkey * 97654321) % 360000000) - 180000000 AS lon_e6
        FROM customer WHERE c_custkey <= 400),
    q AS (
        SELECT id, lat_e6, lon_e6,
               ((lat_e6 + 90000000) * 1048576) // 180000000 AS qlat,
               ((lon_e6 + 180000000) * 1048576) // 360000000 AS qlon
        FROM pts),
    c AS (SELECT *, {_gh_interleave_sql('qlon', 'qlat')} AS code FROM q),
    d AS (
        SELECT *,
               list_reduce(list_transform(range(20), i ->
                   ((code >> CAST(39 - 2 * i AS INT)) & 1)
                       * (1::BIGINT << CAST(19 - i AS INT))),
                   (a, x) -> a + x) AS qlon_rt,
               list_reduce(list_transform(range(20), i ->
                   ((code >> CAST(38 - 2 * i AS INT)) & 1)
                       * (1::BIGINT << CAST(19 - i AS INT))),
                   (a, x) -> a + x) AS qlat_rt
        FROM c)
    SELECT id, CAST(lat_e6 AS BIGINT) AS lat_e6, CAST(lon_e6 AS BIGINT) AS lon_e6,
           {_gh_chars_sql('code')} AS geohash8,
           substr({_gh_chars_sql('code')}, 1, 4) AS cell4,
           CAST(CASE WHEN qlon_rt = qlon AND qlat_rt = qlat
                THEN 1 ELSE 0 END AS BIGINT) AS rt_ok
    FROM d ORDER BY id
    """,
)
def scalar_geohash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GEOHASH encode (the Niemeyer base32 Z-order cell id every geo
    index keys on) in PURE integer codegen: quantize lat/lon
    microdegrees to 20-bit grid coordinates (integer DIV — no float
    degrees anywhere), interleave to the 40-bit Z-order code with a
    fold over shiftleft/shiftright (lon takes even bit positions from
    the MSB, per the public geohash spec), then map 5-bit groups
    through the base32 alphabet. `rt_ok` proves the DECODE inverse per
    row (de-interleave returns the exact quantized coords), and
    `cell4` is the prefix every proximity bucketing groups by — the
    geohash twin of join_spatial_grid's cell key. Coordinates derive
    from customer keys via the same Knuth hash as scalar_inet, so both
    engines synthesize identical points; every cell is BIGINT/STRING.

    Scale shape: row-local expressions only (a fold over a 20-element
    sequence inside whole-stage codegen) — map-only at 100 TB.
    Reference analogue: none (function-pack extension, SURVEY §2.8)."""
    pts = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 400)
        .select(
            F.col("c_custkey").alias("id"),
            F.expr("((c_custkey * 2654435761) % 180000000) - 90000000").alias("lat_e6"),
            F.expr("((c_custkey * 97654321) % 360000000) - 180000000").alias("lon_e6"),
        )
        .withColumn("qlat", F.expr("((lat_e6 + 90000000) * 1048576) DIV 180000000"))
        .withColumn("qlon", F.expr("((lon_e6 + 180000000) * 1048576) DIV 360000000"))
        .withColumn(
            "code",
            F.expr(
                "aggregate(sequence(0, 19), CAST(0 AS BIGINT), (a, i) -> a"
                " + shiftleft(shiftright(qlon, 19 - i) & 1, 39 - 2 * i)"
                " + shiftleft(shiftright(qlat, 19 - i) & 1, 38 - 2 * i))"
            ),
        )
        .withColumn(
            "qlon_rt",
            F.expr(
                "aggregate(sequence(0, 19), CAST(0 AS BIGINT), (a, i) -> a"
                " + shiftleft(shiftright(code, 39 - 2 * i) & 1, 19 - i))"
            ),
        )
        .withColumn(
            "qlat_rt",
            F.expr(
                "aggregate(sequence(0, 19), CAST(0 AS BIGINT), (a, i) -> a"
                " + shiftleft(shiftright(code, 38 - 2 * i) & 1, 19 - i))"
            ),
        )
    )
    ch = F.concat(
        *[
            F.expr(
                f"substr('{GH_ALPHA}', CAST((shiftright(code, {35 - 5 * g}) & 31)"
                f" + 1 AS INT), 1)"
            )
            for g in range(8)
        ]
    )
    return pts.select(
        "id",
        "lat_e6",
        "lon_e6",
        ch.alias("geohash8"),
        F.substring(ch, 1, 4).alias("cell4"),
        F.when(
            (F.col("qlon_rt") == F.col("qlon")) & (F.col("qlat_rt") == F.col("qlat")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("rt_ok"),
    ).orderBy("id")
