"""Core relational query inventory (SURVEY.md §2.2–§2.9) over the test tables.

Every operator class the reference exercises — projections/casts/filters,
dimension joins, group-by aggregates, quantile/IQR fences, histograms,
top-k, argmax, summary stats, error metrics, label maps, set ops — plus the
idiomatic-Spark upgrades (windows, rollup, pivot, sessionization, as-of
join) re-expressed over the synthetic star schema:

    events     <- plays the trip stream   (reference trips fact table)
    customer   <- plays the zone lookup   (reference taxi_zone_lookup.csv)
    lineitem/part/supplier/orders/...     (classic fact/dim shapes)

Each query is written Spark-DataFrame-first with an ANSI-SQL oracle twin;
determinism rules documented in ``registry.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nyc_yellow_taxi_trip_data_pipeline_spark.functions.scalar import (
    day_name,
    guarded_div,
    is_weekend,
    is_weekend_friday_saturday,
    label_map,
    time_of_day_dashboard,
    time_of_day_etl,
)
from nyc_yellow_taxi_trip_data_pipeline_spark.plans.helpers import (
    SQL_SPARK_DOW,
    SQL_TIMEOFDAY_DASH,
    SQL_TIMEOFDAY_ETL,
    SQL_UNIX_TS,
    qavg,
    qsum,
    sql_qavg,
    sql_qsum,
)
from nyc_yellow_taxi_trip_data_pipeline_spark.plans.registry import register
from nyc_yellow_taxi_trip_data_pipeline_spark.sources.io import read_table


# ---------------------------------------------------------------------------
# q01 — pricing summary (TPC-H Q1 shape): group-by + multi-agg
# Reference parity: A1/A2/A3/A6/A9 (1_EDA_Dashboard.py:46-49,189-192).
# ---------------------------------------------------------------------------
@register(
    "q01_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {sql_qsum('l_quantity')} AS sum_qty,
           {sql_qsum('l_extendedprice')} AS sum_base_price,
           {sql_qsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {sql_qavg('l_quantity')} AS avg_qty,
           {sql_qavg('l_extendedprice')} AS avg_price,
           {sql_qavg('l_discount', 1000000)} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    description="Group-by with 7 aggregates (sums/means/count) — the canonical "
    "wide hash-aggregate; map-side partial agg + AQE-coalesced shuffle.",
    tags=("agg", "groupby"),
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        qsum(F.col("l_quantity")).alias("sum_qty"),
        qsum(F.col("l_extendedprice")).alias("sum_base_price"),
        qsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
        qavg(F.col("l_quantity")).alias("avg_qty"),
        qavg(F.col("l_extendedprice")).alias("avg_price"),
        qavg(F.col("l_discount"), 1000000).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


# ---------------------------------------------------------------------------
# q02 — the clean/feature projection (the reference's whole ETL stage,
# sparkConsumer.py:84-96, as ONE codegen'd Project over events):
# casts (P4), json parse (F12), hour/day extraction (F3-F5), day names (F6),
# both time-of-day bucketings (U1/U2 as CASE), both weekend conventions
# (§2.12.1), guarded division (F7), ISO formatting (F11), unix seconds (F2).
# ---------------------------------------------------------------------------
@register(
    "q02_clean_features",
    f"""
    SELECT event_id, ts, event_type, value,
           CAST(hour(ts) AS INTEGER) AS event_hour,
           {SQL_SPARK_DOW.format(ts='ts')} AS event_day,
           dayname(ts) AS event_day_name,
           {SQL_TIMEOFDAY_ETL.format(h='hour(ts)')} AS timeofday_etl,
           {SQL_TIMEOFDAY_DASH.format(h='hour(ts)')} AS timeofday_dash,
           (dayofweek(ts) + 1) IN (6, 7) AS is_weekend_ref,
           (dayofweek(ts) + 1) IN (1, 7) AS is_weekend,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
           CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) = 0
                THEN 0.0
                ELSE value / CAST(json_extract_string(props, '$.k') AS INTEGER)
           END AS value_per_k,
           strftime(ts, '%Y-%m-%dT%H:%M:%S') AS ts_iso,
           {SQL_UNIX_TS.format(ts='ts')} AS unix_s
    FROM events
    """,
    description="Full ETL clean/feature stage as a single native projection — "
    "no Python UDF, whole-stage-codegen end to end.",
    tags=("transform", "projection"),
)
def q02_clean_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    hour = F.hour("ts")
    dow = F.dayofweek("ts")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.select(
        "event_id",
        "ts",
        "event_type",
        "value",
        hour.cast("int").alias("event_hour"),
        dow.cast("int").alias("event_day"),
        day_name(F.col("ts")).alias("event_day_name"),
        time_of_day_etl(hour).alias("timeofday_etl"),
        time_of_day_dashboard(hour).alias("timeofday_dash"),
        is_weekend_friday_saturday(dow).alias("is_weekend_ref"),
        is_weekend(dow).alias("is_weekend"),
        k.alias("k"),
        guarded_div(F.col("value"), k).alias("value_per_k"),
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss").alias("ts_iso"),
        F.unix_timestamp("ts").alias("unix_s"),
    )


# ---------------------------------------------------------------------------
# q03 — filters: equality conjunction + inequality (P6/P7,
# sparkConsumer.py:97; 1_EDA_Dashboard.py:39) then group count.
# ---------------------------------------------------------------------------
@register(
    "q03_filter_group_count",
    """
    SELECT user_id, COUNT(*) AS n_purchases
    FROM events
    WHERE event_type = 'purchase' AND value <> 0
    GROUP BY user_id
    """,
    description="Predicate conjunction pushed to the parquet scan, then "
    "group-by count (value_counts shape).",
    tags=("filter", "groupby"),
)
def q03_filter_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.filter((F.col("event_type") == "purchase") & (F.col("value") != 0))
        .groupBy("user_id")
        .agg(F.count("*").alias("n_purchases"))
    )


# ---------------------------------------------------------------------------
# q04 — per-column null-count report (P13, notebook cells 8/15/16).
# ---------------------------------------------------------------------------
@register(
    "q04_null_counts",
    """
    SELECT CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_orderkey,
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_custkey,
           CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_totalprice,
           CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_orderdate,
           COUNT(*) AS n_rows
    FROM orders
    """,
    description="Data-quality null audit: one pass, conditional sums.",
    tags=("quality",),
)
def q04_null_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    def nullcount(c: str):
        return F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c.split('_', 1)[1]}")
    return o.agg(
        nullcount("o_orderkey"),
        nullcount("o_custkey"),
        nullcount("o_totalprice"),
        nullcount("o_orderdate"),
        F.count("*").alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# q05 — the flagship: fact ⋈ two broadcast dims -> route concat -> top-10
# (the reference dashboard's double zone join + 'A to B' routes + head(10),
# 1_EDA_Dashboard.py:29-31,258-259).
# ---------------------------------------------------------------------------
@register(
    "q05_route_topk",
    """
    SELECT p.p_brand || ' to ' || s.s_name AS route, COUNT(*) AS n_trips
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY 1
    ORDER BY n_trips DESC, route
    LIMIT 10
    """,
    description="Fact table joined to two small dimensions (broadcast-hash, "
    "no shuffle on the fact side), string route concat, deterministic top-10.",
    tags=("join", "topk", "flagship"),
)
def q05_route_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    supp = read_table(spark, sf_dir, "supplier")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .select(F.concat("p_brand", F.lit(" to "), "s_name").alias("route"))
        .groupBy("route")
        .agg(F.count("*").alias("n_trips"))
        .orderBy(F.desc("n_trips"), F.asc("route"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q06 — left equi-join with unmatched keys (J1 null path) + label coalesce.
# ---------------------------------------------------------------------------
@register(
    "q06_left_join_dim",
    """
    SELECT COALESCE(c.c_name, 'Unknown') AS customer_name,
           COALESCE(c.c_mktsegment, 'N/A') AS segment,
           COUNT(*) AS n_events
    FROM events e
    LEFT JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
    description="Left broadcast join; unmatched foreign keys surface the "
    "null path and are coalesced to a sentinel label.",
    tags=("join",),
)
def q06_left_join_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    cust = read_table(spark, sf_dir, "customer")
    return (
        ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey, "left")
        .select(
            F.coalesce("c_name", F.lit("Unknown")).alias("customer_name"),
            F.coalesce("c_mktsegment", F.lit("N/A")).alias("segment"),
        )
        .groupBy("customer_name", "segment")
        .agg(F.count("*").alias("n_events"))
    )


# ---------------------------------------------------------------------------
# q07 — group multi-agg + post-agg derived column + share-of-total window
# (A9/A10: per-day mean tip & total, tip_percentage, 1_EDA_Dashboard.py:189-194).
# ---------------------------------------------------------------------------
@register(
    "q07_daily_multi_agg",
    f"""
    WITH per_day AS (
      SELECT dayname(ts) AS day_name,
             {sql_qsum('value')} AS sum_value,
             {sql_qavg('value')} AS avg_value,
             COUNT(*) AS n
      FROM events
      GROUP BY 1
    )
    SELECT day_name, sum_value, avg_value, n,
           n * 100.0 / CAST(SUM(n) OVER () AS BIGINT) AS pct_of_events
    FROM per_day
    """,
    description="Multi-aggregate per derived key, post-agg arithmetic, and a "
    "share-of-total computed with a window over the aggregate (no driver "
    "round-trip).",
    tags=("agg", "window"),
)
def q07_daily_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    per_day = ev.groupBy(day_name(F.col("ts")).alias("day_name")).agg(
        qsum(F.col("value")).alias("sum_value"),
        qavg(F.col("value")).alias("avg_value"),
        F.count("*").alias("n"),
    )
    total = Window.partitionBy()
    return per_day.select(
        "day_name",
        "sum_value",
        "avg_value",
        "n",
        (F.col("n") * 100.0 / F.sum("n").over(total)).alias("pct_of_events"),
    )


# ---------------------------------------------------------------------------
# q08 — argmax over an aggregate (A11: idxmax day, 1_EDA_Dashboard.py:225-228).
# ---------------------------------------------------------------------------
@register(
    "q08_argmax_day",
    f"""
    SELECT dayname(ts) AS day_name, {sql_qavg('value')} AS avg_value
    FROM events
    GROUP BY 1
    ORDER BY avg_value DESC, day_name
    LIMIT 1
    """,
    description="Argmax via total-ordered sort + limit 1 (deterministic "
    "tiebreak on the key).",
    tags=("agg", "topk"),
)
def q08_argmax_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(day_name(F.col("ts")).alias("day_name"))
        .agg(qavg(F.col("value")).alias("avg_value"))
        .orderBy(F.desc("avg_value"), F.asc("day_name"))
        .limit(1)
    )


# ---------------------------------------------------------------------------
# q09 — exact quantiles + IQR outlier fences + dispersion (A4/A5/F14,
# 1_EDA_Dashboard.py:141-148,170-171).
# ---------------------------------------------------------------------------
@register(
    "q09_quantiles_iqr",
    """
    WITH q AS (
      SELECT ROUND(quantile_cont(l_extendedprice, 0.25), 6) AS q1,
             ROUND(quantile_cont(l_extendedprice, 0.50), 6) AS median_price,
             ROUND(quantile_cont(l_extendedprice, 0.75), 6) AS q3,
             ROUND(stddev(l_extendedprice), 2) AS stddev_price,
             MIN(l_extendedprice) AS min_price,
             MAX(l_extendedprice) AS max_price,
             COUNT(*) AS n
      FROM lineitem
    )
    SELECT q1, median_price, q3, (q3 - q1) AS iqr,
           q1 - 1.5 * (q3 - q1) AS lo_fence,
           q3 + 1.5 * (q3 - q1) AS hi_fence,
           stddev_price, min_price, max_price, n
    FROM q
    """,
    description="Exact interpolated percentiles (oracle-matchable, unlike "
    "approxQuantile) and the 1.5*IQR fence arithmetic.",
    tags=("agg", "quantile"),
)
def q09_quantiles_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    p = F.col("l_extendedprice")
    # One percentile accumulator for all three quantiles (array form) —
    # a third of the sort-buffer merge cost of three scalar calls.
    pct = F.percentile(p, F.array(F.lit(0.25), F.lit(0.50), F.lit(0.75)))
    q = li.agg(
        pct.alias("pct"),
        F.round(F.stddev(p), 2).alias("stddev_price"),
        F.min(p).alias("min_price"),
        F.max(p).alias("max_price"),
        F.count("*").alias("n"),
    ).select(
        F.round(F.col("pct")[0], 6).alias("q1"),
        F.round(F.col("pct")[1], 6).alias("median_price"),
        F.round(F.col("pct")[2], 6).alias("q3"),
        "stddev_price",
        "min_price",
        "max_price",
        "n",
    )
    return q.select(
        "q1",
        "median_price",
        "q3",
        (F.col("q3") - F.col("q1")).alias("iqr"),
        (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).alias("lo_fence"),
        (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))).alias("hi_fence"),
        "stddev_price",
        "min_price",
        "max_price",
        "n",
    )


# ---------------------------------------------------------------------------
# q10 — fixed-width histogram (A12, 1_EDA_Dashboard.py:150).
# ---------------------------------------------------------------------------
@register(
    "q10_histogram",
    f"""
    SELECT CAST(FLOOR(value / 20.0) AS INTEGER) AS bin,
           COUNT(*) AS n,
           {sql_qsum('value')} AS sum_value
    FROM events
    GROUP BY 1
    """,
    description="Histogram as floor-bucketed group-by — a single shuffle on "
    "the bin key; bin count stays tiny regardless of data scale.",
    tags=("agg", "histogram"),
)
def q10_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.floor(F.col("value") / 20.0).cast("int").alias("bin"))
        .agg(F.count("*").alias("n"), qsum(F.col("value")).alias("sum_value"))
    )


# ---------------------------------------------------------------------------
# q11 — describe()-style summary statistics (A13, notebook cell 10).
# ---------------------------------------------------------------------------
def _summary_block_sql(col: str, scale: int = 100) -> str:
    return f"""
      SELECT '{col}' AS column_name, COUNT({col}) AS n,
             {sql_qavg(col, scale)} AS mean_value,
             MIN({col}) AS min_value, MAX({col}) AS max_value,
             ROUND(quantile_cont({col}, 0.5), 6) AS median_value
      FROM lineitem
    """


@register(
    "q11_summary_stats",
    " UNION ALL ".join(
        _summary_block_sql(c) for c in ("l_quantity", "l_extendedprice", "l_discount")
    ),
    description="Per-column summary stats (count/mean/min/max/median) stacked "
    "into one tall result — df.summary() semantics made oracle-exact.",
    tags=("agg", "summary"),
)
def q11_summary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    # Per-column agg blocks unioned tall. Measured faster than a single
    # wide pass here: each percentile keeps its own sort-based buffer, and
    # one buffer per pass merges cheaper than three in one ObjectHashAgg.
    def block(col: str) -> DataFrame:
        c = F.col(col)
        return li.agg(
            F.lit(col).alias("column_name"),
            F.count(c).alias("n"),
            qavg(c).alias("mean_value"),
            F.min(c).alias("min_value"),
            F.max(c).alias("max_value"),
            F.round(F.percentile(c, F.lit(0.5)), 6).alias("median_value"),
        )
    out = block("l_quantity")
    for col in ("l_extendedprice", "l_discount"):
        out = out.unionByName(block(col))
    return out


# ---------------------------------------------------------------------------
# q12 — error metrics MAE/MSE/RMSE (A14, 2_Predictions.py:37-38) against an
# inline synthetic prediction.
# ---------------------------------------------------------------------------
@register(
    "q12_error_metrics",
    f"""
    SELECT {sql_qavg('ABS(value - (value * 0.9 + 5.0))', 1000000)} AS mae,
           {sql_qavg('(value - (value * 0.9 + 5.0)) * (value - (value * 0.9 + 5.0))', 1000000)} AS mse,
           SQRT({sql_qavg('(value - (value * 0.9 + 5.0)) * (value - (value * 0.9 + 5.0))', 1000000)}) AS rmse,
           COUNT(*) AS n
    FROM events
    """,
    description="Regression error metrics as one aggregate pass (the "
    "reference computes these client-side in pandas).",
    tags=("agg", "ml"),
)
def q12_error_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    err = F.col("value") - (F.col("value") * 0.9 + 5.0)
    return ev.agg(
        qavg(F.abs(err), 1000000).alias("mae"),
        qavg(err * err, 1000000).alias("mse"),
        F.sqrt(qavg(err * err, 1000000)).alias("rmse"),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# q13 — distinct year/month widget options (O3, 1_EDA_Dashboard.py:35-36).
# ---------------------------------------------------------------------------
@register(
    "q13_distinct_months",
    """
    SELECT DISTINCT CAST(year(o_orderdate) AS INTEGER) AS order_year,
                    CAST(month(o_orderdate) AS INTEGER) AS order_month
    FROM orders
    ORDER BY order_year, order_month
    """,
    description="Distinct on derived date parts (partition-prunable at scale "
    "if the table is date-partitioned).",
    tags=("distinct", "sort"),
)
def q13_distinct_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    return (
        o.select(
            F.year("o_orderdate").cast("int").alias("order_year"),
            F.month("o_orderdate").cast("int").alias("order_month"),
        )
        .distinct()
        .orderBy("order_year", "order_month")
    )


# ---------------------------------------------------------------------------
# q14 — deterministic limit/preview (O4).
# ---------------------------------------------------------------------------
@register(
    "q14_ordered_limit",
    """
    SELECT event_id, user_id, event_type, value
    FROM events
    ORDER BY event_id
    LIMIT 100
    """,
    description="Total-ordered limit — head() made deterministic.",
    tags=("limit",),
)
def q14_ordered_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q15 — code->label CASE map with fallback (F10, 1_EDA_Dashboard.py:107-117).
# ---------------------------------------------------------------------------
@register(
    "q15_label_map",
    """
    SELECT CASE WHEN event_type = 'click' THEN 'Click'
                WHEN event_type = 'view' THEN 'View'
                WHEN event_type = 'purchase' THEN 'Purchase'
                ELSE 'Other' END AS event_label,
           COUNT(*) AS n
    FROM events
    GROUP BY 1
    """,
    description="Small code->label mapping as a CASE chain (the payment-type "
    "pattern) with 'Other' fallback.",
    tags=("projection", "groupby"),
)
def q15_label_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    mapping = {"click": "Click", "view": "View", "purchase": "Purchase"}
    return (
        ev.select(label_map(F.col("event_type"), mapping).alias("event_label"))
        .groupBy("event_label")
        .agg(F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# q16 — top customers by revenue (O1 shape at fact scale: shuffle agg on the
# fact, then broadcast join the dim to decorate — not the other way round).
# ---------------------------------------------------------------------------
@register(
    "q16_top_customers",
    f"""
    WITH rev AS (
      SELECT o_custkey, {sql_qsum('o_totalprice')} AS revenue, COUNT(*) AS n_orders
      FROM orders
      GROUP BY o_custkey
    )
    SELECT c.c_custkey, c.c_name, r.revenue, r.n_orders
    FROM rev r JOIN customer c ON r.o_custkey = c.c_custkey
    ORDER BY r.revenue DESC, c.c_custkey
    LIMIT 10
    """,
    description="Aggregate-then-join: revenue agg shuffles only (custkey, "
    "sum) pairs, then the 10-row result decorates via broadcast join — the "
    "100 TB-safe ordering of agg and join.",
    tags=("join", "agg", "topk"),
)
def q16_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    rev = o.groupBy("o_custkey").agg(
        qsum(F.col("o_totalprice")).alias("revenue"), F.count("*").alias("n_orders")
    )
    return (
        rev.join(F.broadcast(c), rev.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "revenue", "n_orders")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q17 — ROLLUP subtotals (grouping-sets family; free upgrade over reference).
# ---------------------------------------------------------------------------
@register(
    "q17_priority_rollup",
    f"""
    SELECT o_orderpriority, o_orderstatus,
           COUNT(*) AS n_orders,
           {sql_qsum('o_totalprice')} AS revenue
    FROM orders
    GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
    """,
    description="Hierarchical subtotals via ROLLUP — one shuffle produces "
    "detail rows, per-priority subtotals, and the grand total.",
    tags=("agg", "rollup"),
)
def q17_priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    return o.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        qsum(F.col("o_totalprice")).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# q18 — top-k per group via ranking window (SURVEY.md §2.5 generalization).
# ---------------------------------------------------------------------------
@register(
    "q18_topk_per_segment",
    """
    WITH ranked AS (
      SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment
                                ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    )
    SELECT c_mktsegment, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn
    FROM ranked
    WHERE rn <= 3
    """,
    description="Top-3 orders per market segment: broadcast dim join + "
    "ranking window partitioned by segment (shuffle on the low-cardinality "
    "segment key only).",
    tags=("window", "join", "topk"),
)
def q18_topk_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    joined = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        joined.select(
            "c_mktsegment",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("int").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


# ---------------------------------------------------------------------------
# q19 — set operations (union/intersect/except; SURVEY.md §2.7 upgrade).
# ---------------------------------------------------------------------------
@register(
    "q19_set_ops",
    """
    SELECT
      (SELECT COUNT(*) FROM (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
                             UNION SELECT DISTINCT user_id FROM events WHERE event_type = 'view')) AS n_union,
      (SELECT COUNT(*) FROM (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
                             INTERSECT SELECT DISTINCT user_id FROM events WHERE event_type = 'view')) AS n_intersect,
      (SELECT COUNT(*) FROM (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
                             EXCEPT SELECT DISTINCT user_id FROM events WHERE event_type = 'view')) AS n_only_purchase
    """,
    description="UNION / INTERSECT / EXCEPT cardinalities in one row.",
    tags=("setops",),
)
def q19_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    purchase = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    view = ev.filter(F.col("event_type") == "view").select("user_id").distinct()
    return (
        purchase.union(view).distinct().agg(F.count("*").alias("n_union"))
        .crossJoin(purchase.intersect(view).agg(F.count("*").alias("n_intersect")))
        .crossJoin(purchase.subtract(view).agg(F.count("*").alias("n_only_purchase")))
    )


# ---------------------------------------------------------------------------
# q20 — sessionization: lag + gap-flag + cumulative session ids (the classic
# window composition; streaming twin uses session_window in streaming/).
# ---------------------------------------------------------------------------
@register(
    "q20_sessionization",
    f"""
    WITH ordered AS (
      SELECT user_id, event_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ),
    flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN prev_ts IS NULL
                       OR {SQL_UNIX_TS.format(ts='ts')} - {SQL_UNIX_TS.format(ts='prev_ts')} > 1800
                  THEN 1 ELSE 0 END AS is_new_session
      FROM ordered
    )
    SELECT user_id,
           CAST(SUM(is_new_session) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM flagged
    GROUP BY user_id
    """,
    description="Sessionize with a 30-minute inactivity gap: lag window + "
    "flag + per-user aggregation. One shuffle on user_id serves both the "
    "window and the final agg.",
    tags=("window", "sessionize"),
)
def q20_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.lag("ts").over(w).alias("prev_ts"),
    ).select(
        "user_id",
        "event_id",
        "ts",
        F.when(
            F.col("prev_ts").isNull()
            | ((F.unix_timestamp("ts") - F.unix_timestamp("prev_ts")) > 1800),
            1,
        )
        .otherwise(0)
        .alias("is_new_session"),
    )
    return flagged.groupBy("user_id").agg(
        F.sum("is_new_session").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# q21 — as-of join (most recent click at-or-before each purchase, per user):
# Spark lacks a native as-of join; composed as a running-max window over the
# merged, time-ordered stream — no pairwise join, scales linearly.
# ---------------------------------------------------------------------------
@register(
    "q21_asof_join",
    """
    WITH tagged AS (
      SELECT event_id, user_id, ts, event_type
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    tracked AS (
      SELECT event_id, user_id, ts, event_type,
             max(CASE WHEN event_type = 'click' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_click_ts
      FROM tagged
    )
    SELECT event_id AS purchase_id, user_id, ts AS purchase_ts, asof_click_ts
    FROM tracked
    WHERE event_type = 'purchase'
    """,
    description="As-of (backward) join expressed as a running-max over the "
    "union of both streams ordered by event time — linear, no range "
    "explosion, same technique a stream-stream as-of would use.",
    tags=("join", "asof", "window"),
)
def q21_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    tagged = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_id", "user_id", "ts", "event_type"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tracked = tagged.withColumn(
        "asof_click_ts",
        F.max(F.when(F.col("event_type") == "click", F.col("ts"))).over(w),
    )
    return tracked.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "asof_click_ts",
    )


# ---------------------------------------------------------------------------
# q22 — pivot (wide event-type counts per user).
# ---------------------------------------------------------------------------
@register(
    "q22_pivot_counts",
    """
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click') AS click,
           COUNT(*) FILTER (WHERE event_type = 'view') AS view,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
           COUNT(*) FILTER (WHERE event_type = 'error') AS error
    FROM events
    GROUP BY user_id
    """,
    description="Pivot with a pinned value list (pinning avoids the extra "
    "distinct-values job Spark otherwise runs before pivoting).",
    tags=("pivot", "agg"),
)
def q22_pivot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    kinds = ["click", "view", "purchase", "signup", "error"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", kinds)
        .count()
        .na.fill(0, kinds)
    )


# ---------------------------------------------------------------------------
# q23 — event-time tumbling hourly aggregate (batch twin of the streaming
# windowed agg in streaming/; ST-upgrade path per SURVEY.md §2.9).
# ---------------------------------------------------------------------------
@register(
    "q23_hourly_rollup",
    f"""
    SELECT date_trunc('hour', ts) AS window_start,
           COUNT(*) AS n_events,
           {sql_qsum('value')} AS sum_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1
    """,
    description="Tumbling 1-hour event-time aggregate (date_trunc group-by); "
    "identical logic runs under Structured Streaming with a watermark.",
    tags=("agg", "time"),
)
def q23_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy(F.date_trunc("hour", "ts").alias("window_start")).agg(
        F.count("*").alias("n_events"),
        qsum(F.col("value")).alias("sum_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


# ---------------------------------------------------------------------------
# q24 — multi-way join: region -> nation -> customer -> orders (dim chain
# broadcast, fact shuffled once) — revenue per nation.
# ---------------------------------------------------------------------------
@register(
    "q24_revenue_by_nation",
    f"""
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           COUNT(*) AS n_orders,
           {sql_qsum('o.o_totalprice')} AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2
    """,
    description="Four-way star join: the dimension chain "
    "(customer->nation->region) broadcasts, the orders fact never "
    "shuffles for the joins — only the final two-key aggregation shuffles.",
    tags=("join", "agg"),
)
def q24_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            qsum(F.col("o_totalprice")).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# q25 — skew-safe salted aggregation (two-stage). Result is bit-identical
# to the direct group-by (integer partials), so the oracle IS the plain
# aggregate — the salting is purely a physical-plan hedge for hot keys.
# ---------------------------------------------------------------------------
@register(
    "q25_salted_agg",
    f"""
    SELECT event_type,
           {sql_qsum('value')} AS sum_value,
           ({sql_qsum('value')} / COUNT(value)) AS avg_value,
           COUNT(value) AS n
    FROM events
    GROUP BY event_type
    """,
    description="Salted two-stage aggregation for skewed keys: stage 1 "
    "aggregates (key, salt) sub-groups, stage 2 merges integer partials — "
    "numerically identical to the direct group-by, but no reducer ever "
    "owns a whole hot key.",
    tags=("agg", "skew"),
)
def q25_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nyc_yellow_taxi_trip_data_pipeline_spark.operators.skew import (
        salted_quantized_agg,
    )

    ev = read_table(spark, sf_dir, "events")
    return salted_quantized_agg(
        ev, key="event_type", value=F.col("value"), salt_expr=F.col("event_id")
    )


# ---------------------------------------------------------------------------
# q26 — CUBE: all grouping-set combinations in one shuffle.
# ---------------------------------------------------------------------------
@register(
    "q26_status_cube",
    f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           {sql_qsum('o_totalprice')} AS revenue
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    description="CUBE over status x priority: detail, both marginals, and "
    "grand total from a single expanded aggregation.",
    tags=("agg", "cube"),
)
def q26_status_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        qsum(F.col("o_totalprice")).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# q27 — grouped-map UDF (applyInPandas): per-group z-score standardization.
# Group stats use the quantized-integer contract (numpy int64 sums) so the
# Arrow/pandas path is bit-identical to the SQL oracle — a full end-to-end
# check of the grouped-map machinery, not just a rows-only smoke.
# ---------------------------------------------------------------------------
@register(
    "q27_grouped_zscore",
    f"""
    WITH s0 AS (
      SELECT event_type,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS s,
             CAST(SUM(CAST(FLOOR((value * value) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sq,
             COUNT(value) AS n
      FROM events GROUP BY event_type
    ),
    s1 AS (SELECT event_type, ((s / 100.0) / n) AS mean_v, sq, n FROM s0),
    s2 AS (
      SELECT event_type, mean_v,
             SQRT(((sq / 100.0) - (n * mean_v) * mean_v) / (n - 1)) AS std_v
      FROM s1
    )
    SELECT e.event_id, e.event_type, e.value,
           (e.value - s2.mean_v) / s2.std_v AS zscore
    FROM events e JOIN s2 ON e.event_type = s2.event_type
    """,
    description="Per-group standardization via applyInPandas (grouped-map "
    "UDF, Arrow-batched): pandas computes quantized-integer group stats so "
    "results are bit-identical to the relational formulation.",
    tags=("pandas-udf", "groupby"),
)
def q27_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").select("event_id", "event_type", "value")

    def zscore_group(pdf):
        # Self-contained closure (executor workers can't import the repo
        # package). Mirrors the oracle SQL op-for-op: quantized int64 sums,
        # then the same double-precision expression order.
        import numpy as np

        v = pdf["value"].to_numpy()
        q = np.floor(v * 100 + 0.5).astype("int64")
        qq = np.floor((v * v) * 100 + 0.5).astype("int64")
        n = len(v)
        mean_v = (q.sum() / 100.0) / n
        std_v = (((qq.sum() / 100.0) - (n * mean_v) * mean_v) / (n - 1)) ** 0.5
        return pdf.assign(zscore=(v - mean_v) / std_v)

    return ev.groupBy("event_type").applyInPandas(
        zscore_group,
        schema="event_id long, event_type string, value double, zscore double",
    )


# ---------------------------------------------------------------------------
# q28 — scalar pandas UDF (Arrow-vectorized) for the time-of-day bucketing:
# the reference implements this as a row-at-a-time Python UDF
# (sparkConsumer.py:71-80); the engine's production path is the native CASE
# chain (q02), and THIS query demonstrates the vectorized-UDF surface with
# identical semantics.
# ---------------------------------------------------------------------------
@register(
    "q28_pandas_udf_bucketing",
    f"""
    SELECT {SQL_TIMEOFDAY_ETL.format(h='hour(ts)')} AS timeofday, COUNT(*) AS n
    FROM events
    GROUP BY 1
    """,
    description="Arrow-vectorized scalar pandas UDF computing the ETL "
    "time-of-day buckets (semantics of reference UDF U1) — the "
    "demonstrate-the-UDF-surface twin of q02's native CASE.",
    tags=("pandas-udf",),
)
def q28_pandas_udf_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _timeofday(hour):
        out = pd.Series("late night", index=hour.index)
        out[hour.between(6, 11)] = "morning"
        out[hour.between(12, 15)] = "afternoon"
        out[hour.between(16, 21)] = "evening"
        return out

    # Real (non-string) annotations: this module uses
    # `from __future__ import annotations`, which would stringify inline
    # hints and break pandas_udf's signature inspection.
    _timeofday.__annotations__ = {"hour": pd.Series, "return": pd.Series}
    timeofday_udf = pandas_udf("string")(_timeofday)

    ev = read_table(spark, sf_dir, "events")
    return (
        ev.select(timeofday_udf(F.hour("ts")).alias("timeofday"))
        .groupBy("timeofday")
        .agg(F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# q29 — Kafka-sink serialization roundtrip: row -> JSON envelope (S7,
# kafkaProducer.py:36-42) -> parse back (F12). The oracle checks roundtrip
# identity on the payload fields.
# ---------------------------------------------------------------------------
@register(
    "q29_json_roundtrip",
    """
    SELECT event_id, event_type, value FROM events
    """,
    description="to_json(struct(*)) -> from_json roundtrip — the Kafka "
    "producer's row->JSON envelope and the consumer's parse, composed; "
    "oracle asserts the roundtrip is the identity.",
    tags=("serialization", "streaming"),
)
def q29_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nyc_yellow_taxi_trip_data_pipeline_spark.sources.io import to_kafka_json

    ev = read_table(spark, sf_dir, "events")
    # the actual Kafka-sink envelope helper, so the oracle gates it
    payload = to_kafka_json(ev.select("event_id", "event_type", "value"))
    parsed = payload.select(
        F.from_json(
            F.col("value"), "event_id long, event_type string, value double"
        ).alias("data")
    )
    return parsed.select("data.*")


# ---------------------------------------------------------------------------
# q42 — approximate sketches (HLL distinct, approx quantiles): the at-scale
# substitutes for q09/q13-style exact answers. Approx values are
# engine-specific -> rows-only check (the exact twins ARE oracle-checked).
# ---------------------------------------------------------------------------
@register(
    "q42_approx_sketches",
    """
    SELECT COUNT(*) AS n,
           COUNT(DISTINCT l_orderkey) AS orders_exact,
           COUNT(DISTINCT l_partkey) AS parts_exact,
           CAST(TRUE AS BOOLEAN) AS orders_hll_ok,
           CAST(TRUE AS BOOLEAN) AS parts_hll_ok,
           CAST(TRUE AS BOOLEAN) AS quartiles_ok
    FROM lineitem
    """,
    description="approx_count_distinct (HyperLogLog++) and approx "
    "percentiles — the sketch-based forms used instead of exact "
    "distinct/percentile at 100 TB. Sketch values are engine-specific by "
    "design, so the oracle-checkable contract is the ERROR BOUND: the "
    "query emits exact counts plus booleans asserting each sketch lands "
    "within a bound far outside its configured error (HLL++ rsd=0.02 "
    "checked at ±10% ≈ 5σ; percentile_approx accuracy=10000 checked at "
    "±5% relative with monotone quartiles). DuckDB's side is literal TRUE "
    "— a hash match proves the sketches actually honored their bounds.",
    tags=("agg", "approx"),
)
def q42_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    # Three SEPARATE single-row aggregations, cross-joined. Mixing
    # count_distinct with sketch aggregates in one agg makes Catalyst plan
    # an Expand (one row copy per distinct group) and drags the
    # percentile_approx QuantileSummaries buffer through 3x the rows —
    # measured 22s vs ~4s split at sf0.1. Each piece below is a plain
    # partial-aggregate pipeline.
    exact = li.agg(
        F.count("*").alias("n"),
        F.count_distinct("l_orderkey").alias("orders_exact"),
        F.count_distinct("l_partkey").alias("parts_exact"),
    )
    sketches = li.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("_ohll"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("_phll"),
        F.percentile_approx(
            "l_extendedprice", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)), 10000
        ).alias("_aq"),
    )
    # Verify the quantile sketch by its RANK guarantee (error <= n/accuracy)
    # instead of recomputing exact percentiles: counting rows at-or-below
    # each sketched quartile is a pure counting pass — no per-group value
    # buffering, so the check itself survives 100 TB where an exact
    # percentile (which materializes every value into one agg buffer)
    # would not.
    ranks = li.crossJoin(F.broadcast(sketches)).agg(
        *[
            F.sum(
                F.when(
                    F.col("l_extendedprice") <= F.element_at("_aq", i), 1
                ).otherwise(0)
            ).alias(f"_r{i}")
            for i in (1, 2, 3)
        ]
    )

    def _within(approx, ref, rel):
        return F.abs(approx - ref) <= rel * ref

    qs_ok = (
        (F.element_at("_aq", 1) <= F.element_at("_aq", 2))
        & (F.element_at("_aq", 2) <= F.element_at("_aq", 3))
    )
    for i, p in ((1, 0.25), (2, 0.5), (3, 0.75)):
        # rank of the sketched quartile within 1% of n around p*n
        # (100x the sketch's configured n/10000 rank-error bound).
        qs_ok = qs_ok & (
            F.abs(F.col(f"_r{i}") - F.lit(p) * F.col("n"))
            <= 0.01 * F.col("n")
        )
    return (
        exact.crossJoin(sketches)
        .crossJoin(ranks)
        .select(
            "n",
            "orders_exact",
            "parts_exact",
            _within(F.col("_ohll"), F.col("orders_exact"), F.lit(0.10)).alias(
                "orders_hll_ok"
            ),
            _within(F.col("_phll"), F.col("parts_exact"), F.lit(0.10)).alias(
                "parts_hll_ok"
            ),
            qs_ok.alias("quartiles_ok"),
        )
    )


# ---------------------------------------------------------------------------
# q43 — the Spark SQL API surface (S4): the same Catalyst plan as the
# DataFrame API, written as SQL over registered views — the dashboard's
# "SELECT ... FROM cleaned table" entry point made native.
# ---------------------------------------------------------------------------
@register(
    "q43_sql_api",
    f"""
    SELECT event_type,
           {SQL_TIMEOFDAY_ETL.format(h='hour(ts)')} AS timeofday,
           COUNT(*) AS n,
           {sql_qavg('value')} AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
    description="Pure spark.sql() query over registered temp views — "
    "identical Catalyst plan to the DataFrame form; demonstrates the SQL "
    "passthrough entry point (reference reads via SQLAlchemy+pandas).",
    tags=("sql", "agg"),
)
def q43_sql_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nyc_yellow_taxi_trip_data_pipeline_spark.sources.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT event_type,
               CASE WHEN hour(ts) BETWEEN 6 AND 11 THEN 'morning'
                    WHEN hour(ts) BETWEEN 12 AND 15 THEN 'afternoon'
                    WHEN hour(ts) BETWEEN 16 AND 21 THEN 'evening'
                    ELSE 'late night' END AS timeofday,
               COUNT(*) AS n,
               -- 100.0D: Spark SQL parses bare 100.0 as DECIMAL (DuckDB as
               -- DOUBLE); the D suffix keeps the arithmetic in doubles.
               ((CAST(SUM(CAST(FLOOR(value * 100 + 0.5D) AS BIGINT)) AS BIGINT) / 100.0D)
                / COUNT(value)) AS avg_value
        FROM events
        GROUP BY 1, 2
        """
    )


# ---------------------------------------------------------------------------
# q51 — MERGE/upsert emulation (no Delta in this environment): latest
# event value per user upserts into the customer dimension — matched rows
# update, unmatched keep their old value. Anti-join + union, the classic
# pre-ACID pattern (with Delta/Iceberg this is MERGE INTO).
# ---------------------------------------------------------------------------
@register(
    "q51_upsert_merge",
    """
    WITH latest AS (
      SELECT user_id, value AS new_value
      FROM (
        SELECT user_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
      )
      WHERE rn = 1
    )
    SELECT c.c_custkey, c.c_name,
           COALESCE(l.new_value, c.c_acctbal) AS acct_value,
           l.new_value IS NOT NULL AS was_updated
    FROM customer c
    LEFT JOIN latest l ON c.c_custkey = l.user_id
    """,
    description="MERGE INTO emulated without a table format: latest-per-key "
    "update set (ranking window) left-joined into the dimension, COALESCE "
    "picks new-over-old — matched rows update, unmatched pass through. "
    "With Delta/Iceberg this compiles to MERGE; the logical shape is "
    "identical.",
    tags=("merge", "upsert", "window", "join"),
)
def q51_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    cust = read_table(spark, sf_dir, "customer")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    latest = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("value").alias("new_value"))
    )
    return (
        cust.join(F.broadcast(latest), cust.c_custkey == latest.user_id, "left")
        .select(
            "c_custkey",
            "c_name",
            F.coalesce("new_value", "c_acctbal").alias("acct_value"),
            F.col("new_value").isNotNull().alias("was_updated"),
        )
    )


# ---------------------------------------------------------------------------
# q56 — regex extraction: pull typed fields out of semi-structured text
# without a JSON parser (log-scraping shape; the JSON-path twin is q02's k).
# ---------------------------------------------------------------------------
@register(
    "q56_regex_extract",
    """
    SELECT event_id,
           CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER) AS k_regex,
           length(regexp_replace(props, '[0-9]', '', 'g')) AS n_nondigit_chars
    FROM events
    """,
    description="Typed field extraction via regexp_extract + global "
    "regexp_replace — stays inside codegen; the scan reads only props.",
    tags=("text", "regex"),
)
def q56_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.regexp_extract("props", '"k": ([0-9]+)', 1).cast("int").alias("k_regex"),
        F.length(F.regexp_replace("props", "[0-9]", "")).cast("long").alias(
            "n_nondigit_chars"
        ),
    )


# ---------------------------------------------------------------------------
# q57 — GROUPING SETS with GROUPING() ids: the general form of
# rollup (q17) / cube (q26), with explicit set selection.
# ---------------------------------------------------------------------------
@register(
    "q57_grouping_sets",
    f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
           COUNT(*) AS n_orders,
           {sql_qsum('o_totalprice')} AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    description="Explicit GROUPING SETS (status-only, priority-only, grand "
    "total) with GROUPING() ids distinguishing rolled-up NULLs from data "
    "NULLs — one expanded aggregation.",
    tags=("agg", "groupingsets"),
)
def q57_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nyc_yellow_taxi_trip_data_pipeline_spark.sources.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
               COUNT(*) AS n_orders,
               (CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5D) AS BIGINT)) AS BIGINT)
                / 100.0D) AS revenue
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


# ---------------------------------------------------------------------------
# q58 — distribution-rank window family: percent_rank / ntile / cume_dist
# over a total order (value + unique key tiebreak -> deterministic).
# ---------------------------------------------------------------------------
@register(
    "q58_rank_family",
    """
    SELECT event_id, user_id, value,
           percent_rank() OVER w AS pct_rank,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile,
           cume_dist() OVER w AS cume
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
    """,
    description="percent_rank/ntile/cume_dist per user over a total order "
    "— the distribution-rank windows (rank arithmetic is exact integer "
    "ratios, engine-identical).",
    tags=("window", "rank"),
)
def q58_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("value", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.percent_rank().over(w).alias("pct_rank"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.cume_dist().over(w).alias("cume"),
    )


# ---------------------------------------------------------------------------
# q61 — conditional / boolean aggregates: count_if, bool_and, bool_or.
# ---------------------------------------------------------------------------
@register(
    "q61_conditional_aggs",
    """
    SELECT event_type,
           CAST(count_if(value > 100) AS BIGINT) AS n_large,
           bool_and(value > 0) AS all_positive,
           bool_or(value > 190) AS any_huge,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
    description="Conditional and boolean aggregates (count_if / bool_and / "
    "bool_or) — single-pass predicates over groups.",
    tags=("agg", "conditional"),
)
def q61_conditional_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_if(F.col("value") > 100).alias("n_large"),
        F.bool_and(F.col("value") > 0).alias("all_positive"),
        F.bool_or(F.col("value") > 190).alias("any_huge"),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# q62 — fuzzy matching via edit distance: within-block document pairs
# whose 64-char prefixes are within Levenshtein distance 20. The prefix
# bound keeps the O(len^2) distance and the O(block^2) pairing both
# bounded — blocking + cheap-prefix-filter is the standard fuzzy-dedup
# staging before exact verification.
# ---------------------------------------------------------------------------
@register(
    "q62_fuzzy_editdistance",
    """
    WITH d AS (
      SELECT doc_id, lang, source,
             substr(text, 1, 64) AS prefix,
             substr(text, 1, 8) AS p8,
             length(text) // 128 AS len_band
      FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(levenshtein(a.prefix, b.prefix) AS INTEGER) AS edit_dist
    FROM d a
    JOIN d b ON a.lang = b.lang AND a.source = b.source
            AND a.p8 = b.p8 AND a.len_band = b.len_band
            AND a.doc_id < b.doc_id
    WHERE levenshtein(a.prefix, b.prefix) <= 20
    """,
    description="Fuzzy near-dup candidates by Levenshtein distance on "
    "64-char prefixes. Blocking key is (lang, source, first-8-char prefix "
    "bucket, 128-char length band): the prefix bucket and length band keep "
    "block size O(1) in corpus size, so the self-join shuffles on a "
    "high-cardinality key and never goes quadratic; Levenshtein runs only "
    "inside blocks as the verify stage. Standard prefix-blocking recall "
    "trade-off: pairs diverging within their first 8 chars are not "
    "candidates.",
    tags=("dedup", "fuzzy", "join"),
)
def q62_fuzzy_editdistance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "lang",
        "source",
        F.substring("text", 1, 64).alias("prefix"),
        F.substring("text", 1, 8).alias("p8"),
        F.floor(F.length("text") / 128).alias("len_band"),
    )
    a = d.select(
        F.col("doc_id").alias("doc_a"), "lang", "source", "p8", "len_band",
        F.col("prefix").alias("pa"),
    )
    b = d.select(
        F.col("doc_id").alias("doc_b"), "lang", "source", "p8", "len_band",
        F.col("prefix").alias("pb"),
    )
    return (
        a.join(b, ["lang", "source", "p8", "len_band"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("pa", "pb").cast("int").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 20)
    )


# ---------------------------------------------------------------------------
# q63 — date/time math battery: datediff, interval add, month boundaries,
# week truncation (both engines truncate weeks to Monday).
# ---------------------------------------------------------------------------
@register(
    "q63_date_math",
    """
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS order_date,
           CAST(datediff('day', o_orderdate, TIMESTAMP '2024-06-01 00:00:00') AS INTEGER) AS days_to_cutoff,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start
    FROM orders
    """,
    description="Date arithmetic battery: day differences, interval "
    "addition, end-of-month, ISO week truncation — all native date "
    "expressions over the scan.",
    tags=("date",),
)
def q63_date_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.datediff(F.lit("2024-06-01").cast("date"), F.col("o_orderdate"))
        .cast("int")
        .alias("days_to_cutoff"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
        F.date_trunc("week", "o_orderdate").cast("date").alias("week_start"),
    )


# ---------------------------------------------------------------------------
# q99 — q09's 100x scale form: the exact interpolated percentile (A4/A5)
# materializes every value into one sort buffer — fine at judged SFs,
# impossible at 100 TB. This twin swaps in percentile_approx (KLL-style
# fixed-size sketch, accuracy 5000 => rank error n/5000) and verifies
# each sketched quartile by its RANK GUARANTEE with a pure counting
# pass: count(value <= sketched q) must sit within 2% of phi*n — 100x
# looser than the sketch's bound, so the boolean is deterministically
# TRUE in any engine, which is exactly what the oracle hash-matches
# (the q42/q84 sketch-verification contract, now registered for the
# global-quantile family instead of living in ARCHITECTURE.md prose).
# ---------------------------------------------------------------------------
@register(
    "q99_quantiles_iqr_sketch",
    """
    SELECT COUNT(*) AS n,
           CAST(TRUE AS BOOLEAN) AS q1_rank_ok,
           CAST(TRUE AS BOOLEAN) AS median_rank_ok,
           CAST(TRUE AS BOOLEAN) AS q3_rank_ok
    FROM lineitem
    """,
    description="Sketch-based quartiles over l_extendedprice "
    "(percentile_approx, fixed-size summary — the 100x path for q09's "
    "exact sort-buffer percentiles) verified by rank counting: "
    "count(value <= sketched quartile) within 2% of phi*n, far outside "
    "the sketch's n/5000 rank-error bound.",
    tags=("agg", "quantile", "approx", "scale-twin"),
)
def q99_quantiles_iqr_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    p = F.col("l_extendedprice")
    sk = li.agg(
        F.count("*").alias("n"),
        F.percentile_approx(
            p, F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)), F.lit(5000)
        ).alias("qs"),
    )
    # Tie-aware rank check: with duplicated values, count(<= q) can sit
    # far above phi*n even for a correct quantile — the element's rank
    # INTERVAL is [count(< q), count(<= q)], so the guarantee is
    # count(< q) <= (phi+tol)*n AND count(<= q) >= (phi-tol)*n.
    ranks = (
        li.crossJoin(F.broadcast(sk))
        .agg(
            *[
                F.sum(F.when(p < F.col("qs")[i], 1).otherwise(0)).alias(f"lt{i}")
                for i in range(3)
            ],
            *[
                F.sum(F.when(p <= F.col("qs")[i], 1).otherwise(0)).alias(f"le{i}")
                for i in range(3)
            ],
        )
    )
    return sk.crossJoin(ranks).select(
        "n",
        *[
            (
                (F.col(f"lt{i}") <= (phi + 0.02) * F.col("n"))
                & (F.col(f"le{i}") >= (phi - 0.02) * F.col("n"))
            ).alias(name)
            for i, (phi, name) in enumerate(
                [(0.25, "q1_rank_ok"), (0.5, "median_rank_ok"), (0.75, "q3_rank_ok")]
            )
        ],
    )


# ---------------------------------------------------------------------------
# q100 — q11's 100x scale form (A13): count/mean/min/max are single-pass
# streaming aggregates that scale as-is, so they stay ORACLE-EXACT
# (mean via quantized integer sum per the registry contract); only the
# median — the one column whose exact form buffers every value — becomes
# a rank-verified sketch. Strictly stronger than a booleans-only twin:
# four of five columns still hash-match exact values at any scale.
# ---------------------------------------------------------------------------
def _summary_sketch_block_sql(col: str, scale: int = 100) -> str:
    return f"""
      SELECT '{col}' AS column_name, COUNT({col}) AS n,
             {sql_qavg(col, scale)} AS mean_value,
             MIN({col}) AS min_value, MAX({col}) AS max_value,
             CAST(TRUE AS BOOLEAN) AS median_rank_ok
      FROM lineitem
    """


@register(
    "q100_summary_stats_sketch",
    " UNION ALL ".join(
        _summary_sketch_block_sql(c)
        for c in ("l_quantity", "l_extendedprice", "l_discount")
    ),
    description="describe()-style summary at sketch scale: exact "
    "count/quantized-mean/min/max (single-pass, scale-safe, still "
    "oracle-exact) with the median replaced by a percentile_approx "
    "sketch verified by its rank guarantee (count <= sketched median "
    "within 2% of n/2).",
    tags=("agg", "summary", "approx", "scale-twin"),
)
def q100_summary_stats_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")

    def block(col: str) -> DataFrame:
        c = F.col(col)
        sk = li.agg(
            F.lit(col).alias("column_name"),
            F.count(c).alias("n"),
            qavg(c).alias("mean_value"),
            F.min(c).alias("min_value"),
            F.max(c).alias("max_value"),
            F.percentile_approx(c, F.lit(0.5), F.lit(5000)).alias("_amed"),
        )
        # Tie-aware (see q99): l_discount has ~11 distinct values, so the
        # median's rank is an interval [count(<), count(<=)] — the
        # guarantee holds iff that interval overlaps [0.48n, 0.52n].
        rank = li.crossJoin(F.broadcast(sk.select("_amed"))).agg(
            F.sum(F.when(c < F.col("_amed"), 1).otherwise(0)).alias("_lt"),
            F.sum(F.when(c <= F.col("_amed"), 1).otherwise(0)).alias("_le"),
        )
        return sk.crossJoin(rank).select(
            "column_name",
            "n",
            "mean_value",
            "min_value",
            "max_value",
            (
                (F.col("_lt") <= 0.52 * F.col("n"))
                & (F.col("_le") >= 0.48 * F.col("n"))
            ).alias("median_rank_ok"),
        )

    out = block("l_quantity")
    for col in ("l_extendedprice", "l_discount"):
        out = out.unionByName(block(col))
    return out
