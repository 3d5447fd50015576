"""Relational-core queries (SURVEY.md §2.2-2.7, §2.9 batch analogs).

Every query has a DuckDB oracle twin with identical column aliases.
Float aggregates are rounded identically on both sides; timestamps are
emitted as formatted strings / epoch seconds so both engines hash the
same values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data___knowledge_graph_construction_with_llm_spark.operators.relational import (
    range_join_bands,
    sessionize,
    topk_per_group,
    union_fill,
)
from big_data___knowledge_graph_construction_with_llm_spark.plans.registry import query
from big_data___knowledge_graph_construction_with_llm_spark.plans.tables import load


# --- scans ---------------------------------------------------------------

@query(
    "q_scan_csv",
    oracle="""
    SELECT count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    """,
)
def q_scan_csv(spark: SparkSession, sf: str) -> DataFrame:
    """Plain scan + count (parquet analog of the reference's CSV scan+count
    gate, ``…AWS/ingestion/DataIngestionBatch.py:73-77``)."""
    return load(spark, sf, "lineitem").agg(
        F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty")
    )


@query(
    "q_events_scan",
    oracle="""
    SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
    FROM events
    WHERE event_type <> 'error'
    GROUP BY event_type
    """,
)
def q_events_scan(spark: SparkSession, sf: str) -> DataFrame:
    """Filtered scan of the stream-shaped table (filter pushed to parquet)."""
    return (
        load(spark, sf, "events")
        .filter(F.col("event_type") != "error")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


# --- filters / projections ------------------------------------------------

@query(
    "q_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price
    FROM lineitem
    WHERE l_quantity > 25 AND l_returnflag = 'R'
    """,
)
def q_filter_project(spark: SparkSession, sf: str) -> DataFrame:
    # per-row IEEE arithmetic is bit-identical across engines — no rounding
    li = load(spark, sf, "lineitem")
    return li.filter((F.col("l_quantity") > 25) & (F.col("l_returnflag") == "R")).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
    )


# --- aggregations ----------------------------------------------------------

@query(
    "q_agg_basic",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                  AS sum_qty,
           round(sum(l_extendedprice), 2)                             AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)          AS sum_disc_price,
           round(avg(l_quantity), 4)                                  AS avg_qty,
           round(avg(l_discount), 4)                                  AS avg_disc,
           count(*)                                                   AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_basic(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary — the flagship aggregation.

    Partial (map-side) aggregation is automatic; the shuffle carries only
    (flag, status) groups, so this scales with distinct groups, not rows.
    """
    li = load(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate").cast("date") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q_count_by",
    oracle="SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY o_orderpriority",
)
def q_count_by(spark: SparkSession, sf: str) -> DataFrame:
    return load(spark, sf, "orders").groupBy("o_orderpriority").agg(
        F.count("*").alias("n")
    )


@query(
    "q_count_distinct",
    oracle="""
    SELECT count(DISTINCT o_custkey) AS n_cust,
           count(DISTINCT o_orderpriority) AS n_prio,
           count(*) AS n
    FROM orders
    """,
)
def q_count_distinct(spark: SparkSession, sf: str) -> DataFrame:
    return load(spark, sf, "orders").agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.countDistinct("o_orderpriority").alias("n_prio"),
        F.count("*").alias("n"),
    )


@query(
    "q_rollup",
    oracle="""
    SELECT n_name, CAST(grouping(n_name) AS INT) AS g,
           count(*) AS n, round(sum(c_acctbal), 2) AS sum_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY ROLLUP(n_name)
    """,
)
def q_rollup(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    n = load(spark, sf, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .rollup("n_name")
        .agg(
            F.grouping("n_name").cast("int").alias("g"),
            F.count("*").alias("n"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
        )
    )


# --- joins ------------------------------------------------------------------

@query(
    "q_join_orders_customer",
    oracle="""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n
    FROM lineitem
    JOIN orders   ON l_orderkey  = o_orderkey
    JOIN customer ON o_custkey   = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def q_join_orders_customer(spark: SparkSession, sf: str) -> DataFrame:
    """Star join: fact ⋈ dims, revenue per nation.

    The dimension joins (customer, nation) are broadcast — only the
    lineitem⋈orders join shuffles, on the orderkey. At 100 TB both fact
    tables would be bucketed by orderkey to remove that shuffle too.
    """
    li = load(spark, sf, "lineitem")
    o = load(spark, sf, "orders")
    c = load(spark, sf, "customer")
    n = load(spark, sf, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n"),
        )
    )


@query(
    "q_semi_anti",
    oracle="""
    SELECT c_custkey, 'semi' AS tag FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders)
    UNION ALL
    SELECT c_custkey, 'anti' AS tag FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def q_semi_anti(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders").select("o_custkey")
    semi = c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", F.lit("semi").alias("tag")
    )
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", F.lit("anti").alias("tag")
    )
    return semi.unionByName(anti)


@query(
    "q_range_join",
    oracle="""
    WITH bands(band, lo, hi) AS (
        VALUES ('negative', -100000.0, 0.0), ('low', 0.0, 3000.0),
               ('mid', 3000.0, 7000.0), ('high', 7000.0, 100000.0)
    )
    SELECT band, count(*) AS n, round(sum(c_acctbal), 2) AS sum_bal
    FROM customer JOIN bands ON c_acctbal >= lo AND c_acctbal < hi
    GROUP BY band
    """,
)
def q_range_join(spark: SparkSession, sf: str) -> DataFrame:
    """Theta/range join into broadcast value bands (no cartesian shuffle)."""
    c = load(spark, sf, "customer")
    # inline VALUES relation — stays on the JVM (no pickled-RDD path)
    bands = spark.sql(
        """
        SELECT * FROM VALUES
            ('negative', -100000.0D, 0.0D), ('low', 0.0D, 3000.0D),
            ('mid', 3000.0D, 7000.0D), ('high', 7000.0D, 100000.0D)
            AS bands(band, lo, hi)
        """
    )
    return (
        range_join_bands(c, bands, "c_acctbal")
        .groupBy("band")
        .agg(F.count("*").alias("n"), F.round(F.sum("c_acctbal"), 2).alias("sum_bal"))
    )


@query(
    "q_asof",
    oracle="""
    SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           last_value(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_type, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS last_click_value
    FROM events
    QUALIFY event_type = 'purchase'
    """,
)
def q_asof(spark: SparkSession, sf: str) -> DataFrame:
    """As-of enrichment: each purchase sees the latest click value at-or-
    before its timestamp, per user — one shuffle + one sort, no join."""
    ev = load(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_type", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    asof_click = F.last(
        F.when(F.col("event_type") == "click", F.col("value")), ignorenulls=True
    ).over(w)
    return (
        ev.withColumn("last_click_value", asof_click)
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            "last_click_value",
        )
    )


# --- windows ---------------------------------------------------------------

@query(
    "q_rank_in_group",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal,
           CAST(rank() OVER (PARTITION BY c_nationkey
                             ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rnk
    FROM customer
    QUALIFY rnk <= 5
    """,
)
def q_rank_in_group(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.withColumn("rnk", F.rank().over(w).cast("int"))
        .filter(F.col("rnk") <= 5)
        .select("c_nationkey", "c_custkey", "c_acctbal", "rnk")
    )


@query(
    "q_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS running_total
    FROM orders
    """,
)
def q_running_sum(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@query(
    "q_lag_events",
    oracle="""
    SELECT event_id, user_id,
           CAST(floor(epoch(ts)) AS BIGINT)
             - lag(CAST(floor(epoch(ts)) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
    FROM events
    """,
)
def q_lag_events(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.unix_timestamp("ts")
    return ev.select(
        "event_id", "user_id", (epoch - F.lag(epoch).over(w)).alias("gap_s")
    )


# --- sorts / top-k -----------------------------------------------------------

@query(
    "q_topk_global",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def q_topk_global(spark: SparkSession, sf: str) -> DataFrame:
    """Global top-k: compiles to per-partition TakeOrdered + k-row driver
    merge — no full sort at any scale."""
    return (
        load(spark, sf, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "q_topk_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice
    FROM orders
    QUALIFY row_number() OVER (PARTITION BY o_orderpriority
                               ORDER BY o_totalprice DESC, o_orderkey) <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    return topk_per_group(
        o,
        ["o_orderpriority"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        3,
    ).select("o_orderpriority", "o_orderkey", "o_totalprice")


# --- set operations -----------------------------------------------------------

@query(
    "q_union_fill",
    oracle="""
    SELECT c_name AS name, c_mktsegment AS segment, 'customer' AS kind
    FROM customer
    UNION ALL
    SELECT s_name AS name, '' AS segment, 'supplier' AS kind
    FROM supplier
    """,
)
def q_union_fill(spark: SparkSession, sf: str) -> DataFrame:
    """Heterogeneous union + fill (reference ``pd.concat(...).fillna("")``,
    ``…Local/ingestion/data_ingestion_batch.py:160``)."""
    c = load(spark, sf, "customer").select(
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment"),
        F.lit("customer").alias("kind"),
    )
    s = load(spark, sf, "supplier").select(
        F.col("s_name").alias("name"), F.lit("supplier").alias("kind")
    )
    return union_fill([c, s])


@query(
    "q_set_ops",
    oracle="""
    SELECT nationkey, 'both' AS tag FROM
      (SELECT c_nationkey AS nationkey FROM customer
       INTERSECT SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT nationkey, 'customer_only' AS tag FROM
      (SELECT c_nationkey AS nationkey FROM customer
       EXCEPT SELECT s_nationkey FROM supplier)
    """,
)
def q_set_ops(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    both = c.intersect(s).select("nationkey", F.lit("both").alias("tag"))
    only = c.subtract(s).select(
        "nationkey", F.lit("customer_only").alias("tag")
    )
    return both.unionByName(only)


# --- streaming batch analogs ---------------------------------------------------

@query(
    "q_tumbling_count",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '10 minutes', ts), '%Y-%m-%d %H:%M:%S')
               AS window_start,
           event_type, count(*) AS n, round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_tumbling_count(spark: SparkSession, sf: str) -> DataFrame:
    """Batch twin of ``streaming.events.tumbling_counts``."""
    ev = load(spark, sf, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@query(
    "q_session_window",
    oracle="""
    WITH g AS (
      SELECT user_id, event_id, ts,
             CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                       - lag(CAST(floor(epoch(ts)) AS BIGINT))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
    ),
    s AS (
      SELECT user_id, event_id,
             CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS session_id
      FROM g
    )
    SELECT user_id, session_id, count(*) AS n
    FROM s GROUP BY user_id, session_id
    """,
)
def q_session_window(spark: SparkSession, sf: str) -> DataFrame:
    """Batch sessionization (30-min gap), the scalable lag+cumsum shape;
    streaming twin is ``session_window`` in ``streaming/events.py``."""
    ev = load(spark, sf, "events")
    sess = sessionize(ev, "user_id", "ts", 30)
    return sess.groupBy("user_id", "session_id").agg(F.count("*").alias("n"))


@query(
    "q_grouping_sets",
    oracle="""
    SELECT event_type,
           CAST(user_id % 4 AS BIGINT) AS user_band,
           count(*) AS n,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY GROUPING SETS ((event_type), (user_band), (event_type, user_band), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    """GROUPING SETS (SURVEY §2.4 rollup/cube/grouping-sets row): one pass
    producing all four aggregation granularities — Catalyst expands this
    with a single Expand node, not four scans."""
    ev = load(spark, sf, "events")
    ev.select(
        "event_type", (F.col("user_id") % 4).alias("user_band"), "value"
    ).createOrReplaceTempView("_gs_events")
    return spark.sql(
        """
        SELECT event_type, user_band, count(*) AS n,
               round(sum(value), 2) AS sum_value
        FROM _gs_events
        GROUP BY GROUPING SETS ((event_type), (user_band),
                                (event_type, user_band), ())
        """
    )


@query(
    "q_sliding_count",
    oracle="""
    -- every event lies in exactly two 10-min/5-min-slide windows:
    -- its 5-min bucket and the bucket 5 minutes before it
    SELECT strftime(time_bucket(INTERVAL '5 minutes', ts)
                    - off * INTERVAL '1 second', '%Y-%m-%d %H:%M:%S') AS ws,
           event_type, count(*) AS n
    FROM events, (SELECT unnest([0, 300]) AS off) offs
    GROUP BY 1, 2
    """,
)
def q_sliding_count(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding-window counts (10 min window, 5 min slide) — each event in
    two windows; one Expand + one aggregation, no self-join
    (SURVEY §2.9 sliding row, batch analog)."""
    ev = load(spark, sf, "events")
    return (
        ev.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("ws"),
            "event_type",
            "n",
        )
    )


@query(
    "q_percentile",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
           round(quantile_cont(o_totalprice, 0.95), 2) AS p95,
           round(max(o_totalprice), 2) AS mx
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_percentile(spark: SparkSession, sf: str) -> DataFrame:
    """Exact percentiles per group (the sketch-free baseline; at 100 TB
    swap percentile_approx — same query shape, bounded memory)."""
    o = load(spark, sf, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 2).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.95)"), 2).alias("p95"),
        F.round(F.max("o_totalprice"), 2).alias("mx"),
    )


@query(
    "q_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
             RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW), 2) AS sum_30d
    FROM orders
    """,
)
def q_range_frame(spark: SparkSession, sf: str) -> DataFrame:
    """RANGE-frame running aggregate (30-day trailing spend per customer)
    — rangeBetween on epoch seconds (SURVEY §2.5 rangeBetween row)."""
    o = load(spark, sf, "orders")
    # o_orderdate arrives as TIMESTAMP_NTZ; route through ltz (session tz
    # is UTC) to get the same naive-UTC epoch DuckDB's epoch() computes
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-2592000, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("sum_30d"),
    )


@query(
    "q_skew_join",
    oracle="""
    WITH skewed AS (
      SELECT event_id,
             CASE WHEN user_id % 3 = 0 THEN 0 ELSE user_id END AS k,
             value
      FROM events
    ),
    dim AS (SELECT DISTINCT user_id AS k, user_id * 10 AS dim_val FROM events)
    SELECT count(*) AS n, round(sum(value), 2) AS sum_value,
           CAST(sum(dim_val) AS BIGINT) AS sum_dim
    FROM skewed JOIN dim USING (k)
    """,
)
def q_skew_join(spark: SparkSession, sf: str) -> DataFrame:
    """Salted join under a manufactured hot key (a third of events collapse
    onto k=0): the salt spreads the hot partition across 8 shuffle
    partitions while staying row-identical to the plain join — the oracle
    IS the plain join."""
    from big_data___knowledge_graph_construction_with_llm_spark.operators.relational import salted_join

    ev = load(spark, sf, "events")
    skewed = ev.select(
        "event_id",
        F.when(F.col("user_id") % 3 == 0, 0).otherwise(F.col("user_id")).alias("k"),
        "value",
    )
    dim = ev.select(F.col("user_id").alias("k")).distinct().withColumn(
        "dim_val", F.col("k") * 10
    )
    joined = salted_join(skewed, dim, "k", num_salts=8)
    return joined.agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.sum("dim_val").cast("bigint").alias("sum_dim"),
    )


@query("q_approx_sketches")  # HLL++/KLL internals are engine-specific — rows-only
def q_approx_sketches(spark: SparkSession, sf: str) -> DataFrame:
    """Sketch-based aggregates (the bounded-memory path the exact
    q_count_distinct / q_percentile swap to at 100 TB):
    approx_count_distinct (HLL++) and percentile_approx (KLL-ish).
    Accuracy bounds are unit-tested against the exact values."""
    o = load(spark, sf, "orders")
    return o.agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("acd_cust"),
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("ap50"),
        F.percentile_approx("o_totalprice", 0.95, 10000).alias("ap95"),
    )
