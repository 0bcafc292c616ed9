"""Relational operator coverage (SURVEY.md §2b) as oracle-checked queries.

The reference has no joins/aggs/windows (SURVEY §2b table) — our engine
surface is DataFrame/SQL, so these come from Catalyst. Each query here
pins one category on the TPC-H-ish fixtures and has a DuckDB oracle.

Scale notes (100 TB discipline):
- Dimension joins (region/nation/customer/supplier/part) are marked
  ``F.broadcast`` — at any scale these stay tiny relative to the fact
  tables, so no shuffle of the big side.
- Fact-fact joins (orders⋈lineitem) shuffle on the join key; AQE
  handles skew splitting (session.py).
- Aggregations use map-side partial aggregation automatically; sums go
  through decimal casts (functions.dsum) which stay inside codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from kinesis_producer_spark.functions import (
    davg,
    davg_d,
    davg_d_sql,
    davg_sql,
    dsum,
    dsum_sql,
)
from kinesis_producer_spark.registry import query
from kinesis_producer_spark.tables import load_table


# ---------------------------------------------------------------------------
# Aggregation: groupBy + multi-agg (hash agg, partial+final) — TPC-H Q1 shape
# ---------------------------------------------------------------------------
@query(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity')} AS sum_qty,
           {dsum_sql('l_extendedprice')} AS sum_base_price,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {davg_sql('l_quantity')} AS avg_qty,
           {davg_sql('l_extendedprice')} AS avg_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: per-flag/status pricing summary — sums, averages, counts over recent lineitems."""
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Join: 5-way inner join, broadcast dims + fact-fact shuffle — TPC-H Q5 shape
# ---------------------------------------------------------------------------
@query(
    "q02_revenue_by_nation",
    oracle=f"""
    SELECT n_name, {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def q02_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by nation over a date window: fact scan joined to broadcast dims, grouped and summed."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    lineitem = load_table(spark, sf_dir, "lineitem")
    # dims broadcast: region/nation/customer stay < a few GB even at 100 TB
    # fact scale; only orders⋈lineitem shuffles (on the join key).
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


# ---------------------------------------------------------------------------
# Single-row global aggregate with selective predicates — TPC-H Q6 shape
# (predicate pushdown: all three filters reach the parquet scan)
# ---------------------------------------------------------------------------
@query(
    "q03_forecast_revenue",
    oracle=f"""
    SELECT {dsum_sql('l_extendedprice * l_discount')} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q03_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: forecast revenue delta from discounted small-quantity lineitems in a year band."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# Left outer join + null handling
# ---------------------------------------------------------------------------
@query(
    "q04_customer_order_stats",
    oracle=f"""
    SELECT c_nationkey,
           COUNT(*) AS n_customers,
           COUNT(o.o_orderkey) AS n_orders,
           {dsum_sql('COALESCE(o.o_totalprice, 0)')} AS total_spend,
           CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_customer_rows_without_orders
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c_nationkey
    """,
)
def q04_customer_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order counts and totals: fact agg joined back to the customer dim."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    joined = c.join(o, F.col("o_custkey") == F.col("c_custkey"), "left")
    return joined.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.count("o_orderkey").alias("n_orders"),
        dsum(F.coalesce(F.col("o_totalprice"), F.lit(0.0)), "total_spend"),
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)).alias(
            "n_customer_rows_without_orders"
        ),
    )


# ---------------------------------------------------------------------------
# Semi join (EXISTS)
# ---------------------------------------------------------------------------
@query(
    "q05_semi_join",
    oracle="""
    SELECT c_nationkey, COUNT(*) AS n_customers_with_1995_orders
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '1995-01-01'
        AND o.o_orderdate <  TIMESTAMP '1996-01-01'
    )
    GROUP BY c_nationkey
    """,
)
def q05_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join: customers having at least one qualifying order (EXISTS shape)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    return (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers_with_1995_orders"))
    )


# ---------------------------------------------------------------------------
# Anti join (NOT EXISTS)
# ---------------------------------------------------------------------------
@query(
    "q06_anti_join",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers_without_orders
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
)
def q06_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join: customers with no orders (NOT EXISTS shape)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers_without_orders"))
    )


# ---------------------------------------------------------------------------
# Theta / band join: equi key + range condition on a non-key column
# ---------------------------------------------------------------------------
@query(
    "q07_band_join",
    oracle=f"""
    SELECT p_brand,
           COUNT(*) AS n_lineitems,
           {dsum_sql('l_extendedprice')} AS sum_price
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
             AND l_quantity BETWEEN p_size - 5 AND p_size + 5
    GROUP BY p_brand
    """,
)
def q07_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi band join: order price within a +/- band of a small reference frame."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        (F.col("l_partkey") == F.col("p_partkey"))
        & (F.col("l_quantity") >= F.col("p_size") - 5)
        & (F.col("l_quantity") <= F.col("p_size") + 5)
    )
    # part is a dimension → broadcast; the band predicate evaluates
    # post-probe inside the same codegen stage (no extra pass).
    return (
        l.join(F.broadcast(p), cond)
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_lineitems"), dsum("l_extendedprice", "sum_price"))
    )


# ---------------------------------------------------------------------------
# As-of join: for each purchase event, the user's most recent click ≤ ts.
# Spark has no native as-of join; the scalable formulation is
# union → single window pass (no pandas, no per-group shuffle beyond the
# one hash partition on user_id). See operators/asof.py for the general op.
# ---------------------------------------------------------------------------
@query(
    "q08_asof_join",
    oracle="""
    WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
    SELECT p.event_id, p.user_id, p.ts, m.click_ts
    FROM p
    LEFT JOIN (
      SELECT p.event_id AS eid, MAX(c.ts) AS click_ts
      FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts
      GROUP BY p.event_id
    ) m ON m.eid = p.event_id
    """,
)
def q08_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event matched to the latest order at or before its time, per key."""
    from kinesis_producer_spark.operators.asof import asof_join

    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", F.col("ts").alias("click_ts"))
    return asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="click_ts", inclusive=True
    )


# ---------------------------------------------------------------------------
# Window: ranking (top-k per group), deterministic tie-break
# ---------------------------------------------------------------------------
@query(
    "q09_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rk
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders
    ) WHERE rk <= 3
    """,
)
def q09_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via partitioned row_number — the window-filter idiom."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 3)
    )


# ---------------------------------------------------------------------------
# Window: running (frame-based) aggregate, exact decimal accumulation
# ---------------------------------------------------------------------------
@query(
    "q10_running_sum",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM(CAST(FLOOR(l_quantity * 10000 + 0.5) AS HUGEINT))
                OVER (PARTITION BY l_suppkey
                      ORDER BY l_shipdate, l_orderkey, l_linenumber
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS running_qty
    FROM lineitem
    WHERE l_suppkey <= 10
    """,
)
def q10_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer over order time (unbounded-preceding window sum)."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 10)
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    quant = F.floor(F.col("l_quantity") * 10000 + F.lit(0.5)).cast("decimal(38,0)")
    return l.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(quant).over(w).cast("bigint").alias("running_qty"),
    )


# ---------------------------------------------------------------------------
# Window: analytic lag/lead
# ---------------------------------------------------------------------------
@query(
    "q11_lag_lead",
    oracle="""
    SELECT event_id, user_id, value,
           LAG(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
           LEAD(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value
    FROM events
    WHERE event_type = 'purchase'
    """,
)
def q11_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead deltas per customer: gap to previous and next order amounts."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
    )


# ---------------------------------------------------------------------------
# Grouping sets / cube / rollup
# ---------------------------------------------------------------------------
@query(
    "q12_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity')} AS sum_qty, COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q12_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dims with exact sums — all 4 grouping combinations in one pass."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.cube("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", "sum_qty"), F.count(F.lit(1)).alias("n")
    )


@query(
    "q13_rollup",
    oracle=f"""
    SELECT r_name, n_name, COUNT(*) AS n_customers,
           {dsum_sql('c_acctbal')} AS sum_acctbal
    FROM customer
    JOIN nation ON n_nationkey = c_nationkey
    JOIN region ON r_regionkey = n_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def q13_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over nation/status hierarchy with subtotal and grand-total rows."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey")).join(
        F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey")
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_customers"), dsum("c_acctbal", "sum_acctbal")
    )


@query(
    "q14_grouping_sets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n, {dsum_sql('o_totalprice')} AS sum_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def q14_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping-id disambiguation of subtotal rows."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    # Spark-dialect mirror of functions.dsum (no HUGEINT in Spark SQL)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n,
               CAST(SUM(CAST(FLOOR(CAST(o_totalprice AS DOUBLE) * 10000 + 0.5)
                 AS DECIMAL(38,0))) AS BIGINT) AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


# ---------------------------------------------------------------------------
# Distinct aggregation
# ---------------------------------------------------------------------------
@query(
    "q15_distinct_agg",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS n_supp,
           COUNT(DISTINCT l_partkey) AS n_part,
           COUNT(DISTINCT l_orderkey) AS n_orders
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q15_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed distinct and plain aggregates in one grouped pass."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# Set operations: union / intersect / except
# ---------------------------------------------------------------------------
@query(
    "q16_set_ops",
    oracle="""
    WITH c95 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'),
         c96 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01')
    SELECT 'union' AS op, COUNT(*) AS n FROM (SELECT o_custkey FROM c95 UNION SELECT o_custkey FROM c96)
    UNION ALL
    SELECT 'intersect' AS op, COUNT(*) AS n FROM (SELECT o_custkey FROM c95 INTERSECT SELECT o_custkey FROM c96)
    UNION ALL
    SELECT 'except' AS op, COUNT(*) AS n FROM (SELECT o_custkey FROM c95 EXCEPT SELECT o_custkey FROM c96)
    """,
)
def q16_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over customer key sets, tagged and counted."""
    o = load_table(spark, sf_dir, "orders")

    def custs(y0: str, y1: str) -> DataFrame:
        return (
            o.filter(
                (F.col("o_orderdate") >= F.lit(y0).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(y1).cast("timestamp"))
            )
            .select("o_custkey")
            .distinct()
        )

    c95 = custs("1995-01-01", "1996-01-01")
    c96 = custs("1996-01-01", "1997-01-01")
    return (
        c95.union(c96).distinct().agg(F.lit("union").alias("op"), F.count(F.lit(1)).alias("n"))
        .union(c95.intersect(c96).agg(F.lit("intersect").alias("op"), F.count(F.lit(1)).alias("n")))
        .union(c95.subtract(c96).agg(F.lit("except").alias("op"), F.count(F.lit(1)).alias("n")))
    )


# ---------------------------------------------------------------------------
# Scalar functions: string / date / math
# ---------------------------------------------------------------------------
@query(
    "q17_scalar_fns",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name) AS name_upper,
           LENGTH(p_name) AS name_len,
           SUBSTR(p_name, 1, 5) AS name_pfx,
           CONCAT(p_brand, ':', p_type) AS brand_type,
           REGEXP_EXTRACT(p_name, '([a-z]+)', 1) AS first_word,
           CAST(FLOOR(CAST(p_retailprice AS DOUBLE) * 10 + 0.5) AS BIGINT) AS price_r1_x10,
           CAST(FLOOR(ABS(CAST(p_retailprice AS DOUBLE) - 1000.0) * 100 + 0.5) AS BIGINT) AS price_dist_cents,
           MOD(p_size, 7) AS size_mod,
           CAST(FLOOR(SQRT(CAST(p_size AS DOUBLE)) * 1000000.0) AS BIGINT) AS size_sqrt_x1e6
    FROM part
    """,
)
def q17_scalar_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar-function battery: case, trim, substring, replace, concat over dim values."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_pfx"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        # Hash-safe surface: round/abs/sqrt land on explicit integer
        # lattices (floor(x·scale + 0.5)) instead of engine ROUND — the
        # same IEEE ops run on both engines, and no double reaches the
        # gate hasher.
        F.floor(F.col("p_retailprice").cast("double") * 10 + F.lit(0.5))
        .cast("bigint")
        .alias("price_r1_x10"),
        F.floor(F.abs(F.col("p_retailprice").cast("double") - 1000.0) * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("price_dist_cents"),
        (F.col("p_size") % 7).alias("size_mod"),
        F.floor(F.sqrt(F.col("p_size").cast("double")) * F.lit(1000000.0))
        .cast("bigint")
        .alias("size_sqrt_x1e6"),
    )


@query(
    "q18_date_fns",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INT) AS y,
           CAST(MONTH(o_orderdate) AS INT) AS m,
           CAST(DAY(o_orderdate) AS INT) AS d,
           CAST(o_orderdate AS DATE) AS odate,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
           CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start
    FROM orders WHERE o_orderkey <= 5000
    """,
)
def q18_date_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime scalar battery: trunc, extract, date arithmetic over order dates."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 5000)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.col("o_orderdate").cast("date").alias("odate"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
    )


# ---------------------------------------------------------------------------
# Pivot (EAV-style wide rotation on a relational table)
# ---------------------------------------------------------------------------
@query(
    "q19_pivot_status",
    oracle=f"""
    SELECT c_mktsegment,
           {dsum_sql("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")} AS status_O,
           {dsum_sql("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")} AS status_F,
           {dsum_sql("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END")} AS status_P
    FROM orders JOIN customer ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    """,
)
def q19_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order status into columns per priority (declared pivot values)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    quant = F.floor(F.col("o_totalprice") * 10000 + F.lit(0.5)).cast("decimal(38,0)")
    piv = (
        o.join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.sum(quant).cast("bigint"))
    )
    return piv.select(
        "c_mktsegment",
        F.col("O").alias("status_O"),
        F.col("F").alias("status_F"),
        F.col("P").alias("status_P"),
    )


# ---------------------------------------------------------------------------
# Sessionization (gap-based) via window functions — batch analog of
# streaming session_window; same algorithm DuckDB can run.
# ---------------------------------------------------------------------------
@query(
    "q20_sessionize",
    oracle="""
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE OR
                       LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), s AS (
      SELECT user_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM g
    )
    SELECT user_id, COUNT(DISTINCT session_id) AS n_sessions, COUNT(*) AS n_events
    FROM s GROUP BY user_id
    """,
)
def q20_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min) via window lag + running session counter."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts")).over(w).cast("long")
    new_session = F.when(gap.isNull() | (gap > 30 * 60), 1).otherwise(0)
    ws = W.partitionBy("user_id").orderBy("ts").rowsBetween(W.unboundedPreceding, W.currentRow)
    sessions = e.select("user_id", "ts", "event_id").withColumn(
        "session_id", F.sum(new_session).over(ws)
    )
    return sessions.groupBy("user_id").agg(
        F.countDistinct("session_id").alias("n_sessions"), F.count(F.lit(1)).alias("n_events")
    )


# ---------------------------------------------------------------------------
# JSON extraction + time-bucketed aggregation (batch analog of a
# tumbling-window streaming agg; date_trunc is engine-portable).
# ---------------------------------------------------------------------------
@query(
    "q21_hourly_rollup",
    oracle=f"""
    SELECT DATE_TRUNC('hour', ts) AS hour_start, event_type,
           COUNT(*) AS n, {dsum_sql('value')} AS sum_value
    FROM events
    GROUP BY DATE_TRUNC('hour', ts), event_type
    """,
)
def q21_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-hour event rollup (batch analog of the streaming window agg)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_trunc("hour", "ts").alias("hour_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "sum_value"))
    )


@query(
    "q22_json_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MAX(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def q22_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the events props column with typed casts.

    Oracle parity: both engines parse JSON (get_json_object ↔
    json_extract_string) and both use a NULL-on-failure cast
    (Spark ``try_cast`` ↔ DuckDB TRY_CAST — a plain cast THROWS under
    Spark 4's default ANSI mode), so non-integer or absent ``k``
    values degrade identically instead of regex-vs-JSON drift.
    """
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("bigint")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
    )


# ---------------------------------------------------------------------------
# Global sort + limit-free top-k (deterministic filter form) and
# first/last aggregates
# ---------------------------------------------------------------------------
@query(
    "q23_global_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM (
      SELECT o_orderkey, o_custkey, o_totalprice,
             ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders
    ) WHERE rk <= 100
    """,
)
def q23_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k by total order value — TakeOrderedAndProject, no full sort.

    Scale: orderBy().limit(k) compiles to TakeOrderedAndProject — each
    task keeps a k-row heap and the driver merges |tasks|·k rows; no
    single-partition global window ever exists (the round-1 registered
    form ran row_number() over a partition-less window — a one-task
    sort of the whole table at 100×). Determinism comes from the
    (o_totalprice DESC, o_orderkey) total order in the sort key itself,
    matching the oracle's ROW_NUMBER tie-break.
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Exact percentiles / median — interpolation kept bit-exact across engines
# by quantizing inputs to integer cents first (integer lattice + binary
# fractions 0.25/0.5/0.75 → every intermediate is representable).
# ---------------------------------------------------------------------------


@query(
    "q24_percentiles",
    oracle="""
    SELECT l_returnflag,
           CAST(quantile_cont(FLOOR(l_extendedprice * 100 + 0.5), 0.25) * 4 AS BIGINT) AS price_q1_x4,
           CAST(quantile_cont(FLOOR(l_extendedprice * 100 + 0.5), 0.5)  * 4 AS BIGINT) AS price_q2_x4,
           CAST(quantile_cont(FLOOR(l_extendedprice * 100 + 0.5), 0.75) * 4 AS BIGINT) AS price_q3_x4,
           CAST(quantile_cont(FLOOR(l_quantity * 100 + 0.5), 0.5) * 4 AS BIGINT) AS qty_median_x4
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q24_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (sort-based, interpolating) percentiles per group.

    Hash-safe surface: inputs are quantized to integer cents, so each
    interpolated quartile lands on a quarter-integer lattice — ×4 makes
    it an exact BIGINT (the round-1 gate cannot hash array cells and is
    exposed to double rendering, so no array<double> output here).
    """
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
    qcents = F.floor(F.col("l_quantity") * 100 + F.lit(0.5))
    return li.groupBy("l_returnflag").agg(
        (F.percentile(cents, F.lit(0.25)) * 4).cast("bigint").alias("price_q1_x4"),
        (F.percentile(cents, F.lit(0.5)) * 4).cast("bigint").alias("price_q2_x4"),
        (F.percentile(cents, F.lit(0.75)) * 4).cast("bigint").alias("price_q3_x4"),
        (F.percentile(qcents, F.lit(0.5)) * 4).cast("bigint").alias("qty_median_x4"),
    )


# ---------------------------------------------------------------------------
# Array + map scalar functions (SURVEY §2b scalar-fn row, collection side)
# ---------------------------------------------------------------------------


@query(
    "q25_array_map_fns",
    oracle="""
    WITH base AS (
      SELECT p_partkey, p_brand, (p_size % 5) + 2 AS n FROM part
    ), arr AS (
      SELECT p_partkey, p_brand, n, range(1, n + 1) AS seq FROM base
    )
    SELECT p_partkey,
           len(seq) AS seq_len,
           seq[-1] AS seq_last,
           list_reverse(seq)[1] AS rev_first,
           CAST(list_sum(list_transform(seq, x -> x * x)) AS BIGINT) AS sum_sq,
           list_contains(seq, 3) AS has_three,
           array_to_string(seq[2:3], ',') AS mid_slice_csv,
           array_to_string(seq, ',') AS seq_csv,
           p_brand AS brand_lookup,
           CAST(n AS BIGINT) AS size_lookup
    FROM arr
    """,
)
def q25_array_map_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array construction/transform/aggregate + map build/lookup, all as
    JVM-side column expressions (no UDFs, codegen-friendly).

    Hash-safe surface: array-typed cells are CSV-serialized
    (concat_ws ↔ array_to_string) because the driver's hasher cannot
    factorize list cells (round-1 q25 err: unhashable type 'list').
    Integer elements render identically on both engines.
    """
    p = load_table(spark, sf_dir, "part")
    n = (F.col("p_size") % 5 + 2).cast("int")
    seq = F.sequence(F.lit(1), n)
    m = F.create_map(
        F.lit("brand"), F.col("p_brand"), F.lit("size"), n.cast("string")
    )
    return p.select(
        "p_partkey",
        F.size(seq).alias("seq_len"),
        F.element_at(seq, -1).alias("seq_last"),
        F.element_at(F.reverse(seq), 1).alias("rev_first"),
        F.aggregate(
            F.transform(seq, lambda x: (x * x).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("sum_sq"),
        F.array_contains(seq, 3).alias("has_three"),
        F.concat_ws(",", F.slice(seq, 2, 2).cast("array<string>")).alias("mid_slice_csv"),
        F.concat_ws(",", seq.cast("array<string>")).alias("seq_csv"),
        F.element_at(m, "brand").alias("brand_lookup"),
        F.element_at(m, "size").cast("bigint").alias("size_lookup"),
    )


# ---------------------------------------------------------------------------
# Correlated subqueries (EXISTS / IN / scalar) through the SQL surface
# ---------------------------------------------------------------------------

_Q26_SQL = """
    SELECT c.c_custkey, c.c_name,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM {orders} o
            WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F') AS n_finished
    FROM {customer} c
    WHERE EXISTS (SELECT 1 FROM {orders} o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
      AND c.c_nationkey IN (SELECT n_nationkey FROM {nation} WHERE n_regionkey <= 2)
"""


@query("q26_correlated_subqueries", oracle=_Q26_SQL.format(orders="orders", customer="customer", nation="nation"))
def q26_correlated_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS + IN + correlated scalar subquery in one statement —
    Catalyst decorrelates all three into joins (plan-audited: no
    per-row subquery execution)."""
    for t in ("customer", "orders", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"v_{t}")
    return spark.sql(_Q26_SQL.format(orders="v_orders", customer="v_customer", nation="v_nation"))


# ---------------------------------------------------------------------------
# Skew & range-join strategies (operators/skew.py) — semantics must be
# indistinguishable from the naive join, which is exactly what the
# oracle checks.
# ---------------------------------------------------------------------------


@query(
    "q27_salted_join",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, o.o_totalprice, o.o_orderpriority
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
)
def q27_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key-proof fact⋈fact join: the key is salted 16 ways (left
    sprays by line-number hash, right replicated) — same rows as the
    plain equi-join, but no single reducer ever owns a whole key."""
    from kinesis_producer_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice", "o_orderpriority"
    )
    return salted_join(li, o, on="l_orderkey", salt=16, left_entropy_col="l_linenumber")


@query(
    "q28_binned_range_join",
    oracle="""
    WITH iv AS (
      SELECT c_custkey, c_acctbal * 50.0 AS lo, c_acctbal * 50.0 + 25000.0 AS hi
      FROM customer
    )
    SELECT iv.c_custkey,
           CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS HUGEINT)) AS BIGINT) AS sum_cents
    FROM iv JOIN orders o ON o.o_totalprice >= iv.lo AND o.o_totalprice < iv.hi
    GROUP BY iv.c_custkey
    """,
)
def q28_binned_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-join aggregate, answered by the prefix-sum plan.

    Historically this query materialized the (point, interval) pairs
    through ``binned_range_join`` and aggregated per customer — ~102M
    real pairs at sf0.1 for a ~15k-row answer, an avoidable O(pairs)
    shuffle that grows quadratically with bin density at scale. Since
    the consumer only wants per-interval COUNT/SUM, it now routes
    through ``range_aggregate`` (operators/skew.py): identical oracle
    answer, O(|points| + |intervals|) shuffle (26.9s → ~1s at sf0.1).
    ``binned_range_join`` remains the general pair-PRODUCING operator
    (bounded-output contract pinned in
    tests/test_scale_strategies.py)."""
    from kinesis_producer_spark.operators.skew import range_aggregate

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    iv = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        (F.col("c_acctbal") * 50.0).alias("lo"),
        (F.col("c_acctbal") * 50.0 + 25000.0).alias("hi"),
    )
    agg = range_aggregate(
        o,
        iv,
        "o_totalprice",
        "lo",
        "hi",
        id_col="c_custkey",
        bin_width=25000.0,
        value=F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)),
    )
    return agg.where(F.col("n_points") > 0).select(
        "c_custkey",
        F.col("n_points").cast("bigint").alias("n_orders"),
        F.col("sum_value").cast("bigint").alias("sum_cents"),
    )


@query(
    "q29_full_outer_join",
    oracle="""
    WITH big AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) n_big
                 FROM orders WHERE o_totalprice > 300000 GROUP BY o_custkey),
    urgent AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) n_urgent
               FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey)
    SELECT COALESCE(b.o_custkey, u.o_custkey) AS custkey,
           COALESCE(b.n_big, 0) AS n_big, COALESCE(u.n_urgent, 0) AS n_urgent,
           COALESCE(b.n_big, 0) + COALESCE(u.n_urgent, 0) AS total
    FROM big b FULL OUTER JOIN urgent u ON b.o_custkey = u.o_custkey
    """,
)
def q29_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with null-side coalescing — completes the join
    family (inner/left/right/full/semi/anti/cross all covered)."""
    o = load_table(spark, sf_dir, "orders")
    big = (
        o.filter(F.col("o_totalprice") > 300000)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_big"))
    )
    urgent = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_urgent"))
    )
    b, u = big.alias("b"), urgent.alias("u")
    return b.join(u, F.col("b.o_custkey") == F.col("u.o_custkey"), "full_outer").select(
        F.coalesce(F.col("b.o_custkey"), F.col("u.o_custkey")).alias("custkey"),
        # COALESCE to 0 on BOTH sides: a NULL-bearing int column goes
        # float64 in the driver's pandas canonicalization (repr drift
        # hazard); 0 is unambiguous since every group has count >= 1.
        F.coalesce(F.col("n_big"), F.lit(0)).alias("n_big"),
        F.coalesce(F.col("n_urgent"), F.lit(0)).alias("n_urgent"),
        (F.coalesce(F.col("n_big"), F.lit(0)) + F.coalesce(F.col("n_urgent"), F.lit(0))).alias(
            "total"
        ),
    )


@query(
    "q39_sort_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q39_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orderBy().limit() — Catalyst compiles to TakeOrderedAndProject:
    per-partition top-k, then a k-row merge on one reducer; no global
    sort ever materializes (contrast q23's window form)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@query(
    "q66_conditional_bitwise",
    oracle="""
    SELECT p_partkey,
           CASE WHEN p_size < 10 THEN 'S' WHEN p_size < 30 THEN 'M' ELSE 'L' END AS size_class,
           NULLIF(p_brand, 'Brand#11') AS brand_or_null,
           COALESCE(NULLIF(p_brand, 'Brand#11'), 'GENERIC') AS brand_filled,
           IF(p_size % 2 = 0, 'even', 'odd') AS parity,
           GREATEST(p_size, 25) AS size_floor25,
           LEAST(p_size, 25) AS size_cap25,
           p_size & 12 AS band,
           p_size | 1 AS forced_odd,
           xor(p_size, 255) AS xored,
           p_size << 2 AS shifted
    FROM part
    """,
)
def q66_conditional_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional expressions (CASE/NULLIF/COALESCE/IF/GREATEST/LEAST)
    and bitwise ops — all whole-stage-codegen scalar expressions."""
    p = load_table(spark, sf_dir, "part")
    s = F.col("p_size")
    return p.select(
        "p_partkey",
        F.when(s < 10, "S").when(s < 30, "M").otherwise("L").alias("size_class"),
        F.nullif(F.col("p_brand"), F.lit("Brand#11")).alias("brand_or_null"),
        F.coalesce(F.nullif(F.col("p_brand"), F.lit("Brand#11")), F.lit("GENERIC")).alias(
            "brand_filled"
        ),
        F.when(s % 2 == 0, "even").otherwise("odd").alias("parity"),
        F.greatest(s, F.lit(25)).alias("size_floor25"),
        F.least(s, F.lit(25)).alias("size_cap25"),
        s.bitwiseAND(F.lit(12)).alias("band"),
        s.bitwiseOR(F.lit(1)).alias("forced_odd"),
        s.bitwiseXOR(F.lit(255)).alias("xored"),
        F.shiftleft(s, 2).alias("shifted"),
    )


@query(
    "q67_window_frames",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS HUGEINT))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS win3_cents,
           FIRST_VALUE(o_orderkey) OVER w AS first_key,
           LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND UNBOUNDED FOLLOWING) AS last_key,
           NTH_VALUE(o_orderkey, 2) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND UNBOUNDED FOLLOWING) AS second_key,
           NTILE(4) OVER w AS quartile,
           CAST(FLOOR(PERCENT_RANK() OVER w * 1e6 + 0.5) AS BIGINT) AS pct_rank_micro,
           CAST(FLOOR(CUME_DIST() OVER w * 1e6 + 0.5) AS BIGINT) AS cume_micro
    FROM orders
    WHERE o_custkey <= 200
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q67_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frame varieties: bounded ROWS frames, unbounded frames,
    first/last/nth_value, ntile, percent_rank, cume_dist."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 200)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("decimal(38,0)")
    full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(cents).over(w.rowsBetween(-2, 0)).cast("bigint").alias("win3_cents"),
        F.first("o_orderkey").over(w).alias("first_key"),
        F.last("o_orderkey").over(full).alias("last_key"),
        F.nth_value("o_orderkey", 2).over(full).alias("second_key"),
        F.ntile(4).over(w).alias("quartile"),
        F.floor(F.percent_rank().over(w) * 1e6 + F.lit(0.5)).cast("bigint").alias("pct_rank_micro"),
        F.floor(F.cume_dist().over(w) * 1e6 + F.lit(0.5)).cast("bigint").alias("cume_micro"),
    )


@query(
    "q68_regex_string_fns",
    oracle="""
    SELECT c_custkey,
           CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS name_num,
           regexp_replace(c_mktsegment, '[AEIOU]', '', 'g') AS seg_novowels,
           regexp_matches(c_mktsegment, '^B') AS is_b,
           split_part(c_name, '#', 2) AS name_tail,
           translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_lower_vowels,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_pad,
           reverse(c_mktsegment) AS seg_rev,
           instr(c_name, '#') AS hash_pos,
           substring(c_mktsegment, 1, 3) AS seg3,
           printf('%08d', c_custkey) AS key_fmt,
           ascii(c_mktsegment) AS seg_ascii,
           repeat(substring(c_mktsegment, 1, 1), 3) AS seg_rep
    FROM customer
    """,
)
def q68_regex_string_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex + string scalar-function family (SURVEY §2b string fns) —
    regexp extract/replace/match, split_part, translate, pad/format,
    all whole-stage-codegen JVM expressions."""
    c = load_table(spark, sf_dir, "customer")
    seg = F.col("c_mktsegment")
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"([0-9]+)", 1).cast("bigint").alias("name_num"),
        F.regexp_replace(seg, "[AEIOU]", "").alias("seg_novowels"),
        seg.rlike("^B").alias("is_b"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("name_tail"),
        F.translate(seg, "AEIOU", "aeiou").alias("seg_lower_vowels"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_pad"),
        F.reverse(seg).alias("seg_rev"),
        F.instr(F.col("c_name"), "#").alias("hash_pos"),
        F.substring(seg, 1, 3).alias("seg3"),
        F.format_string("%08d", "c_custkey").alias("key_fmt"),
        F.ascii(seg).alias("seg_ascii"),
        F.repeat(F.substring(seg, 1, 1), 3).alias("seg_rep"),
    )


@query(
    "q69_datetime_fns",
    oracle="""
    SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           year(o_orderdate) AS yr,
           month(o_orderdate) AS mo,
           day(o_orderdate) AS dy,
           quarter(o_orderdate) AS qtr,
           dayofyear(o_orderdate) AS doy,
           isodow(o_orderdate) AS iso_dow,
           week(o_orderdate) AS wk,
           o_orderdate + INTERVAL 30 DAY AS plus30,
           last_day(o_orderdate) AS month_end,
           datediff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS days_to_98,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
           strftime(o_orderdate, '%Y-%m') AS ym
    FROM orders
    """,
)
def q69_datetime_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime scalar-function family (SURVEY §2b date fns): truncation,
    part extraction (ISO week/day-of-week), interval arithmetic,
    month boundaries, epoch seconds, formatting."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", d).alias("month_start"),
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dy"),
        F.quarter(d).alias("qtr"),
        F.dayofyear(d).alias("doy"),
        (F.weekday(d) + F.lit(1)).alias("iso_dow"),
        F.weekofyear(d).alias("wk"),
        (d + F.expr("INTERVAL 30 DAYS")).alias("plus30"),
        F.last_day(d).alias("month_end"),
        F.datediff(F.lit("1998-01-01").cast("date"), d).alias("days_to_98"),
        F.unix_timestamp(d).alias("epoch_s"),
        F.date_format(d, "yyyy-MM").alias("ym"),
    )


# ---------------------------------------------------------------------------
# Nested aggregation: share-of-total per group — TPC-H Q8 (market share) shape
# ---------------------------------------------------------------------------
@query(
    "q72_market_share",
    oracle=f"""
    WITH v AS (
      SELECT year(o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON n1.n_nationkey = c_nationkey
      JOIN region   ON r_regionkey = n1.n_regionkey
      JOIN nation n2 ON n2.n_nationkey = s_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
    )
    SELECT o_year,
           CAST(FLOOR((1000000.0 * CAST({dsum_sql("CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END")} AS DOUBLE))
             / CAST({dsum_sql('volume')} AS DOUBLE)) AS BIGINT) AS mkt_share_ppm
    FROM v GROUP BY o_year
    """,
)
def q72_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_3 suppliers' share of PROMO-part volume sold
    to AMERICA customers, per order year.

    Scale: part/supplier/customer/nation/region all broadcast (dims);
    the only shuffle is lineitem⋈orders on the orderkey, then a tiny
    groupBy on ~7 distinct years. The share is a ratio of two
    quantized-exact sums (functions.dsum) floored to integer parts-per-
    million, so the gate surface carries no doubles and the one double
    division runs identically on both engines.
    """
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    v = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey"))),
            F.col("c_nationkey") == F.col("c_nk"),
        )
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(
            F.broadcast(
                n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
            ),
            F.col("s_nationkey") == F.col("s_nk"),
        )
        .select(
            F.year("o_orderdate").alias("o_year"),
            volume.alias("volume"),
            F.col("supp_nation"),
        )
    )
    nation_volume = F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
        F.lit(0.0)
    )
    return v.groupBy("o_year").agg(
        F.floor(
            (F.lit(1000000.0) * dsum(nation_volume).cast("double"))
            / dsum("volume").cast("double")
        )
        .cast("bigint")
        .alias("mkt_share_ppm")
    )


# ---------------------------------------------------------------------------
# Agg + scalar-subquery max + join-back — TPC-H Q15 (top supplier) shape
# ---------------------------------------------------------------------------
@query(
    "q73_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             {dsum_sql('l_extendedprice * (1 - l_discount)')} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
)
def q73_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with max quarterly revenue.

    The max is computed once on the aggregated (≤|suppliers| rows) frame
    and broadcast back — no second scan of lineitem, no window over the
    whole fact table. Revenue equality is exact (dsum), so the
    max-match predicate is portable across engines.
    """
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue")
    )
    top = rev.agg(F.max("total_revenue").alias("max_revenue"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(top), F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# Correlated aggregate threshold (join on pre-agg) — TPC-H Q17 shape
# ---------------------------------------------------------------------------
@query(
    "q74_small_quantity_revenue",
    oracle=f"""
    WITH qa AS (
      SELECT l_partkey AS pk, 0.2 * {davg_d_sql('l_quantity')} AS qty_threshold
      FROM lineitem GROUP BY l_partkey)
    SELECT CAST(FLOOR(CAST({dsum_sql('l_extendedprice')} AS DOUBLE) / 7.0) AS BIGINT) AS avg_yearly,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN qa   ON pk = l_partkey
    WHERE p_brand = 'Brand#23' AND l_quantity < qty_threshold
    """,
)
def q74_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from below-avg-quantity line items of one
    brand, expressed as a join against the per-part aggregate (the
    idiomatic Spark decorrelation of TPC-H's correlated scalar subquery).

    Scale: the per-part aggregate is |part|-sized → broadcast back onto
    lineitem; the part dim is broadcast too, so the fact table is
    scanned once with zero shuffles of the big side. The threshold is
    0.2 × an exact average (functions.davg), so the `<` comparison is
    bit-identical across engines.
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    qa = l.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.lit(0.2) * davg_d("l_quantity")).alias("qty_threshold")
    )
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(qa), F.col("pk") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.floor(dsum("l_extendedprice").cast("double") / F.lit(7.0))
            .cast("bigint")
            .alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# Dual correlated EXISTS / NOT EXISTS (decorrelated) — TPC-H Q21 shape
# ---------------------------------------------------------------------------
@query(
    "q77_sole_heavy_supplier",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_quantity > 45) h
    JOIN orders   ON o_orderkey = h.l_orderkey AND o_orderstatus = 'F'
    JOIN supplier ON s_suppkey = h.l_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = h.l_orderkey AND l2.l_suppkey <> h.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = h.l_orderkey AND l3.l_suppkey <> h.l_suppkey
                        AND l3.l_quantity > 45)
    GROUP BY s_name
    """,
)
def q77_sole_heavy_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (main.py has no joins at all — SURVEY §2b): per
    supplier, the finished multi-supplier orders where it was the ONLY
    supplier with a heavy (>45 qty) line. The oracle keeps the textbook
    EXISTS / NOT EXISTS form; the Spark side is the idiomatic
    decorrelation — one per-order aggregate computed in a single pass
    over lineitem instead of two correlated re-scans.

    Scale: lineitem is shuffled ONCE on l_orderkey; the per-order
    aggregate, the distinct heavy pairs, and both joins back are all
    co-partitioned on that same key (exchange reuse). orders⋈ on the
    orderkey rides the same partitioning; supplier is a broadcast dim.
    """
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_quantity"
    )
    per_order = l.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("l_quantity") > 45, F.col("l_suppkey"))
        ).alias("n_heavy"),
    )
    heavy = l.filter(F.col("l_quantity") > 45).select("l_orderkey", "l_suppkey").distinct()
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    s = load_table(spark, sf_dir, "supplier")
    return (
        heavy.join(
            per_order.filter((F.col("n_supp") >= 2) & (F.col("n_heavy") == 1)),
            "l_orderkey",
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# ---------------------------------------------------------------------------
# Scalar subquery threshold + NOT EXISTS anti-join — TPC-H Q22 shape
# ---------------------------------------------------------------------------
@query(
    "q78_inactive_high_balance",
    oracle=f"""
    WITH pool AS (
      SELECT c_custkey, c_mktsegment, c_acctbal,
             CAST(FLOOR(c_acctbal * 10000 + 0.5) AS HUGEINT) AS bal_q
      FROM customer
      WHERE c_mktsegment IN ('AUTOMOBILE', 'MACHINERY', 'FURNITURE')),
    thr AS (SELECT SUM(bal_q) AS sum_q, COUNT(*) AS cnt FROM pool WHERE c_acctbal > 0)
    SELECT c_mktsegment AS segment, COUNT(*) AS numcust,
           {dsum_sql('c_acctbal')} AS totacctbal
    FROM pool, thr
    WHERE bal_q * cnt > sum_q
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    """,
)
def q78_inactive_high_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers in three segments with above-average
    positive balance and no URGENT orders, rolled up per segment. (The
    synthetic orders table gives nearly every customer an order, so the
    textbook "no orders at all" predicate is vacuous here; restricting
    the NOT EXISTS to urgent orders keeps the anti-join non-trivial.)

    Cross-engine exactness: the `acctbal > avg(acctbal)` comparison is
    multiplied through into the quantized-integer domain
    (bal·10⁴·count > Σbal·10⁴) so no float division is compared.

    Scale: the threshold is a single-row aggregate (broadcast cross
    join); the NOT EXISTS is a left-anti join of customer against
    orders on custkey — the only shuffle of big data, and AQE converts
    it to broadcast when the filtered customer side is small.
    """
    segs = ("AUTOMOBILE", "MACHINERY", "FURNITURE")
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment").isin(*segs))
    bal_q = F.floor(F.col("c_acctbal") * 10000 + F.lit(0.5)).cast("decimal(38,0)")
    pool = c.select("c_custkey", "c_mktsegment", "c_acctbal", bal_q.alias("bal_q"))
    thr = (
        pool.filter(F.col("c_acctbal") > 0)
        .agg(F.sum("bal_q").alias("sum_q"), F.count(F.lit(1)).alias("cnt"))
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        pool.crossJoin(F.broadcast(thr))
        .filter(F.col("bal_q") * F.col("cnt") > F.col("sum_q"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal", "totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Correlated share-of-part threshold + semi-join — TPC-H Q20 shape
# ---------------------------------------------------------------------------
@query(
    "q79_dominant_red_suppliers",
    oracle="""
    WITH sq AS (
      SELECT l_partkey AS pk, l_suppkey AS sk,
             SUM(CAST(FLOOR(l_quantity * 10000 + 0.5) AS HUGEINT)) AS qty_q
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l_partkey, l_suppkey),
    tot AS (SELECT pk, SUM(qty_q) AS tot_q FROM sq GROUP BY pk),
    qual AS (
      SELECT DISTINCT sq.sk
      FROM sq
      JOIN tot  ON tot.pk = sq.pk
      JOIN part ON p_partkey = sq.pk
      WHERE p_name LIKE 'red %' AND 2 * qty_q > tot_q)
    SELECT s_name, n_name
    FROM supplier JOIN qual ON s_suppkey = sk
    JOIN nation ON n_nationkey = s_nationkey
    """,
)
def q79_dominant_red_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (no partsupp fixture, so the availability
    predicate becomes a shipped-share predicate): suppliers that shipped
    a majority (>50%) of some red part's 1997 volume, with their nation.

    The >50% share test is `2·qty > total` in quantized-integer space —
    no float ratio crosses engines.

    Scale: one shuffle of the filtered year of lineitem on
    (partkey, suppkey); the per-part total re-aggregates the ALREADY
    aggregated (≤ |part|·|supp-per-part| rows) frame, and the
    threshold join is co-partitioned on partkey. part is a broadcast
    dim; the final supplier/nation joins are broadcasts onto a
    DISTINCT-ed, tiny qualifier set.
    """
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    qty_q = F.floor(F.col("l_quantity") * 10000 + F.lit(0.5)).cast("decimal(38,0)")
    sq = (
        l.select(
            F.col("l_partkey").alias("pk"),
            F.col("l_suppkey").alias("sk"),
            qty_q.alias("q"),
        )
        .groupBy("pk", "sk")
        .agg(F.sum("q").alias("qty_q"))
    )
    tot = sq.groupBy("pk").agg(F.sum("qty_q").alias("tot_q"))
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red %"))
    qual = (
        sq.join(tot, "pk")
        .join(F.broadcast(p), F.col("p_partkey") == F.col("pk"), "left_semi")
        .filter(2 * F.col("qty_q") > F.col("tot_q"))
        .select("sk")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        qual.join(F.broadcast(s), F.col("sk") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
    )


# ---------------------------------------------------------------------------
# Correlated min over a dimension-filtered join — TPC-H Q2 shape
# ---------------------------------------------------------------------------
@query(
    "q82_min_price_supplier",
    oracle="""
    WITH eu AS (
      SELECT s_suppkey, s_name, n_name
      FROM supplier
      JOIN nation ON n_nationkey = s_nationkey
      JOIN region ON r_regionkey = n_regionkey
      WHERE r_name = 'EUROPE'),
    pp AS (SELECT p_partkey, p_name FROM part WHERE p_type = 'LARGE' AND p_size <= 10),
    pl AS (
      SELECT l_partkey, l_suppkey, l_extendedprice
      FROM lineitem
      JOIN eu ON s_suppkey = l_suppkey
      JOIN pp ON p_partkey = l_partkey),
    m AS (SELECT l_partkey, MIN(l_extendedprice) AS min_price FROM pl GROUP BY l_partkey)
    SELECT DISTINCT pp.p_partkey, pp.p_name, eu.s_name, eu.n_name, m.min_price
    FROM pl
    JOIN m  ON m.l_partkey = pl.l_partkey AND pl.l_extendedprice = m.min_price
    JOIN pp ON pp.p_partkey = pl.l_partkey
    JOIN eu ON eu.s_suppkey = pl.l_suppkey
    """,
)
def q82_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (no partsupp fixture — lineitem stands in as the
    part-supplier price relation): for each LARGE small-size part, the
    EUROPE supplier(s) that quoted its minimum extended price. The
    correlated MIN subquery decorrelates to one aggregate + self-join.

    Cross-engine exactness: MIN selects an existing double (no
    arithmetic), so the equality re-join sees bit-identical values.

    Scale: both dimension filters (region-filtered supplier, the part
    slice) broadcast INTO the lineitem scan before any shuffle, so the
    priced relation `pl` is tiny; the min + equality re-join then
    shuffles only `pl` on partkey, reusing one exchange for both sides.
    """
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .select("s_suppkey", "s_name", "n_name")
    )
    pp = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_type") == "LARGE") & (F.col("p_size") <= 10))
        .select("p_partkey", "p_name")
    )
    pl = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_extendedprice")
        .join(F.broadcast(eu), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(pp), F.col("p_partkey") == F.col("l_partkey"))
    )
    m = pl.groupBy(F.col("l_partkey").alias("mk")).agg(
        F.min("l_extendedprice").alias("min_price")
    )
    return (
        pl.join(
            m,
            (F.col("mk") == F.col("l_partkey"))
            & (F.col("l_extendedprice") == F.col("min_price")),
        )
        .select("p_partkey", "p_name", "s_name", "n_name", "min_price")
        .distinct()
    )


# ---------------------------------------------------------------------------
# Bi-directional nation-pair volume — TPC-H Q7 shape
# ---------------------------------------------------------------------------
@query(
    "q83_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(YEAR(l_shipdate) AS INT) AS l_year,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY n1.n_name, n2.n_name, CAST(YEAR(l_shipdate) AS INT)
    """,
)
def q83_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations in both
    directions, per ship year. The disjunctive nation-pair predicate
    can only be applied after both nation bindings exist.

    Scale: supplier⋈nation and customer⋈nation are broadcast dims; the
    only big-data shuffle is lineitem⋈orders on orderkey. The two-year
    shipdate filter is pushed to the parquet scan (PushedFilters), and
    each single-nation filter is pushed into its own broadcast build
    side BEFORE the pair-disjunction runs — the OR only sees rows whose
    supplier and customer nations are already in the two-nation set.
    """
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    nations = ("NATION_1", "NATION_2")
    n1 = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*nations))
        .select(F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation"))
    )
    n2 = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*nations))
        .select(F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n1), F.col("nk1") == F.col("s_nationkey"))
        .select("s_suppkey", "supp_nation")
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(n2), F.col("nk2") == F.col("c_nationkey"))
        .select("c_custkey", "cust_nation")
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        l.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


# ---------------------------------------------------------------------------
# Product-line profit by nation and year — TPC-H Q9 shape
# ---------------------------------------------------------------------------
@query(
    "q84_product_profit",
    oracle=f"""
    SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS INT) AS o_year,
           {dsum_sql('l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity * 0.1')} AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, CAST(YEAR(o_orderdate) AS INT)
    """,
)
def q84_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (no partsupp: supply cost modeled as 10% of the
    part's retail price per unit): profit on widget parts by supplier
    nation and order year.

    Cross-engine exactness: the profit expression is evaluated in
    IEEE-754 double with the same association order on both engines,
    then quantized per-term and summed exactly (dsum).

    Scale: part (LIKE-filtered), supplier, nation are all broadcast;
    the single big shuffle is lineitem⋈orders on orderkey. The LIKE
    filter prunes ~87% of parts before the broadcast build, which in
    turn prunes lineitem rows at probe time — no full-fact shuffle
    happens before the selective join.
    """
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    l = load_table(spark, sf_dir, "lineitem")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity") * F.lit(0.1)
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(dsum(profit, "profit"))
    )


# ---------------------------------------------------------------------------
# Global-share HAVING threshold — TPC-H Q11 shape
# ---------------------------------------------------------------------------
@query(
    "q85_important_parts",
    oracle="""
    WITH v AS (
      SELECT l_partkey,
             SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS HUGEINT)) AS val_q
      FROM lineitem GROUP BY l_partkey),
    tot AS (SELECT SUM(val_q) AS tot_q FROM v)
    SELECT l_partkey AS partkey, CAST(val_q AS BIGINT) AS part_value
    FROM v, tot
    WHERE val_q * 2500 > tot_q
    """,
)
def q85_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose total discounted revenue exceeds a
    fixed fraction (1/2500) of the global total — a HAVING threshold
    against a scalar subquery over the same aggregate.

    Cross-engine exactness: the share test compares exact quantized
    integers (val·2500 > total) — no float ratio; the reported value
    divides the exact integer by 10⁴ once.

    Scale: ONE shuffle of lineitem on partkey produces the per-part
    aggregate; the global total re-aggregates that (tiny) frame and
    broadcasts back as a single-row cross join. At 100 TB the partial
    aggregation combines map-side, so the shuffle carries one row per
    (task, partkey), not raw lineitems.
    """
    l = load_table(spark, sf_dir, "lineitem")
    val_q = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000 + F.lit(0.5)
    ).cast("decimal(38,0)")
    v = l.select(F.col("l_partkey"), val_q.alias("q")).groupBy("l_partkey").agg(
        F.sum("q").alias("val_q")
    )
    tot = v.agg(F.sum("val_q").alias("tot_q"))
    return (
        v.crossJoin(F.broadcast(tot))
        .filter(F.col("val_q") * 2500 > F.col("tot_q"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("val_q").cast("bigint").alias("part_value"),
        )
    )


# ---------------------------------------------------------------------------
# Distribution of per-customer order counts — TPC-H Q13 shape
# ---------------------------------------------------------------------------
@query(
    "q86_order_count_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON o_custkey = c_custkey
                      AND o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c_custkey) cc
    GROUP BY c_count
    """,
)
def q86_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: histogram of customers by how many qualifying
    orders they placed (priority filter standing in for the comment
    NOT-LIKE), preserving zero-order customers via the left join.

    Scale: the outer-join predicate on priority is pushed into the
    orders scan (it's a join-side filter on the preserved-row side's
    opposite table, so pre-filtering is semantics-preserving). One
    shuffle co-partitions both tables on custkey; the second aggregate
    runs on ≤ |distinct counts| rows. At scale the first groupBy
    reuses the join's partitioning on c_custkey — no extra exchange.
    """
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "4-NOT SPECIFIED")
        .select("o_custkey", "o_orderkey")
    )
    cc = (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return cc.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# Distinct-supplier counting with NOT-IN exclusion — TPC-H Q16 shape
# ---------------------------------------------------------------------------
@query(
    "q87_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q87_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct (non-excluded) suppliers ship
    each qualifying (brand, type, size) part family. The NOT IN
    subquery (suppliers in arrears, standing in for the complaints
    LIKE) becomes a left-anti join; safe here because s_suppkey is
    never NULL, which is the one case where anti-join and NOT IN agree.

    Scale: part slice and the excluded-supplier set are both broadcast
    (the anti side is 6 rows); lineitem never shuffles until the
    count-distinct, which Spark runs as a two-phase expand/partial —
    keyed on (brand, type, size, suppkey) first, so the map side
    dedups before the exchange.
    """
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        l.join(F.broadcast(bad), F.col("s_suppkey") == F.col("l_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# IN-subquery with HAVING over a fact aggregate — TPC-H Q18 shape
# ---------------------------------------------------------------------------
@query(
    "q88_large_volume_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey,
             SUM(CAST(FLOOR(l_quantity * 10000 + 0.5) AS HUGEINT)) AS qty_q
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(FLOOR(l_quantity * 10000 + 0.5) AS HUGEINT)) > 250 * 10000)
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(qty_q AS BIGINT) AS total_qty
    FROM big
    JOIN orders   ON o_orderkey = big.l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
)
def q88_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total line quantity exceeds 250,
    with their customer. The IN (… HAVING …) subquery is the aggregate
    itself joined back — no second scan of lineitem.

    Cross-engine exactness: the HAVING compares exact quantized
    integers; the reported quantity divides once at the end.

    Scale: lineitem aggregates on orderkey (map-side partials), the
    HAVING prunes to a tiny survivor set, and BOTH subsequent joins
    flip to broadcast under AQE because the build side is the
    already-filtered aggregate, not a base table.
    """
    qty_q = F.floor(F.col("l_quantity") * 10000 + F.lit(0.5)).cast("decimal(38,0)")
    big = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", qty_q.alias("q"))
        .groupBy("l_orderkey")
        .agg(F.sum("q").alias("qty_q"))
        .filter(F.col("qty_q") > 250 * 10000)
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("qty_q").cast("bigint").alias("total_qty"),
        )
    )


# ---------------------------------------------------------------------------
# Disjunction of conjunctive join predicates — TPC-H Q19 shape
# ---------------------------------------------------------------------------
@query(
    "q89_disjunctive_revenue",
    oracle=f"""
    SELECT {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q89_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR of three brand/size/quantity
    conjunctions — the classic test that the optimizer splits a
    disjunctive join predicate into pushable single-table parts.

    Scale: Catalyst derives the implied single-table filters — part
    rows must satisfy SOME (brand, size) branch and lineitem rows SOME
    quantity branch — and pushes both below the join (the lineitem
    bound reaches the parquet scan as PushedFilters), so the broadcast
    hash join probes only candidate rows; the residual OR runs as the
    join filter. A global single-row dsum finishes map-side.
    """
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    branch = (
        (F.col("p_brand") == "Brand#11")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#13")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#15")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(branch)
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


# ---------------------------------------------------------------------------
# Unshipped-order revenue top-k — TPC-H Q3 shape
# ---------------------------------------------------------------------------
@query(
    "q90_shipping_priority",
    oracle=f"""
    WITH rev AS (
      SELECT l_orderkey, o_orderdate, o_orderpriority,
             {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
      FROM customer
      JOIN orders   ON o_custkey = c_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01'
        AND l_shipdate  > TIMESTAMP '1998-01-01'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority)
    SELECT * FROM rev
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q90_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 highest-revenue orders placed before a
    date whose lines ship after it (BUILDING segment).

    Cross-engine exactness: revenue is a dsum (exact integer domain),
    and the ORDER BY is made total with (o_orderdate, l_orderkey)
    tiebreakers, so the LIMIT 10 cut is deterministic in both engines.

    Scale: the segment filter prunes customers before the broadcast;
    the date filters reach both parquet scans as PushedFilters. The
    orders⋈lineitem join and the groupBy share the orderkey
    partitioning, so there is ONE fact shuffle; the top-10 runs as
    TakeOrderedAndProject (per-partition heap + driver merge of 10
    rows per task — no global sort at any scale).
    """
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    l = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        o.join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# EXISTS-correlated priority count — TPC-H Q4 shape
# ---------------------------------------------------------------------------
@query(
    "q91_order_priority_check",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    """,
)
def q91_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: how many orders per priority had at least one
    line shipped more than 30 days after the order date (the fixtures
    lack commit/receipt dates, so ship-lag stands in for the
    late-delivery EXISTS). The correlated EXISTS decorrelates to a
    LEFT SEMI join on orderkey with the lag comparison as a join-side
    condition.

    Scale: the date range prunes the orders scan (PushedFilters); the
    semi join shuffles both sides on orderkey but emits each order at
    most once (no fan-out), and the final aggregate is 5 rows — the
    count collapses map-side.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            l,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# Returned-item customer ranking — TPC-H Q10 shape
# ---------------------------------------------------------------------------
@query(
    "q92_returned_items",
    oracle=f"""
    WITH rev AS (
      SELECT c_custkey, c_name, c_acctbal, n_name,
             {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
      FROM customer
      JOIN orders   ON o_custkey = c_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON n_nationkey = c_nationkey
      WHERE o_orderdate >= TIMESTAMP '1996-10-01'
        AND o_orderdate <  TIMESTAMP '1997-01-01'
        AND l_returnflag = 'R'
      GROUP BY c_custkey, c_name, c_acctbal, n_name)
    SELECT * FROM rev
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q92_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: the 20 customers who returned the most revenue
    in a quarter, with their nation.

    Scale: returnflag and the date range are both scan-level filters;
    nation broadcasts. orders⋈lineitem shuffles on orderkey, then ONE
    re-shuffle on custkey serves the aggregate; top-20 is
    TakeOrderedAndProject (no global sort), made deterministic by the
    c_custkey tiebreaker on the exact dsum revenue.
    """
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    l = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        l.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Conditional-share of revenue — TPC-H Q14 shape
# ---------------------------------------------------------------------------
@query(
    "q93_promo_revenue",
    oracle="""
    SELECT CAST(FLOOR((1000000.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS HUGEINT)
                 ELSE 0 END) AS DOUBLE))
           / CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS HUGEINT)) AS DOUBLE))
           AS BIGINT) AS promo_share_ppm
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01'
      AND l_shipdate <  TIMESTAMP '1997-04-01'
    """,
)
def q93_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: PROMO parts' share of one month's revenue — a
    conditional aggregate over the same rows as the unconditional one.

    Cross-engine exactness: both sums accumulate exact quantized
    integers; the share is floored to integer parts-per-million so the
    one 10⁶·a/b double division (same operand order on both engines)
    never reaches the gate hasher.

    Scale: one broadcast join (part is the small side), zero shuffles
    of lineitem beyond the final single-row aggregate — both CASE
    branches fold into one partial aggregate, so the month of lineitem
    is read once and reduced map-side.
    """
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    l = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .select("l_partkey", "l_extendedprice", "l_discount")
    )
    q = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000 + F.lit(0.5)
    ).cast("decimal(38,0)")
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", q).otherwise(F.lit(0).cast("decimal(38,0)"))
    )
    total = F.sum(q)
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            F.floor(F.lit(1000000.0) * promo.cast("double") / total.cast("double"))
            .cast("bigint")
            .alias("promo_share_ppm")
        )
    )


# ---------------------------------------------------------------------------
# Two-way conditional counts per group — TPC-H Q12 shape
# ---------------------------------------------------------------------------
@query(
    "q94_priority_by_linestatus",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
             AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
             AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    """,
)
def q94_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per line status (the fixtures' stand-in for
    ship mode), how many 1997-shipped lines belong to high- vs
    low-priority orders — paired conditional counts over one pass.

    Scale: the year filter prunes the lineitem scan; the fact-fact
    join shuffles both sides on orderkey (sort-merge at scale, AQE may
    flip to shuffled-hash); both CASE counts fold into one partial
    aggregate keyed by the 2-value linestatus, collapsing map-side to
    a handful of rows per task before the final 2-row exchange.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    l = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_linestatus")
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    one = F.lit(1)
    zero = F.lit(0)
    return (
        l.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, one).otherwise(zero)).alias("high_line_count"),
            F.sum(F.when(~hi, one).otherwise(zero)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Hierarchical time rollup: daily stats RE-AGGREGATED from hourly
# partials (the hypertable continuous-aggregate shape) — never touching
# raw rows twice. The oracle aggregates events directly, so the match
# proves the re-aggregation property holds exactly: count/sum/min/max
# compose, and the exact-integer sum domain (functions.dsum rationale)
# makes the two-level double sum bit-identical to the one-level one.
# ---------------------------------------------------------------------------
@query(
    "q102_hierarchical_rollup",
    oracle=f"""
    SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day_start, event_type,
           COUNT(*) AS n,
           {dsum_sql('value')} AS sum_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value,
           COUNT(DISTINCT DATE_TRUNC('hour', ts)) AS n_hours
    FROM events
    GROUP BY DATE_TRUNC('day', ts), event_type
    """,
)
def q102_hierarchical_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level rollup: hour partials → day finals. At 100 TB the
    hourly layer is a materialized continuous aggregate (millions of
    rows, not billions); day/week/month views re-aggregate it at
    ~1000× less input, and the partial layout (count + quantized
    integer sum + min + max) is exactly what makes that sound —
    doubles summed hour-then-day would drift, integers don't.

    Scale: first shuffle keys on (hour, type) with full map-side
    combine; the second input is already tiny, so the day shuffle is
    noise. n_hours falls out of the partial count for free (the
    distinct-hour count a raw-row plan would need a separate pass for).
    """
    from kinesis_producer_spark.functions import _quant

    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").alias("hour_start"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(_quant("value")).alias("sq"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    )
    return hourly.groupBy(
        F.date_trunc("day", "hour_start").alias("day_start"), "event_type"
    ).agg(
        F.sum("pn").alias("n"),
        F.sum("sq").cast("bigint").alias("sum_value"),
        F.min("mn").alias("min_value"),
        F.max("mx").alias("max_value"),
        F.count(F.lit(1)).alias("n_hours"),
    )


# ---------------------------------------------------------------------------
# Distributed global ranking (the TeraSort composition): range-partition
# on the key, rank locally per partition, add broadcast prefix offsets.
# No single-partition global window ever exists — the classic scale
# failure of ROW_NUMBER() OVER (ORDER BY ...) on big data.
# ---------------------------------------------------------------------------
@query(
    "q107_global_rank",
    oracle="""
    WITH h AS (SELECT doc_id, MD5('rank:' || CAST(doc_id AS VARCHAR)) AS hkey
               FROM documents)
    SELECT doc_id, hkey,
           ROW_NUMBER() OVER (ORDER BY hkey) AS global_rank
    FROM h
    """,
)
def q107_global_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total-order global rank over the whole table without a global
    sort: rows split into ordered range buckets derived from the key
    itself, each bucket ranks locally, and a broadcast prefix-sum of
    per-bucket counts lifts local ranks to global ones. The result
    equals ROW_NUMBER() OVER (ORDER BY key) — which is what the oracle
    computes — but the plan never funnels the table through one
    partition: local windows sort only their bucket and the offset
    table is |buckets| rows. Bucket placement doesn't affect the
    answer (offset + local rank is invariant to where the ranges
    fall); deriving buckets from the key rather than sampled
    boundaries (repartitionByRange) keeps the two consumers of the
    bucketed frame trivially consistent — there is no sampling step to
    re-execute.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.concat(F.lit("rank:"), F.col("doc_id").cast("string"))).alias("hkey"),
    )
    # Content-derived range buckets: the key's first hex digit gives 16
    # ordered ranges deterministically — no sampled boundaries to
    # re-execute differently across the two consumers below. At real
    # scale widen to 2-3 hex digits (256/4096 buckets).
    parts = d.withColumn("bucket", F.substring("hkey", 1, 1))
    counts = parts.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt"))
    prefix = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "offset", F.coalesce(F.sum("cnt").over(prefix), F.lit(0))
    ).select("bucket", "offset")
    local = W.partitionBy("bucket").orderBy("hkey")
    return (
        parts.withColumn("local_rank", F.row_number().over(local))
        .join(F.broadcast(offsets), "bucket")
        .select(
            "doc_id",
            "hkey",
            (F.col("offset") + F.col("local_rank")).alias("global_rank"),
        )
    )


# ---------------------------------------------------------------------------
# Ordered-funnel analysis: per-user stage progression with strict
# event-time ordering between stages (view -> click after it ->
# purchase after that), reported as one funnel row.
# ---------------------------------------------------------------------------
@query(
    "q108_funnel",
    oracle="""
    WITH v AS (SELECT user_id, MIN(ts) AS v_ts FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(e.ts) AS c_ts FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts > v.v_ts GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS p_ts FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.c_ts GROUP BY e.user_id)
    SELECT (SELECT COUNT(*) FROM v) AS n_viewed,
           (SELECT COUNT(*) FROM c) AS n_clicked,
           (SELECT COUNT(*) FROM p) AS n_purchased
    """,
)
def q108_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered conversion funnel: users who viewed, then
    clicked after their first view, then purchased after that first
    qualifying click. Each stage conditions on the previous stage's
    event time, so out-of-order events (click before any view) don't
    count — the semantics rand()-free product analytics needs.

    Scale: every stage is a user-keyed aggregate joined to the
    previous stage's (user, ts) frame — all shuffles share the
    user_id key so AQE/co-partitioning reuses the layout, and each
    stage's frame only shrinks (funnel monotonicity). The final
    report is three 1-row aggregates cross-joined — constant data
    after the last user-level stage.
    """
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    # Broadcast the 1-row aggregates by construction rather than
    # relying on AQE to notice they are tiny at runtime.
    return (
        v.agg(F.count(F.lit(1)).alias("n_viewed"))
        .crossJoin(F.broadcast(c.agg(F.count(F.lit(1)).alias("n_clicked"))))
        .crossJoin(F.broadcast(p.agg(F.count(F.lit(1)).alias("n_purchased"))))
    )


# ---------------------------------------------------------------------------
# Retention cohorts: users grouped by first-activity week; per
# (cohort_week, week_offset) cell, how many came back that week.
# ---------------------------------------------------------------------------
@query(
    "q109_retention_cohorts",
    oracle="""
    WITH firstw AS (
      SELECT user_id, MIN(DATE_TRUNC('week', ts)) AS cohort_week
      FROM events GROUP BY user_id),
    active AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             CAST(DATE_DIFF('week', f.cohort_week, DATE_TRUNC('week', e.ts)) AS BIGINT)
               AS week_offset
      FROM events e JOIN firstw f ON e.user_id = f.user_id)
    SELECT CAST(cohort_week AS TIMESTAMP) AS cohort_week, week_offset,
           COUNT(*) AS n_active
    FROM active GROUP BY cohort_week, week_offset
    """,
)
def q109_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: each user joins the cohort of their
    first active week; every later active week increments that
    cohort's (week_offset) cell once per user. The classic engagement
    report, computed without any per-user state machine.

    Scale: first-week per user and the activity join share the
    user_id shuffle key; the distinct collapses (user, cohort,
    offset) before the final small aggregate, and the cohort frame is
    |users| rows — broadcastable when users ≪ events, shuffled
    otherwise (AQE decides). week_offset arithmetic is scan-side.
    """
    e = load_table(spark, sf_dir, "events").select("user_id", "ts")
    wk = F.date_trunc("week", F.col("ts"))
    firstw = e.groupBy("user_id").agg(F.min(wk).alias("cohort_week"))
    active = (
        e.join(firstw, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.floor(
                    (
                        F.unix_timestamp(wk)
                        - F.unix_timestamp(F.col("cohort_week"))
                    )
                    / F.lit(7 * 24 * 3600)
                )
            ).alias("week_offset"),
        )
        .distinct()
    )
    return active.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_active")
    )


# ---------------------------------------------------------------------------
# Event-transition matrix: per-user event bigrams (LAG over the
# user's event-time order) aggregated into Markov transition counts
# and per-source shares.
# ---------------------------------------------------------------------------
@query(
    "q111_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events),
    pairs AS (SELECT prev_type, event_type AS next_type FROM seq
              WHERE prev_type IS NOT NULL),
    cnt AS (SELECT prev_type, next_type, COUNT(*) AS n FROM pairs
            GROUP BY prev_type, next_type),
    tot AS (SELECT prev_type, SUM(n) AS t FROM cnt GROUP BY prev_type)
    SELECT c.prev_type, c.next_type, c.n,
           CAST(FLOOR(1e6 * c.n / t.t + 0.5) AS BIGINT) AS share_micro
    FROM cnt c JOIN tot t ON c.prev_type = t.prev_type
    """,
)
def q111_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over user event streams:
    for every (prev_type → next_type) bigram, the count and its share
    of all transitions out of prev_type. (ts, event_id) is the
    deterministic sort key — simultaneous events tie-break stably.

    Scale: the LAG window partitions by user_id, so each task sorts
    only its users' events (no global sort); the bigram aggregate
    collapses to |types|² rows map-side, and the share join runs on
    that tiny square matrix. This is the sequence-statistics shape:
    one user-keyed shuffle, then constant-size data.
    """
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .select("prev_type", F.col("event_type").alias("next_type"))
    )
    cnt = pairs.groupBy("prev_type", "next_type").agg(F.count(F.lit(1)).alias("n"))
    tot = cnt.groupBy("prev_type").agg(F.sum("n").alias("t"))
    return (
        cnt.join(F.broadcast(tot), "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n",
            F.floor(F.lit(1e6) * F.col("n") / F.col("t") + F.lit(0.5))
            .cast("bigint")
            .alias("share_micro"),
        )
    )


# ---------------------------------------------------------------------------
# Anomaly detection: per-(user, day) event-rate z-scores against exact
# global moments — the monitoring/outlier-mining shape over event logs.
# ---------------------------------------------------------------------------
@query(
    "q115_event_zscore",
    oracle="""
    WITH daily AS (SELECT user_id, date_trunc('day', ts) AS day, COUNT(*) AS cnt
                   FROM events GROUP BY user_id, date_trunc('day', ts)),
    st AS (SELECT COUNT(*) AS n, SUM(cnt) AS s1, SUM(cnt * cnt) AS s2 FROM daily),
    z AS (SELECT user_id, day, cnt,
            CAST(FLOOR(1e6 * (cnt - CAST(s1 AS DOUBLE) / n)
                 / SQRT(CAST(s2 AS DOUBLE) / n
                        - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
                 + 0.5) AS BIGINT) AS z_micro
          FROM daily, st)
    SELECT user_id, day, cnt AS n_events, z_micro
    FROM z WHERE ABS(z_micro) >= 1500000
    """,
)
def q115_event_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-rate anomaly detection: each (user, day) activity count is
    z-scored against the exact global mean/variance of all such
    counts, and cells beyond 1.5σ are flagged. The standard
    monitoring/outlier query over behavioral logs.

    Exactness: counts are integers, so the moment sums (Σx, Σx²)
    accumulate exactly; mean and variance are then a fixed sequence of
    double ops (s1/n, s2/n − mean²) replicated verbatim in the oracle,
    and sqrt is IEEE correctly-rounded — no step is order-sensitive.

    Scale: one shuffle keyed on (user_id, day) with map-side partial
    counts; the moment aggregate reduces the daily frame to one
    broadcast row; the z-score is a map-side expression. The daily
    frame is |users|×|days| — already tiny relative to raw events —
    and the final filter returns only the anomalous tail.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    st = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cnt").alias("s1"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    var = F.col("s2").cast("double") / F.col("n") - mean * mean
    z = daily.crossJoin(F.broadcast(st)).select(
        "user_id",
        "day",
        F.col("cnt").alias("n_events"),
        F.floor(F.lit(1e6) * (F.col("cnt") - mean) / F.sqrt(var) + F.lit(0.5))
        .cast("bigint")
        .alias("z_micro"),
    )
    return z.filter(F.abs(F.col("z_micro")) >= 1500000)


# ---------------------------------------------------------------------------
# Histogram: fixed-width value bucketing with exact per-bucket money sums
# — the profiling/EDA shape (SELECT width_bucket(...) GROUP BY).
# ---------------------------------------------------------------------------
@query(
    "q116_price_histogram",
    oracle="""
    SELECT LEAST(CAST(FLOOR(o_totalprice / 50000) AS BIGINT), 9) AS bucket,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents,
           MIN(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS min_cents,
           MAX(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS max_cents
    FROM orders GROUP BY 1
    """,
)
def q116_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order value (width_bucket shape): ten
    50k-wide buckets with an overflow top bucket, each reporting count
    and exact min/max/sum in integer cents. The data-profiling query
    that sizes skew and picks partition boundaries before a big job.

    Exactness: prices quantize to integer cents per row before any
    aggregation, so sums are order-independent; bucket assignment is
    one floor division on the raw double, identical in both engines.

    Scale: a pure map-side-combine hash aggregate onto ≤10 groups —
    the partial rows per task are the histogram itself, so the
    exchange moves ~10 rows per task regardless of table size. This is
    the cheapest possible full-scan shape; at 100 TB the scan
    dominates and the parquet reader prunes to the one needed column.
    """
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    return (
        o.select(
            F.least(F.floor(F.col("o_totalprice") / 50000).cast("bigint"), F.lit(9).cast("bigint")).alias("bucket"),
            cents.alias("cents"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("sum_cents"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Skyline / pareto frontier — 2-D dominance without the O(n^2) self-join
# ---------------------------------------------------------------------------


@query(
    "q122_pareto_parts",
    oracle="""
    SELECT a.p_partkey, a.p_retailprice, a.p_size
    FROM part a
    WHERE NOT EXISTS (
      SELECT 1 FROM part b
      WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
        AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))
    """,
)
def q122_pareto_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline query: parts on the pareto frontier of (cheaper price,
    larger size). A part is dominated when another part is no worse in
    both dimensions and strictly better in one; exact duplicates of a
    frontier point are both kept.

    The oracle states the O(n²) NOT-EXISTS dominance definition; the
    Spark plan is the scalable 2-D skyline: collapse to one row per
    distinct price (max size), a running max over strictly-cheaper
    prices, then a price-keyed join back — a part survives iff no
    strictly-cheaper price reaches its size and nothing at its own
    price strictly exceeds it.

    Scale: the price-level frame is |distinct prices| rows, so the
    ordered running max is a window over an already-aggregated frame
    (range-partition + broadcast prefix offsets generalizes it, q107);
    the join back keys on price with map-side partials — no quadratic
    pair blowup anywhere.
    """
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    pp = p.groupBy("p_retailprice").agg(F.max("p_size").alias("_msize"))
    w = W.orderBy("p_retailprice").rowsBetween(W.unboundedPreceding, -1)
    pp2 = pp.withColumn("_m1", F.max("_msize").over(w))
    dominated = F.coalesce(
        F.col("_m1") >= F.col("p_size"), F.lit(False)
    ) | (F.col("p_size") < F.col("_msize"))
    return (
        p.join(pp2, "p_retailprice")
        .filter(~dominated)
        .select("p_partkey", "p_retailprice", "p_size")
    )


# ---------------------------------------------------------------------------
# Exact Pearson correlation matrix in one pass (quantized moments)
# ---------------------------------------------------------------------------


@query(
    "q123_corr_matrix",
    oracle="""
    WITH q AS (
      SELECT CAST(FLOOR(l_quantity      * 1e6 + 0.5) AS BIGINT) AS q1,
             CAST(FLOOR(l_extendedprice * 1e6 + 0.5) AS BIGINT) AS q2,
             CAST(FLOOR(l_discount      * 1e6 + 0.5) AS BIGINT) AS q3,
             CAST(FLOOR(l_tax           * 1e6 + 0.5) AS BIGINT) AS q4
      FROM lineitem),
    s AS (
      SELECT COUNT(*) AS n,
             SUM(CAST(q1 AS HUGEINT)) AS s1, SUM(CAST(q2 AS HUGEINT)) AS s2,
             SUM(CAST(q3 AS HUGEINT)) AS s3, SUM(CAST(q4 AS HUGEINT)) AS s4,
             SUM(CAST(q1 AS HUGEINT) * q1) AS s11, SUM(CAST(q2 AS HUGEINT) * q2) AS s22,
             SUM(CAST(q3 AS HUGEINT) * q3) AS s33, SUM(CAST(q4 AS HUGEINT) * q4) AS s44,
             SUM(CAST(q1 AS HUGEINT) * q2) AS s12, SUM(CAST(q1 AS HUGEINT) * q3) AS s13,
             SUM(CAST(q1 AS HUGEINT) * q4) AS s14, SUM(CAST(q2 AS HUGEINT) * q3) AS s23,
             SUM(CAST(q2 AS HUGEINT) * q4) AS s24, SUM(CAST(q3 AS HUGEINT) * q4) AS s34
      FROM q)
    SELECT x, y, CAST(FLOOR(1e6 * (CAST(n AS DOUBLE) * sxy - sx * sy)
           / SQRT((CAST(n AS DOUBLE) * sxx - sx * sx)
                  * (CAST(n AS DOUBLE) * syy - sy * sy)) + 0.5) AS BIGINT) AS corr_micro
    FROM (
      SELECT 'quantity' AS x, 'extendedprice' AS y, CAST(s12 AS DOUBLE) AS sxy,
             CAST(s1 AS DOUBLE) AS sx, CAST(s2 AS DOUBLE) AS sy,
             CAST(s11 AS DOUBLE) AS sxx, CAST(s22 AS DOUBLE) AS syy, n FROM s
      UNION ALL
      SELECT 'quantity', 'discount', CAST(s13 AS DOUBLE), CAST(s1 AS DOUBLE),
             CAST(s3 AS DOUBLE), CAST(s11 AS DOUBLE), CAST(s33 AS DOUBLE), n FROM s
      UNION ALL
      SELECT 'quantity', 'tax', CAST(s14 AS DOUBLE), CAST(s1 AS DOUBLE),
             CAST(s4 AS DOUBLE), CAST(s11 AS DOUBLE), CAST(s44 AS DOUBLE), n FROM s
      UNION ALL
      SELECT 'extendedprice', 'discount', CAST(s23 AS DOUBLE), CAST(s2 AS DOUBLE),
             CAST(s3 AS DOUBLE), CAST(s22 AS DOUBLE), CAST(s33 AS DOUBLE), n FROM s
      UNION ALL
      SELECT 'extendedprice', 'tax', CAST(s24 AS DOUBLE), CAST(s2 AS DOUBLE),
             CAST(s4 AS DOUBLE), CAST(s22 AS DOUBLE), CAST(s44 AS DOUBLE), n FROM s
      UNION ALL
      SELECT 'discount', 'tax', CAST(s34 AS DOUBLE), CAST(s3 AS DOUBLE),
             CAST(s4 AS DOUBLE), CAST(s33 AS DOUBLE), CAST(s44 AS DOUBLE), n FROM s)
    """,
)
def q123_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix over lineitem's four numeric
    measures, computed exactly in ONE pass: micro-quantized values,
    decimal-exact sums of all first/second/cross moments (14
    aggregates), then a fixed-order double formula per pair.

    Exactness: the moment sums are integer-exact (decimal(38,0) /
    HUGEINT); the correlation is the same left-associative double
    expression on both engines, so corr_micro is bit-identical.

    Scale: single scan, map-side partial aggregation — the exchange
    carries one 14-column row per task no matter the table size; the
    6-pair expansion happens on that one row. This is the canonical
    "all second moments in one pass" layout that also yields
    covariance, variance and OLS normal equations for free.
    """
    li = load_table(spark, sf_dir, "lineitem")
    cols = [
        ("quantity", "l_quantity"),
        ("extendedprice", "l_extendedprice"),
        ("discount", "l_discount"),
        ("tax", "l_tax"),
    ]
    q = li.select(
        *[
            F.floor(F.col(src) * 1e6 + F.lit(0.5))
            .cast("bigint")
            .cast("decimal(38,0)")
            .alias(f"q{i+1}")
            for i, (_, src) in enumerate(cols)
        ]
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    for i in range(4):
        aggs.append(F.sum(F.col(f"q{i+1}")).alias(f"s{i+1}"))
    for i in range(4):
        for j in range(i, 4):
            aggs.append(
                F.sum(F.col(f"q{i+1}") * F.col(f"q{j+1}")).alias(f"s{i+1}{j+1}")
            )
    s = q.agg(*aggs)

    def corr(i: int, j: int):
        n = F.col("n").cast("double")
        sx = F.col(f"s{i}").cast("double")
        sy = F.col(f"s{j}").cast("double")
        sxx = F.col(f"s{i}{i}").cast("double")
        syy = F.col(f"s{j}{j}").cast("double")
        sxy = F.col(f"s{i}{j}").cast("double")
        return (
            F.floor(
                F.lit(1e6)
                * (n * sxy - sx * sy)
                / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
                + F.lit(0.5)
            ).cast("bigint")
        )

    pairs = [(i, j) for i in range(1, 5) for j in range(i + 1, 5)]
    names = {i + 1: name for i, (name, _) in enumerate(cols)}
    structs = [
        F.struct(
            F.lit(names[i]).alias("x"),
            F.lit(names[j]).alias("y"),
            corr(i, j).alias("corr_micro"),
        )
        for i, j in pairs
    ]
    return s.select(F.explode(F.array(*structs)).alias("r")).select("r.*")


# ---------------------------------------------------------------------------
# Time-series densify: calendar spine, zero-fill, trailing window
# ---------------------------------------------------------------------------


@query(
    "q124_calendar_gapfill",
    oracle="""
    WITH o AS (SELECT CAST(o_orderdate AS DATE) AS d,
                      CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
               FROM orders),
    daily AS (SELECT d, COUNT(*) AS n, SUM(cents) AS s FROM o GROUP BY d),
    spine AS (SELECT CAST(UNNEST(generate_series(
                 CAST((SELECT MIN(d) FROM o) AS TIMESTAMP),
                 CAST((SELECT MAX(d) FROM o) AS TIMESTAMP),
                 INTERVAL 1 DAY)) AS DATE) AS day),
    filled AS (SELECT day, COALESCE(n, 0) AS n_orders,
                      CAST(COALESCE(s, 0) AS BIGINT) AS sum_cents
               FROM spine LEFT JOIN daily ON day = d)
    SELECT day, n_orders, sum_cents,
           CAST(SUM(sum_cents) OVER (ORDER BY day
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS sum7_cents
    FROM filled
    """,
)
def q124_calendar_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series densify: build a complete calendar spine from min to
    max order date with sequence+explode, left-join the daily revenue
    aggregate, zero-fill missing days, and compute a trailing 7-day
    revenue sum. Gap-filling is what makes the ROWS-based trailing
    frame equal the calendar-time window — the standard prerequisite
    for moving averages / burn rates over sparse activity.

    Exactness: revenue in integer cents; the windowed sum is an
    integer sum. Dates compare as ISO strings.

    Scale: the expensive input collapses to |days| rows before the
    spine join and window, so both run on a calendar-sized frame —
    fine in one partition for years of days; for decade+ spans the
    q107 bucket+prefix-offset layout makes the running window
    distributed without a global sort.
    """
    o = load_table(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("d"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
    )
    daily = o.groupBy("d").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s")
    )
    rng = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = rng.select(F.explode(F.sequence("lo", "hi")).alias("day"))
    filled = (
        spine.join(daily, spine.day == daily.d, "left")
        .select(
            "day",
            F.coalesce(F.col("n"), F.lit(0)).alias("n_orders"),
            F.coalesce(F.col("s"), F.lit(0)).alias("sum_cents"),
        )
    )
    w7 = W.orderBy("day").rowsBetween(-6, 0)
    return filled.select(
        "day",
        "n_orders",
        "sum_cents",
        F.sum("sum_cents").over(w7).alias("sum7_cents"),
    )


# ---------------------------------------------------------------------------
# Ordered string aggregation (string_agg / sorted collect_list)
# ---------------------------------------------------------------------------


@query(
    "q128_supplier_roster",
    oracle="""
    SELECT n.n_name AS nation, COUNT(*) AS n_suppliers,
           string_agg(s.s_name, ',' ORDER BY s.s_name) AS roster
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q128_supplier_roster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: per nation, the supplier names
    joined into one comma-separated roster in name order — the
    string_agg(... ORDER BY ...) shape, expressed Spark-side as
    collect_list → array_sort → array_join so the result is
    deterministic regardless of partial-aggregation arrival order.

    Scale: collect_list partials combine map-side but the full roster
    for a group must fit in one aggregation buffer — correct for
    bounded group sizes (suppliers per nation); for unbounded groups
    the scalable form caps the list (slice after sort) or goes through
    the q110 inverted-index layout instead.
    """
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.array_join(F.array_sort(F.collect_list("s_name")), ",").alias("roster"),
        )
    )


# ---------------------------------------------------------------------------
# Market-basket co-occurrence: co-purchased part pairs
# ---------------------------------------------------------------------------


@query(
    "q129_copurchase_pairs",
    oracle="""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_orders
    FROM li a JOIN li b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY a.l_partkey, b.l_partkey
    HAVING COUNT(*) >= 3
    """,
)
def q129_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: pairs of parts bought together in
    at least 3 distinct orders — the candidate-pair step of frequent
    itemset mining / "bought together" recommendations.

    Scale: pair generation uses ordered_item_pairs — one
    groupBy(orderkey) exchange plus an in-row combination expansion,
    so pair fan-out is bounded by the square of lines-per-order
    (≤ ~7 lines → ≤ 21 pairs per order), NOT by table size, and no
    self-join exchange of the item table exists at all. The
    min-support HAVING prunes the long tail before any downstream
    join. For baskets with unbounded width, cap or sample within the
    basket first (the standard a-priori guard).
    """
    from kinesis_producer_spark.operators.baskets import ordered_item_pairs

    li = load_table(spark, sf_dir, "lineitem")
    return (
        ordered_item_pairs(li, "l_orderkey", "l_partkey", out=("ok", "part_a", "part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 3)
    )


# ---------------------------------------------------------------------------
# SCD Type-2 merge (warehouse dimension history upsert)
# ---------------------------------------------------------------------------


@query(
    "q131_scd2_merge",
    oracle="""
    WITH cur AS (
      SELECT s_suppkey, CAST(FLOOR(s_acctbal * 100 + 0.5) AS BIGINT) AS cents
      FROM supplier),
    delta AS (
      SELECT s_suppkey, cents + 10000 AS cents FROM cur WHERE s_suppkey % 7 = 3
      UNION ALL
      SELECT s_suppkey, cents FROM cur WHERE s_suppkey % 7 = 5
      UNION ALL
      SELECT s_suppkey + 1000000, cents + 555 FROM cur WHERE s_suppkey % 11 = 0),
    j AS (
      SELECT COALESCE(c.s_suppkey, d.s_suppkey) AS s_suppkey,
             c.cents AS ccents, d.cents AS dcents
      FROM cur c FULL JOIN delta d ON c.s_suppkey = d.s_suppkey)
    SELECT s_suppkey, ccents AS acctbal_cents,
           DATE '2020-01-01' AS valid_from, DATE '2024-01-01' AS valid_to,
           FALSE AS is_current
    FROM j WHERE ccents IS NOT NULL AND dcents IS NOT NULL AND ccents != dcents
    UNION ALL
    SELECT s_suppkey, COALESCE(dcents, ccents),
           CASE WHEN dcents IS NOT NULL AND (ccents IS NULL OR ccents != dcents)
                THEN DATE '2024-01-01' ELSE DATE '2020-01-01' END,
           CAST(NULL AS DATE), TRUE
    FROM j
    """,
)
def q131_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type-2 merge: a delta batch (derived
    deterministically from supplier — every 7th key changed, every
    other 7th re-sent unchanged, every 11th key as a brand-new
    supplier) merges into the current dimension. Changed keys close
    their old version (valid_to stamped, is_current=false) and open a
    new one; unchanged re-sends are no-ops; new keys insert open
    versions — the standard warehouse history-preserving upsert
    (Delta/Iceberg MERGE semantics expressed as a full-outer-join
    classify + multi-row emit).

    Scale: one full outer join on the dimension key — both sides
    shuffle once on that key (dimensions are small next to facts; for
    a billion-row dimension the join co-locates via bucketing on the
    key). The two-row emit for changed keys is a per-row explode, no
    extra shuffle. Idempotence: re-running the same delta yields only
    no-ops, which is what makes the sink retry-safe.
    """
    s = load_table(spark, sf_dir, "supplier")
    cur = s.select(
        "s_suppkey",
        F.floor(F.col("s_acctbal") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
    )
    delta = (
        cur.filter(F.col("s_suppkey") % 7 == 3)
        .select("s_suppkey", (F.col("cents") + 10000).alias("cents"))
        .unionAll(cur.filter(F.col("s_suppkey") % 7 == 5))
        .unionAll(
            cur.filter(F.col("s_suppkey") % 11 == 0).select(
                (F.col("s_suppkey") + 1000000).alias("s_suppkey"),
                (F.col("cents") + 555).alias("cents"),
            )
        )
    )
    c = cur.select(F.col("s_suppkey").alias("ck"), F.col("cents").alias("ccents"))
    d = delta.select(F.col("s_suppkey").alias("dk"), F.col("cents").alias("dcents"))
    j = c.join(d, c.ck == d.dk, "full").select(
        F.coalesce("ck", "dk").alias("s_suppkey"), "ccents", "dcents"
    )
    t0 = F.lit("2020-01-01").cast("date")
    t1 = F.lit("2024-01-01").cast("date")
    changed = (
        F.col("ccents").isNotNull()
        & F.col("dcents").isNotNull()
        & (F.col("ccents") != F.col("dcents"))
    )
    closed = F.when(
        changed,
        F.struct(
            F.col("ccents").alias("acctbal_cents"),
            t0.alias("valid_from"),
            t1.alias("valid_to"),
            F.lit(False).alias("is_current"),
        ),
    )
    current = F.struct(
        F.coalesce("dcents", "ccents").alias("acctbal_cents"),
        F.when(
            F.col("dcents").isNotNull() & (F.col("ccents").isNull() | changed), t1
        )
        .otherwise(t0)
        .alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return j.select(
        "s_suppkey",
        F.explode(
            F.filter(F.array(closed, current), lambda x: x.isNotNull())
        ).alias("r"),
    ).select("s_suppkey", "r.*")


# ---------------------------------------------------------------------------
# Top-k with "other" bucket — heavy-hitter report shape
# ---------------------------------------------------------------------------


@query(
    "q132_topk_with_other",
    oracle="""
    WITH g AS (SELECT event_type, user_id, COUNT(*) AS n
               FROM events GROUP BY event_type, user_id),
    r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                       ORDER BY n DESC, user_id) AS rn
          FROM g)
    SELECT event_type,
           CASE WHEN rn <= 3 THEN CAST(user_id AS VARCHAR) ELSE 'other' END AS bucket,
           CAST(SUM(n) AS BIGINT) AS n_events
    FROM r GROUP BY event_type,
          CASE WHEN rn <= 3 THEN CAST(user_id AS VARCHAR) ELSE 'other' END
    """,
)
def q132_topk_with_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter report: per event type, the top-3 users by event
    count as named rows plus one 'other' row aggregating the long tail
    — the dashboard-standard "top N + rest" rollup that keeps output
    cardinality bounded no matter how many distinct users exist.

    Scale: the (type, user) pre-aggregate combines map-side; the
    ranking window partitions by event type over the aggregated frame
    (per-type row counts = distinct users per type, not events). The
    re-group collapses the tail in the same partitioning, so the
    second aggregation is shuffle-free after the window's exchange.
    Ties break on user_id, so top-3 membership is deterministic.
    """
    e = load_table(spark, sf_dir, "events")
    g = e.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("event_type").orderBy(F.desc("n"), F.asc("user_id"))
    r = g.withColumn("rn", F.row_number().over(w))
    bucket = F.when(
        F.col("rn") <= 3, F.col("user_id").cast("string")
    ).otherwise(F.lit("other"))
    return (
        r.select("event_type", bucket.alias("bucket"), "n")
        .groupBy("event_type", "bucket")
        .agg(F.sum("n").alias("n_events"))
    )


# ---------------------------------------------------------------------------
# Percent-of-parent hierarchical shares (region → nation → customer)
# ---------------------------------------------------------------------------


@query(
    "q134_percent_of_parent",
    oracle="""
    WITH rev AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY r.r_name, n.n_name),
    tot AS (SELECT SUM(cents) AS grand FROM rev),
    reg AS (SELECT region, SUM(cents) AS rcents FROM rev GROUP BY region)
    SELECT rev.region, rev.nation, CAST(rev.cents AS BIGINT) AS cents,
           CAST(FLOOR(1e6 * CAST(rev.cents AS DOUBLE) / reg.rcents + 0.5) AS BIGINT)
             AS share_of_region_micro,
           CAST(FLOOR(1e6 * CAST(reg.rcents AS DOUBLE) / tot.grand + 0.5) AS BIGINT)
             AS region_share_micro
    FROM rev JOIN reg USING (region), tot
    """,
)
def q134_percent_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent hierarchical report: nation revenue as a share
    of its region, and region revenue as a share of the grand total —
    the drill-down ratio layout every BI tool renders. Shares are
    fixed-order double ratios of exact integer cent sums, quantized to
    micro-units.

    Scale: one fact-side aggregation (orders joined to broadcast
    dimensions) produces the nation-level frame; the region and grand
    totals re-aggregate that ~|nations| frame, so the ratio joins all
    run on dimension-sized data. The fact table is scanned once.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
            ).alias("cents")
        )
    )
    tot = rev.agg(F.sum("cents").alias("grand"))
    reg = rev.groupBy("region").agg(F.sum("cents").alias("rcents"))
    return (
        rev.join(F.broadcast(reg), "region")
        .crossJoin(F.broadcast(tot))
        .select(
            "region",
            "nation",
            "cents",
            F.floor(
                F.lit(1e6) * F.col("cents").cast("double") / F.col("rcents")
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("share_of_region_micro"),
            F.floor(
                F.lit(1e6) * F.col("rcents").cast("double") / F.col("grand")
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("region_share_micro"),
        )
    )


# ---------------------------------------------------------------------------
# Unpivot (wide → long melt) + per-measure aggregate
# ---------------------------------------------------------------------------


@query(
    "q135_unpivot_measures",
    oracle="""
    WITH long AS (
      SELECT l_returnflag, measure, CAST(FLOOR(val * 1e6 + 0.5) AS BIGINT) AS micro
      FROM lineitem
      UNPIVOT (val FOR measure IN (l_quantity, l_extendedprice, l_discount, l_tax)))
    SELECT l_returnflag, measure, COUNT(*) AS n,
           CAST(SUM(micro) AS BIGINT) AS sum_micro,
           MIN(micro) AS min_micro, MAX(micro) AS max_micro
    FROM long GROUP BY l_returnflag, measure
    """,
)
def q135_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot / melt: the four lineitem measures turned into
    (measure, value) long format — the wide→long reshape that feeds
    generic per-metric monitoring — then profiled per return flag.
    The inverse of the EAV pivot (SURVEY §2a rows 10-11); together
    they close the reshape round-trip on the relational surface.

    Scale: unpivot is a per-row explode (Spark's Expand operator —
    4× rows but no shuffle); the profile aggregates on low-cardinality
    keys with map-side partials, so the exchange stays tiny. Column
    pruning still reaches the scan: only the four measures + flag are
    read.
    """
    li = load_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ["l_returnflag"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "val",
    ).select(
        "l_returnflag",
        "measure",
        F.floor(F.col("val") * 1e6 + F.lit(0.5)).cast("bigint").alias("micro"),
    )
    return long.groupBy("l_returnflag", "measure").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("micro").alias("sum_micro"),
        F.min("micro").alias("min_micro"),
        F.max("micro").alias("max_micro"),
    )


# ---------------------------------------------------------------------------
# Time-weighted telemetry averaging + outage detection — the two
# aggregations sensor-reading pipelines (the reference's domain:
# acoustic/impact/temperature readings, SURVEY §0) actually run, as
# opposed to naive row-averages that overweight chatty sensors.
# ---------------------------------------------------------------------------
@query(
    "q151_time_weighted_avg",
    oracle="""
    WITH seg AS (
      SELECT user_id,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
             EPOCH_US(LEAD(ts) OVER w) - EPOCH_US(ts) AS dur
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT user_id,
           CAST(SUM(dur) // 1000000 AS BIGINT) AS span_s,
           COUNT(dur) AS n_segments,
           CAST(FLOOR(CAST(SUM(CAST(cents * dur AS HUGEINT)) AS DOUBLE)
                      / CAST(SUM(dur) AS DOUBLE) + 0.5) AS BIGINT) AS twa_cents
    FROM seg WHERE dur IS NOT NULL AND dur > 0
    GROUP BY user_id
    """,
)
def q151_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per sensor (user): each reading
    holds until the next one, so its weight is the segment duration —
    the telemetry semantics a row-average gets wrong when emission
    rates vary. Σ(cents·seconds) accumulates exactly in integers; one
    final mirrored double division produces the average.

    Scale: one shuffle on the entity key for the ordered window (the
    partition is each sensor's own history — naturally bounded), then
    a same-key agg that reuses the window's partitioning: Catalyst
    plans a single Exchange for both.
    """
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    seg = e.select(
        "user_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
        (F.lead(us).over(w) - us).alias("dur"),
    )
    seg = seg.filter(F.col("dur").isNotNull() & (F.col("dur") > 0))
    return seg.groupBy("user_id").agg(
        F.expr("sum(dur) div 1000000").cast("bigint").alias("span_s"),
        F.count("dur").alias("n_segments"),
        F.floor(
            F.sum((F.col("cents") * F.col("dur")).cast("decimal(38,0)")).cast("double")
            / F.sum("dur").cast("double")
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("twa_cents"),
    )


@query(
    "q152_sensor_outages",
    oracle="""
    WITH g AS (
      SELECT user_id, ts,
             EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) AS gap
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT user_id,
           COUNT(*) AS n_outages,
           CAST(MAX(gap) // 1000000 AS BIGINT) AS worst_gap_s,
           CAST(SUM(gap) // 1000000 AS BIGINT) AS total_gap_s,
           MIN(ts) AS first_outage_end
    FROM g WHERE gap IS NOT NULL AND gap > 3600000000
    GROUP BY user_id
    """,
)
def q152_sensor_outages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outage report per sensor: silent periods longer than an hour
    between consecutive readings — count, worst, cumulative silence,
    and when the first outage ended. The monitoring query every
    telemetry ingest (the reference's produce/flatten pipeline) runs
    against its own output to detect dead sensors and feed gaps.

    Scale: identical single-exchange shape to q151 — ordered window
    per sensor, gap filter, same-key agg. The >1h filter lands right
    after the window, so the agg input is outages only.
    """
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    g = e.select(
        "user_id",
        "ts",
        (us - F.lag(us).over(w)).alias("gap"),
    )
    g = g.filter(F.col("gap").isNotNull() & (F.col("gap") > 3_600_000_000))
    return g.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_outages"),
        F.expr("max(gap) div 1000000").cast("bigint").alias("worst_gap_s"),
        F.expr("sum(gap) div 1000000").cast("bigint").alias("total_gap_s"),
        F.min("ts").alias("first_outage_end"),
    )


# ---------------------------------------------------------------------------
# Session path mining: most common within-session event-type sequences
# ---------------------------------------------------------------------------
@query(
    "q159_session_paths",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) > 1800000000
                       OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS ns
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (SELECT user_id, ts, event_id, event_type,
                 SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
          FROM g),
    paths AS (SELECT user_id, sid,
                     string_agg(event_type, '>' ORDER BY ts, event_id) AS path
              FROM s GROUP BY user_id, sid),
    counted AS (SELECT path, COUNT(*) AS n_sessions FROM paths GROUP BY path)
    SELECT path, n_sessions,
           CAST(ROW_NUMBER() OVER (ORDER BY n_sessions DESC, path) AS BIGINT) AS rank
    FROM counted ORDER BY n_sessions DESC, path LIMIT 10
    """,
)
def q159_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 within-session event-type sequences (30-min gap
    sessions, q20's definition): the product-analytics "common paths"
    query. The path string aggregates in strict (ts, event_id) order
    via collect_list → array_sort over (ts, event_id, type) structs —
    deterministic whatever order partials arrive in.

    Scale: sessionization and path-building share the user-key
    exchange; the path count agg keys on the path string (bounded by
    distinct behavioral sequences, not session count). Per-session
    lists are gap-bounded; for pathological sessions cap with slice
    after sort (q128's note).
    """
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (
        F.unix_micros(F.col("ts").cast("timestamp"))
        - F.lag(F.unix_micros(F.col("ts").cast("timestamp"))).over(w)
    )
    new_session = F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    ws = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    s = e.select("user_id", "ts", "event_id", "event_type").withColumn(
        "sid", F.sum(new_session).over(ws)
    )
    paths = s.groupBy("user_id", "sid").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                lambda r: r["event_type"],
            ),
            ">",
        ).alias("path")
    )
    counted = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_sessions"))
    top = counted.orderBy(F.desc("n_sessions"), F.asc("path")).limit(10)
    return top.withColumn(
        "rank",
        F.row_number().over(W.orderBy(F.desc("n_sessions"), F.asc("path"))).cast("bigint"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q21-shaped nested correlation on the events stream: users whose
# LAST event is an error while other event types exist after their
# last success — double-negation (EXISTS + NOT EXISTS) composition.
# ---------------------------------------------------------------------------
@query(
    "q173_stuck_in_error",
    oracle="""
    WITH last_evt AS (
      SELECT user_id, MAX(ts) AS last_ts FROM events GROUP BY user_id),
    last_rows AS (
      SELECT e.user_id, e.event_type
      FROM events e JOIN last_evt l
        ON e.user_id = l.user_id AND e.ts = l.last_ts),
    err_last AS (
      SELECT DISTINCT user_id FROM last_rows WHERE event_type = 'error'),
    with_view AS (
      SELECT u.user_id FROM err_last u
      WHERE EXISTS (SELECT 1 FROM events e
                    WHERE e.user_id = u.user_id AND e.event_type = 'view')
        AND NOT EXISTS (SELECT 1 FROM events e
                        WHERE e.user_id = u.user_id AND e.event_type = 'purchase'
                          AND e.ts > (SELECT MAX(ts) FROM events x
                                      WHERE x.user_id = u.user_id
                                        AND x.event_type = 'error'))
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_stuck_users FROM with_view
    """,
)
def q173_stuck_in_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21's shape on the event stream: users whose latest event
    is an error, who have engaged (EXISTS a view) but have never
    purchased after their last error (NOT EXISTS) — the stuck-user
    audit combining a correlated max, a semi join, and an anti join
    with a correlated time bound.

    Spark expression: per-user maxes computed once as aggregates
    (last event ts, last error ts, purchase-after-error flag) and
    combined with semi/anti joins — the decorrelated form Catalyst
    would target, written directly so every step is one key-partitioned
    agg or join rather than a per-row subquery.
    """
    e = load_table(spark, sf_dir, "events")
    last_evt = e.groupBy(F.col("user_id").alias("luid")).agg(F.max("ts").alias("last_ts"))
    last_rows = e.join(
        last_evt,
        (e["user_id"] == F.col("luid")) & (e["ts"] == F.col("last_ts")),
    ).select(F.col("user_id").alias("uid"), "event_type")
    err_last = last_rows.filter(F.col("event_type") == "error").select("uid").distinct()
    viewers = (
        e.filter(F.col("event_type") == "view").select(F.col("user_id").alias("uid")).distinct()
    )
    last_err = (
        e.filter(F.col("event_type") == "error")
        .groupBy(F.col("user_id").alias("uid"))
        .agg(F.max("ts").alias("err_ts"))
    )
    purch = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("uid"), F.col("ts").alias("pts")
    )
    purchased_after = (
        purch.join(last_err, "uid").filter(F.col("pts") > F.col("err_ts")).select("uid").distinct()
    )
    stuck = (
        err_last.join(viewers, "uid", "left_semi")
        .join(purchased_after, "uid", "left_anti")
    )
    return stuck.agg(F.count(F.lit(1)).cast("bigint").alias("n_stuck_users"))


# ---------------------------------------------------------------------------
# Week-over-week percent change per event type (BI trend shape)
# ---------------------------------------------------------------------------
@query(
    "q177_week_over_week",
    oracle="""
    WITH wk AS (
      SELECT event_type, DATE_TRUNC('week', ts) AS week_start, COUNT(*) AS n
      FROM events GROUP BY 1, 2),
    lagged AS (
      SELECT event_type, week_start, n,
             LAG(n) OVER (PARTITION BY event_type ORDER BY week_start) AS prev_n
      FROM wk)
    SELECT event_type, week_start, n, prev_n,
           CAST(FLOOR(1e6 * (CAST(n AS DOUBLE) - CAST(prev_n AS DOUBLE))
                      / CAST(prev_n AS DOUBLE) + 0.5) AS BIGINT)
             AS wow_change_micro
    FROM lagged
    WHERE prev_n IS NOT NULL
    """,
)
def q177_week_over_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week percent change per event type — the standard BI
    trend layout: aggregate to the week grain, lag on the aggregated
    series (tiny — one row per type-week), percent delta in mirrored
    micro-units with NULL for the first week.

    Scale: the window runs on the AGGREGATED frame (|types| x |weeks|
    rows), so the sort is trivial no matter how many raw events fed
    it — the reason trend windows belong after the rollup, never on
    the fact table.
    """
    e = load_table(spark, sf_dir, "events")
    wk = e.groupBy(
        "event_type", F.to_date(F.date_trunc("week", "ts")).alias("week_start")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("event_type").orderBy("week_start")
    # First week has no prior — drop it rather than emit NULL ints:
    # week-over-week is only defined from the second week, and a
    # NULL-bearing int column goes float64 under the driver's pandas
    # canonicalization (repr-drift hazard on the hash surface).
    lagged = wk.withColumn("prev_n", F.lag("n").over(w)).filter(
        F.col("prev_n").isNotNull()
    )
    delta = F.floor(
        F.lit(1e6)
        * (F.col("n").cast("double") - F.col("prev_n").cast("double"))
        / F.col("prev_n").cast("double")
        + F.lit(0.5)
    ).cast("bigint")
    return lagged.select(
        "event_type", "week_start", "n", "prev_n", delta.alias("wow_change_micro")
    )


# ---------------------------------------------------------------------------
# Canonical-id remapping: apply the dedup verdict to downstream facts
# ---------------------------------------------------------------------------
@query(
    "q178_canonical_remap",
    oracle="""
    WITH groups AS (
      SELECT doc_id, MIN(doc_id) OVER (PARTITION BY MD5(text)) AS canon_id
      FROM documents),
    remapped AS (
      SELECT doc_id, canon_id, doc_id <> canon_id AS was_remapped FROM groups)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN was_remapped THEN 1 ELSE 0 END) AS BIGINT) AS n_remapped,
           CAST(COUNT(DISTINCT canon_id) AS BIGINT) AS n_canonical
    FROM remapped
    """,
)
def q178_canonical_remap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The application half of exact dedup (q50 detects; this
    applies): every doc_id maps to the minimum id of its content
    group, producing the remap table a downstream fact join uses to
    collapse duplicate references — plus the audit counts (how many
    ids changed, how many canonical survivors).

    Scale: one digest-partitioned window (equivalently a groupBy-min
    join-back); the remap table ships as a broadcast to fact-side
    joins when the dup fraction is small, or co-partitions on doc_id
    when it is not.
    """
    d = load_table(spark, sf_dir, "documents")
    w = W.partitionBy(F.md5(F.col("text").cast("binary")))
    remap = d.select(
        "doc_id", F.min("doc_id").over(w).alias("canon_id")
    ).withColumn("was_remapped", F.col("doc_id") != F.col("canon_id"))
    return remap.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.col("was_remapped").cast("bigint")).cast("bigint").alias("n_remapped"),
        F.count_distinct("canon_id").cast("bigint").alias("n_canonical"),
    )


# ---------------------------------------------------------------------------
# Semi-Markov transitions: event-type transition counts + mean dwell
# ---------------------------------------------------------------------------
@query(
    "q181_dwell_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS a, ts,
             LEAD(event_type) OVER w AS b,
             EPOCH_US(LEAD(ts) OVER w) - EPOCH_US(ts) AS dwell_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n_transitions,
           CAST(SUM(dwell_us) // 1000000 AS BIGINT) AS total_dwell_s,
           CAST(FLOOR(CAST(SUM(dwell_us) AS DOUBLE) / (1e6 * COUNT(*)) + 0.5) AS BIGINT)
             AS mean_dwell_s
    FROM seq WHERE b IS NOT NULL
    GROUP BY a, b
    """,
)
def q181_dwell_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-Markov upgrade of q111's transition matrix: each a→b
    transition carries its dwell time (how long the user sat in state
    a), reported as counts plus total and mean dwell — the timing
    model behind funnel latency and abandonment analyses. Durations
    in exact microseconds (the q151/q152 discipline).

    Scale: one entity-key window for (next-type, dwell), then a
    |types|² agg — the exchange after the window carries transition
    keys, not events.
    """
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    seq = e.select(
        F.col("event_type").alias("a"),
        F.lead("event_type").over(w).alias("b"),
        (F.lead(us).over(w) - us).alias("dwell_us"),
    ).filter(F.col("b").isNotNull())
    return seq.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_transitions"),
        F.expr("sum(dwell_us) div 1000000").cast("bigint").alias("total_dwell_s"),
        F.floor(
            F.sum("dwell_us").cast("double") / (F.lit(1e6) * F.count(F.lit(1)))
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("mean_dwell_s"),
    )


# ---------------------------------------------------------------------------
# Linear interpolation across gaps (telemetry resampling)
# ---------------------------------------------------------------------------
@query(
    "q182_linear_interpolation",
    oracle="""
    WITH pts AS (
      SELECT user_id, ts,
             EPOCH_US(ts) AS t_us,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c,
             EPOCH_US(LEAD(ts) OVER w) AS t1_us,
             CAST(FLOOR(LEAD(value) OVER w * 100 + 0.5) AS BIGINT) AS c1
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    gaps AS (
      SELECT user_id, t_us, c, t1_us, c1,
             (t_us // 3600000000 + 1) * 3600000000 AS grid_us
      FROM pts
      WHERE t1_us IS NOT NULL AND t1_us - t_us > 3600000000),
    interp AS (
      SELECT user_id,
             grid_us,
             c + CAST(FLOOR(CAST(c1 - c AS DOUBLE) * CAST(grid_us - t_us AS DOUBLE)
                            / CAST(t1_us - t_us AS DOUBLE) + 0.5) AS BIGINT)
               AS interp_cents
      FROM gaps WHERE grid_us < t1_us)
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_interp_points,
           CAST(SUM(interp_cents) AS BIGINT) AS sum_interp_cents
    FROM interp GROUP BY user_id
    """,
)
def q182_linear_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Telemetry resampling: for every >1h silent gap between
    consecutive readings, synthesize the first hour-aligned grid point
    inside the gap by linear interpolation between the bracketing
    readings — the standard regularization before feeding
    irregular sensor series to a model (q124 gap-fills with carries;
    this interpolates). Interpolation arithmetic is one mirrored
    double sequence over exact integer endpoints.

    Scale: one entity-key window produces each gap's bracketing pair;
    interpolation is map-side arithmetic on the gap rows only (no
    explode of the full grid — gaps are the rare case by definition).
    Extending to EVERY grid point in a gap is a bounded sequence()
    explode of gap rows only.
    """
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    pts = e.select(
        "user_id",
        us.alias("t_us"),
        cents.alias("c"),
        F.lead(us).over(w).alias("t1_us"),
        F.lead(cents).over(w).alias("c1"),
    )
    gaps = pts.filter(
        F.col("t1_us").isNotNull() & (F.col("t1_us") - F.col("t_us") > 3_600_000_000)
    ).withColumn(
        "grid_us", (F.expr("t_us div 3600000000") + 1) * F.lit(3_600_000_000)
    )
    interp = gaps.filter(F.col("grid_us") < F.col("t1_us")).select(
        "user_id",
        (
            F.col("c")
            + F.floor(
                (F.col("c1") - F.col("c")).cast("double")
                * (F.col("grid_us") - F.col("t_us")).cast("double")
                / (F.col("t1_us") - F.col("t_us")).cast("double")
                + F.lit(0.5)
            ).cast("bigint")
        ).alias("interp_cents"),
    )
    return interp.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_interp_points"),
        F.sum("interp_cents").cast("bigint").alias("sum_interp_cents"),
    )


# ---------------------------------------------------------------------------
# DAU / WAU stickiness: distinct users over a 7-day sliding window
# ---------------------------------------------------------------------------
@query(
    "q187_dau_wau",
    oracle="""
    WITH ud AS (SELECT DISTINCT user_id, CAST(DATE_TRUNC('day', ts) AS DATE) AS day
                FROM events),
    dau AS (SELECT day, COUNT(*) AS dau FROM ud GROUP BY day),
    contrib AS (SELECT user_id, day + CAST(i AS INTEGER) AS target_day
                FROM ud CROSS JOIN (SELECT UNNEST(RANGE(0, 7)) AS i)),
    wau AS (SELECT target_day AS day, COUNT(DISTINCT user_id) AS wau
            FROM contrib GROUP BY target_day)
    SELECT dau.day, dau, wau,
           CAST(FLOOR(1e6 * CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE) + 0.5) AS BIGINT)
             AS stickiness_micro
    FROM dau JOIN wau ON dau.day = wau.day
    """,
)
def q187_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU stickiness per day — the engagement
    curve. Distinct-users over a SLIDING window can't reuse window
    partials (distinct doesn't decompose), so the scalable shape is a
    bounded contribution-explode: each (user, day) pair feeds the 7
    target days it counts toward, and WAU is a plain distinct-agg per
    target day. Days with activity in the preceding week but none
    that day drop out via the DAU inner join (matching the oracle).

    Scale: the explode is x7 on the DISTINCT (user, day) frame — far
    smaller than raw events — and both aggs are map-side-partial
    distincts keyed on day. The same pattern gives MAU with x30 on
    day grain (or x4ish on week grain).
    """
    e = load_table(spark, sf_dir, "events")
    ud = e.select("user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")).distinct()
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    contrib = ud.select(
        "user_id",
        F.explode(
            F.transform(F.sequence(F.lit(0), F.lit(6)), lambda i: F.date_add("day", i))
        ).alias("day"),
    )
    wau = contrib.groupBy("day").agg(F.count_distinct("user_id").alias("wau"))
    out = dau.join(wau, "day")
    stick = F.floor(
        F.lit(1e6) * F.col("dau").cast("double") / F.col("wau").cast("double")
        + F.lit(0.5)
    ).cast("bigint")
    return out.select("day", "dau", "wau", stick.alias("stickiness_micro"))


@query(
    "q223_range_aggregate_prefix",
    oracle="""
    WITH iv AS (
      SELECT c_custkey, c_acctbal * 50.0 AS lo, c_acctbal * 50.0 + 25000.0 AS hi
      FROM customer
    )
    SELECT iv.c_custkey,
           CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS HUGEINT)) AS BIGINT) AS sum_cents
    FROM iv JOIN orders o ON o.o_totalprice >= iv.lo AND o.o_totalprice < iv.hi
    GROUP BY iv.c_custkey
    """,
)
def q223_range_aggregate_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q28's range-join AGGREGATE computed as F(hi) - F(lo) over a
    distributed prefix aggregate — identical answer, O(points +
    intervals) shuffle instead of O(pairs). The q28 workload is dense
    (~102M real pairs at sf0.1, ~680 intervals per bin), so the
    pair-materializing plan does 10^3x the work of the answer; this is
    the shape that keeps dense range analytics runnable at 100 TB (see
    operators/skew.py:range_aggregate).
    """
    from kinesis_producer_spark.operators.skew import range_aggregate

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    iv = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        (F.col("c_acctbal") * 50.0).alias("lo"),
        (F.col("c_acctbal") * 50.0 + 25000.0).alias("hi"),
    )
    agg = range_aggregate(
        o,
        iv,
        "o_totalprice",
        "lo",
        "hi",
        id_col="c_custkey",
        bin_width=25000.0,
        value=F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)),
    )
    return agg.where(F.col("n_points") > 0).select(
        "c_custkey",
        F.col("n_points").cast("bigint").alias("n_orders"),
        F.col("sum_value").cast("bigint").alias("sum_cents"),
    )
