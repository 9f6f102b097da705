"""Relational operator battery over the driver testdata (SURVEY.md §2).

Each entry: ``name -> (spark_fn, oracle_sql)`` where the oracle is ANSI SQL
DuckDB runs on the same parquet (views pre-registered by the driver).
Operator ids in docstring headers refer to SURVEY.md §2 rows.

Determinism rules used throughout (driver hashes values order-insensitively
but exactly):

* money sums are computed in integer cents (``sum(round(x*100))::bigint``) —
  float summation order can differ between engines, ints cannot;
* ratios/averages are rounded to 6 decimals AFTER aggregation;
* every computed column is aliased identically in Spark and SQL;
* DuckDB ``sum(int)`` returns HUGEINT → always cast to BIGINT in oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _cents(col):
    return F.round(F.col(col) * 100).cast("long")


# --------------------------------------------------------------------------
# A1/A4 — hash aggregate with partial (map-side) combine: TPC-H Q1 shape
# --------------------------------------------------------------------------
def q_agg_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("long").alias("sum_qty"),
            F.sum(_cents("l_extendedprice")).alias("sum_base_cents"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


SQL_agg_pricing_summary = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(l_quantity) AS BIGINT)                    AS sum_qty,
       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
       ROUND(AVG(l_discount), 6)                          AS avg_disc,
       COUNT(*)                                           AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# J2/A7/O2 — shuffle join + group + top-k: revenue per order
# --------------------------------------------------------------------------
def q_join_top_revenue_orders(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    rev = li.groupBy("l_orderkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
                "long"
            )
        ).alias("revenue_cents")
    )
    return (
        orders.join(rev, orders.o_orderkey == rev.l_orderkey)
        .select("o_orderkey", "o_orderstatus", "revenue_cents")
        .orderBy(F.desc("revenue_cents"), "o_orderkey")
        .limit(10)
    )


SQL_join_top_revenue_orders = """
SELECT o_orderkey, o_orderstatus, revenue_cents
FROM orders
JOIN (
  SELECT l_orderkey,
         CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT)
           AS revenue_cents
  FROM lineitem GROUP BY l_orderkey
) r ON o_orderkey = r.l_orderkey
ORDER BY revenue_cents DESC, o_orderkey
LIMIT 10
"""


# --------------------------------------------------------------------------
# J1 — broadcast dimension joins: customer → nation → region rollup
# --------------------------------------------------------------------------
def q_join_broadcast_dims(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(_cents("c_acctbal")).alias("acctbal_cents"),
        )
    )


SQL_join_broadcast_dims = """
SELECT r_name, n_name, COUNT(*) AS n_customers,
       CAST(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS BIGINT) AS acctbal_cents
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


# --------------------------------------------------------------------------
# J3/D1 — left anti join: customers with no orders
# --------------------------------------------------------------------------
def q_anti_join_customers(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


SQL_anti_join_customers = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


# --------------------------------------------------------------------------
# J3 — left semi join: customers with at least one big order
# --------------------------------------------------------------------------
def q_semi_join_customers(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_acctbal"
    )


SQL_semi_join_customers = """
SELECT c_custkey, c_acctbal FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 200000)
"""


# --------------------------------------------------------------------------
# W1/A7 — window top-k per group: 3 biggest orders per customer
# --------------------------------------------------------------------------
def q_window_topk_per_customer(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", _cents("o_totalprice").alias("price_cents"), "rk")
    )


SQL_window_topk_per_customer = """
SELECT o_custkey, o_orderkey,
       CAST(ROUND(o_totalprice*100) AS BIGINT) AS price_cents, rk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders
) WHERE rk <= 3
"""


# --------------------------------------------------------------------------
# W4 — frame-spec running aggregate: cumulative monthly revenue
# --------------------------------------------------------------------------
def q_window_running_revenue(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(F.date_trunc("month", "o_orderdate").cast("date").alias("month"))
        .agg(F.sum(_cents("o_totalprice")).alias("rev_cents"))
    )
    w = Window.orderBy("month").rowsBetween(Window.unboundedPreceding, 0)
    return monthly.withColumn("cum_rev_cents", F.sum("rev_cents").over(w))


SQL_window_running_revenue = """
SELECT month, rev_cents,
       CAST(SUM(rev_cents) OVER (ORDER BY month
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_rev_cents
FROM (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM orders GROUP BY 1
)
"""


# --------------------------------------------------------------------------
# W3/J5 — lag: days between consecutive orders of one customer
# --------------------------------------------------------------------------
def q_window_order_gaps(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn("prev_date", F.lag("o_orderdate").over(w))
        .filter(F.col("prev_date").isNotNull())
        .select(
            "o_custkey",
            "o_orderkey",
            F.datediff(F.col("o_orderdate"), F.col("prev_date")).alias("gap_days"),
        )
    )


SQL_window_order_gaps = """
SELECT o_custkey, o_orderkey,
       CAST(date_diff('day', prev_date, o_orderdate) AS INT) AS gap_days
FROM (
  SELECT o_custkey, o_orderkey, o_orderdate,
         LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS prev_date
  FROM orders
) WHERE prev_date IS NOT NULL
"""


# --------------------------------------------------------------------------
# A3 — rollup: order counts by (status) and (status, priority)
# --------------------------------------------------------------------------
def q_rollup_order_stats(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"), F.sum(_cents("o_totalprice")).alias("total_cents"))
    )


SQL_rollup_order_stats = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


# --------------------------------------------------------------------------
# A2 — exact distinct counts
# --------------------------------------------------------------------------
def q_distinct_counts(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    a = o.agg(F.countDistinct("o_custkey").alias("n_active_customers"))
    b = li.agg(F.countDistinct("l_partkey", "l_suppkey").alias("n_part_supp"))
    return a.crossJoin(b)


SQL_distinct_counts = """
SELECT (SELECT COUNT(DISTINCT o_custkey) FROM orders) AS n_active_customers,
       (SELECT COUNT(DISTINCT (l_partkey, l_suppkey)) FROM lineitem) AS n_part_supp
"""


# --------------------------------------------------------------------------
# O4 — set ops: customers ordering in 1994 but not in 1995
# --------------------------------------------------------------------------
def q_set_except_1994_not_1995(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    y94 = o.filter(F.year("o_orderdate") == 1994).select("o_custkey")
    y95 = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    return y94.distinct().exceptAll(y95.distinct()).withColumnRenamed(
        "o_custkey", "custkey"
    )


SQL_set_except_1994_not_1995 = """
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate)=1994
EXCEPT
SELECT o_custkey FROM orders WHERE year(o_orderdate)=1995
"""


# --------------------------------------------------------------------------
# O1/O2 — global sort + limit with full tie-break
# --------------------------------------------------------------------------
def q_sort_limit_lineitems(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey", "l_linenumber", _cents("l_extendedprice").alias("price_cents")
        )
        .orderBy(F.desc("price_cents"), "l_orderkey", "l_linenumber")
        .limit(20)
    )


SQL_sort_limit_lineitems = """
SELECT l_orderkey, l_linenumber,
       CAST(ROUND(l_extendedprice*100) AS BIGINT) AS price_cents
FROM lineitem
ORDER BY price_cents DESC, l_orderkey, l_linenumber
LIMIT 20
"""


# --------------------------------------------------------------------------
# O3 — union + aggregate: high-value purchases ∪ error events
# --------------------------------------------------------------------------
def q_union_event_slices(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    hi = e.filter((F.col("event_type") == "purchase") & (F.col("value") > 50))
    err = e.filter(F.col("event_type") == "error")
    return (
        hi.unionByName(err)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.countDistinct("user_id").alias("n_users"))
    )


SQL_union_event_slices = """
SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
FROM (
  SELECT * FROM events WHERE event_type='purchase' AND value > 50
  UNION ALL
  SELECT * FROM events WHERE event_type='error'
) GROUP BY event_type
"""


# --------------------------------------------------------------------------
# §2.8 string functions: brand digits, name tokens
# --------------------------------------------------------------------------
def q_string_funcs_parts(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.lower(F.col("p_brand")).alias("brand_lower"),
            F.regexp_extract("p_brand", r"(\d+)", 1).alias("brand_num"),
            F.length("p_name").alias("name_len"),
            F.size(F.split(F.col("p_name"), " ")).alias("name_tokens"),
            F.substring(F.col("p_type"), 1, 5).alias("type_prefix"),
        )
    )


SQL_string_funcs_parts = """
SELECT p_partkey, LOWER(p_brand) AS brand_lower,
       COALESCE(regexp_extract(p_brand, '(\\d+)', 1), '') AS brand_num,
       CAST(LENGTH(p_name) AS INT) AS name_len,
       CAST(LEN(string_split(p_name, ' ')) AS INT) AS name_tokens,
       SUBSTRING(p_type, 1, 5) AS type_prefix
FROM part
"""


# --------------------------------------------------------------------------
# §2.8 date functions: orders per quarter
# --------------------------------------------------------------------------
def q_date_funcs_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("yr"),
            F.quarter("o_orderdate").alias("qtr"),
        )
        .agg(F.count("*").alias("n_orders"))
    )


SQL_date_funcs_orders = """
SELECT CAST(year(o_orderdate) AS INT) AS yr,
       CAST(quarter(o_orderdate) AS INT) AS qtr,
       COUNT(*) AS n_orders
FROM orders GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# §2.8 json: extract props.k from the events payload
# --------------------------------------------------------------------------
def q_json_extract_events(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return (
        e.withColumn("k", F.get_json_object("props", "$.k").cast("int"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


SQL_json_extract_events = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       CAST(MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS min_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------------
# W3 sessionization: count sessions per user (gap > 1800s starts a session)
# --------------------------------------------------------------------------
def q_sessionize_events(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_session",
            (
                F.col("prev_ts").isNull()
                | (F.unix_timestamp("ts") - F.unix_timestamp("prev_ts") > 1800)
            ).cast("int"),
        )
        .groupBy("user_id")
        .agg(
            F.sum("new_session").cast("long").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


SQL_sessionize_events = """
SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM (
  SELECT user_id,
         CASE WHEN prev_ts IS NULL
                   OR date_diff('second', prev_ts, ts) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM (
    SELECT user_id, ts, event_id,
           LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events
  )
) GROUP BY user_id
"""


# --------------------------------------------------------------------------
# A4 — percentile / min / max / avg over fetch-latency-like values
# --------------------------------------------------------------------------
def q_value_stats_events(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.min("value"), 6).alias("min_v"),
        F.round(F.max("value"), 6).alias("max_v"),
        F.round(F.avg("value"), 6).alias("avg_v"),
        F.count("*").alias("n"),
    )


SQL_value_stats_events = """
SELECT event_type, ROUND(MIN(value), 6) AS min_v, ROUND(MAX(value), 6) AS max_v,
       ROUND(AVG(value), 6) AS avg_v, COUNT(*) AS n
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------------
# J5 — as-of join: latest order of the same customer at or before each event.
# Scale pattern: union + per-key window (last-non-null carry-forward) — never
# the (customer x orders) blowup of a join+agg as-of.
# --------------------------------------------------------------------------
def q_asof_event_order(spark, sf_dir):
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") <= 2000)
    o = _t(spark, sf_dir, "orders")
    o_t = o.select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderdate").alias("pt"),
        F.lit(0).alias("kind"),  # orders sort before events at equal ts
        F.col("o_orderkey").alias("ok"),
        F.lit(None).cast("long").alias("event_id"),
    )
    e_t = e.select(
        F.col("user_id").alias("key"),
        F.col("ts").alias("pt"),
        F.lit(1).alias("kind"),
        F.lit(None).cast("long").alias("ok"),
        "event_id",
    )
    w = (
        Window.partitionBy("key")
        .orderBy("pt", "kind", "ok")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = o_t.unionByName(e_t).withColumn(
        "asof_orderkey", F.last("ok", ignorenulls=True).over(w)
    )
    return (
        carried.filter(F.col("kind") == 1)
        .select("event_id", "key", F.col("asof_orderkey"))
        .withColumnRenamed("key", "user_id")
    )


SQL_asof_event_order = """
WITH j AS (
  SELECT e.event_id, e.user_id, o.o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM events e JOIN orders o
    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
  WHERE e.user_id <= 2000
)
SELECT e.event_id, e.user_id, j.o_orderkey AS asof_orderkey
FROM (SELECT event_id, user_id FROM events WHERE user_id <= 2000) e
LEFT JOIN (SELECT event_id, o_orderkey FROM j WHERE rn = 1) j USING (event_id)
"""


# --------------------------------------------------------------------------
# W5 — rank / dense_rank / ntile per group
# --------------------------------------------------------------------------
def q_window_rank_ntile(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").filter(F.col("c_nationkey") < 5)
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
        F.ntile(4).over(w).alias("bal_quartile"),
    )


SQL_window_rank_ntile = """
SELECT c_custkey, c_nationkey,
       RANK() OVER w AS bal_rank,
       DENSE_RANK() OVER w AS bal_dense_rank,
       NTILE(4) OVER w AS bal_quartile
FROM customer WHERE c_nationkey < 5
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
"""


# --------------------------------------------------------------------------
# A3 — cube (all grouping-set combinations) over order status x priority
# --------------------------------------------------------------------------
def q_cube_order_stats(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


SQL_cube_order_stats = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS sum_price
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# --------------------------------------------------------------------------
# O4 — intersect: customers ordering in BOTH 1994 and 1995
# --------------------------------------------------------------------------
def q_set_intersect_1994_1995(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    y94 = o.filter(F.year("o_orderdate") == 1994).select("o_custkey")
    y95 = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    return y94.intersect(y95).withColumnRenamed("o_custkey", "custkey")


SQL_set_intersect_1994_1995 = """
SELECT o_custkey AS custkey FROM orders WHERE YEAR(o_orderdate) = 1994
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE YEAR(o_orderdate) = 1995
"""


QUERIES: dict[str, tuple] = {
    "agg_pricing_summary": (q_agg_pricing_summary, SQL_agg_pricing_summary),
    "asof_event_order": (q_asof_event_order, SQL_asof_event_order),
    "window_rank_ntile": (q_window_rank_ntile, SQL_window_rank_ntile),
    "cube_order_stats": (q_cube_order_stats, SQL_cube_order_stats),
    "set_intersect_1994_1995": (q_set_intersect_1994_1995, SQL_set_intersect_1994_1995),
    "join_top_revenue_orders": (q_join_top_revenue_orders, SQL_join_top_revenue_orders),
    "join_broadcast_dims": (q_join_broadcast_dims, SQL_join_broadcast_dims),
    "anti_join_customers": (q_anti_join_customers, SQL_anti_join_customers),
    "semi_join_customers": (q_semi_join_customers, SQL_semi_join_customers),
    "window_topk_per_customer": (q_window_topk_per_customer, SQL_window_topk_per_customer),
    "window_running_revenue": (q_window_running_revenue, SQL_window_running_revenue),
    "window_order_gaps": (q_window_order_gaps, SQL_window_order_gaps),
    "rollup_order_stats": (q_rollup_order_stats, SQL_rollup_order_stats),
    "distinct_counts": (q_distinct_counts, SQL_distinct_counts),
    "set_except_1994_not_1995": (q_set_except_1994_not_1995, SQL_set_except_1994_not_1995),
    "sort_limit_lineitems": (q_sort_limit_lineitems, SQL_sort_limit_lineitems),
    "union_event_slices": (q_union_event_slices, SQL_union_event_slices),
    "string_funcs_parts": (q_string_funcs_parts, SQL_string_funcs_parts),
    "date_funcs_orders": (q_date_funcs_orders, SQL_date_funcs_orders),
    "json_extract_events": (q_json_extract_events, SQL_json_extract_events),
    "sessionize_events": (q_sessionize_events, SQL_sessionize_events),
    "value_stats_events": (q_value_stats_events, SQL_value_stats_events),
}
