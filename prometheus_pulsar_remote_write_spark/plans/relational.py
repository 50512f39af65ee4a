"""Relational core (SURVEY.md §2.F F6): joins, aggregation, grouping sets,
windows, sorts/top-k, set ops, scalar functions -- over the TPC-H-ish tables.

Conventions shared with the DuckDB oracles:
  - money aggregates are EXACT e4/e6 integer sums (r13): the true value
    of sum(l_extendedprice * (1 - l_discount)) is a multiple of 1e-4,
    not 1e-2, so round(sum(DOUBLE), 2) has REACHABLE half boundaries
    where two engines' order-dependent double sums can land apart (the
    q9 round-10 incident class). Per-row pc*(100-dc) [and *(100+tc)]
    are exact longs; groups that are unbounded corpus fractions sum
    them in DECIMAL(38,0), key-bounded groups (per order / supplier /
    part) in BIGINT; the 2-decimal display value is the half-up
    integer ((A4 + 50) div 100) / 100.0 -- identical on both engines
    by integer arithmetic. Averages are exact e4/e6 rationals;
  - inputs that ARE 2-decimal (o_totalprice, acctbal) may keep
    round(sum(x), 2): their true sums sit ON the output grid, 0.005
    from any boundary -- unreachable by ~1e-10 double error;
  - every LIMIT carries a total tiebreak order;
  - timestamps leave queries as 'yyyy-MM-dd' strings or epoch BIGINTs.

Plan shape notes (the 100 TB story):
  - dimension joins (region/nation/customer/supplier/part) are broadcast:
    at any realistic scale these stay far below the broadcast threshold
    next to lineitem/orders, so Catalyst picks BHJ -- no shuffle of the
    fact side; the explicit F.broadcast hints pin that choice.
  - aggregations are partial+final hash aggregates by construction
    (groupBy over built-in aggs); AQE coalesces post-shuffle partitions.
  - top-k = orderBy+limit compiles to TakeOrderedAndProject (no full sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..schema import load_tables


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    tables = load_tables(spark, sf_dir, list(names))
    return [tables[n] for n in names]


def _rev_e4():
    """Exact e4-integer line revenue pc * (100 - dc) as a LONG column.

    Cents are exact with double error << 0.5, so floor(x + 0.5) via a
    long cast == round-half-up without a per-row BigDecimal. Sum this
    directly (BIGINT) when the group is key-bounded; cast to
    decimal(38,0) first when the group is an unbounded corpus fraction."""
    pc = (F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    dc = (F.col("l_discount") * 100 + F.lit(0.5)).cast("long")
    return pc * (F.lit(100) - dc)


#: DuckDB twin of _rev_e4 (sum() of BIGINT is HUGEINT -- overflow-free)
_REV_E4_SQL = (
    "round(l_extendedprice * 100)::BIGINT"
    " * (100 - round(l_discount * 100)::BIGINT)"
)


# --- aggregation ------------------------------------------------------------


def q1_pricing_summary(spark, sf_dir):
    # The averages are exact integer rationals in fixed point (the e4/e6
    # half-up floor-div the quality score uses, operators/text.py):
    # round(avg(DOUBLE), n) is the residual engine-lottery class (SCALE.md
    # §9) -- an average CAN land exactly on a half boundary where Spark
    # (shortest-decimal BigDecimal) and DuckDB (binary value) round apart.
    # l_quantity is integer-valued; price/discount are cent-quantized, so
    # avg at e4/e6 is round_half_up(scale * int_sum / n) with
    # scale = 1e4 (qty), 1e2 (price cents -> e4), 1e4 (disc cents -> e6).
    #
    # The display sums are DERIVED from the same integer sums the
    # averages use -- not re-aggregated as rounded doubles (the r12
    # conversion shipped both, doubling the aggregate list and q1's
    # sf0.1 wall 0.39s -> 0.91s): sum(l_quantity) IS __sq exactly
    # (integer-valued quantities), and round(sum(l_extendedprice), 2)
    # IS __sp/100.0 exactly (the cent sum fits in 2^53, so the long ->
    # double division is the correctly-rounded double of the exact
    # decimal both engines would round to). 6 aggregates, not 8.
    # disc_price / charge sums are computed as EXACT e4/e6 integers
    # (r13): the true sums are multiples of 1e-4 / 1e-6, not 1e-2, so
    # round(sum(DOUBLE), 2) has REACHABLE half boundaries (true sum
    # = x.xx50 exactly) where two engines' order-dependent double sums
    # can land on opposite sides -- the exact q9-incident class.
    # pc*(100-dc) and pc*(100-dc)*(100+tc) are exact longs per row;
    # the groups here are unbounded corpus fractions (6 flag/status
    # groups), so the sums go through DECIMAL(38,0), order-free.
    (li,) = _t(spark, sf_dir, "lineitem")
    pc = (F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    dc = (F.col("l_discount") * 100 + F.lit(0.5)).cast("long")
    tc = (F.col("l_tax") * 100 + F.lit(0.5)).cast("long")
    disc4 = (pc * (F.lit(100) - dc)).cast("decimal(38,0)")
    charge6 = (pc * (F.lit(100) - dc) * (F.lit(100) + tc)).cast("decimal(38,0)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(disc4).alias("__a4"),
            F.sum(charge6).alias("__a6"),
            F.sum(F.col("l_quantity").cast("long")).alias("__sq"),
            # cents are exact integers with double error << 0.5, so
            # floor(x + 0.5) via a long cast == round-half-up, without
            # Spark round()'s per-row BigDecimal round-trip
            F.sum((F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")).alias("__sp"),
            F.sum((F.col("l_discount") * 100 + F.lit(0.5)).cast("long")).alias("__sd"),
            F.count("*").alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            F.col("__sq").cast("double").alias("sum_qty"),
            (F.col("__sp") / F.lit(100.0)).alias("sum_base_price"),
            # half-up e4 -> e2: ((A4 + 50) div 100) / 100, exact
            F.expr("((__a4 + 50) div 100) / 100.0D").alias("sum_disc_price"),
            F.expr("((__a6 + 5000) div 10000) / 100.0D").alias("sum_charge"),
            F.expr(
                "((20000 * __sq + count_order) div (2 * count_order)) / 10000.0D"
            ).alias("avg_qty"),
            F.expr(
                "((200 * __sp + count_order) div (2 * count_order)) / 10000.0D"
            ).alias("avg_price"),
            F.expr(
                "((20000 * __sd + count_order) div (2 * count_order)) / 1000000.0D"
            ).alias("avg_disc"),
            "count_order",
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity::BIGINT)::BIGINT::DOUBLE                          AS sum_qty,
       sum(round(l_extendedprice * 100)::BIGINT)::BIGINT / 100.0        AS sum_base_price,
       ((sum(round(l_extendedprice * 100)::BIGINT
             * (100 - round(l_discount * 100)::BIGINT)) + 50)
        // 100) / 100.0                                                 AS sum_disc_price,
       ((sum(round(l_extendedprice * 100)::BIGINT
             * (100 - round(l_discount * 100)::BIGINT)
             * (100 + round(l_tax * 100)::BIGINT)) + 5000)
        // 10000) / 100.0                                               AS sum_charge,
       ((20000 * sum(l_quantity::BIGINT)::BIGINT + count(*))
        // (2 * count(*))) / 10000.0                                    AS avg_qty,
       ((200 * sum(round(l_extendedprice * 100)::BIGINT)::BIGINT + count(*))
        // (2 * count(*))) / 10000.0                                    AS avg_price,
       ((20000 * sum(round(l_discount * 100)::BIGINT)::BIGINT + count(*))
        // (2 * count(*))) / 1000000.0                                  AS avg_disc,
       count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark, sf_dir):
    cust, orders, li = _t(spark, sf_dir, "customer", "orders", "lineitem")
    cutoff = F.lit("1998-01-01").cast("timestamp")
    return (
        li.filter(F.col("l_shipdate") > cutoff)
        .join(orders.filter(F.col("o_orderdate") < cutoff), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(cust.filter(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"), "o_orderpriority")
        # per-order group (<= 7 lines): exact e4 BIGINT sum, half-up e2
        .agg(F.sum(_rev_e4()).alias("__a4"))
        .withColumn("revenue", F.expr("((__a4 + 50) div 100) / 100.0D"))
        .drop("__a4")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q3_SQL = f"""
SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority,
       ((sum({_REV_E4_SQL}) + 50) // 100) / 100.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q5_local_supplier_volume(spark, sf_dir):
    region, nation, cust, supp, orders, li = _t(
        spark, sf_dir, "region", "nation", "customer", "supplier", "orders", "lineitem"
    )
    dims = (
        nation.join(F.broadcast(region.filter(F.col("r_name") == "ASIA")),
                    F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        li.join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(dims), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        # per-nation group = unbounded corpus fraction: DECIMAL(38,0) sum
        .agg(F.sum(_rev_e4().cast("decimal(38,0)")).alias("__a4"))
        .select("n_name", F.expr("((__a4 + 50) div 100) / 100.0D").alias("revenue"))
    )


Q5_SQL = f"""
SELECT n_name, ((sum({_REV_E4_SQL}) + 50) // 100) / 100.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


def q10_returned_items(spark, sf_dir):
    cust, orders, li, nation = _t(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        # per-customer group (key-bounded): exact e4 BIGINT sum
        .agg(F.sum(_rev_e4()).alias("__a4"))
        .withColumn("revenue", F.expr("((__a4 + 50) div 100) / 100.0D"))
        .drop("__a4")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
        .withColumn("c_acctbal", F.round("c_acctbal", 2))
    )


Q10_SQL = f"""
SELECT c_custkey, c_name, n_name, round(c_acctbal, 2) AS c_acctbal,
       ((sum({_REV_E4_SQL}) + 50) // 100) / 100.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-07-01'
GROUP BY c_custkey, c_name, n_name, c_acctbal
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# --- joins: semi / anti -------------------------------------------------------


def semi_join_high_quantity(spark, sf_dir):
    orders, li = _t(spark, sf_dir, "orders", "lineitem")
    big = li.filter(F.col("l_quantity") >= 48).select("l_orderkey")
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .select("o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("o_totalprice"))
    )


SEMI_SQL = """
SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS o_totalprice
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
"""


def anti_join_customers_no_orders(spark, sf_dir):
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


ANTI_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


# --- grouping sets -----------------------------------------------------------


def rollup_order_counts(spark, sf_dir):
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


ROLLUP_SQL = """
SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
"""


def cube_lineitem_flags(spark, sf_dir):
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("qty"),
    )


CUBE_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity), 2) AS qty
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
"""


# --- windows ----------------------------------------------------------------


def window_top3_orders_per_segment(spark, sf_dir):
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "c_mktsegment", "o_orderkey", "o_custkey",
            F.round("o_totalprice", 2).alias("o_totalprice"), "rank",
        )
    )


WINDOW_TOP3_SQL = """
SELECT c_mktsegment, o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice, rank
FROM (
  SELECT c_mktsegment, o_orderkey, o_custkey, o_totalprice,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
  FROM orders JOIN customer ON o_custkey = c_custkey
) WHERE rank <= 3
"""


def window_running_revenue(spark, sf_dir):
    (orders,) = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        orders.filter(F.col("o_custkey") <= 100)
        .select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
            F.row_number().over(
                Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
            ).alias("order_seq"),
        )
    )


WINDOW_RUNNING_SQL = """
SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
           AS running_total,
       row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
           AS order_seq
FROM orders
WHERE o_custkey <= 100
"""


def window_lead_lag_ntile(spark, sf_dir):
    """Offset + distribution window functions (lead/lag/ntile/percent_rank/
    cume_dist/first_value/dense_rank) over per-customer order history; the
    total (o_orderdate, o_orderkey) order makes every value deterministic."""
    (orders,) = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wp = Window.partitionBy("o_custkey")
    # pct_rank/cume are exact e6 integer rationals (round(avg) lottery-
    # class cure, SCALE.md §9): the window order includes the unique
    # o_orderkey, so rank == row_number and percent_rank = (rn-1)/(n-1),
    # cume_dist = rn/n -- denominator-n rationals that CAN land exactly
    # on an e6 half boundary (e.g. rn-1=1, n-1=16000 -> 62.5e-6) where
    # round(DOUBLE) splits the engines.
    return (
        orders.filter(F.col("o_custkey") <= 200)
        .withColumns(
            {
                "__rn": F.row_number().over(w).cast("long"),
                "__n": F.count("*").over(wp).cast("long"),
            }
        )
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
            F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
            F.ntile(4).over(w).cast("bigint").alias("quartile"),
            F.expr(
                "CASE WHEN __n = 1 THEN 0.0D ELSE"
                " ((2000000 * (__rn - 1) + (__n - 1)) div (2 * (__n - 1)))"
                " / 1000000.0D END"
            ).alias("pct_rank"),
            F.expr(
                "((2000000 * __rn + __n) div (2 * __n)) / 1000000.0D"
            ).alias("cume"),
            F.round(F.first_value("o_totalprice").over(w), 2).alias("first_price"),
            F.dense_rank().over(w).cast("bigint").alias("drank"),
        )
    )


WINDOW_LEADLAG_SQL = """
SELECT o_custkey, o_orderkey,
       round(lag(o_totalprice)  OVER w, 2) AS prev_price,
       round(lead(o_totalprice) OVER w, 2) AS next_price,
       ntile(4) OVER w AS quartile,
       CASE WHEN count(*) OVER wp = 1 THEN 0.0
            ELSE ((2000000 * (row_number() OVER w - 1) + (count(*) OVER wp - 1))
                  // (2 * (count(*) OVER wp - 1))) / 1000000.0 END AS pct_rank,
       ((2000000 * row_number() OVER w + count(*) OVER wp)
        // (2 * count(*) OVER wp)) / 1000000.0 AS cume,
       round(first_value(o_totalprice) OVER w, 2) AS first_price,
       dense_rank() OVER w AS drank
FROM orders
WHERE o_custkey <= 200
WINDOW w  AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
       wp AS (PARTITION BY o_custkey)
"""


# --- sort / top-k ------------------------------------------------------------


def top_parts_by_retailprice(spark, sf_dir):
    (part,) = _t(spark, sf_dir, "part")
    return (
        part.orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
        .limit(15)
        .select("p_partkey", "p_name", "p_brand", F.round("p_retailprice", 2).alias("p_retailprice"))
    )


TOPK_SQL = """
SELECT p_partkey, p_name, p_brand, round(p_retailprice, 2) AS p_retailprice
FROM part ORDER BY p_retailprice DESC, p_partkey ASC LIMIT 15
"""


# --- set operations -----------------------------------------------------------


def setop_nation_coverage(spark, sf_dir):
    cust, supp = _t(spark, sf_dir, "customer", "supplier")
    c_nations = cust.select(F.col("c_nationkey").alias("nationkey")).distinct()
    s_nations = supp.select(F.col("s_nationkey").alias("nationkey")).distinct()
    both = c_nations.intersect(s_nations).withColumn("coverage", F.lit("both"))
    cust_only = c_nations.exceptAll(s_nations).withColumn("coverage", F.lit("customer_only"))
    return both.unionByName(cust_only)


SETOP_SQL = """
SELECT nationkey, 'both' AS coverage
FROM (SELECT DISTINCT c_nationkey AS nationkey FROM customer
      INTERSECT
      SELECT DISTINCT s_nationkey FROM supplier)
UNION ALL
SELECT nationkey, 'customer_only' AS coverage
FROM (SELECT DISTINCT c_nationkey AS nationkey FROM customer
      EXCEPT
      SELECT DISTINCT s_nationkey FROM supplier)
"""


# --- scalar functions ----------------------------------------------------------


def scalar_functions_showcase(spark, sf_dir):
    (part,) = _t(spark, sf_dir, "part")
    return part.filter(F.col("p_partkey") <= 200).select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat_ws("-", "p_brand", F.col("p_size").cast("string")).alias("brand_size"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("key_padded"),
        F.abs(F.col("p_size") - 25).alias("size_dist"),
        (F.col("p_size") % 7).alias("size_mod"),
        F.floor(F.col("p_retailprice")).alias("price_floor"),
        F.ceil(F.col("p_retailprice")).alias("price_ceil"),
        F.round(F.sqrt(F.col("p_retailprice")), 6).alias("price_sqrt"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
        F.translate("p_type", "aeiou", "AEIOU").alias("type_vowels"),
    )


SCALAR_SQL = """
SELECT p_partkey,
       upper(p_name)                              AS name_upper,
       length(p_name)                             AS name_len,
       substr(p_type, 1, 5)                       AS type_prefix,
       concat_ws('-', p_brand, p_size::VARCHAR)   AS brand_size,
       lpad(p_partkey::VARCHAR, 8, '0')           AS key_padded,
       abs(p_size - 25)                           AS size_dist,
       p_size % 7                                 AS size_mod,
       floor(p_retailprice)::BIGINT               AS price_floor,
       ceil(p_retailprice)::BIGINT                AS price_ceil,
       round(sqrt(p_retailprice), 6)              AS price_sqrt,
       reverse(p_brand)                           AS brand_rev,
       translate(p_type, 'aeiou', 'AEIOU')        AS type_vowels
FROM part WHERE p_partkey <= 200
"""


def date_functions_showcase(spark, sf_dir):
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderkey") <= 500).select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mon"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("qtr"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_2002"
        ),
        F.unix_timestamp("o_orderdate").alias("epoch_sec"),
    )


DATEFN_SQL = """
SELECT o_orderkey,
       year(o_orderdate)                                    AS yr,
       month(o_orderdate)                                   AS mon,
       day(o_orderdate)                                     AS dom,
       quarter(o_orderdate)                                 AS qtr,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       datediff('day', o_orderdate::DATE, DATE '2002-01-01') AS days_to_2002,
       epoch(o_orderdate)::BIGINT                           AS epoch_sec
FROM orders WHERE o_orderkey <= 500
"""


# --- aggregate stats / having / pivot -------------------------------------------


def agg_stats_by_status(spark, sf_dir):
    # avg_price is an exact e4 rational over cent integers (the round(avg)
    # lottery-class cure, SCALE.md §9). sd_price computes its moments as
    # EXACT integer sums (cents in DECIMAL(38,0) / HUGEINT -- order-free,
    # so no engine-dependent Welford merge), then one identical
    # integer->double cast, division, sqrt (all correctly-rounded IEEE)
    # and floor-quantization: bit-identical on both engines end-to-end,
    # where round(stddev_samp(DOUBLE), 4) depended on two different
    # streaming-moment implementations agreeing.
    # cents are exact with double error << 0.5: floor(x + 0.5) via a long
    # cast == round-half-up without the per-row BigDecimal round-trip,
    # and the plain cent sum __sp is DERIVED from the decimal moment sum
    # __s1 (same number) instead of being aggregated a second time.
    (orders,) = _t(spark, sf_dir, "orders")
    xc = (F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    return (
        orders.withColumn("__xc", xc)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
            F.sum(F.expr("cast(__xc as decimal(38,0))")).alias("__s1"),
            F.sum(F.expr("cast(__xc * __xc as decimal(38,0))")).alias("__s2"),
        )
        .select(
            "o_orderstatus",
            "n",
            "n_customers",
            "min_price",
            "max_price",
            F.expr(
                "((200 * cast(__s1 as bigint) + n) div (2 * n)) / 10000.0D"
            ).alias("avg_price"),
            F.expr(
                "CASE WHEN n > 1 THEN"
                " floor(sqrt(cast(n * __s2 - __s1 * __s1 as double)"
                "            / (cast(n as double) * cast(n - 1 as double)))"
                "       * 100.0D + 0.5D) / 10000.0D END"
            ).alias("sd_price"),
        )
    )


AGG_STATS_SQL = """
SELECT o_orderstatus, n, n_customers, min_price, max_price,
       ((200 * s1::BIGINT + n) // (2 * n)) / 10000.0 AS avg_price,
       CASE WHEN n > 1 THEN
         floor(sqrt((n * s2 - s1 * s1)::DOUBLE
                    / (n::DOUBLE * (n - 1)::DOUBLE)) * 100.0 + 0.5) / 10000.0
       END AS sd_price
FROM (
  SELECT o_orderstatus, count(*) AS n, count(DISTINCT o_custkey) AS n_customers,
         round(min(o_totalprice), 2) AS min_price,
         round(max(o_totalprice), 2) AS max_price,
         sum(round(o_totalprice * 100)::BIGINT) AS s1,
         sum(round(o_totalprice * 100)::BIGINT * round(o_totalprice * 100)::BIGINT)
             AS s2
  FROM orders GROUP BY o_orderstatus
)
"""


def having_frequent_customers(spark, sf_dir):
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("total_spent"))
        .filter(F.col("n_orders") >= 8)
    )


HAVING_SQL = """
SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_spent
FROM orders GROUP BY o_custkey HAVING count(*) >= 8
"""


def pivot_status_by_priority(spark, sf_dir):
    (orders,) = _t(spark, sf_dir, "orders")
    # conditional aggregation rather than .pivot() so column names are
    # explicit and identical to the oracle
    return orders.groupBy("o_orderpriority").agg(
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("n_open"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_filled"),
        F.sum(F.when(F.col("o_orderstatus") == "P", 1).otherwise(0)).alias("n_partial"),
    )


PIVOT_SQL = """
SELECT o_orderpriority,
       sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)::BIGINT AS n_open,
       sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)::BIGINT AS n_filled,
       sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)::BIGINT AS n_partial
FROM orders GROUP BY o_orderpriority
"""


# --- TPC-H-shaped additions (adapted to the synthetic columns) ----------------


def q4_priority_with_returns(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS-correlated count by priority (semi join)."""
    orders, li = _t(spark, sf_dir, "orders", "lineitem")
    returned = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .join(returned, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""


def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6: single-table filtered aggregate; fully pushed-down scan."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        # global aggregate: exact e4 pc*dc in DECIMAL(38,0), half-up e2
        .agg(
            F.sum(
                (
                    (F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
                    * (F.col("l_discount") * 100 + F.lit(0.5)).cast("long")
                ).cast("decimal(38,0)")
            ).alias("__a4")
        )
        .select(F.expr("((__a4 + 50) div 100) / 100.0D").alias("revenue"))
    )


Q6_SQL = """
SELECT ((sum(round(l_extendedprice * 100)::BIGINT
             * round(l_discount * 100)::BIGINT) + 50) // 100) / 100.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: conditional-aggregate ratio over a broadcast dim join."""
    part, li = _t(spark, sf_dir, "part", "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        # ratio of two order-dependent double sums was the WORST residual
        # lottery shape; both sums are exact e4 DECIMAL(38,0) integers
        # now, and the e4-rounded percentage is the half-up rational
        # (2*10^6*A + B) div (2B) / 10^4 -- exact on both engines
        .agg(
            F.sum(
                F.when(F.col("p_type") == "PROMO", _rev_e4())
                .otherwise(F.lit(0).cast("long"))
                .cast("decimal(38,0)")
            ).alias("__a"),
            F.sum(_rev_e4().cast("decimal(38,0)")).alias("__b"),
        )
        .select(
            F.expr(
                "((2000000 * __a + __b) div (2 * __b)) / 10000.0D"
            ).alias("promo_pct")
        )
    )


Q14_SQL = f"""
SELECT ((2000000 * sum(CASE WHEN p_type = 'PROMO' THEN {_REV_E4_SQL}
                            ELSE 0 END)
         + sum({_REV_E4_SQL}))
        // (2 * sum({_REV_E4_SQL}))) / 10000.0 AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'
"""


def q18_large_volume_orders(spark, sf_dir):
    """TPC-H Q18 shape: IN-subquery over a grouped HAVING, top-N result.

    Spark plan: lineitem aggregates first (partial+final hash agg), the
    surviving keys join orders (small side after the filter -> AQE can
    broadcast), customer is broadcast."""
    cust, orders, li = _t(spark, sf_dir, "customer", "orders", "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(20)
    )


Q18_SQL = """
SELECT c_custkey, c_name, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       round(o_totalprice, 2) AS o_totalprice, total_qty
FROM orders
JOIN (SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 250) big ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, o_orderkey ASC
LIMIT 20
"""


def q19_disjunctive_join(spark, sf_dir):
    """TPC-H Q19 shape: OR-of-ANDs join predicate (tests predicate
    normalization; the common l_partkey = p_partkey conjunct stays the
    equi-join key so Catalyst still picks a hash join)."""
    part, li = _t(spark, sf_dir, "part", "lineitem")
    cond = (
        ((F.col("p_brand") == "Brand#12") & (F.col("p_size").between(1, 15))
         & (F.col("l_quantity").between(1, 11)))
        | ((F.col("p_brand") == "Brand#23") & (F.col("p_size").between(1, 25))
           & (F.col("l_quantity").between(10, 20)))
        | ((F.col("p_brand") == "Brand#34") & (F.col("p_size").between(1, 35))
           & (F.col("l_quantity").between(20, 30)))
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(_rev_e4().cast("decimal(38,0)")).alias("__a4"),
        )
        .select(
            "n_lines", F.expr("((__a4 + 50) div 100) / 100.0D").alias("revenue")
        )
    )


Q19_SQL = f"""
SELECT count(*) AS n_lines,
       ((sum({_REV_E4_SQL}) + 50) // 100) / 100.0 AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""


def groupingsets_order_revenue(spark, sf_dir):
    """Explicit GROUPING SETS (beyond rollup/cube): three chosen groupings."""
    (orders,) = _t(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus, count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                (o_orderpriority), (o_orderstatus))
        """
    )


GROUPINGSETS_SQL = """
SELECT o_orderpriority, o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), (o_orderstatus))
"""


def correlated_above_brand_avg(spark, sf_dir):
    """Correlated-scalar-subquery shape: parts priced >= brand avg + 50.

    Decorrelated the way an optimizer would: grouped brand averages
    (25 rows) broadcast-joined back to part -- one scan + one BHJ, no
    per-row subquery execution."""
    (part,) = _t(spark, sf_dir, "part")
    # the FILTER is the exact integer inequality (r13): with avg =
    # sc/(100n) dollars, p >= avg + 50 <=> p_cents*n >= sc + 5000n --
    # no double avg aggregate at all, and no dependence on two engines'
    # avg() producing the same last-ulp double at the >= boundary.
    # Cents are exact with double error << 0.5, so floor(x + 0.5) via a
    # long cast == round-half-up without the per-row BigDecimal.
    brand_avg = part.groupBy(F.col("p_brand").alias("b_brand")).agg(
        F.sum((F.col("p_retailprice") * 100 + F.lit(0.5)).cast("long")).alias("__sc"),
        F.count("*").alias("__n"),
    )
    return (
        part.join(F.broadcast(brand_avg), F.col("p_brand") == F.col("b_brand"))
        .filter(
            F.expr(
                "cast(p_retailprice * 100 + 0.5D as bigint) * __n"
                " >= __sc + 5000 * __n"
            )
        )
        .select(
            "p_partkey",
            "p_brand",
            F.round("p_retailprice", 2).alias("p_retailprice"),
            F.expr("((200 * __sc + __n) div (2 * __n)) / 10000.0D").alias(
                "brand_avg"
            ),
        )
    )


CORRELATED_SQL = """
SELECT p_partkey, p_brand, round(p_retailprice, 2) AS p_retailprice,
       ((200 * sc + n) // (2 * n)) / 10000.0 AS brand_avg
FROM (
  SELECT p_partkey, p_brand, p_retailprice,
         sum(round(p_retailprice * 100)::BIGINT) OVER (PARTITION BY p_brand)::BIGINT AS sc,
         count(*) OVER (PARTITION BY p_brand) AS n
  FROM part
) WHERE round(p_retailprice * 100)::BIGINT * n >= sc + 5000 * n
"""


# --- array / json scalar functions -------------------------------------------


def array_functions_showcase(spark, sf_dir):
    """Array-function surface over array<float> embeddings: size/element_at/
    min/max, lambda transform+aggregate (sum), lambda filter (count>0) --
    all JVM-side higher-order functions, no UDFs."""
    (emb,) = _t(spark, sf_dir, "embeddings")
    as_double = F.transform("embedding", lambda x: x.cast("double"))

    # floor(x*1e6 + 0.5), NOT round(x, 6): the per-row doubles are
    # bit-identical on both engines (same float32 -> double cast, same
    # fold), but a float32 value CAN sit exactly on a decimal e6 half
    # (e.g. 2^-7 = 0.0078125) where round() splits the engines
    # (SCALE.md §9 lottery class)
    def q6(c):
        return F.floor(c * 1e6 + 0.5) / 1e6

    return emb.filter(F.col("vec_id") <= 200).select(
        "vec_id",
        F.size("embedding").alias("dim"),
        q6(F.element_at("embedding", 1).cast("double")).alias("first_val"),
        q6(F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + x)).alias(
            "sum_val"
        ),
        q6(F.array_max("embedding").cast("double")).alias("max_val"),
        q6(F.array_min("embedding").cast("double")).alias("min_val"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
    )


ARRAYFN_SQL = """
SELECT vec_id,
       len(embedding)                                              AS dim,
       floor(embedding[1]::DOUBLE * 1e6 + 0.5) / 1e6               AS first_val,
       floor(list_sum(list_transform(embedding, x -> x::DOUBLE)) * 1e6 + 0.5)
         / 1e6                                                     AS sum_val,
       floor(list_max(embedding)::DOUBLE * 1e6 + 0.5) / 1e6        AS max_val,
       floor(list_min(embedding)::DOUBLE * 1e6 + 0.5) / 1e6        AS min_val,
       len(list_filter(embedding, x -> x > 0))                     AS n_pos
FROM embeddings WHERE vec_id <= 200
"""


def json_functions_showcase(spark, sf_dir):
    """JSON path extraction + construction over events.props."""
    (ev,) = _t(spark, sf_dir, "events")
    return ev.filter(F.col("event_id") <= 2000).select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
        F.to_json(
            F.struct(F.col("event_type").alias("t"), F.col("user_id").alias("u"))
        ).alias("j"),
    )


JSONFN_SQL = """
SELECT event_id,
       json_extract(props, '$.k')::INT AS k,
       to_json(struct_pack(t := event_type, u := user_id)) AS j
FROM events WHERE event_id <= 2000
"""


def variant_functions_showcase(spark, sf_dir):
    """Spark 4 VARIANT over events.props: parse once into the binary
    semi-structured type, path-extract with try_variant_get, aggregate.
    At scale this is the modern shape for ragged JSON: parse_json runs
    once per row at ingest, every downstream path access is a cheap typed
    probe into the variant encoding instead of a string re-parse."""
    (ev,) = _t(spark, sf_dir, "events")
    k = ev.select(
        "event_type",
        F.try_variant_get(F.parse_json(F.col("props")), "$.k", "long").alias("k"),
    )
    return k.groupBy("event_type").agg(
        F.count("k").alias("n"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.sum("k").alias("sum_k"),
        # exact e4 rational (round(avg) lottery-class cure, SCALE.md §9);
        # NULLIF keeps the all-NULL group NULL like avg() would
        F.expr(
            "((20000 * sum(k) + count(k)) div (2 * nullif(count(k), 0))) / 10000.0D"
        ).alias("avg_k"),
    )


VARIANTFN_SQL = """
SELECT event_type, count(k) AS n, min(k) AS min_k, max(k) AS max_k,
       sum(k)::BIGINT AS sum_k,
       ((20000 * sum(k)::BIGINT + count(k)) // (2 * NULLIF(count(k), 0))) / 10000.0
           AS avg_k
FROM (SELECT event_type, json_extract(props, '$.k')::BIGINT AS k FROM events)
GROUP BY event_type
"""



# --- TPC-H shapes, round 2 (q7/q8/q13/q15/q17/q22 adapted to the synthetic
# columns; no partsupp table exists, so supplycost-dependent queries use
# discounted revenue instead) ---------------------------------------------------


def q7_volume_shipping(spark, sf_dir):
    """Q7 shape: nation-pair shipping volume by year (two broadcast nation
    joins on different keys, conditional pair filter)."""
    nation, cust, supp, orders, li = _t(
        spark, sf_dir, "nation", "customer", "supplier", "orders", "lineitem"
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pairs = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return (
        pairs.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.sum(_rev_e4().cast("decimal(38,0)")).alias("__a4"))
        .select(
            "supp_nation",
            "cust_nation",
            "l_year",
            F.expr("((__a4 + 50) div 100) / 100.0D").alias("revenue"),
        )
    )


Q7_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       ((sum({_REV_E4_SQL}) + 50) // 100) / 100.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY 1, 2, 3
"""


def q8_market_share(spark, sf_dir):
    """Q8 shape: a nation's share of regional revenue by year (conditional
    sum over a 6-table join)."""
    region, nation, cust, supp, orders, li = _t(
        spark, sf_dir, "region", "nation", "customer", "supplier", "orders", "lineitem"
    )
    cn = nation.join(
        F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select(F.col("n_nationkey").alias("c_nkey"))
    sn = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    vol = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nkey"))
        .withColumn("vol4", _rev_e4())
    )
    return (
        vol.groupBy(F.year("o_orderdate").alias("o_year"))
        # exact e6 rational of two DECIMAL(38,0) e4 sums (see q14)
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_1", F.col("vol4"))
                .otherwise(F.lit(0).cast("long"))
                .cast("decimal(38,0)")
            ).alias("__a"),
            F.sum(F.col("vol4").cast("decimal(38,0)")).alias("__b"),
        )
        .select(
            "o_year",
            F.expr(
                "((2000000 * __a + __b) div (2 * __b)) / 1000000.0D"
            ).alias("mkt_share"),
        )
    )


Q8_SQL = f"""
SELECT year(o_orderdate) AS o_year,
       ((2000000 * sum(CASE WHEN n2.n_name = 'NATION_1'
                            THEN {_REV_E4_SQL} ELSE 0 END)
         + sum({_REV_E4_SQL}))
        // (2 * sum({_REV_E4_SQL}))) / 1000000.0 AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'EUROPE'
GROUP BY 1
"""


def q13_order_count_distribution(spark, sf_dir):
    """Q13: distribution of per-customer order counts (left outer join +
    double aggregation -- the count-of-counts histogram shape)."""
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    per_cust = cust.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left"
    ).groupBy("c_custkey").agg(F.count("o_orderkey").alias("c_count"))
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
"""


def q15_top_supplier(spark, sf_dir):
    """Q15 shape: supplier(s) with the maximum 3-month revenue (aggregate
    view + global-max scalar subquery, no LIMIT ties-droppage)."""
    supp, li = _t(spark, sf_dir, "supplier", "lineitem")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        # per-supplier group (key-bounded): exact e4 BIGINT sum; the
        # max-equality join below is robust because the value is exact
        .agg(F.sum(_rev_e4()).alias("__a4"))
        .withColumn("total_revenue", F.expr("((__a4 + 50) div 100) / 100.0D"))
        .drop("__a4")
    )
    max_rev = rev.agg(F.max("total_revenue").alias("m"))
    return (
        rev.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("m"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         ((sum({_REV_E4_SQL}) + 50) // 100) / 100.0 AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON supplier_no = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


def q17_small_quantity_revenue(spark, sf_dir):
    """Q17 shape: revenue from line items far below their part's average
    quantity (correlated per-part avg subquery -> broadcast agg join)."""
    part, li = _t(spark, sf_dir, "part", "lineitem")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg")
    )
    return (
        li.join(F.broadcast(part.filter(F.col("p_brand") == "Brand#1")),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(avg_qty), F.col("l_partkey") == F.col("ap_key"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        # sum/7 is an exact rational over cent integers (round(avg)
        # lottery-class cure, SCALE.md §9): e2 half-up = cents/7 half-up
        .agg(
            F.expr(
                "((2 * sum(cast(round(l_extendedprice * 100) AS BIGINT)) + 7)"
                " div 14) / 100.0D"
            ).alias("avg_yearly")
        )
    )


Q17_SQL = """
SELECT ((2 * sum(round(l_extendedprice * 100)::BIGINT)::BIGINT + 7) // 14) / 100.0
           AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = lineitem.l_partkey)
"""


def q22_dormant_rich_customers(spark, sf_dir):
    """Q22 shape: customers above the positive-balance average with no
    RECENT orders (scalar subquery + anti join), counted per nation.

    The threshold is the exact integer inequality (r13): acctbal is
    cent-quantized but NOT integer-valued, so avg() is a sum of
    non-integer doubles -- order-dependent across engines -- and the
    rational sum/(100n) CAN exactly equal an e2 balance, where the
    last-ulp summation difference would decide the > filter. With
    bc = balance cents: bc > sc / n  <=>  bc * n > sc, exact.

    Cents come from floor(x*100 + 0.5) -- floor_quant semantics -- NOT
    (x*100 + 0.5)::long (r14): the long cast truncates toward ZERO, so a
    NEGATIVE balance would yield -12344 where DuckDB's round() yields
    -12345. acctbal is the one money column with negatives; the old
    idiom pair only agreed because the filter compares against a
    strictly positive threshold. floor() is engine-identical on the
    whole real line, so both sides now compute the same idiom."""
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    bc = F.floor(F.col("c_acctbal") * 100 + F.lit(0.5))
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.sum(bc.cast("decimal(38,0)")).alias("__sc"),
        F.count("*").alias("__n"),
    )
    rich = (
        cust.join(F.broadcast(avg_bal))
        .filter(
            F.expr(
                "cast(floor(c_acctbal * 100 + 0.5D) as decimal(38,0))"
                " * __n > __sc"
            )
        )
    )
    recent = orders.filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
    dormant = rich.join(
        recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    )
    return dormant.groupBy("c_nationkey").agg(
        F.count("*").alias("numcust"),
        F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
    )


Q22_SQL = """
SELECT c_nationkey, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
FROM customer
WHERE CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
      * (SELECT count(*) FROM customer WHERE c_acctbal > 0)
      > (SELECT sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) FROM customer
         WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_nationkey
"""


def agg_percentiles_by_status(spark, sf_dir):
    """Exact interpolated percentiles (median/p90/p99) of order totals per
    status, computed ENTIRELY in cent integers: with 2-decimal quantiles
    over 2-decimal values, the interpolation fraction q*(n-1) mod 1 has
    denominator 100, so lo_cents*100 + (hi_cents-lo_cents)*f100 IS the
    e4 fixed-point result -- no double interpolation, no round(DOUBLE,4)
    engine lottery (SCALE.md §9), bit-identical on both engines by
    integer arithmetic. The rank-based shape (row_number + two picked
    order statistics per quantile) also replaces percentile()'s
    per-group collected state with a distributed window sort -- the
    version that survives a group holding a third of a 100 TB table."""
    (orders,) = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    w = Window.partitionBy("o_orderstatus").orderBy("__c")
    wp = Window.partitionBy("o_orderstatus")
    t = (
        orders.select("o_orderstatus", cents.alias("__c"))
        .withColumn("__rn", F.row_number().over(w).cast("long"))
        .withColumn("__n", F.count("*").over(wp).cast("long"))
    )

    def pick(q100: int, name: str):
        lo = f"max(CASE WHEN __rn = ({q100} * (__n - 1)) div 100 + 1 THEN __c END)"
        hi = (
            f"max(CASE WHEN __rn = least(({q100} * (__n - 1)) div 100 + 2, __n)"
            " THEN __c END)"
        )
        f100 = f"max(({q100} * (__n - 1)) % 100)"
        return F.expr(
            f"(100 * {lo} + ({hi} - {lo}) * {f100}) / 10000.0D"
        ).alias(name)

    return t.groupBy("o_orderstatus").agg(
        pick(50, "p50"), pick(90, "p90"), pick(99, "p99")
    )


def _percentiles_sql() -> str:
    def pick(q100: int, name: str) -> str:
        lo = f"max(CASE WHEN rn = ({q100} * (n - 1)) // 100 + 1 THEN c END)"
        hi = (
            f"max(CASE WHEN rn = least(({q100} * (n - 1)) // 100 + 2, n)"
            " THEN c END)"
        )
        f100 = f"max(({q100} * (n - 1)) % 100)"
        return f"(100 * {lo} + ({hi} - {lo}) * {f100}) / 10000.0 AS {name}"

    return f"""
WITH t AS (
  SELECT o_orderstatus, round(o_totalprice * 100)::BIGINT AS c,
         row_number() OVER (PARTITION BY o_orderstatus
                            ORDER BY round(o_totalprice * 100)::BIGINT) AS rn,
         count(*) OVER (PARTITION BY o_orderstatus) AS n
  FROM orders
)
SELECT o_orderstatus, {pick(50, "p50")}, {pick(90, "p90")}, {pick(99, "p99")}
FROM t GROUP BY o_orderstatus
"""


PERCENTILES_SQL = _percentiles_sql()


def q2_min_cost_supplier(spark, sf_dir):
    """Q2 shape: cheapest supplier per part (min-per-group subquery joined
    back, then dim joins). The testdata has no partsupp, so the part-supplier
    cost relation is derived from lineitem unit prices -- the query shape
    (aggregate -> per-group min -> equality join back -> dim broadcast ->
    top-k) is Q2's. Reference has no joins at all (SURVEY §2.E); this is
    the F6 analytics surface."""
    part, supp, nation, li = _t(spark, sf_dir, "part", "supplier", "nation", "lineitem")
    # avg of a per-row RATIO is the q9 class twice over: the ratio doubles
    # are not exactly representable, so their sum is order-dependent AND
    # round(avg) is the half-boundary lottery. Cure per SCALE.md §9:
    # floor-quantize each ratio to micro units (pure IEEE, engine-
    # identical per row), then the average is an exact integer rational.
    unit_micro = F.floor(
        F.col("l_extendedprice") / F.col("l_quantity") * F.lit(1000000.0)
        + F.lit(0.5)
    )
    ps = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(unit_micro).alias("__su"), F.count("*").alias("__n"))
        .select(
            "l_partkey",
            "l_suppkey",
            F.expr(
                "((2 * __su + 100 * __n) div (200 * __n)) / 10000.0D"
            ).alias("unit_cost"),
        )
    )
    min_cost = ps.groupBy(F.col("l_partkey").alias("mc_partkey")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    return (
        ps.join(
            F.broadcast(min_cost),
            (F.col("l_partkey") == F.col("mc_partkey"))
            & (F.col("unit_cost") == F.col("min_cost")),
        )
        .join(
            F.broadcast(part.filter((F.col("p_size") <= 10) & (F.col("p_type") == "SMALL"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "unit_cost",
        )
        .orderBy(F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"), F.asc("p_partkey"))
        .limit(100)
    )


Q2_SQL = """
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         ((2 * sum(floor(l_extendedprice / l_quantity * 1000000.0 + 0.5)::BIGINT)::BIGINT
           + 100 * count(*)) // (200 * count(*))) / 10000.0 AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name, p_partkey, unit_cost
FROM ps
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_size <= 10 AND p_type = 'SMALL'
  AND unit_cost = (SELECT min(unit_cost) FROM ps ps2 WHERE ps2.l_partkey = ps.l_partkey)
ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
LIMIT 100
"""


def q9_product_type_profit(spark, sf_dir):
    """Q9 shape: profit by (nation, year) over a part-name-filtered 5-table
    join. No partsupp => supply cost proxied by 60% of the part's retail
    price; the join/agg topology (LIKE-filtered part dim, supplier->nation,
    order-year grouping) is Q9's.

    The per-row profit quantizes to EXACT 1e-4-dollar integers before the
    sum (prices are 2dp, discounts 2dp, retail 1dp, quantity integral --
    the products are integers by construction), so the aggregate is a
    bigint sum whose value is independent of summation order. Round 10:
    the previous double-sum + round(2) hash-matched on the driver corpus
    by ORDER LUCK and lost the last cent on a statistically identical
    fixture instance -- the exact float-indeterminism class the repo's
    integer-quantization convention exists to prevent."""
    part, supp, nation, orders, li = _t(
        spark, sf_dir, "part", "supplier", "nation", "orders", "lineitem"
    )
    profit_e4 = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("long"))
        - F.lit(600)
        * F.round(F.col("p_retailprice") * 10).cast("long")
        * F.col("l_quantity").cast("long")
    )
    return (
        li.join(
            F.broadcast(part.filter(F.col("p_name").like("%red%"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(profit_e4).alias("sum_profit_e4"))
    )


Q9_SQL = """
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT))
                - 600 * CAST(round(p_retailprice * 10) AS BIGINT)
                  * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_profit_e4
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
"""


def q11_important_part_value(spark, sf_dir):
    """Q11 shape: per-part inventory value restricted to one nation's
    suppliers, kept only when above a fraction of the global total (scalar
    subquery in HAVING -> broadcast cross join of a 1-row aggregate)."""
    supp, nation, li = _t(spark, sf_dir, "supplier", "nation", "lineitem")
    national = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(nation.filter(F.col("n_name") == "NATION_3")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .withColumn("val4", _rev_e4())
    )
    # per-part value: exact e4 BIGINT sum, half-up e2 cents v2; the
    # 0.1%-of-total HAVING is the exact integer inequality
    # v2/100 > T4/10^7  <=>  v2 * 10^5 > T4 (both DECIMAL(38,0))
    per_part = national.groupBy("l_partkey").agg(F.sum("val4").alias("__a4"))
    total = national.agg(
        F.sum(F.col("val4").cast("decimal(38,0)")).alias("__t4")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(
            F.expr(
                "cast((__a4 + 50) div 100 as decimal(38,0)) * 100000 > __t4"
            )
        )
        .select(
            "l_partkey", F.expr("((__a4 + 50) div 100) / 100.0D").alias("value")
        )
        .orderBy(F.desc("value"), F.asc("l_partkey"))
    )


Q11_SQL = f"""
WITH national AS (
  SELECT l_partkey, {_REV_E4_SQL} AS val4
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
)
SELECT l_partkey, ((sum(val4) + 50) // 100) / 100.0 AS value
FROM national
GROUP BY l_partkey
HAVING ((sum(val4) + 50) // 100) * 100000 > (SELECT sum(val4) FROM national)
ORDER BY value DESC, l_partkey ASC
"""


def q12_late_shipment_priority(spark, sf_dir):
    """Q12 shape: conditional two-way counts of late shipments per class.
    No l_commitdate/l_receiptdate in the testdata => "late" is shipping
    more than 60 days after the order date; the CASE-sum split between
    critical and other priorities is Q12's."""
    orders, li = _t(spark, sf_dir, "orders", "lineitem")
    late = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    critical = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return late.groupBy("l_returnflag").agg(
        F.sum(F.when(critical, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
        F.sum(F.when(~critical, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
    )


Q12_SQL = """
SELECT l_returnflag,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_returnflag
"""


def q16_supplier_count_by_part(spark, sf_dir):
    """Q16 shape: distinct-supplier counts per part attribute triple, with a
    NOT-IN supplier exclusion (anti join). The excluded set is negative-
    balance suppliers (stand-in for Q16's 'Customer Complaints' comment
    scan -- the testdata has no comment columns)."""
    part, supp, li = _t(spark, sf_dir, "part", "supplier", "lineitem")
    bad = supp.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(
            F.broadcast(
                part.filter(
                    (F.col("p_brand") != "Brand#1")
                    & (~F.col("p_type").startswith("PROMO"))
                    & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
                )
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"), F.asc("p_size")
        )
        .limit(20)
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
LIMIT 20
"""


def q20_excess_shippers(spark, sf_dir):
    """Q20 shape: nested aggregate-of-aggregate + semi join. Suppliers whose
    1996 shipped quantity of a 'red%' part exceeds 1.5x the per-part average
    across suppliers (stand-in for availqty > half of shipped, which needs
    partsupp), surfaced through a left-semi join onto supplier."""
    part, supp, li = _t(spark, sf_dir, "part", "supplier", "lineitem")
    red = part.filter(F.col("p_name").like("red%")).select("p_partkey")
    sp = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    avg_per_part = sp.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        F.avg("qty").alias("avg_qty")
    )
    qualifying = (
        sp.join(F.broadcast(avg_per_part), F.col("l_partkey") == F.col("ap_partkey"))
        .filter(F.col("qty") > F.lit(1.5) * F.col("avg_qty"))
        .select("l_suppkey")
    )
    return (
        supp.join(qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


Q20_SQL = """
WITH sp AS (
  SELECT l_suppkey, l_partkey, sum(l_quantity) AS qty
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'red%'
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1997-01-01'
  GROUP BY l_suppkey, l_partkey
)
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM sp
  WHERE qty > 1.5 * (SELECT avg(qty) FROM sp sp2 WHERE sp2.l_partkey = sp.l_partkey)
)
ORDER BY s_suppkey
"""


def q21_waiting_suppliers(spark, sf_dir):
    """Q21 shape: EXISTS + NOT-EXISTS self-joins on lineitem. Late = shipped
    >90 days after the order date (no receipt/commit dates in testdata).
    Counts, per supplier, finalized orders where that supplier was late,
    another supplier participated, and no other supplier was late."""
    supp, orders, li = _t(spark, sf_dir, "supplier", "orders", "lineitem")
    lateness = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    l1 = (
        li.join(
            orders.filter(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(lateness)
        .select("l_orderkey", "l_suppkey")
        .dropDuplicates()
    )
    others = li.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    ).dropDuplicates()
    late_others = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(lateness)
        .select(
            F.col("l_orderkey").alias("o3_orderkey"), F.col("l_suppkey").alias("o3_suppkey")
        )
        .dropDuplicates()
    )
    waiting = (
        l1.join(
            others,
            (F.col("l_orderkey") == F.col("o2_orderkey"))
            & (F.col("l_suppkey") != F.col("o2_suppkey")),
            "left_semi",
        ).join(
            late_others,
            (F.col("l_orderkey") == F.col("o3_orderkey"))
            & (F.col("l_suppkey") != F.col("o3_suppkey")),
            "left_anti",
        )
    )
    return (
        waiting.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


Q21_SQL = """
WITH l1 AS (
  SELECT DISTINCT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
    AND l_shipdate > o_orderdate + INTERVAL 90 DAY
)
SELECT s_name, count(*) AS numwait
FROM l1
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3 JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 20
"""


def bloom_semijoin_prefilter(spark, sf_dir):
    """Deterministic Bloom-filter prefilter for a fact-x-fact semi-join
    (operators/bloom.py): build a 64 Ki-bit bloom (2048 words) over URGENT order keys,
    probe every lineitem through the broadcast filter, and account
    exactly for true matches, false positives, and (provably zero)
    false negatives.

    The scale story: when the build side is too big to broadcast as
    keys, its bloom is still a few KiB of words -- broadcasting THAT prunes the
    probe before the semi-join shuffle (the manual twin of AQE's runtime
    bloom filters, but SQL-replayable bit for bit)."""
    from ..operators.bloom import bloom_might_contain, build_bloom

    orders, li = _t(spark, sf_dir, "orders", "lineitem")
    keys = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    bloom = build_bloom(keys, "o_orderkey")
    probe = li.select("l_orderkey", "l_linenumber")
    passed = bloom_might_contain(probe, "l_orderkey", bloom)
    marked = passed.join(
        F.broadcast(keys.withColumn("is_match", F.lit(1))),
        passed["l_orderkey"] == keys["o_orderkey"],
        "left",
    )
    return marked.agg(
        F.count("*").alias("n_probes"),
        F.sum(F.when(F.col("bloom_pass"), 1).otherwise(0)).alias("n_bloom_pass"),
        F.sum(F.coalesce(F.col("is_match"), F.lit(0))).alias("n_true_match"),
        F.sum(
            F.when(F.col("bloom_pass") & F.col("is_match").isNull(), 1).otherwise(0)
        ).alias("n_false_pos"),
        F.sum(
            F.when(~F.col("bloom_pass") & F.col("is_match").isNotNull(), 1).otherwise(
                0
            )
        ).alias("n_false_neg"),
    )


def _bloom_pos_sql(key_expr: str) -> str:
    return (
        "list_reduce(list_prepend(0::BIGINT,"
        f" list_transform(string_split_regex(substr(md5('bf' || j::VARCHAR || '|' || {key_expr}), 1, 7), ''),"
        " c -> (strpos('0123456789abcdef', c) - 1)::BIGINT)),"
        " (a, b) -> a * 16 + b) % 65536"
    )


BLOOM_PREFILTER_SQL = f"""
WITH keys AS (
  SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
), kpos AS (
  SELECT o_orderkey, {_bloom_pos_sql("o_orderkey::VARCHAR")} AS p
  FROM keys, unnest([0, 1, 2]) AS t(j)
), bloom AS (
  SELECT p // 32 AS word, bit_or(1::BIGINT << (p % 32)::INT) AS bits
  FROM kpos GROUP BY 1
), probe AS (
  SELECT l_orderkey, l_linenumber FROM lineitem
), ppos AS (
  SELECT l_orderkey, l_linenumber,
         {_bloom_pos_sql("l_orderkey::VARCHAR")} AS p
  FROM probe, unnest([0, 1, 2]) AS t(j)
), hits AS (
  SELECT l_orderkey, l_linenumber,
         sum(CASE WHEN b.bits IS NOT NULL
                   AND (b.bits & (1::BIGINT << (p % 32)::INT)) <> 0
             THEN 1 ELSE 0 END) AS nhit,
         count(*) AS nlook
  FROM ppos LEFT JOIN bloom b ON ppos.p // 32 = b.word
  GROUP BY 1, 2
), marked AS (
  SELECT h.l_orderkey, h.l_linenumber, h.nhit = h.nlook AS bloom_pass,
         k.o_orderkey IS NOT NULL AS is_match
  FROM hits h LEFT JOIN keys k ON h.l_orderkey = k.o_orderkey
)
SELECT count(*) AS n_probes,
       sum(CASE WHEN bloom_pass THEN 1 ELSE 0 END)::BIGINT AS n_bloom_pass,
       sum(CASE WHEN is_match THEN 1 ELSE 0 END)::BIGINT AS n_true_match,
       sum(CASE WHEN bloom_pass AND NOT is_match THEN 1 ELSE 0 END)::BIGINT AS n_false_pos,
       sum(CASE WHEN is_match AND NOT bloom_pass THEN 1 ELSE 0 END)::BIGINT AS n_false_neg
FROM marked
"""


def data_validation_report(spark, sf_dir):
    """Deequ-style data-quality audit in one pass per table: primary-key
    uniqueness, null ratios, range constraints, and referential
    integrity (lineitem -> orders, orders -> customer), emitted as one
    row per rule with violation counts.

    Scale shape: each rule is a scan-side aggregate or a key-join; the
    FK checks are the only shuffles (anti-join on the key), and the
    union of single-row results is free. This is the pre-ingest gate a
    100 TB pipeline runs before publishing a snapshot."""
    orders, li, cust = _t(spark, sf_dir, "orders", "lineitem", "customer")

    def rule(name, total, violations):
        return violations.select(
            F.lit(name).alias("rule"),
            F.lit(total).alias("n_checked"),
            F.col("v").cast("long").alias("n_violations"),
        )

    n_orders = orders.count()
    n_li = li.count()
    n_cust = cust.count()
    checks = [
        rule(
            "orders_pk_unique",
            n_orders,
            orders.groupBy("o_orderkey")
            .count()
            .filter("count > 1")
            .agg(F.coalesce(F.sum(F.col("count") - 1), F.lit(0)).alias("v")),
        ),
        rule(
            "orders_totalprice_positive",
            n_orders,
            orders.agg(
                F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias("v")
            ),
        ),
        rule(
            "orders_custkey_not_null",
            n_orders,
            orders.agg(
                F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias("v")
            ),
        ),
        rule(
            "lineitem_qty_range_1_50",
            n_li,
            li.agg(
                F.sum(
                    F.when(
                        (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1
                    ).otherwise(0)
                ).alias("v")
            ),
        ),
        rule(
            "lineitem_fk_orders",
            n_li,
            li.join(orders, li["l_orderkey"] == orders["o_orderkey"], "left_anti")
            .agg(F.count("*").alias("v")),
        ),
        rule(
            "orders_fk_customer",
            n_orders,
            orders.join(cust, orders["o_custkey"] == cust["c_custkey"], "left_anti")
            .agg(F.count("*").alias("v")),
        ),
        rule(
            "customer_acctbal_not_null",
            n_cust,
            cust.agg(
                F.sum(F.when(F.col("c_acctbal").isNull(), 1).otherwise(0)).alias("v")
            ),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


VALIDATION_SQL = """
SELECT 'orders_pk_unique' AS rule, (SELECT count(*) FROM orders) AS n_checked,
       coalesce((SELECT sum(c - 1) FROM (SELECT count(*) AS c FROM orders
                 GROUP BY o_orderkey HAVING count(*) > 1)), 0)::BIGINT AS n_violations
UNION ALL
SELECT 'orders_totalprice_positive', (SELECT count(*) FROM orders),
       (SELECT count(*) FROM orders WHERE o_totalprice <= 0)::BIGINT
UNION ALL
SELECT 'orders_custkey_not_null', (SELECT count(*) FROM orders),
       (SELECT count(*) FROM orders WHERE o_custkey IS NULL)::BIGINT
UNION ALL
SELECT 'lineitem_qty_range_1_50', (SELECT count(*) FROM lineitem),
       (SELECT count(*) FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50)::BIGINT
UNION ALL
SELECT 'lineitem_fk_orders', (SELECT count(*) FROM lineitem),
       (SELECT count(*) FROM lineitem l LEFT JOIN orders o
        ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL)::BIGINT
UNION ALL
SELECT 'orders_fk_customer', (SELECT count(*) FROM orders),
       (SELECT count(*) FROM orders o LEFT JOIN customer c
        ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL)::BIGINT
UNION ALL
SELECT 'customer_acctbal_not_null', (SELECT count(*) FROM customer),
       (SELECT count(*) FROM customer WHERE c_acctbal IS NULL)::BIGINT
"""



def unpivot_lineitem_measures(spark, sf_dir):
    """UNPIVOT/melt: the four lineitem measures (quantity, extendedprice,
    discount, tax) become (measure, value) rows, aggregated per
    returnflag -- the wide-to-long reshape every BI export runs, via the
    native DataFrame ``unpivot`` (Spark's melt; SQL mirrors with
    UNPIVOT). Integer-milli sums keep the value hash exact.

    Scale shape: unpivot is a zero-shuffle generator (4 output rows per
    input row, no exchange); the only wide edge is the tiny
    (returnflag, measure) hash agg."""
    (li,) = _t(spark, sf_dir, "lineitem")
    melted = li.select(
        "l_returnflag",
        F.round(F.col("l_quantity") * 1000).cast("long").alias("quantity"),
        F.round(F.col("l_extendedprice") * 1000).cast("long").alias("extendedprice"),
        F.round(F.col("l_discount") * 1000).cast("long").alias("discount"),
        F.round(F.col("l_tax") * 1000).cast("long").alias("tax"),
    ).unpivot(
        ids=["l_returnflag"],
        values=["quantity", "extendedprice", "discount", "tax"],
        variableColumnName="measure",
        valueColumnName="value_milli",
    )
    return melted.groupBy("l_returnflag", "measure").agg(
        F.count("*").alias("n"),
        F.sum("value_milli").alias("sum_milli"),
        F.min("value_milli").alias("min_milli"),
        F.max("value_milli").alias("max_milli"),
    )


UNPIVOT_SQL = """
WITH melted AS (
  UNPIVOT (
    SELECT l_returnflag,
           round(l_quantity * 1000)::BIGINT AS quantity,
           round(l_extendedprice * 1000)::BIGINT AS extendedprice,
           round(l_discount * 1000)::BIGINT AS discount,
           round(l_tax * 1000)::BIGINT AS tax
    FROM lineitem
  ) ON quantity, extendedprice, discount, tax
  INTO NAME measure VALUE value_milli
)
SELECT l_returnflag, measure, count(*) AS n,
       sum(value_milli)::BIGINT AS sum_milli,
       min(value_milli) AS min_milli, max(value_milli) AS max_milli
FROM melted GROUP BY 1, 2
"""



def basket_brand_lift(spark, sf_dir):
    """MARKET-BASKET association mining over orders: for every pair of
    part brands co-occurring in an order, the support count and the
    LIFT (how much more often the pair co-occurs than independence
    predicts) in milli -- the classic retail affinity analysis
    (Apriori's scoring step) on the TPC-H schema. Pairs with lift >
    1000 are positively associated. Top-20 by (lift, pair) keeps the
    result bounded; a support floor of 5 orders kills noise pairs.

    Scale shape: per-order distinct brand sets are bounded (|brands| is
    a catalog constant), so the within-order pair explode is O(orders *
    brands^2 / 2) with tiny constants; everything after is one hash agg
    on the pair key plus a broadcast of the 25-row per-brand counts."""
    li, part = _t(spark, sf_dir, "lineitem", "part")
    ob = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    n_orders = ob.select("l_orderkey").distinct().count()
    brand_n = ob.groupBy("p_brand").agg(F.count("*").alias("n_brand"))
    a = ob.select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand_a"))
    b = ob.select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand_b"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").alias("n_both"))
        .filter(F.col("n_both") >= 5)
    )
    na = brand_n.select(F.col("p_brand").alias("brand_a"), F.col("n_brand").alias("n_a"))
    nb = brand_n.select(F.col("p_brand").alias("brand_b"), F.col("n_brand").alias("n_b"))
    scored = (
        pairs.join(F.broadcast(na), "brand_a")
        .join(F.broadcast(nb), "brand_b")
        .select(
            "brand_a",
            "brand_b",
            "n_both",
            "n_a",
            "n_b",
            F.expr(f"(1000 * n_both * {n_orders}) DIV (n_a * n_b)").alias(
                "lift_milli"
            ),
        )
    )
    w = Window.orderBy(F.desc("lift_milli"), F.asc("brand_a"), F.asc("brand_b"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 20)
        .select(
            F.col("rank").cast("bigint").alias("rank"),
            "brand_a", "brand_b", "n_both", "n_a", "n_b", "lift_milli",
        )
    )


BASKET_LIFT_SQL = """
WITH ob AS (
  SELECT DISTINCT l_orderkey, p_brand
  FROM lineitem JOIN part ON l_partkey = p_partkey
), n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM ob),
brand_n AS (SELECT p_brand, count(*) AS n_brand FROM ob GROUP BY 1),
pairs AS (
  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, count(*) AS n_both
  FROM ob a JOIN ob b ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
  GROUP BY 1, 2
  HAVING count(*) >= 5
)
SELECT rank, brand_a, brand_b, n_both, n_a, n_b, lift_milli
FROM (
  SELECT p.brand_a, p.brand_b, p.n_both,
         na.n_brand AS n_a, nb.n_brand AS n_b,
         ((1000 * p.n_both * n.n_orders) // (na.n_brand * nb.n_brand))::BIGINT AS lift_milli,
         row_number() OVER (ORDER BY
           (1000 * p.n_both * n.n_orders) // (na.n_brand * nb.n_brand) DESC,
           p.brand_a ASC, p.brand_b ASC) AS rank
  FROM pairs p
  JOIN brand_n na ON p.brand_a = na.p_brand
  JOIN brand_n nb ON p.brand_b = nb.p_brand
  CROSS JOIN n
) WHERE rank <= 20
"""



def customer_rfm_segments(spark, sf_dir):
    """RFM customer segmentation (recency / frequency / monetary), the
    classic CRM scoring: per customer, days since last order, order
    count, and total spend in milli; each dimension scored 1-5 by
    exact-rank quintile (ntile over a total order with customer-key
    tiebreak -- deterministic, no percentile interpolation), combined
    into the 3-digit RFM segment code. Bounded output: one row per
    (r_score, f_score, m_score) cell with its population and averages.

    Scale shape: one per-customer aggregation, then three DISTRIBUTED
    exact ranks (operators/ranking.attach_global_order: range exchange +
    per-partition window + broadcast per-partition offsets -- no
    single-partition window anywhere), ntile(5) recovered as pure
    arithmetic on the global rank, one 125-cell rollup. Identical
    scores to the window ntile (same total order, same tie-splitting),
    but every stage is parallel at any scale."""
    from ..operators.ranking import attach_global_order, ntile_from_rank

    (orders,) = _t(spark, sf_dir, "orders")
    anchor_ms = orders.agg(F.max("o_orderdate")).collect()[0][0]
    per = orders.groupBy("o_custkey").agg(
        F.datediff(F.lit(anchor_ms), F.max("o_orderdate")).alias("recency_days"),
        F.count("*").alias("frequency"),
        F.round(F.sum("o_totalprice") * 1000).cast("bigint").alias("monetary_milli"),
    )
    ranked, stats = attach_global_order(
        per, [F.asc("recency_days"), F.asc("o_custkey")], rank_col="rk_r"
    )
    ranked, _ = attach_global_order(
        ranked, [F.desc("frequency"), F.asc("o_custkey")], rank_col="rk_f"
    )
    ranked, _ = attach_global_order(
        ranked, [F.desc("monetary_milli"), F.asc("o_custkey")], rank_col="rk_m"
    )
    n = stats["n_rows"]
    scored = (
        ranked.withColumn("r_score", F.lit(6) - ntile_from_rank("rk_r", n, 5))
        .withColumn("f_score", F.lit(6) - ntile_from_rank("rk_f", n, 5))
        .withColumn("m_score", F.lit(6) - ntile_from_rank("rk_m", n, 5))
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("frequency").alias("total_orders"),
            F.sum("monetary_milli").alias("total_milli"),
        )
        .select(
            F.col("r_score").cast("bigint").alias("r_score"),
            F.col("f_score").cast("bigint").alias("f_score"),
            F.col("m_score").cast("bigint").alias("m_score"),
            "n_customers",
            "total_orders",
            "total_milli",
        )
    )


RFM_SQL = """
WITH anchor AS (SELECT max(o_orderdate) AS mx FROM orders),
per AS (
  SELECT o_custkey,
         date_diff('day', max(o_orderdate), (SELECT mx FROM anchor)) AS recency_days,
         count(*) AS frequency,
         round(sum(o_totalprice) * 1000)::BIGINT AS monetary_milli
  FROM orders GROUP BY 1
), scored AS (
  SELECT *,
         6 - ntile(5) OVER (ORDER BY recency_days ASC, o_custkey ASC) AS r_score,
         6 - ntile(5) OVER (ORDER BY frequency DESC, o_custkey ASC) AS f_score,
         6 - ntile(5) OVER (ORDER BY monetary_milli DESC, o_custkey ASC) AS m_score
  FROM per
)
SELECT r_score::BIGINT AS r_score, f_score::BIGINT AS f_score,
       m_score::BIGINT AS m_score,
       count(*) AS n_customers, sum(frequency)::BIGINT AS total_orders,
       sum(monetary_milli)::BIGINT AS total_milli
FROM scored GROUP BY 1, 2, 3
"""



def customer_pareto_curve(spark, sf_dir):
    """PARETO/concentration analysis: rank customers by revenue and
    report, at each spend DECILE of the customer base, the cumulative
    share of total revenue (milli) -- the "top 20% drive 80%" curve a
    revenue team reads, and a Gini-style concentration measure derived
    from the same running sum. Exact integers: revenue in milli,
    cumulative sums over a deterministic (revenue desc, custkey)
    order, decile boundaries by rank arithmetic.

    Scale shape: one per-customer agg, then ONE distributed ranking
    pass (operators/ranking.attach_global_order) that yields the exact
    global rank AND the exact global running sum together -- range
    exchange + partitioned window + broadcast offsets, no
    single-partition window; N and the revenue grand total fall out of
    the same tiny per-partition aggregate (no extra count/collect
    jobs). The decile rollup is 10 rows."""
    from ..operators.ranking import attach_global_order

    (orders,) = _t(spark, sf_dir, "orders")
    per = orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice") * 1000).cast("bigint").alias("rev_milli")
    )
    cum, stats = attach_global_order(
        per,
        [F.desc("rev_milli"), F.asc("o_custkey")],
        rank_col="rk",
        cum_cols={"cum_milli": "rev_milli"},
    )
    n_cust = stats["n_rows"]
    total = stats["totals"]["cum_milli"]
    decile = F.expr(f"((rk - 1) * 10) DIV {n_cust} + 1")
    return (
        cum.withColumn("decile", decile)
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_customers"),
            F.max("cum_milli").alias("cum_rev_milli"),
        )
        .select(
            F.col("decile").cast("bigint").alias("decile"),
            "n_customers",
            F.expr(f"(1000 * cum_rev_milli) DIV {total}").alias(
                "cum_share_milli"
            ),
        )
    )


PARETO_SQL = """
WITH per AS (
  SELECT o_custkey, round(sum(o_totalprice) * 1000)::BIGINT AS rev_milli
  FROM orders GROUP BY 1
), n AS (SELECT count(*) AS n_cust, sum(rev_milli)::BIGINT AS total FROM per),
ranked AS (
  SELECT o_custkey, rev_milli,
         row_number() OVER (ORDER BY rev_milli DESC, o_custkey ASC) AS rk
  FROM per
), cum AS (
  SELECT *, sum(rev_milli) OVER (ORDER BY rk
             ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_milli
  FROM ranked
)
SELECT (((rk - 1) * 10) // n.n_cust + 1)::BIGINT AS decile,
       count(*) AS n_customers,
       ((1000 * max(cum_milli)) // n.total)::BIGINT AS cum_share_milli
FROM cum CROSS JOIN n
GROUP BY 1, n.n_cust, n.total
"""



def orders_open_backlog(spark, sf_dir):
    """CUMULATIVE-FLOW / open-order backlog curve: how many orders are
    placed-but-not-fully-shipped on each day -- the operations chart
    that shows backlog building or draining. Classic interval-count
    done the scalable way: each order's open interval
    [o_orderdate, max(l_shipdate)] becomes two deltas (+1 at open, -1
    the day after close), one bounded per-day rollup, and an exact
    distributed running sum (operators/ranking.attach_global_order --
    no single-partition window). Output sampled to every 8th epoch day
    for a bounded curve.

    Scale shape: lineitem aggregates once on its own key, joins orders
    key-to-key (fact-to-fact, the one shuffle pair), deltas are 2 rows
    per order, and the day rollup is bounded by the calendar span --
    the running sum runs over ~2.4k day rows however big the facts
    get."""
    from ..operators.ranking import attach_global_order

    orders, lineitem = _t(spark, sf_dir, "orders", "lineitem")
    span = orders.select(
        "o_orderkey", F.to_date("o_orderdate").alias("start_day")
    ).join(
        lineitem.groupBy("l_orderkey").agg(
            F.max(F.to_date("l_shipdate")).alias("end_day")
        ),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    deltas = span.select(
        F.explode(
            F.array(
                F.struct(F.col("start_day").alias("day"), F.lit(1).alias("d")),
                F.struct(
                    F.date_add("end_day", 1).alias("day"), F.lit(-1).alias("d")
                ),
            )
        ).alias("e")
    ).select("e.day", "e.d")
    per_day = deltas.groupBy("day").agg(
        F.sum(F.when(F.col("d") == 1, 1).otherwise(0)).alias("n_opened"),
        F.sum(F.when(F.col("d") == -1, 1).otherwise(0)).alias("n_closed"),
        F.sum("d").alias("delta"),
    )
    curve, _ = attach_global_order(
        per_day, [F.asc("day")], rank_col=None, cum_cols={"open_backlog": "delta"}
    )
    epoch_day = F.datediff(F.col("day"), F.lit("1970-01-01"))
    return curve.filter(epoch_day % 8 == 0).select(
        epoch_day.cast("bigint").alias("epoch_day"),
        F.col("n_opened").cast("bigint").alias("n_opened"),
        F.col("n_closed").cast("bigint").alias("n_closed"),
        "open_backlog",
    )


OPEN_BACKLOG_SQL = """
WITH span AS (
  SELECT o.o_orderkey, o.o_orderdate::DATE AS start_day,
         max(l.l_shipdate::DATE) AS end_day
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  GROUP BY 1, 2
), deltas AS (
  SELECT start_day AS day, 1 AS d FROM span
  UNION ALL
  SELECT end_day + 1 AS day, -1 AS d FROM span
), per_day AS (
  SELECT day, sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS n_opened,
         sum(CASE WHEN d = -1 THEN 1 ELSE 0 END) AS n_closed,
         sum(d) AS delta
  FROM deltas GROUP BY 1
)
SELECT date_diff('day', DATE '1970-01-01', day)::BIGINT AS epoch_day,
       n_opened::BIGINT AS n_opened, n_closed::BIGINT AS n_closed,
       (sum(delta) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING))::BIGINT
         AS open_backlog
FROM per_day
QUALIFY date_diff('day', DATE '1970-01-01', day) % 8 = 0
"""


def nation_market_hhi(spark, sf_dir):
    """HERFINDAHL-HIRSCHMAN market-concentration index per nation: the
    sum of squared supplier revenue shares (micro — shares in milli,
    squared and summed) over lineitem revenue attributed to each
    supplier -- the antitrust-style concentration number (10000-share
    scale: > 2500 = highly concentrated) a procurement team reads per
    market. Exact integers end to end: revenue milli, shares milli via
    BIGINT division, HHI as the sum of their squares.

    Scale shape: one (nation, supplier) revenue agg, a broadcast of the
    25-row nation totals, a 25-row rollup."""
    li, supp = _t(spark, sf_dir, "lineitem", "supplier")
    rev = (
        li.join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .groupBy("s_nationkey", "s_suppkey")
        # per-supplier e4 BIGINT sum; milli-dollars = half-up(A4 / 10)
        .agg(F.sum(_rev_e4()).alias("__a4"))
        .withColumn("rev_milli", F.expr("(__a4 + 5) div 10"))
        .drop("__a4")
    )
    totals = rev.groupBy("s_nationkey").agg(
        F.sum("rev_milli").alias("total_milli"),
        F.count("*").alias("n_suppliers"),
    )
    shares = rev.join(F.broadcast(totals), "s_nationkey").select(
        "s_nationkey",
        "n_suppliers",
        F.expr("(10000 * rev_milli) DIV total_milli").alias("share_bp"),
    )
    return shares.groupBy("s_nationkey", "n_suppliers").agg(
        F.sum(F.col("share_bp") * F.col("share_bp")).alias("hhi"),
        F.max("share_bp").alias("top_share_bp"),
    ).select(
        F.col("s_nationkey").cast("bigint").alias("nationkey"),
        F.col("n_suppliers").cast("bigint").alias("n_suppliers"),
        "hhi",
        "top_share_bp",
    )


HHI_SQL = f"""
WITH rev AS (
  SELECT s_nationkey, s_suppkey,
         ((sum({_REV_E4_SQL}) + 5) // 10)::BIGINT AS rev_milli
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  GROUP BY 1, 2
), totals AS (
  SELECT s_nationkey, sum(rev_milli)::BIGINT AS total_milli,
         count(*) AS n_suppliers
  FROM rev GROUP BY 1
), shares AS (
  SELECT r.s_nationkey, t.n_suppliers,
         (10000 * r.rev_milli) // t.total_milli AS share_bp
  FROM rev r JOIN totals t USING (s_nationkey)
)
SELECT s_nationkey::BIGINT AS nationkey, n_suppliers::BIGINT AS n_suppliers,
       sum(share_bp * share_bp)::BIGINT AS hhi,
       max(share_bp)::BIGINT AS top_share_bp
FROM shares GROUP BY 1, 2
"""



def orders_seasonality_index(spark, sf_dir):
    """SEASONALITY INDEX per calendar month: monthly order count and
    revenue against the all-months average (milli ratio; 1000 = an
    average month) -- the demand-planning baseline every retail
    forecast starts from, and the descriptive complement of the
    Holt-Winters seasonal model on the events side. Exact integers via
    milli revenue and cross-joined scalar averages (count*12 DIV total
    keeps the ratio integer).

    Scale shape: one month rollup + a broadcast scalar; 12 rows out."""
    (orders,) = _t(spark, sf_dir, "orders")
    per = orders.groupBy(F.month("o_orderdate").alias("month")).agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice") * 1000).cast("bigint").alias("rev_milli"),
    )
    tot = per.agg(
        F.sum("n_orders").alias("t_orders"), F.sum("rev_milli").alias("t_rev")
    )
    return per.crossJoin(F.broadcast(tot)).select(
        F.col("month").cast("bigint").alias("month"),
        "n_orders",
        "rev_milli",
        F.expr("(1000 * n_orders * 12) DIV t_orders").alias("order_index_milli"),
        F.expr("(1000 * rev_milli * 12) DIV t_rev").alias("revenue_index_milli"),
    )


SEASONALITY_SQL = """
WITH per AS (
  SELECT month(o_orderdate) AS month, count(*) AS n_orders,
         round(sum(o_totalprice) * 1000)::BIGINT AS rev_milli
  FROM orders GROUP BY 1
), tot AS (
  SELECT sum(n_orders)::BIGINT AS t_orders, sum(rev_milli)::BIGINT AS t_rev FROM per
)
SELECT month::BIGINT AS month, n_orders, rev_milli,
       ((1000 * n_orders * 12) // t_orders)::BIGINT AS order_index_milli,
       ((1000 * rev_milli * 12) // t_rev)::BIGINT AS revenue_index_milli
FROM per CROSS JOIN tot
"""



def orders_shipping_delay_sla(spark, sf_dir):
    """SHIPPING-DELAY SLA per order priority: exact lower-median and
    p90 days from order date to FIRST line shipment, plus the share
    meeting a 30-day SLA (milli) -- the fulfillment dashboard that
    makes 1-URGENT measurably faster (or not) than 5-LOW. Exact
    integer order statistics, no interpolation.

    Scale shape: one order-grain min-ship aggregation (co-keyed join
    orders x lineitem), one priority rollup with bounded state."""
    (orders,), (li,) = [_t(spark, sf_dir, "orders"), _t(spark, sf_dir, "lineitem")]
    first_ship = li.groupBy("l_orderkey").agg(
        F.min("l_shipdate").alias("first_ship")
    )
    delays = (
        orders.join(first_ship, orders["o_orderkey"] == first_ship["l_orderkey"])
        .select(
            "o_orderpriority",
            F.datediff("first_ship", "o_orderdate").alias("delay_days"),
        )
        .filter(F.col("delay_days") >= 0)
    )
    per = delays.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sort_array(F.collect_list("delay_days")).alias("ds"),
        F.sum(F.when(F.col("delay_days") <= 30, 1).otherwise(0)).alias("n_sla"),
    )
    med = F.element_at(F.col("ds"), ((F.col("n_orders") - 1) / 2 + 1).cast("int"))
    p90 = F.element_at(
        F.col("ds"), (F.floor((F.col("n_orders") - 1) * 9 / 10) + 1).cast("int")
    )
    return per.select(
        "o_orderpriority",
        "n_orders",
        med.cast("bigint").alias("median_days"),
        p90.cast("bigint").alias("p90_days"),
        F.expr("(1000 * n_sla) DIV n_orders").alias("sla_30d_milli"),
    )


SHIPPING_SLA_SQL = """
WITH first_ship AS (
  SELECT l_orderkey, min(l_shipdate) AS first_ship FROM lineitem GROUP BY 1
), delays AS (
  SELECT o_orderpriority,
         date_diff('day', o_orderdate, first_ship) AS delay_days
  FROM orders JOIN first_ship ON o_orderkey = l_orderkey
  WHERE date_diff('day', o_orderdate, first_ship) >= 0
), per AS (
  SELECT o_orderpriority, count(*) AS n_orders,
         list_sort(list(delay_days)) AS ds,
         sum(CASE WHEN delay_days <= 30 THEN 1 ELSE 0 END)::BIGINT AS n_sla
  FROM delays GROUP BY 1
)
SELECT o_orderpriority, n_orders,
       ds[((n_orders - 1) // 2 + 1)::INT]::BIGINT AS median_days,
       ds[(((n_orders - 1) * 9 // 10) + 1)::INT]::BIGINT AS p90_days,
       ((1000 * n_sla) // n_orders)::BIGINT AS sla_30d_milli
FROM per
"""


QUERIES = {
    "orders_shipping_delay_sla": orders_shipping_delay_sla,
    "orders_seasonality_index": orders_seasonality_index,
    "nation_market_hhi": nation_market_hhi,
    "orders_open_backlog": orders_open_backlog,
    "customer_pareto_curve": customer_pareto_curve,
    "customer_rfm_segments": customer_rfm_segments,
    "basket_brand_lift": basket_brand_lift,
    "unpivot_lineitem_measures": unpivot_lineitem_measures,
    "bloom_semijoin_prefilter": bloom_semijoin_prefilter,
    "data_validation_report": data_validation_report,
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "q10_returned_items": q10_returned_items,
    "semi_join_high_quantity": semi_join_high_quantity,
    "anti_join_customers_no_orders": anti_join_customers_no_orders,
    "rollup_order_counts": rollup_order_counts,
    "cube_lineitem_flags": cube_lineitem_flags,
    "window_top3_orders_per_segment": window_top3_orders_per_segment,
    "window_running_revenue": window_running_revenue,
    "top_parts_by_retailprice": top_parts_by_retailprice,
    "setop_nation_coverage": setop_nation_coverage,
    "scalar_functions_showcase": scalar_functions_showcase,
    "date_functions_showcase": date_functions_showcase,
    "agg_stats_by_status": agg_stats_by_status,
    "having_frequent_customers": having_frequent_customers,
    "pivot_status_by_priority": pivot_status_by_priority,
    "q4_priority_with_returns": q4_priority_with_returns,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q14_promo_revenue": q14_promo_revenue,
    "q18_large_volume_orders": q18_large_volume_orders,
    "q19_disjunctive_join": q19_disjunctive_join,
    "groupingsets_order_revenue": groupingsets_order_revenue,
    "correlated_above_brand_avg": correlated_above_brand_avg,
    "array_functions_showcase": array_functions_showcase,
    "json_functions_showcase": json_functions_showcase,
    "variant_functions_showcase": variant_functions_showcase,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q13_order_count_distribution": q13_order_count_distribution,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q22_dormant_rich_customers": q22_dormant_rich_customers,
    "agg_percentiles_by_status": agg_percentiles_by_status,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q9_product_type_profit": q9_product_type_profit,
    "q11_important_part_value": q11_important_part_value,
    "q12_late_shipment_priority": q12_late_shipment_priority,
    "q16_supplier_count_by_part": q16_supplier_count_by_part,
    "q20_excess_shippers": q20_excess_shippers,
    "q21_waiting_suppliers": q21_waiting_suppliers,
    "window_lead_lag_ntile": window_lead_lag_ntile,
}

ORACLES = {
    "orders_shipping_delay_sla": SHIPPING_SLA_SQL,
    "orders_seasonality_index": SEASONALITY_SQL,
    "nation_market_hhi": HHI_SQL,
    "orders_open_backlog": OPEN_BACKLOG_SQL,
    "customer_pareto_curve": PARETO_SQL,
    "customer_rfm_segments": RFM_SQL,
    "basket_brand_lift": BASKET_LIFT_SQL,
    "unpivot_lineitem_measures": UNPIVOT_SQL,
    "bloom_semijoin_prefilter": BLOOM_PREFILTER_SQL,
    "data_validation_report": VALIDATION_SQL,
    "q1_pricing_summary": Q1_SQL,
    "q3_shipping_priority": Q3_SQL,
    "q5_local_supplier_volume": Q5_SQL,
    "q10_returned_items": Q10_SQL,
    "semi_join_high_quantity": SEMI_SQL,
    "anti_join_customers_no_orders": ANTI_SQL,
    "rollup_order_counts": ROLLUP_SQL,
    "cube_lineitem_flags": CUBE_SQL,
    "window_top3_orders_per_segment": WINDOW_TOP3_SQL,
    "window_running_revenue": WINDOW_RUNNING_SQL,
    "top_parts_by_retailprice": TOPK_SQL,
    "setop_nation_coverage": SETOP_SQL,
    "scalar_functions_showcase": SCALAR_SQL,
    "date_functions_showcase": DATEFN_SQL,
    "agg_stats_by_status": AGG_STATS_SQL,
    "having_frequent_customers": HAVING_SQL,
    "pivot_status_by_priority": PIVOT_SQL,
    "q4_priority_with_returns": Q4_SQL,
    "q6_forecast_revenue": Q6_SQL,
    "q14_promo_revenue": Q14_SQL,
    "q18_large_volume_orders": Q18_SQL,
    "q19_disjunctive_join": Q19_SQL,
    "groupingsets_order_revenue": GROUPINGSETS_SQL,
    "correlated_above_brand_avg": CORRELATED_SQL,
    "array_functions_showcase": ARRAYFN_SQL,
    "json_functions_showcase": JSONFN_SQL,
    "variant_functions_showcase": VARIANTFN_SQL,
    "q7_volume_shipping": Q7_SQL,
    "q8_market_share": Q8_SQL,
    "q13_order_count_distribution": Q13_SQL,
    "q15_top_supplier": Q15_SQL,
    "q17_small_quantity_revenue": Q17_SQL,
    "q22_dormant_rich_customers": Q22_SQL,
    "agg_percentiles_by_status": PERCENTILES_SQL,
    "q2_min_cost_supplier": Q2_SQL,
    "q9_product_type_profit": Q9_SQL,
    "q11_important_part_value": Q11_SQL,
    "q12_late_shipment_priority": Q12_SQL,
    "q16_supplier_count_by_part": Q16_SQL,
    "q20_excess_shippers": Q20_SQL,
    "q21_waiting_suppliers": Q21_SQL,
    "window_lead_lag_ntile": WINDOW_LEADLAG_SQL,
}
