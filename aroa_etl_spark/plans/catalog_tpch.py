"""TPC-H query-shape coverage, part 2 (round 5): the remaining classic
OLAP shapes adapted to the driver's slimmed synthetic schema.

Rounds 1-4 attested q1/q3/q6/q13/q17/q18.  This module adds the rest of
the TPC-H suite's DISTINCT PLAN SHAPES — exists/not-exists as semi/anti
joins, multi-way snowflake joins, market-share conditional aggregation,
scalar-subquery thresholds, OR-of-ANDs pushdown, top-1-with-ties — each
adapted where the synthetic tables lack a TPC-H column (no partsupp, no
l_commitdate/l_receiptdate/l_shipmode, no c_phone/p_container; every
adaptation is documented on the entry).  The point is breadth of plan
shapes with exact oracles, not benchmark-kit fidelity.

Determinism follows the house rules (plans/catalog.py module
docstring): money in integer cents / basis points summed in
DECIMAL(38), BIGINT/DOUBLE at the output boundary, scalar thresholds
compared in the integer domain (never via a divided double), explicit
tiebreaks on every top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from aroa_etl_spark.plans.catalog import query
from aroa_etl_spark.session import load_tables


def _cents(c: str) -> F.Column:
    return F.round(F.col(c) * 100).cast("decimal(38,0)")


def _bp_rem(c: str = "l_discount") -> F.Column:
    """(10000 - discount basis points) — the exact (1 - d) factor."""
    return F.lit(10000) - F.round(F.col(c) * 10000).cast("decimal(38,0)")


def _qty() -> F.Column:
    return F.round("l_quantity").cast("decimal(38,0)")


# disc revenue in cents*bp units; divide by 1e6 -> dollars at boundary
_REV_SQL = (
    "CAST(round(l_extendedprice * 100) AS HUGEINT)"
    " * (10000 - CAST(round(l_discount * 10000) AS HUGEINT))"
)


@query(
    "q4_late_order_priority",
    oracle=f"""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    """,
)
def q4_late_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape — EXISTS decorrelated to a LEFT SEMI join: orders
    in a window that have at least one line shipped >30 days after the
    order date (the synthetic schema has no l_commitdate/l_receiptdate,
    so ship-lag replaces the commit-vs-receipt predicate; reference
    shape is Q4's exists-per-order), counted by priority.  The semi
    join keeps orders single-copy regardless of how many lines qualify
    — the dedup-free exists plan you want at fact scale."""
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = t["lineitem"].select("l_orderkey", "l_shipdate")
    qualified = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return qualified.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("order_count")
    )


@query(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name,
           CAST(SUM({_REV_SQL}) AS DOUBLE) / 1000000.0 AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
                   AND s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 — the snowflake join with the co-location predicate:
    revenue per ASIA nation for order lines whose CUSTOMER and SUPPLIER
    share the nation.  Region/nation/supplier/customer broadcast; the
    only fact-side shuffles are orders⋈customer and lineitem⋈orders on
    their keys; c_nationkey = s_nationkey rides the nation join, never
    a separate shuffle."""
    t = load_tables(
        spark, sf_dir,
        ("customer", "orders", "lineitem", "supplier", "nation", "region"),
    )
    n_asia = (
        t["nation"]
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    c = t["customer"].select("c_custkey", "c_nationkey")
    s = t["supplier"].select("s_suppkey", "s_nationkey")
    li = t["lineitem"].select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    rev = (_cents("l_extendedprice") * _bp_rem()).alias("__rev")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n_asia), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg((F.sum(rev).cast("double") / F.lit(1_000_000.0)).alias("revenue"))
    )


@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM({_REV_SQL}) AS DOUBLE) / 1000000.0 AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
    JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
    WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
        OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 — bidirectional nation-pair trade volume by ship year
    (France/Germany -> NATION_1/NATION_2 in the synthetic naming).  The
    nation-pair disjunction evaluates on broadcast dims after both fact
    joins; years derive from l_shipdate (BIGINT both engines)."""
    t = load_tables(
        spark, sf_dir, ("lineitem", "orders", "customer", "supplier", "nation")
    )
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    ns = t["nation"].select(
        F.col("n_nationkey").alias("__snk"), F.col("n_name").alias("supp_nation")
    )
    nc = t["nation"].select(
        F.col("n_nationkey").alias("__cnk"), F.col("n_name").alias("cust_nation")
    )
    rev = (_cents("l_extendedprice") * _bp_rem()).alias("__rev")
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(t["orders"].select("o_orderkey", "o_custkey"),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"].select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["supplier"].select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("__snk"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("__cnk"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg((F.sum(rev).cast("double") / F.lit(1_000_000.0)).alias("revenue"))
    )


@query(
    "q8_market_share",
    oracle=f"""
    WITH vol AS (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             SUM({_REV_SQL}) AS total,
             SUM(CASE WHEN ns.n_name = 'NATION_3' THEN {_REV_SQL} ELSE 0 END) AS share
      FROM lineitem l
      JOIN part p     ON l.l_partkey = p.p_partkey
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
      JOIN region r   ON nc.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
      WHERE r.r_name = 'AMERICA' AND p.p_type = 'PROMO'
      GROUP BY 1)
    SELECT o_year,
           CAST(share AS DOUBLE) / CAST(total AS DOUBLE) AS mkt_share
    FROM vol
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 — national market share: NATION_3's fraction of PROMO
    volume sold into AMERICA customers, by order year.  Both the
    numerator (conditional sum) and denominator accumulate as exact
    integer units in ONE aggregation; the only float op is the final
    share division of two exact values — identical IEEE in any
    engine."""
    t = load_tables(
        spark, sf_dir,
        ("lineitem", "part", "orders", "customer", "supplier", "nation", "region"),
    )
    nc = (
        t["nation"]
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "AMERICA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("__cnk"))
    )
    ns = t["nation"].select(
        F.col("n_nationkey").alias("__snk"), F.col("n_name").alias("__sname")
    )
    p = t["part"].filter(F.col("p_type") == "PROMO").select("p_partkey")
    rev = _cents("l_extendedprice") * _bp_rem()
    joined = (
        t["lineitem"]
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(t["orders"].select("o_orderkey", "o_custkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"].select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("__cnk"))
        .join(F.broadcast(t["supplier"].select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("__snk"))
    )
    vol = joined.groupBy(
        F.year("o_orderdate").cast("bigint").alias("o_year")
    ).agg(
        F.sum(rev).alias("__total"),
        F.sum(F.when(F.col("__sname") == "NATION_3", rev).otherwise(
            F.lit(0).cast("decimal(38,0)"))).alias("__share"),
    )
    return vol.select(
        "o_year",
        (F.col("__share").cast("double") / F.col("__total").cast("double")).alias(
            "mkt_share"
        ),
    )


@query(
    "q9_product_profit",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM({_REV_SQL}) AS DOUBLE) / 1000000.0 AS profit
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape — product-line profit by supplier nation and
    year.  The synthetic schema has no partsupp/ps_supplycost, so
    profit is the discounted revenue alone (the shape under audit is
    the name-LIKE part filter driving a broadcast into the fact, then
    nation/year rollup — Q9's plan minus one broadcast)."""
    t = load_tables(
        spark, sf_dir, ("lineitem", "part", "supplier", "nation", "orders")
    )
    p = t["part"].filter(F.col("p_name").like("%widget%")).select("p_partkey")
    rev = (_cents("l_extendedprice") * _bp_rem()).alias("__rev")
    return (
        t["lineitem"]
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(t["supplier"].select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"].select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(t["orders"].select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg((F.sum(rev).cast("double") / F.lit(1_000_000.0)).alias("profit"))
    )


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM({_REV_SQL}) AS DOUBLE) / 1000000.0 AS revenue,
           CAST(round(c.c_acctbal * 100) AS BIGINT) AS acctbal_cents,
           n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01'
      AND l.l_returnflag = 'R'
    GROUP BY 1, 2, 4, 5
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 — returned-item revenue ranking: customers who
    returned the most (flag 'R') in a half-year window, top 20.
    Account balance surfaces as exact cents (BIGINT) instead of a raw
    double; revenue ties break on the customer key."""
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem", "nation"))
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = t["lineitem"].filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    rev = (_cents("l_extendedprice") * _bp_rem()).alias("__rev")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"].select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            "c_custkey", "c_name",
            F.round(F.col("c_acctbal") * 100).cast("bigint").alias("acctbal_cents"),
            "n_name",
        )
        .agg((F.sum(rev).cast("double") / F.lit(1_000_000.0)).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "acctbal_cents", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q11_important_parts",
    oracle="""
    WITH pv AS (
      SELECT l.l_partkey,
             SUM(CAST(round(l.l_extendedprice * 100) AS HUGEINT)
                 * CAST(round(l.l_quantity) AS HUGEINT)) AS value_units
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_5'
      GROUP BY 1)
    SELECT l_partkey,
           CAST(value_units AS DOUBLE) / 100.0 AS part_value
    FROM pv
    WHERE value_units * (SELECT COUNT(*) FROM pv)
            > 2 * (SELECT SUM(value_units) FROM pv)
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape — the scalar-subquery threshold: parts whose
    NATION_5-supplied inventory value exceeds TWICE the average part
    value.  (Real Q11 uses fraction 0.0001/SF — deliberately
    scale-dependent; the 2x-average form keeps the same two-level
    aggregate + global-scalar-compare plan while selecting a
    non-degenerate set at every SF.)  No partsupp in the synthetic
    schema, so value = Σ price·quantity over lineitem.  The threshold
    compares in EXACT integer units (value·count > 2·total) — never via
    a divided double — and the 1-row (total, count) aggregate
    broadcasts to the per-part frame."""
    t = load_tables(spark, sf_dir, ("lineitem", "supplier", "nation"))
    s5 = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"].filter(F.col("n_name") == "NATION_5")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    units = (_cents("l_extendedprice") * _qty()).alias("__u")
    pv = (
        t["lineitem"]
        .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
        .join(F.broadcast(s5), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(units).alias("__value"))
    )
    total = pv.agg(
        F.sum("__value").alias("__total"), F.count(F.lit(1)).alias("__nparts")
    )
    return (
        pv.join(F.broadcast(total))
        .filter(F.col("__value") * F.col("__nparts") > F.col("__total") * 2)
        .select(
            "l_partkey",
            (F.col("__value").cast("double") / F.lit(100.0)).alias("part_value"),
        )
    )


@query(
    "q12_ship_lag_priority",
    oracle="""
    SELECT CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) > 60
                THEN 'LATE' ELSE 'ON-TIME' END AS lag_bucket,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
)
def q12_ship_lag_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape — priority split by shipping bucket: the
    synthetic schema has no l_shipmode/l_commitdate, so the bucket is
    the ship LAG (>60 days after order = LATE), preserving Q12's plan
    (fact⋈fact on the order key, conditional counts by bucket)."""
    t = load_tables(spark, sf_dir, ("lineitem", "orders"))
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_shipdate")
    o = t["orders"].select("o_orderkey", "o_orderdate", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.when(
                F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 60,
                F.lit("LATE"),
            ).otherwise(F.lit("ON-TIME")).alias("lag_bucket"),
            high.alias("__high"),
        )
        .groupBy("lag_bucket")
        .agg(
            F.sum(F.when(F.col("__high"), 1).otherwise(0)).cast("bigint").alias(
                "high_line_count"
            ),
            F.sum(F.when(~F.col("__high"), 1).otherwise(0)).cast("bigint").alias(
                "low_line_count"
            ),
        )
    )


@query(
    "q14_promo_revenue_share",
    oracle=f"""
    SELECT CAST(100.0 AS DOUBLE)
           * CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN {_REV_SQL} ELSE 0 END)
                  AS DOUBLE)
           / CAST(SUM({_REV_SQL}) AS DOUBLE) AS promo_pct,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
      AND l.l_shipdate <  TIMESTAMP '1996-04-01'
    """,
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 — promo revenue percentage for one ship month: the
    conditional-over-total ratio computed from two exact integer sums
    in a single aggregation (broadcast part dim; one fact scan, no
    second pass), divided once at the DOUBLE boundary."""
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    rev = _cents("l_extendedprice") * _bp_rem()
    agg = (
        li.join(F.broadcast(t["part"].select("p_partkey", "p_type")),
                F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(
                F.lit(0).cast("decimal(38,0)"))).alias("__promo"),
            F.sum(rev).alias("__total"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        )
    )
    return agg.select(
        (
            F.lit(100.0)
            * F.col("__promo").cast("double")
            / F.col("__total").cast("double")
        ).alias("promo_pct"),
        "n_rows",
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             SUM({_REV_SQL}) AS units
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY 1)
    SELECT s.s_suppkey, s.s_name,
           CAST(units AS DOUBLE) / 1000000.0 AS total_revenue
    FROM rev JOIN supplier s ON s.s_suppkey = rev.supplier_no
    WHERE units = (SELECT MAX(units) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 — top supplier WITH TIES: quarterly revenue per
    supplier, keep every supplier matching the maximum.  The max-equals
    filter runs on EXACT integer units (a double revenue tie could
    split under rounding), via a global max window over the 100-row
    aggregated frame — single-partition, but on supplier-count scale,
    never the fact table."""
    t = load_tables(spark, sf_dir, ("lineitem", "supplier"))
    rev = (_cents("l_extendedprice") * _bp_rem()).alias("__rev")
    per_supp = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(rev).alias("__units"))
    )
    with_max = per_supp.withColumn(
        "__mx", F.max("__units").over(W.partitionBy())
    ).filter(F.col("__units") == F.col("__mx"))
    return (
        with_max.join(
            F.broadcast(t["supplier"].select("s_suppkey", "s_name")),
            F.col("supplier_no") == F.col("s_suppkey"),
        )
        .select(
            "s_suppkey", "s_name",
            (F.col("__units").cast("double") / F.lit(1_000_000.0)).alias(
                "total_revenue"
            ),
        )
    )


@query(
    "q16_part_supplier_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape — supplier breadth per part class: distinct
    suppliers (via the lineitem bridge; no partsupp in the synthetic
    schema) per (brand, type, size) over a size IN-list, excluding one
    brand and the 'complaint' suppliers (adapted: negative account
    balance) through an ANTI join — Q16's NOT IN decorrelated the only
    way that scales."""
    t = load_tables(spark, sf_dir, ("lineitem", "part", "supplier"))
    p = t["part"].filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        t["lineitem"].select("l_partkey", "l_suppkey")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"),
              "left_anti")
        .groupBy("p_brand", "p_type", F.col("p_size").cast("bigint").alias("p_size"))
        .agg(F.count_distinct(F.col("l_suppkey")).cast("bigint").alias("supplier_cnt"))
    )


@query(
    "q19_bracketed_revenue",
    oracle=f"""
    SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) / 1000000.0 AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 21)
       OR (p.p_brand = 'Brand#9' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity >= 10 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#14' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity >= 20 AND l.l_quantity <= 40)
    """,
)
def q19_bracketed_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 — the OR-of-ANDs bracket predicate (brand x size x
    quantity bands; p_container doesn't exist in the synthetic schema,
    size bands stand in).  The disjunction references both sides, so it
    evaluates post-join on the broadcast part dim; each conjunct's
    part-only half could prune the build side further — the shape
    Catalyst handles via CNF extraction."""
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    j = t["lineitem"].select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    ).join(
        F.broadcast(t["part"].select("p_partkey", "p_brand", "p_size")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    q = F.col("l_quantity")
    sz = F.col("p_size")
    br = F.col("p_brand")
    cond = (
        ((br == "Brand#3") & sz.between(1, 15) & (q >= 1) & (q <= 21))
        | ((br == "Brand#9") & sz.between(10, 30) & (q >= 10) & (q <= 30))
        | ((br == "Brand#14") & sz.between(20, 50) & (q >= 20) & (q <= 40))
    )
    rev = _cents("l_extendedprice") * _bp_rem()
    return j.filter(cond).agg(
        (F.sum(rev).cast("double") / F.lit(1_000_000.0)).alias("revenue"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    )


@query(
    "q20_part_promotion_suppliers",
    oracle="""
    WITH shipped AS (
      SELECT l.l_suppkey, SUM(CAST(round(l.l_quantity) AS BIGINT)) AS qty
      FROM lineitem l
      WHERE l.l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE 'red%')
        AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate <  TIMESTAMP '1997-01-01'
      GROUP BY 1
      HAVING SUM(CAST(round(l.l_quantity) AS BIGINT)) > 100)
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM shipped)
    """,
)
def q20_part_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape — nested IN-subqueries decorrelated to a
    semi-join chain: suppliers who moved >100 units of 'red%' parts in
    a year (availqty/partsupp absent; shipped volume stands in),
    reported with their nation.  part-filter SEMI into lineitem,
    aggregate, HAVING, SEMI into supplier — no fact row ever
    duplicates."""
    t = load_tables(spark, sf_dir, ("lineitem", "part", "supplier", "nation"))
    red = t["part"].filter(F.col("p_name").like("red%")).select("p_partkey")
    shipped = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"),
              "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(F.round("l_quantity").cast("bigint")).alias("__qty"))
        .filter(F.col("__qty") > 100)
        .select("l_suppkey")
    )
    return (
        t["supplier"]
        .join(F.broadcast(shipped), F.col("s_suppkey") == F.col("l_suppkey"),
              "left_semi")
        .join(F.broadcast(t["nation"].select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    WITH li AS (SELECT l_orderkey, l_suppkey, l_shipdate FROM lineitem),
    late AS (
      SELECT DISTINCT li.l_orderkey, li.l_suppkey
      FROM li JOIN orders o ON li.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
        AND li.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM late l1
    JOIN supplier s ON l1.l_suppkey = s.s_suppkey
    WHERE EXISTS (SELECT 1 FROM li l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY 1
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 — suppliers who kept orders waiting: the
    EXISTS + NOT EXISTS pair as one SEMI and one ANTI join on the
    (order, other-supplier) condition.  'Late' is ship-lag > 60 days
    (no l_receiptdate/l_commitdate in the synthetic schema); the
    multi-supplier EXISTS and the sole-late NOT EXISTS both join on the
    order key with a supplier inequality — the decorrelation Q21
    exists to test."""
    t = load_tables(spark, sf_dir, ("lineitem", "orders", "supplier"))
    li = t["lineitem"].select("l_orderkey", "l_suppkey", "l_shipdate")
    late = (
        li.join(
            t["orders"].filter(F.col("o_orderstatus") == "F").select(
                "o_orderkey", "o_orderdate"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    l2 = li.select(
        F.col("l_orderkey").alias("__ok2"), F.col("l_suppkey").alias("__sk2")
    ).distinct()
    l3 = late.select(
        F.col("l_orderkey").alias("__ok3"), F.col("l_suppkey").alias("__sk3")
    )
    waiting = (
        late.join(
            l2,
            (F.col("l_orderkey") == F.col("__ok2"))
            & (F.col("l_suppkey") != F.col("__sk2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("__ok3"))
            & (F.col("l_suppkey") != F.col("__sk3")),
            "left_anti",
        )
    )
    return (
        waiting.join(
            F.broadcast(t["supplier"].select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@query(
    "q22_idle_customers",
    oracle="""
    WITH pos AS (
      SELECT SUM(CAST(round(c_acctbal * 100) AS HUGEINT)) AS s,
             COUNT(*) AS n
      FROM customer
      WHERE c_acctbal > 0 AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
    SELECT c.c_nationkey AS nationkey,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(round(c.c_acctbal * 100) AS HUGEINT)) AS DOUBLE)
             / 100.0 AS totacctbal
    FROM customer c, pos
    WHERE c.c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
      AND CAST(round(c.c_acctbal * 100) AS HUGEINT) * pos.n > pos.s
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY 1
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 — the anti-join + global-average gate: wealthy
    customers (balance above the positive-balance average of a
    nation-key set; phone prefixes don't exist, nation keys stand in)
    with NO recent orders.  The average never materializes as a
    double: the gate compares cents·count > sum in exact integers, the
    1-row (sum, count) aggregate broadcasts, and recent orders
    anti-join on the customer key."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    nations = [1, 3, 5, 7, 9, 11, 13]
    cust = t["customer"].filter(F.col("c_nationkey").isin(nations))
    cents = F.round(F.col("c_acctbal") * 100).cast("decimal(38,0)")
    pos = cust.filter(F.col("c_acctbal") > 0).agg(
        F.sum(cents).alias("__s"), F.count(F.lit(1)).alias("__n")
    )
    recent = t["orders"].filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    ).select("o_custkey")
    return (
        cust.join(F.broadcast(pos))
        .filter(cents * F.col("__n") > F.col("__s"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            (F.sum(cents).cast("double") / F.lit(100.0)).alias("totacctbal"),
        )
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             MIN(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cost_cents
      FROM lineitem
      GROUP BY 1, 2)
    SELECT s.s_acctbal, s.s_name, n.n_name,
           CAST(p.p_partkey AS BIGINT) AS p_partkey, p.p_brand,
           CAST(c.cost_cents AS DOUBLE) / 100.0 AS min_cost
    FROM part p
    JOIN cost c ON c.l_partkey = p.p_partkey
    JOIN supplier s ON c.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE p.p_size BETWEEN 10 AND 25 AND p.p_type = 'STANDARD'
      AND r.r_name = 'EUROPE'
      AND c.cost_cents = (
        SELECT MIN(c2.cost_cents)
        FROM cost c2
        JOIN supplier s2 ON c2.l_suppkey = s2.s_suppkey
        JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        WHERE c2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 — min-cost supplier: the scalar CORRELATED subquery
    (cheapest regional supply cost per part) decorrelated the only way
    that scales — min-per-group + join-back on (part, min) — plus an
    explicit total-order tiebreak on the top-100.  Adapted to the
    slimmed schema per the module method: no partsupp, so the observed
    (part, supplier) MIN extended price in integer cents over the
    lineitem bridge stands in for ps_supplycost (exact integer domain,
    no divided doubles); p_brand stands in for p_mfgr.  The oracle
    keeps the classic correlated form — DuckDB decorrelates it itself,
    so the oracle independently cross-checks the manual decorrelation.
    Plan: part/supplier/nation/region dims broadcast; the only
    fact-scale shuffle is the (l_partkey, l_suppkey) cost aggregation,
    pre-shrunk by the broadcast part semi-filter; the per-part min
    re-aggregates the already-tiny cost table.  Ref: TPC-H spec Q2
    (public); reference runs the same shape via its planner tests."""
    t = load_tables(spark, sf_dir, ("lineitem", "part", "supplier", "nation", "region"))
    eligible_nk = (
        t["nation"]
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    supp = (
        t["supplier"]
        .join(F.broadcast(eligible_nk), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = (
        t["part"]
        .filter(F.col("p_size").between(10, 25) & (F.col("p_type") == "STANDARD"))
        .select("p_partkey", "p_brand")
    )
    cost = (
        t["lineitem"]
        .select("l_partkey", "l_suppkey", _cents("l_extendedprice").alias("__c"))
        .join(F.broadcast(p.select("p_partkey")),
              F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .join(F.broadcast(supp.select("s_suppkey")),
              F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("__c").cast("bigint")).alias("cost_cents"))
    )
    mincost = cost.groupBy(F.col("l_partkey").alias("__pk")).agg(
        F.min("cost_cents").alias("__min_cents")
    )
    return (
        cost.join(mincost, F.col("l_partkey") == F.col("__pk"))
        .filter(F.col("cost_cents") == F.col("__min_cents"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal", "s_name", "n_name",
            F.col("p_partkey").cast("bigint").alias("p_partkey"), "p_brand",
            (F.col("cost_cents").cast("double") / F.lit(100.0)).alias("min_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )
