"""Canonical TPC-H-shaped composed-query suite (q77-q86).

Beyond the reference's declared surface (its dialect is single-SELECT:
parser.rs rejects subqueries, HAVING-over-join, multi-way star shapes —
README.md:409): these ten queries are the canonical compositions a
warehouse user actually runs, adapted to the fixture schema (which has
no partsupp table and drops a few TPC-H columns — each adaptation is
noted per query). They exercise plan shapes no other registry entry
covers end-to-end: the full Q1 aggregate battery, semi-join EXISTS into
an aggregate (Q4), a six-table snowflake with a same-nation residual
predicate (Q5), a self-aliased dimension pair (Q7), double aggregation
(Q13), HAVING-derived semi-join (Q18), disjunction-of-conjunctions
pushdown (Q19), and scalar-subquery + anti-join (Q22).

Scale notes: nation/region are always broadcast; customer/supplier join
sides are left to AQE (broadcast at small SF, shuffle at 100 TB);
fact-fact joins shuffle on their keys; every aggregate is partial+final.
Sums over computed doubles go through the quantized-integer path
(_qsum) and sums over raw doubles through the decimal path (dsum) so
the DuckDB oracle hashes bit-identically (see tables.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_olap_engine_spark.queries import register
from gpu_olap_engine_spark.queries.relational import _o_qsum, _qsum
from gpu_olap_engine_spark.queries.tables import T, davg, dsum, o_davg, o_dsum

_REV = "l_extendedprice * (1 - l_discount)"


def _rev() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "q77_tpch_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {_o_qsum('l_quantity')} AS sum_qty,
           {_o_qsum('l_extendedprice')} AS sum_base_price,
           {_o_qsum(_REV)} AS sum_disc_price,
           {_o_qsum(_REV + ' * (1 + l_tax)')} AS sum_charge,
           ({_o_qsum('l_quantity')}) / COUNT(l_quantity) AS avg_qty,
           ({_o_qsum('l_extendedprice')}) / COUNT(l_extendedprice)
               AS avg_price,
           ({_o_qsum('l_discount')}) / COUNT(l_discount) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q77(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: the full aggregate battery over one
    filtered scan. One shuffle (partial+final agg over 6 groups); the
    shipdate predicate pushes into parquet. At 100 TB this is the
    map-side-combine showcase: 6 groups mean the exchange moves ~6 rows
    per map task regardless of input size.

    r10 arithmetic: ALL eight aggregates use the floor-quantized
    int64 convention (_qsum; avg = qsum / count with the division
    order mirrored in the oracle). Measured at sf10 the decimal
    accumulators were the query, not the scan: count-only 0.83 s, one
    decimal SUM +0.8 s, one floor-long SUM +0.05 s; six decimal aggs
    put Q1 at 5.6 s vs ~1.5 s quantized. Cross-engine equality is
    unchanged (both engines floor identical doubles); the floor
    convention was already this query's rule for the computed
    sum_disc_price/sum_charge terms and is exact for the integral
    l_quantity. At 100 TB the long accumulator also has MORE headroom
    than DECIMAL(18,4) (9.2e14 vs 1e14 at scale 4)."""
    li = T(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-09-01").cast("date")
    )

    def _qavg(col, alias: str):
        # decimal accumulator for the same reason as _qsum: Q1's six
        # global groups see ~1e9 quantized price terms per row at
        # 100 TB, past int64; DuckDB's SUM(BIGINT) is exact HUGEINT.
        return (
            (
                F.sum(F.floor(col * 10000).cast("decimal(20,0)")).cast(
                    "double"
                )
                / 10000
            )
            / F.count(col)
        ).alias(alias)

    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _qsum(F.col("l_quantity"), "sum_qty"),
        _qsum(F.col("l_extendedprice"), "sum_base_price"),
        _qsum(_rev(), "sum_disc_price"),
        _qsum(_rev() * (1 + F.col("l_tax")), "sum_charge"),
        _qavg(F.col("l_quantity"), "avg_qty"),
        _qavg(F.col("l_extendedprice"), "avg_price"),
        _qavg(F.col("l_discount"), "avg_disc"),
        F.count("*").alias("count_order"),
    )


@register(
    "q78_tpch_q3",
    oracle=f"""
    SELECT l_orderkey,
           {_o_qsum(_REV)} AS revenue,
           strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_date,
           o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate < DATE '1998-07-01' AND l_shipdate > DATE '1998-07-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def q78(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping priority (adapted: o_shippriority is not in
    the fixture schema; o_orderpriority stands in). Both date filters
    push into their scans before the joins; the final top-10 fuses to
    TakeOrderedAndProject. l_orderkey is the unique tiebreaker."""
    cust = T(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = T(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-07-01").cast("date")
    )
    li = T(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-07-01").cast("date")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_qsum(_rev(), "revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd").alias(
                "o_date"
            ),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "q79_tpch_q4",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1997-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
    GROUP BY o_orderpriority
    """,
)
def q79(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 order-priority checking (adapted: the fixture has no
    l_commitdate/l_receiptdate, so the EXISTS predicate is a quantity
    threshold). EXISTS compiles to a LEFT SEMI join — each order row is
    emitted at most once however many lineitems match, then a 5-group
    aggregate."""
    orders = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("date"))
    )
    big_lines = T(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        orders.join(
            big_lines, orders.o_orderkey == big_lines.l_orderkey, "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "q80_tpch_q5",
    oracle=f"""
    SELECT n_name, {_o_qsum(_REV)} AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
    GROUP BY n_name
    """,
)
def q80(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 local-supplier volume: six-table snowflake whose
    distinguishing feature is the c_nationkey = s_nationkey residual —
    a join predicate between two tables that are never directly joined.
    nation/region broadcast; supplier is small enough that AQE
    broadcasts it too; the orders-lineitem-customer chain shuffles on
    its keys. The region filter prunes nations before any fact joins."""
    reg = T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nat = T(spark, sf_dir, "nation").join(
        F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey")
    )
    sup = T(spark, sf_dir, "supplier").join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    )
    orders = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    cust = T(spark, sf_dir, "customer")
    li = T(spark, sf_dir, "lineitem")
    return (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(
            cust,
            (orders.o_custkey == cust.c_custkey)
            & (cust.c_nationkey == sup.s_nationkey),
        )
        .groupBy("n_name")
        .agg(_qsum(_rev(), "revenue"))
    )


@register(
    "q81_tpch_q7",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           {_o_qsum(_REV)} AS revenue
    FROM supplier, lineitem, orders, customer, nation n1, nation n2
    WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
      AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
      AND c_nationkey = n2.n_nationkey
      AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= DATE '1996-01-01' AND l_shipdate <= DATE '1997-12-31'
    GROUP BY n1.n_name, n2.n_name, CAST(year(l_shipdate) AS BIGINT)
    """,
)
def q81(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 volume shipping: the same dimension table (nation)
    joined twice under different roles, with a symmetric disjunctive
    pair predicate. Both nation roles broadcast; the pair filter is
    applied after both role joins (Catalyst pushes each IN-(2-names)
    half down into its own broadcast side)."""
    nat = T(spark, sf_dir, "nation")
    pair = ["NATION_1", "NATION_2"]
    n1 = nat.filter(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nat.filter(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    sup = T(spark, sf_dir, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key")
    )
    cust = T(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key")
    )
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") <= F.lit("1997-12-31").cast("date"))
    )
    orders = T(spark, sf_dir, "orders")
    return (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(_qsum(_rev(), "revenue"))
    )


@register(
    "q82_tpch_q10",
    oracle=f"""
    SELECT c_custkey, c_name, {_o_qsum(_REV)} AS revenue, c_acctbal, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1997-04-01'
      AND l_returnflag = 'R' AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q82(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 returned-item reporting: fact-fact join narrowed by a
    quarter filter and a returnflag filter (both pushed to the scans),
    wide grouping key carrying customer attributes, top-20 by lost
    revenue. c_custkey is the unique tiebreaker."""
    cust = T(spark, sf_dir, "customer")
    nat = T(spark, sf_dir, "nation")
    orders = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("date"))
    )
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_qsum(_rev(), "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q83_tpch_q13",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
        GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def q83(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 customer order-count distribution: LEFT OUTER join
    with a predicate on the preserved-side-nullable input, then DOUBLE
    aggregation (per-customer count, then histogram of counts). The
    second aggregate's input is one row per customer — tiny — so the
    whole second shuffle moves ~|customers| rows regardless of order
    volume. COUNT(o_orderkey) skips the NULLs the outer join manufactures."""
    cust = T(spark, sf_dir, "customer")
    orders = T(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q84_tpch_q18",
    oracle=f"""
    WITH big AS (
        SELECT l_orderkey,
               SUM(CAST(floor(l_quantity * 10000) AS BIGINT)) AS q_l
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(floor(l_quantity * 10000) AS BIGINT)) > 2500000
    )
    SELECT c_custkey, c_name, o_orderkey,
           strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_date,
           o_totalprice,
           CAST(q_l AS DOUBLE) / 10000 AS sum_qty
    FROM customer, orders, big
    WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
)
def q84(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 large-volume customers in ONE fact pass (r10): the
    output groups by o_orderkey (customer/order attributes are
    functionally dependent on it), so the per-order quantity total
    the HAVING filter computes IS the output sum_qty — the textbook
    plan's second lineitem aggregation is redundant and this plan
    does one lineitem aggregate, a pure-integer threshold filter
    (q_l > 2_500_000 on the floor-quantized int64 total — the
    q182-proof compare), and two orders-sized joins. At 100 TB that
    removes a full scan+shuffle of the largest table per run.
    o_orderkey is the unique tiebreaker."""
    li = T(spark, sf_dir, "lineitem")
    # ONE pass over the fact table (r10): the final projection groups
    # by o_orderkey (plus functionally-dependent customer/order
    # attributes), so its SUM(l_quantity) per group IS the per-order
    # total the HAVING subquery already computed — the textbook plan's
    # second full-lineitem aggregation is redundant. Reusing the
    # aggregate turns Q18 into: one lineitem aggregate, a filter, and
    # two orders-sized joins. At 100 TB that removes a second full
    # scan+shuffle of the largest table; bit-identical (same dsum over
    # the same row set).
    # q182-proof arithmetic (r10): the quantity total accumulates as
    # floor-quantized int64 and the HAVING threshold compares in
    # PURE INTEGERS (q_l > 2_500_000) — never a double compare whose
    # cross-engine equality leans on fixture values; the emitted
    # sum_qty is one exact long -> double division in both engines.
    # l_quantity is integral so the quantized sum equals the exact
    # decimal sum bit-for-bit; the long aggregate runs ~10x faster
    # than the DECIMAL(18,4) accumulator (measured at sf10, see Q1).
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.floor(F.col("l_quantity") * 10000).cast("long")).alias(
                "q_l"
            )
        )
        .filter(F.col("q_l") > 2_500_000)
        .select(
            "l_orderkey",
            (F.col("q_l").cast("double") / 10000).alias("sum_qty"),
        )
    )
    orders = T(spark, sf_dir, "orders").join(
        big_orders, F.col("o_orderkey") == F.col("l_orderkey")
    )
    cust = T(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd").alias(
                "o_date"
            ),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@register(
    "q85_tpch_q19",
    oracle=f"""
    SELECT {_o_qsum(_REV)} AS revenue, COUNT(*) AS cnt
    FROM lineitem, part
    WHERE p_partkey = l_partkey AND (
          (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
             AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
             AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
             AND l_quantity BETWEEN 20 AND 40))
    """,
)
def q85(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 disjunctive discounted revenue (adapted: the fixture
    part table has no p_container, so each arm pairs brand+size with a
    quantity band). The OR-of-ANDs straddles both join inputs; Catalyst
    derives the single-side implications (p_brand IN (...) onto part,
    l_quantity BETWEEN 1 AND 40 onto lineitem) and pushes them into the
    scans, leaving the full disjunction as a post-join residual — the
    canonical 'can your optimizer decompose a disjunction' test."""
    part = T(spark, sf_dir, "part")
    li = T(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    arm = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & q.between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & q.between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & q.between(20, 40)
        )
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(arm)
        .agg(_qsum(_rev(), "revenue"), F.count("*").alias("cnt"))
    )


@register(
    "q86_tpch_q22",
    oracle=f"""
    SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
           COUNT(*) AS numcust,
           {o_dsum('c_acctbal')} AS totacctbal
    FROM customer
    WHERE c_acctbal > (
            SELECT {o_davg('c_acctbal')} FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    """,
)
def q86(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 global-sales-opportunity (adapted: the fixture has no
    c_phone, so prospects group by nation instead of phone country
    code). Three plan features in one query: an uncorrelated scalar
    subquery (the positive-balance mean, computed once and broadcast as
    a 1-row literal), a NOT EXISTS anti-join against orders (narrowed
    to urgent orders so the prospect set is non-empty at every fixture
    SF — the dense synthetic orders table gives every customer at least
    one order), and a final aggregate. The mean goes through the
    decimal-sum/count path on both engines so the > comparison is
    bit-identical."""
    cust = T(spark, sf_dir, "customer")
    avg_row = cust.filter(F.col("c_acctbal") > 0.0).agg(
        davg("c_acctbal", "avg_bal")
    )
    orders = T(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        cust.join(F.broadcast(avg_row))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, F.col("c_custkey") == orders.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").cast("long").alias("nationkey"))
        .agg(F.count("*").alias("numcust"), dsum("c_acctbal", "totacctbal"))
    )


@register(
    "q103_tpch_q8",
    oracle=f"""
    WITH flat AS (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               CAST(floor(({_REV}) * 10000) AS BIGINT) AS vol_q,
               n2.n_name AS supp_nation
        FROM part, supplier, lineitem, orders, customer,
             nation n1, nation n2, region
        WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
          AND l_orderkey = o_orderkey AND o_custkey = c_custkey
          AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
          AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
          AND o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
          AND p_type = 'ECONOMY'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol_q ELSE 0 END)
                AS DOUBLE)
           / CAST(SUM(vol_q) AS DOUBLE) AS mkt_share
    FROM flat GROUP BY o_year
    """,
)
def q103(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 national market share: the eight-relation snowflake
    with nation joined TWICE under different roles (customer region
    gate vs supplier nationality), then a conditional-over-total ratio
    per year. Adaptation: p_type = 'ECONOMY' (fixture types are
    single words). Both sums quantize per-row volumes to 1e-4 ints so
    the ratio divides identical operands on both engines. Plan:
    part/nation/region broadcast; the lineitem-orders-customer chain
    carries the shuffles; the ratio is one partial+final aggregate."""
    reg = T(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = T(spark, sf_dir, "nation").join(
        F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("cust_nk"))
    n2 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("supp_nk"), F.col("n_name").alias("supp_nation")
    )
    part = T(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    sup = T(spark, sf_dir, "supplier").join(
        F.broadcast(n2), F.col("s_nationkey") == F.col("supp_nk")
    )
    orders = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") <= F.lit("1997-12-31").cast("date"))
    )
    cust = T(spark, sf_dir, "customer")
    li = T(spark, sf_dir, "lineitem")
    flat = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("cust_nk"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            F.floor(_rev() * 10000).cast("long").alias("vol_q"),
            "supp_nation",
        )
    )
    # decimal accumulators: vol_q is ~1e9 per row and the group is a
    # whole YEAR of joined volume — int64 wraps near 1e9 group rows
    # (the 100 TB regime); the oracle's SUM(BIGINT) is exact HUGEINT.
    dq = lambda c: F.sum(c.cast("decimal(20,0)")).cast("double")  # noqa: E731
    return flat.groupBy("o_year").agg(
        (
            dq(
                F.when(
                    F.col("supp_nation") == "NATION_3", F.col("vol_q")
                ).otherwise(F.lit(0))
            )
            / dq(F.col("vol_q"))
        ).alias("mkt_share")
    )


@register(
    "q104_tpch_q14",
    oracle=f"""
    SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                    THEN CAST(floor(({_REV}) * 10000) AS BIGINT)
                    ELSE 0 END) AS DOUBLE)
           / CAST(SUM(CAST(floor(({_REV}) * 10000) AS BIGINT)) AS DOUBLE)
               AS promo_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= DATE '1997-03-01' AND l_shipdate < DATE '1997-04-01'
    """,
)
def q104(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 promotion effect: conditional revenue share for one
    ship month. part broadcast into the date-pruned lineitem scan; a
    single global aggregate (no group key) finishes in one partial+
    final pass. Quantized-int operands make the percentage division
    bit-identical across engines."""
    part = T(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("date"))
    )
    vol = F.floor(_rev() * 10000).cast("long")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(F.col("p_type"), vol.alias("vol_q"))
        .agg(
            (
                F.lit(100.0)
                # decimal accumulators: single GLOBAL group over ~1e9
                # quantized terms per row — int64 headroom runs out in
                # the 100 TB regime; oracle side is exact HUGEINT.
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", F.col("vol_q"))
                    .otherwise(F.lit(0))
                    .cast("decimal(20,0)")
                ).cast("double")
                / F.sum(F.col("vol_q").cast("decimal(20,0)")).cast("double")
            ).alias("promo_revenue")
        )
    )


@register(
    "q105_tpch_q15",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no, {_o_qsum(_REV)} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q105(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 top supplier: an aggregate-defined view consumed
    twice — once as the join input, once reduced to a scalar MAX that
    gates it. Spark computes the revenue relation once (it is tiny:
    |suppliers| rows), derives the 1-row MAX, and broadcasts it back;
    quantized revenue makes the equality comparison exact on both
    engines. The self-referencing-view shape the reference's
    single-SELECT dialect cannot express at all."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("date"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _qsum(_rev(), "total_revenue")
    )
    top = revenue.agg(F.max("total_revenue").alias("top_rev"))
    sup = T(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("top_rev"))
        .join(sup, F.col("supplier_no") == sup.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q106_tpch_q17",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0
               AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey AND p_brand = 'Brand#23' AND p_size < 5
      AND l_quantity < 0.2 * (
          SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                 / COUNT(*)
          FROM lineitem l2 WHERE l2.l_partkey = p_partkey
      )
    """,
)
def q106(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 small-quantity-order revenue: a correlated scalar
    AVG per part gating the outer row. Adaptation: p_size < 5 stands
    in for the fixture-absent p_container. Spark decorrelates it the
    way Catalyst would: pre-aggregate avg quantity per part (decimal-
    exact so both engines' 0.2 * avg threshold is the same double),
    broadcast-join it back, filter, aggregate. Per-part avgs are one
    map-side-combinable pass over lineitem — no per-row subquery
    execution at any scale."""
    part = T(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#23") & (F.col("p_size") < 5)
    )
    li = T(spark, sf_dir, "lineitem")
    avg_q = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double")
            / F.count("*")
        ).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(avg_q, li.l_partkey == F.col("ap_key"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast(
                    "double"
                )
                / 7.0
            ).alias("avg_yearly")
        )
    )


@register(
    "q107_tpch_q21",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_returnflag = 'R'
      )
      AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
    GROUP BY s_name
    """,
)
def q107(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 suppliers who kept orders waiting: the double
    correlated EXISTS / NOT EXISTS self-join. Adaptation: "late" is
    l_returnflag = 'R' (fixture has no commit/receipt dates).
    Spark rewrites both subqueries into ONE per-order aggregate —
    n_supp (distinct suppliers) and n_late_supp (distinct late
    suppliers): EXISTS-other-supplier == n_supp >= 2, NOT-EXISTS-
    other-late == n_late_supp = 1 (the probing row's own supplier is
    late, so it contributes the 1). One extra aggregation replaces
    two lineitem self-joins — at 100 TB that is one shuffle instead
    of two fact-fact joins, and it cannot skew worse than the order
    key already does."""
    li = T(spark, sf_dir, "lineitem")
    late = F.col("l_returnflag") == "R"
    stats = li.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late_supp"),
    )
    orders = T(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    nat = T(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    sup = T(spark, sf_dir, "supplier").join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    )
    l1 = li.filter(late)
    return (
        l1.join(orders, l1.l_orderkey == orders.o_orderkey)
        .join(stats, l1.l_orderkey == F.col("ok"))
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .join(sup, l1.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )
