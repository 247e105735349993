"""Differential fuzzing: hypothesis-generated queries run on Spark AND
DuckDB; results must agree. Complements the fixed oracle suite by
exploring the predicate/aggregation space instead of hand-picked
points.

Generated shapes stay inside the engine's determinism rules (counts
and decimal-exact sums only), so any mismatch is a real semantic
divergence, not float noise.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE

SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@pytest.fixture(scope="module")
def orders(spark):
    df = spark.read.parquet(f"{SF_ORACLE}/orders.parquet").cache()
    df.count()
    yield df
    # the cache manager substitutes InMemoryRelation into ANY later
    # plan over the same files — leaving this cached would break the
    # scan-pushdown assertions in test_plans (session is shared)
    df.unpersist()


@given(
    lo=st.floats(min_value=0, max_value=500_000, allow_nan=False),
    status=st.sampled_from(["F", "O", "P"]),
)
@settings(**SETTINGS)
def test_fuzz_filter_count(spark, duck, orders, lo, status):
    """count(filter) must agree for arbitrary thresholds + equality."""
    got = orders.filter(
        (F.col("o_totalprice") > lo) & (F.col("o_orderstatus") == status)
    ).count()
    want = duck.sql(
        f"SELECT COUNT(*) c FROM orders "
        f"WHERE o_totalprice > {lo!r} AND o_orderstatus = '{status}'"
    ).fetchone()[0]
    assert got == want


@given(
    key=st.sampled_from(["o_orderstatus", "o_orderpriority"]),
    lo=st.integers(min_value=0, max_value=1499),
)
@settings(**SETTINGS)
def test_fuzz_groupby_decimal_sum(spark, duck, orders, key, lo):
    """Grouped decimal-exact sums must agree for arbitrary key filters."""
    got = {
        r[key]: (r["c"], r["s"])
        for r in orders.filter(F.col("o_custkey") >= lo)
        .groupBy(key)
        .agg(
            F.count("*").alias("c"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("s"),
        )
        .collect()
    }
    want = {
        r[0]: (r[1], r[2])
        for r in duck.sql(
            f"""
            SELECT {key}, COUNT(*),
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
            FROM orders WHERE o_custkey >= {lo} GROUP BY {key}
            """
        ).fetchall()
    }
    assert got == want


@given(
    n=st.integers(min_value=1, max_value=200),
    asc=st.booleans(),
)
@settings(**SETTINGS)
def test_fuzz_topk(spark, duck, orders, n, asc):
    """Top-k with a unique tiebreaker must agree for any k/direction."""
    order = [
        F.col("o_totalprice").asc() if asc else F.col("o_totalprice").desc(),
        F.col("o_orderkey"),
    ]
    got = [
        (r["o_orderkey"], r["o_totalprice"])
        for r in orders.select("o_orderkey", "o_totalprice")
        .orderBy(*order)
        .limit(n)
        .collect()
    ]
    direction = "ASC" if asc else "DESC"
    want = duck.sql(
        f"""
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice {direction}, o_orderkey LIMIT {n}
        """
    ).fetchall()
    assert got == [tuple(r) for r in want]


@given(
    how=st.sampled_from(["inner", "left", "right", "full", "left_semi", "left_anti"]),
    bal=st.floats(min_value=-1000, max_value=10000, allow_nan=False),
)
@settings(**SETTINGS)
def test_fuzz_join_types(spark, duck, orders, how, bal):
    """Row counts of every join type against an arbitrarily filtered
    build side must agree with the equivalent DuckDB join."""
    customer = spark.read.parquet(f"{SF_ORACLE}/customer.parquet").filter(
        F.col("c_acctbal") > bal
    )
    got = orders.join(customer, orders.o_custkey == customer.c_custkey, how).count()
    sql_join = {
        "inner": "JOIN",
        "left": "LEFT JOIN",
        "right": "RIGHT JOIN",
        "full": "FULL JOIN",
        "left_semi": "SEMI JOIN",
        "left_anti": "ANTI JOIN",
    }[how]
    want = duck.sql(
        f"""
        SELECT COUNT(*) FROM orders o
        {sql_join} (SELECT * FROM customer WHERE c_acctbal > {bal!r}) c
          ON o.o_custkey = c.c_custkey
        """
    ).fetchone()[0]
    assert got == want


@given(
    frac=st.integers(min_value=1, max_value=99),
)
@settings(**SETTINGS)
def test_fuzz_hash_sample_agree(spark, duck, orders, frac):
    """Deterministic hash sampling selects the identical subset on
    both engines for any sampling rate."""
    h = "(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT) % 100"
    want = duck.sql(
        f"SELECT COUNT(*) FROM orders WHERE {h} < {frac}"
    ).fetchone()[0]
    got = orders.filter(
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 15), 16, 10)
        .cast("long")
        % 100
        < frac
    ).count()
    assert got == want


@given(
    part=st.sampled_from(["o_orderstatus", "o_orderpriority"]),
    n=st.integers(min_value=1, max_value=5),
)
@settings(**SETTINGS)
def test_fuzz_window_topn_per_group(spark, duck, orders, part, n):
    """Per-group top-n via row_number must agree for arbitrary
    partition keys and n (unique orderkey tiebreaker keeps the
    selected set deterministic)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(part).orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    got = {
        r["o_orderkey"]
        for r in orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n)
        .select("o_orderkey")
        .collect()
    }
    want = {
        r[0]
        for r in duck.sql(
            f"SELECT o_orderkey FROM ("
            f"  SELECT o_orderkey, ROW_NUMBER() OVER ("
            f"    PARTITION BY {part} ORDER BY o_totalprice DESC, o_orderkey"
            f"  ) AS rn FROM orders) WHERE rn <= {n}"
        ).fetchall()
    }
    assert got == want


@given(
    mod=st.integers(min_value=2, max_value=9),
    lo=st.floats(min_value=0, max_value=400_000, allow_nan=False),
    op=st.sampled_from(["UNION", "INTERSECT", "EXCEPT"]),
)
@settings(**SETTINGS)
def test_fuzz_set_ops(spark, duck, orders, mod, lo, op):
    """Distinct set operations over arbitrary operand pairs must agree
    (Spark: distinct/intersect/subtract on key projections)."""
    a = orders.filter(F.col("o_custkey") % mod == 0).select("o_orderkey")
    b = orders.filter(F.col("o_totalprice") > lo).select("o_orderkey")
    if op == "UNION":
        got = a.union(b).distinct().count()
    elif op == "INTERSECT":
        got = a.intersect(b).count()
    else:
        got = a.subtract(b).count()
    want = duck.sql(
        f"SELECT COUNT(*) FROM ("
        f"  SELECT o_orderkey FROM orders WHERE o_custkey % {mod} = 0"
        f"  {op} "
        f"  SELECT o_orderkey FROM orders WHERE o_totalprice > {lo!r})"
    ).fetchone()[0]
    assert got == want


@given(k=st.integers(min_value=2, max_value=10))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_fuzz_shingle_counts_agree(spark, duck, k):
    """Distinct k-word shingle counts per document must match the SQL
    twin for ANY k — the shared primitive under minhash/jaccard/
    decontamination, fuzzed over the shingle width."""
    from gpu_olap_engine_spark.operators import dedup as D

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    got = {
        r["id"]: r["n"]
        for r in D.shingles(docs, "doc_id", "text", k)
        .groupBy("id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    want = {
        r[0]: r[1]
        for r in duck.sql(
            rf"""
            WITH words AS (
                SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
                FROM documents
            ),
            sh AS (
                SELECT DISTINCT doc_id,
                       array_to_string(list_slice(w, i, i + {k - 1}), ' ') AS shingle
                FROM words,
                     unnest(generate_series(1, greatest(len(w) - {k - 1}, 1))) AS t(i)
            )
            SELECT doc_id, COUNT(*) FROM sh GROUP BY doc_id
            """
        ).fetchall()
    }
    assert got == want


@pytest.fixture(scope="module")
def lineitem(spark):
    df = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet").cache()
    df.count()
    yield df
    df.unpersist()  # see orders fixture: cached plans leak into test_plans


def _q(col):
    """Quantized sum (same path as queries.relational._qsum)."""
    return F.sum(F.floor(col * 10000).cast("long")).cast("double") / 10000


_OQ = "CAST(CAST(SUM(CAST(floor(({e}) * 10000) AS BIGINT)) AS BIGINT) AS DOUBLE) / 10000"


@given(
    month=st.integers(min_value=1, max_value=12),
    year=st.sampled_from([1996, 1998, 2000]),
)
@settings(**SETTINGS)
def test_fuzz_tpch_q1_cutoff(spark, duck, lineitem, month, year):
    """The Q1 shape must agree for ARBITRARY shipdate cutoffs, not just
    the registered constant (guards the date-comparison semantics and
    the quantized-sum path across the whole date domain)."""
    cut = f"{year}-{month:02d}-01"
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    got = {
        (r["l_returnflag"], r["l_linestatus"]): (r["c"], r["s"])
        for r in lineitem.filter(
            F.col("l_shipdate") <= F.lit(cut).cast("date")
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("c"), _q(disc).alias("s"))
        .collect()
    }
    want = {
        (rf, ls): (c, s)
        for rf, ls, c, s in duck.sql(
            f"""SELECT l_returnflag, l_linestatus, COUNT(*),
                   {_OQ.format(e='l_extendedprice * (1 - l_discount)')}
            FROM lineitem WHERE l_shipdate <= DATE '{cut}'
            GROUP BY 1, 2"""
        ).fetchall()
    }
    assert got == want


@given(
    b1=st.integers(min_value=1, max_value=20),
    b2=st.integers(min_value=1, max_value=20),
    s_lo=st.integers(min_value=1, max_value=40),
    q_lo=st.integers(min_value=1, max_value=40),
)
@settings(**SETTINGS)
def test_fuzz_tpch_q19_bands(spark, duck, lineitem, b1, b2, s_lo, q_lo):
    """The Q19 disjunction must agree for arbitrary brand/size/quantity
    bands — exercises the optimizer's disjunction decomposition at
    many selectivities, including empty arms."""
    part = spark.read.parquet(f"{SF_ORACLE}/part.parquet")
    qty = F.col("l_quantity")
    arm = (
        (F.col("p_brand") == f"Brand#{b1}")
        & F.col("p_size").between(s_lo, s_lo + 10)
        & qty.between(q_lo, q_lo + 10)
    ) | (
        (F.col("p_brand") == f"Brand#{b2}")
        & F.col("p_size").between(s_lo + 5, s_lo + 25)
        & qty.between(q_lo + 5, q_lo + 15)
    )
    row = (
        lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .filter(arm)
        .agg(F.count("*").alias("c"))
        .collect()[0]
    )
    want = duck.sql(
        f"""SELECT COUNT(*) FROM lineitem, part
        WHERE p_partkey = l_partkey AND (
          (p_brand = 'Brand#{b1}' AND p_size BETWEEN {s_lo} AND {s_lo + 10}
             AND l_quantity BETWEEN {q_lo} AND {q_lo + 10})
          OR (p_brand = 'Brand#{b2}' AND p_size BETWEEN {s_lo + 5} AND {s_lo + 25}
             AND l_quantity BETWEEN {q_lo + 5} AND {q_lo + 15}))"""
    ).fetchone()[0]
    assert row["c"] == want


@given(thr=st.integers(min_value=50, max_value=400))
@settings(**SETTINGS)
def test_fuzz_tpch_q18_threshold(spark, duck, lineitem, thr):
    """The HAVING-derived semi-join key set must agree for arbitrary
    quantity thresholds (decimal-exact HAVING comparison on both
    engines)."""
    got = (
        lineitem.groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,4)"))
            .cast("double")
            .alias("q")
        )
        .filter(F.col("q") > thr)
        .count()
    )
    want = duck.sql(
        f"""SELECT COUNT(*) FROM (
            SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
            HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                   > {thr})"""
    ).fetchone()[0]
    assert got == want


@given(width=st.integers(min_value=2, max_value=9))
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_fuzz_line_dedup_agrees(spark, duck, width):
    """Keep-first line dedup must match its SQL twin for ANY segment
    width: same survivors, same reassembled text."""
    from gpu_olap_engine_spark.operators.dedup import line_dedup_keep_first

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    got = {
        r["id"]: (r["clean_text"], r["n_kept"], r["n_removed"])
        for r in line_dedup_keep_first(docs, "doc_id", "text", width=width)
        .collect()
    }
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in duck.sql(
            rf"""
            WITH words AS (
                SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
                FROM documents
            ),
            seg AS (
                SELECT doc_id, i AS pos,
                       array_to_string(
                           list_slice(w, i * {width} + 1, i * {width} + {width}),
                           ' ') AS seg,
                       doc_id * 1000000 + i AS ord_key
                FROM words,
                     unnest(generate_series(0,
                         greatest(CAST(ceil(len(w) / {width}.0) AS BIGINT), 1) - 1))
                         AS t(i)
            ),
            firsts AS (SELECT seg, MIN(ord_key) AS fk FROM seg GROUP BY seg),
            kept AS (
                SELECT s.doc_id, s.pos, s.seg
                FROM seg s JOIN firsts f ON s.seg = f.seg AND s.ord_key = f.fk
            ),
            ka AS (
                SELECT doc_id, string_agg(seg, ' ' ORDER BY pos) AS ct,
                       COUNT(*) AS nk
                FROM kept GROUP BY doc_id
            ),
            base AS (SELECT doc_id, COUNT(*) AS ns FROM seg GROUP BY doc_id)
            SELECT b.doc_id, COALESCE(k.ct, ''), COALESCE(k.nk, 0),
                   b.ns - COALESCE(k.nk, 0)
            FROM base b LEFT JOIN ka k USING (doc_id)
            """
        ).fetchall()
    }
    assert got == want


@given(nk=st.integers(min_value=0, max_value=24))
@settings(**SETTINGS)
def test_fuzz_tpch_q21_nation(spark, duck, lineitem, nk):
    """The Q21 aggregate rewrite (n_supp >= 2, n_late_supp == 1) must
    equal the literal EXISTS / NOT EXISTS formulation for ANY target
    nation — the equivalence proof of the decorrelation, fuzzed."""
    sup = spark.read.parquet(f"{SF_ORACLE}/supplier.parquet")
    nat = spark.read.parquet(f"{SF_ORACLE}/nation.parquet").filter(
        F.col("n_nationkey") == nk
    )
    orders = spark.read.parquet(f"{SF_ORACLE}/orders.parquet").filter(
        F.col("o_orderstatus") == "F"
    )
    late = F.col("l_returnflag") == "R"
    stats = lineitem.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late"),
    )
    got = {
        (r["s_name"], r["numwait"])
        for r in lineitem.filter(late)
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(stats, F.col("l_orderkey") == F.col("ok"))
        .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(
            sup.join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .collect()
    }
    want = set(
        duck.sql(
            f"""
            SELECT s_name, COUNT(*) FROM supplier, lineitem l1, orders, nation
            WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
              AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
              AND EXISTS (SELECT 1 FROM lineitem l2
                          WHERE l2.l_orderkey = l1.l_orderkey
                            AND l2.l_suppkey <> l1.l_suppkey)
              AND NOT EXISTS (SELECT 1 FROM lineitem l3
                              WHERE l3.l_orderkey = l1.l_orderkey
                                AND l3.l_suppkey <> l1.l_suppkey
                                AND l3.l_returnflag = 'R')
              AND s_nationkey = n_nationkey AND n_nationkey = {nk}
            GROUP BY s_name
            """
        ).fetchall()
    )
    assert got == want


@given(brand=st.integers(min_value=1, max_value=25),
       size=st.integers(min_value=2, max_value=50))
@settings(**SETTINGS)
def test_fuzz_tpch_q17_threshold(spark, duck, lineitem, brand, size):
    """Q17's decorrelated pre-aggregate must equal the correlated
    scalar-AVG subquery for arbitrary brand/size gates (including
    empty part sets -> NULL sum on both engines)."""
    part = spark.read.parquet(f"{SF_ORACLE}/part.parquet").filter(
        (F.col("p_brand") == f"Brand#{brand}") & (F.col("p_size") < size)
    )
    avg_q = lineitem.groupBy(F.col("l_partkey").alias("ap")).agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double")
            / F.count("*")
        ).alias("aq")
    )
    got = (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(avg_q, F.col("l_partkey") == F.col("ap"))
        .filter(F.col("l_quantity") < 0.2 * F.col("aq"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double"))
            .alias("s")
        )
        .collect()[0]["s"]
    )
    want = duck.sql(
        f"""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
        FROM lineitem, part
        WHERE p_partkey = l_partkey AND p_brand = 'Brand#{brand}'
          AND p_size < {size}
          AND l_quantity < 0.2 * (
              SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                     / COUNT(*)
              FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
        """
    ).fetchone()[0]
    assert got == want


@given(k=st.integers(min_value=2, max_value=12))
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_fuzz_bucket_assignment_agrees(spark, duck, orders, k):
    """q116's sketch-path bucket assignment must agree with DuckDB for
    ANY quantile grid (k buckets, k-1 continuous cut points) — guards
    the percentile/quantile_cont parity and the strict-> comparison."""
    qs = [i / k for i in range(1, k)]
    qlist = ",".join(f"{q!r}D" for q in qs)
    cuts = orders.agg(
        F.expr(f"percentile(o_totalprice, array({qlist}))").alias("cs")
    )
    got = {
        (r["bucket"], r["cnt"])
        for r in orders.crossJoin(F.broadcast(cuts))
        .select(
            (1 + F.size(F.filter("cs", lambda c: F.col("o_totalprice") > c)))
            .alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    dq = ",".join(repr(q) for q in qs)
    want = set(
        duck.sql(
            f"""
            WITH cuts AS (
                SELECT quantile_cont(o_totalprice, [{dq}]) AS cs FROM orders
            )
            SELECT 1 + len(list_filter(cs, c -> o_totalprice > c)) AS b,
                   COUNT(*)
            FROM orders, cuts GROUP BY b
            """
        ).fetchall()
    )
    assert got == want


@given(n=st.integers(min_value=2, max_value=24))
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_fuzz_rendezvous_assignment_agrees(spark, duck, orders, n):
    """HRW shard assignment must agree with the SQL twin for ANY shard
    count — guards the (hash DESC, shard ASC) argmax encoding."""
    from gpu_olap_engine_spark.operators.dedup import base_hash

    keys = orders.select(F.col("o_orderkey").alias("k")).filter(
        F.col("k") < 2000
    )
    scored = F.array(
        *[
            F.struct(
                base_hash(
                    F.concat(F.col("k").cast("string"), F.lit(f"-{s}"))
                ).alias("h"),
                F.lit(-s).alias("neg_s"),
            )
            for s in range(n)
        ]
    )
    got = {
        r["k"]: r["shard"]
        for r in keys.select(
            "k", (-F.array_max(scored)["neg_s"]).alias("shard")
        ).collect()
    }
    want = {
        r[0]: r[1]
        for r in duck.sql(
            f"""
            WITH keys AS (
                SELECT o_orderkey AS k FROM orders WHERE o_orderkey < 2000
            )
            SELECT k,
                   (SELECT s FROM unnest(generate_series(0, {n - 1})) AS t(s)
                    ORDER BY (('0x' || substr(md5(k || '-' || s), 1, 15))::BIGINT)
                             DESC, s
                    LIMIT 1)
            FROM keys
            """
        ).fetchall()
    }
    assert got == want


@given(width=st.sampled_from([900, 1800, 3600, 7200, 14400]))
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_fuzz_interpolation_agrees(spark, duck, width):
    """q117's interpolation machinery must agree with the SQL twin for
    ANY bucket width (gap structure changes completely with width) —
    guards the ignore-nulls carries and the interpolation expression's
    operation-order alignment."""
    from pyspark.sql.window import Window

    us = "epoch_us(CAST(ts AS TIMESTAMP))"
    ev = spark.read.parquet(f"{SF_ORACLE}/events.parquet")
    if dict(ev.dtypes)["ts"] == "bigint":
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    ev = ev.withColumn("us", F.unix_micros(F.col("ts").cast("timestamp")))
    wus = width * 1_000_000
    bucket = F.expr(f"(us - us % {wus}) div 1000000")
    actual = ev.groupBy(bucket.alias("b"), "event_type").agg(
        (
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double")
            / F.count("*")
        ).alias("v")
    )
    bounds = ev.agg(F.min(bucket).alias("lo"), F.max(bucket).alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.lit(width))).alias("b")
    ).crossJoin(F.broadcast(ev.select("event_type").distinct()))
    dense = spine.join(actual, ["b", "event_type"], "left")
    wp = Window.partitionBy("event_type").orderBy("b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wn = Window.partitionBy("event_type").orderBy("b").rowsBetween(
        1, Window.unboundedFollowing
    )
    ph = F.last(F.when(F.col("v").isNotNull(), F.col("b")), True).over(wp)
    pv = F.last("v", True).over(wp)
    nh = F.first(F.when(F.col("v").isNotNull(), F.col("b")), True).over(wn)
    nv = F.first("v", True).over(wn)
    interp = pv + (nv - pv) * (
        (F.col("b") - ph).cast("double") / (nh - ph).cast("double")
    )
    got = {
        (r["b"], r["event_type"]): r["f"]
        for r in dense.select(
            "b",
            "event_type",
            F.when(F.col("v").isNotNull(), F.col("v")).otherwise(interp).alias("f"),
        ).collect()
    }
    want = {
        (r[0], r[1]): r[2]
        for r in duck.sql(
            f"""
            WITH bounds AS (
                SELECT ({us} - ({us} % {wus})) // 1000000 AS lo_raw FROM events
            ),
            bb AS (SELECT MIN(lo_raw) AS lo, MAX(lo_raw) AS hi FROM bounds),
            spine AS (
                SELECT unnest(generate_series(lo, hi, {width})) AS b FROM bb
            ),
            types AS (SELECT DISTINCT event_type FROM events),
            actual AS (
                SELECT ({us} - ({us} % {wus})) // 1000000 AS b, event_type,
                       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                           / COUNT(*) AS v
                FROM events GROUP BY 1, 2
            ),
            dense AS (
                SELECT s.b, t.event_type, a.v
                FROM spine s CROSS JOIN types t
                LEFT JOIN actual a ON a.b = s.b AND a.event_type = t.event_type
            ),
            c AS (
                SELECT *,
                    LAST_VALUE(CASE WHEN v IS NOT NULL THEN b END IGNORE NULLS)
                        OVER (PARTITION BY event_type ORDER BY b
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                        AS ph,
                    LAST_VALUE(v IGNORE NULLS)
                        OVER (PARTITION BY event_type ORDER BY b
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                        AS pv,
                    FIRST_VALUE(CASE WHEN v IS NOT NULL THEN b END IGNORE NULLS)
                        OVER (PARTITION BY event_type ORDER BY b
                              ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                        AS nh,
                    FIRST_VALUE(v IGNORE NULLS)
                        OVER (PARTITION BY event_type ORDER BY b
                              ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                        AS nv
                FROM dense
            )
            SELECT b, event_type,
                   CASE WHEN v IS NOT NULL THEN v
                        ELSE pv + (nv - pv) * (CAST(b - ph AS DOUBLE)
                                               / CAST(nh - ph AS DOUBLE))
                   END
            FROM c
            """
        ).fetchall()
    }
    assert got == want


@given(
    dim=st.sampled_from([3, 7, 8, 16, 64]),
    thr=st.sampled_from([-0.6, -0.2, 0.0, 0.3, 0.45, 0.8, 0.97]),
    block_m=st.sampled_from([1, 2, 4]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_fuzz_gram_pairs_vs_bruteforce(spark, dim, thr, block_m, seed):
    """r11 kernel fuzz: for random corpora across dims, thresholds
    (incl. negative and ~1.0), and blocking widths, the f32-prefilter
    + minimal-shared-key-gated gram_pairs must emit EXACTLY the
    brute-force pair set over the same blocking, with bit-identical
    cosines (ground truth recomputed with the operator's own
    quantized arithmetic). Exercises the prefilter margin at every
    threshold sign, the gate's single-emission claim, and the tiling
    (max_bucket/chunk forced tiny)."""
    import numpy as np

    from gpu_olap_engine_spark.operators.similarity import (
        _near_dup_keyed,
        gram_pairs,
    )

    rng = np.random.RandomState(seed % 100000)
    n = 120
    vecs = rng.uniform(-1.5, 1.5, size=(n, dim))
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    keyed = _near_dup_keyed(df, "vec_id", "embedding", block_m)

    # ground truth: per-bucket pairs with exact quantized cosines
    q = np.floor(vecs.astype(np.float32).astype(np.float64) * 1e6)
    g = q @ q.T
    nrm = np.sqrt(np.diag(g))
    buckets: dict[int, list[int]] = {}
    for r in keyed.select("vid", "bkey").collect():
        buckets.setdefault(r["bkey"], []).append(r["vid"])
    want = {}
    for vs in buckets.values():
        vs = sorted(vs)
        for i in range(len(vs)):
            for j in range(i + 1, len(vs)):
                a, b = vs[i], vs[j]
                cos = g[a, b] / (nrm[a] * nrm[b])
                if cos >= thr:
                    want[(a, b)] = cos
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in gram_pairs(
            keyed, threshold=thr, max_bucket=16, chunk=8, block_rows=5
        ).collect()
    }
    assert got == want


@given(
    dim=st.sampled_from([2, 5, 8]),
    block_m=st.sampled_from([1, 3, 6]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_fuzz_near_dup_keyed_degenerate_parity(spark, dim, block_m, seed):
    """r12 ADVICE-hardening fuzz: the Arrow-vectorized keyed
    derivation must match the Catalyst spec form row-for-row on
    corpora salted with every degenerate shape the advice named —
    NULL vectors (incl. whole partitions of them), empty vectors,
    NaN dims (incl. rows with fewer finite dims than block_m, where
    NaN enters the top-m and Spark's NaN>0=true / floor(NaN)->0
    semantics bind), and RAGGED lengths (the per-length recursion
    path)."""
    import numpy as np

    from pyspark.sql import functions as F

    from gpu_olap_engine_spark.operators.similarity import (
        QSCALE,
        _near_dup_keyed,
        top_dim_keys,
    )

    rng = np.random.RandomState(seed % 100000)
    n = 60
    rows = []
    for i in range(n):
        r = rng.random()
        if r < 0.12:
            rows.append((i, None))
            continue
        if r < 0.2:
            rows.append((i, []))
            continue
        ln = dim + 2 if r < 0.35 else dim  # ragged mix
        v = rng.uniform(-1.5, 1.5, size=ln)
        if rng.random() < 0.4:  # NaN injection, sometimes all dims
            k = rng.randint(1, ln + 1)
            v[rng.choice(ln, size=k, replace=False)] = np.nan
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    got = {
        (r["vid"], r["bkey"]): (tuple(r["qvec"]), r["mlo"], r["mhi"])
        for r in _near_dup_keyed(df, "vec_id", "embedding", block_m).collect()
    }

    keys = top_dim_keys(F.col("embedding"), block_m)
    one = F.lit(1).cast("long")

    def shl(k):
        return F.call_function("shiftleft", one, k.cast("int"))

    cat = df.select(
        F.col("vec_id").alias("vid"),
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * QSCALE).cast("float"),
        ).alias("qvec"),
        keys.alias("tkeys"),
    ).select(
        "vid",
        "qvec",
        F.aggregate(
            F.filter(F.col("tkeys"), lambda k: k < 64),
            F.lit(0).cast("long"),
            lambda a, k: a.bitwiseOR(shl(k)),
        ).alias("mlo"),
        F.aggregate(
            F.filter(F.col("tkeys"), lambda k: k >= 64),
            F.lit(0).cast("long"),
            lambda a, k: a.bitwiseOR(shl(k - 64)),
        ).alias("mhi"),
        F.explode(F.col("tkeys")).alias("bkey"),
    )
    want = {
        (r["vid"], r["bkey"]): (tuple(r["qvec"]), r["mlo"], r["mhi"])
        for r in cat.collect()
    }
    assert got == want


@given(
    data=st.lists(
        st.tuples(
            st.sampled_from([2, 8, 31, 32, 64, 70, 80]),  # vector dim
            st.integers(min_value=0, max_value=2**32 - 1),  # value seed
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_fuzz_near_dup_masks_vs_python_reference(spark, data):
    """r13: the mask words (mlo/mhi) of _near_dup_keyed, fuzzed over
    ragged corpora mixing <=64-dim and wide rows, checked against an
    INDEPENDENT pure-Python formulation (plain ints, no numpy bit
    ops). Catches both the float64-upcast corruption fixed this round
    (valid rows in a mixed batch) and any key-set drift."""
    import numpy as np

    from gpu_olap_engine_spark.operators.similarity import (
        _near_dup_keyed,
    )

    m = 4
    rows, expect = [], {}
    for vid, (dim, seed) in enumerate(data):
        rng = np.random.RandomState(seed)
        vec = [float(x) for x in rng.uniform(-1.9, 1.9, size=dim)]
        rows.append((vid, vec))
        # independent reference: stable sort by (-|x|, dim), plain ints
        order = sorted(range(dim), key=lambda i: (-abs(vec[i]), i))[:m]
        keys = [2 * i + (1 if vec[i] > 0 else 0) for i in order]
        expect[vid] = keys
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).coalesce(1)  # one batch: mixed valid/wide rows share a batch

    got = {}
    for r in (
        _near_dup_keyed(df, "vec_id", "embedding", m)
        .select("vid", "mlo", "mhi", "bkey")
        .collect()
    ):
        got.setdefault(r["vid"], {"keys": set(), "mlo": r["mlo"],
                                  "mhi": r["mhi"]})
        got[r["vid"]]["keys"].add(r["bkey"])

    for vid, keys in expect.items():
        assert got[vid]["keys"] == set(keys)
        if max(keys) >= 128:
            assert got[vid]["mlo"] is None and got[vid]["mhi"] is None
        else:
            lo = sum(1 << k for k in keys if k < 64)
            hi = sum(1 << (k - 64) for k in keys if k >= 64)
            # two's-complement view of the unsigned word
            as_i64 = lambda u: u - (1 << 64) if u >= (1 << 63) else u
            assert got[vid]["mlo"] == as_i64(lo)
            assert got[vid]["mhi"] == as_i64(hi)
