"""Analytics completions: sliding windows (batch), full window-function
surface, histograms, moment-based statistics, correlated subqueries,
LATERAL VIEW.

Determinism notes: ranking functions get unique order keys;
percent_rank/cume_dist are exact rational divisions; stddev/corr are
computed FROM decimal-exact moment sums (the built-in accumulators are
order-dependent doubles and cannot be oracle-checked — the moment
formulation gives the same statistics deterministically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gpu_olap_engine_spark.queries import register
from gpu_olap_engine_spark.queries.tables import T, _view, dsum, o_dsum

_US = "epoch_us(CAST(ts AS TIMESTAMP))"


@register(
    "q56_sliding_window",
    oracle=f"""
    WITH shifted AS (
        SELECT event_type, value,
               ({_US} - ({_US} % 600000000)) / 1000000 AS b0
        FROM events
    ),
    assigned AS (
        SELECT event_type, CAST(b0 AS BIGINT) AS win_start FROM shifted
        UNION ALL
        SELECT event_type, CAST(b0 - 600 AS BIGINT) FROM shifted
    )
    SELECT win_start, event_type, COUNT(*) AS cnt
    FROM assigned GROUP BY 1, 2
    """,
)
def q56(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window, batch form: 20-minute windows sliding every 10
    minutes — each event belongs to exactly two windows (its 10-min
    bucket and the one before). F.window(slide) does the explosion
    internally; the oracle unions the two bucket assignments."""
    ev = T(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window(F.col("ts").cast("timestamp"), "20 minutes", "10 minutes").alias("w"),
            "event_type",
        )
        .agg(F.count("*").alias("cnt"))
        .select(
            F.col("w.start").cast("long").alias("win_start"),
            "event_type",
            "cnt",
        )
    )


@register(
    "q57_window_analytics",
    oracle="""
    WITH base AS (
        SELECT o_orderpriority, o_orderkey, o_totalprice FROM orders
        WHERE o_orderkey < 2000
    )
    SELECT o_orderpriority, o_orderkey,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume,
           CAST(FIRST_VALUE(o_orderkey) OVER w AS BIGINT) AS top_order,
           CAST(NTH_VALUE(o_orderkey, 2) OVER (
               PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS second_order
    FROM base
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def q57(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remaining ranking/analytic window functions: dense_rank, ntile,
    percent_rank, cume_dist, first_value, nth_value — all over a
    unique order key so both engines agree exactly (percent_rank and
    cume_dist are exact rationals). nth_value is nullable-int ->
    emitted as double (pandas-conversion rule)."""
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 2000)
        .select(
            "o_orderpriority",
            "o_orderkey",
            F.dense_rank().over(w).cast("long").alias("drnk"),
            F.ntile(4).over(w).cast("long").alias("quartile"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
            F.first("o_orderkey").over(frame).cast("long").alias("top_order"),
            F.nth_value("o_orderkey", 2).over(frame).cast("double").alias(
                "second_order"
            ),
        )
    )


@register(
    "q58_histogram",
    oracle="""
    SELECT CAST(least(floor((o_totalprice - 0) / 25000), 19) AS BIGINT) AS bucket,
           COUNT(*) AS cnt,
           MIN(o_totalprice) AS lo,
           MAX(o_totalprice) AS hi
    FROM orders GROUP BY 1
    """,
)
def q58(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (20 x 25k buckets, top-clamped): the
    single-pass distribution profile. floor of an exact double
    division — deterministic on both engines."""
    o = T(spark, sf_dir, "orders")
    bucket = F.least(F.floor((F.col("o_totalprice") - 0) / 25000), F.lit(19))
    return o.groupBy(bucket.cast("long").alias("bucket")).agg(
        F.count("*").alias("cnt"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    )


@register(
    "q59_stats_moments",
    oracle="""
    WITH m AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(floor(l_quantity * l_quantity * 100) AS BIGINT))
                    AS DOUBLE) / 100 AS sxx,
               CAST(SUM(CAST(floor(l_quantity * l_extendedprice * 100)
                    AS BIGINT)) AS DOUBLE) / 100 AS sxy
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           sx / n AS mean_qty,
           sqrt((sxx - sx * sx / n) / (n - 1)) AS stddev_qty,
           (sxy - sx * sy / n) / (n - 1) AS covar_qty_price
    FROM m
    """,
)
def q59(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistics via exact moment sums: mean, sample stddev, sample
    covariance derived from (n, Σx, Σy, Σx², Σxy). The built-in
    stddev/covar accumulate doubles in partition order and cannot
    match across engines; the moment formulation is the deterministic
    equivalent (and the distributed-friendly one — moments combine).
    Raw-column sums go through decimals; computed-product sums through
    integer quantization (1e-2 terms), per the engine's determinism
    rules (tables.py)."""
    li = T(spark, sf_dir, "lineitem")
    dec = lambda c: c.cast("decimal(18,4)")  # noqa: E731
    qty, price = F.col("l_quantity"), F.col("l_extendedprice")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(dec(qty)).cast("double").alias("sx"),
        F.sum(dec(price)).cast("double").alias("sy"),
        # decimal accumulators (q111's fix, same cliff): qty*price*100
        # is ~5e8 per row and the three returnflag groups are global,
        # so int64 wraps in the 100 TB regime; the oracle's plain
        # SUM(BIGINT) is exact HUGEINT.
        (
            F.sum(F.floor(qty * qty * 100).cast("decimal(20,0)")).cast(
                "double"
            )
            / 100
        ).alias("sxx"),
        (
            F.sum(F.floor(qty * price * 100).cast("decimal(20,0)")).cast(
                "double"
            )
            / 100
        ).alias("sxy"),
    )
    n = F.col("n")
    return m.select(
        "l_returnflag",
        "n",
        (F.col("sx") / n).alias("mean_qty"),
        F.sqrt((F.col("sxx") - F.col("sx") * F.col("sx") / n) / (n - 1)).alias(
            "stddev_qty"
        ),
        ((F.col("sxy") - F.col("sx") * F.col("sy") / n) / (n - 1)).alias(
            "covar_qty_price"
        ),
    )


@register(
    "q60_correlated_exists",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 490000
    )
    """,
)
def q60(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS subquery — Catalyst decorrelates it into a
    semi-join (RewriteCorrelatedScalarSubquery family; the reference
    has no subqueries at all, README.md:409)."""
    o = _view(T(spark, sf_dir, "orders"), "q60_orders")
    c = _view(T(spark, sf_dir, "customer"), "q60_customer")
    return spark.sql(
        f"""
        SELECT c_custkey, c_name FROM {c} c
        WHERE EXISTS (
            SELECT 1 FROM {o} o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 490000
        )
        """
    )


@register(
    "q61_lateral_view",
    oracle=r"""
    WITH w AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS words
        FROM documents WHERE doc_id < 20
    )
    SELECT doc_id, unnest(words) AS word FROM w
    """,
)
def q61(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW explode — the HiveQL-compatible SQL spelling of
    array explosion (SQL-dialect surface; the DataFrame spelling is
    exercised throughout)."""
    d = _view(
        T(spark, sf_dir, "documents").filter(F.col("doc_id") < 20), "q61_docs"
    )
    return spark.sql(
        f"""
        SELECT doc_id, word
        FROM {d}
        LATERAL VIEW explode(split(lower(trim(text)), '\\\\s+')) t AS word
        """
    )


@register(
    "q92_equi_depth_histogram",
    oracle=f"""
    WITH t AS (
        SELECT o_totalprice,
               NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
        FROM orders
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           COUNT(*) AS cnt,
           MIN(o_totalprice) AS lo,
           MAX(o_totalprice) AS hi,
           {o_dsum('o_totalprice')} AS total
    FROM t GROUP BY decile
    """,
)
def q92(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (percentile-bucketed) histogram via NTILE: ten
    equal-count buckets of the order-price distribution with their
    boundaries — the equi-DEPTH complement of q58's equi-width
    histogram, and the remaining window-function family (ntile) not
    exercised elsewhere. o_orderkey tiebreaks the total order so both
    engines assign identical bucket membership. Scale note: a global
    NTILE is a total sort into ONE window partition — correct here as
    the exact-parity form, but at 100 TB the cut points come from the
    approx-quantile sketch (q41) and bucket assignment becomes a
    narrow range lookup, no global window."""
    o = T(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    t = o.select("o_totalprice", F.ntile(10).over(w).alias("decile"))
    return t.groupBy(F.col("decile").cast("long").alias("decile")).agg(
        F.count("*").alias("cnt"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
        dsum("o_totalprice", "total"),
    )


@register(
    "q93_funnel_stages",
    oracle=f"""
    WITH e AS (
        SELECT event_id, user_id, event_type, {_US} AS us FROM events
    ),
    c AS (
        SELECT *,
            LAST_VALUE(CASE WHEN event_type = 'view' THEN us END
                       IGNORE NULLS) OVER (
                PARTITION BY user_id ORDER BY us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
            ) AS view_us,
            LAST_VALUE(CASE WHEN event_type = 'signup' THEN us END
                       IGNORE NULLS) OVER (
                PARTITION BY user_id ORDER BY us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
            ) AS signup_us
        FROM e
    )
    SELECT user_id, event_id AS purchase_id, signup_us, view_us,
           us - view_us AS view_to_purchase_us
    FROM c
    WHERE event_type = 'purchase'
      AND signup_us <= view_us
      AND us - view_us <= 86400000000
    """,
)
def q93(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel / sequence-pattern matching (signup -> view ->
    purchase, view within 24 h of the purchase): the product-analytics
    query class SQL spells MATCH_RECOGNIZE. Implemented as TWO
    last-ignoring-nulls carries over ONE per-user sort — each purchase
    row reads its latest preceding view and signup from the same
    window pass, so the whole three-stage funnel costs a single
    shuffle on user_id (the naive form is two self-joins). The
    signup <= view comparison encodes stage order without a third
    pass. At 100 TB the user_id partitioning is the same layout every
    other per-user operator here reuses."""
    from gpu_olap_engine_spark.queries.events import _with_us  # noqa: PLC0415

    ev = _with_us(T(spark, sf_dir, "events"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )

    def carry(typ: str):
        return F.last(
            F.when(F.col("event_type") == typ, F.col("us")), ignorenulls=True
        ).over(w)

    c = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "us",
        carry("view").alias("view_us"),
        carry("signup").alias("signup_us"),
    )
    return c.filter(
        (F.col("event_type") == "purchase")
        & (F.col("signup_us") <= F.col("view_us"))
        & (F.col("us") - F.col("view_us") <= 86_400_000_000)
    ).select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        "signup_us",
        "view_us",
        (F.col("us") - F.col("view_us")).alias("view_to_purchase_us"),
    )


@register(
    "q96_winsorize",
    oracle=f"""
    WITH t AS (
        SELECT event_type, value, event_id,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events
    ),
    b AS (
        SELECT event_type,
               MAX(CASE WHEN rn = (5 * n + 99) // 100 THEN value END) AS p05,
               MAX(CASE WHEN rn = (95 * n + 99) // 100 THEN value END) AS p95
        FROM t GROUP BY event_type
    )
    SELECT e.event_type, b.p05, b.p95,
           COUNT(CASE WHEN e.value < b.p05 THEN 1 END) AS n_low,
           COUNT(CASE WHEN e.value > b.p95 THEN 1 END) AS n_high,
           {o_dsum('least(greatest(e.value, b.p05), b.p95)')} / COUNT(*)
               AS winsorized_mean
    FROM events e JOIN b USING (event_type)
    GROUP BY e.event_type, b.p05, b.p95
    """,
)
def q96(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (clipped) statistics per group: exact discrete p05 /
    p95 cut points via the SQL-standard ceil(q*n) rank rule (computed
    explicitly with row_number so Spark and DuckDB share ONE
    definition — the engines' built-in percentile_disc/quantile_disc
    disagree on rank conventions), then outlier counts and the
    clipped mean. The outlier-robust preprocessing pass a feature
    pipeline runs before normalization. Scale: one shuffle on the
    group key for the rank pass (per-group sort, groups are
    independent), cut points are |groups| rows -> broadcast join back;
    at 100 TB swap the exact rank pass for the q41 quantile sketch,
    same downstream plan."""
    ev = T(spark, sf_dir, "events").select("event_type", "value", "event_id")
    wr = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    t = ev.select(
        "event_type",
        "value",
        F.row_number().over(wr).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    b = t.groupBy("event_type").agg(
        F.max(
            F.when(F.col("rn") == F.expr("(5 * n + 99) div 100"), F.col("value"))
        ).alias("p05"),
        F.max(
            F.when(F.col("rn") == F.expr("(95 * n + 99) div 100"), F.col("value"))
        ).alias("p95"),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95"))
    return (
        ev.join(F.broadcast(b), "event_type")
        .groupBy("event_type", "p05", "p95")
        .agg(
            F.count(F.when(F.col("value") < F.col("p05"), 1)).alias("n_low"),
            F.count(F.when(F.col("value") > F.col("p95"), 1)).alias("n_high"),
            (
                F.sum(clipped.cast("decimal(18,4)")).cast("double") / F.count("*")
            ).alias("winsorized_mean"),
        )
    )


@register(
    "q97_rolling_time_window",
    oracle=f"""
    SELECT event_id, user_id,
           {_US} // 1000000 AS ts_sec,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
               AS rolling_sum,
           COUNT(*) OVER w AS rolling_n
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY {_US} // 1000000
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
)
def q97(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity rolling ONE-HOUR aggregate via a RANGE window frame
    (value-based bounds on the epoch-second order key) — the
    time-range frame family, distinct from q56's hop-bucketed sliding
    window (fixed grid) and q20/q57's row-count frames: each row's
    frame is [its own timestamp - 3600 s, itself]. One shuffle on
    user_id; frame state is bounded by the time span, not the
    partition. The trailing-window feature a fraud/ops pipeline
    computes per account at 100 TB, with identical partitioning."""
    from gpu_olap_engine_spark.queries.events import _with_us  # noqa: PLC0415

    ev = _with_us(T(spark, sf_dir, "events"))
    sec = F.expr("us div 1000000")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts_sec"))
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "event_id", "user_id", sec.alias("ts_sec"), "value"
    ).select(
        "event_id",
        "user_id",
        "ts_sec",
        F.sum(F.col("value").cast("decimal(18,4)"))
        .over(w)
        .cast("double")
        .alias("rolling_sum"),
        F.count("*").over(w).alias("rolling_n"),
    )


@register(
    "q111_linear_regression",
    oracle="""
    WITH j AS (
        SELECT c.c_mktsegment AS segment, c.c_acctbal AS x,
               o.o_totalprice AS y
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    m AS (
        SELECT segment, COUNT(*) AS n,
               CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(y AS DECIMAL(18,4))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(floor(x * x * 100) AS BIGINT)) AS DOUBLE) / 100
                   AS sxx,
               CAST(SUM(CAST(floor(y * y * 100) AS BIGINT)) AS DOUBLE) / 100
                   AS syy,
               CAST(SUM(CAST(floor(x * y * 100) AS BIGINT)) AS DOUBLE) / 100
                   AS sxy
        FROM j GROUP BY segment
    )
    SELECT segment, n,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
           (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
               AS intercept,
           ((n * sxy - sx * sy) * (n * sxy - sx * sy))
               / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
    FROM m
    """,
)
def q111(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS regression family (regr_slope / regr_intercept / regr_r2)
    of order value against customer balance per market segment,
    derived from exact moment sums — the built-in regr_* aggregates
    accumulate doubles in partition order and cannot hash-match across
    engines; the moment formulation is deterministic AND the
    distributed-friendly one (moments combine associatively, exactly
    like q59's stddev/covar and q89's mergeable partials). Every
    division happens once, in the same literal expression order on
    both engines."""
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    j = o.join(c, o["o_custkey"] == c["c_custkey"]).select(
        F.col("c_mktsegment").alias("segment"),
        F.col("c_acctbal").alias("x"),
        F.col("o_totalprice").alias("y"),
    )
    x, y = F.col("x"), F.col("y")
    m = j.groupBy("segment").agg(
        F.count("*").alias("n"),
        F.sum(x.cast("decimal(18,4)")).cast("double").alias("sx"),
        F.sum(y.cast("decimal(18,4)")).cast("double").alias("sy"),
        # product moments sum in DECIMAL, not bigint: floor(y*y*100) is
        # ~2.5e13 per row (o_totalprice <= ~5e5), so a segment of >4e5
        # orders pushes the int64 sum past 2^63 -- Spark's non-ANSI sum
        # wraps silently while the DuckDB twin's SUM(BIGINT) promotes
        # to exact HUGEINT (caught by the sf10 value sweep as an r2
        # divergence). decimal(20,0) inputs sum exactly to 38 digits on
        # both engines; the double cast of the same exact integer is
        # bit-identical, so sub-overflow results are unchanged.
        (
            F.sum(F.floor(x * x * 100).cast("decimal(20,0)")).cast("double")
            / 100
        ).alias("sxx"),
        (
            F.sum(F.floor(y * y * 100).cast("decimal(20,0)")).cast("double")
            / 100
        ).alias("syy"),
        (
            F.sum(F.floor(x * y * 100).cast("decimal(20,0)")).cast("double")
            / 100
        ).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return m.select(
        "segment",
        "n",
        slope.alias("slope"),
        ((sy - slope * sx) / n).alias("intercept"),
        (
            ((n * sxy - sx * sy) * (n * sxy - sx * sy))
            / ((n * sxx - sx * sx) * (n * syy - sy * sy))
        ).alias("r2"),
    )


@register(
    "q112_gaps_islands",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id,
               date_diff('day', DATE '2024-01-01',
                         CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS d
        FROM events
    ),
    t AS (
        SELECT user_id, d,
               d - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS grp
        FROM days
    )
    SELECT user_id, CAST(MIN(d) AS BIGINT) AS start_day,
           CAST(MAX(d) AS BIGINT) AS end_day, COUNT(*) AS n_days
    FROM t GROUP BY user_id, grp
    """,
)
def q112(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of CONSECUTIVE active days per
    user, via the classic d - row_number() constant-per-island trick —
    one window pass + one aggregate, both on the user key (a single
    shuffle; island detection never compares rows pairwise). The
    retention/streak analysis every activity warehouse runs; days are
    integers from a fixed epoch so both engines group identically."""
    ev = T(spark, sf_dir, "events")
    days = (
        ev.select(
            "user_id",
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            ).alias("d"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    t = days.withColumn("grp", F.col("d") - F.row_number().over(w))
    return t.groupBy("user_id", "grp").agg(
        F.min("d").cast("long").alias("start_day"),
        F.max("d").cast("long").alias("end_day"),
        F.count("*").alias("n_days"),
    ).drop("grp")


@register(
    "q113_cohort_retention",
    oracle="""
    WITH act AS (
        SELECT DISTINCT user_id,
               date_diff('day', DATE '2024-01-01',
                         CAST(CAST(ts AS TIMESTAMP) AS DATE)) // 7 AS week
        FROM events
    ),
    cohort AS (SELECT user_id, MIN(week) AS cohort_week FROM act GROUP BY user_id)
    SELECT c.cohort_week, a.week - c.cohort_week AS week_offset,
           COUNT(DISTINCT a.user_id) AS n_users
    FROM act a JOIN cohort c USING (user_id)
    GROUP BY c.cohort_week, a.week - c.cohort_week
    """,
)
def q113(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-activity week,
    counted per week offset — the growth-analytics staple. Two
    aggregates on the user key plus one user-key join (the cohort
    relation is |users| rows, broadcastable far past 100 TB of
    events); weeks are integer arithmetic from a fixed epoch so both
    engines bucket identically."""
    ev = T(spark, sf_dir, "events")
    act = (
        ev.select(
            "user_id",
            F.expr(
                "datediff(cast(ts as date), date'2024-01-01') div 7"
            ).alias("week"),
        )
        .distinct()
    )
    cohort = act.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        act.join(cohort, "user_id")
        .groupBy(
            "cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset")
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@register(
    "q116_bucket_assign_scale",
    oracle="""
    WITH cuts AS (
        SELECT quantile_cont(o_totalprice,
                             [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])
               AS cs
        FROM orders
    ),
    assigned AS (
        SELECT o_totalprice,
               1 + len(list_filter(cs, c -> o_totalprice > c)) AS bucket
        FROM orders, cuts
    )
    SELECT CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS cnt,
           MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
    FROM assigned GROUP BY bucket
    """,
)
def q116(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of q92's equi-depth histogram, made concrete:
    NINE cut points (continuous deciles — the q64-proven
    percentile/quantile_cont parity) broadcast as one row, and bucket
    assignment becomes a narrow per-row lookup (count of cut points
    below the value) — NO global NTILE sort window anywhere in the
    plan. At scale the cut points come from the q41 sketch instead of
    the exact percentile; the assignment side — the expensive part —
    is already the scan-shaped narrow pass shown here. Bucket
    populations are approximately equal (boundary ties stay low),
    which is exactly the sketch-path semantics."""
    o = T(spark, sf_dir, "orders")
    cuts = o.agg(
        F.expr(
            "percentile(o_totalprice,"
            " array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D))"
        ).alias("cs")
    )
    assigned = o.crossJoin(F.broadcast(cuts)).select(
        "o_totalprice",
        (
            F.lit(1)
            + F.size(F.filter("cs", lambda c: F.col("o_totalprice") > c))
        ).cast("long").alias("bucket"),
    )
    return assigned.groupBy("bucket").agg(
        F.count("*").alias("cnt"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    )


@register(
    "q122_feature_scaling",
    oracle="""
    WITH m AS (
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(floor(value * value * 100) AS BIGINT)) AS DOUBLE)
                   / 100 AS sxx,
               MIN(value) AS lo,
               MAX(value) AS hi
        FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           (e.value - m.sx / m.n)
               / sqrt((m.sxx - m.sx * m.sx / m.n) / (m.n - 1)) AS zscore,
           (e.value - m.lo) / (m.hi - m.lo) AS minmax01
    FROM events e JOIN m USING (event_type)
    """,
)
def q122(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level feature scaling — the ML-preprocessing pass that
    standardizes a column per group: z-score from decimal-exact moment
    sums (q59's technique, here producing PER-ROW output) and min-max
    [0,1] normalization, in one broadcast join of |groups| statistic
    rows back onto the fact. Every arithmetic step is written in the
    identical operation order on both engines. At 100 TB this is a
    scan + broadcast — the statistics pass and the scaling pass never
    shuffle the fact table."""
    ev = T(spark, sf_dir, "events")
    m = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sx"),
        # decimal accumulator (q111's cliff): value^2*100 per row over
        # a whole event type's rows outgrows int64 at corpus scale.
        (
            F.sum(
                F.floor(F.col("value") * F.col("value") * 100).cast(
                    "decimal(20,0)"
                )
            )
            .cast("double")
            / 100
        ).alias("sxx"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    z = (F.col("value") - sx / n) / F.sqrt((sxx - sx * sx / n) / (n - 1))
    mm = (F.col("value") - F.col("lo")) / (F.col("hi") - F.col("lo"))
    return (
        ev.join(F.broadcast(m), "event_type")
        .select(
            "event_id",
            "event_type",
            z.alias("zscore"),
            mm.alias("minmax01"),
        )
    )


@register(
    "q139_sliding_distinct_users",
    oracle=f"""
    WITH shifted AS (
        SELECT user_id,
               ({_US} - ({_US} % 600000000)) / 1000000 AS b0
        FROM events
    ),
    assigned AS (
        SELECT user_id, CAST(b0 AS BIGINT) AS win_start FROM shifted
        UNION ALL
        SELECT user_id, CAST(b0 - 600 AS BIGINT) FROM shifted
    )
    SELECT win_start, COUNT(DISTINCT user_id) AS n_users
    FROM assigned GROUP BY win_start
    """,
)
def q139(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling active users: COUNT(DISTINCT user_id) per 20-minute
    window sliding every 10 — the duplicate-SENSITIVE sliding
    aggregate (q56 counts rows; a user active in both halves of a
    window must count once here, so the partial sums of adjacent
    buckets cannot simply be added). Spark's two-phase distinct
    (partial dedup on (window, user) before the count shuffle) keeps
    it one logical pass; at 100 TB swap the exact distinct for q40's
    HLL sketch per window — this entry is the exact twin that gates
    that path."""
    ev = T(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window(F.col("ts").cast("timestamp"), "20 minutes", "10 minutes").alias("w")
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
        .select(F.col("w.start").cast("long").alias("win_start"), "n_users")
    )


@register(
    "q145_cumulative_uniques",
    oracle=f"""
    WITH firsts AS (
        SELECT user_id,
               MIN(CAST(({_US} - ({_US} % 86400000000)) / 1000000 AS BIGINT))
                   AS first_day
        FROM events GROUP BY user_id
    ),
    per_day AS (
        SELECT first_day AS day, COUNT(*) AS new_users
        FROM firsts GROUP BY first_day
    )
    SELECT day, new_users,
           CAST(SUM(new_users) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cumulative_users
    FROM per_day
    """,
)
def q145(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative unique users by day — the growth curve every
    product dashboard opens with. Each user collapses to their
    first-seen day (one aggregate), days roll up to new-user counts
    (tiny), and the running total is a window over |days| rows — so
    the expensive distinct happens ONCE as a user-keyed aggregate,
    never per-day (the naive per-day COUNT(DISTINCT ... WHERE ts <=
    day) rescans the fact table |days| times). All integer: epoch
    days and counts."""
    from gpu_olap_engine_spark.queries.events import _with_us  # noqa: PLC0415

    ev = _with_us(T(spark, sf_dir, "events"))
    day = ((F.col("us") - F.col("us") % 86_400_000_000) / 1_000_000).cast("long")
    firsts = ev.select("user_id", day.alias("day")).groupBy("user_id").agg(
        F.min("day").alias("first_day")
    )
    per_day = firsts.groupBy(F.col("first_day").alias("day")).agg(
        F.count("*").alias("new_users")
    )
    w = (
        Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return per_day.select(
        "day", "new_users", F.sum("new_users").over(w).alias("cumulative_users")
    )


# Interval half-width for q146's synthetic sessions (microseconds).
_SESS_HALF_US = 900_000_000  # 15 minutes


@register(
    "q146_interval_union_length",
    oracle=f"""
    WITH iv AS (
        SELECT user_id, {_US} AS s, {_US} + {_SESS_HALF_US} AS e
        FROM events
    ),
    marked AS (
        SELECT user_id, s, e,
               CASE WHEN s > MAX(e) OVER (
                        PARTITION BY user_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    OR MAX(e) OVER (
                        PARTITION BY user_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       IS NULL
                    THEN 1 ELSE 0 END AS is_new_island
        FROM iv
    ),
    islands AS (
        SELECT user_id, s, e,
               SUM(is_new_island) OVER (
                   PARTITION BY user_id ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS island
        FROM marked
    ),
    merged AS (
        SELECT user_id, island, MIN(s) AS ms, MAX(e) AS me
        FROM islands GROUP BY user_id, island
    )
    SELECT user_id,
           COUNT(*) AS n_intervals,
           CAST(SUM(me - ms) AS BIGINT) AS covered_us
    FROM merged GROUP BY user_id
    """,
)
def q146(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user interval-union coverage: each event opens a 15-minute
    activity interval; overlapping intervals merge and the TOTAL
    covered time is reported — the active-time / SLA-coverage /
    sensor-uptime primitive where naive SUM(length) double-counts
    overlaps. Classic sweep: an interval starts a new island iff its
    start exceeds the running MAX(end) of everything before it; the
    island id is the running sum of those starts; islands collapse to
    [min(start), max(end)]. ONE shuffle on user_id, two window passes
    over the same sort, exact integer microseconds throughout."""
    from gpu_olap_engine_spark.queries.events import _with_us  # noqa: PLC0415

    ev = _with_us(T(spark, sf_dir, "events"))
    iv = ev.select(
        "user_id",
        F.col("us").alias("s"),
        (F.col("us") + F.lit(_SESS_HALF_US)).alias("e"),
    )
    wprev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_max_e = F.max("e").over(wprev)
    marked = iv.withColumn(
        "is_new_island",
        F.when(
            prev_max_e.isNull() | (F.col("s") > prev_max_e), 1
        ).otherwise(0),
    )
    islands = marked.withColumn("island", F.sum("is_new_island").over(wrun))
    merged = islands.groupBy("user_id", "island").agg(
        F.min("s").alias("ms"), F.max("e").alias("me")
    )
    return merged.groupBy("user_id").agg(
        F.count("*").alias("n_intervals"),
        F.sum(F.col("me") - F.col("ms")).cast("long").alias("covered_us"),
    )


@register(
    "q148_share_of_parent",
    oracle="""
    WITH rev AS (
        SELECT r.r_name AS region, n.n_name AS nation,
               SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS rev
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, n.n_name
    ),
    tot AS (
        SELECT region, SUM(rev) AS region_rev FROM rev GROUP BY region
    )
    SELECT rev.region, rev.nation,
           CAST(rev.rev AS DOUBLE) AS nation_rev,
           CAST(floor(1000000.0 * (CAST(rev.rev AS DOUBLE)
                                   / CAST(tot.region_rev AS DOUBLE)))
                AS BIGINT) AS share_ppm
    FROM rev JOIN tot USING (region)
    """,
)
def q148(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-parent contribution analysis: each nation's revenue as
    an exact-ppm share of its region's total — the drill-down ratio
    every OLAP contribution report computes. Revenue accumulates in
    DECIMAL(18,4) (order-independent exact sums, the repo convention);
    the share is floor(1e6 * (rev/total)) over the two decimal-exact
    sums widened to double — one correctly-rounded IEEE divide and
    multiply, identical bits on both engines at any scale (a decimal
    floor-division would hit Spark's scale-6 HALF_UP quotient
    rounding). The parent totals ride a window over
    the already-aggregated |nation| rows — no second scan of the fact
    table, and the single fact shuffle is the group-by itself (the
    dimension chain broadcasts)."""
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region")
    rev = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(n, c["c_nationkey"] == n["n_nationkey"])
        .join(r, n["n_regionkey"] == r["r_regionkey"])
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("rev"))
    )
    wreg = Window.partitionBy("region")
    return rev.select(
        "region",
        "nation",
        F.col("rev").cast("double").alias("nation_rev"),
        F.floor(
            F.lit(1000000.0)
            * (
                F.col("rev").cast("double")
                / F.sum("rev").over(wreg).cast("double")
            )
        ).cast("long").alias("share_ppm"),
    )


@register(
    "q149_rolling_median",
    oracle=f"""
    SELECT user_id, event_id,
           quantile_cont(value, 0.5) OVER (
               PARTITION BY user_id
               ORDER BY {_US}, event_id
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
           ) AS rolling_med
    FROM events
    WHERE user_id < 100
    """,
)
def q149(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling median — the robust time-series smoother a mean-based
    moving average cannot replace under spikes: interpolated median
    over a 7-row trailing frame per user timeline. Both engines run
    the SAME continuous-quantile definition as a true window
    aggregate (the q64-proven percentile/quantile_cont pairing), so
    the interpolated values match bit-for-bit. One shuffle on
    user_id; the per-frame sort state is bounded by the 7-row frame,
    so the 100 TB cost is the same single exchange as any per-key
    window."""
    from gpu_olap_engine_spark.queries.events import _with_us  # noqa: PLC0415

    ev = _with_us(T(spark, sf_dir, "events").filter(F.col("user_id") < 100))
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.expr("percentile(value, 0.5)")
        .over(w)
        .alias("rolling_med"),
    )


@register(
    "q150_rfm_segments",
    oracle="""
    WITH per_cust AS (
        SELECT o_custkey,
               MAX(CAST(o_orderdate AS DATE)) AS last_order,
               COUNT(*) AS frequency,
               SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS monetary
        FROM orders GROUP BY o_custkey
    ),
    scored AS (
        SELECT o_custkey, frequency,
               CAST(monetary AS DOUBLE) AS monetary,
               CAST(NTILE(5) OVER (ORDER BY last_order, o_custkey)
                    AS BIGINT) AS r_score,
               CAST(NTILE(5) OVER (ORDER BY frequency, o_custkey)
                    AS BIGINT) AS f_score,
               CAST(NTILE(5) OVER (ORDER BY monetary, o_custkey)
                    AS BIGINT) AS m_score
        FROM per_cust
    )
    SELECT r_score, f_score, m_score,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(monetary AS DECIMAL(18,4))) AS DOUBLE)
               AS segment_value
    FROM scored GROUP BY r_score, f_score, m_score
    """,
)
def q150(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the marketing-analytics staple: per customer
    recency (last order date), frequency (order count), monetary
    (decimal-exact spend), each scored into quintiles by NTILE over a
    unique (metric, custkey) order so both engines tile identically,
    then the 125-cell segment grid with customer counts and value.
    The fact table shuffles ONCE (the per-customer aggregate); the
    three NTILEs ride over the much smaller customer relation. At
    100 TB swap the global NTILE for q116's broadcast-cut-points
    form — this entry is the exact twin that gates that swap."""
    o = T(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_order"),
        F.count("*").alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("monetary"),
    )
    scored = per_cust.select(
        "o_custkey",
        "frequency",
        F.col("monetary").cast("double").alias("monetary"),
        F.ntile(5)
        .over(Window.orderBy("last_order", "o_custkey"))
        .cast("long")
        .alias("r_score"),
        F.ntile(5)
        .over(Window.orderBy("frequency", "o_custkey"))
        .cast("long")
        .alias("f_score"),
        F.ntile(5)
        .over(Window.orderBy("monetary", "o_custkey"))
        .cast("long")
        .alias("m_score"),
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count("*").alias("n_customers"),
        F.sum(F.col("monetary").cast("decimal(18,4)"))
        .cast("double")
        .alias("segment_value"),
    )


@register(
    "q174_max_drawdown",
    oracle="""
    WITH d AS (
        SELECT o_custkey,
               CAST(floor(o_totalprice * 100) AS BIGINT)
                 * (CASE WHEN o_orderstatus = 'F' THEN 1 ELSE -1 END)
                   AS delta_cents,
               o_orderdate, o_orderkey
        FROM orders
    ),
    r AS (
        SELECT o_custkey, delta_cents, o_orderdate, o_orderkey,
               SUM(delta_cents) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS UNBOUNDED PRECEDING
               ) AS run
        FROM d
    ),
    s AS (
        SELECT o_custkey, delta_cents, run,
               MAX(run) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS UNBOUNDED PRECEDING
               ) AS peak
        FROM r
    )
    SELECT o_custkey,
           CAST(SUM(delta_cents) AS BIGINT) AS net_cents,
           CAST(MAX(peak - run) AS BIGINT) AS max_drawdown_cents
    FROM s GROUP BY o_custkey
    """,
)
def q174(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per customer over their signed order ledger
    ('F' orders credit, others debit, exact cents): the largest
    peak-to-trough drop of the running balance — the risk/health
    metric behind churn and credit review. Drawdown is windows-only:
    running sum, running max OF the running sum (a nested frame over
    the same (customer, date, orderkey) order — ONE exchange feeds
    both), then max(peak - run) per customer. No iteration, no
    self-join, integer-exact on both engines. Same shape at any
    scale: one customer-keyed sort-window pass plus the final
    aggregate."""
    o = T(spark, sf_dir, "orders")
    d = o.select(
        "o_custkey",
        (
            F.floor(F.col("o_totalprice") * 100).cast("long")
            * F.when(F.col("o_orderstatus") == "F", 1).otherwise(-1)
        ).alias("delta_cents"),
        "o_orderdate",
        "o_orderkey",
    )
    w = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    ).rowsBetween(Window.unboundedPreceding, 0)
    s = (
        d.withColumn("run", F.sum("delta_cents").over(w))
        .withColumn("peak", F.max("run").over(w))
        .select("o_custkey", "delta_cents", "run", "peak")
    )
    return s.groupBy("o_custkey").agg(
        F.sum("delta_cents").alias("net_cents"),
        F.max(F.col("peak") - F.col("run")).alias("max_drawdown_cents"),
    )


@register(
    "q175_lag1_autocorr",
    oracle="""
    WITH day AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 // 100000 AS rev
        FROM orders GROUP BY 1
    ),
    pairs AS (
        SELECT LAG(rev) OVER (ORDER BY d) AS x, rev AS y FROM day
    ),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy,
               CAST(SUM(x * y) AS BIGINT) AS sxy
        FROM pairs WHERE x IS NOT NULL
    )
    SELECT n,
           (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
               AS lag1_r
    FROM m
    """,
)
def q175(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of the daily-revenue series: Pearson r
    over (yesterday, today) pairs — the momentum/seasonality
    screen before fitting any forecast. Determinism: the series is
    exact integer THOUSANDS of dollars (cent sums floor-divided by
    1e5 — squared-daily-revenue moments overflow int64 at the ~sf1
    replica in raw dollars; measured, hence the unit), all five
    moments are exact int64 sums of integer products, and the single
    float expression (one division, one sqrt) is written in the same
    literal order on both engines — IEEE 754 requires sqrt to be
    correctly rounded (unlike log/exp), so the result is bit-stable.
    Plan: one group-by on day, one 1-partition LAG over the
    |days|-sized relation, one 1-row moment aggregate. The unit keeps
    moments under int64 through ~1e12-dollar days x 10k days; past
    that, floor-divide to millions (same swap)."""
    o = T(spark, sf_dir, "orders")
    day = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.expr(
            "SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) DIV 100000"
        ).alias("rev")
    )
    pairs = day.select(
        F.lag("rev").over(Window.orderBy("d")).alias("x"),
        F.col("rev").alias("y"),
    ).filter(F.col("x").isNotNull())
    m = pairs.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    return m.select(
        "n",
        (
            (n * F.col("sxy") - sx * F.col("sy"))
            / F.sqrt(
                (n * F.col("sxx") - sx * F.col("sx"))
                * (n * F.col("syy") - sy * F.col("sy"))
            )
        ).alias("lag1_r"),
    )
