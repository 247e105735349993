"""Data-audit and behavioral-analytics completions: column profiling,
navigation paths, digit-distribution audit, weighted median,
day-over-day retention overlap.

The reference engine's surface stops at single-SELECT aggregates
(reference parser.rs:24-31); these are the composed audit/quality
reports a warehouse team runs on top of that surface, re-expressed as
single Spark jobs with DuckDB oracle twins. All ratio columns follow
the repo convention: exact integer ppm via floor division, CAST to
BIGINT on the oracle side (DuckDB SUM promotes to HUGEINT, which
would land in pandas as float64 and fail the driver's
representation-sensitive hash — round-6 lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gpu_olap_engine_spark.queries import register
from gpu_olap_engine_spark.queries.tables import T

_US = "epoch_us(CAST(ts AS TIMESTAMP))"

_PROFILE_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


def _profile_oracle() -> str:
    aggs = ", ".join(
        f"COUNT({c}) AS nn_{c}, COUNT(DISTINCT {c}) AS nd_{c}"
        for c in _PROFILE_COLS
    )
    arms = "\nUNION ALL\n".join(
        f"SELECT '{c}' AS column_name, n AS n_rows, n - nn_{c} AS n_null, "
        f"nd_{c} AS n_distinct FROM t"
        for c in _PROFILE_COLS
    )
    return f"WITH t AS (SELECT COUNT(*) AS n, {aggs} FROM orders)\n{arms}"


@register("q152_profile_columns", oracle=_profile_oracle())
def q152(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profile audit: one row per column of `orders` with row,
    null, and exact distinct counts — the schema-drift / data-quality
    report a pipeline runs before accepting a new drop. ONE pass over
    the fact table: all per-column counts ride a single aggregate
    (Catalyst plans the multi-distinct via Expand — column-count-many
    partial aggregates in one scan, no per-column rescan like the
    naive UNION ALL the oracle spells out), then a stack() unpivots
    the 1-row result driver-side. At 100 TB the expensive exact
    distincts can swap to approx_count_distinct per column without
    changing the shape; this entry is the exact twin that gates it.
    All counts are int64 on both engines."""
    o = T(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in _PROFILE_COLS:
        aggs.append(F.count(c).alias(f"nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
    one = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', nn_{c}, nd_{c}" for c in _PROFILE_COLS
    )
    return one.selectExpr(
        "n",
        f"stack({len(_PROFILE_COLS)}, {stack_args})"
        " AS (column_name, nn, n_distinct)",
    ).select(
        "column_name",
        F.col("n").alias("n_rows"),
        (F.col("n") - F.col("nn")).alias("n_null"),
        "n_distinct",
    )


@register(
    "q153_session_paths",
    oracle=f"""
    WITH r AS (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY {_US}, event_id
               ) AS rn
        FROM events
    ),
    p AS (
        SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
        FROM r WHERE rn <= 5 GROUP BY user_id
    )
    SELECT path, COUNT(*) AS n_users
    FROM p GROUP BY path
    ORDER BY n_users DESC, path
    LIMIT 20
    """,
)
def q153(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top navigation paths: each user's first five events (by time,
    event_id tie-break) joined into a '>'-separated journey string,
    ranked by how many users share the exact prefix — the product
    funnel-discovery report. One shuffle on user_id covers BOTH the
    ranking window and the per-user path assembly; the path
    frequency table is tiny (|event_types|^5 worst case) and its
    top-20 is a TakeOrdered, never a full sort. Paths assemble from
    array_sort over (rn, type) structs — rn is unique per user, so
    the order is total and both engines emit identical strings."""
    from gpu_olap_engine_spark.queries.events import _with_us  # noqa: PLC0415

    ev = _with_us(T(spark, sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    r = (
        ev.select(
            "user_id", "event_type", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") <= 5)
    )
    paths = r.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_users"))
        .orderBy(F.desc("n_users"), "path")
        .limit(20)
    )


@register(
    "q154_benford_digits",
    oracle="""
    WITH d AS (
        SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                AS VARCHAR), 1, 1) AS BIGINT) AS digit
        FROM orders WHERE o_totalprice >= 1
    ),
    c AS (SELECT digit, COUNT(*) AS cnt FROM d GROUP BY digit)
    SELECT digit, cnt,
           CAST((1000000::HUGEINT * cnt) // (SELECT SUM(cnt) FROM c) AS BIGINT)
               AS ppm
    FROM c
    """,
)
def q154(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit: the distribution of the leading
    significant digit of order totals in exact integer ppm — the
    classic anomaly screen for fabricated or truncated monetary data.
    The digit extraction is pure JVM string/math expressions (floor ->
    int64 -> leading char), the aggregate is 9 groups, and the
    normalizing total rides a window over those 9 rows: one scan, one
    tiny shuffle, nothing driver-side. Integer floor-division ppm
    keeps both engines bit-identical."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = o.select(
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("digit")
    )
    c = d.groupBy("digit").agg(F.count("*").alias("cnt"))
    return c.select(
        "digit",
        "cnt",
        F.expr(
            "(1000000 * CAST(cnt AS DECIMAL(20,0))) DIV sum(cnt) OVER ()"
        ).alias("ppm"),
    )


@register(
    "q155_weighted_median",
    oracle="""
    WITH w AS (
        SELECT l_returnflag AS flag, l_extendedprice AS price,
               CAST(l_quantity AS BIGINT) AS wt,
               l_orderkey, l_linenumber
        FROM lineitem
    ),
    c AS (
        SELECT flag, price,
               SUM(wt) OVER (
                   PARTITION BY flag
                   ORDER BY price, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum,
               SUM(wt) OVER (PARTITION BY flag) AS tot
        FROM w
    )
    SELECT flag, MIN(price) AS weighted_median
    FROM c WHERE 2 * cum >= tot GROUP BY flag
    """,
)
def q155(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per return flag: the smallest
    price whose cumulative quantity reaches half the total — the
    inventory-weighted robust center an unweighted median (q149) gets
    wrong when line items carry different volumes. Weights are exact
    int64 (quantities are integral), the cumulative and total sums
    ride two frames of ONE window shuffle on the group key, and the
    threshold pick is MIN over the qualifying suffix — when the
    half-weight boundary lands inside a run of equal prices the
    answer is that price regardless of intra-run order, so the result
    is deterministic without a unique sort key. Output is the price
    value itself (double, bit-identical both engines)."""
    li = T(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_quantity").cast("long").alias("wt"),
        "l_orderkey",
        "l_linenumber",
    )
    wcum = (
        Window.partitionBy("flag")
        .orderBy("price", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("flag")
    c = li.select(
        "flag",
        "price",
        F.sum("wt").over(wcum).alias("cum"),
        F.sum("wt").over(wall).alias("tot"),
    )
    return (
        c.filter(2 * F.col("cum") >= F.col("tot"))
        .groupBy("flag")
        .agg(F.min("price").alias("weighted_median"))
    )


@register(
    "q156_retention_overlap",
    oracle=f"""
    WITH du AS (
        SELECT DISTINCT {_US} // 86400000000 AS day, user_id FROM events
    ),
    cnt AS (SELECT day, COUNT(*) AS n FROM du GROUP BY day),
    inter AS (
        SELECT a.day AS day, COUNT(*) AS n_both
        FROM du a JOIN du b
          ON b.user_id = a.user_id AND b.day = a.day + 1
        GROUP BY a.day
    )
    SELECT c1.day AS day, c1.n AS n_day, c2.n AS n_next,
           COALESCE(i.n_both, 0) AS n_both,
           CAST((1000000::HUGEINT * COALESCE(i.n_both, 0))
                // (c1.n + c2.n - COALESCE(i.n_both, 0)) AS BIGINT)
               AS jaccard_ppm
    FROM cnt c1
    JOIN cnt c2 ON c2.day = c1.day + 1
    LEFT JOIN inter i ON i.day = c1.day
    """,
)
def q156(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day retention overlap: for each consecutive day pair,
    the active-user intersection size and Jaccard similarity in exact
    integer ppm — the churn-vs-stickiness curve. The oracle spells
    the textbook self-join of daily user sets; the Spark plan avoids
    it: after the ONE (day, user) distinct, a lag() over each user's
    sorted day list marks day-over-day continuations, so the
    intersection size is a per-day SUM of those marks — one scan,
    three exchanges over the big relation (distinct, user window,
    day aggregate) instead of a recomputed self-join. The final
    pairing of consecutive days is a lead() over the |days|-sized
    aggregate (tiny single-partition window, not a self-join).
    Integer epoch-day bucketing (BIGINT floor division) and integer
    Jaccard keep every output column int64 on both engines."""
    from gpu_olap_engine_spark.queries.events import _with_us  # noqa: PLC0415

    ev = _with_us(T(spark, sf_dir, "events"))
    du = ev.select(
        F.expr("us DIV 86400000000").alias("day"), "user_id"
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    marked = du.withColumn("prev", F.lag("day").over(w))
    per_day = marked.groupBy("day").agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(F.col("prev") == F.col("day") - 1, 1).otherwise(0)
        ).cast("long").alias("nb"),
    )
    # pair consecutive days via lead() over the |days|-sized aggregate
    # (single-partition window over a tiny relation — NOT the fact
    # table) so the per_day subtree exists once in the plan instead of
    # being duplicated by a self-join
    wd = Window.orderBy("day")
    return (
        per_day.select(
            "day",
            F.col("n").alias("n_day"),
            F.lead("day").over(wd).alias("next_day"),
            F.lead("n").over(wd).alias("n_next"),
            F.lead("nb").over(wd).alias("n_both"),
        )
        .filter(F.col("next_day") == F.col("day") + 1)
        .select(
            "day",
            "n_day",
            "n_next",
            "n_both",
            F.expr(
                "(1000000 * CAST(n_both AS DECIMAL(20,0)))"
                " DIV (n_day + n_next - n_both)"
            ).alias("jaccard_ppm"),
        )
    )


@register(
    "q157_sla_latency",
    oracle="""
    WITH fs AS (
        SELECT l_orderkey, MIN(l_shipdate) AS first_ship
        FROM lineitem GROUP BY l_orderkey
    ),
    d AS (
        SELECT o.o_orderpriority AS priority,
               (epoch_us(CAST(fs.first_ship AS TIMESTAMP))
                - epoch_us(CAST(o.o_orderdate AS TIMESTAMP)))
               // 86400000000 AS delay_days
        FROM orders o JOIN fs ON fs.l_orderkey = o.o_orderkey
    )
    SELECT priority, COUNT(*) AS n_orders,
           quantile_cont(delay_days, 0.5) AS p50_days,
           quantile_cont(delay_days, 0.95) AS p95_days
    FROM d GROUP BY priority
    """,
)
def q157(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-fulfilment SLA: days from order placement to FIRST line
    shipment, summarized as p50/p95 per order priority — the
    operational latency report. The lineitem side collapses to one
    row per order BEFORE the join (MIN pre-aggregation, so the join
    input is |orders|-sized on both sides and co-partitions on the
    order key — one shuffle pair, AQE-coalesced), delays are exact
    integer day counts (epoch-microsecond floor division), and the
    percentile runs per priority over those integers with the
    q64-proven continuous-quantile pairing (identical interpolation
    both engines)."""
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    fs = li.groupBy("l_orderkey").agg(F.min("l_shipdate").alias("first_ship"))
    d = o.join(fs, o["o_orderkey"] == fs["l_orderkey"]).select(
        F.col("o_orderpriority").alias("priority"),
        F.expr(
            "(unix_micros(CAST(first_ship AS TIMESTAMP))"
            " - unix_micros(CAST(o_orderdate AS TIMESTAMP)))"
            " DIV 86400000000"
        ).alias("delay_days"),
    )
    return d.groupBy("priority").agg(
        F.count("*").alias("n_orders"),
        F.expr("percentile(delay_days, 0.5)").alias("p50_days"),
        F.expr("percentile(delay_days, 0.95)").alias("p95_days"),
    )


@register(
    "q158_ngram_diversity",
    oracle=r"""
    WITH w AS (
        SELECT doc_id,
               string_split_regex(lower(trim(text)), '\s+') AS words
        FROM documents
    ),
    g AS (
        SELECT doc_id,
               list_transform(range(1, len(words) - 2),
                              i -> array_to_string(words[i:i+3], ' '))
                   AS grams
        FROM w WHERE len(words) >= 4
    )
    SELECT doc_id,
           CAST(len(grams) AS BIGINT) AS n_grams,
           CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
           CAST((1000000 * len(list_distinct(grams))) // len(grams)
                AS BIGINT) AS diversity_ppm
    FROM g
    """,
)
def q158(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-4-gram diversity per document: distinct-to-total shingle
    ratio in exact integer ppm — the cheap compression-ratio proxy
    LLM data curation uses to catch boilerplate and template spam
    (low diversity = repetitive text; the Gopher-rule companion to
    q69's repetition runs). Entirely per-row array expressions inside
    whole-stage codegen: tokenize -> slide a 4-window -> count raw vs
    array_distinct — NO explode, NO shuffle, perfectly parallel at
    100 TB. Docs under 4 tokens are excluded (no gram exists)."""
    from gpu_olap_engine_spark.operators.dedup import tokenize  # noqa: PLC0415
    from gpu_olap_engine_spark.queries.tables import spread  # noqa: PLC0415

    docs = spread(T(spark, sf_dir, "documents"))
    d = docs.select("doc_id", tokenize(F.col("text")).alias("words")).filter(
        F.size("words") >= 4
    )
    g = d.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(1), F.size("words") - 3),
            lambda i: F.concat_ws(" ", F.slice("words", i, 4)),
        ).alias("grams"),
    )
    return g.select(
        "doc_id",
        F.size("grams").cast("long").alias("n_grams"),
        F.size(F.array_distinct("grams")).cast("long").alias("n_distinct"),
        F.expr(
            "CAST((1000000 * size(array_distinct(grams)))"
            " DIV size(grams) AS BIGINT)"
        ).alias("diversity_ppm"),
    )


@register(
    "q159_new_vs_returning",
    oracle=f"""
    WITH du AS (
        SELECT DISTINCT {_US} // 86400000000 AS day, user_id FROM events
    ),
    f AS (
        SELECT day,
               MIN(day) OVER (PARTITION BY user_id) AS first_day
        FROM du
    )
    SELECT day,
           CAST(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END)
                AS BIGINT) AS n_new,
           CAST(SUM(CASE WHEN day > first_day THEN 1 ELSE 0 END)
                AS BIGINT) AS n_returning
    FROM f GROUP BY day
    """,
)
def q159(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users decomposed into new vs returning — the DAU
    growth-quality split every product dashboard pairs with q145's
    cumulative curve. Same single-pass shape as q156: ONE (day, user)
    distinct of the fact table, a per-user window carries each user's
    first-seen day to every active day, and a day-level aggregate
    counts the split — no join between the activity relation and a
    separately-computed first-seen table, so the fact table is
    scanned once and the big relation crosses exactly three
    exchanges. All int64."""
    from gpu_olap_engine_spark.queries.events import _with_us  # noqa: PLC0415

    ev = _with_us(T(spark, sf_dir, "events"))
    du = ev.select(
        F.expr("us DIV 86400000000").alias("day"), "user_id"
    ).distinct()
    w = Window.partitionBy("user_id")
    f = du.select("day", F.min("day").over(w).alias("first_day"))
    return f.groupBy("day").agg(
        F.sum(F.when(F.col("day") == F.col("first_day"), 1).otherwise(0))
        .cast("long")
        .alias("n_new"),
        F.sum(F.when(F.col("day") > F.col("first_day"), 1).otherwise(0))
        .cast("long")
        .alias("n_returning"),
    )


@register(
    "q161_burst_days",
    oracle=f"""
    WITH d AS (
        SELECT event_type, {_US} // 86400000000 AS day,
               COUNT(*) AS cnt
        FROM events GROUP BY 1, 2
    ),
    m AS (
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(cnt) AS BIGINT) AS s,
               CAST(SUM(cnt * cnt) AS BIGINT) AS ss
        FROM d GROUP BY 1
    )
    SELECT d.event_type, d.day, d.cnt
    FROM d JOIN m USING (event_type)
    WHERE m.n >= 2
      AND CAST(d.cnt AS DOUBLE) >
          CAST(s AS DOUBLE) / n
          + 2.0 * sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                       / (n - 1))
    """,
)
def q161(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic-burst detection: days where an event type's daily count
    exceeds its own mean by 2 sample standard deviations — the
    volume-anomaly alarm over the ingest monitoring feed. The per-type
    moments (n, Σ, Σ²) are INTEGER sums over the tiny per-day
    aggregate, so both engines derive the identical doubles for the
    threshold. The moments ride whole-partition window frames over
    the day-count relation instead of a join back to a separate
    moment aggregate — ONE scan of events (Spark would recompute the
    scan subtree on both sides of a self-join; plan-asserted), one
    shuffle for the day bucketing, and everything after is
    day-count-sized. The combinable-moments trick is the same one the
    OLS entry (q111) uses — a second pass over raw data is never
    needed."""
    from gpu_olap_engine_spark.queries.events import _with_us  # noqa: PLC0415

    ev = _with_us(T(spark, sf_dir, "events"))
    d = (
        ev.select("event_type", F.expr("us DIV 86400000000").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count("*").alias("cnt"))
    )
    wt = Window.partitionBy("event_type")
    joined = d.select(
        "event_type",
        "day",
        "cnt",
        F.count("*").over(wt).alias("n"),
        F.sum("cnt").over(wt).alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).over(wt).alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    var = (
        F.col("ss").cast("double")
        - F.col("s").cast("double") * F.col("s") / F.col("n")
    ) / (F.col("n") - 1)
    return joined.filter(
        (F.col("n") >= 2)
        & (F.col("cnt").cast("double") > mean + 2.0 * F.sqrt(var))
    ).select("event_type", "day", "cnt")


@register(
    "q162_hour_of_week_profile",
    oracle=f"""
    WITH h AS (
        SELECT event_type, ({_US} // 3600000000) % 168 AS how,
               COUNT(*) AS cnt
        FROM events GROUP BY 1, 2
    ),
    t AS (SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS tot
          FROM h GROUP BY 1)
    SELECT h.event_type, h.how, h.cnt,
           CAST((1000000::HUGEINT * h.cnt) // t.tot AS BIGINT) AS share_ppm
    FROM h JOIN t USING (event_type)
    """,
)
def q162(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-week load profile per event type: the 168-bucket
    weekly seasonality heatmap capacity planning reads. Buckets are
    pure modular arithmetic on epoch hours (epoch hour mod 168; the
    week phase is epoch-aligned, so both engines bucket identically
    with no day-of-week convention to reconcile). Shares are exact
    integer ppm of each type's total, carried by broadcasting the
    |event types|-row totals — one shuffle over events, then
    168×|types|-sized work."""
    from gpu_olap_engine_spark.queries.events import _with_us  # noqa: PLC0415

    ev = _with_us(T(spark, sf_dir, "events"))
    h = (
        ev.select(
            "event_type", F.expr("(us DIV 3600000000) % 168").alias("how")
        )
        .groupBy("event_type", "how")
        .agg(F.count("*").alias("cnt"))
    )
    t = h.groupBy("event_type").agg(F.sum("cnt").alias("tot"))
    return h.join(F.broadcast(t), "event_type").select(
        "event_type",
        "how",
        "cnt",
        F.expr(
            "(1000000 * CAST(cnt AS DECIMAL(20,0))) DIV tot"
        ).alias("share_ppm"),
    )


@register(
    "q163_quantile_normalize",
    oracle="""
    WITH r AS (
        SELECT event_id, event_type,
               RANK() OVER (PARTITION BY event_type ORDER BY value) AS rk,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events WHERE value IS NOT NULL
    )
    SELECT event_id, event_type,
           CAST((1000000::HUGEINT * (rk - 1)) // (n - 1) AS BIGINT) AS qnorm_ppm
    FROM r WHERE n > 1
    """,
)
def q163(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-based quantile normalization of the value column within
    each event type — the scale-free feature transform (q122 is the
    moment-based z-score twin; this is the robust rank twin that
    ignores outlier magnitude entirely). RANK ties share a value, so
    the output is deterministic without a unique sort key, and the
    normalized position is exact integer ppm of (rank-1)/(n-1). One
    window shuffle on event_type; at 100 TB the RANK can swap to an
    approx-quantile bucket join without changing this gate's
    semantics."""
    ev = T(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("event_type").orderBy("value")
    wn = Window.partitionBy("event_type")
    return (
        ev.select(
            "event_id",
            "event_type",
            # rank() is int32: widen BEFORE the ppm multiply or
            # 1000000*(rk-1) wraps negative past ~2147 ranks
            F.rank().over(w).cast("long").alias("rk"),
            F.count("*").over(wn).alias("n"),
        )
        .filter(F.col("n") > 1)
        .select(
            "event_id",
            "event_type",
            F.expr(
                "(1000000 * (CAST(rk AS DECIMAL(20,0)) - 1)) DIV (n - 1)"
            ).alias("qnorm_ppm"),
        )
    )


@register(
    "q164_conversion_latency",
    oracle=f"""
    WITH f AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN {_US} END) AS v,
               MIN(CASE WHEN event_type = 'purchase' THEN {_US} END) AS p
        FROM events GROUP BY user_id
    ),
    d AS (
        SELECT (p - v) // 1000000 AS delay_s
        FROM f WHERE v IS NOT NULL AND p IS NOT NULL AND p >= v
    )
    SELECT COUNT(*) AS n_converted,
           quantile_cont(delay_s, 0.5) AS p50_s,
           quantile_cont(delay_s, 0.9) AS p90_s,
           quantile_cont(delay_s, 0.99) AS p99_s
    FROM d
    """,
)
def q164(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch conversion latency: per user, the delay from first
    'view' to first 'purchase' (users who did both, purchase not
    before view), summarized as exact interpolated percentiles — the
    activation-funnel speed metric (q157 is the order-fulfilment SLA
    twin; this one pairs two event streams per user instead of a
    fact-to-fact join). ONE aggregation over events produces both
    first-touch times as conditional MINs (no self-join of the event
    log), delays are exact int64 seconds, and the percentile pass
    runs over the |converted users|-sized relation. Both engines
    share the continuous-quantile definition, and interpolation over
    integers is bit-exact."""
    from gpu_olap_engine_spark.queries.events import _with_us  # noqa: PLC0415

    ev = _with_us(T(spark, sf_dir, "events"))
    f = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("us"))).alias("v"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("us"))
        ).alias("p"),
    )
    d = f.filter(
        F.col("v").isNotNull() & F.col("p").isNotNull() & (F.col("p") >= F.col("v"))
    ).select(F.expr("(p - v) DIV 1000000").alias("delay_s"))
    return d.agg(
        F.count("*").alias("n_converted"),
        F.expr("percentile(delay_s, 0.5)").alias("p50_s"),
        F.expr("percentile(delay_s, 0.9)").alias("p90_s"),
        F.expr("percentile(delay_s, 0.99)").alias("p99_s"),
    )


@register(
    "q170_clamped_stock",
    oracle="""
    WITH d AS (
        SELECT l_partkey AS part,
               CAST(l_quantity AS BIGINT)
                 * (CASE WHEN l_returnflag = 'R' THEN 1 ELSE -1 END) AS delta,
               l_shipdate, l_orderkey, l_linenumber
        FROM lineitem
    ),
    s AS (
        SELECT part, delta,
               SUM(delta) OVER (
                   PARTITION BY part
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS UNBOUNDED PRECEDING
               ) AS run
        FROM d
    )
    SELECT part,
           CAST(SUM(delta) - LEAST(0, MIN(run)) AS BIGINT) AS final_stock,
           CAST(-LEAST(0, MIN(run)) AS BIGINT) AS lost_units
    FROM s GROUP BY part
    """,
)
def q170(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Floor-at-zero running stock balance per part: returns ('R'
    lines) restock, other lines issue, and physical stock can never
    go negative — unmet issues are lost sales. Uses the CLOSED FORM
    for a zero-floored running sum, b_t = s_t - min(0, min_{k<=t}
    s_k), so one ordinary window pass replaces the per-row iterative
    clamp (which SQL cannot express and Spark would need a stateful
    UDF for); with a floor only (no cap) the identity is exact. The
    plan is one per-part window (shuffle on l_partkey, deterministic
    (shipdate, orderkey, linenumber) order) + one per-part aggregate:
    the warehouse ledger audit, 2 shuffles total at any scale.
    Emits final on-hand stock and total lost units per part."""
    li = T(spark, sf_dir, "lineitem")
    d = li.select(
        F.col("l_partkey").alias("part"),
        (
            F.col("l_quantity").cast("long")
            * F.when(F.col("l_returnflag") == "R", 1).otherwise(-1)
        ).alias("delta"),
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
    )
    w = Window.partitionBy("part").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    ).rowsBetween(Window.unboundedPreceding, 0)
    s = d.select("part", "delta", F.sum("delta").over(w).alias("run"))
    return s.groupBy("part").agg(
        (F.sum("delta") - F.least(F.lit(0), F.min("run")))
        .cast("long")
        .alias("final_stock"),
        (-F.least(F.lit(0), F.min("run"))).cast("long").alias("lost_units"),
    )


@register(
    "q173_cohort_ltv",
    oracle="""
    WITH fo AS (
        SELECT o_custkey, MIN(o_orderdate) AS first_dt FROM orders
        GROUP BY o_custkey
    ),
    b AS (
        SELECT CAST(year(f.first_dt) * 100 + month(f.first_dt) AS BIGINT)
                   AS cohort_ym,
               CAST((year(o.o_orderdate) * 12 + month(o.o_orderdate))
                    - (year(f.first_dt) * 12 + month(f.first_dt))
                    AS BIGINT) AS month_off,
               CAST(floor(o.o_totalprice * 100) AS BIGINT) AS cents
        FROM orders o JOIN fo f ON o.o_custkey = f.o_custkey
    ),
    m AS (
        SELECT cohort_ym, month_off,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(cents) AS BIGINT) AS revenue_cents
        FROM b GROUP BY cohort_ym, month_off
    )
    SELECT cohort_ym, month_off, n_orders, revenue_cents,
           CAST((1000000::HUGEINT * CAST(SUM(revenue_cents) OVER (
                    PARTITION BY cohort_ym ORDER BY month_off
                ) AS BIGINT))
                // CAST(SUM(revenue_cents) OVER (
                    PARTITION BY cohort_ym
                ) AS BIGINT) AS BIGINT) AS cum_share_ppm
    FROM m
    """,
)
def q173(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue cohort LTV curve: customers grouped by first-order
    month, revenue bucketed by months-since-first-order, with the
    cumulative share of each cohort's lifetime revenue in exact ppm —
    the LTV payback table (q113 is the retention-count twin; this one
    follows the money). Month arithmetic is integer (year*12+month)
    on both engines — no months_between() float. Plan: one orders
    aggregate for first order dates, join back (both sides keyed on
    o_custkey — AQE plans it as one co-partitioned exchange pair),
    aggregate on (cohort, offset), and two frames over one
    cohort-keyed window partitioning. Revenue in exact cents."""
    o = T(spark, sf_dir, "orders")
    fo = o.groupBy("o_custkey").agg(F.min("o_orderdate").alias("first_dt"))
    b = o.join(fo, "o_custkey").select(
        (F.year("first_dt") * 100 + F.month("first_dt"))
        .cast("long")
        .alias("cohort_ym"),
        (
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            - (F.year("first_dt") * 12 + F.month("first_dt"))
        )
        .cast("long")
        .alias("month_off"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    m = b.groupBy("cohort_ym", "month_off").agg(
        F.count("*").alias("n_orders"),
        F.sum("cents").alias("revenue_cents"),
    )
    wc = (
        Window.partitionBy("cohort_ym")
        .orderBy("month_off")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("cohort_ym").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        m.withColumn("cum_rev", F.sum("revenue_cents").over(wc))
        .withColumn("tot_rev", F.sum("revenue_cents").over(wt))
        .select(
            "cohort_ym",
            "month_off",
            "n_orders",
            "revenue_cents",
            F.expr(
                "(1000000 * CAST(cum_rev AS DECIMAL(20,0))) DIV tot_rev"
            ).alias("cum_share_ppm"),
        )
    )


@register(
    "q177_mom_growth",
    oracle="""
    WITH m AS (
        SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
                   AS ym,
               CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS rev_cents
        FROM orders GROUP BY 1
    )
    SELECT ym, rev_cents,
           CAST((1000000::HUGEINT * (rev_cents - LAG(rev_cents) OVER (ORDER BY ym)))
                // LAG(rev_cents) OVER (ORDER BY ym) AS BIGINT)
               AS growth_ppm
    FROM m
    """,
)
def q177(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth in signed exact ppm — the KPI
    trend line. Growth can be NEGATIVE, which makes the integer
    division itself a cross-engine hazard worth pinning: both Spark's
    DIV and DuckDB's // truncate toward zero (verified: -7 DIV 2 =
    -7 // 2 = -3, and both engines' % keeps the dividend's sign), so
    the signed ppm is bit-equal with no floor-emulation needed. First
    month's growth is NULL on both sides (LAG over the leading edge).
    Plan: one month-keyed aggregate + one LAG over the |months|-sized
    relation."""
    o = T(spark, sf_dir, "orders")
    m = o.groupBy(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("long")
        .alias("ym")
    ).agg(
        F.expr("SUM(CAST(floor(o_totalprice * 100) AS BIGINT))").alias(
            "rev_cents"
        )
    )
    w = Window.orderBy("ym")
    return m.select(
        "ym",
        "rev_cents",
        F.expr(
            "(1000000 * (CAST(rev_cents AS DECIMAL(20,0))"
            " - LAG(rev_cents) OVER (ORDER BY ym)))"
            " DIV LAG(rev_cents) OVER (ORDER BY ym)"
        ).alias("growth_ppm"),
    )
