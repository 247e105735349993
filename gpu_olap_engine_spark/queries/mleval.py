"""Model-evaluation operators: rank-based AUC, MRR, decile lift.

The training-data pipelines this engine feeds (dedup/curation in
queries/pipeline.py) end in a model, and the same warehouse evaluates
it: given a score column and a binary label, compute the standard
offline ranking metrics. The reference engine's aggregate surface
(reference aggregate_kernel.rs:17-23 — SUM/COUNT/MIN/MAX/AVG) cannot
express any of these; here each is ONE Spark job over the `events`
fixture (score = the `value` column in exact cents, label =
event_type) with a DuckDB oracle twin.

All three metrics are computed in EXACT integer arithmetic (ppm via
floor division, tie-averaged ranks carried as 2x integers) so the
driver's representation-sensitive hash is bit-stable: no float
division anywhere, and every oracle aggregate is CAST to BIGINT
(DuckDB SUM promotes to HUGEINT -> pandas float64 otherwise — the
round-6 lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gpu_olap_engine_spark.queries import register
from gpu_olap_engine_spark.queries.tables import T

# Binary-classification population: 'view' = negative, 'purchase' =
# positive, scored by the event's value in exact cents.
_POP = "event_type IN ('view', 'purchase')"
_SCORE = "CAST(floor(value * 100) AS BIGINT)"


def _pop(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        T(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "purchase"))
        .select(
            F.expr(_SCORE).alias("score"),
            (F.col("event_type") == "purchase").cast("long").alias("pos"),
            F.col("event_id"),
        )
    )


@register(
    "q166_auc_rank",
    oracle=f"""
    WITH p AS (
        SELECT {_SCORE} AS score,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        FROM events WHERE {_POP}
    ),
    g AS (
        SELECT score, COUNT(*) AS cnt, SUM(pos) AS pos
        FROM p GROUP BY score
    ),
    r AS (
        SELECT pos, cnt,
               SUM(cnt) OVER (ORDER BY score) AS cum
        FROM g
    ),
    s AS (
        SELECT SUM(pos::HUGEINT * (2 * cum - cnt + 1)) AS rank_sum2,
               CAST(SUM(pos) AS BIGINT) AS n_pos,
               CAST(SUM(cnt - pos) AS BIGINT) AS n_neg
        FROM r
    )
    SELECT n_pos, n_neg,
           CAST((1000000::HUGEINT * (rank_sum2 - n_pos::HUGEINT * (n_pos + 1)))
                // (2::HUGEINT * n_pos * n_neg) AS BIGINT) AS auc_ppm
    FROM s
    """,
)
def q166(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-based AUC (Mann-Whitney U) with exact tie handling, in
    integer ppm: does the value score separate purchases from views?
    Ties get the textbook average rank, carried as the INTEGER
    2*avg_rank = r_lo + r_hi = 2*cum - cnt + 1 so no fraction ever
    appears; AUC = (rank_sum - n_pos*(n_pos+1)/2) / (n_pos*n_neg)
    lands as one floor division at the end. The plan is two keyed
    aggregations: group-by-score (shuffle on score), then a running
    sum over the DISTINCT-score relation — bounded by the score
    grid (cents), not the row count, so the single-partition window
    holds at any fact scale. The 1e6 * rank_sum2 intermediate stays
    under int64 through ~1e6 positives x 1e6 negatives; beyond that,
    sample the negatives or move to DECIMAL — noted, not needed at
    any tested SF."""
    g = _pop(spark, sf_dir).groupBy("score").agg(
        F.count("*").alias("cnt"), F.sum("pos").alias("pos")
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, 0)
    r = g.select("pos", "cnt", F.sum("cnt").over(w).alias("cum"))
    s = r.agg(
        F.sum(
            F.expr("CAST(pos AS DECIMAL(38,0)) * (2 * cum - cnt + 1)")
        ).alias("rank_sum2"),
        F.sum("pos").alias("n_pos"),
        F.sum(F.expr("cnt - pos")).alias("n_neg"),
    )
    return s.select(
        "n_pos",
        "n_neg",
        F.expr(
            "(1000000 * (rank_sum2"
            " - CAST(n_pos AS DECIMAL(38,0)) * (n_pos + 1)))"
            " DIV (2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg)"
        ).alias("auc_ppm"),
    )


@register(
    "q167_mrr_first_purchase",
    oracle="""
    WITH rn AS (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS rn
        FROM events
    ),
    hit AS (
        SELECT user_id, MIN(rn) AS pos
        FROM rn WHERE event_type = 'purchase' GROUP BY user_id
    ),
    u AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM events)
    SELECT CAST(n_users AS BIGINT) AS n_users,
           CAST(COUNT(CASE WHEN pos <= 10 THEN 1 END) AS BIGINT) AS n_hit,
           CAST(CAST(SUM(CASE WHEN pos <= 10 THEN 1000000 // pos
                              ELSE 0 END) AS BIGINT)
                // MAX(n_users) AS BIGINT) AS mrr_ppm
    FROM hit, u GROUP BY n_users
    """,
)
def q167(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean reciprocal rank of the first purchase within each user's
    first 10 events (chronological, event_id tiebreak) — the session
    ranking metric for "how early does the desired action land".
    Users who never purchase in their first 10 contribute 0 via the
    denominator (all users, not just converters). Reciprocal ranks
    are floor(1e6/pos) so the mean is one integer division: bit-equal
    on both engines by construction. Plan: one per-user window
    (shuffle on user_id) + one global count — no self-join of the
    event log, and the window state is one counter per user."""
    ev = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    rn = ev.select("user_id", "event_type", F.row_number().over(w).alias("rn"))
    hit = (
        rn.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("rn").alias("pos"))
    )
    n_users = ev.select(
        F.countDistinct("user_id").alias("n_users")
    )
    return (
        hit.crossJoin(F.broadcast(n_users))
        .groupBy("n_users")
        .agg(
            F.count(F.when(F.col("pos") <= 10, 1)).alias("n_hit"),
            F.expr(
                "SUM(CASE WHEN pos <= 10 THEN 1000000 DIV pos ELSE 0 END)"
                " DIV MAX(n_users)"
            ).alias("mrr_ppm"),
        )
        .select("n_users", "n_hit", "mrr_ppm")
    )


@register(
    "q168_decile_lift",
    oracle=f"""
    WITH p AS (
        SELECT {_SCORE} AS score, event_id,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        FROM events WHERE {_POP}
    ),
    rn AS (
        SELECT pos,
               ROW_NUMBER() OVER (ORDER BY score DESC, event_id) AS rn,
               COUNT(*) OVER () AS n
        FROM p
    ),
    d AS (
        SELECT CAST(((rn - 1) * 10) // n + 1 AS BIGINT) AS decile,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(pos) AS BIGINT) AS n_pos,
               CAST(MAX(n) AS BIGINT) AS n
        FROM rn GROUP BY 1
    )
    SELECT decile, n_rows, n_pos,
           CAST((1000000::HUGEINT * CAST(SUM(n_pos) OVER (ORDER BY decile) AS BIGINT))
                // CAST(SUM(n_pos) OVER () AS BIGINT) AS BIGINT)
               AS capture_ppm,
           CAST((1000000::HUGEINT * n_pos * n)
                // (n_rows::HUGEINT * CAST(SUM(n_pos) OVER () AS BIGINT)) AS BIGINT)
               AS lift_ppm
    FROM d
    """,
)
def q168(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift / gains table: rank the scored population
    descending (event_id tiebreak makes the total order — and thus
    the decile boundaries — deterministic on both engines, unlike
    bare NTILE over tied scores), split into 10 explicit-arithmetic
    deciles, and report per-decile positive capture and lift in exact
    ppm. The global sort is the one range-partitioned exchange (what
    a 1000-executor sort does anyway); everything after runs on the
    10-row decile relation. This is the campaign-targeting /
    model-triage report: "the top decile captures X% of purchases at
    Y x base rate"."""
    p = _pop(spark, sf_dir)
    w = Window.orderBy(F.col("score").desc(), F.col("event_id"))
    rn = p.select(
        "pos",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    d = (
        rn.groupBy(F.expr("((rn - 1) * 10) DIV n + 1").alias("decile"))
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("pos").alias("n_pos"),
            F.max("n").alias("n"),
        )
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        d.withColumn("cum_pos", F.sum("n_pos").over(wc))
        .withColumn("total_pos", F.sum("n_pos").over(wt))
        .select(
            "decile",
            "n_rows",
            "n_pos",
            F.expr(
                "(1000000 * CAST(cum_pos AS DECIMAL(20,0))) DIV total_pos"
            ).alias("capture_ppm"),
            F.expr(
                "(1000000 * CAST(n_pos AS DECIMAL(38,0)) * n)"
                " DIV (CAST(n_rows AS DECIMAL(38,0)) * total_pos)"
            ).alias("lift_ppm"),
        )
    )


@register(
    "q171_calibration_bins",
    oracle=f"""
    WITH p AS (
        SELECT {_SCORE} AS score,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        FROM events WHERE {_POP}
    ),
    ext AS (
        SELECT MIN(score) AS mn, MAX(score) AS mx FROM p
    )
    SELECT CAST(LEAST(9, ((score - mn) * 10) // (mx - mn + 1)) AS BIGINT)
               AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(pos) AS BIGINT) AS n_pos,
           CAST((1000000::HUGEINT * CAST(SUM(pos) AS BIGINT)) // COUNT(*) AS BIGINT)
               AS pos_rate_ppm,
           CAST(SUM(score) // COUNT(*) AS BIGINT)
               AS mean_score_cents
    FROM p, ext GROUP BY 1
    """,
)
def q171(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration / reliability table: 10 equal-width score bins,
    each with observed positive rate vs mean score — the diagram that
    says whether the score means what it claims. Bin edges come from
    the global min/max (a 1-row broadcast, not a per-row subquery);
    bin id, rates, and means are all exact integer arithmetic, so the
    gate is bit-stable. Plan: one scan -> 1-row extent aggregate
    broadcast back -> one group-by on the 10-value bin key. At 100 TB
    the extent aggregate is the only extra pass, and it reads the
    same cached scan."""
    p = _pop(spark, sf_dir)
    ext = p.agg(
        F.min("score").alias("mn"), F.max("score").alias("mx")
    )
    return (
        p.crossJoin(F.broadcast(ext))
        .groupBy(
            F.expr(
                "LEAST(9, ((score - mn) * 10) DIV (mx - mn + 1))"
            ).alias("bin")
        )
        .agg(
            F.count("*").alias("n"),
            F.sum("pos").alias("n_pos"),
            F.expr(
                "(1000000 * CAST(SUM(pos) AS DECIMAL(20,0))) DIV COUNT(*)"
            ).alias("pos_rate_ppm"),
            F.expr(
                "SUM(CAST(score AS DECIMAL(20,0))) DIV COUNT(*)"
            ).alias("mean_score_cents"),
        )
    )


@register(
    "q172_precision_at_k",
    oracle=f"""
    WITH p AS (
        SELECT user_id, event_id, {_SCORE} AS score,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        FROM events WHERE {_POP}
    ),
    rn AS (
        SELECT user_id, pos,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY score DESC, event_id
               ) AS rn,
               COUNT(*) OVER (PARTITION BY user_id) AS n_ev
        FROM p
    ),
    u AS (
        SELECT user_id,
               CAST((1000000 * SUM(CASE WHEN rn <= 5 THEN pos ELSE 0 END))
                    // LEAST(5, MAX(n_ev)) AS BIGINT) AS p5_ppm
        FROM rn GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(CAST(SUM(p5_ppm) AS BIGINT) // COUNT(*) AS BIGINT)
               AS macro_p5_ppm
    FROM u
    """,
)
def q172(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Macro-averaged precision@5: per user, rank their scored events
    descending (event_id tiebreak) and measure the purchase fraction
    of the top 5 (denominator capped at the user's event count), then
    average the per-user ppm across users. The per-user window is the
    only shuffle (user_id keyed, bounded state); the macro average is
    a 1-row aggregate. Exact integer ppm end to end. This is the
    recommender-eval twin of q167's MRR — rate-based instead of
    rank-position-based."""
    p = (
        T(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "purchase"))
        .select(
            "user_id",
            F.expr(_SCORE).alias("score"),
            (F.col("event_type") == "purchase").cast("long").alias("pos"),
            F.col("event_id"),
        )
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("score").desc(), F.col("event_id")
    )
    wn = Window.partitionBy("user_id")
    rn = p.select(
        "user_id",
        "pos",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n_ev"),
    )
    u = rn.groupBy("user_id").agg(
        F.expr(
            "(1000000 * SUM(CASE WHEN rn <= 5 THEN pos ELSE 0 END))"
            " DIV LEAST(5, MAX(n_ev))"
        ).alias("p5_ppm")
    )
    return u.agg(
        F.count("*").alias("n_users"),
        F.expr("SUM(p5_ppm) DIV COUNT(*)").alias("macro_p5_ppm"),
    )


@register(
    "q176_ks_distance",
    oracle=f"""
    WITH p AS (
        SELECT {_SCORE} AS score,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        FROM events WHERE {_POP}
    ),
    g AS (
        SELECT score,
               CAST(SUM(pos) AS BIGINT) AS c1,
               CAST(SUM(1 - pos) AS BIGINT) AS c2
        FROM p GROUP BY score
    ),
    r AS (
        SELECT SUM(c1) OVER (ORDER BY score) AS cum1,
               SUM(c2) OVER (ORDER BY score) AS cum2
        FROM g
    ),
    t AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
                 CAST(SUM(c2) AS BIGINT) AS n2 FROM g)
    SELECT n1, n2,
           CAST((1000000::HUGEINT * MAX(abs(cum1::HUGEINT * n2
                                   - cum2::HUGEINT * n1)))
                // (n1::HUGEINT * n2) AS BIGINT) AS ks_ppm
    FROM r, t GROUP BY n1, n2
    """,
)
def q176(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov distance between the score
    distributions of purchases and views — the distribution-drift /
    separability test (text_drift_chi2's continuous-valued sibling;
    also the standard train-vs-serve feature drift gate). D is
    evaluated at every distinct score with ties handled by cumulative
    counts, and kept EXACT as integers: max |cum1*n2 - cum2*n1| over
    the merged support, one floor division to ppm at the end — no
    float CDFs. Plan: one group-by on score (shuffle bounded by the
    cents grid), one running-sum window over the distinct-score
    relation, one 1-row max. Same bounded-support argument as q166's
    AUC ranks."""
    g = _pop(spark, sf_dir).groupBy("score").agg(
        F.sum("pos").alias("c1"),
        F.sum(F.expr("1 - pos")).alias("c2"),
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, 0)
    r = g.select(
        F.sum("c1").over(w).alias("cum1"),
        F.sum("c2").over(w).alias("cum2"),
        F.sum("c1").over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n1"),
        F.sum("c2").over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n2"),
    )
    return r.groupBy("n1", "n2").agg(
        F.expr(
            "(1000000 * MAX(abs(CAST(cum1 AS DECIMAL(38,0)) * n2"
            " - CAST(cum2 AS DECIMAL(38,0)) * n1)))"
            " DIV (CAST(n1 AS DECIMAL(38,0)) * n2)"
        ).alias("ks_ppm")
    ).select("n1", "n2", "ks_ppm")
