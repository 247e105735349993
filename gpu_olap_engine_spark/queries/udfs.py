"""UDF/UDAF surface (SURVEY.md §2.10) + pivot/grouping-sets.

The reference's only extension point is registering a custom CUDA
kernel (README.md:354-378). The Spark-idiomatic equivalents:

* scalar ``pandas_udf``        — vectorized per-row compute (Arrow)
* GROUPED_AGG ``pandas_udf``   — custom aggregate (UDAF)
* ``applyInPandas``            — grouped-map (per-group pandas logic)

Each demo is engineered deterministic (IEEE elementwise math or
integer quantization), so even the Python paths are oracle-checked —
not just rows-only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from gpu_olap_engine_spark.queries import REGISTRY, register
from gpu_olap_engine_spark.queries.tables import T, _view

# ------------------------------------------------------------- pivot


@register(
    "q35_pivot",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS F,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS O,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS P
    FROM orders GROUP BY o_orderpriority
    """,
)
def q35(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long->wide) with explicit value list — one aggregation
    pass, no per-value scans. Missing combinations coalesce to 0 to
    match FILTER-count semantics."""
    pivoted = (
        T(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))  # count(*) is rejected inside a pivot agg
    )
    return pivoted.select(
        "o_orderpriority",
        *[F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c) for c in ("F", "O", "P")],
    )


@register(
    "q36_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    """,
)
def q36(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form of rollup/cube —
    absent from the reference's single-GROUP-BY parser)."""
    o = _view(T(spark, sf_dir, "orders"), "q36_orders")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
        FROM {o}
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        """
    )


# --------------------------------------------------- pandas UDF (scalar)
# (UDFs are built lazily: pandas_udf needs a live SparkSession to
# resolve its return type, and the registry imports session-free.)


def _charge_udf():
    @pandas_udf("double")
    def charge(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        # numpy elementwise doubles: same IEEE ops, same order as the
        # SQL expression — bit-identical to the oracle.
        return price * (1 - disc) * (1 + tax)

    return charge


@register(
    "q37_pandas_udf_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
    FROM lineitem WHERE l_orderkey < 200
    """,
)
def q37(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas_udf (Arrow-batched — the 10-100x-
    faster path vs row-at-a-time Python UDFs). Demo is IEEE-identical
    to the pure-SQL expression, proving the Arrow round-trip is
    lossless."""
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        _charge_udf()("l_extendedprice", "l_discount", "l_tax").alias("charge"),
    )


# ----------------------------------------------- pandas UDF (grouped agg)


def _qsum10k_udf():
    @pandas_udf("long")
    def qsum10k(v: pd.Series) -> int:
        # floor(x*10000) as int64, summed exactly: the UDAF twin of
        # the engine's quantized-sum rule (relational._qsum). Unlike
        # _qsum this CANNOT take the decimal escape hatch -- the
        # declared output type is long, so the result itself caps at
        # 2^63 (~1e9/row x ~9e9 group rows). Past that the DuckDB twin
        # throws on its BIGINT cast (loud), it never silently
        # diverges; a bigger budget needs a decimal/double contract.
        return int(np.floor(v.to_numpy() * 10000).astype("int64").sum())

    return qsum10k


@register(
    "q38_pandas_udaf",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(floor(l_extendedprice * 10000) AS BIGINT)) AS BIGINT)
               AS price_q
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q38(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate as a GROUPED_AGG pandas_udf (UDAF surface):
    partial batches stream through Arrow per group."""
    return (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(_qsum10k_udf()("l_extendedprice").alias("price_q"))
    )


# --------------------------------------------------------- applyInPandas


def _order_gaps(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["o_orderdate", "o_orderkey"])
    n = len(pdf)
    total_gap = (
        int((pdf["o_orderdate"].iloc[-1] - pdf["o_orderdate"].iloc[0]).days)
        if n > 1
        else 0
    )
    return pd.DataFrame(
        {
            "o_custkey": [pdf["o_custkey"].iloc[0]],
            "n_orders": [n],
            "total_gap_days": [total_gap],
            "mean_gap_days": [float(total_gap // (n - 1)) if n > 1 else None],
        }
    )


@register(
    "q39_apply_in_pandas",
    oracle="""
    SELECT o_custkey,
           COUNT(*) AS n_orders,
           CAST(date_diff('day', MIN(o_orderdate), MAX(o_orderdate)) AS BIGINT)
               AS total_gap_days,
           CASE WHEN COUNT(*) > 1 THEN
               CAST(date_diff('day', MIN(o_orderdate), MAX(o_orderdate))
                    // (COUNT(*) - 1) AS DOUBLE)
           END AS mean_gap_days
    FROM orders WHERE o_custkey < 200 GROUP BY o_custkey
    """,
)
def q39(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-customer inter-order gap stats
    computed in pandas (sorted diffs telescope to max-min, so the SQL
    oracle is exact). The grouped-map is the general custom-operator
    escape hatch — one shuffle on the grouping key, then arbitrary
    per-group Python over Arrow batches."""
    orders = T(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    return orders.select("o_custkey", "o_orderkey", "o_orderdate").groupBy(
        "o_custkey"
    ).applyInPandas(
        _order_gaps,
        "o_custkey long, n_orders long, total_gap_days long, mean_gap_days double",
    )


# ------------------------------------------------------------- sketches


# ------------------------------------------------------------------ UDTF


@register(
    "q42_udtf_split_words",
    oracle=r"""
    WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS words
               FROM documents WHERE doc_id < 50)
    SELECT doc_id, words[i] AS word, CAST(i - 1 AS BIGINT) AS pos
    FROM w, unnest(generate_series(1, len(words))) AS t(i)
    """,
)
def q42(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function, Spark 3.5+): one input row ->
    many output rows, used LATERAL-style. Deterministic tokenizer ->
    oracle-checked even though it's a Python path."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, pos: long")
    class SplitWords:
        def eval(self, text: str):
            for i, w in enumerate(text.split()):
                yield w, i

    spark.udtf.register("split_words", SplitWords)
    d = _view(
        T(spark, sf_dir, "documents").filter(F.col("doc_id") < 50), "q42_docs"
    )
    return spark.sql(
        f"""
        SELECT d.doc_id, s.word, s.pos
        FROM {d} d, LATERAL split_words(d.text) s
        """
    )


@register(
    "q40_approx_distinct",
    # Sketch values are engine-specific, so the checkable output is
    # the exact count plus the sketch's accuracy invariant: the HLL
    # estimate (rsd=0.02, deterministic for fixed data) lands within
    # 10% of exact, which the oracle asserts as a constant TRUE.
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_uniq,
           TRUE AS approx_ok
    FROM orders GROUP BY o_orderpriority
    """,
)
def q40(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct sketch (approx_count_distinct): the
    100 TB path where exact COUNT(DISTINCT) (q11) would shuffle every
    distinct value. The sketch stays in the plan; the oracle checks
    the exact count and the estimate's 10% accuracy envelope (HLL at
    rsd 0.02 is ~2% here; also asserted in tests/test_operators).

    NOTE: this registered entry is a *verification harness* — it runs
    the exact count_distinct alongside the sketch so the oracle can
    check it, which re-adds the full distinct shuffle the sketch
    exists to avoid. It is deliberately NOT in the bench headline set
    and must not be cited for the approx operator's cost; the
    sketch-only plan is the single approx_count_distinct aggregate."""
    return (
        T(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count_distinct("o_custkey").cast("long").alias("exact_uniq"),
            F.approx_count_distinct("o_custkey", 0.02).alias("approx_uniq"),
        )
        .select(
            "o_orderpriority",
            "exact_uniq",
            (
                F.abs(F.col("approx_uniq") - F.col("exact_uniq"))
                <= 0.1 * F.col("exact_uniq")
            ).alias("approx_ok"),
        )
    )


@register(
    "q41_approx_quantiles",
    # Approximate quantile values are engine-specific; the checkable
    # output is the row count plus per-quantile rank invariants: the
    # GK sketch's returned element has rank within eps*n + slack of
    # the target rank (deterministic for fixed data), asserted TRUE.
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           TRUE AS ok_p50, TRUE AS ok_p90, TRUE AS ok_p99
    FROM lineitem
    """,
)
def q41(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna approximate percentiles — single-pass,
    mergeable (map-side combinable), unlike exact sorting percentiles.
    The sketch stays in the plan; the oracle checks the rank-error
    envelope of each returned quantile (rank(v_q) within q*n +-
    (0.002*n + 10), far looser than GK's eps=1e-4 guarantee).

    NOTE: verification harness — the rank check adds a second full
    scan (via the 1-row sketch broadcast) that the production
    sketch-only plan does not have. Not in the bench headline set;
    do not cite this entry for the approx operator's cost."""
    li = T(spark, sf_dir, "lineitem").select("l_extendedprice")
    qs = li.agg(
        F.percentile_approx("l_extendedprice", [0.5, 0.9, 0.99], 10000).alias("pq")
    )
    checked = li.crossJoin(F.broadcast(qs)).agg(
        F.count("*").alias("n"),
        *[
            F.sum(
                (F.col("l_extendedprice") <= F.element_at("pq", i + 1)).cast("long")
            ).alias(f"le{i}")
            for i in range(3)
        ],
    )
    tol = 0.002 * F.col("n") + 10
    return checked.select(
        F.col("n").cast("long").alias("n_rows"),
        *[
            (
                F.abs(F.col(f"le{i}") - F.lit(q) * F.col("n")) <= tol
            ).alias(name)
            for i, (q, name) in enumerate(
                [(0.5, "ok_p50"), (0.9, "ok_p90"), (0.99, "ok_p99")]
            )
        ],
    )


@register(
    "q95_unpivot",
    oracle="""
    WITH wide AS (
        SELECT o_orderpriority,
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS F,
               COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS O,
               COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS P
        FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, status, cnt
    FROM wide UNPIVOT (cnt FOR status IN (F, O, P))
    """,
)
def q95(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot / melt (wide->long), the inverse of q35's pivot: the
    q35 wide shape melts back to (priority, status, count) rows.
    DataFrame.unpivot is a narrow per-row explode — no shuffle beyond
    the one the wide aggregate already paid; the oracle uses SQL
    UNPIVOT. Round-trips q35 exactly (zero-count combinations survive
    because the pivot coalesced them to 0, matching UNPIVOT's
    non-null retention)."""
    wide = REGISTRY["q35_pivot"].fn(spark, sf_dir)
    return wide.unpivot(
        ids=["o_orderpriority"],
        values=["F", "O", "P"],
        variableColumnName="status",
        valueColumnName="cnt",
    )
