"""Join utilities for scale: skew salting and as-of composition.

AQE's skew-join handles most runtime skew (enabled by EngineConfig);
explicit salting is for the pathological case AQE cannot fix — a
single key so hot that even a split partition bottlenecks one
aggregation/build task. The reference has no notion of skew at all
(its radix partitioner scatters by hash and hopes,
join_kernels.cuh:45-76).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join a skew-heavy fact side against a replicable side.

    The skewed side gets a random salt in [0, salt); the small side is
    replicated salt times (explode of a literal range). The join key
    becomes (key, salt), splitting each hot key across `salt` tasks.
    For inner/left/semi/anti joins the result is identical to the
    plain join (each probe row carries exactly one salt and the
    replicated side holds every key at every salt, so per-row match
    existence is unchanged); right/full outer are rejected — unmatched
    rows of the replicated side would be emitted once per salt copy.
    Use when one side is small enough to replicate but too big (or the
    key too hot) to broadcast outright.
    """
    if how not in (
        "inner",
        "left",
        "left_outer",
        "leftouter",
        "left_semi",
        "leftsemi",
        "semi",
        "left_anti",
        "leftanti",
        "anti",
    ):
        raise ValueError(
            f"salted_join supports inner/left/semi/anti joins, got {how!r}: "
            "unmatched replicated-side rows would duplicate under "
            "right/full outer"
        )
    salted_fact = skewed.withColumn(
        "_salt", (F.rand(seed=42) * salt).cast("int")
    )
    replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = salted_fact.join(replicated, [key, "_salt"], how)
    return out.drop("_salt")


def salted_aggregate(
    df: DataFrame,
    key: str,
    aggs: list[Column],
    partial_aggs: list[Column],
    salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation with an explicit salt for hot keys:
    groupBy(key, salt) -> partial aggs -> groupBy(key) -> final aggs.

    `partial_aggs` run per (key, salt); `aggs` combine the partials
    (caller pairs them, e.g. partial COUNT -> final SUM). Spark's own
    partial aggregation usually makes this unnecessary — it exists for
    aggregates whose map-side combine collapses poorly (e.g.
    collect_set over a hot key).
    """
    salted = df.withColumn("_salt", (F.rand(seed=42) * salt).cast("int"))
    partial = salted.groupBy(key, "_salt").agg(*partial_aggs)
    return partial.groupBy(key).agg(*aggs)
