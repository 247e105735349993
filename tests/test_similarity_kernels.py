"""Parity pins for the r13 SQL-built centroid expressions.

The k-means/PQ family's assignment expressions are now constructed as
ONE parsed SQL string (a transform lambda over a literal
array-of-centroids) instead of per-centroid Column trees. These tests
pin the new construction row-for-row against the old Column-built form
(re-implemented here as the spec) on the real fixture and on a
degenerate tie/negative corpus, and pin the exact-double literal
printer against F.lit."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from gpu_olap_engine_spark.operators import similarity as S

SF = "/root/testdata/sf0.01"


def _old_sq_l2(vec, centroid):
    """Pre-r13 Column-built squared-L2 (the spec)."""
    arr = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(
            vec, arr, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _old_centroid_dists(vec, centroids):
    return F.array(
        *[
            F.struct(_old_sq_l2(vec, c).alias("d"), F.lit(i).cast("long").alias("ci"))
            for i, c in enumerate(centroids)
        ]
    )


def _old_nearest(vec, centroids):
    return (
        F.array_sort(_old_centroid_dists(vec, centroids))
        .getItem(0)
        .getField("ci")
        .cast("long")
    )


DOUBLES = [
    0.0,
    -0.0,
    1.0,
    -1.5,
    0.1,
    1 / 3,
    1.2345678901234567e-5,
    -9.87654321e-300,
    4.9e-324,  # min subnormal
    1.7976931348623157e308,
    123456.78901234567,
    2.0**53 + 2,
    float("nan"),
    float("inf"),
    float("-inf"),
]


def test_dlit_roundtrips_exact(spark):
    """F.expr(_dlit(x)) must produce the bit-identical double to
    F.lit(x) for every shape of double, including non-finite."""
    cols = []
    for i, x in enumerate(DOUBLES):
        cols.append(F.lit(x).alias(f"a{i}"))
        cols.append(F.expr(S._dlit(x)).alias(f"b{i}"))
    row = spark.range(1).select(*cols).collect()[0]
    for i, x in enumerate(DOUBLES):
        a, b = row[f"a{i}"], row[f"b{i}"]
        if math.isnan(x):
            assert math.isnan(a) and math.isnan(b)
        else:
            assert a == b == x
            # distinguish -0.0 from 0.0
            assert math.copysign(1.0, a) == math.copysign(1.0, b)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _centroids_from(emb, k=8):
    init = emb.orderBy("vec_id").limit(k).select("embedding").collect()
    return [[float(x) for x in r[0]] for r in init]


def test_compact_centroid_exprs(spark, emb):
    """New one-expression assignment == old per-centroid trees,
    row-for-row on the real fixture: full (d, ci) struct arrays AND
    the nearest index."""
    cents = _centroids_from(emb)
    rows = emb.select(
        "vec_id",
        _old_centroid_dists(F.col("embedding"), cents).alias("old_d"),
        S._centroid_dists("`embedding`", cents).alias("new_d"),
        _old_nearest(F.col("embedding"), cents).alias("old_c"),
        S._nearest_centroid("`embedding`", cents).alias("new_c"),
    ).collect()
    assert rows
    for r in rows:
        assert r["old_c"] == r["new_c"], r["vec_id"]
        assert [tuple(s) for s in r["old_d"]] == [tuple(s) for s in r["new_d"]]


def test_compact_exprs_on_ties_and_negatives(spark):
    """Degenerate corpus: duplicate vectors (exact distance ties must
    resolve to the LOWEST centroid index in both forms) and negative
    components."""
    data = [
        (1, [1.0, -2.0, 3.0]),
        (2, [1.0, -2.0, 3.0]),  # duplicate of 1
        (3, [-1.0, 2.0, -3.0]),
        (4, [0.0, 0.0, 0.0]),
        (5, [1e-9, -1e9, 2.5]),
    ]
    df = spark.createDataFrame(data, "vec_id long, embedding array<float>")
    # duplicate centroids -> guaranteed ties on every row
    cents = [[1.0, -2.0, 3.0], [1.0, -2.0, 3.0], [0.0, 0.0, 0.0]]
    rows = df.select(
        "vec_id",
        _old_nearest(F.col("embedding"), cents).alias("old_c"),
        S._nearest_centroid("`embedding`", cents).alias("new_c"),
    ).collect()
    for r in rows:
        assert r["old_c"] == r["new_c"]
    # rows 1/2 tie between centroids 0 and 1 -> lowest index wins
    by_id = {r["vec_id"]: r["new_c"] for r in rows}
    assert by_id[1] == 0 and by_id[2] == 0


def _old_lsh_sigs(vec, planes):
    """Pre-r14 per-plane Column-built LSH signatures (the spec): bit
    p of table t = when(scaled_dot(vec, plane_tp) > 0, 2^p) else 0,
    left-folded ascending from a bigint 0."""
    sigs = []
    for t, table in enumerate(planes):
        bucket = F.lit(0).cast("long")
        for p, plane in enumerate(table):
            arr = F.array(*[F.lit(float(x)) for x in plane])
            bit = F.when(S.scaled_dot(vec, arr) > 0, F.lit(2**p)).otherwise(
                F.lit(0)
            )
            bucket = bucket + bit.cast("long")
        sigs.append(
            F.struct(F.lit(t).cast("long").alias("t"), bucket.alias("bucket"))
        )
    return F.array(*sigs)


def test_lsh_signature_parity(spark, emb):
    """r14 one-expression LSH signature array == the old per-plane
    Column loop, row-for-row on the real fixture AND on a degenerate
    corpus (NaN elements -> NULL dot -> bit 0 in both forms; zero and
    negative vectors)."""
    dim = len(emb.select("embedding").first()[0])
    planes = S.hyperplane_tables(3, 8, dim)
    rows = emb.select(
        "vec_id",
        _old_lsh_sigs(F.col("embedding"), planes).alias("old_s"),
        S._lsh_sigs("`embedding`", planes).alias("new_s"),
    ).collect()
    assert rows
    for r in rows:
        assert [tuple(s) for s in r["old_s"]] == [tuple(s) for s in r["new_s"]]

    data = [
        (1, [0.0, 0.0, 0.0]),
        (2, [-1.0, -2.0, 3.5]),
        (3, [float("nan"), 1.0, 2.0]),
        (4, [1e-9, -1e9, 2.5]),
        (5, [float("inf"), 1.0, -1.0]),
    ]
    df = spark.createDataFrame(data, "vec_id long, embedding array<float>")
    planes3 = S.hyperplane_tables(2, 4, 3)
    rows = df.select(
        "vec_id",
        _old_lsh_sigs(F.col("embedding"), planes3).alias("old_s"),
        S._lsh_sigs("`embedding`", planes3).alias("new_s"),
    ).collect()
    for r in rows:
        assert [tuple(s) for s in r["old_s"]] == [tuple(s) for s in r["new_s"]]


def test_sq_l2_sql_matches_column_form(spark, emb):
    """_sq_l2_sql (used by the hoisted ADC LUTs) == the Column-built
    _sq_l2 on sliced fixture vectors."""
    cents = _centroids_from(emb, k=4)
    c0 = cents[0][:8]
    rows = emb.limit(64).select(
        _old_sq_l2(F.slice(F.col("embedding"), 1, 8), c0).alias("a"),
        F.expr(S._sq_l2_sql("slice(`embedding`, 1, 8)", c0)).alias("b"),
    ).collect()
    assert rows and all(r["a"] == r["b"] for r in rows)
