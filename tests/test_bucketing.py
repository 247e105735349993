"""Bucketed tables: the persistent shuffle-free join path.

This is the write-once analog of the reference's per-query radix
partitioning (join_kernels.cuh:45-76): both sides pre-hashed into the
same bucket layout, so the recurring join plans with ZERO exchanges.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gpu_olap_engine_spark.plans import plan_string
from gpu_olap_engine_spark.sources import write_bucketed
from tests.conftest import SF_SMALL


def test_bucketed_join_has_no_shuffle(spark):
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    customer = spark.read.parquet(f"{SF_SMALL}/customer.parquet")
    write_bucketed(orders, "orders_b", ["o_custkey"], num_buckets=8)
    write_bucketed(customer, "customer_b", ["c_custkey"], num_buckets=8)
    try:
        ob, cb = spark.table("orders_b"), spark.table("customer_b")
        joined = ob.join(
            cb.hint("merge"), ob.o_custkey == cb.c_custkey
        ).select("o_orderkey", "c_name")
        plan = plan_string(joined, "simple")
        assert "Exchange" not in plan, plan  # bucket layout replaces the shuffle
        assert joined.count() == orders.join(
            customer, orders.o_custkey == customer.c_custkey
        ).count()
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")


def test_polars_path_is_import_gated(spark):
    """query_polars requires the optional polars dep; without it the
    error is an ImportError at call time, not at engine import."""
    from gpu_olap_engine_spark.engine import OlapEngine

    eng = OlapEngine(spark=spark)
    try:
        import polars  # noqa: F401

        has_polars = True
    except ImportError:
        has_polars = False
    if not has_polars:
        import pytest

        with pytest.raises(ImportError):
            eng.query_polars(object(), "SELECT 1")
