"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query smoke check on sf0.001.
queries()      — name -> (spark, sf_dir) -> DataFrame, one per
                 implemented operator (SURVEY.md §2 + LLM-pipeline set).
oracle_sql()   — name -> equivalent DuckDB SQL over the same tables.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gpu_olap_engine_spark.queries import load_all  # noqa: E402
from gpu_olap_engine_spark.session import apply_runtime_confs  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference README's
    canonical join+agg+sort+limit shape (README.md:272-282)."""
    apply_runtime_confs(spark)
    fn = load_all()["q03_join_agg_topk"].fn
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_runtime_confs(spark)  # pin UTC + AQE on the driver's session
            return fn(spark, sf_dir)

        return run

    return {name: wrap(q.fn) for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins; entries absent for non-SQL-expressible ops
    (driver records a rows-only check for those)."""
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
