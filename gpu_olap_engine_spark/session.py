"""SparkSession construction for the engine and tests."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from gpu_olap_engine_spark.config import EngineConfig


def get_spark(
    config: EngineConfig | None = None,
    app_name: str = "gpu-olap-engine-spark",
    master: str | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's confs applied.

    Static confs only take effect on the first build in a JVM; dynamic
    SQL confs (shuffle partitions, AQE, Arrow) are re-applied to a
    reused session so a driver-provided session still behaves.
    """
    config = config or EngineConfig()
    master = master or os.environ.get(
        "SPARK_GRAFT_MASTER", f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
    )
    builder = SparkSession.builder.appName(app_name).master(master)
    for k, v in config.spark_confs().items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    apply_runtime_confs(spark, config)
    return spark


def apply_runtime_confs(spark: SparkSession, config: EngineConfig | None = None) -> None:
    """Apply dynamic SQL confs to an existing session (e.g. the
    driver's). Safe to call repeatedly; only touches runtime-settable
    confs."""
    config = config or EngineConfig()
    for k, v in config.spark_confs().items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on a live session - keep session's value
