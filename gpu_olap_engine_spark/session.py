"""SparkSession construction for the engine and tests."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from gpu_olap_engine_spark.config import EngineConfig


def _default_openblas_coretype() -> None:
    """Work around OpenBLAS's runtime CPU misdetection on this VM
    class (r12): numpy's bundled OpenBLAS (DYNAMIC_ARCH) dispatches
    HASWELL kernels on an AVX512 guest — measured 25 GFLOP/s vs
    91 GFLOP/s with the SKYLAKEX kernels it also ships (3.6x on the
    near-dup bound-scan sgemm). Setting OPENBLAS_CORETYPE before the
    JVM launches propagates to every Python worker the executors
    spawn. Gated on the full SKX flag set in /proc/cpuinfo and on the
    user not having chosen a coretype; numerically safe for the
    engine: the only f32 GEMM consumer is the near-dup PREFILTER,
    whose error margin (_f32_margin) covers any standard summation
    order — survivors are decided by the exact integer path, so
    operator output is bit-identical under either kernel set."""
    if "OPENBLAS_CORETYPE" in os.environ:
        return
    try:
        with open("/proc/cpuinfo") as f:
            flags = f.read()
    except OSError:
        return
    if all(x in flags for x in ("avx512f", "avx512bw", "avx512vl", "avx512dq")):
        os.environ["OPENBLAS_CORETYPE"] = "SKYLAKEX"


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
    _default_openblas_coretype()  # before the JVM inherits our env
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
