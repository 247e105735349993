"""Engine configuration, mirroring the reference's ``EngineConfig``.

Reference: ``gpu-olap-core/src/lib.rs:19-43`` — fields
``max_gpu_memory`` (8 GB), ``num_streams`` (8), ``use_unified_memory``
(true), ``batch_size`` (1 M rows), ``enable_cache`` (true).

Each field is accepted for API fidelity and mapped to the Spark conf
that plays the same role (or ignored-with-log where Spark's runtime
already owns the concern) — see ``EngineConfig.spark_confs``.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

log = logging.getLogger(__name__)

_DEFAULT_SHUFFLE_PARTITIONS = 32


@dataclass
class EngineConfig:
    """Reference-parity engine knobs mapped onto Spark confs.

    max_gpu_memory   -> informational only: executor memory is fixed at
                        session launch; Spark spills to disk when an
                        operator exceeds it (unified-memory analog).
    num_streams      -> concurrency hint; scales shuffle partitions
                        (the reference used N CUDA streams to overlap
                        transfer/compute; Spark overlaps via tasks).
    use_unified_memory -> ignored: Spark joins/aggs/sorts always spill.
    batch_size       -> Arrow interchange batch size
                        (spark.sql.execution.arrow.maxRecordsPerBatch),
                        the unit of Python<->JVM columnar flow, which is
                        what the reference's batch paging governed.
    enable_cache     -> when True, small tables (< cache_row_threshold
                        rows, the reference's <10M-row RAM cache,
                        catalog.rs:49-59) are ``.cache()``d on load.
    """

    max_gpu_memory: int = 8 * 1024**3
    num_streams: int = 8
    use_unified_memory: bool = True
    batch_size: int = 1_000_000
    enable_cache: bool = True
    # Spark-native extras (not in the reference):
    shuffle_partitions: int = _DEFAULT_SHUFFLE_PARTITIONS
    cache_row_threshold: int = 10_000_000
    # Broadcast-join size threshold (bytes). The reference broadcasts
    # builds <= 1M rows (join_kernel.rs:71-77); Spark thresholds by
    # bytes — 10 MB default is roughly that row count at 8B/row.
    broadcast_threshold: int = 10 * 1024**2
    # Driver JVM heap (static conf: applies at session build only).
    # Local-mode executors live in the driver JVM and the 1g default
    # heap cannot hold shuffle state for 100M-row operators.
    # None (default) -> $SPARK_GRAFT_DRIVER_MEMORY if set, else 24g;
    # "" (or SPARK_GRAFT_DRIVER_MEMORY="") -> emit no driver-memory
    # conf at all, leaving Spark's own setting intact (small hosts,
    # user-tuned deployments).
    driver_memory: str | None = None
    # AQE coalescing starts from this many shuffle partitions and
    # shrinks to the advisory size at runtime. Starting wide matters:
    # a 100M-row-per-side join at 32 static partitions puts ~1.6 GB in
    # each sort and thrashes (measured 37-58 s locally); at 256 initial
    # partitions AQE coalesces to ~40 right-sized ones and the same
    # join runs in single-digit seconds. At 100 TB this is the knob
    # that keeps per-task state bounded as data grows: partitions
    # start wide and AQE, not the user, picks the final count.
    # 0 (default) -> num_streams x shuffle_partitions (num_streams is
    # the reference's intra-device concurrency knob, lib.rs:19-43:
    # N CUDA streams overlapping transfer/compute; Spark's analog of
    # "more streams" is a wider initial shuffle for AQE to coalesce,
    # so the knob scales the same dial — default 8 keeps the 8x
    # behavior every prior round shipped with).
    aqe_initial_partitions: int = 0
    extra_confs: dict[str, str] = field(default_factory=dict)

    def spark_confs(self) -> dict[str, str]:
        """Spark confs implementing this config (see class docstring)."""
        import os

        driver_mem = (
            self.driver_memory
            if self.driver_memory is not None
            else os.environ.get("SPARK_GRAFT_DRIVER_MEMORY", "24g")
        )
        initial = self.aqe_initial_partitions or max(
            self.num_streams, 1
        ) * self.shuffle_partitions
        confs = {
            "spark.sql.shuffle.partitions": str(self.shuffle_partitions),
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum": str(
                max(initial, self.shuffle_partitions)
            ),
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.coalescePartitions.enabled": "true",
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.execution.arrow.pyspark.enabled": "true",
            "spark.sql.execution.arrow.maxRecordsPerBatch": str(self.batch_size),
            "spark.sql.session.timeZone": "UTC",
            # Classic (non-ANSI) SQL semantics: x/0 -> NULL, lenient
            # casts. A deliberate engine choice: 100 TB pipelines want
            # NULL-tolerant expressions, not row-level runtime errors
            # (and the reference's /0 -> 0, executor.rs:434, is upgraded
            # to NULL — documented in SURVEY.md §1.2).
            "spark.sql.ansi.enabled": "false",
            # Parquet vectorized reader on; filter/column pushdown on
            # (Spark defaults, pinned here because the whole design
            # depends on scans being pruned at 100 TB).
            "spark.sql.parquet.filterPushdown": "true",
            "spark.sql.autoBroadcastJoinThreshold": str(self.broadcast_threshold),
        }
        if driver_mem:
            confs["spark.driver.memory"] = driver_mem
        if not self.use_unified_memory:
            log.info("use_unified_memory=False ignored: Spark always spills")
        confs.update(self.extra_confs)
        return confs
