"""Storage-layer queries: snapshot-table MERGE and z-ordered layout.

These make the round-6 storage features *gated behaviors* (driver
oracle-checks the results) rather than unit-tested utilities only:

* q128 builds a snapshot table (sources.table_format) from `orders`,
  MERGEs an update+insert batch into it, and aggregates the merged
  snapshot; the oracle recomputes the merge relationally (anti-join +
  union) in DuckDB. Proves the commit-log MERGE path end-to-end.
* q129 writes `orders` z-order-clustered on (o_custkey, o_totalprice)
  (sources.write_zordered), reads it back through a 2-D box predicate,
  and returns the matching rows; the oracle runs the same predicate on
  the source. Proves the Morton layout round-trips bit-exactly; the
  locality/row-group-skip effect is asserted in tests/test_bucketing.
* q130 mutates a snapshot table twice (DELETE, compact) and reads
  VERSION 0 back — time travel gated against the untouched source.

The reference has no mutation or layout surface (parser.rs:18-21 is
SELECT-only; results never persist, README.md:288-315) — both
capabilities are additions a 100 TB deployment cannot run without.

Both queries materialize their (small) result and return it as a
local DataFrame so the scratch table directory can be removed before
returning — a lazily-evaluated result over deleted files would fail
at the driver's collect.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpu_olap_engine_spark.queries import register
from gpu_olap_engine_spark.queries.tables import T
from gpu_olap_engine_spark.sources import table_format as tf
from gpu_olap_engine_spark.sources import write_zordered


def _materialize(df: DataFrame) -> DataFrame:
    """Collect a small result and rebuild it schema-identically, so the
    caller can delete the scratch files the lazy plan referenced."""
    return df.sparkSession.createDataFrame(df.collect(), schema=df.schema)


@register(
    "q128_table_merge_snapshot",
    oracle="""
    WITH updates AS (
        SELECT * REPLACE (o_totalprice * 2 AS o_totalprice)
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT * REPLACE (o_orderkey + 100000000 AS o_orderkey)
        FROM orders WHERE o_orderkey % 97 = 0
    ),
    merged AS (
        SELECT o.* FROM orders o
        WHERE NOT EXISTS (
            SELECT 1 FROM updates u WHERE u.o_orderkey = o.o_orderkey
        )
        UNION ALL
        SELECT * FROM updates
    )
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS sum_price
    FROM merged
    GROUP BY o_orderstatus
    """,
)
def q128(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-table MERGE end-to-end: create a commit-log table from
    `orders`, merge a batch that reprices every 10th order (matched ->
    replace) and inserts late-arriving orders under shifted keys
    (unmatched -> insert) as ONE atomic commit, then aggregate the
    merged snapshot. The whole mutation path — txn file write, manifest
    publish, file-granular rewrite — sits between the source scan and
    the checked result, so a wrong merge cannot hash-match the oracle's
    relational recomputation. Doubling a double and the decimal-cast
    sum are bit-exact on both engines (tables.py conventions)."""
    orders = T(spark, sf_dir, "orders")
    updates = orders.filter(F.col("o_orderkey") % 10 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    ).unionByName(
        orders.filter(F.col("o_orderkey") % 97 == 0).withColumn(
            "o_orderkey", F.col("o_orderkey") + 100_000_000
        )
    )
    scratch = tempfile.mkdtemp(prefix="q128_tf_")
    try:
        path = f"{scratch}/orders_t"
        tf.create_table(orders, path)
        tf.merge_into(spark, path, updates, ["o_orderkey"])
        merged = tf.read_snapshot(spark, path)
        return _materialize(
            merged.groupBy("o_orderstatus").agg(
                F.count("*").alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
                .cast("double")
                .alias("sum_price"),
            )
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@register(
    "q130_table_time_travel",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS sum_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q130(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel as a gated behavior: create a snapshot table from
    `orders`, DELETE half of it (version 1), compact the survivor
    files (version 2) — then read VERSION 0 and aggregate. The oracle
    aggregates the untouched source, so any leakage of the later
    mutations into the old snapshot (a rewritten file, wrong manifest
    resolution, a compaction touching referenced files) hash-
    mismatches. The reference cannot express any of this (SELECT-only
    parser, parser.rs:18-21; results never persist)."""
    orders = T(spark, sf_dir, "orders")
    scratch = tempfile.mkdtemp(prefix="q130_tt_")
    try:
        path = f"{scratch}/orders_t"
        tf.create_table(orders, path)
        tf.delete_where(spark, path, "o_orderkey % 2 = 0")
        tf.compact_table(spark, path, target_files=2)
        v0 = tf.read_snapshot(spark, path, version=0)
        return _materialize(
            v0.groupBy("o_orderpriority").agg(
                F.count("*").alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
                .cast("double")
                .alias("sum_price"),
            )
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@register(
    "q129_zorder_pruned_scan",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_custkey BETWEEN 100 AND 200
      AND o_totalprice BETWEEN 50000 AND 100000
    """,
)
def q129(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout round-trip under a 2-D box predicate: write
    `orders` Morton-clustered on (o_custkey, o_totalprice), read back
    through BETWEEN predicates on BOTH dimensions, return the matching
    rows. Correctness gate for the layout tool (the code is metadata
    only — any normalization bug that leaked into data would
    hash-mismatch here); the scan-efficiency effect (matching rows
    concentrated in few files, row groups elsewhere skipped via
    footer stats + pushed filters) is asserted separately in
    tests/test_bucketing.py::test_zorder_concentrates_box_query."""
    orders = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    scratch = tempfile.mkdtemp(prefix="q129_z_")
    try:
        write_zordered(
            orders, scratch + "/z", ["o_custkey", "o_totalprice"], target_files=8
        )
        back = spark.read.parquet(scratch + "/z").filter(
            F.col("o_custkey").between(100, 200)
            & F.col("o_totalprice").between(50000.0, 100000.0)
        )
        return _materialize(back)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@register(
    "q134_table_skipping_evolved",
    oracle="""
    WITH snap AS (
        SELECT o_totalprice, CAST(NULL AS VARCHAR) AS channel FROM orders
        UNION ALL
        SELECT o_totalprice, 'late' AS channel
        FROM orders WHERE o_orderkey % 13 = 0
    )
    SELECT channel,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS sum_price
    FROM snap
    WHERE o_totalprice < 50000
    GROUP BY channel
    """,
)
def q134(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest data skipping + schema evolution, gated end-to-end:
    create a snapshot table from `orders` range-clustered on
    o_totalprice (tight per-file stat ranges), evolve its schema by
    appending a 'late' batch carrying a NEW `channel` column
    (merge_schema=True — pre-evolution rows must surface NULL), then
    read through a price predicate that the manifest prunes at file
    level AND applies row-level, aggregating by the evolved column.
    A stats bug that over-prunes loses rows; an evolution bug that
    misaligns columns or drops the NULL backfill changes the group
    keys — either hash-mismatches the oracle's relational twin. File-
    level skip counts are asserted in tests/test_table_format.py."""
    orders = T(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    late = orders.filter(F.col("o_orderkey") % 13 == 0).withColumn(
        "channel", F.lit("late")
    )
    scratch = tempfile.mkdtemp(prefix="q134_ds_")
    try:
        path = f"{scratch}/orders_t"
        tf.create_table(orders.repartitionByRange(8, "o_totalprice"), path)
        tf.append_table(late, path, merge_schema=True)
        snap = tf.read_snapshot(
            spark, path, predicate=[("o_totalprice", "<", 50000.0)]
        )
        return _materialize(
            snap.groupBy("channel").agg(
                F.count("*").alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
                .cast("double")
                .alias("sum_price"),
            )
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@register(
    "q137_table_change_feed",
    oracle="""
    WITH upd AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice * 2 AS o_totalprice
        FROM orders WHERE o_orderkey % 10 = 0
    ),
    final AS (
        SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice
        FROM orders o WHERE NOT EXISTS (
            SELECT 1 FROM upd u WHERE u.o_orderkey = o.o_orderkey
        )
        UNION ALL
        SELECT * FROM upd
    )
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS sum_price
    FROM final
    GROUP BY o_orderstatus
    """,
)
def q137(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed round-trip, gated end-to-end: create a
    snapshot table from `orders`, MERGE a repricing batch, then
    reconstruct the FINAL state purely as
    ``state(v0) - feed.deletes + feed.inserts`` (multiset algebra via
    unionByName + exceptAll — never reading the final snapshot
    directly) and aggregate it. The oracle computes the final state
    relationally, so a feed that misses a rewritten file, stamps the
    wrong side, or leaks a phantom row cannot reconstruct a
    hash-matching state. This is the incremental-sync primitive: a
    downstream consumer at 100 TB reads only changed files
    (manifest diff, metadata-only), not the table."""
    orders = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    updates = orders.filter(F.col("o_orderkey") % 10 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    scratch = tempfile.mkdtemp(prefix="q137_cdf_")
    try:
        path = f"{scratch}/orders_t"
        tf.create_table(orders, path)
        tf.merge_into(spark, path, updates, ["o_orderkey"])
        feed = tf.table_changes(spark, path, 0)
        cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
        ins = feed.filter(F.col("_change_type") == "insert").select(*cols)
        dels = feed.filter(F.col("_change_type") == "delete").select(*cols)
        state = (
            tf.read_snapshot(spark, path, version=0)
            .select(*cols)
            .exceptAll(dels)
            .unionByName(ins)
        )
        return _materialize(
            state.groupBy("o_orderstatus").agg(
                F.count("*").alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
                .cast("double")
                .alias("sum_price"),
            )
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@register(
    "q140_table_incremental_sync",
    oracle="""
    WITH upd AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice * 3 AS o_totalprice
        FROM orders WHERE o_orderkey % 7 = 0
    ),
    final AS (
        SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice
        FROM orders o
        WHERE NOT EXISTS (
            SELECT 1 FROM upd u WHERE u.o_orderkey = o.o_orderkey
        ) AND o.o_orderkey % 11 != 0
        UNION ALL
        SELECT * FROM upd WHERE o_orderkey % 11 != 0
    )
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS sum_price
    FROM final
    GROUP BY o_orderstatus
    """,
)
def q140(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full replication chain as one gated behavior: snapshot
    source from `orders`; first incremental_sync full-copies it into
    an empty destination; the source then takes a MERGE (reprice every
    7th order) and a DELETE (every 11th); a second sync moves ONLY the
    net per-key changes (manifest-diff feed -> keyed CDC apply with
    the cursor in the destination's own ledger). The oracle computes
    the final source state relationally and the result is aggregated
    from the DESTINATION — a sync that loses a delete, double-applies
    an upsert, or mis-advances its cursor cannot hash-match."""
    orders = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    updates = orders.filter(F.col("o_orderkey") % 7 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 3
    )
    scratch = tempfile.mkdtemp(prefix="q140_sync_")
    try:
        src, dst = f"{scratch}/src", f"{scratch}/dst"
        tf.create_table(orders, src)
        tf.create_table(orders.limit(0), dst)
        tf.incremental_sync(spark, src, dst, ["o_orderkey"])
        tf.merge_into(spark, src, updates, ["o_orderkey"])
        tf.delete_where(spark, src, "o_orderkey % 11 = 0")
        tf.incremental_sync(spark, src, dst, ["o_orderkey"])
        return _materialize(
            tf.read_snapshot(spark, dst).groupBy("o_orderstatus").agg(
                F.count("*").alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
                .cast("double")
                .alias("sum_price"),
            )
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


@register(
    "q160_table_bloom_lookup",
    oracle="""
    WITH sel AS (
        SELECT o_orderkey FROM orders WHERE o_orderkey % 7 = 0
        ORDER BY o_orderkey LIMIT 8
    )
    SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus, o.o_totalprice
    FROM orders o JOIN sel s ON s.o_orderkey = o.o_orderkey
    """,
)
def q160(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter point lookups through the snapshot table: create a
    commit-log table from `orders` with the rows round-robined across
    8 files — every file's o_orderkey range spans the whole domain, so
    min/max stats can never exclude a file — then look up 8 keys
    through `read_snapshot(predicate=...)`. Each probe must plan from
    the per-file Bloom filters (manifest-only; the query raises if a
    probe fails to skip files, so a silently broken filter cannot
    hash-match). The oracle recomputes the same lookups relationally
    from the raw table. The 8-key collect is bounded metadata (the
    probe list), not data movement. At 100 TB this is the difference
    between a point read touching O(1) files and planning the whole
    manifest."""
    orders = T(spark, sf_dir, "orders")
    keys = [
        r["o_orderkey"]
        for r in orders.filter(F.col("o_orderkey") % 7 == 0)
        .select("o_orderkey")
        .orderBy("o_orderkey")
        .limit(8)
        .collect()
    ]
    scratch = tempfile.mkdtemp(prefix="q160_tf_")
    try:
        path = f"{scratch}/orders_bloom"
        tf.create_table(
            orders.repartition(8), path, bloom_columns=["o_orderkey"]
        )
        parts = []
        for k in keys:
            kept, total = tf.prune_files(path, None, [("o_orderkey", "=", k)])
            if not (len(kept) < total):
                raise AssertionError(
                    f"bloom skipping inactive: {len(kept)}/{total} files "
                    f"survived the probe for key {k}"
                )
            parts.append(
                tf.read_snapshot(
                    spark, path, predicate=[("o_orderkey", "=", k)]
                ).select(
                    "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return _materialize(out)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
