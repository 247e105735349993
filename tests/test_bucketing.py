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


def test_clustered_write_yields_disjoint_file_ranges(spark, tmp_path):
    """write_clustered range-partitions + sorts, so every parquet file
    carries a disjoint min/max range of the cluster key — the footer
    stats any reader uses to skip whole files on a range predicate."""
    import pyarrow.parquet as pq

    from gpu_olap_engine_spark.sources import write_clustered

    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    out = str(tmp_path / "orders_by_total")
    write_clustered(orders, out, ["o_totalprice"], target_files=8)

    ranges = []
    import os

    for f in os.listdir(out):
        if not f.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(out, f))
        schema_idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        ci = schema_idx["o_totalprice"]
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) > 1
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, (hi1, lo2)  # files cover disjoint key ranges
    # row preservation
    back = spark.read.parquet(out)
    assert back.count() == orders.count()


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


def test_ann_probe_prunes_to_one_bucket_partition(spark, tmp_path):
    """The ANN docstrings claim "at 100 TB, write the corpus
    partitioned by bucket so a probe is a single-partition scan" —
    prove it: embeddings written partitioned by sign_bucket, a probe
    filtered to one bucket plans with a PartitionFilter (footer-level
    pruning, not a post-scan filter) and returns exactly that
    bucket's members."""
    from gpu_olap_engine_spark.operators import similarity as S

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    bucketed = emb.withColumn("bucket", S.sign_bucket(F.col("embedding"), 3))
    path = str(tmp_path / "emb_by_bucket")
    bucketed.write.partitionBy("bucket").parquet(path)

    probe = spark.read.parquet(path).filter(F.col("bucket") == 3)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probe.explain()
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "bucket" in plan
    want = bucketed.filter(F.col("bucket") == 3).count()
    assert probe.count() == want and want > 0


def test_zordered_write_localizes_all_dimensions(spark, tmp_path):
    """Z-order vs single-key clustering: after write_zordered on
    (user_id, value), EACH file's min/max span on BOTH columns must be
    a small fraction of the global range — that per-file tightness is
    exactly what parquet footer stats need to prune files for
    predicates on either column. A single-key clustered layout gets
    this only for its leading key (checked as the contrast)."""
    from pyspark.sql import functions as F

    from gpu_olap_engine_spark.sources import write_clustered, write_zordered

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet").select(
        "event_id", "user_id", "value"
    )
    glb = ev.agg(
        (F.max("user_id") - F.min("user_id")).alias("u_span"),
        (F.max("value") - F.min("value")).alias("v_span"),
    ).collect()[0]

    def file_spans(path):
        df = spark.read.parquet(path).withColumn(
            "f", F.input_file_name()
        )
        rows = (
            df.groupBy("f")
            .agg(
                (F.max("user_id") - F.min("user_id")).alias("us"),
                (F.max("value") - F.min("value")).alias("vs"),
            )
            .collect()
        )
        n = len(rows)
        return (
            sum(r["us"] for r in rows) / n / glb["u_span"],
            sum(r["vs"] for r in rows) / n / glb["v_span"],
            n,
        )

    zpath = str(tmp_path / "z")
    write_zordered(ev, zpath, ["user_id", "value"], target_files=16)
    zu, zv, zn = file_spans(zpath)
    assert zn >= 8
    # each file covers a hyper-rectangle: BOTH dims localized
    assert zu < 0.5, f"z-order user_id avg span {zu:.2f} not localized"
    assert zv < 0.5, f"z-order value avg span {zv:.2f} not localized"

    cpath = str(tmp_path / "c")
    write_clustered(ev, cpath, ["user_id"], target_files=16)
    cu, cv, _ = file_spans(cpath)
    assert cu < 0.2  # leading key: tightly clustered
    # non-leading key: no locality (span stays near a random sample's —
    # value has heavy-tailed outliers, so "no locality" lands around
    # 0.6-0.9 of global, still ~2x+ looser than the z-ordered layout)
    assert cv > 2 * zv, f"clustered value span {cv:.2f} vs z-order {zv:.2f}"


def test_zorder_box_query_skips_row_groups(spark, tmp_path):
    """Measured skip, not just layout stats: a 2-D box predicate over a
    z-ordered table must DECODE far fewer rows than the same predicate
    over a randomly-laid-out copy of the same data. scan_metrics reads
    numOutputRows off the executed scan node — rows surviving parquet
    row-group/page skipping from the pushed min/max filters — so this
    asserts the end-to-end pruning machinery (Morton layout -> footer
    stats -> pushdown -> skip), the behavior q129 relies on at scale."""
    from pyspark.sql import functions as F

    from gpu_olap_engine_spark.plans import scan_metrics
    from gpu_olap_engine_spark.sources import write_zordered

    n = 200_000
    base = spark.range(n, numPartitions=8).select(
        (F.col("id") % 1000).alias("x"),
        ((F.col("id") * 7919) % 1000).alias("y"),
    )
    zpath, rpath = str(tmp_path / "z"), str(tmp_path / "r")
    write_zordered(base, zpath, ["x", "y"], target_files=16)
    base.repartition(16).write.parquet(rpath)  # round-robin: no locality

    pred = "x BETWEEN 100 AND 199 AND y BETWEEN 100 AND 199"
    zrows = scan_metrics(spark.read.parquet(zpath).filter(pred))[0]
    rrows = scan_metrics(spark.read.parquet(rpath).filter(pred))[0]
    assert rrows["numOutputRows"] == n  # random layout decodes everything
    # the box is 1% of the key space; a 16-file z-order layout confines
    # it to a handful of row groups — at least 4x fewer decoded rows
    assert zrows["numOutputRows"] * 4 <= rrows["numOutputRows"], (
        f"z-order decoded {zrows['numOutputRows']} of {n} rows"
    )
    # same answer both ways (the layout must never change results)
    zc = spark.read.parquet(zpath).filter(pred).count()
    rc = spark.read.parquet(rpath).filter(pred).count()
    assert zc == rc > 0


def test_sorted_single_file_buckets_drop_the_sort(spark):
    """r9: one sorted file per bucket + the legacy outputOrdering conf
    must plan the bucketed equi-join with NEITHER an Exchange NOR a
    Sort — the SortMergeJoin zipper-merges pre-sorted buckets (the
    bench's "zero-exchange" micro was silently re-sorting 2 x 100M
    rows before this). Results must match the plain join exactly."""
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    old = spark.conf.get(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "false"
    )
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try:
        write_bucketed(
            orders, "orders_sb", ["o_custkey"], num_buckets=8,
            sort_cols=["o_custkey"], one_file_per_bucket=True,
        )
        write_bucketed(
            orders.select(
                F.col("o_custkey").alias("c2"),
                F.col("o_totalprice").alias("p2"),
            ),
            "orders_sb2", ["c2"], num_buckets=8,
            sort_cols=["c2"], one_file_per_bucket=True,
        )
        a, b = spark.table("orders_sb"), spark.table("orders_sb2")
        j = a.join(b.hint("merge"), a.o_custkey == b.c2)
        plan = plan_string(j, "simple")
        assert "Exchange" not in plan, plan
        assert "Sort" not in plan.replace("SortMergeJoin", "SMJ"), plan
        want = orders.alias("x").join(
            orders.alias("y"),
            F.col("x.o_custkey") == F.col("y.o_custkey"),
        ).count()
        assert j.count() == want
    finally:
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", old
        )
        spark.sql("DROP TABLE IF EXISTS orders_sb")
        spark.sql("DROP TABLE IF EXISTS orders_sb2")


def test_one_file_per_bucket_rejects_max_records_per_file(spark):
    """r10 (ADVICE r9): a non-zero spark.sql.files.maxRecordsPerFile
    splits each bucket's single write task into multiple sorted files,
    silently voiding the one-file layout the legacy outputOrdering
    conf depends on — write_bucketed must refuse rather than let a
    later sort-free merge join return wrong rows."""
    import pytest

    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "100")
    try:
        with pytest.raises(ValueError, match="maxRecordsPerFile"):
            write_bucketed(
                orders, "orders_mrpf", ["o_custkey"], num_buckets=4,
                sort_cols=["o_custkey"], one_file_per_bucket=True,
            )
    finally:
        spark.conf.set("spark.sql.files.maxRecordsPerFile", "0")
        spark.sql("DROP TABLE IF EXISTS orders_mrpf")
    # multi-file buckets without the flag remain fine
    write_bucketed(
        orders, "orders_mrpf", ["o_custkey"], num_buckets=4,
        sort_cols=["o_custkey"],
    )
    assert spark.table("orders_mrpf").count() == orders.count()
    spark.sql("DROP TABLE IF EXISTS orders_mrpf")


def test_files_per_task_keeps_one_file_per_bucket(spark):
    """r11: packing multiple COMPLETE buckets per write task
    (files_per_task > 1) must leave the layout indistinguishable —
    exactly num_buckets sorted files, a zero-exchange zero-sort merge
    join, identical results — because hash % ntasks is determined by
    the bucket id whenever ntasks divides num_buckets. A
    non-dividing files_per_task would split buckets across tasks
    (multi-file buckets, ordering soundness gone) and must be
    refused."""
    import os as _os

    import pytest

    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    old = spark.conf.get(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "false"
    )
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try:
        write_bucketed(
            orders, "orders_fpt", ["o_custkey"], num_buckets=16,
            sort_cols=["o_custkey"], one_file_per_bucket=True,
            files_per_task=4,  # 4 write tasks, 4 whole buckets each
        )
        write_bucketed(
            orders.select(
                F.col("o_custkey").alias("c2"),
                F.col("o_totalprice").alias("p2"),
            ),
            "orders_fpt2", ["c2"], num_buckets=16,
            sort_cols=["c2"], one_file_per_bucket=True, files_per_task=4,
        )
        for t in ("orders_fpt", "orders_fpt2"):
            loc = (
                spark.sql(f"DESCRIBE TABLE EXTENDED {t}")
                .where("col_name = 'Location'")
                .collect()[0]["data_type"]
            ).replace("file:", "")
            nfiles = len(
                [f for f in _os.listdir(loc) if f.endswith(".parquet")]
            )
            assert nfiles == 16, f"{t}: {nfiles} files for 16 buckets"
        a, b = spark.table("orders_fpt"), spark.table("orders_fpt2")
        j = a.join(b.hint("merge"), a.o_custkey == b.c2)
        plan = plan_string(j, "simple")
        assert "Exchange" not in plan, plan
        assert "Sort" not in plan.replace("SortMergeJoin", "SMJ"), plan
        want = orders.alias("x").join(
            orders.alias("y"),
            F.col("x.o_custkey") == F.col("y.o_custkey"),
        ).count()
        assert j.count() == want

        with pytest.raises(ValueError, match="divide"):
            write_bucketed(
                orders, "orders_fpt3", ["o_custkey"], num_buckets=16,
                sort_cols=["o_custkey"], one_file_per_bucket=True,
                files_per_task=3,
            )
    finally:
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", old
        )
        for t in ("orders_fpt", "orders_fpt2", "orders_fpt3"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
