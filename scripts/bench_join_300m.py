#!/usr/bin/env python3
"""300M x 300M join point (round-12, VERDICT r11 #6).

BASELINE.md's join row (reference GPU 3.2 s, DuckDB 18.3 s) is quoted
at 100M x 100M; the per-round bench measures exactly that shape. This
script measures the SAME shape a half-decade up — 300M x 300M, both
planner paths (default AQE sort-merge over the shuffle, and the
bucketed zero-exchange zero-sort layout) — plus a DuckDB control on
the same cores, so the "does the 100M ratio hold at 3x" question is
answered by measurements on one box instead of extrapolation. Run
manually; results recorded in BENCH_SCALE.md.

Each phase runs in its OWN child process (fresh JVM, heap sized to
the phase, crash isolation — the bench.py lesson); the parent only
aggregates the phases' JSON lines.

Usage: python3 scripts/bench_join_300m.py          # ONE JSON line
       python3 scripts/bench_join_300m.py --phase spark_default
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 300_000_000
REPS = 3


def _mk_spark(mem: str, extra: dict | None = None):
    from gpu_olap_engine_spark.config import EngineConfig
    from gpu_olap_engine_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    confs = {
        "spark.driver.extraJavaOptions": (
            f"-Xlog:disable -Xms{mem} -XX:+AlwaysPreTouch"
        ),
        # the r10-measured join-shape confs from bench.py's join100
        # child: zstd shuffle blocks (sequential int keys compress
        # ~3x) and an initial partition count that SCALES with the
        # data (96 was measured best at 100M; keeping 96 at 300M
        # measured 34.9 s vs 17.5 s at 288 — per-task sort state must
        # stay constant as rows grow, the same rule a real cluster
        # follows)
        "spark.io.compression.codec": "zstd",
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum": str(
            96 * N // 100_000_000
        ),
        # r13: no UI in bench children (same hardening as bench.py's
        # _mk_spark — retained execution state is heap the reps need)
        "spark.ui.enabled": "false",
        "spark.sql.ui.retainedExecutions": "4",
    }
    confs.update(extra or {})
    os.environ["SPARK_GRAFT_DRIVER_MEMORY"] = mem
    spark = get_spark(EngineConfig(extra_confs=confs), master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _sides(spark):
    from pyspark.sql import functions as F

    a = spark.range(N, numPartitions=192).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(N, numPartitions=192).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    return a, b


def _warm(spark):
    from pyspark.sql import functions as F

    w = 50_000_000
    wa = spark.range(w, numPartitions=32).select(F.col("id").alias("k"))
    wa.join(
        spark.range(w, numPartitions=32).select(F.col("id").alias("k")), "k"
    ).select(F.count("*").alias("c")).write.format("noop").mode(
        "overwrite"
    ).save()


def phase_spark_default() -> dict:
    from pyspark.sql import functions as F

    spark = _mk_spark("56g")
    _warm(spark)
    a, b = _sides(spark)
    df = a.join(b, "k").select(F.count("*").alias("c"))
    runs = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 3))
    spark.stop()
    return {"spark_default_runs": runs, "spark_default": min(runs)}


def phase_spark_shj() -> dict:
    """Shuffle-hash-hinted path (r13, VERDICT r12 #6): the
    reference's headline claim is specifically a HASH join
    (README.md:319-325, join_kernel.rs:14-18 radix hash default), so
    the like-for-like 300M point needs the no-sort hash path next to
    the default SMJ, exactly as bench.py's join100 group records at
    100M."""
    from pyspark.sql import functions as F

    spark = _mk_spark("56g")
    _warm(spark)
    a, b = _sides(spark)
    df = a.join(b.hint("shuffle_hash"), "k").select(F.count("*").alias("c"))
    runs = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 3))
    spark.stop()
    return {"spark_shj_runs": runs, "spark_shj": min(runs)}


def phase_spark_bucketed() -> dict:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from gpu_olap_engine_spark.sources import write_bucketed

    wh = tempfile.mkdtemp(prefix="join300_wh_")
    spark = _mk_spark("56g", {"spark.sql.warehouse.dir": wh})
    try:
        _warm(spark)
        a, b = _sides(spark)
        t0 = time.perf_counter()
        write_bucketed(a, "j300_a", ["k"], num_buckets=64,
                       sort_cols=["k"], one_file_per_bucket=True)
        write_bucketed(b, "j300_b", ["k"], num_buckets=64,
                       sort_cols=["k"], one_file_per_bucket=True)
        write_sec = round(time.perf_counter() - t0, 1)
        # the sort-free merge is only sound on one-file-per-bucket
        # layouts (bench.py's gate, same rule)
        for t in ("j300_a", "j300_b"):
            loc = (
                spark.sql(f"DESCRIBE TABLE EXTENDED {t}")
                .where("col_name = 'Location'")
                .collect()[0]["data_type"]
            ).replace("file:", "")
            nfiles = len(
                [f for f in os.listdir(loc) if f.endswith(".parquet")]
            )
            if nfiles != 64:
                raise RuntimeError(f"{t}: {nfiles} files for 64 buckets")
        joined = (
            spark.table("j300_a")
            .join(spark.table("j300_b"), "k")
            .select(F.count("*").alias("c"))
        )
        conf_key = "spark.sql.legacy.bucketedTableScan.outputOrdering"
        runs = []
        for _ in range(REPS):
            spark.conf.set(conf_key, "true")
            try:
                t0 = time.perf_counter()
                joined.write.format("noop").mode("overwrite").save()
                runs.append(round(time.perf_counter() - t0, 3))
            finally:
                spark.conf.unset(conf_key)
        return {
            "spark_bucketed_runs": runs,
            "spark_bucketed": min(runs),
            "bucketed_write_sec": write_sec,
        }
    finally:
        try:
            for t in ("j300_a", "j300_b"):
                spark.sql(f"DROP TABLE IF EXISTS {t}")
            spark.stop()
        except Exception:  # noqa: BLE001
            pass
        shutil.rmtree(wh, ignore_errors=True)


def phase_duckdb() -> dict:
    import duckdb

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    con = duckdb.connect()
    con.execute(f"PRAGMA threads={cpus}")
    con.execute("SET preserve_insertion_order=false")
    wn = N // 10
    con.sql(
        f"SELECT count(*) FROM range({wn}) a JOIN range({wn}) b"
        " ON a.range = b.range"
    ).fetchall()
    sql = (
        f"SELECT count(*) AS c FROM "
        f"(SELECT range AS k, range * 2 AS va FROM range({N})) a JOIN "
        f"(SELECT range AS k, range * 3 AS vb FROM range({N})) b USING (k)"
    )
    runs = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        con.sql(sql).fetchall()
        runs.append(round(time.perf_counter() - t0, 3))
    con.close()
    return {"duckdb_runs": runs, "duckdb_control": min(runs)}


PHASES = {
    "spark_default": phase_spark_default,
    "spark_shj": phase_spark_shj,
    "spark_bucketed": phase_spark_bucketed,
    "duckdb": phase_duckdb,
}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--phase", choices=list(PHASES))
    args = p.parse_args()
    if args.phase:
        print(json.dumps(PHASES[args.phase]()))
        return
    out = {"metric": "join_300m_x_300m", "unit": "sec", "n": N,
           "baseline_100m": {"gpu_sec": 3.2, "duckdb_cpu_sec": 18.3}}
    # duckdb first (bench.py lesson: it exits fully before any JVM
    # inflates a pre-touched heap; the reverse order poisons it)
    for phase in ("duckdb", "spark_default", "spark_shj", "spark_bucketed"):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--phase", phase],
            stdout=subprocess.PIPE,
            stderr=sys.stderr,
            timeout=1800,
            check=False,
        )
        if r.returncode == 0:
            try:
                out.update(json.loads(r.stdout.decode().strip().splitlines()[-1]))
            except Exception:  # noqa: BLE001
                out[f"{phase}_error"] = "unparseable child output"
        else:
            out[f"{phase}_error"] = f"rc {r.returncode}"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
