#!/usr/bin/env python3
"""100M-row global sort point (round-13).

BASELINE.md's fourth prose claim (PROJECT_SUMMARY.md:148: "Sort 5-8x
[vs CPU], GPU radix sort") is the only baseline row that had no
recorded measurement on this engine. This script records the shape:
sort 100M hash-scrambled int64 keys into a single global order.

- Spark: `orderBy` over xxhash64(id) — the distributed sort (range
  partitioner sampling + per-partition Tungsten sort), consumed by
  the noop sink (all rows pass the sort, nothing materializes).
- DuckDB control (same cores): CTAS of the ORDER BY into a temp
  table. preserve_insertion_order stays at its default (true) so the
  ORDER BY is physically honored; the ~800 MB temp-table
  materialization is the cheapest consumption DuckDB cannot optimize
  away (noted asymmetry vs Spark's discard sink — it taxes DuckDB a
  memcpy-level write, small against the n log n sort).

The GPU claim is a RATIO (5-8x over CPU), so the recorded comparison
is: implied GPU sort = duckdb_control / 5 .. / 8; grade
spark_sort against that band. Each engine runs in its own child
(fresh JVM / fresh process, bench.py lesson). Results recorded in
BENCH_SCALE.md.

Usage: python3 scripts/bench_sort_100m.py            # ONE JSON line
       python3 scripts/bench_sort_100m.py --phase spark_sort
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 100_000_000
REPS = 4


def phase_spark_sort() -> dict:
    from pyspark.sql import functions as F

    from gpu_olap_engine_spark.config import EngineConfig
    from gpu_olap_engine_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ["SPARK_GRAFT_DRIVER_MEMORY"] = "32g"
    spark = get_spark(
        EngineConfig(
            extra_confs={
                "spark.driver.extraJavaOptions": (
                    "-Xlog:disable -Xms32g -XX:+AlwaysPreTouch"
                ),
                "spark.ui.enabled": "false",
                "spark.sql.ui.retainedExecutions": "4",
                # zstd wins on shuffle-heavy shapes (r10 join sweep);
                # the range-exchange moves the full 1.6 GB relation
                "spark.io.compression.codec": "zstd",
            }
        ),
        master=f"local[{cpus}]",
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warm at half scale: faults shuffle dirs + sort buffers (the
    # join100 child's lesson — first full-scale rep otherwise runs
    # 1.4-1.9x the warm floor)
    spark.range(N // 2, numPartitions=64).select(
        F.xxhash64("id").alias("k")
    ).orderBy("k").write.format("noop").mode("overwrite").save()
    df = (
        spark.range(N, numPartitions=64)
        .select(F.xxhash64("id").alias("k"))
        .orderBy("k")
    )
    runs = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext._jvm.System.gc()  # untimed; cleaner lag
    spark.stop()
    return {"spark_sort_runs": runs, "spark_sort": min(runs)}


def phase_duckdb() -> dict:
    import duckdb

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    con = duckdb.connect()
    con.execute(f"PRAGMA threads={cpus}")
    # warm at half scale
    con.execute(
        f"CREATE OR REPLACE TEMP TABLE w AS "
        f"SELECT hash(range) AS k FROM range({N // 2}) ORDER BY k"
    )
    con.execute("DROP TABLE w")
    runs = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        con.execute(
            f"CREATE OR REPLACE TEMP TABLE s AS "
            f"SELECT hash(range) AS k FROM range({N}) ORDER BY k"
        )
        runs.append(round(time.perf_counter() - t0, 3))
        con.execute("DROP TABLE s")
    con.close()
    return {"duckdb_runs": runs, "duckdb_control": min(runs)}


PHASES = {"spark_sort": phase_spark_sort, "duckdb": phase_duckdb}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--phase", choices=list(PHASES))
    args = p.parse_args()
    if args.phase:
        print(json.dumps(PHASES[args.phase]()))
        return
    out = {
        "metric": "sort_100m_global",
        "unit": "sec",
        "n": N,
        "baseline": {
            "gpu_vs_cpu_claim": "5-8x",
            "source": "PROJECT_SUMMARY.md:148",
        },
    }
    for phase in ("duckdb", "spark_sort"):  # duckdb first (heap lesson)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--phase", phase],
            stdout=subprocess.PIPE,
            stderr=sys.stderr,
            timeout=1200,
            check=False,
        )
        if r.returncode == 0:
            try:
                out.update(
                    json.loads(r.stdout.decode().strip().splitlines()[-1])
                )
            except Exception:  # noqa: BLE001
                out[f"{phase}_error"] = "unparseable child output"
        else:
            out[f"{phase}_error"] = f"rc {r.returncode}"
    if "duckdb_control" in out and "spark_sort" in out:
        c = out["duckdb_control"]
        out["implied_gpu_band_sec"] = [round(c / 8, 2), round(c / 5, 2)]
        out["spark_vs_implied_gpu_worst"] = round(
            out["spark_sort"] / (c / 8), 2
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
