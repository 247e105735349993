#!/usr/bin/env python3
"""Bucket-width sweep for the zero-exchange zero-sort join
(round-9 verdict #4).

The r9 one-file-per-bucket fix was proved at 64 buckets. At 100 TB
the same layout runs 1024-4096+ buckets (a bucket must fit one
executor's scan task and one write task's memory), so this script
measures, for each width over the same 100M x 100M int-join shape
the bench's bucketed micro uses:

- write wall for BOTH one-file-per-bucket sorted tables (the
  layout's amortized cost: paid once per table lifetime, not per
  query — but write amplification is the 100 TB concern, since one
  file per bucket caps write parallelism at num_buckets);
- a plan assertion that the join still has NO Exchange and NO Sort
  at every width (the guarantee must be width-independent);
- join wall, min of N converged reps.

Prints ONE JSON line:
{"widths": {"64": {"write_sec": ..., "join_sec": ..., "files": 64},
 ...}, "rows": 100000000}

Scale down with SPARK_GRAFT_MICRO_SCALE (e.g. 0.01) for smoke runs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gpu_olap_engine_spark.config import EngineConfig
from gpu_olap_engine_spark.session import get_spark
from gpu_olap_engine_spark.sources import write_bucketed

WIDTHS = [64, 1024, 4096]
REPS = 4


def main() -> None:
    scale = float(os.environ.get("SPARK_GRAFT_MICRO_SCALE", "1.0"))
    rows = max(int(100_000_000 * scale), 10_000)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        EngineConfig(
            extra_confs={"spark.driver.extraJavaOptions": "-Xlog:disable"}
        ),
        master=f"local[{cpus}]",
    )
    spark.sparkContext.setLogLevel("ERROR")
    # sound ONLY because every bucketed table below is written (and
    # asserted) one file per bucket — see write_bucketed's docstring
    spark.conf.set(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "true"
    )

    from gpu_olap_engine_spark.plans import plan_string

    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").replace(
        "file:", ""
    )
    out: dict[str, dict] = {}
    for width in WIDTHS:
        for t in ("bw_a", "bw_b"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
        a = spark.range(rows, numPartitions=64).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("va")
        )
        b = spark.range(rows, numPartitions=64).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
        )
        # r11 (round-10 verdict stretch #8): decouple write
        # parallelism from width — beyond ~64 write tasks this box
        # only pays task/file fixed overhead, so wider tables pack
        # multiple complete buckets per task (files_per_task must
        # divide the width; layout assertions below are unchanged).
        # width//64 keeps 64 tasks at every width (2 waves on 32
        # cores); measured fpt sweep at 4096: 16 -> 14.9 s/side,
        # 64 -> 11.8-12.6, 128 -> worse (1 wave loses pipelining).
        fpt = max(1, width // 64)
        t0 = time.perf_counter()
        write_bucketed(a, "bw_a", ["k"], num_buckets=width,
                       sort_cols=["k"], one_file_per_bucket=True,
                       files_per_task=fpt)
        write_bucketed(b, "bw_b", ["k"], num_buckets=width,
                       sort_cols=["k"], one_file_per_bucket=True,
                       files_per_task=fpt)
        write_sec = time.perf_counter() - t0

        # layout + plan assertions at EVERY width: the zero-sort
        # guarantee must not silently degrade as buckets narrow
        loc = (
            spark.sql("DESCRIBE TABLE EXTENDED bw_a")
            .where("col_name = 'Location'")
            .collect()[0]["data_type"]
        ).replace("file:", "")
        nfiles = len([f for f in os.listdir(loc) if f.endswith(".parquet")])
        assert nfiles == width, f"{nfiles} files for {width} buckets"
        ta, tb = spark.table("bw_a"), spark.table("bw_b")
        # assert on the bare join (the count's own final aggregate
        # legitimately exchanges its per-bucket partials to one row)
        jj = ta.join(tb.hint("merge"), "k")
        plan = plan_string(jj, "simple")
        assert "Exchange" not in plan, plan
        assert "Sort" not in plan.replace("SortMergeJoin", "SMJ"), plan
        j = jj.select(F.count("*").alias("c"))

        runs = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            j.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        out[str(width)] = {
            "write_sec": round(write_sec, 2),
            "join_sec": round(min(runs), 3),
            "join_runs": [round(r, 2) for r in runs],
            "files_per_table": nfiles,
            "files_per_task": fpt,
        }
        for t in ("bw_a", "bw_b"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")

    print(
        json.dumps(
            {
                "metric": "bucket_width_sweep",
                "rows_per_side": rows,
                "widths": out,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
