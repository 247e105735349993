#!/usr/bin/env python3
"""Complete the ~sf10 fixture dir for a FULL-registry oracle sweep.

scripts/bench_scale10.py generates the tables its timed suite reads
(documents / embeddings / lineitem / orders / customer + single-copy
supplier/nation/region; events only via its streaming phase). A
full-registry differential sweep (scripts/oracle_sweep.py) needs all
ten tables, so this wrapper:

1. runs bench_scale10.generate() if the dir is missing/stale
   (identical recipes, identical GEN_VERSION — the timed suite's
   fixtures are byte-reproducible, nothing here diverges from them);
2. adds `events` with the same K-replica key-offset rule the
   streaming phase uses (event_id/user_id offset per replica: 100x
   users over the same time range — windows and sessions grow in
   group count, not per-group length, the realistic scale-up);
3. copies `part` single-copy (a dimension: l_partkey was never
   offset, so referential integrity holds exactly as it does for
   supplier/nation/region).

Usage: python3 scripts/gen_sf10_full.py
Prints ONE JSON line with row counts. Dataset dir is
$SPARK_GRAFT_SCALE10_DIR (default /tmp/spark_graft_sf10); the dir is
left in place for the sweep (delete it manually to reclaim disk).
"""

from __future__ import annotations

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from pyspark.sql import functions as F

from gpu_olap_engine_spark.config import EngineConfig
from gpu_olap_engine_spark.queries.tables import T, TABLES
from gpu_olap_engine_spark.session import get_spark

import bench_scale10 as B  # noqa: E402


def main() -> None:
    src_dir = "/root/testdata/sf0.1"
    out_dir = os.environ.get("SPARK_GRAFT_SCALE10_DIR", "/tmp/spark_graft_sf10")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        EngineConfig(
            extra_confs={"spark.driver.extraJavaOptions": "-Xlog:disable"}
        ),
        master=f"local[{cpus}]",
    )
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    marker = f"{out_dir}/_COMPLETE"
    if not (
        os.path.exists(marker)
        and open(marker).read().strip() == B.GEN_VERSION
    ):
        import shutil

        shutil.rmtree(out_dir, ignore_errors=True)
        B.generate(spark, src_dir, out_dir)

    ev_path = f"{out_dir}/events.parquet"
    if not os.path.exists(ev_path):
        ev = T(spark, src_dir, "events")
        parts = []
        for i in range(B.K):
            p = ev
            for c in ("event_id", "user_id"):
                p = p.withColumn(c, F.col(c) + F.lit(i * B.KEY_OFFSET))
            parts.append(p)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(32).write.mode("overwrite").parquet(ev_path)

    part_path = f"{out_dir}/part.parquet"
    if not os.path.exists(part_path):
        T(spark, src_dir, "part").write.mode("overwrite").parquet(part_path)

    counts = {
        t: spark.read.parquet(f"{out_dir}/{t}.parquet").count() for t in TABLES
    }
    print(
        json.dumps(
            {
                "metric": "sf10_full_fixtures",
                "dir": out_dir,
                "rows": counts,
                "generate_sec": round(time.perf_counter() - t0, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
