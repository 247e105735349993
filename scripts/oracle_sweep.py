#!/usr/bin/env python3
"""Differential oracle sweep at an arbitrary scale factor.

tests/test_oracle.py pins the harness at sf0.01 (the driver's gate);
this script runs the SAME exact comparison (row count + column names +
bit-exact values, order-insensitive) at any fixture dir — the round
evidence that every registry entry stays green at sf0.1, not just at
the sampled scale.

Usage: python3 scripts/oracle_sweep.py [sf_dir] [-k substring]
Prints one line per query and a final JSON summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from gpu_olap_engine_spark.config import EngineConfig
from gpu_olap_engine_spark.queries import load_all
from gpu_olap_engine_spark.queries.tables import TABLES
from gpu_olap_engine_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    pat = ""
    if "-k" in sys.argv:
        pat = sys.argv[sys.argv.index("-k") + 1]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    # SPARK_GRAFT_SHUFFLE: sweep under a different partition layout
    # (e.g. 3) to prove results are partition-count invariant.
    shuffle = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "16"))

    from tests.test_oracle import assert_frames_match  # reuse the exact comparator

    spark = get_spark(
        EngineConfig(shuffle_partitions=shuffle), master=f"local[{cpus}]"
    )
    spark.sparkContext.setLogLevel("ERROR")
    duck = duckdb.connect()
    for t in TABLES:
        duck.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    registry = load_all()
    results: dict[str, str] = {}
    for name in sorted(registry):
        if pat and pat not in name:
            continue
        q = registry[name]
        t0 = time.perf_counter()
        try:
            spark_pdf = q.fn(spark, sf_dir).toPandas()
            if q.oracle is None:
                results[name] = "rows_only"
                status = f"rows_only ({len(spark_pdf)} rows)"
            else:
                duck_pdf = duck.sql(q.oracle).df()
                assert_frames_match(spark_pdf, duck_pdf, name)
                results[name] = "pass"
                status = f"pass ({len(spark_pdf)} rows)"
        except Exception as e:  # noqa: BLE001 - report and continue
            results[name] = f"FAIL: {e}"
            status = "FAIL"
            traceback.print_exc(limit=3)
        print(f"{name:40s} {status}  [{time.perf_counter() - t0:.1f}s]", flush=True)

    n_pass = sum(1 for v in results.values() if v == "pass")
    n_fail = sum(1 for v in results.values() if v.startswith("FAIL"))
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "pass": n_pass,
                "fail": n_fail,
                "rows_only": sum(1 for v in results.values() if v == "rows_only"),
                "failed": [k for k, v in results.items() if v.startswith("FAIL")],
            }
        )
    )
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
