#!/usr/bin/env python3
"""Join-strategy drift audit: does any registry plan silently lose a
broadcast when the statistics grow 1000x?

tests/test_plans.py pins plan shapes at sf0.01, and re-running it
with SPARK_GRAFT_ORACLE_DIR=<sf10 dir> re-lints the same assertions
at scale — but those assertions only cover the entries that have
one. This script sweeps the WHOLE registry: for every entry it
explains the plan at two fixture dirs and compares the physical join
strategy counts (BroadcastHashJoin / SortMergeJoin /
ShuffledHashJoin / BroadcastNestedLoopJoin / CartesianProduct).

A BHJ that becomes an SMJ at bigger stats is exactly the class of
defect that is invisible at test scale and a full extra shuffle of
the fact side at 100 TB (found live: q118's centroid joins — fixed
with an explicit hint the same round). Explain-only: nothing
executes, so the sweep is minutes even on a busy box.

Entries whose join mix legitimately changes with data (AQE decides
at runtime; this is the STATIC plan) are expected to show up — the
output is a review list, not a pass/fail gate. Exit code is 0 unless
a plan gains a CartesianProduct or BroadcastNestedLoopJoin it did
not have at the small dir (the only unconditional contract).

Usage: python3 scripts/plan_scale_diff.py [small_dir] [big_dir]
           [--out diff.json]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gpu_olap_engine_spark.config import EngineConfig
from gpu_olap_engine_spark.plans import plan_string
from gpu_olap_engine_spark.queries import load_all
from gpu_olap_engine_spark.session import get_spark

OPS = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)


def _mix(plan: str) -> dict[str, int]:
    return {op: plan.count(op) for op in OPS if op in plan}


def main() -> None:
    argv = sys.argv[1:]
    out_path = None
    if "--out" in argv:
        out_path = argv[argv.index("--out") + 1]
        del argv[argv.index("--out") : argv.index("--out") + 2]
    small = argv[0] if argv else "/root/testdata/sf0.1"
    big = argv[1] if len(argv) > 1 else "/tmp/spark_graft_sf10"

    spark = get_spark(
        EngineConfig(
            shuffle_partitions=8,
            extra_confs={"spark.driver.extraJavaOptions": "-Xlog:disable"},
        ),
        master="local[4]",
    )
    spark.sparkContext.setLogLevel("ERROR")

    registry = load_all()
    drift: dict[str, dict] = {}
    errors: dict[str, str] = {}
    hard_fail = []
    n_same = 0
    for name in sorted(registry):
        fn = registry[name].fn
        try:
            m_small = _mix(plan_string(fn(spark, small), "simple"))
            m_big = _mix(plan_string(fn(spark, big), "simple"))
        except Exception as e:  # noqa: BLE001 - report and continue
            errors[name] = str(e)[:200]
            continue
        if m_small == m_big:
            n_same += 1
            continue
        drift[name] = {"small": m_small, "big": m_big}
        for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
            if m_big.get(bad, 0) > m_small.get(bad, 0):
                hard_fail.append(name)
        # the reviewable case: broadcasts lost at scale
        if m_big.get("BroadcastHashJoin", 0) < m_small.get(
            "BroadcastHashJoin", 0
        ):
            drift[name]["lost_broadcasts"] = m_small.get(
                "BroadcastHashJoin", 0
            ) - m_big.get("BroadcastHashJoin", 0)
        print(f"{name:40s} {m_small} -> {m_big}", flush=True)

    summary = {
        "small_dir": small,
        "big_dir": big,
        "same": n_same,
        "drifted": len(drift),
        "lost_broadcast_entries": [
            k for k, v in drift.items() if "lost_broadcasts" in v
        ],
        "hard_fail": hard_fail,
        "errors": errors,
        "drift": drift,
    }
    print(json.dumps({k: v for k, v in summary.items() if k != "drift"}))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(summary, f, indent=1)
    spark.stop()
    sys.exit(1 if hard_fail else 0)


if __name__ == "__main__":
    main()
