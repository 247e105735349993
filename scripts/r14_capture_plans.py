#!/usr/bin/env python3
"""Capture .explain("formatted") for headline queries into plans/r14/.

Usage: python scripts/r14_capture_plans.py <suffix> [name ...]

Writes plans/r14/<name>_<suffix>.txt for each query (default: every
bench.py HEADLINE entry). Captured at $SPARK_GRAFT_SF_DIR (default
sf0.1) with the engine's default confs — the same session shape the
bench's headline phase runs, so plan claims in OPTIMIZATION_r14.md are
checkable against these files.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from gpu_olap_engine_spark.config import EngineConfig  # noqa: E402
from gpu_olap_engine_spark.plans import plan_string  # noqa: E402
from gpu_olap_engine_spark.queries import load_all  # noqa: E402
from gpu_olap_engine_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(repo, "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(
        EngineConfig(),
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    for name in names:
        df = registry[name].fn(spark, sf_dir)
        txt = plan_string(df, "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
