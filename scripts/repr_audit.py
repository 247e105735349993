#!/usr/bin/env python3
"""Strictest-representation audit of every oracle pair.

The driver's correctness gate hashes VALUES in a representation-
sensitive way (round 6: int64 vs float64 with equal values failed).
tests/test_oracle.py now rejects dtype-KIND mismatches; this audit
goes further and records EVERY representation difference between the
Spark result and the DuckDB oracle at a given fixture dir:

  - exact pandas dtype string per column (int32 vs int64, float32 vs
    float64, datetime64 tz, object), after the same normalize() the
    comparator uses;
  - str() of every cell — catches Decimal('1.50') vs 1.5, '-0.0' vs
    '0.0', timestamp tz rendering, numpy repr drift.

Exit 0 only when zero divergences. Divergences are RECORDED, not
auto-failed by kind: dtype-width differences (int32 vs int64) are
listed under "width_only" since the local dtype-kind rule unifies
them — the report makes the risk visible either way.

Usage: python3 scripts/repr_audit.py [sf_dir] [--out audit.json]
                                     [--only prefix1,prefix2,...]

--only (r11): restrict to entries whose name starts with one of the
given prefixes — used for the sf0.1 audit of the never-driver-drawn
TPC-H + streaming families (round-10 verdict #7) without paying the
full 226-entry registry at that scale.
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from gpu_olap_engine_spark.config import EngineConfig
from gpu_olap_engine_spark.queries import load_all
from gpu_olap_engine_spark.queries.tables import TABLES
from gpu_olap_engine_spark.session import get_spark


def _cell_repr(v) -> str:
    """Canonical-enough str(): floats via repr(float(v)) so numpy
    scalar wrappers don't differ from Python floats; NaN/None unified;
    everything else raw str()."""
    if v is None:
        return "<null>"
    if isinstance(v, float) and math.isnan(v):
        return "<null>"
    try:
        import numpy as np  # noqa: PLC0415

        if isinstance(v, np.floating):
            if math.isnan(float(v)):
                return "<null>"
            return repr(float(v))
        if isinstance(v, np.integer):
            return repr(int(v))
        if isinstance(v, np.bool_):
            return repr(bool(v))
    except ImportError:
        pass
    if isinstance(v, float):
        return repr(v)
    return str(v)


def main() -> None:
    argv = sys.argv[1:]
    out_path = None
    if "--out" in argv:
        out_path = argv[argv.index("--out") + 1]
        argv = [a for a in argv if a not in ("--out", out_path)]
    only: tuple[str, ...] = ()
    if "--only" in argv:
        spec = argv[argv.index("--only") + 1]
        only = tuple(p for p in spec.split(",") if p)
        argv = [a for a in argv if a not in ("--only", spec)]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")

    from tests.test_oracle import normalize

    spark = get_spark(
        EngineConfig(
            shuffle_partitions=8,
            extra_confs={"spark.driver.extraJavaOptions": "-Xlog:disable"},
        ),
        master=f"local[{cpus}]",
    )
    spark.sparkContext.setLogLevel("ERROR")
    duck = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        duck.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

    registry = load_all()
    divergent: dict[str, dict] = {}
    width_only: dict[str, dict] = {}
    n_checked = 0
    for name in sorted(registry):
        q = registry[name]
        if q.oracle is None:
            continue
        if only and not name.startswith(only):
            continue
        try:
            s = normalize(q.fn(spark, sf_dir).toPandas())
            d = normalize(duck.sql(q.oracle).df())
        except Exception as e:  # noqa: BLE001
            divergent[name] = {"error": str(e)[:300]}
            print(f"{name:40s} ERROR {e}", flush=True)
            continue
        n_checked += 1
        issues: dict[str, str] = {}
        widths: dict[str, str] = {}
        # structural checks FIRST (r8 advice): a column-set mismatch
        # previously aborted the whole audit with a raw KeyError, and
        # zip() over unequal row counts silently truncated — missing
        # rows were invisible to this tool
        col_diff = set(s.columns) ^ set(d.columns)
        if col_diff:
            divergent[name] = {
                "_columns": f"spark {sorted(s.columns)} vs "
                f"oracle {sorted(d.columns)}"
            }
            print(f"{name:40s} DIVERGENT columns {sorted(col_diff)}", flush=True)
            continue
        if len(s) != len(d):
            divergent[name] = {
                "_rows": f"spark {len(s)} vs oracle {len(d)}"
            }
            print(
                f"{name:40s} DIVERGENT rows {len(s)} vs {len(d)}", flush=True
            )
            continue
        for col in s.columns:
            sd, dd = str(s[col].dtype), str(d[col].dtype)
            if sd != dd:
                sk = s[col].dtype.kind
                dk = d[col].dtype.kind
                unified = {"i": "i", "u": "i"}.get
                if unified(sk, sk) == unified(dk, dk) and sk in "iuf":
                    widths[col] = f"{sd} vs {dd}"
                else:
                    issues[col] = f"dtype {sd} vs {dd}"
                    continue
            bad = None
            for i, (a, b) in enumerate(
                zip(s[col].tolist(), d[col].tolist())
            ):
                ra, rb = _cell_repr(a), _cell_repr(b)
                if ra != rb:
                    bad = f"row {i}: {ra!r} vs {rb!r}"
                    break
            if bad:
                issues[col] = bad
        if issues:
            divergent[name] = issues
            print(f"{name:40s} DIVERGENT {issues}", flush=True)
        else:
            if widths:
                width_only[name] = widths
            print(f"{name:40s} ok ({len(s)} rows)", flush=True)

    summary = {
        "sf_dir": sf_dir,
        "checked": n_checked,
        "divergent": divergent,
        "width_only": width_only,
    }
    print(json.dumps({
        "checked": n_checked,
        "n_divergent": len(divergent),
        "n_width_only": len(width_only),
    }))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(summary, f, indent=1)
    spark.stop()
    sys.exit(1 if divergent else 0)


if __name__ == "__main__":
    main()
