#!/usr/bin/env python3
"""Regenerate QUERIES.md: the full registry index with docstrings."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gpu_olap_engine_spark.queries import load_all


def main() -> None:
    registry = load_all()
    out = [
        "# QUERIES — full registry index",
        "",
        f"{len(registry)} entries; {sum(1 for q in registry.values() if q.oracle)} "
        "DuckDB-oracle-paired (driver hash-compares results), the rest rows-only "
        "(genuinely non-SQL-expressible paths). Each callable: "
        "`(spark, sf_dir) -> DataFrame`.",
        "",
    ]
    for name in sorted(registry):
        q = registry[name]
        kind = "oracle" if q.oracle else "rows-only"
        doc = " ".join((q.doc or "").split())
        out += [f"### {name}  `[{kind}]`", doc, ""]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "QUERIES.md"), "w") as f:
        f.write("\n".join(out))


if __name__ == "__main__":
    main()
