#!/usr/bin/env python3
"""Regenerate QUERIES.md: the full registry index with docstrings."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gpu_olap_engine_spark.queries import load_all


def main() -> None:
    registry = load_all()
    n_oracle = sum(1 for q in registry.values() if q.oracle)
    rest = (
        "the rest rows-only (genuinely non-SQL-expressible paths)"
        if n_oracle < len(registry)
        else "every entry value-checkable"
    )
    out = [
        "# QUERIES — full registry index",
        "",
        f"{len(registry)} entries; {n_oracle} DuckDB-oracle-paired (driver "
        f"hash-compares results), {rest}. Each callable: "
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
