#!/usr/bin/env python3
"""Paired A/B for q169_bfs_hops: drop the per-round eager
localCheckpoint on the VISITED set. visited is a union of
already-checkpointed frontiers (seeds + nxt_1..nxt_i), so its lineage
is bounded at rounds+1 checkpointed legs — re-materializing the whole
monotonically-growing set every round is pure extra writes
(O(|V| x rounds) at scale). The per-round frontier (nxt) checkpoint
stays: it IS the lineage truncation. Identity checked first."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gpu_olap_engine_spark.config import EngineConfig  # noqa: E402
from gpu_olap_engine_spark.queries import load_all  # noqa: E402
from gpu_olap_engine_spark.queries.tables import T  # noqa: E402
from gpu_olap_engine_spark.session import get_spark  # noqa: E402


def bfs(spark, sf_dir, checkpoint_visited: bool):
    li = T(spark, sf_dir, "lineitem")
    op = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    e = (
        op.alias("a")
        .join(
            op.alias("b"),
            (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")),
        )
        .select(F.col("a.pk").alias("a"), F.col("b.pk").alias("b"))
        .distinct()
    )
    eb = (
        e.select(
            F.explode(
                F.array(
                    F.struct(F.col("a"), F.col("b")),
                    F.struct(F.col("b").alias("a"), F.col("a").alias("b")),
                )
            ).alias("ed")
        )
        .select(F.col("ed.a").alias("a"), F.col("ed.b").alias("b"))
        .localCheckpoint(eager=True)
    )
    seeds = op.select(F.col("pk").alias("nd")).distinct().filter(
        F.col("nd") % 97 == 0
    )
    frontier = seeds.localCheckpoint(eager=True)
    visited = frontier
    out = frontier.withColumn("hop", F.lit(0).cast("long"))
    for i in range(1, 4):
        nxt = (
            eb.join(frontier.withColumnRenamed("nd", "a"), "a")
            .select(F.col("b").alias("nd"))
            .distinct()
            .join(visited, "nd", "left_anti")
            .localCheckpoint(eager=True)
        )
        out = out.unionAll(nxt.withColumn("hop", F.lit(i).cast("long")))
        visited = visited.unionAll(nxt)
        if checkpoint_visited:
            visited = visited.localCheckpoint(eager=True)
        frontier = nxt
    return out.select(F.col("nd").alias("part"), "hop")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    reps = int(os.environ.get("AB_REPS", "5"))
    spark = get_spark(
        EngineConfig(
            extra_confs={
                "spark.ui.enabled": "false",
                "spark.sql.ui.retainedExecutions": "4",
            }
        ),
        master=f"local[{cpus}]",
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    registry["q03_join_agg_topk"].fn(spark, "/root/testdata/sf0.001").collect()

    a = {(r["part"], r["hop"]) for r in bfs(spark, sf_dir, True).collect()}
    b = {(r["part"], r["hop"]) for r in bfs(spark, sf_dir, False).collect()}
    assert a == b, "mismatch"
    print(json.dumps({"identity": "ok", "n": len(a)}), flush=True)

    runs: dict[str, list[float]] = {"ckpt_visited": [], "no_ckpt": []}
    for _ in range(reps):
        for name, flag in (("ckpt_visited", True), ("no_ckpt", False)):
            t0 = time.monotonic()
            bfs(spark, sf_dir, flag).write.format("noop").mode(
                "overwrite"
            ).save()
            runs[name].append(round(time.monotonic() - t0, 3))
    print(json.dumps({
        k: {"runs": v, "min": min(v)} for k, v in runs.items()
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
