#!/usr/bin/env python3
"""Phase profile for q98_pagerank (guide §1): where do its ~8 s go —
the edge-derivation join, the per-round loop jobs, or checkpoint
overhead? Times each phase in one bench-shaped session, twice, so
warm-vs-cold is visible."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gpu_olap_engine_spark.config import EngineConfig  # noqa: E402
from gpu_olap_engine_spark.operators.graph import pagerank_int  # noqa: E402
from gpu_olap_engine_spark.queries import load_all  # noqa: E402
from gpu_olap_engine_spark.queries.tables import T  # noqa: E402
from gpu_olap_engine_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
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

    def edges():
        o = T(spark, sf_dir, "orders")
        c = T(spark, sf_dir, "customer")
        li = T(spark, sf_dir, "lineitem")
        s = T(spark, sf_dir, "supplier")
        return (
            o.join(c, o["o_custkey"] == c["c_custkey"])
            .join(li, li["l_orderkey"] == o["o_orderkey"])
            .join(s, li["l_suppkey"] == s["s_suppkey"])
            .select(
                F.col("c_nationkey").alias("src"),
                F.col("s_nationkey").alias("dst"),
            )
        )

    for rep in range(2):
        spark.catalog.clearCache()
        t0 = time.monotonic()
        ed = edges()
        e = (
            ed.select("src", "dst").distinct()
            .withColumn("w", F.lit(1).cast("long"))
            .persist()
        )
        n_e = e.count()
        t1 = time.monotonic()
        nodes = (
            e.select(F.col("src").alias("id"))
            .union(e.select(F.col("dst").alias("id")))
            .distinct()
            .persist()
        )
        n_n = nodes.count()
        t2 = time.monotonic()
        outdeg = e.groupBy("src").agg(F.sum("w").alias("deg"))
        ew = e.join(outdeg, "src")
        rank = nodes.select("id", F.lit(1_000_000).cast("long").alias("r"))
        round_walls = []
        for _ in range(3):
            tr = time.monotonic()
            contrib = (
                ew.join(rank, ew["src"] == rank["id"])
                .select("dst", F.expr("r * w div deg").alias("c"))
                .groupBy("dst")
                .agg(F.sum("c").alias("s"))
            )
            rank = (
                nodes.join(contrib, nodes["id"] == contrib["dst"], "left")
                .select(
                    "id",
                    (
                        F.lit(150_000) + F.expr("85 * coalesce(s, 0L) div 100")
                    ).cast("long").alias("r"),
                )
                .localCheckpoint(eager=False)
            )
            # force materialization per round to attribute wall
            rank.count()
            round_walls.append(round(time.monotonic() - tr, 3))
        t3 = time.monotonic()
        out = rank.select(
            F.col("id").cast("long").alias("node_id"),
            F.col("r").cast("long").alias("rank_micro"),
        ).localCheckpoint(eager=True)
        out.write.format("noop").mode("overwrite").save()
        e.unpersist()
        nodes.unpersist()
        t4 = time.monotonic()
        print(
            {
                "rep": rep,
                "edges_distinct_persist": round(t1 - t0, 3),
                "n_edges": n_e,
                "nodes": round(t2 - t1, 3),
                "n_nodes": n_n,
                "rounds": round_walls,
                "final": round(t4 - t3, 3),
                "total": round(t4 - t0, 3),
            },
            flush=True,
        )
        # whole-operator wall through the public fn, same session
        tq = time.monotonic()
        pagerank_int(edges(), iters=3).write.format("noop").mode(
            "overwrite"
        ).save()
        print({"rep": rep, "operator_total": round(time.monotonic() - tq, 3)},
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
