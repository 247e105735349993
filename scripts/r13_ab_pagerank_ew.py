#!/usr/bin/env python3
"""Paired A/B for pagerank_int: persist the (src, dst, w, deg) join
relation `ew` that every iteration consumes, instead of the bare edge
list `e` (whose outdeg aggregation + join currently re-execute per
round). Identity first (bit-exact output vs the current operator on
both the unweighted q98 graph and a weighted variant), then
alternating min-of-N timing through the noop sink.

Values are unchanged by construction: same arithmetic, same rows —
persist only changes WHERE the (src, dst, w, deg) rows come from."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from gpu_olap_engine_spark.config import EngineConfig  # noqa: E402
from gpu_olap_engine_spark.operators.graph import pagerank_int  # noqa: E402
from gpu_olap_engine_spark.queries import load_all  # noqa: E402
from gpu_olap_engine_spark.queries.tables import T  # noqa: E402
from gpu_olap_engine_spark.session import get_spark  # noqa: E402


def pagerank_int_ew(
    edges: DataFrame, src: str = "src", dst: str = "dst", iters: int = 3,
    weight: str | None = None
) -> DataFrame:
    """Candidate: identical arithmetic, ew persisted once."""
    if weight is None:
        e = edges.select(
            F.col(src).alias("src"), F.col(dst).alias("dst")
        ).distinct().withColumn("w", F.lit(1).cast("long"))
    else:
        e = edges.select(
            F.col(src).alias("src"),
            F.col(dst).alias("dst"),
            F.col(weight).cast("long").alias("w"),
        )
    outdeg = e.groupBy("src").agg(F.sum("w").alias("deg"))
    ew = e.join(outdeg, "src").persist()  # (src, dst, w, deg)
    nodes = (
        ew.select(F.col("src").alias("id"))
        .union(ew.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    rank = nodes.select("id", F.lit(1_000_000).cast("long").alias("r"))
    for _ in range(iters):
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
                    F.lit(150_000)
                    + F.expr("85 * coalesce(s, 0L) div 100")
                ).cast("long").alias("r"),
            )
            .localCheckpoint(eager=False)
        )
    out = rank.select(
        F.col("id").cast("long").alias("node_id"),
        F.col("r").cast("long").alias("rank_micro"),
    ).localCheckpoint(eager=True)
    ew.unpersist()
    nodes.unpersist()
    return out


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

    def wedges():
        # weighted variant: order-count edge weights (exercises the
        # weight branch the q123 entry uses)
        return (
            edges().groupBy("src", "dst").agg(F.count("*").alias("wt"))
        )

    # --- identity ---
    a = {(r["node_id"], r["rank_micro"])
         for r in pagerank_int(edges(), iters=3).collect()}
    b = {(r["node_id"], r["rank_micro"])
         for r in pagerank_int_ew(edges(), iters=3).collect()}
    assert a == b, "unweighted mismatch"
    aw = {(r["node_id"], r["rank_micro"])
          for r in pagerank_int(wedges(), weight="wt", iters=3).collect()}
    bw = {(r["node_id"], r["rank_micro"])
          for r in pagerank_int_ew(wedges(), weight="wt", iters=3).collect()}
    assert aw == bw, "weighted mismatch"
    print(json.dumps({"identity": "ok", "n": len(a), "nw": len(aw)}),
          flush=True)

    # --- alternating timing ---
    runs: dict[str, list[float]] = {"e_persist": [], "ew_persist": []}
    for _ in range(reps):
        for name, fn in (("e_persist", pagerank_int),
                         ("ew_persist", pagerank_int_ew)):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            fn(edges(), iters=3).write.format("noop").mode(
                "overwrite"
            ).save()
            runs[name].append(round(time.monotonic() - t0, 3))
    print(json.dumps({
        k: {"runs": v, "min": min(v)} for k, v in runs.items()
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
