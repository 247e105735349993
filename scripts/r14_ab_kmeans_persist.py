#!/usr/bin/env python3
"""Paired A/B for the r14 kmeans_centroids persist (ADVICE r13 #3):
current form (spread working relation persisted across the iteration
loop) vs the r13 form (each assignment job re-runs the source scan +
round-robin repartition). Centroid identity asserted (exact doubles
— the values are partitioning-independent by construction)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gpu_olap_engine_spark.config import EngineConfig  # noqa: E402
from gpu_olap_engine_spark.operators import similarity as S  # noqa: E402
from gpu_olap_engine_spark.queries import load_all  # noqa: E402
from gpu_olap_engine_spark.queries.tables import T, spread  # noqa: E402
from gpu_olap_engine_spark.session import get_spark  # noqa: E402


def kmeans_r13(corpus, id_col="vec_id", vec_col="embedding", k=8, iters=3):
    """The r13 body: no persist, re-evaluated spread per iteration."""
    head = corpus.select(vec_col).first()
    dim = len(head[0])
    init = corpus.orderBy(id_col).limit(k).select(vec_col).collect()
    centroids = [[float(x) for x in r[0]] for r in init]
    q = 1_000_000
    work = spread(corpus)
    sum_cols = [
        F.expr(
            f"sum(cast(floor(cast(element_at(v, {i + 1}) as double)"
            f" * {q}) as bigint))"
        ).alias(f"s{i}")
        for i in range(dim)
    ]
    for _ in range(iters):
        assigned = work.select(
            F.col(vec_col).alias("v"),
            S._nearest_centroid(f"`{vec_col}`", centroids).alias("c"),
        )
        sums = assigned.groupBy("c").agg(F.count("*").alias("n"), *sum_cols)
        rows = {r["c"]: r for r in sums.collect()}
        centroids = [
            [float(rows[c][f"s{i}"]) / q / rows[c]["n"] for i in range(dim)]
            if c in rows
            else centroids[c]
            for c in range(len(centroids))
        ]
    return centroids


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    iters = int(os.environ.get("KM_ITERS", "3"))
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

    corpus = T(spark, sf_dir, "embeddings")
    a = S.kmeans_centroids(corpus, iters=iters)
    b = kmeans_r13(corpus, iters=iters)
    assert a == b, "centroid mismatch"
    print(f"identity ok: {len(a)} centroids x {len(a[0])} dims",
          file=sys.stderr)

    variants = [
        ("cur_persist", lambda: S.kmeans_centroids(corpus, iters=iters)),
        ("r13_nopersist", lambda: kmeans_r13(corpus, iters=iters)),
    ]
    reps = int(os.environ.get("AB_REPS", "6"))
    runs: dict[str, list[float]] = {n: [] for n, _ in variants}
    for _rep in range(reps):
        for name, fn in variants:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn()
            runs[name].append(round(time.perf_counter() - t0, 3))
    print(json.dumps({
        "sf_dir": sf_dir, "iters": iters,
        **{n: {"runs": r, "min": min(r)} for n, r in runs.items()},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
