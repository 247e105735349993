#!/usr/bin/env python3
"""Paired A/B: the k-means/PQ family's interpreted-HOF assignment
currently evaluates over the RAW corpus — embeddings is one parquet
file, so one partition, so ONE core does all the interpreted
expression work while 31 idle. Variant B pre-spreads the corpus
(round-robin repartition to defaultParallelism) before the operator.

Result values are unaffected: assignments are per-row, the centroid
updates are exact integer sums (order-independent), and every
consumer is a join/agg/window with a deterministic total order."""

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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(EngineConfig(), master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    registry["q03_join_agg_topk"].fn(spark, "/root/testdata/sf0.001").collect()

    emb = lambda: T(spark, sf_dir, "embeddings")  # noqa: E731

    def pq(pre):
        e = pre(emb())
        df = S.pq_adc_topk(e, emb().filter(F.col("vec_id") < 5),
                           m=8, k_codes=8, iters=2, k=5)
        df.write.format("noop").mode("overwrite").save()

    def ivf(pre):
        e = pre(emb())
        df = S.kmeans_ivf_topk(e, emb().filter(F.col("vec_id") < 5),
                               k=5, n_clusters=8, iters=3, nprobe=2)
        df.write.format("noop").mode("overwrite").save()

    def sem(pre):
        e = pre(emb())
        df = S.semdedup(e, n_clusters=8, iters=3, threshold=0.45)
        df.write.format("noop").mode("overwrite").save()

    IDENT = lambda df: df  # noqa: E731
    variants = [
        ("pq_raw", lambda: pq(IDENT)),
        ("pq_spread", lambda: pq(spread)),
        ("ivf_raw", lambda: ivf(IDENT)),
        ("ivf_spread", lambda: ivf(spread)),
        ("sem_raw", lambda: sem(IDENT)),
        ("sem_spread", lambda: sem(spread)),
    ]
    reps = int(os.environ.get("AB_REPS", "3"))
    runs: dict[str, list[float]] = {n: [] for n, _ in variants}
    for _rep in range(reps):
        for name, run in variants:
            spark.sparkContext.setJobDescription(f"ab_spread:{name}")
            t0 = time.perf_counter()
            run()
            runs[name].append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    print(json.dumps({n: {"runs": r, "min": min(r)} for n, r in runs.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
