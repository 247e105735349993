#!/usr/bin/env python3
"""Phase breakdown for the heavy similarity entries (pq/ivf/semdedup):
where do the seconds go — codebook training (driver-loop k-means
iterations), encode, score+window? Throwaway measurement harness."""

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
from gpu_olap_engine_spark.queries.tables import T  # noqa: E402
from gpu_olap_engine_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(EngineConfig(), master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    registry["q03_join_agg_topk"].fn(spark, "/root/testdata/sf0.001").collect()

    out = {}
    reps = int(os.environ.get("AB_REPS", "3"))

    for rep in range(reps):
        emb = T(spark, sf_dir, "embeddings")

        t0 = time.perf_counter()
        books = S.pq_codebooks(emb, m=8, k_codes=8, iters=2)
        t_books = time.perf_counter() - t0

        t0 = time.perf_counter()
        full = S.pq_adc_topk(emb, emb.filter(F.col("vec_id") < 5),
                             m=8, k_codes=8, iters=2, k=5)
        t_build = time.perf_counter() - t0  # includes a fresh codebook train
        t0 = time.perf_counter()
        full.write.format("noop").mode("overwrite").save()
        t_exec = time.perf_counter() - t0

        t0 = time.perf_counter()
        cents = S.kmeans_centroids(emb, k=8, iters=3)
        t_kmeans = time.perf_counter() - t0

        out.setdefault("pq_codebooks", []).append(round(t_books, 3))
        out.setdefault("pq_build(inc train)", []).append(round(t_build, 3))
        out.setdefault("pq_exec(enc+score+window)", []).append(round(t_exec, 3))
        out.setdefault("kmeans_3it", []).append(round(t_kmeans, 3))
        del cents, books

    print(json.dumps({k: {"runs": v, "min": min(v)} for k, v in out.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
