#!/usr/bin/env python3
"""In-process alternating A/B for VERDICT r13 #4: hyperplane-LSH
signatures as ONE parsed SQL expression (_lsh_sigs, current) vs the
r13 per-plane `when` Column loop (n_tables x n_planes separate
zip_with/aggregate folds, reconstructed here bit-for-bit). Also
verifies full pair-set identity between the two arms."""

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
from gpu_olap_engine_spark.queries.similarity import (  # noqa: E402
    _LSH_MAX_DIST,
    _LSH_PLANES,
    _LSH_TABLES,
)
from gpu_olap_engine_spark.queries.tables import T, spread  # noqa: E402
from gpu_olap_engine_spark.session import get_spark  # noqa: E402


def lsh_pairs_r13(corpus, id_col="vec_id", vec_col="embedding",
                  n_tables=3, n_planes=8, max_dist=8.0):
    """The r13 form: signature buckets built as per-plane Column
    trees (scaled_dot + when per plane, summed driver-side)."""
    head = corpus.select(vec_col).first()
    dim = len(head[0])
    planes = S.hyperplane_tables(n_tables, n_planes, dim)
    vecs = spread(corpus).select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")
    )
    sigs = []
    for t in range(n_tables):
        bucket = F.lit(0).cast("long")
        for p in range(n_planes):
            plane = F.expr(S._arr_sql(planes[t][p]))
            bit = F.when(
                S.scaled_dot(F.col("vec"), plane) > 0, F.lit(2**p)
            ).otherwise(F.lit(0))
            bucket = bucket + bit.cast("long")
        sigs.append(
            F.struct(F.lit(t).cast("long").alias("t"), bucket.alias("bucket"))
        )
    keyed = vecs.select("vid", F.explode(F.array(*sigs)).alias("sig")).select(
        "vid", F.col("sig.t").alias("t"), F.col("sig.bucket").alias("bucket")
    )
    ka = keyed.select(F.col("vid").alias("id_a"), "t", "bucket")
    kb = keyed.select(F.col("vid").alias("id_b"), "t", "bucket")
    cand = (
        ka.join(kb, ["t", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = vecs.select(F.col("vid").alias("id_a"), F.col("vec").alias("va"))
    vb = vecs.select(F.col("vid").alias("id_b"), F.col("vec").alias("vb"))
    dist = F.sqrt(S.scaled_sq_dist(F.col("va"), F.col("vb"))) / F.lit(1e6)
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", dist.alias("dist"))
        .filter(F.col("dist") <= max_dist)
    )


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

    kw = dict(n_tables=_LSH_TABLES, n_planes=_LSH_PLANES,
              max_dist=_LSH_MAX_DIST)
    variants = [
        ("cur", lambda: registry["sim_random_hyperplane_lsh"].fn(
            spark, sf_dir)),
        ("r13_loop", lambda: lsh_pairs_r13(
            T(spark, sf_dir, "embeddings"), **kw)),
    ]
    reps = int(os.environ.get("AB_REPS", "6"))
    runs: dict[str, list[float]] = {n: [] for n, _ in variants}
    for _rep in range(reps):
        for name, build in variants:
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"ab:{name}")
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            runs[name].append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    print(json.dumps({n: {"runs": r, "min": min(r)} for n, r in runs.items()}))
    cur = registry["sim_random_hyperplane_lsh"].fn(spark, sf_dir)
    alt = lsh_pairs_r13(T(spark, sf_dir, "embeddings"), **kw)
    diff = cur.exceptAll(alt).count() + alt.exceptAll(cur).count()
    print(f"identity r13_loop vs cur: diff_rows={diff}")
    spark.stop()


if __name__ == "__main__":
    main()
