#!/usr/bin/env python3
"""Three-layer profile of sim_near_dup_pairs (VERDICT r13 #3):

1. distributed phase split — time keyed-relation derivation, +group
   tiling, and the full operator separately (noop sink, min of reps);
2. driver-side kernel replay — pull the grouped relation once, replay
   gram_pairs' verify per group with per-phase timers (stack/norm,
   f32 bound GEMM, minimal-key gate, exact einsum+divide, emit) to
   split prefilter vs exact-verify vs boxing mass;
3. tiling sweep — replay layer 2's hot loop at several block_rows
   widths (r13 #3 names §2 tiling width as the adversarial check).

Also prints bucket-size distribution (straggler exposure: the group
count is bounded by 2*dim at the defaults).

Env: SPARK_GRAFT_SF_DIR (default sf0.1), AB_REPS (default 4).
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import defaultdict

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gpu_olap_engine_spark.config import EngineConfig  # noqa: E402
from gpu_olap_engine_spark.operators import similarity as S  # noqa: E402
from gpu_olap_engine_spark.queries import load_all  # noqa: E402
from gpu_olap_engine_spark.queries.tables import T  # noqa: E402
from gpu_olap_engine_spark.session import get_spark  # noqa: E402

THRESHOLD, BLOCK_M, DIM = 0.45, 10, 64
MAX_BUCKET, CHUNK = 16384, 8192


def timed(fn, reps):
    outs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        outs.append(round(time.perf_counter() - t0, 3))
    return outs


def replay(groups, threshold, block_rows):
    """gram_pairs.verify, gated within-chunk arm, with phase timers.
    Arithmetic is a transcript of similarity.py::gram_pairs (gi == gj
    branch); cross-chunk groups don't exist at this corpus size."""
    ph = defaultdict(float)
    cells = survivors = exact = emitted = 0
    t_all = time.perf_counter()
    for (bkey, gi, gj), pdf in groups:
        assert gi == gj, "unexpected cross-chunk group at this SF"
        t0 = time.perf_counter()
        ids = pdf["vid"].to_numpy()
        k = len(ids)
        if k < 2:
            continue
        q32 = np.stack(pdf["qvec"].to_numpy()).astype(np.float32)
        q = q32.astype(np.float64)
        nrm = np.sqrt((q * q).sum(axis=1))
        w32 = S._unit_rows_f32(q32, nrm)
        tl = np.float32(threshold) - S._f32_margin(q.shape[1], threshold)
        U = S._mask_words(pdf)
        ph["stack_norm"] += time.perf_counter() - t0
        for s in range(0, k, block_rows):
            e = min(s + block_rows, k)
            t0 = time.perf_counter()
            r, c = S._bound_hits(w32, w32[s:], tl, s, e)
            ph["gemm_scan"] += time.perf_counter() - t0
            cells += (e - s) * (k - s)
            t0 = time.perf_counter()
            keep = c > r
            r, c = r[keep] + s, c[keep] + s
            if len(r):
                keep = S._mask_gate(bkey, U, U, r, c)
                r, c = r[keep], c[keep]
            ph["gate"] += time.perf_counter() - t0
            survivors += len(r)
            if len(r) == 0:
                continue
            t0 = time.perf_counter()
            gex = np.einsum("ij,ij->i", q[r], q[c])
            cos = gex / (nrm[r] * nrm[c])
            keep = cos >= threshold
            exact += len(r)
            emitted += int(keep.sum())
            ph["exact_emit"] += time.perf_counter() - t0
    ph["TOTAL"] = time.perf_counter() - t_all
    return dict(ph), dict(cells=cells, survivors=survivors,
                          exact=exact, emitted=emitted)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("AB_REPS", "4"))
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
    # warm JVM + Python worker pool the way bench.py does
    registry["q03_join_agg_topk"].fn(spark, "/root/testdata/sf0.001").collect()
    registry["sim_near_dup_pairs"].fn(
        spark, "/root/testdata/sf0.001"
    ).write.format("noop").mode("overwrite").save()

    corpus = T(spark, sf_dir, "embeddings")
    n_vec = corpus.count()

    def keyed_df():
        return S._near_dup_keyed(corpus, "vec_id", "embedding", BLOCK_M)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    phases = {
        "L1_keyed": lambda: noop(keyed_df()),
        "L1_grouped": lambda: noop(
            S._blocked_groups(keyed_df(), MAX_BUCKET, CHUNK)
        ),
        "L1_full": lambda: noop(
            registry["sim_near_dup_pairs"].fn(spark, sf_dir)
        ),
    }
    l1 = {}
    for name, fn in phases.items():
        spark.sparkContext.setJobDescription(name)
        l1[name] = timed(fn, reps)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({n: {"runs": r, "min": min(r)} for n, r in l1.items()}))

    # ---- layer 2: pull the grouped relation, replay the kernel
    gpdf = (
        S._blocked_groups(keyed_df(), MAX_BUCKET, CHUNK)
        .select("bkey", "gi", "gj", "vid", "qvec", "mlo", "mhi")
        .toPandas()
    )
    sizes = gpdf.groupby(["bkey", "gi", "gj"]).size().sort_values()
    print(
        f"corpus={n_vec} keyed_rows={n_vec * BLOCK_M} "
        f"groups={len(sizes)} rows: min={sizes.min()} "
        f"p50={int(sizes.median())} p90={int(sizes.quantile(0.9))} "
        f"max={sizes.max()} sum={int(sizes.sum())}"
    )
    groups = list(gpdf.groupby(["bkey", "gi", "gj"]))
    for rep in range(2):  # rep 0 warms caches/allocators
        ph, st = replay(groups, THRESHOLD, 1024)
        if rep:
            print("kernel phases (s):",
                  json.dumps({k: round(v, 4) for k, v in ph.items()}))
            print("kernel stats:", json.dumps(st))

    # ---- layer 3: tiling width sweep
    sweep = {}
    for br in (256, 512, 1024, 2048, 4096, 8192, 16384):
        ts = [replay(groups, THRESHOLD, br)[0]["TOTAL"] for _ in range(3)]
        sweep[br] = round(min(ts), 4)
    print("block_rows sweep (driver replay, min of 3):",
          json.dumps(sweep))
    spark.stop()


if __name__ == "__main__":
    main()
