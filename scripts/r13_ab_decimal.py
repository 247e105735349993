#!/usr/bin/env python3
"""Isolate WHERE the exact-decimal aggregation cost lives (q02/q77
family): the per-row double->decimal(18,4) cast (Double.toString +
BigDecimal parse inside Cast) vs the non-compact decimal(28,4)
accumulation (JavaBigDecimal add per row in the Sum buffer).

Variants over lineitem at $SPARK_GRAFT_SF_DIR (alternating in-process
A/B, min-of-N through the noop sink, same session shape as
r13_isobench):

  count        COUNT(*) only                        -> scan floor
  sum_dbl      SUM(double)                          -> + cheap agg
  max_dec      MAX(cast(x as decimal(18,4)))        -> + per-row cast,
               compact-compare accumulation (no BigDecimal adds)
  sum_dec      SUM(cast(x as decimal(18,4)))        -> current dsum
  sum_limbs    3x SUM(bigint) over 20-bit limbs of the unscaled value
               (per-row: the same cast + cheap long div/mods), exact
               final combine in decimal -- the candidate split-sum

sum_dec - max_dec  ~= the BigDecimal accumulation share
max_dec - sum_dbl  ~= the cast share
sum_limbs          = what the split-sum would actually cost
"""

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

# The unscaled value u = unscaled(cast(x as decimal(18,4))), |u| < 1e18,
# recovered with compact-decimal ops only (toLong + fast-path subtract;
# no BigDecimal multiply):
#   i  = cast(d as bigint)            (truncate toward zero, cheap)
#   f4 = round((d - i) as double * 1e4)  (|f4| <= 9999; double error
#        ~1e-11 << 0.5, so rint is exact -- see docstring analysis)
#   u  = i*10000 + f4
# Split u into three ~20-bit limbs so each SUM(bigint) stays exact to
# ~9e12 rows (the 2-limb 2^31 split wraps at ~4e9 rows of 1e18-scale
# values -- NOT 100 TB safe; 3 limbs are).


def limb_exprs(col, p):
    d = col.cast("decimal(18,4)")
    i = d.cast("bigint")  # truncate toward zero; compact-decimal toLong
    # fractional part f = d - i is an exact 4-digit decimal, |f| < 1;
    # as double its error is <= 1.1e-16, so y = f_double * 1e4 is
    # within ~2e-12 of the integer f4 -- floor(y + 0.5) recovers f4
    # exactly (floor/cast are native double ops, no BigDecimal; Spark's
    # round() would go through BigDecimal.valueOf -> Double.toString).
    y = (d - i.cast("decimal(18,4)")).cast("double") * 10000.0
    f4 = F.floor(y + F.lit(0.5)).cast("bigint")
    u = i * F.lit(10000).cast("bigint") + f4
    m = F.lit(1 << 20).cast("bigint")
    l0 = u % m  # sign of u, Java semantics: u == (u - l0) + l0 exactly
    # (u - l0) / m: '/' on bigints is double division, but u - l0 is an
    # exact multiple of 2^20 with |.| < 2^63 and division by a power of
    # two is exact in binary FP, so the cast back to bigint is exact.
    r0 = ((u - l0) / m).cast("bigint")
    l1 = r0 % m
    l2 = ((r0 - l1) / m).cast("bigint")
    return [
        F.sum(l0).alias(f"{p}_l0"),
        F.sum(l1).alias(f"{p}_l1"),
        F.sum(l2).alias(f"{p}_l2"),
    ]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(EngineConfig(), master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    registry["q03_join_agg_topk"].fn(spark, "/root/testdata/sf0.001").collect()

    li = lambda: T(spark, sf_dir, "lineitem")  # noqa: E731
    gcols = ["l_returnflag", "l_linestatus"]
    x = F.col("l_extendedprice")
    q = F.col("l_quantity")

    variants = [
        ("count", lambda: li().groupBy(*gcols).agg(F.count("*").alias("c"))),
        (
            "sum_dbl",
            lambda: li().groupBy(*gcols).agg(F.sum(x).alias("s"), F.sum(q).alias("t")),
        ),
        (
            "max_dec",
            lambda: li()
            .groupBy(*gcols)
            .agg(
                F.max(x.cast("decimal(18,4)")).alias("s"),
                F.max(q.cast("decimal(18,4)")).alias("t"),
            ),
        ),
        (
            "sum_dec",
            lambda: li()
            .groupBy(*gcols)
            .agg(
                F.sum(x.cast("decimal(18,4)")).alias("s"),
                F.sum(q.cast("decimal(18,4)")).alias("t"),
            ),
        ),
        (
            "sum_limbs",
            lambda: li()
            .groupBy(*gcols)
            .agg(*(limb_exprs(x, "x") + limb_exprs(q, "q"))),
        ),
    ]
    reps = int(os.environ.get("AB_REPS", "6"))
    runs: dict[str, list[float]] = {n: [] for n, _ in variants}
    for _rep in range(reps):
        for name, build in variants:
            spark.sparkContext.setJobDescription(f"ab_dec:{name}")
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            runs[name].append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    print(json.dumps({n: {"runs": r, "min": min(r)} for n, r in runs.items()}))

    # Exactness probe: does the limb reconstruction reproduce sum_dec
    # bit-for-bit on this data?
    import decimal as pydec

    dec_rows = {
        tuple(r[0:2]): (r[2], r[3])
        for r in li()
        .groupBy(*gcols)
        .agg(
            F.sum(x.cast("decimal(18,4)")).alias("s"),
            F.sum(q.cast("decimal(18,4)")).alias("t"),
        )
        .collect()
    }
    limb_rows = {
        tuple(r[0:2]): r
        for r in li().groupBy(*gcols).agg(*(limb_exprs(x, "x") + limb_exprs(q, "q"))).collect()
    }
    ok = True
    for k, (s, t) in dec_rows.items():
        r = limb_rows[k]
        m = 1 << 20
        ux = r["x_l0"] + r["x_l1"] * m + r["x_l2"] * m * m
        uq = r["q_l0"] + r["q_l1"] * m + r["q_l2"] * m * m
        rs = pydec.Decimal(ux).scaleb(-4)
        rt = pydec.Decimal(uq).scaleb(-4)
        if rs != s or rt != t:
            ok = False
            print(f"MISMATCH {k}: {rs} vs {s} | {rt} vs {t}")
    print(json.dumps({"limb_reconstruction_exact": ok, "groups": len(dec_rows)}))
    spark.stop()


if __name__ == "__main__":
    main()
