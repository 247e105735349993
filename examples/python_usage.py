#!/usr/bin/env python3
"""Usage tour of the PySpark-native OLAP engine.

Mirrors the WORKFLOWS of the reference's examples
(/root/reference/examples/python_usage.py: engine construction with
config knobs, load_table + .query, pandas interchange, catalog
introspection, custom per-element compute registration) re-expressed
against this engine's API — same user journey, Spark execution.

Run: python3 examples/python_usage.py [fixture_dir]
(default fixture_dir: /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(data_dir: str = "/root/testdata/sf0.001") -> None:
    from gpu_olap_engine_spark import EngineConfig, OlapEngine

    # --- engine construction: the reference's EngineConfig fields are
    # accepted and mapped onto Spark confs (config.py docstring) ---
    engine = OlapEngine(
        EngineConfig(
            max_gpu_memory=8 * 1024**3,  # informational on Spark
            num_streams=8,
            use_unified_memory=True,
            batch_size=1_000_000,
            enable_cache=True,
        )
    )

    # --- load tables + SQL via .query, the reference's main entry ---
    engine.load_table("orders", f"{data_dir}/orders.parquet")
    engine.load_table("customer", f"{data_dir}/customer.parquet")

    print("1. filter + projection + LIMIT:")
    print(
        engine.query(
            "SELECT o_orderkey, o_totalprice, o_custkey FROM orders "
            "WHERE o_totalprice > 100000 ORDER BY o_totalprice DESC LIMIT 5"
        ).to_pandas()
    )

    print("\n2. GROUP BY aggregation with ORDER BY:")
    print(
        engine.query(
            "SELECT o_orderstatus, COUNT(*) AS num_orders, "
            "SUM(o_totalprice) AS total, AVG(o_totalprice) AS avg_price "
            "FROM orders GROUP BY o_orderstatus ORDER BY total DESC"
        ).to_pandas()
    )

    print("\n3. JOIN + aggregate + top-k:")
    print(
        engine.query(
            "SELECT c.c_name, COUNT(*) AS num_orders, "
            "SUM(o.o_totalprice) AS total_spent "
            "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
            "GROUP BY c.c_name ORDER BY total_spent DESC LIMIT 5"
        ).to_pandas()
    )

    # --- pandas interchange (Arrow path), the query_pandas entry ---
    print("\n4. query a pandas DataFrame as table `df`:")
    pdf = pd.DataFrame(
        {"cat": ["a", "b", "a", "c", "b", "a"], "v": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]}
    )
    print(
        engine.query_pandas(
            pdf, "SELECT cat, SUM(v) AS sv, COUNT(*) AS n FROM df GROUP BY cat ORDER BY cat"
        )
    )

    # --- catalog introspection (catalog.rs analog) ---
    print("\n5. catalog:")
    print("tables:", engine.list_tables())
    print("orders rows:", engine.get_row_count("orders"))
    print("orders location:", engine.get_table_location("orders"))
    print("orders schema:", engine.get_table_schema("orders").simpleString())

    # --- custom per-element compute: the Spark analog of the
    # reference's register_kernel extension point (README.md:354-378);
    # pandas_udf = the vectorized (Arrow-batched) path ---
    print("\n6. custom function registration:")
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def price_band(s: pd.Series) -> pd.Series:
        return (s // 50000).astype("int64")

    engine.register_function("price_band", price_band)
    print(
        engine.query(
            "SELECT price_band(o_totalprice) AS band, COUNT(*) AS n "
            "FROM orders GROUP BY band ORDER BY band LIMIT 5"
        ).to_pandas()
    )

    # --- beyond-reference: the training-data pipeline operators
    # (registry entries are plain (spark, sf_dir) -> DataFrame
    # callables — usable directly against any fixture dir) ---
    print("\n7. LLM-pipeline operators (curation gate / mixing / dedup):")
    from gpu_olap_engine_spark.queries import load_all

    registry = load_all()
    print("language mixing weights (q74):")
    print(registry["q74_temperature_mix"].fn(engine.spark, data_dir).toPandas())
    gate = registry["q76_gopher_gate"].fn(engine.spark, data_dir)
    kept = gate.filter("passes").count()
    print(f"gopher gate: {kept}/{gate.count()} documents pass")
    dups = registry["dedup_minhash_lsh"].fn(engine.spark, data_dir)
    print(f"minhash-LSH near-duplicate pairs: {dups.count()}")

    # --- beyond-reference: warehouse compositions and maintenance ---
    print("\n8. TPC-H compositions / MERGE / z-order layout:")
    print("TPC-H Q1 pricing summary (q77):")
    print(registry["q77_tpch_q1"].fn(engine.spark, data_dir).toPandas())
    merged = registry["q90_merge_upsert"].fn(engine.spark, data_dir)
    print(
        "MERGE actions:",
        {r["action"]: r["count"] for r in merged.groupBy("action").count().collect()},
    )
    import tempfile

    from gpu_olap_engine_spark.sources import write_zordered

    zdir = tempfile.mkdtemp(prefix="tour_z_")
    write_zordered(
        engine.table("orders"), zdir, ["o_custkey", "o_totalprice"],
        target_files=4,
    )
    print("z-ordered orders files:",
          len([f for f in os.listdir(zdir) if f.endswith(".parquet")]))

    # --- continuation additions: line-level dedup, canonical docs,
    # iterative PageRank, full TPC-H tail ---
    print("\n9. Line dedup / canonical docs / PageRank / TPC-H Q8:")
    lines = registry["dedup_lines_keep_first"].fn(engine.spark, data_dir)
    removed = lines.agg({"n_removed": "sum"}).collect()[0][0]
    print(f"line-level dedup removed {removed} duplicated segments")
    reps = registry["dedup_canonical_docs"].fn(engine.spark, data_dir)
    print(f"canonical representatives elected for {reps.count()} clusters")
    pr = registry["q98_pagerank"].fn(engine.spark, data_dir)
    print("top trade-graph nations by PageRank:")
    print(pr.orderBy("rank_micro", ascending=False).limit(3).toPandas())
    print("TPC-H Q8 market share (q103):")
    print(registry["q103_tpch_q8"].fn(engine.spark, data_dir).toPandas())

    # --- time-series toolkit: the fill trio + TWAP ---
    print("\n10. Time-series fills and TWAP:")
    interp = registry["q117_gapfill_interpolate"].fn(engine.spark, data_dir)
    n_gap = interp.filter("is_gap").count()
    print(f"interpolation filled {n_gap} gap hours "
          f"of {interp.count()} spine cells")
    twap = registry["q121_time_weighted_avg"].fn(engine.spark, data_dir)
    print("time-weighted averages (3 heaviest users):")
    print(twap.orderBy("held_us", ascending=False).limit(3).toPandas())

    engine.spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
