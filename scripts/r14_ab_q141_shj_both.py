import os, sys, time, json
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from gpu_olap_engine_spark.config import EngineConfig
from gpu_olap_engine_spark.queries.tables import T
from gpu_olap_engine_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(EngineConfig(extra_confs={"spark.ui.enabled":"false","spark.sql.ui.retainedExecutions":"4"}), master="local[32]")
spark.sparkContext.setLogLevel("ERROR")

def build(mode):
    li = T(spark, sf_dir, "lineitem")
    op = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")).distinct()
    e = (op.alias("a").join(op.alias("b"), (F.col("a.ok")==F.col("b.ok")) & (F.col("a.pk")<F.col("b.pk")))
         .select(F.col("a.pk").alias("a"), F.col("b.pk").alias("b")).distinct().persist())
    ab, bc, ac = e.alias("ab"), e.alias("bc"), e.alias("ac")
    ac = ac.hint("SHUFFLE_HASH")
    if mode == "both":
        bc = bc.hint("SHUFFLE_HASH")
    tri = (ab.join(bc, F.col("ab.b")==F.col("bc.a"))
            .join(ac, (F.col("ab.a")==F.col("ac.a")) & (F.col("bc.b")==F.col("ac.b")))
            .select(F.col("ab.a").alias("x"), F.col("ab.b").alias("y"), F.col("bc.b").alias("z")))
    member = tri.select(F.explode(F.array("x","y","z")).alias("part"))
    return e, member.groupBy("part").agg(F.count("*").alias("n_triangles"))

ea, ra = build("close"); eb, rb = build("both")
d = ra.exceptAll(rb).count() + rb.exceptAll(ra).count()
print("identity diff:", d); assert d == 0
ea.unpersist(); eb.unpersist(); spark.catalog.clearCache()

runs = {"close": [], "both": []}
for rep in range(5):
    for m in ("close","both"):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        e, res = build(m)
        res.write.format("noop").mode("overwrite").save()
        runs[m].append(round(time.perf_counter()-t0,3))
        e.unpersist()
print(json.dumps({m:{"runs":r,"min":min(r)} for m,r in runs.items()}))
spark.stop()
