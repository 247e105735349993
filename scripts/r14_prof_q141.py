import os, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from gpu_olap_engine_spark.config import EngineConfig
from gpu_olap_engine_spark.queries.tables import T
from gpu_olap_engine_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(EngineConfig(extra_confs={"spark.ui.enabled":"false"}), master="local[32]")
spark.sparkContext.setLogLevel("ERROR")

li = T(spark, sf_dir, "lineitem")
op = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")).distinct()
t0=time.perf_counter()
e = (op.alias("a").join(op.alias("b"), (F.col("a.ok")==F.col("b.ok")) & (F.col("a.pk")<F.col("b.pk")))
     .select(F.col("a.pk").alias("a"), F.col("b.pk").alias("b")).distinct().persist())
ne = e.count()
t1=time.perf_counter()
print(f"edges={ne} build+persist={t1-t0:.2f}s")

# wedge counts under id-orientation vs degree-orientation
deg = (e.select(F.col("a").alias("v")).unionAll(e.select(F.col("b").alias("v")))
       .groupBy("v").agg(F.count("*").alias("d")))
outdeg_id = e.groupBy("a").agg(F.count("*").alias("od"))
w_id = outdeg_id.agg(F.sum(F.col("od")*(F.col("od")-1)/2)).collect()[0][0]
ed = (e.join(deg.withColumnRenamed("v","a").withColumnRenamed("d","da"), "a")
       .join(deg.withColumnRenamed("v","b").withColumnRenamed("d","db"), "b"))
src = F.when((F.col("da")<F.col("db")) | ((F.col("da")==F.col("db")) & (F.col("a")<F.col("b"))), F.col("a")).otherwise(F.col("b"))
odeg_deg = ed.select(src.alias("s")).groupBy("s").agg(F.count("*").alias("od"))
w_deg = odeg_deg.agg(F.sum(F.col("od")*(F.col("od")-1)/2)).collect()[0][0]
t2=time.perf_counter()
print(f"wedges id-orient={int(w_id)} degree-orient={int(w_deg)} (probe {t2-t1:.2f}s)")

# time the wedge+close joins alone (current form)
ab, bc, ac = e.alias("ab"), e.alias("bc"), e.alias("ac")
tri = (ab.join(bc, F.col("ab.b")==F.col("bc.a"))
        .join(ac, (F.col("ab.a")==F.col("ac.a")) & (F.col("bc.b")==F.col("ac.b")))
        .select(F.col("ab.a").alias("x"), F.col("ab.b").alias("y"), F.col("bc.b").alias("z")))
member = tri.select(F.explode(F.array("x","y","z")).alias("part"))
res = member.groupBy("part").agg(F.count("*").alias("n_triangles"))
for rep in range(3):
    t3=time.perf_counter()
    res.write.format("noop").mode("overwrite").save()
    print(f"tri stage (e warm) rep{rep}: {time.perf_counter()-t3:.2f}s")
spark.stop()
