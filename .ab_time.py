"""One A/B arm: fresh JVM, bench-identical session, warm + 3 timed runs
of intersects_lines and extent_by_mktsegment at sf0.1. Usage:
python .ab_time.py <repo_dir>  -> prints JSON {query: [t1,t2,t3]}."""
import json, sys, time
repo = sys.argv[1]
sys.path.insert(0, repo)
from pyspark.sql import SparkSession
import pyspark.sql.functions as F
spark = (SparkSession.builder.master("local[32]")
         .appName("ab").config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "16g")
         .config("spark.sql.session.timeZone", "UTC").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from datafusion_geo_spark.sources import fixtures
fixtures.enable_cache()
import __spark_entry__ as e
qmap = e.queries()
SF = "/root/testdata/sf0.1"
def force(df):
    df.select(F.xxhash64(*df.columns).cast("double").alias("h")).agg(
        F.count("h"), F.sum("h")).collect()
out = {}
for name in ("intersects_lines", "extent_by_mktsegment"):
    mk = lambda: qmap[name](spark, SF)
    force(mk()); force(mk())
    runs = []
    for _ in range(3):
        t0 = time.perf_counter(); force(mk()); runs.append(round(time.perf_counter()-t0, 4))
    out[name] = runs
print(json.dumps(out))
spark.stop()
