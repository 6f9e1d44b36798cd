"""Sparse-series completeness_holes soak: python /tmp/soak_holes.py <repo>

10k keys, 2-year hourly requested range (17,519 grid points/key -> the
r15 dense-grid shape materializes ~175M rows), but each key is only
~343 points present (one contiguous week + every-100th hour scattered)
-> ~3.4M present rows. Times the operator with the noop sink and prints
a result checksum for cross-tree equality.
"""
import os, sys, time

repo = sys.argv[1]
sys.path.insert(0, repo)
os.chdir(repo)
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import functions as F
from holcstore_spark import get_spark
from holcstore_spark.operators.grid import completeness_holes

spark = get_spark(app_name="soak_holes")
spark.range(1_000_000).selectExpr("sum(id)").collect()

N_KEYS = 10_000
SPAN_H = 17_519          # hourly points in [2024-01-01, 2025-12-31 23:00]
keys = spark.range(N_KEYS).withColumnRenamed("id", "k")
# one contiguous week starting at a key-derived offset + scattered points
present = keys.selectExpr(
    "k",
    f"explode(concat("
    f"  sequence((k*37) % 15000, (k*37) % 15000 + 167),"           # the week
    f"  transform(sequence(0, {SPAN_H//100 - 1}), i -> (i*100 + k % 100)))"  # scattered
    f") AS h"
).where(f"h < {SPAN_H}").distinct()
df = present.select(
    F.col("k"),
    F.expr("timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,h,0,0)").alias("ts"),
    (F.col("k") + F.col("h")).cast("double").alias("value"),
)
n_present = df.count()   # materialize fixture cost OUTSIDE the timed region? No:
# the operator input is the lazy frame either way; keep lineage identical in
# both trees and time the whole pipeline (same fixture lineage cost in both).

for rep in range(3):
    spark.sparkContext.setJobDescription(f"holes soak rep{rep}")
    t0 = time.perf_counter()
    holes = completeness_holes(
        df, keys=("k",), freq_seconds=3600,
        start="2024-01-01 00:00:00", end="2025-12-31 23:30:00",
    )
    holes.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    print(f"rep{rep}: {dt:.2f}s", flush=True)

agg = completeness_holes(
    df, keys=("k",), freq_seconds=3600,
    start="2024-01-01 00:00:00", end="2025-12-31 23:30:00",
).agg(
    F.count(F.lit(1)).alias("n_holes"),
    F.sum(F.hash("k", "hole_start", "hole_end").cast("long")).alias("chk"),
).collect()[0]
print(f"present={n_present} n_holes={agg['n_holes']} chk={agg['chk']}")
spark.stop()
