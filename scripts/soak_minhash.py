"""Minhash signature-aggregate soak: python scripts/soak_minhash.py <tree> [n_docs]

Synthesizes a deterministic corpus large enough that the per-document
16-way min aggregate's input (the exploded shingle-hash frame) dwarfs
task memory: n_docs (default 200k) x 200 tokens -> ~198 shingles/doc
-> ~40M shingle rows x 16 hash columns. On the r15 tree the min runs
as Sort + SortAggregate over that frame (min(string) has no mutable
UnsafeRow buffer); on the r16 tree it is a codegen HashAggregate with
map-side partial min over BIGINTs. Times minhash_bands with the noop
sink and prints a band checksum for cross-tree equality.
"""
import os, sys, time

repo = sys.argv[1]
n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
sys.path.insert(0, repo)
os.chdir(repo)
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import functions as F
from holcstore_spark import get_spark
from holcstore_spark.operators.dedup import minhash_bands

spark = get_spark(app_name="soak_minhash")
spark.range(1_000_000).selectExpr("sum(id)").collect()

docs = spark.range(n_docs).select(
    F.col("id").alias("doc_id"),
    F.expr(
        "concat_ws(' ', transform(sequence(0, 199),"
        " j -> concat('t', pmod(id * 7 + j, 50000))))"
    ).alias("text"),
)

for rep in range(3):
    spark.sparkContext.setJobDescription(f"minhash soak rep{rep}")
    t0 = time.perf_counter()
    b = minhash_bands(docs, text="text", id_col="doc_id",
                      n_hashes=16, bands=4, shingle_k=3)
    b.write.format("noop").mode("overwrite").save()
    print(f"rep{rep}: {time.perf_counter() - t0:.2f}s", flush=True)

b = minhash_bands(docs, text="text", id_col="doc_id",
                  n_hashes=16, bands=4, shingle_k=3)
row = b.agg(
    F.count(F.lit(1)).alias("n"),
    F.sum(F.hash("doc_id", "band_id", "band_key").cast("long")).alias("chk"),
).collect()[0]
print(f"n_band_rows={row['n']} chk={row['chk']}")
spark.stop()
