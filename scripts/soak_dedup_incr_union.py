"""Union-batch dedup_incremental soak: python scripts/soak_dedup_incr_union.py <tree> [docs_per_branch]

The optimizer pushes the dropped-id left-anti join below a multi-branch
Union batch, duplicating the ENTIRE minhash/band lineage once per branch
(AQE reuse does not dedupe the copies — 3 BroadcastExchange, 0
ReusedExchange on the entry fixture). With 32 cores idle at sf0.1 the
three copies overlap and hide; this soak sizes each branch so the band
pipeline saturates the machine, making the 3x real work visible: r15
computes the band lineage 3x, the r16 conditional lazy-localCheckpoint
pin computes it once. Output equality is asserted via a checksum.
"""
import os, sys, time

repo = sys.argv[1]
per_branch = int(sys.argv[2]) if len(sys.argv) > 2 else 60_000
sys.path.insert(0, repo)
os.chdir(repo)
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import functions as F
from holcstore_spark import get_spark
from holcstore_spark.operators.dedup import dedup_incremental, minhash_bands

spark = get_spark(app_name="soak_dedup_incr")
spark.range(1_000_000).selectExpr("sum(id)").collect()


def mk_docs(lo: int, n: int):
    return spark.range(lo, lo + n).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "concat_ws(' ', transform(sequence(0, 199),"
            " j -> concat('t', pmod(id * 7 + j, 50000))))"
        ).alias("text"),
    )


# persisted index: bands of a small disjoint historical corpus, pinned so
# its (identical) lineage cost is outside the measured batch pipeline
index = minhash_bands(
    mk_docs(10_000_000, 5_000), text="text", id_col="doc_id",
    n_hashes=16, bands=4, shingle_k=3,
).localCheckpoint(eager=True)

# the entry-fixture shape: a 3-branch Union batch
batch = (
    mk_docs(0, per_branch)
    .unionByName(mk_docs(1_000_000, per_branch))
    .unionByName(mk_docs(2_000_000, per_branch))
)

for rep in range(3):
    spark.sparkContext.setJobDescription(f"dedup_incr union soak rep{rep}")
    t0 = time.perf_counter()
    kept = dedup_incremental(batch, index, text="text", id_col="doc_id",
                             n_hashes=16, bands=4, shingle_k=3)
    kept.write.format("noop").mode("overwrite").save()
    print(f"rep{rep}: {time.perf_counter() - t0:.2f}s", flush=True)

kept = dedup_incremental(batch, index, text="text", id_col="doc_id",
                         n_hashes=16, bands=4, shingle_k=3)
row = kept.agg(
    F.count(F.lit(1)).alias("n"),
    F.sum(F.hash("doc_id").cast("long")).alias("chk"),
).collect()[0]
print(f"kept={row['n']} chk={row['chk']}")
spark.stop()
