"""LLM-pipeline load harness: generates a synthetic corpus of N documents
(Spark-side, no driver loops) with a controlled near-duplicate rate plus
random embeddings, then times the dedup / similarity / text paths at a
scale beyond the driver's sf0.1 parquet. Usage::

    python scripts/perf_llm.py [n_docs] [dim] [semantic|incremental]

``semantic`` runs ONLY the clustered-embedding SemDeDup-lineage
probes in a clean session (the full harness carries ~15 persisted
frames that inflate late-op timings); ``incremental`` runs ONLY the
managed dedup-index probes (fixed 5k batch vs n_docs-5k history —
the O(batch)-per-ingest claim).

Prints one timing line per operator and a JSON summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _semantic_section(spark, n_docs, dim, timings, run):
    """Clustered-embedding probes for the SemDeDup-lineage ops; returns
    the cluster-size stats dict (the scale risk knobs)."""
    # --- SemDeDup-lineage ops on CLUSTERED embeddings (round 11) -------
    # Uniform random vectors are the WRONG shape for semantic_dedup —
    # real embedding corpora are clustered, and the within-cluster
    # quadratic work (bounded by cluster sizes) is THE risk parameter.
    # Build a skewed mixture: 32 anchor directions, quadratically-skewed
    # membership (head cluster ~5.6x the mean), per-vector noise, plus
    # every 25th vector an exact copy of its cluster head — all
    # executor-side arithmetic, no driver loops.
    n_anchors = 32
    u = ((F.xxhash64(F.col("vec_id") * 31 + 7) % 1000 + 1000) % 1000) / 1000.0
    cl = F.floor(u * u * n_anchors).cast("int")  # quadratic skew
    anchor = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            ((F.xxhash64(cl.cast("long") * 7919 + i) % 1000 + 1000) % 1000)
            / 1000.0
        ).cast("float"),
    )
    noise = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            ((F.xxhash64(F.col("vec_id") * 1009 + i) % 100 + 100) % 100)
            / 2000.0
        ).cast("float"),
    )
    cvecs = (
        spark.range(n_docs)
        .withColumnRenamed("id", "vec_id")
        .withColumn(
            "embedding",
            F.when(F.col("vec_id") % 25 == 0, anchor)  # exact dup of head
            .otherwise(F.zip_with(anchor, noise, lambda a, b: a + b)),
        )
        .persist()
    )
    cvecs.count()

    from holcstore_spark.operators.similarity import (
        _assign_clusters,
        cluster_balanced_sample,
        semantic_dedup,
        train_ivf_centroids,
    )

    # ONE training pass shared by all three consumers below (the
    # centroids= passthrough exists for exactly this pipeline shape);
    # timed separately so the fixed cost is visible
    t0 = time.perf_counter()
    cents = train_ivf_centroids(cvecs, n_lists=n_anchors, iters=2)
    timings["kmeans_train"] = round(time.perf_counter() - t0, 2)
    print(f"# kmeans_train: {timings['kmeans_train']}s", file=sys.stderr)

    max_cluster = 20_000
    run("semantic_dedup", lambda: semantic_dedup(
        cvecs, n_clusters=n_anchors, threshold=0.95, iters=2,
        max_cluster=max_cluster, centroids=cents,
    ))
    run("cluster_balance", lambda: cluster_balanced_sample(
        cvecs, n_clusters=n_anchors, iters=2, centroids=cents,
    ))
    # cluster-size distribution + valve-fire rate (the scale risk knobs)
    sizes = [
        r["count"]
        for r in _assign_clusters(cvecs, n_anchors, 2, "vec_id", "embedding",
                                  centroids=cents)
        .groupBy("__bucket").count().collect()
    ]
    sizes.sort(reverse=True)
    cluster_stats = {
        "n_clusters": len(sizes),
        "max": sizes[0],
        "p50": sizes[len(sizes) // 2],
        "valve_fired": sum(1 for s in sizes if s > max_cluster),
        "quad_work": sum(s * s for s in sizes),  # Σ size² ∝ matmul flops
    }
    print(f"# cluster_stats: {cluster_stats}", file=sys.stderr)

    return cluster_stats


def _gen_docs(spark, n_docs: int):
    """Synthetic corpus: ~60-word docs from a 500-word vocab; every 10th
    doc a near-dup of its predecessor (first 50 words shared), every
    25th an exact dup — all generated executor-side."""
    words = F.transform(
        F.sequence(F.lit(0), F.lit(59)),
        lambda i: F.concat(
            F.lit("w"), ((F.xxhash64(F.col("id") * 100 + i) % 500 + 500) % 500)
        ),
    )
    near_words = F.concat(
        F.slice(
            F.transform(
                F.sequence(F.lit(0), F.lit(59)),
                lambda i: F.concat(
                    F.lit("w"),
                    ((F.xxhash64((F.col("id") - 1) * 100 + i) % 500 + 500) % 500),
                ),
            ),
            1, 50,
        ),
        F.slice(words, 51, 10),
    )
    return (
        spark.range(n_docs)
        .withColumn(
            "text",
            F.when(
                F.col("id") % 25 == 0,
                F.concat_ws(" ", F.transform(
                    F.sequence(F.lit(0), F.lit(59)),
                    lambda i: F.concat(
                        F.lit("w"),
                        (((F.xxhash64((F.col("id") - F.col("id") % 25) * 100 + i))
                          % 500 + 500) % 500),
                    ),
                )),
            )
            .when(F.col("id") % 10 == 0, F.concat_ws(" ", near_words))
            .otherwise(F.concat_ws(" ", words)),
        )
        .withColumnRenamed("id", "doc_id")
    )


def _incremental_section(spark, docs, n_docs, timings, run):
    """Managed dedup-index probes (round 12): the BandIndex production
    claim measured — history is hashed ONCE into the persisted index,
    so the per-ingest cost is O(batch); the un-managed alternative
    re-hashes the whole history every ingest. Batch fixed at 5k."""
    import shutil
    import tempfile

    from holcstore_spark.operators.dedup import (
        dedup_incremental,
        minhash_bands,
    )
    from holcstore_spark.sources.band_index import BandIndex
    # FIXED batch size: the claim under test is that per-ingest cost
    # tracks the batch, not the history — so history scales with n_docs
    # while the batch stays 5k and the vs-stored timing should stay flat
    cut = n_docs - 5_000
    history = docs.filter(F.col("doc_id") < cut)
    batch = docs.filter(F.col("doc_id") >= cut)
    path = tempfile.mkdtemp(prefix="holc_perf_idx_")
    shutil.rmtree(path, ignore_errors=True)
    idx = BandIndex(spark, path)
    # one-time: hash the history into the managed index
    run("index_build_history", lambda: (
        idx.append_bands(minhash_bands(history), txn_app="perf",
                         txn_version=0),
        idx.df(),
    )[1])
    # the CLAIM, isolated: per-ingest dedup COMPUTE against the stored
    # (already-hashed, text-free) bands — O(batch) hashing...
    run("dedup_vs_stored_index", lambda: dedup_incremental(
        batch, idx.df(),
    ))
    # ...vs the un-persisted formulation that re-hashes the WHOLE
    # history corpus every ingest — O(corpus) hashing
    run("dedup_rehash_history", lambda: dedup_incremental(
        batch, minhash_bands(history),
    ))
    # end-to-end managed ingest: the compute above PLUS the exactly-once
    # band append (localCheckpoint, per-band staged files, txn commit)
    run("ingest_batch_managed", lambda: idx.ingest(
        batch, txn_app="perf", txn_version=1
    ))
    # index maintenance: binpack the per-ingest small files
    t0 = time.perf_counter()
    n_packed = idx.optimize(min_files=2)
    timings["index_optimize"] = round(time.perf_counter() - t0, 2)
    print(f"index_optimize: {timings['index_optimize']}s "
          f"({n_packed} bands repacked)")
    docs.unpersist()
    shutil.rmtree(path, ignore_errors=True)


def main(n_docs: int = 50_000, dim: int = 64,
         only: str | None = None) -> None:
    if only not in (None, "semantic", "incremental"):
        # a typo ("semantics") must not silently run the 15-op full
        # harness instead of the requested section
        raise SystemExit(
            f"unknown mode {only!r}; usage: perf_llm.py [n_docs] [dim] "
            "[semantic|incremental]"
        )
    if only == "incremental" and n_docs <= 10_000:
        # argument errors exit BEFORE any Spark work (session start,
        # warm-up, corpus build)
        raise SystemExit(
            "incremental mode needs n_docs > 10000 (history = n_docs - "
            "5000 must dwarf the fixed 5k batch for the probe to mean "
            "anything)"
        )
    from holcstore_spark import get_spark

    spark = get_spark(app_name="holc-perf-llm")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm-up

    timings: dict[str, float] = {}

    def run(name, fn):
        t0 = time.perf_counter()
        n = fn().count()
        timings[name] = round(time.perf_counter() - t0, 2)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    # mode branches come BEFORE the shared corpus/embedding builds: the
    # semantic section generates its own clustered vectors and the
    # incremental section only needs docs — materializing an unused
    # n_docs × dim embedding frame would just pollute the probe
    if only == "semantic":
        cluster_stats = _semantic_section(spark, n_docs, dim, timings, run)
        print(json.dumps({
            "metric": "llm_semantic_total",
            "value": round(sum(timings.values()), 2),
            "unit": "sec",
            "queries": timings,
            "n_docs": n_docs,
            "dim": dim,
            "cluster_stats": cluster_stats,
        }))
        spark.stop()
        return

    if only == "incremental":
        docs = _gen_docs(spark, n_docs).persist()
        docs.count()
        _incremental_section(spark, docs, n_docs, timings, run)
        print(json.dumps({
            "metric": "llm_incremental_total",
            "value": round(sum(timings.values()), 2),
            "unit": "sec",
            "queries": timings,
            "n_docs": n_docs,
        }))
        spark.stop()
        return

    docs = _gen_docs(spark, n_docs).persist()
    docs.count()

    vecs = (
        spark.range(n_docs)
        .withColumnRenamed("id", "vec_id")
        .withColumn(
            "embedding",
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: (
                    (F.xxhash64(F.col("vec_id") * 1000 + i) % 1000) / 1000.0
                ).cast("float"),
            ),
        )
        .persist()
    )
    vecs.count()

    from holcstore_spark.operators.dedup import (
        connected_components,
        exact_dedup,
        minhash_candidate_pairs,
    )
    from holcstore_spark.operators.packing import pack_manifest
    from holcstore_spark.operators.similarity import cosine_near_dup_pairs
    from holcstore_spark.operators.text import segment_dup_stats, text_stats

    run("exact_dedup", lambda: exact_dedup(docs))
    pairs = minhash_candidate_pairs(docs, n_hashes=16, bands=4, max_bucket=2000)
    run("minhash_pairs", lambda: pairs)
    pairs_c = pairs.persist()
    pairs_c.count()
    run("connected_components", lambda: connected_components(pairs_c))
    run("text_stats", lambda: text_stats(docs))
    run("segment_dup_stats", lambda: segment_dup_stats(docs))

    # round 13: exact-substring (duplicate-span) dedup — the synthetic
    # corpus's 10%/4% near/exact dup rates make the gram-hash skew real
    from holcstore_spark.operators.dedup import duplicate_span_stats

    run("duplicate_spans", lambda: duplicate_span_stats(docs, k=8))

    # round 13: all-pairs KNN graph, IVF-blocked (shuffle equi-join on
    # the list id — the corpus-sized-both-sides shape; 64 lists keeps
    # per-list candidate volume ~n/64)
    from holcstore_spark.operators.similarity import knn_graph

    run("knn_graph", lambda: knn_graph(
        vecs, k=3, n_lists=64, n_probe=2, iters=1
    ))

    # round 13: per-domain cap + DSIR selection over a synthetic
    # 997-domain assignment
    from holcstore_spark.operators.sampling import cap_per_group
    from holcstore_spark.operators.text import dsir_bits

    domained = docs.withColumn(
        "source", F.concat(F.lit("d"), F.col("doc_id") % 997)
    ).withColumn("n_chars", F.length("text"))
    run("domain_cap", lambda: cap_per_group(domained, group="source", cap=30))
    run("dsir_bits", lambda: dsir_bits(
        docs, F.col("doc_id") % 4 == 0
    ))
    run("pack_manifest", lambda: pack_manifest(docs))
    run("cosine_near_dup", lambda: cosine_near_dup_pairs(
        vecs, threshold=0.95, n_planes=8, dim=dim, max_bucket=5000
    ))

    from holcstore_spark.operators.similarity import quantize_embeddings
    from holcstore_spark.operators.stats import percentile_rollup
    from holcstore_spark.operators.text import doc_chunks, unigram_surprisal

    run("unigram_surprisal", lambda: unigram_surprisal(docs))
    run("doc_chunks", lambda: doc_chunks(docs, size=200, stride=150))
    run("quantize_embeddings", lambda: quantize_embeddings(vecs))
    run("quality_percentiles", lambda: percentile_rollup(
        docs.select((F.col("doc_id") % 8).alias("g"),
                    F.length("text").cast("double").alias("value")),
        ("g",), exact=False,
    ))

    from holcstore_spark.operators.pipeline import prepare_corpus
    from holcstore_spark.operators.text import bigram_collocations

    corpus = docs.withColumn("lang", F.concat(F.lit("l"), F.col("doc_id") % 4))
    run("prepare_corpus", lambda: prepare_corpus(corpus))
    run("collocations", lambda: bigram_collocations(docs, min_count=10, k=20))

    cluster_stats = _semantic_section(spark, n_docs, dim, timings, run)

    print(json.dumps({
        "metric": "llm_ops_total",
        "value": round(sum(timings.values()), 2),
        "unit": "sec",
        "queries": timings,
        "n_docs": n_docs,
        "dim": dim,
        "cluster_stats": cluster_stats,
    }))
    spark.stop()


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 50_000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 64,
        sys.argv[3] if len(sys.argv) > 3 else None,
    )
