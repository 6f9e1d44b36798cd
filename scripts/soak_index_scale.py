"""sf1.0-shaped soak for the managed-index READ paths (VERDICT r14
ask #9): prove the O(query)-not-O(corpus) scaling claims hold a decade
past the per-round measure points, with a synthetic corpus generated
entirely JVM-side (no driver dependency, no testdata dependency).

- LexicalIndex: ingest N docs x ~20 tokens (N = 500k then 5M), then
  measure indexed ``topk`` wall time + files opened vs the
  ``bm25_topk`` full scan. The claim: scan time grows ~linearly with
  the corpus, indexed query time is bounded by the query terms'
  postings (and the file count opened stays at the terms' buckets +
  stats stripe, independent of N).
- VectorIndex: append N vectors dim 64 (N = 200k then 2M, n_lists=64),
  measure ``topk`` (n_probe=4) wall time + list files opened vs
  brute-force cosine. The claim: the probe opens n_probe+stripe files
  regardless of N and query time scales with list size (N/64), not N.

Usage: python scripts/soak_index_scale.py [--small]
Prints one JSON line per measurement plus a summary line for
BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from holcstore_spark.sources.io_util import release_local_checkpoint


def synth_docs(spark, n: int, tokens_per_doc: int = 20):
    """n docs of ~20 pseudo-random tokens from a 10k-token universe,
    all JVM-side expression work (md5 of id x position)."""
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(tokens_per_doc)),
                lambda i: F.concat(
                    F.lit("t"),
                    (
                        F.conv(
                            F.substring(
                                F.md5(F.concat_ws("-", F.col("id"), i)),
                                1, 6,
                            ),
                            16, 10,
                        ).cast("long") % 10000
                    ).cast("string"),
                ),
            ),
        ).alias("text"),
    )


def synth_vectors(spark, n: int, dim: int = 64):
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: (
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws("v", F.col("id"), i)), 1, 4
                    ),
                    16, 10,
                ).cast("double") / 65535.0 - 0.5
            ),
        ).cast("array<float>").alias("embedding"),
    )


def timed(fn):
    t0 = time.time()
    out = fn()
    return out, time.time() - t0


def lexical_soak(spark, n: int) -> dict:
    from holcstore_spark.operators.text import bm25_topk
    from holcstore_spark.sources.lexical_index import LexicalIndex

    docs = synth_docs(spark, n).localCheckpoint(eager=True)
    path = tempfile.mkdtemp(prefix="holc_soak_lex_")
    shutil.rmtree(path, ignore_errors=True)
    li = LexicalIndex(spark, path)
    _, t_ingest = timed(
        lambda: li.ingest(docs, txn_app="soak", txn_version=0)
    )
    terms = ["t123", "t4567", "t89"]
    top = li.topk(terms, k=10)
    _, t_indexed = timed(lambda: top.collect())
    opened = len(top.inputFiles())
    snap = li._txlog.snapshot()
    total_files = len(snap.files["data"])
    _, t_scan = timed(lambda: bm25_topk(docs, terms, k=10).collect())
    out = {
        "kind": "lexical", "n_docs": n, "ingest_s": round(t_ingest, 2),
        "topk_indexed_s": round(t_indexed, 2),
        "topk_scan_s": round(t_scan, 2),
        "files_opened": opened, "files_total": total_files,
    }
    release_local_checkpoint(docs)
    shutil.rmtree(path, ignore_errors=True)
    return out


def vector_soak(spark, n: int) -> dict:
    from holcstore_spark.operators.similarity import brute_force_topk
    from holcstore_spark.sources.vector_index import VectorIndex

    emb = synth_vectors(spark, n).localCheckpoint(eager=True)
    path = tempfile.mkdtemp(prefix="holc_soak_vec_")
    shutil.rmtree(path, ignore_errors=True)
    vi = VectorIndex(spark, path, n_lists=64, iters=2, dim=64)
    _, t_ingest = timed(
        lambda: vi.append(emb, txn_app="soak", txn_version=0)
    )
    q = emb.filter(F.col("vec_id") < 8)
    top = vi.topk(q, k=10, n_probe=4)
    _, t_indexed = timed(lambda: top.collect())
    opened = len(top.inputFiles())
    snap = vi._txlog.snapshot()
    total_files = len(snap.files["data"])
    _, t_brute = timed(lambda: brute_force_topk(emb, q, k=10).collect())
    out = {
        "kind": "vector", "n_vecs": n, "ingest_s": round(t_ingest, 2),
        "topk_indexed_s": round(t_indexed, 2),
        "topk_brute_s": round(t_brute, 2),
        "files_opened": opened, "files_total": total_files,
    }
    release_local_checkpoint(emb)
    shutil.rmtree(path, ignore_errors=True)
    return out


def main() -> None:
    small = "--small" in sys.argv
    from holcstore_spark import get_spark

    spark = get_spark(shuffle_partitions=32)
    results = []
    lex_ns = [50_000, 500_000] if small else [500_000, 5_000_000]
    vec_ns = [20_000, 200_000] if small else [200_000, 2_000_000]
    for n in lex_ns:
        r = lexical_soak(spark, n)
        results.append(r)
        print(json.dumps(r), flush=True)
    for n in vec_ns:
        r = vector_soak(spark, n)
        results.append(r)
        print(json.dumps(r), flush=True)
    lex, vec = results[:2], results[2:]
    print(json.dumps({
        "summary": {
            "lex_scan_growth": round(
                lex[1]["topk_scan_s"] / max(lex[0]["topk_scan_s"], 1e-9), 2
            ),
            "lex_indexed_growth": round(
                lex[1]["topk_indexed_s"]
                / max(lex[0]["topk_indexed_s"], 1e-9), 2
            ),
            "lex_files_opened": [lex[0]["files_opened"],
                                 lex[1]["files_opened"]],
            "vec_brute_growth": round(
                vec[1]["topk_brute_s"] / max(vec[0]["topk_brute_s"], 1e-9), 2
            ),
            "vec_indexed_growth": round(
                vec[1]["topk_indexed_s"]
                / max(vec[0]["topk_indexed_s"], 1e-9), 2
            ),
            "vec_files_opened": [vec[0]["files_opened"],
                                 vec[1]["files_opened"]],
        }
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
