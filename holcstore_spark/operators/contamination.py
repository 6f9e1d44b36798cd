"""Benchmark contamination check — flag training documents sharing
k-token shingles with an evaluation/benchmark set (the decontamination
pass every serious pretraining pipeline runs; cf. the n-gram overlap
procedures described in the GPT-3 / PaLM dataset papers).

Scale shape: both sides shingle locally (zero shuffle), distinct
per-side, then ONE equi-join on the shingle hash — candidate work is
Σ per-shingle (docs × bench) matches, never |docs| × |bench|. The
benchmark side is typically tiny (thousands of eval prompts) and is
broadcast."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from holcstore_spark.operators.dedup import token_shingles


def _shingle_hashes(
    df: DataFrame, text: str, id_col: str, k: int
) -> DataFrame:
    """Distinct (id, shingle-hash) pairs. md5 halves to 16 hex chars —
    collision odds are negligible at corpus scale and the hash is
    reproducible in any engine (portable oracle)."""
    return (
        df.select(
            F.col(id_col),
            F.explode(token_shingles(text, k=k)).alias("__s"),
        )
        .select(id_col, F.substring(F.md5(F.col("__s")), 1, 16).alias("__h"))
        .distinct()
    )


def ngram_contamination(
    docs: DataFrame,
    bench: DataFrame,
    k: int = 3,
    min_overlap: int = 2,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per contaminated document: the number of distinct k-token
    shingles it shares with ANY benchmark document (≥ ``min_overlap``
    to be reported). Output: (id, n_overlap)."""
    doc_sh = _shingle_hashes(docs, text, id_col, k)
    bench_sh = _shingle_hashes(bench, text, id_col, k).select("__h").distinct()
    return (
        doc_sh.join(F.broadcast(bench_sh), on="__h", how="inner")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .filter(F.col("n_overlap") >= min_overlap)
    )
