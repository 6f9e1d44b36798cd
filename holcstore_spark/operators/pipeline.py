"""Composed training-data cleaning pipeline.

The individual operators (text stats, quality scoring, exact dedup,
MinHash-LSH near-dup) compose into the standard corpus-cleaning recipe:

    raw documents
      → quality filter (length/punct/stopword heuristics)
      → exact dedup (content-hash, keep lowest id)
      → near-dup removal (LSH candidates → Jaccard verify → drop the
        higher id of each verified pair)
      → clean corpus

Everything stays one declarative DataFrame plan: Catalyst fuses the
quality filter into the scan, and the only shuffles are the dedup hash
groupBy and the LSH band join — the shape that holds at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from holcstore_spark.operators.dedup import (
    exact_dedup,
    jaccard_verify,
    minhash_candidate_pairs,
)
from holcstore_spark.operators.text import quality_score


def clean_corpus(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
    jaccard_threshold: float = 0.5,
    n_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """Return the cleaned corpus (original columns of surviving docs)."""
    qualified = quality_score(df, text).filter(
        F.col("quality") >= min_quality
    ).select(*df.columns)
    unique = exact_dedup(qualified, content=text, id_col=id_col)
    pairs = minhash_candidate_pairs(
        unique, text=text, id_col=id_col,
        n_hashes=n_hashes, bands=bands, shingle_k=shingle_k,
    )
    verified = jaccard_verify(
        pairs, unique, text=text, id_col=id_col,
        shingle_k=shingle_k, threshold=jaccard_threshold,
    )
    # drop the higher id of each verified near-dup pair
    losers = verified.select(F.col("id_b").alias(id_col)).distinct()
    return unique.join(losers, on=id_col, how="left_anti")
