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
    connected_components,
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
    resolve_clusters: bool = False,
) -> DataFrame:
    """Return the cleaned corpus (original columns of surviving docs).

    ``resolve_clusters``: when True, verified pairs are resolved to
    connected components and one doc (min id) survives per cluster —
    the principled treatment of transitive similarity ((1,3) and (2,3)
    verified means {1,2,3} is ONE cluster; the pairwise drop would keep
    both 1 and 2). Default False preserves the legacy pairwise drop."""
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
    if resolve_clusters:
        # one survivor (min id) per connected near-dup cluster
        comp = connected_components(verified.select("id_a", "id_b"))
        losers = comp.filter(F.col("node") != F.col("comp")).select(
            F.col("node").alias(id_col)
        )
    else:
        # drop the higher id of each verified near-dup pair
        losers = verified.select(F.col("id_b").alias(id_col)).distinct()
    return unique.join(losers, on=id_col, how="left_anti")


def prepare_corpus(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    domain_col: str = "lang",
    splits: dict[str, float] | None = None,
    chunk_size: int = 200,
    chunk_stride: int = 150,
) -> DataFrame:
    """End-to-end corpus preparation — the composed shape of a real
    pretraining data job, each stage an exact operator from this repo:

    1. :func:`~holcstore_spark.operators.text.normalize_text` — canonical
       form so trivially-different bytes collapse;
    2. :func:`~holcstore_spark.operators.dedup.exact_dedup` on the
       NORMALIZED text (min id survives);
    3. :func:`~holcstore_spark.operators.sampling.temperature_sample` —
       sqrt domain flattening;
    4. :func:`~holcstore_spark.operators.sampling.hash_split` —
       content-hash train/valid assignment;
    5. :func:`~holcstore_spark.operators.text.doc_chunks` — context-length
       windows of the normalized text.

    Returns one chunk-level row: (id, domain, split, chunk_id, chunk,
    chunk_len). Every stage is engine-portable-exact, so the composition
    is too — a SQL oracle reproduces the full pipeline bit-for-bit.

    Scale shape: two narrow maps (normalize, chunk explode), one hash
    shuffle (dedup), one metadata-sized collect (domain counts), one
    zero-shuffle filter (flatten), one zero-shuffle assignment (split) —
    domain/split columns ride through the chunk explode, no re-join.
    """
    from holcstore_spark.operators.dedup import exact_dedup
    from holcstore_spark.operators.sampling import hash_split, temperature_sample
    from holcstore_spark.operators.text import doc_chunks, normalize_text

    splits = splits or {"train": 0.95, "valid": 0.05}
    from holcstore_spark.sources.io_util import safe_local_checkpoint

    n = normalize_text(df, text=text, out="__norm")
    # checkpoint the deduped frame: temperature_sample's metadata-sized
    # counts collect would otherwise re-execute the dedup shuffle+window
    # a second time when the final frame is consumed
    d = safe_local_checkpoint(exact_dedup(n, content="__norm", id_col=id_col))
    t = temperature_sample(d, domain_col, [id_col])
    s = hash_split(t, [id_col], splits)
    chunks = doc_chunks(
        s.select(id_col, domain_col, "split", F.col("__norm").alias("__t")),
        text="__t", id_col=id_col, size=chunk_size, stride=chunk_stride,
        keep=(domain_col, "split"),
    )
    return chunks.select(
        id_col, domain_col, "split", "chunk_id", "chunk", "chunk_len"
    )
