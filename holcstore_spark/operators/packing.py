"""Token-offset packing manifest — the concat-and-chunk layout used to
build fixed-length pretraining examples (concatenate every document's
tokens in a deterministic order, slice the stream into ``block_tokens``
blocks, record which blocks each document lands in).

The global running token offset is a distributed prefix sum, NOT a
single-partition window: phase 1 computes a cumsum inside coarse
buckets of the ordering key (parallel), phase 2 cumsums the per-bucket
totals (metadata-sized — one row per bucket) and broadcasts the bucket
base offsets back. A global ``Window.orderBy`` with no partition would
serialize the whole corpus through one task at 100 TB; this shape keeps
every wide stage bucket-parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_manifest(
    df: DataFrame,
    text: str | Column = "text",
    id_col: str = "doc_id",
    block_tokens: int = 512,
    bucket_size: int = 4096,
) -> DataFrame:
    """Per document: whitespace token count, exclusive global token
    offset (documents concatenated in ``id_col`` order), and the first /
    last training block the document's tokens touch.

    ``bucket_size`` is the prefix-sum granularity in ordering-key units:
    per-bucket cumsums are parallel, and only one row per bucket reaches
    the (tiny) bucket-offset cumsum.
    """
    # __bucket is (id_col / bucket_size) cast to long: a non-numeric key
    # would produce NULL buckets, and the phase-2 inner equi-join on
    # __bucket would silently drop those rows (NULL keys never match) —
    # fail loudly instead of returning a partial manifest
    from pyspark.sql.types import NumericType

    key_type = df.schema[id_col].dataType
    if not isinstance(key_type, NumericType):
        raise TypeError(
            f"pack_manifest requires a numeric ordering key: "
            f"{id_col!r} is {key_type.simpleString()}"
        )

    tok = F.split(F.col(text) if isinstance(text, str) else text, " ")
    base = df.select(
        F.col(id_col),
        F.size(tok).cast("long").alias("n_tokens"),
        (F.col(id_col) / F.lit(bucket_size)).cast("long").alias("__bucket"),
    )
    # phase 1: exclusive cumsum within each bucket (parallel over buckets)
    w_local = (
        Window.partitionBy("__bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = base.withColumn(
        "__local_off", F.coalesce(F.sum("n_tokens").over(w_local), F.lit(0))
    )
    # phase 2: bucket base offsets — one row per bucket, so the global
    # cumsum window here runs over a metadata-sized frame
    w_bucket = (
        Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    )
    bucket_offsets = (
        base.groupBy("__bucket")
        .agg(F.sum("n_tokens").alias("__bucket_total"))
        .withColumn(
            "__bucket_off",
            F.coalesce(F.sum("__bucket_total").over(w_bucket), F.lit(0)),
        )
        .select("__bucket", "__bucket_off")
    )
    out = local.join(F.broadcast(bucket_offsets), on="__bucket", how="inner")
    start = F.col("__bucket_off") + F.col("__local_off")
    return out.select(
        F.col(id_col),
        F.col("n_tokens"),
        start.alias("start_offset"),
        (start / block_tokens).cast("long").alias("start_block"),
        (
            (start + F.greatest(F.col("n_tokens"), F.lit(1)) - 1) / block_tokens
        ).cast("long").alias("end_block"),
    )
