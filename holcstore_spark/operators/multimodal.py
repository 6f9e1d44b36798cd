"""Multimodal column handling: image/audio/video as opaque binary columns
with typed metadata.

The decode step itself (image decode, resampling, frame extraction) needs
codec libraries that are not in this environment — it is STUBBED behind
``decode_stub`` (deterministic fake) / ``decode_strict``
(NotImplementedError). Everything around the stub — schema, Arrow-batched
``mapInPandas`` plumbing, batch shapes, partitioning — is real and tested.

At 100 TB the pattern is: binary payloads stay in their own column (Parquet
keeps them out of unrelated scans via column pruning), metadata extraction
is a ``mapInPandas`` over row batches (Arrow transfer, no per-row Python),
and derived features land in narrow columns for downstream joins.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata schema attached to every media payload
MEDIA_META_SCHEMA = T.StructType([
    T.StructField("media_type", T.StringType()),   # image | audio | video
    T.StructField("codec", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("digest", T.StringType()),       # md5 hex of the payload
])


def attach_binary_payload(
    df: DataFrame,
    source_col: str = "text",
    media_type: str = "image",
    out: str = "payload",
) -> DataFrame:
    """Demo payload builder: encodes an existing column to binary. In a
    real pipeline the binary column arrives from the source (tar/webdataset
    ingest); this keeps the downstream plumbing testable here."""
    return df.withColumn(out, F.encode(F.col(source_col), "UTF-8")).withColumn(
        "media_type", F.lit(media_type)
    )


def extract_media_meta(
    df: DataFrame,
    payload: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Typed metadata per payload via Arrow-batched ``mapInPandas``.

    Output: id, media_type, codec, n_bytes, digest. The digest/byte-length
    arithmetic runs per batch in pandas (vectorized), never per row in
    Python function-call overhead terms.
    """
    out_schema = T.StructType(
        [df.schema[id_col], T.StructField("media_type", T.StringType())]
        + [f for f in MEDIA_META_SCHEMA.fields if f.name != "media_type"]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "media_type": pdf["media_type"],
                    "codec": "raw",
                    "n_bytes": payloads.map(len).astype("int64"),
                    "digest": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return df.select(id_col, "media_type", payload).mapInPandas(
        batches, schema=out_schema
    )


def decode_strict(df: DataFrame, payload: str = "payload") -> DataFrame:
    """Real decode entry point — requires codec libraries absent here."""
    raise NotImplementedError(
        "media decode requires PIL/ffmpeg which are not installed in this "
        "environment; use decode_stub for pipeline testing"
    )


def decode_stub(
    df: DataFrame,
    payload: str = "payload",
    id_col: str = "doc_id",
    feature_dim: int = 4,
) -> DataFrame:
    """Deterministic fake decoder: stands in for image/audio feature
    extraction with the REAL batch plumbing (schema, Arrow batches,
    partition-preserving mapInPandas) and a fake feature vector derived
    from the payload digest. Swap ``batches`` for a real decode when
    codecs are available.
    """
    out_schema = T.StructType([
        df.schema[id_col],
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats, widths, heights = [], [], []
            for b in pdf[payload]:
                dig = hashlib.md5(bytes(b)).digest()
                widths.append(64 + dig[0] % 64)
                heights.append(64 + dig[1] % 64)
                feats.append([dig[i] / 255.0 for i in range(feature_dim)])
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": pd.array(widths, dtype="int32"),
                    "height": pd.array(heights, dtype="int32"),
                    "features": feats,
                }
            )

    return df.select(id_col, payload).mapInPandas(batches, schema=out_schema)


def frame_sample(
    df: DataFrame,
    payload: str = "payload",
    id_col: str = "doc_id",
    frame_bytes: int = 256,
    every: int = 4,
) -> DataFrame:
    """Frame sampling for video-like payloads: split each binary payload
    into fixed-size frames and keep every ``every``-th one — the row-
    EXPLODING mapInPandas shape (one input row → many output rows), which
    is the part a real frame sampler needs from Spark: Arrow batches in,
    a differently-sized frame batch out, downstream repartition free to
    spread frames across executors.

    The frame boundary rule (fixed byte stride) stands in for codec
    keyframe parsing; the digest is md5 over the frame's uppercase hex so
    an engine without blob hashing can reproduce it (the DuckDB oracle
    slices ``hex(payload)``).

    Output: id, frame_idx (absolute index, 0/every/2·every…), n_bytes,
    digest, frame (binary). Empty payloads contribute no rows.
    """
    out_schema = T.StructType([
        df.schema[id_col],
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("digest", T.StringType()),
        T.StructField("frame", T.BinaryType()),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, sizes, digests, frames = [], [], [], [], []
            for rid, b in zip(pdf[id_col], pdf[payload]):
                b = bytes(b)
                n_frames = (len(b) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, every):
                    fr = b[i * frame_bytes:(i + 1) * frame_bytes]
                    ids.append(rid)
                    idxs.append(i)
                    sizes.append(len(fr))
                    digests.append(
                        hashlib.md5(fr.hex().upper().encode()).hexdigest()
                    )
                    frames.append(fr)
            yield pd.DataFrame(
                {
                    id_col: pd.array(ids, dtype=pdf[id_col].dtype),
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "n_bytes": pd.array(sizes, dtype="int64"),
                    "digest": digests,
                    "frame": frames,
                }
            )

    return df.select(id_col, payload).mapInPandas(batches, schema=out_schema)


def resize_stub(
    df: DataFrame,
    payload: str = "payload",
    id_col: str = "doc_id",
    factor: int = 2,
) -> DataFrame:
    """Deterministic stand-in for image resize: keeps every ``factor``-th
    byte of the payload and scales the fake decode dimensions — real
    plumbing (binary in, smaller binary out through Arrow batches), fake
    pixels. Swap the body for a PIL/ffmpeg call when codecs exist.

    Output: id, width, height (post-resize), payload (resized binary).
    """
    out_schema = T.StructType([
        df.schema[id_col],
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField(payload, T.BinaryType()),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            widths, heights, outs = [], [], []
            for b in pdf[payload]:
                b = bytes(b)
                dig = hashlib.md5(b).digest()
                widths.append((64 + dig[0] % 64) // factor)
                heights.append((64 + dig[1] % 64) // factor)
                outs.append(b[::factor])
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": pd.array(widths, dtype="int32"),
                    "height": pd.array(heights, dtype="int32"),
                    payload: outs,
                }
            )

    return df.select(id_col, payload).mapInPandas(batches, schema=out_schema)
