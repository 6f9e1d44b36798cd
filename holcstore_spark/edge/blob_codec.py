"""Binary-blob interop with a live holcstore database (SURVEY §2 F5/F6).

The reference persists series as compressed binary blobs:

- ChunkStore rows: ``lz4.frame.compress(arr.tobytes())`` with the numpy
  dtype stored alongside and the index rebuilt from ``start_ts`` + the
  model frequency (chunk_timeserie_store.py:255-282);
- Store (KV) rows: a one-column pandas frame serialized as Feather v2
  with LZ4 compression (hostore.py:347-353);
- the REST sync wire base64-encodes blobs into JSON payloads
  (ts_sync.py:139, 252).

All three decode (and encode) here with pyarrow only — the ``lz4``
package is not needed: LZ4-*frame* decompression streams through
``pyarrow.input_stream`` (no decompressed-size required), Feather
through ``pyarrow.feather``. On top of the scalar codecs sit MIGRATION
readers that turn a Spark frame of reference-shaped blob rows into this
engine's long format via Arrow-batched ``mapInPandas`` — the one-shot
path for importing a live holcstore DB at cluster parallelism: ship the
blob table as parquet, read it, explode, ``ingest_long``.
"""

from __future__ import annotations

import base64
import io
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.feather
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# scalar codecs
# ---------------------------------------------------------------------------


def lz4_frame_compress(data: bytes) -> bytes:
    """LZ4 frame bytes (the format ``lz4.frame.compress`` emits)."""
    return pa.Codec("lz4").compress(data, asbytes=True)


def lz4_frame_decompress(blob: bytes) -> bytes:
    """Decode an LZ4 frame without knowing the decompressed size (the
    reference's blobs may or may not carry a content-size header —
    streaming decode needs neither)."""
    return pa.input_stream(pa.BufferReader(blob), compression="lz4").read()


def encode_chunk_blob(arr: np.ndarray) -> tuple[bytes, str]:
    """Reference ChunkStore `_compress` twin: (lz4-frame blob, dtype str)
    (chunk_timeserie_store.py:255-258)."""
    arr = np.asarray(arr)
    return lz4_frame_compress(arr.tobytes()), str(arr.dtype)


def decode_chunk_blob(blob: bytes, dtype: str) -> np.ndarray:
    """Reference ChunkStore `_decompress` twin
    (chunk_timeserie_store.py:260-268)."""
    return np.frombuffer(lz4_frame_decompress(bytes(blob)), dtype=np.dtype(dtype))


def encode_kv_blob(prm: str, serie: pd.Series) -> bytes:
    """Reference Store blob twin: one-column frame → Feather v2 + LZ4
    (hostore.py:347-353)."""
    buf = io.BytesIO()
    serie.to_frame(name=str(prm)).to_feather(buf, compression="lz4")
    return buf.getvalue()


def decode_kv_blob(blob: bytes) -> pd.Series:
    """Decode a reference Store blob back to the named series. Handles
    both index layouts the reference wrote: modern pandas serializes the
    DatetimeIndex natively; older pandas reset it into an ``index``
    column first (hostore.py:349-351)."""
    df = pd.read_feather(io.BytesIO(bytes(blob)))
    if "index" in df.columns:
        df = df.set_index("index")
    col = df.columns[0]
    s = df[col]
    s.name = col
    return s


def b64_wire_encode(blob: bytes) -> str:
    """REST sync wire encoding (ts_sync.py:139)."""
    return base64.b64encode(bytes(blob)).decode()


def b64_wire_decode(wire: str) -> bytes:
    """REST sync wire decoding (ts_sync.py:252)."""
    return base64.b64decode(wire)


# ---------------------------------------------------------------------------
# distributed migration readers
# ---------------------------------------------------------------------------


def legacy_chunk_rows_to_long(
    sdf: DataFrame,
    keys: tuple[str, ...],
    freq_seconds: int,
    start_col: str = "start_ts",
    dtype_col: str = "dtype",
    data_col: str = "data",
    drop_nan: bool = True,
) -> DataFrame:
    """Explode reference-shaped ChunkStore blob rows
    ``(keys…, start_ts, dtype, data)`` into long ``(keys…, ts, value)``
    rows. One Arrow batch in, one exploded batch out — each blob decodes
    on the executor holding it; a 10^7-row legacy table migrates with
    full cluster parallelism and no driver involvement.
    """
    key_fields = [sdf.schema[k] for k in keys]
    out_schema = T.StructType(
        key_fields
        + [T.StructField("ts", T.TimestampType()),
           T.StructField("value", T.DoubleType())]
    )
    step = np.timedelta64(freq_seconds, "s")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            outs = []
            for _, row in pdf.iterrows():
                arr = decode_chunk_blob(row[data_col], row[dtype_col]).astype(
                    np.float64
                )
                t0 = pd.Timestamp(row[start_col])
                # Arrow hands Spark timestamps to pandas tz-naive (session
                # tz is pinned UTC); blobs built driver-side may carry tz
                if t0.tzinfo is not None:
                    t0 = t0.tz_convert("UTC").tz_localize(None)
                start = np.datetime64(t0)
                ts = start + step * np.arange(len(arr))
                keep = ~np.isnan(arr) if drop_nan else np.ones(len(arr), bool)
                out = pd.DataFrame({"ts": ts[keep], "value": arr[keep]})
                for k in keys:
                    out[k] = row[k]
                outs.append(out[[*keys, "ts", "value"]])
            yield (
                pd.concat(outs, ignore_index=True)
                if outs
                else pd.DataFrame(columns=[*keys, "ts", "value"])
            )

    return sdf.select(*keys, start_col, dtype_col, data_col).mapInPandas(
        batches, schema=out_schema
    )


def legacy_kv_rows_to_long(
    sdf: DataFrame,
    keys: tuple[str, ...] = ("client_id", "prm", "version"),
    data_col: str = "data",
) -> DataFrame:
    """Explode reference-shaped Store (KV) Feather blob rows
    ``(client_id, prm, version, data)`` into long rows with the series'
    own datetime index — the KV migration twin of
    :func:`legacy_chunk_rows_to_long`."""
    key_fields = [sdf.schema[k] for k in keys]
    out_schema = T.StructType(
        key_fields
        + [T.StructField("ts", T.TimestampType()),
           T.StructField("value", T.DoubleType())]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            outs = []
            for _, row in pdf.iterrows():
                s = decode_kv_blob(row[data_col])
                idx = pd.DatetimeIndex(s.index)
                if idx.tz is not None:
                    idx = idx.tz_convert("UTC").tz_localize(None)
                out = pd.DataFrame(
                    {"ts": idx, "value": s.to_numpy(dtype=np.float64)}
                )
                for k in keys:
                    out[k] = row[k]
                outs.append(out[[*keys, "ts", "value"]])
            yield (
                pd.concat(outs, ignore_index=True)
                if outs
                else pd.DataFrame(columns=[*keys, "ts", "value"])
            )

    return sdf.select(*keys, data_col).mapInPandas(batches, schema=out_schema)
