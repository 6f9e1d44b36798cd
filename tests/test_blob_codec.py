"""Binary-blob interop (SURVEY §2 F5/F6): scalar codecs round-trip the
reference's exact on-disk formats (LZ4-frame numpy, Feather v2 + LZ4,
base64 wire) and the migration readers explode blob rows to long format
distributed."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from holcstore_spark.edge.blob_codec import (
    b64_wire_decode,
    b64_wire_encode,
    decode_chunk_blob,
    decode_kv_blob,
    encode_chunk_blob,
    encode_kv_blob,
    legacy_chunk_rows_to_long,
    legacy_kv_rows_to_long,
    lz4_frame_compress,
    lz4_frame_decompress,
)


class TestScalarCodecs:
    def test_lz4_frame_roundtrip(self):
        data = np.random.RandomState(7).rand(10000).tobytes()
        assert lz4_frame_decompress(lz4_frame_compress(data)) == data

    def test_chunk_blob_roundtrip_preserves_dtype_and_nan(self):
        arr = np.array([1.5, np.nan, -3.25], dtype=np.float64)
        blob, dtype = encode_chunk_blob(arr)
        back = decode_chunk_blob(blob, dtype)
        assert dtype == "float64"
        np.testing.assert_array_equal(back, arr)

    def test_chunk_blob_empty(self):
        # the reference's EMPTY_DATA sentinel is lz4.compress(np.array([]))
        # (chunk_timeserie_store.py:27)
        blob, dtype = encode_chunk_blob(np.array([]))
        assert len(decode_chunk_blob(blob, dtype)) == 0

    def test_kv_blob_is_reference_write_path(self):
        # encode_kv_blob IS the reference's write (to_feather lz4,
        # hostore.py:347-353) — decoding must restore values, index, name
        idx = pd.date_range("2024-01-01", periods=5, freq="1h", tz="UTC")
        s = pd.Series([1.0, np.nan, 3.0, 4.0, 5.0], index=idx)
        back = decode_kv_blob(encode_kv_blob("prm_9", s))
        assert back.name == "prm_9"
        pd.testing.assert_index_equal(pd.DatetimeIndex(back.index), idx)
        np.testing.assert_array_equal(back.to_numpy(), s.to_numpy())

    def test_kv_blob_legacy_reset_index_layout(self):
        # older pandas wrote the index as an 'index' column
        # (hostore.py:349-351) — decode must handle that layout too
        import io

        idx = pd.date_range("2024-01-01", periods=3, freq="1D")
        df = pd.Series([1.0, 2.0, 3.0], index=idx).to_frame(name="p")
        df = df.reset_index(names=["index"])
        buf = io.BytesIO()
        df.to_feather(buf, compression="lz4")
        back = decode_kv_blob(buf.getvalue())
        assert list(back.to_numpy()) == [1.0, 2.0, 3.0]
        assert pd.Timestamp(back.index[0]) == idx[0]

    def test_b64_wire(self):
        blob = b"\x00\xffbinary"
        assert b64_wire_decode(b64_wire_encode(blob)) == blob


class TestMigrationReaders:
    def test_chunk_rows_to_long(self, spark):
        arr_a = np.array([1.0, np.nan, 3.0])
        arr_b = np.array([10.0, 20.0])
        rows = []
        for site, arr, start in (
            ("a", arr_a, "2024-01-01 00:00:00+00:00"),
            ("b", arr_b, "2024-02-01 00:00:00+00:00"),
        ):
            blob, dtype = encode_chunk_blob(arr)
            rows.append(
                {"site": site, "start_ts": pd.Timestamp(start),
                 "dtype": dtype, "data": blob}
            )
        sdf = spark.createDataFrame(pd.DataFrame(rows))
        out = legacy_chunk_rows_to_long(
            sdf, keys=("site",), freq_seconds=3600
        ).toPandas().sort_values(["site", "ts"]).reset_index(drop=True)
        # NaN row dropped; hourly steps from start_ts
        assert list(out["site"]) == ["a", "a", "b", "b"]
        assert list(out["value"]) == [1.0, 3.0, 10.0, 20.0]
        assert out["ts"][1] - out["ts"][0] == pd.Timedelta(hours=2)
        assert out["ts"][0] == pd.Timestamp("2024-01-01 00:00:00")

    def test_chunk_rows_keep_nan(self, spark):
        blob, dtype = encode_chunk_blob(np.array([np.nan, 2.0]))
        sdf = spark.createDataFrame(pd.DataFrame([
            {"site": "x", "start_ts": pd.Timestamp("2024-01-01", tz="UTC"),
             "dtype": dtype, "data": blob}
        ]))
        out = legacy_chunk_rows_to_long(
            sdf, keys=("site",), freq_seconds=60, drop_nan=False
        ).toPandas()
        assert len(out) == 2 and np.isnan(out["value"][0])

    def test_kv_rows_to_long(self, spark):
        idx = pd.date_range("2024-03-01", periods=3, freq="1D", tz="UTC")
        rows = []
        for prm, mult in (("p1", 1.0), ("p2", 2.0)):
            blob = encode_kv_blob(prm, pd.Series([1.0, 2.0, 3.0], index=idx) * mult)
            rows.append({"client_id": 1, "prm": prm, "version": 0, "data": blob})
        sdf = spark.createDataFrame(pd.DataFrame(rows))
        out = legacy_kv_rows_to_long(sdf).toPandas().sort_values(
            ["prm", "ts"]
        ).reset_index(drop=True)
        assert len(out) == 6
        assert list(out[out["prm"] == "p2"]["value"]) == [2.0, 4.0, 6.0]
        assert out["ts"][0] == pd.Timestamp("2024-03-01 00:00:00")

    def test_migration_into_chunk_store(self, spark, tmp_store_path):
        # end-to-end: legacy blob rows → long → ingest_long → get_ts
        from holcstore_spark import ChunkStoreConfig
        from holcstore_spark.sources.chunk_store import ChunkStore

        arr = np.arange(48, dtype=np.float64)
        blob, dtype = encode_chunk_blob(arr)
        sdf = spark.createDataFrame(pd.DataFrame([
            {"site": "m1", "start_ts": pd.Timestamp("2024-01-01", tz="UTC"),
             "dtype": dtype, "data": blob}
        ]))
        long = legacy_chunk_rows_to_long(sdf, keys=("site",), freq_seconds=3600)
        cfg = ChunkStoreConfig(keys=("site",), freq="1h", tz="UTC",
                               chunk_axis=("year", "month"),
                               key_types={"site": "str"})
        store = ChunkStore(spark, tmp_store_path, cfg)
        store.ingest_long(long, mode="insert")
        got = store.get_ts({"site": "m1"})
        assert len(got.dropna()) == 48
        assert got.dropna().iloc[-1] == 47.0
