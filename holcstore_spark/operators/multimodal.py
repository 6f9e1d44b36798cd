"""Multimodal column handling: image/audio/video as opaque binary columns
with typed metadata.

``decode_strict`` REALLY decodes the dependency-free formats (PPM P6,
PGM P5, uncompressed 24-bit BMP, PNG via stdlib ``zlib`` + scanline
unfiltering, baseline AND progressive JPEG via operators/jpeg.py, WAV
PCM audio, and uncompressed RIFF/AVI video) with header parsing + numpy
pixel math. Formats that genuinely need absent codec libraries
(compressed video codecs) stay STUBBED behind ``decode_stub``
(deterministic fake with the real Arrow-batched ``mapInPandas``
plumbing, batch shapes and partitioning).

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


def _parse_pnm_header(b: bytes, magic: bytes, kind: str) -> tuple[int, int, int]:
    """Shared netpbm binary header grammar (P5/P6): whitespace-separated
    tokens with ``#`` comments, maxval must be 255. Returns
    (width, height, pixel_data_offset)."""
    if b[:2] != magic:
        raise ValueError(f"not a {magic.decode()} {kind}")
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if pos < len(b) and b[pos : pos + 1] == b"#":
            while pos < len(b) and b[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(b[start:pos]))
    pos += 1  # single whitespace byte after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"unsupported {kind} maxval {maxval}")
    return w, h, pos


def _parse_ppm(b: bytes) -> tuple[int, int, "np.ndarray"]:
    """Parse a binary PPM (P6): shared netpbm header, then exactly
    3·w·h raw RGB bytes. Returns (width, height, HxWx3 uint8 array)."""
    import numpy as np

    w, h, pos = _parse_pnm_header(b, b"P6", "PPM")
    need = 3 * w * h
    pix = b[pos : pos + need]
    if len(pix) != need:
        raise ValueError("truncated PPM pixel data")
    return w, h, np.frombuffer(pix, dtype=np.uint8).reshape(h, w, 3)


def _parse_pgm(b: bytes) -> tuple[int, int, "np.ndarray"]:
    """Parse a binary PGM (P5): shared netpbm header, then w·h raw
    bytes. Returns (width, height, HxWx3 uint8) with the gray plane
    replicated to RGB so every downstream stat (channel means, resize)
    works unchanged."""
    import numpy as np

    w, h, pos = _parse_pnm_header(b, b"P5", "PGM")
    need = w * h
    pix = b[pos : pos + need]
    if len(pix) != need:
        raise ValueError("truncated PGM pixel data")
    gray = np.frombuffer(pix, dtype=np.uint8).reshape(h, w)
    return w, h, np.repeat(gray[:, :, None], 3, axis=2)


def _parse_bmp(b: bytes) -> tuple[int, int, "np.ndarray"]:
    """Parse an uncompressed 24-bit BMP (BI_RGB): BITMAPFILEHEADER +
    BITMAPINFOHEADER, 4-byte-aligned bottom-up rows, BGR byte order.
    Returns (width, height, HxWx3 uint8 RGB array)."""
    import struct

    import numpy as np

    if b[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", b, 10)[0]
    w, h = struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    compression = struct.unpack_from("<I", b, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    top_down = h < 0
    h = abs(h)
    stride = ((w * 3 + 3) // 4) * 4
    raw = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=data_off)
    rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return w, h, rows[..., ::-1]  # BGR → RGB


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> "np.ndarray":
    """Reverse the PNG per-scanline filters (None/Sub/Up/Average/Paeth,
    RFC 2083 §6). Up/None are vectorized; Sub/Average/Paeth carry a
    per-byte dependency on the already-reconstructed left neighbour, so
    those rows run a (stride-bounded) Python loop — fixture-scale
    images, and each Arrow batch decodes many rows in parallel tasks."""
    import numpy as np

    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters, lines = rows[:, 0], rows[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), dtype=np.int32)
    for y in range(h):
        f = int(filters[y])
        line = lines[y]
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.int32)
        if f == 0:
            rec = line
        elif f == 2:  # Up
            rec = (line + prev) & 0xFF
        elif f == 1:  # Sub
            rec = line.copy()
            for x in range(bpp, stride):
                rec[x] = (rec[x] + rec[x - bpp]) & 0xFF
        elif f == 3:  # Average
            rec = line.copy()
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                rec[x] = (rec[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            rec = line.copy()
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                c = int(prev[x - bpp]) if x >= bpp else 0
                b_up = int(prev[x])
                p = a + b_up - c
                pa, pb, pc = abs(p - a), abs(p - b_up), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b_up if pb <= pc else c)
                rec[x] = (rec[x] + pr) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = rec
    return out.astype(np.uint8)


def _parse_png(b: bytes) -> tuple[int, int, "np.ndarray"]:
    """Parse a PNG with the stdlib only: chunk walk (IHDR/PLTE/IDAT),
    ``zlib`` inflate, per-scanline unfilter, channel mapping to RGB.
    Supports bit depth 8, colour types 0 (gray), 2 (RGB), 3 (palette),
    4 (gray+alpha), 6 (RGBA), non-interlaced; alpha is dropped (the
    decode contract reports RGB stats). Returns (w, h, HxWx3 uint8)."""
    import struct
    import zlib

    import numpy as np

    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, ihdr, plte, idat = 8, None, None, []
    while pos + 8 <= len(b):
        size, ctype = struct.unpack_from(">I4s", b, pos)
        body = b[pos + 8 : pos + 8 + size]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + size  # length + type + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0 or channels is None:
        raise ValueError(
            f"unsupported PNG (depth={depth}, color={color}, "
            f"interlace={interlace})"
        )
    if color == 3 and plte is None:
        raise ValueError("paletted PNG missing PLTE")
    stride = w * channels
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("truncated PNG pixel data")
    px = _png_unfilter(raw, h, stride, channels).reshape(h, w, channels)
    if color == 2:
        rgb = px
    elif color == 6:
        rgb = px[..., :3]
    elif color in (0, 4):
        rgb = np.repeat(px[..., :1], 3, axis=2)
    else:  # palette lookup
        if int(px.max()) >= len(plte):
            raise ValueError("PNG palette index out of range")
        rgb = plte[px[..., 0]]
    return w, h, np.ascontiguousarray(rgb)


def encode_png(arr: "np.ndarray", filter_cycle: bool = False) -> bytes:
    """Minimal PNG encoder for fixtures (colour type 2, depth 8). With
    ``filter_cycle`` each scanline y uses filter type y % 5, exercising
    every unfilter branch — the filters are lossless, so a decode that
    does not reproduce the exact input bytes is an unfilter bug."""
    import struct
    import zlib

    import numpy as np

    h, w, _ = arr.shape
    arr = arr.astype(np.int32)
    lines = []
    for y in range(h):
        row = arr[y].reshape(-1)
        f = (y % 5) if filter_cycle else 0
        prev = arr[y - 1].reshape(-1) if y else np.zeros(w * 3, dtype=np.int32)
        if f == 0:
            enc = row
        elif f == 1:  # Sub
            left = np.concatenate([np.zeros(3, dtype=np.int32), row[:-3]])
            enc = (row - left) & 0xFF
        elif f == 2:  # Up
            enc = (row - prev) & 0xFF
        elif f == 3:  # Average
            left = np.concatenate([np.zeros(3, dtype=np.int32), row[:-3]])
            enc = (row - ((left + prev) >> 1)) & 0xFF
        else:  # Paeth
            left = np.concatenate([np.zeros(3, dtype=np.int32), row[:-3]])
            ul = np.concatenate([np.zeros(3, dtype=np.int32), prev[:-3]])
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            )
            enc = (row - pred) & 0xFF
        lines.append(bytes([f]) + enc.astype(np.uint8).tobytes())

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    idat = zlib.compress(b"".join(lines))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def _parse_jpeg(b: bytes) -> tuple[int, int, "np.ndarray"]:
    """Baseline JPEG via :mod:`holcstore_spark.operators.jpeg` (pure
    stdlib + numpy: Huffman entropy decode, dequant, IDCT, chroma
    upsample, YCbCr→RGB). Progressive/arithmetic raise ValueError."""
    from holcstore_spark.operators.jpeg import parse_jpeg

    return parse_jpeg(b)


#: codec sniffers tried in order by :func:`decode_strict`
_DECODERS = (
    ("ppm", b"P6", _parse_ppm),
    ("pgm", b"P5", _parse_pgm),
    ("bmp", b"BM", _parse_bmp),
    ("png", _PNG_SIG, _parse_png),
    ("jpeg", b"\xff\xd8\xff", _parse_jpeg),
)


def _parse_wav(b: bytes) -> tuple[int, int, int, "np.ndarray"]:
    """Parse a RIFF/WAVE file with uncompressed PCM samples (format 1,
    8- or 16-bit). Walks the chunk list (fmt / data may be preceded by
    LIST etc.). Returns (sample_rate, n_channels, bits, samples) with
    samples as an int32 array of CENTERED amplitudes (8-bit PCM is
    unsigned-biased by 128; 16-bit is already signed)."""
    import struct

    import numpy as np

    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        cid, size = b[pos : pos + 4], struct.unpack_from("<I", b, pos + 4)[0]
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits not in (8, 16):
        raise ValueError(f"unsupported WAV (format={audio_format}, bits={bits})")
    if bits == 8:
        samples = np.frombuffer(data, dtype=np.uint8).astype(np.int32) - 128
    else:
        samples = np.frombuffer(
            data[: len(data) - (len(data) % 2)], dtype="<i2"
        ).astype(np.int32)
    return sample_rate, n_channels, bits, samples


def decode_audio_strict(
    df: DataFrame, payload: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """REAL audio decode for RIFF/WAVE PCM payloads (8/16-bit): chunk-walk
    header parse + numpy sample math, no codec libraries. Compressed
    audio (mp3/ogg/aac) needs external codecs — absent here — and raises.

    Output per payload: id, codec, sample_rate, n_channels, n_samples
    (frames = samples / channels) and mean_abs — the mean absolute
    centered amplitude as an exact integer-sum / count division, so any
    engine reproduces it bit-for-bit."""
    import numpy as np

    out_schema = T.StructType([
        df.schema[id_col],
        T.StructField("codec", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("mean_abs", T.DoubleType()),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rates, chans, counts, means = [], [], [], []
            for b in pdf[payload]:
                rate, nch, _bits, samples = _parse_wav(bytes(b))
                rates.append(rate)
                chans.append(nch)
                counts.append(len(samples) // max(nch, 1))
                total = int(np.abs(samples).sum(dtype=np.int64))
                means.append(total / len(samples) if len(samples) else 0.0)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "codec": "wav",
                    "sample_rate": pd.array(rates, dtype="int32"),
                    "n_channels": pd.array(chans, dtype="int32"),
                    "n_samples": pd.array(counts, dtype="int64"),
                    "mean_abs": pd.array(means, dtype="float64"),
                }
            )

    return df.select(id_col, payload).mapInPandas(batches, schema=out_schema)


def resize_strict(
    df: DataFrame,
    payload: str = "payload",
    id_col: str = "doc_id",
    factor: int = 2,
) -> DataFrame:
    """REAL image resize for the pure-python-decodable formats:
    decode (PPM/BMP), nearest-neighbour downsample by integer ``factor``
    (every ``factor``-th pixel in both axes), re-encode as binary PPM.
    Output: id, width, height (post-resize), payload (valid P6 bytes —
    feed it back through :func:`decode_strict` to verify)."""
    import numpy as np

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
                for _codec, magic, parse in _DECODERS:
                    if b[: len(magic)] == magic:
                        _w, _h, arr = parse(b)
                        break
                else:
                    raise NotImplementedError(
                        f"no pure-python decoder for payload starting "
                        f"{b[:4]!r}; use resize_stub for opaque formats"
                    )
                small = np.ascontiguousarray(arr[::factor, ::factor])
                h2, w2 = small.shape[:2]
                widths.append(w2)
                heights.append(h2)
                outs.append(
                    f"P6\n{w2} {h2}\n255\n".encode() + small.tobytes()
                )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": pd.array(widths, dtype="int32"),
                    "height": pd.array(heights, dtype="int32"),
                    payload: outs,
                }
            )

    return df.select(id_col, payload).mapInPandas(batches, schema=out_schema)


def encode_wav_pcm8(data: bytes, sample_rate: int = 8000) -> bytes:
    """Minimal mono 8-bit PCM WAV wrapper around raw sample bytes — the
    test/fixture encoder (standard RIFF layout, what ``wave`` stdlib
    would produce for 1 channel / 1 byte width)."""
    import struct

    n = len(data)
    return (
        b"RIFF" + struct.pack("<I", 36 + n) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                                sample_rate, 1, 8)
        + b"data" + struct.pack("<I", n) + data
    )


def decode_strict(
    df: DataFrame, payload: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """REAL image decode, no codec libraries: PPM P6, uncompressed 24-bit
    BMP, PNG (stdlib zlib inflate + unfilter) and baseline sequential OR
    progressive JPEG (pure-numpy Huffman + IDCT pipeline,
    operators/jpeg.py). Payloads in any other format (video) raise —
    those need ffmpeg/PIL, absent here; route them through
    :func:`decode_stub` instead.

    Output per payload: id, codec, width, height, per-channel means
    (mean_r/g/b as exact DOUBLEs) and the md5 digest of the raw RGB
    buffer. Header parsing is per-row Python on ~20 header bytes; all
    pixel arithmetic is vectorized numpy over the Arrow batch.
    """
    import numpy as np

    out_schema = T.StructType([
        df.schema[id_col],
        T.StructField("codec", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("pixel_digest", T.StringType()),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            cods, ws, hs, mr, mg, mb, digs = [], [], [], [], [], [], []
            for b in pdf[payload]:
                b = bytes(b)
                for codec, magic, parse in _DECODERS:
                    if b[: len(magic)] == magic:
                        w, h, arr = parse(b)
                        break
                else:
                    raise NotImplementedError(
                        f"no pure-python decoder for payload starting "
                        f"{b[:4]!r}; compressed formats need PIL/ffmpeg "
                        f"(absent here) — use decode_stub"
                    )
                # exact channel means: integer sum then one division, so
                # Spark and any oracle agree bit-for-bit
                sums = arr.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                n = arr.shape[0] * arr.shape[1]
                cods.append(codec)
                ws.append(w)
                hs.append(h)
                mr.append(sums[0] / n)
                mg.append(sums[1] / n)
                mb.append(sums[2] / n)
                digs.append(hashlib.md5(arr.tobytes()).hexdigest())
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "codec": cods,
                    "width": pd.array(ws, dtype="int32"),
                    "height": pd.array(hs, dtype="int32"),
                    "mean_r": pd.array(mr, dtype="float64"),
                    "mean_g": pd.array(mg, dtype="float64"),
                    "mean_b": pd.array(mb, dtype="float64"),
                    "pixel_digest": digs,
                }
            )

    return df.select(id_col, payload).mapInPandas(batches, schema=out_schema)


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


#: fourcc 'MJPG' as the little-endian uint32 biCompression carries it
_MJPG_FOURCC = int.from_bytes(b"MJPG", "little")


def encode_avi(
    frames: "np.ndarray", fps: int = 10, codec: str = "DIB"
) -> bytes:
    """Minimal RIFF/AVI writer for fixtures: one 'vids' stream of
    either BI_RGB DIB frames (bottom-up, BGR, 4-byte row padding;
    ``codec='DIB'``) or Motion-JPEG frames (each frame one baseline
    JPEG from :func:`holcstore_spark.operators.jpeg.encode_jpeg`;
    ``codec='MJPG'``) — the same stdlib-only spirit as
    :func:`encode_wav_pcm8`.

    ``frames``: (n, h, w, 3) uint8 RGB.
    """
    import struct

    import numpy as np

    n, h, w, _ = frames.shape
    codec = codec.upper()
    if codec not in ("DIB", "MJPG"):
        raise ValueError(f"unsupported AVI codec {codec!r}: DIB or MJPG")
    if n == 0:
        raise ValueError("encode_avi requires at least one frame")

    def dib(frame: "np.ndarray") -> bytes:
        stride = (w * 3 + 3) & ~3
        bgr = frame[::-1, :, ::-1].astype(np.uint8)       # bottom-up, BGR
        if stride == w * 3:
            return bgr.tobytes()
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = bgr.reshape(h, w * 3)
        return rows.tobytes()

    if codec == "DIB":
        payloads = [dib(f) for f in frames]
        compression = 0
        handler = b"DIB "
    else:
        from holcstore_spark.operators.jpeg import encode_jpeg

        payloads = [encode_jpeg(f) for f in frames]
        compression = _MJPG_FOURCC
        handler = b"MJPG"
    frame_size = max(len(p) for p in payloads)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps, frame_size * fps, 0, 0x10, n, 0, 1, frame_size,
        w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + handler + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps,
                                        0, n, frame_size, 0, 0, 0)
        + struct.pack("<hhhh", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, compression,
                       frame_size, 0, 0, 0, 0)

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(form: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", form + body)

    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)
    fid = b"00db" if codec == "DIB" else b"00dc"
    movi = lst(b"movi", b"".join(chunk(fid, p) for p in payloads))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def parse_avi(b: bytes) -> tuple[int, int, "np.ndarray"]:
    """Parse a RIFF/AVI with the stdlib only: chunk walk for avih
    (dims) and the movi LIST, then per-frame decode. BI_RGB DIB frames
    (bottom-up BGR, 4-byte row padding → top-down RGB) and
    Motion-JPEG frames (biCompression fourcc 'MJPG' — each frame is
    one baseline or progressive JPEG, decoded by
    :func:`holcstore_spark.operators.jpeg.parse_jpeg`; r15) decode for
    real. Returns (w, h, (n, h, w, 3) uint8). Other compressions raise
    — those need ffmpeg.
    """
    import struct

    import numpy as np

    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    w = h = None
    compression = 0
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal w, h, compression
        while pos + 8 <= end:
            cid, size = b[pos : pos + 4], struct.unpack_from("<I", b, pos + 4)[0]
            body_at = pos + 8
            if cid == b"LIST":
                walk(body_at + 4, body_at + size)       # skip form code
            elif cid == b"avih":
                vals = struct.unpack_from("<IIIIIIIIII", b, body_at)
                w, h = vals[8], vals[9]
            elif cid == b"strf":
                compression = struct.unpack_from("<I", b, body_at + 16)[0]
            elif cid in (b"00db", b"00dc"):
                frames.append(b[body_at : body_at + size])
            pos = body_at + size + (size & 1)           # word-aligned

    walk(12, len(b))
    if w is None or not frames:
        raise ValueError("AVI missing avih header or frame data")
    if compression == _MJPG_FOURCC:
        from holcstore_spark.operators.jpeg import parse_jpeg

        out = np.empty((len(frames), h, w, 3), dtype=np.uint8)
        for i, fr in enumerate(frames):
            fw, fh, rgb = parse_jpeg(bytes(fr))
            if (fw, fh) != (w, h):
                raise ValueError(
                    f"MJPEG frame {i} is {fw}x{fh}, header says {w}x{h}"
                )
            out[i] = rgb
        return w, h, out
    if compression != 0:
        raise ValueError(
            f"compressed AVI stream (biCompression={compression}) — "
            "only BI_RGB DIB and MJPG frames decode without ffmpeg"
        )
    stride = (w * 3 + 3) & ~3
    out = np.empty((len(frames), h, w, 3), dtype=np.uint8)
    for i, fr in enumerate(frames):
        if len(fr) != stride * h:
            raise ValueError("AVI frame size does not match header dims")
        rows = np.frombuffer(fr, dtype=np.uint8).reshape(h, stride)
        out[i] = rows[:, : w * 3].reshape(h, w, 3)[::-1, :, ::-1]
    return w, h, out


def frame_sample_strict(
    df: DataFrame,
    payload: str = "payload",
    id_col: str = "doc_id",
    every: int = 2,
) -> DataFrame:
    """REAL video frame sampling for uncompressed RIFF/AVI payloads: parse
    the container, keep every ``every``-th frame, and emit per-frame RGB
    stats — the row-exploding mapInPandas shape of :func:`frame_sample`
    with actual decoded pixels instead of a byte stride. Compressed
    codecs raise (route through :func:`frame_sample`'s stub instead).

    Output: id, frame_idx, width, height, mean_r/g/b (exact int-sum
    divisions), frame_digest (md5 of the frame's RGB buffer).
    """
    import numpy as np

    out_schema = T.StructType([
        df.schema[id_col],
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("frame_digest", T.StringType()),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, ws, hs = [], [], [], []
            mr, mg, mb, digs = [], [], [], []
            for rid, b in zip(pdf[id_col], pdf[payload]):
                w, h, frames = parse_avi(bytes(b))
                for i in range(0, len(frames), every):
                    fr = frames[i]
                    sums = fr.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                    npx = w * h
                    ids.append(rid)
                    idxs.append(i)
                    ws.append(w)
                    hs.append(h)
                    mr.append(sums[0] / npx)
                    mg.append(sums[1] / npx)
                    mb.append(sums[2] / npx)
                    digs.append(hashlib.md5(fr.tobytes()).hexdigest())
            yield pd.DataFrame(
                {
                    id_col: pd.array(ids, dtype=pdf[id_col].dtype),
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "width": pd.array(ws, dtype="int32"),
                    "height": pd.array(hs, dtype="int32"),
                    "mean_r": pd.array(mr, dtype="float64"),
                    "mean_g": pd.array(mg, dtype="float64"),
                    "mean_b": pd.array(mb, dtype="float64"),
                    "frame_digest": digs,
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


# ---------------------------------------------------------------------------
# Perceptual hashing / image near-dup (r16 — VERDICT r15 ask #7)
# ---------------------------------------------------------------------------

def dhash_strict(
    df: DataFrame,
    payload: str = "payload",
    id_col: str = "doc_id",
    hash_w: int = 8,
    hash_h: int = 8,
) -> DataFrame:
    """Difference-hash (dHash) over the REAL decoders — the perceptual
    fingerprint that makes near-identical images (re-encodes, small
    edits, thumbnails) collide where byte digests cannot.

    Per image: decode (any ``decode_strict`` codec), integer grayscale
    ``(r+g+b)//3``, sample a ``(hash_w+1)×hash_h`` grid at the
    DETERMINISTIC nearest-neighbour positions ``x_i = i·W//(hash_w+1)``,
    ``y_j = j·H//hash_h`` (no area interpolation — the grid is exact
    integer arithmetic any engine reproduces, unlike PIL's resampling),
    then bit ``k = j·hash_w + i`` is 1 iff ``g[y_j][x_i] <
    g[y_j][x_{i+1}]`` (left-darker-than-right). The 64 bits pack
    MSB-first into two 32-bit halves ``dhash_hi`` (bits 0..31) and
    ``dhash_lo`` (bits 32..63) so both Spark and SQL oracles stay in
    signed-BIGINT-safe territory.

    Output: (id, codec, width, height, dhash_hi, dhash_lo). Arrow
    batches throughout; pixel math is vectorized numpy.
    """
    import numpy as np

    if hash_w * hash_h != 64:
        raise ValueError(
            f"dhash_strict: hash_w*hash_h must be 64 (two 32-bit "
            f"halves), got {hash_w}x{hash_h}"
        )
    out_schema = T.StructType([
        df.schema[id_col],
        T.StructField("codec", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("dhash_hi", T.LongType()),
        T.StructField("dhash_lo", T.LongType()),
    ])
    half = 32

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w_hi = (1 << np.arange(half - 1, -1, -1, dtype=np.int64))
        for pdf in it:
            cods, ws, hs, his, los = [], [], [], [], []
            for b in pdf[payload]:
                b = bytes(b)
                for codec, magic, parse in _DECODERS:
                    if b[: len(magic)] == magic:
                        w, h, arr = parse(b)
                        break
                else:
                    raise NotImplementedError(
                        f"no pure-python decoder for payload starting "
                        f"{b[:4]!r}; compressed formats need PIL/ffmpeg "
                        f"(absent here) — use decode_stub"
                    )
                gray = arr.astype(np.int32).sum(axis=2) // 3
                ys = (np.arange(hash_h) * h) // hash_h
                xs = (np.arange(hash_w + 1) * w) // (hash_w + 1)
                g = gray[np.ix_(ys, xs)]
                bits = (g[:, :-1] < g[:, 1:]).astype(np.int64).ravel()
                cods.append(codec)
                ws.append(w)
                hs.append(h)
                his.append(int((bits[:half] * w_hi).sum()))
                los.append(int((bits[half:] * w_hi).sum()))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "codec": cods,
                    "width": pd.array(ws, dtype="int32"),
                    "height": pd.array(hs, dtype="int32"),
                    "dhash_hi": pd.array(his, dtype="int64"),
                    "dhash_lo": pd.array(los, dtype="int64"),
                }
            )

    return df.select(id_col, payload).mapInPandas(batches, schema=out_schema)


def dhash_bands(
    hashes: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """LSH banding of a 64-bit dHash: four 16-bit bands as the generic
    ``(id, band_id, band_key)`` shape — images sharing any band value
    are near-dup candidates (≤ ~16 flipped bits cannot touch all four
    bands... pigeonhole: ≤3 flipped bits leave ≥1 band intact, and
    empirically near-dups flip few, clustered bits).

    band_key is the band value as 8 lowercase hex digits — the exact
    key shape :class:`~holcstore_spark.sources.band_index.BandIndex`
    freezes for ``(n_hashes=4, bands=4)``, so image bands feed the SAME
    managed exactly-once index (and
    :func:`~holcstore_spark.operators.dedup.dedup_incremental`) that
    text MinHash bands do. Pure JVM bit arithmetic, zero Python."""
    mask = F.lit(0xFFFF)
    bands_arr = F.array(*[
        F.struct(
            F.lit(i).alias("band_id"),
            F.lpad(F.lower(F.hex(
                F.shiftright(F.col(src), sh).bitwiseAND(mask)
            )), 8, "0").alias("band_key"),
        )
        for i, (src, sh) in enumerate([
            ("dhash_hi", 16), ("dhash_hi", 0),
            ("dhash_lo", 16), ("dhash_lo", 0),
        ])
    ])
    return hashes.select(
        F.col(id_col), F.explode(bands_arr).alias("__band")
    ).select(
        id_col,
        F.col("__band.band_id").alias("band_id"),
        F.col("__band.band_key").alias("band_key"),
    )


def image_neardup_pairs(
    df: DataFrame,
    payload: str = "payload",
    id_col: str = "doc_id",
    max_hamming: int = 10,
    max_bucket: int | None = None,
) -> DataFrame:
    """Image near-duplicate pairs by perceptual hash: dHash every
    payload (real decode), LSH-band the hashes, explode candidate
    pairs per bucket (shared
    :func:`~holcstore_spark.operators.dedup.band_candidate_pairs` —
    cost Σ bucket², never n²), then verify candidates by exact Hamming
    distance ``bit_count(hi_a^hi_b) + bit_count(lo_a^lo_b)`` — all
    JVM-side after the one decode pass.

    Output: (id_a, id_b, hamming), id_a < id_b, hamming ≤
    ``max_hamming``. ``max_bucket`` is the same boilerplate valve as
    the MinHash path (flat-colour images collapse into one bucket).
    """
    from holcstore_spark.operators.dedup import band_candidate_pairs
    from holcstore_spark.sources.io_util import safe_local_checkpoint

    # the decode+hash lineage feeds THREE plan branches (banding and
    # both hash-join sides) — materialize it once or the dominant
    # decode cost runs three times (review r16)
    h = safe_local_checkpoint(
        dhash_strict(df, payload, id_col).select(
            id_col, "dhash_hi", "dhash_lo"
        )
    )
    pairs = band_candidate_pairs(dhash_bands(h, id_col), id_col, max_bucket)
    a = h.select(
        F.col(id_col).alias("id_a"),
        F.col("dhash_hi").alias("__ha"), F.col("dhash_lo").alias("__la"),
    )
    b = h.select(
        F.col(id_col).alias("id_b"),
        F.col("dhash_hi").alias("__hb"), F.col("dhash_lo").alias("__lb"),
    )
    ham = (
        F.bit_count(F.col("__ha").bitwiseXOR(F.col("__hb")))
        + F.bit_count(F.col("__la").bitwiseXOR(F.col("__lb")))
    ).cast("int")
    return (
        pairs.join(a, on="id_a").join(b, on="id_b")
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= F.lit(int(max_hamming)))
        .select("id_a", "id_b", "hamming")
    )


def image_dedup_incremental(
    new_docs: DataFrame,
    index: DataFrame,
    payload: str = "payload",
    id_col: str = "doc_id",
    max_bucket: int | None = None,
    exclude_self: bool = False,
) -> DataFrame:
    """Incremental image near-dup against a persisted dHash band index
    — the image twin of
    :func:`~holcstore_spark.operators.dedup.dedup_incremental`: the
    historical corpus is dHashed ONCE and its bands stored (a
    :class:`~holcstore_spark.sources.band_index.BandIndex` created
    with ``n_hashes=4, bands=4`` accepts them verbatim — the 8-hex
    band_key shape matches its frozen-params contract); each ingest
    batch decodes+hashes only itself. Keep rule, valve, exclude_self
    replay semantics and plan shape are the shared
    :func:`~holcstore_spark.operators.dedup.band_dedup_incremental`
    tail. Returns the kept new rows with all their columns."""
    from holcstore_spark.operators.dedup import band_dedup_incremental

    nb = dhash_bands(dhash_strict(new_docs, payload, id_col), id_col)
    return band_dedup_incremental(
        new_docs, nb, index, id_col, max_bucket, exclude_self
    )
