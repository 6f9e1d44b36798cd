"""Baseline JPEG (ITU-T T.81) codec in pure stdlib + numpy.

Closes the last honestly-stubbed decode path of ``decode_strict``
(multimodal.py): PPM/BMP/PNG already decode for real; this adds baseline
sequential JPEG — marker walk, DQT/DHT table parsing, interleaved-MCU
Huffman entropy decode with byte unstuffing and restart markers, dequant,
dezigzag, float64 IDCT, chroma upsampling and JFIF YCbCr→RGB. Progressive
(SOF2) and arithmetic-coded JPEGs raise — they are rare in training
corpora and a numpy progressive decoder would be complexity without a
user.

The decoder takes ALL tables from the bitstream (DQT/DHT), so it decodes
real-world baseline files, not just this module's encoder output. The
encoder exists for deterministic fixtures: fixed quantization tables and
fixed-length canonical Huffman tables (every symbol at one code length —
valid prefix codes by construction, suboptimal compression, zero
table-transcription risk).

Scale shape: decode runs inside ``mapInPandas`` over Arrow batches like
the other codecs (multimodal.py `_DECODERS`); the entropy decode is
per-symbol Python, fine for fixture-sized payloads — real 100 TB corpora
would route through a codec library via the same plumbing.

Exactness property used by the oracle query: an 8×8-aligned image of
UNIFORM blocks with even (value-128) survives quantization exactly
(DC = 8·d, q_dc = 16 → round(d/2) lossless for even d; all AC = 0), so
encode→decode is bit-exact and a SQL oracle can reconstruct the pixel
buffer from the construction.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared tables
# ---------------------------------------------------------------------------


def _zigzag() -> np.ndarray:
    """Zigzag scan order: position i of the scan -> raster index 0..63."""
    out = []
    for s in range(15):
        rs = range(max(0, s - 7), min(7, s) + 1)
        rs = rs if s % 2 else reversed(rs)
        out.extend(r * 8 + (s - r) for r in rs)
    return np.array(out, dtype=np.int64)


ZIGZAG = _zigzag()

#: Annex-K-style luminance quantization table (the exact values only
#: matter for compression quality — the decoder reads DQT from the file)
QTABLE = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)


def _dct_mat() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix; forward F = M B Mᵀ, inverse
    B = Mᵀ F M."""
    x = np.arange(8)
    m = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    m *= np.sqrt(2 / 8)
    m[0] = np.sqrt(1 / 8)
    return m


_M = _dct_mat()


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """JPEG canonical Huffman assignment: symbol -> (code, length)."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _fixed_table(symbols: list[int]) -> tuple[list[int], list[int]]:
    """BITS/HUFFVAL for an all-one-length canonical table: n symbols at
    ceil(log2(n))+1 bits (Kraft < 1 strictly, so the all-ones code —
    forbidden by T.81 — is never assigned)."""
    n = len(symbols)
    length = max(2, (n - 1).bit_length() + 1)
    bits = [0] * 16
    bits[length - 1] = n
    return bits, list(symbols)


#: encoder tables: DC categories 0..11; AC (run, size) symbols + EOB + ZRL
_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_DC_BITS, _DC_VALS = _fixed_table(_DC_SYMBOLS)
_AC_BITS, _AC_VALS = _fixed_table(_AC_SYMBOLS)
_DC_CODES = _canonical_codes(_DC_BITS, _DC_VALS)
_AC_CODES = _canonical_codes(_AC_BITS, _AC_VALS)


# ---------------------------------------------------------------------------
# encoder (fixtures)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:          # byte stuffing
                self.out.append(0x00)

    def byte_align(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-bits padding per T.81

    def emit_rst(self, idx: int) -> None:
        self.byte_align()
        self.out += bytes([0xFF, 0xD0 + (idx % 8)])

    def flush(self) -> bytes:
        self.byte_align()
        return bytes(self.out)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _amplitude(v: int, s: int) -> int:
    return v if v >= 0 else v + (1 << s) - 1


def _encode_block(
    bw: _BitWriter, block: np.ndarray, qt: np.ndarray, pred: int
) -> int:
    """DCT → quantize → zigzag → Huffman-encode one 8×8 block; returns
    the new DC predictor."""
    coef = _M @ (block.astype(np.float64) - 128.0) @ _M.T
    q = np.round(coef.reshape(-1) / qt).astype(np.int64)
    zz = q[ZIGZAG]
    dc = int(zz[0])
    diff = dc - pred
    s = _category(diff)
    code, length = _DC_CODES[s]
    bw.write(code, length)
    if s:
        bw.write(_amplitude(diff, s), s)
    run = 0
    last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, length = _AC_CODES[0xF0]
            bw.write(code, length)
            run -= 16
        s = _category(v)
        code, length = _AC_CODES[(run << 4) | s]
        bw.write(code, length)
        bw.write(_amplitude(v, s), s)
        run = 0
    if last_nz < 63:
        code, length = _AC_CODES[0x00]
        bw.write(code, length)
    return dc


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def _dht_body(tclass: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
    return bytes([(tclass << 4) | tid] + bits + vals)


def encode_jpeg(
    arr: np.ndarray, subsample: bool = False, restart_interval: int = 0
) -> bytes:
    """Baseline sequential JPEG encoder for fixtures.

    ``arr``: HxW uint8 (grayscale, 1 component) or HxWx3 uint8 (RGB as
    YCbCr; 4:4:4, or 4:2:0 with ``subsample`` — chroma is 2×2 block
    means). ``restart_interval`` emits DRI + RSTn markers every N MCUs.
    Dimensions not multiple of the MCU size are edge-padded (the decoder
    crops back to the SOF dims). One quant table, one DC + one AC
    fixed-length Huffman table shared by all components.
    """
    arr = np.asarray(arr, dtype=np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if gray:
        samp = [(1, 1)]
        comps = [arr.astype(np.float64)]
    else:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        samp = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * 3
        comps = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    planes = []
    for (ch, cv), c in zip(samp, comps):
        if (ch, cv) != (hmax, vmax):                   # 2x2-mean downsample
            fy, fx = vmax // cv, hmax // ch
            ph0 = -(-c.shape[0] // fy) * fy
            pw0 = -(-c.shape[1] // fx) * fx
            c = np.pad(
                c, ((0, ph0 - c.shape[0]), (0, pw0 - c.shape[1])), mode="edge"
            )
            c = c.reshape(ph0 // fy, fy, pw0 // fx, fx).mean(axis=(1, 3))
        ph, pw = mcuy * cv * 8, mcux * ch * 8
        planes.append(
            np.pad(c, ((0, ph - c.shape[0]), (0, pw - c.shape[1])), mode="edge")
        )

    out = bytearray(b"\xff\xd8")                       # SOI
    qt_zz = QTABLE[ZIGZAG]                             # raster -> zigzag
    out += _seg(0xDB, bytes([0x00]) + bytes(int(v) for v in qt_zz))
    ncomp = len(comps)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)         # true dims; data padded
    for cid in range(1, ncomp + 1):
        ch, cv = samp[cid - 1]
        sof += bytes([cid, (ch << 4) | cv, 0])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, _dht_body(0, 0, _DC_BITS, _DC_VALS))
    out += _seg(0xC4, _dht_body(1, 0, _AC_BITS, _AC_VALS))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, 0x00])                      # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    bw = _BitWriter()
    preds = [0] * ncomp
    nmcu, rst = 0, 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and nmcu and nmcu % restart_interval == 0:
                bw.emit_rst(rst)
                rst += 1
                preds = [0] * ncomp
            for ci, ((ch, cv), plane) in enumerate(zip(samp, planes)):
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        block = plane[y0 : y0 + 8, x0 : x0 + 8]
                        preds[ci] = _encode_block(bw, block, QTABLE, preds[ci])
            nmcu += 1
    out += bw.flush()
    out += b"\xff\xd9"                                 # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; stops cleanly at
    any real marker (RSTn handled by the MCU loop)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise ValueError(
                    f"JPEG entropy data ended at marker 0xFF{nxt:02X}"
                )
        else:
            self.pos += 1
        self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
        self.n += 8

    def bits(self, k: int) -> int:
        while self.n < k:
            self._fill()
        self.n -= k
        v = (self.acc >> self.n) & ((1 << k) - 1)
        return v

    def align_after_rst(self) -> None:
        """Drop pad bits and consume one RSTn marker."""
        self.n = 0
        while self.data[self.pos] == 0xFF and self.data[self.pos + 1] == 0xFF:
            self.pos += 1                              # fill bytes
        if not (
            self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            raise ValueError("expected JPEG restart marker")
        self.pos += 2


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | br.bits(1)
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _parse_dht(body: bytes, tables: dict) -> None:
    pos = 0
    while pos < len(body):
        tc_th = body[pos]
        bits = list(body[pos + 1 : pos + 17])
        n = sum(bits)
        vals = list(body[pos + 17 : pos + 17 + n])
        lut, code, k = {}, 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                lut[(length, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1
        tables[(tc_th >> 4, tc_th & 0xF)] = lut
        pos += 17 + n


def _parse_dqt(body: bytes, tables: dict) -> None:
    pos = 0
    while pos < len(body):
        pq_tq = body[pos]
        pq, tq = pq_tq >> 4, pq_tq & 0xF
        if pq == 0:
            q = np.frombuffer(body, dtype=np.uint8, count=64, offset=pos + 1)
            pos += 65
        else:
            q = np.frombuffer(body, dtype=">u2", count=64, offset=pos + 1)
            pos += 129
        raster = np.empty(64, dtype=np.int64)
        raster[ZIGZAG] = q.astype(np.int64)            # zigzag -> raster
        tables[tq] = raster
    return None


def parse_jpeg(b: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a baseline sequential JPEG to (w, h, HxWx3 uint8).

    Supports: 8-bit baseline (SOF0), 1 or 3 components, any sampling
    factors 1-2 (4:4:4 / 4:2:2 / 4:2:0 / 4:4:0), multiple DQT/DHT
    segments, 16-bit quant tables, restart intervals. Raises ValueError
    on progressive (SOF2), extended (SOF1), arithmetic (SOF9+) or
    truncated streams.
    """
    if b[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    restart = 0
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        marker = b[pos + 1]
        if marker == 0xD9:                             # EOI
            break
        size = struct.unpack_from(">H", b, pos + 2)[0]
        body = b[pos + 4 : pos + 2 + size]
        if marker == 0xDB:
            _parse_dqt(body, qtables)
        elif marker == 0xC4:
            _parse_dht(body, htables)
        elif marker == 0xC0:
            depth, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            if depth != 8:
                raise ValueError(f"unsupported JPEG bit depth {depth}")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (fw, fh, comps)
        elif marker in (0xC1, 0xC2, 0xC3) or 0xC5 <= marker <= 0xCF and marker not in (0xC8,):
            raise ValueError(
                f"unsupported JPEG coding (SOF{marker - 0xC0}: progressive/"
                "extended/arithmetic) — baseline sequential only"
            )
        elif marker == 0xDD:
            restart = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("JPEG SOS before SOF0")
            return _decode_scan(
                b, pos + 2 + size, frame, body, qtables, htables, restart
            )
        pos += 2 + size
    raise ValueError("JPEG has no scan data")


def _decode_scan(
    b: bytes,
    data_pos: int,
    frame: tuple,
    sos_body: bytes,
    qtables: dict,
    htables: dict,
    restart: int,
) -> tuple[int, int, np.ndarray]:
    fw, fh, comps = frame
    ns = sos_body[0]
    scan_tables = {}
    for i in range(ns):
        cs, tdta = sos_body[1 + 2 * i : 3 + 2 * i]
        scan_tables[cs] = (tdta >> 4, tdta & 0xF)
    if ns != len(comps):
        raise ValueError("non-interleaved JPEG scans not supported")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax > 2 or vmax > 2:
        raise ValueError("JPEG sampling factors above 2 not supported")
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))

    planes = []
    for cid, ch, cv, tq in comps:
        planes.append(
            np.zeros((mcuy * cv * 8, mcux * ch * 8), dtype=np.float64)
        )

    br = _BitReader(b, data_pos)
    preds = [0] * len(comps)
    nmcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and nmcu and nmcu % restart == 0:
                br.align_after_rst()
                preds = [0] * len(comps)
            for ci, (cid, ch, cv, tq) in enumerate(comps):
                dc_lut = htables[(0, scan_tables[cid][0])]
                ac_lut = htables[(1, scan_tables[cid][1])]
                qt = qtables[tq]
                for by in range(cv):
                    for bx in range(ch):
                        zz = np.zeros(64, dtype=np.int64)
                        s = _huff_decode(br, dc_lut)
                        diff = _extend(br.bits(s), s) if s else 0
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(br, ac_lut)
                            r, sz = rs >> 4, rs & 0xF
                            if sz == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break                  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            zz[k] = _extend(br.bits(sz), sz)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[ZIGZAG] = (zz * qt[ZIGZAG]).astype(np.float64)
                        blk = _M.T @ coef.reshape(8, 8) @ _M + 128.0
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = blk
            nmcu += 1

    # upsample subsampled planes to full MCU-grid resolution, crop, convert
    full_h, full_w = mcuy * vmax * 8, mcux * hmax * 8
    up = []
    for (cid, ch, cv, tq), plane in zip(comps, planes):
        p = np.repeat(np.repeat(plane, vmax // cv, axis=0), hmax // ch, axis=1)
        up.append(p[:full_h, :full_w])
    if len(up) == 1:
        ych = np.clip(np.round(up[0]), 0, 255).astype(np.uint8)[:fh, :fw]
        rgb = np.repeat(ych[..., None], 3, axis=2)
        return fw, fh, np.ascontiguousarray(rgb)
    y, cb, cr = up[0], up[1] - 128.0, up[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    bl = y + 1.772 * cb
    rgb = np.stack([r, g, bl], axis=2)
    rgb = np.clip(np.round(rgb), 0, 255).astype(np.uint8)[:fh, :fw]
    return fw, fh, np.ascontiguousarray(rgb)
