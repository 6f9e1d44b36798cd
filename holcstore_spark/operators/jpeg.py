"""Baseline + progressive JPEG (ITU-T T.81) codec in pure stdlib + numpy.

Closes the last honestly-stubbed decode paths of ``decode_strict``
(multimodal.py): PPM/BMP/PNG already decode for real; this adds baseline
sequential JPEG — marker walk, DQT/DHT table parsing, interleaved-MCU
Huffman entropy decode with byte unstuffing and restart markers, dequant,
dezigzag, float64 IDCT, chroma upsampling and JFIF YCbCr→RGB — and, as of
round 15, PROGRESSIVE JPEG (SOF2, T.81 annex G): multi-scan spectral
selection + successive approximation, DC first/refine scans (interleaved
or single-component), AC first/refine scans (per component, EOBRUN runs
across blocks, embedded correction bits), coefficients accumulated across
scans into per-component buffers and IDCT'd once at the end — so baseline
and progressive encodings of the same quantized coefficients decode to
BIT-IDENTICAL pixels (the round-trip property the tests pin). Extended
(SOF1), lossless (SOF3) and arithmetic-coded (SOF9+) frames still raise.

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


def _prep_planes(arr: np.ndarray, subsample: bool):
    """Shared encoder front end: color transform, chroma downsample,
    MCU-grid edge padding. Returns (h, w, samp, planes, mcux, mcuy)."""
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
    return h, w, samp, planes, mcux, mcuy


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
    h, w, samp, planes, mcux, mcuy = _prep_planes(arr, subsample)
    comps = planes

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
# progressive encoder (fixtures)
# ---------------------------------------------------------------------------

#: AC table for progressive scans: every EOBRUN length code (r<<4,
#: r 0..14), ZRL, and (run, size 1..10) — its own symbol set so the
#: baseline encoder's table (and its fixture bytes) stay untouched
_ACP_SYMBOLS = sorted(
    {r << 4 for r in range(15)} | {0xF0}
    | {(r << 4) | s for r in range(16) for s in range(1, 11)}
)
_ACP_BITS, _ACP_VALS = _fixed_table(_ACP_SYMBOLS)
_ACP_CODES = _canonical_codes(_ACP_BITS, _ACP_VALS)


def _ttz(v: int, al: int) -> int:
    """The T.81 AC point transform: divide by 2^Al truncating toward
    zero (DC uses plain arithmetic shift instead)."""
    return v >> al if v >= 0 else -((-v) >> al)


def _enc_dc_scan(bw, qc, comp_ids, samp, mcux, mcuy, dims, ah, al):
    """DC scan: first (Ah=0, Huffman diff coding of dc>>Al) or
    refinement (one raw bit per block). Interleaved over the listed
    components, or the single component's own block grid."""
    preds = {c: 0 for c in comp_ids}

    def one(c, by, bx):
        dc = int(qc[c][by, bx, 0])
        if ah == 0:
            t = dc >> al
            diff = t - preds[c]
            preds[c] = t
            s = _category(diff)
            code, ln = _DC_CODES[s]
            bw.write(code, ln)
            if s:
                bw.write(_amplitude(diff, s), s)
        else:
            bw.write((dc >> al) & 1, 1)

    if len(comp_ids) > 1:
        for my in range(mcuy):
            for mx in range(mcux):
                for c in comp_ids:
                    ch, cv = samp[c]
                    for by in range(cv):
                        for bx in range(ch):
                            one(c, my * cv + by, mx * ch + bx)
    else:
        c = comp_ids[0]
        cbw, cbh = dims[c]
        for by in range(cbh):
            for bx in range(cbw):
                one(c, by, bx)


def _enc_ac_first(bw, blocks, cbw, cbh, ss, se, al):
    """AC first scan for a band: values at precision Al, zero runs,
    cross-block EOBRUN batching (T.81 G.1.2.2)."""
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            code, ln = _ACP_CODES[r << 4]
            bw.write(code, ln)
            if r:
                bw.write(eobrun - (1 << r), r)
            eobrun = 0

    for by in range(cbh):
        for bx in range(cbw):
            zz = blocks[by, bx]
            t = [_ttz(int(zz[k]), al) for k in range(ss, se + 1)]
            nz = [i for i, v in enumerate(t) if v]
            if not nz:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
                continue
            flush_eob()
            run = 0
            for i in range(nz[-1] + 1):
                v = t[i]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = _ACP_CODES[0xF0]
                    bw.write(code, ln)
                    run -= 16
                s = _category(v)
                code, ln = _ACP_CODES[(run << 4) | s]
                bw.write(code, ln)
                bw.write(_amplitude(v, s), s)
                run = 0
            if nz[-1] < len(t) - 1:
                eobrun = 1                             # trailing zeros
    flush_eob()


def _enc_ac_refine(bw, blocks, cbw, cbh, ss, se, al):
    """AC refinement scan (T.81 G.1.2.3, the IJG encode_mcu_AC_refine
    shape): newly-nonzero coefficients as (run,1)+sign, correction bits
    for already-nonzero coefficients buffered and emitted after the
    next symbol, EOBRUN carrying the skipped blocks' correction bits."""
    eobrun = 0
    ebits: list[int] = []

    def flush_eob():
        nonlocal eobrun, ebits
        if eobrun:
            r = eobrun.bit_length() - 1
            code, ln = _ACP_CODES[r << 4]
            bw.write(code, ln)
            if r:
                bw.write(eobrun - (1 << r), r)
        for bit in ebits:
            bw.write(bit, 1)
        eobrun = 0
        ebits = []

    for by in range(cbh):
        for bx in range(cbw):
            zz = blocks[by, bx]
            cur = [_ttz(int(zz[k]), al) for k in range(ss, se + 1)]
            hist = [_ttz(int(zz[k]), al + 1) for k in range(ss, se + 1)]
            news = [i for i in range(len(cur))
                    if hist[i] == 0 and cur[i] != 0]
            if not news:
                eobrun += 1
                ebits.extend(
                    abs(cur[i]) & 1 for i in range(len(cur)) if hist[i]
                )
                if eobrun == 0x7FFF:
                    flush_eob()
                continue
            flush_eob()
            run = 0
            be: list[int] = []
            for i in range(news[-1] + 1):
                if cur[i] == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = _ACP_CODES[0xF0]
                    bw.write(code, ln)
                    run -= 16
                    for bit in be:
                        bw.write(bit, 1)
                    be = []
                if hist[i]:
                    be.append(abs(cur[i]) & 1)
                    continue
                code, ln = _ACP_CODES[(run << 4) | 1]
                bw.write(code, ln)
                bw.write(1 if cur[i] > 0 else 0, 1)
                for bit in be:
                    bw.write(bit, 1)
                be = []
                run = 0
            if news[-1] < len(cur) - 1:
                # zeros/corrections after the last new coefficient ride
                # the EOB this block opens
                eobrun = 1
                ebits.extend(
                    abs(cur[i]) & 1
                    for i in range(news[-1] + 1, len(cur)) if hist[i]
                )
    flush_eob()


def encode_progressive(
    arr: np.ndarray, subsample: bool = False, scans=None
) -> bytes:
    """Progressive (SOF2) JPEG encoder for fixtures.

    Same front end and quantization as :func:`encode_jpeg`, so a
    baseline and a progressive encoding of the same image carry the
    SAME quantized coefficients — the decoders must produce
    bit-identical pixels (the tests' round-trip gate). The default scan
    script exercises the whole annex-G algebra: interleaved DC first at
    Al=1, per-component AC first scans for bands 1-5 and 6-63 at Al=2,
    two AC refinement passes down to Al=0, and a DC refinement —
    spectral selection, successive approximation, EOBRUN batching and
    embedded correction bits all appear in real streams. ``scans``
    overrides the script with (comp_ids, Ss, Se, Ah, Al) tuples.
    """
    h, w, samp, planes, mcux, mcuy = _prep_planes(arr, subsample)
    ncomp = len(planes)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    qc = []
    dims = []
    for (ch, cv), plane in zip(samp, planes):
        bh, bw_ = plane.shape[0] // 8, plane.shape[1] // 8
        blocks = np.zeros((bh, bw_, 64), dtype=np.int64)
        for by in range(bh):
            for bx in range(bw_):
                blk = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                coefm = _M @ (blk - 128.0) @ _M.T
                q = np.round(coefm.reshape(-1) / QTABLE).astype(np.int64)
                blocks[by, bx] = q[ZIGZAG]
        qc.append(blocks)
        cw = -(-w * ch // hmax)
        chh = -(-h * cv // vmax)
        dims.append((-(-cw // 8), -(-chh // 8)))

    if scans is None:
        allc = tuple(range(ncomp))
        scans = [(allc, 0, 0, 0, 1)]
        for lo, hi in ((1, 5), (6, 63)):
            scans += [((c,), lo, hi, 0, 2) for c in range(ncomp)]
        for ah in (2, 1):
            for lo, hi in ((1, 5), (6, 63)):
                scans += [((c,), lo, hi, ah, ah - 1)
                          for c in range(ncomp)]
        scans.append((allc, 0, 0, 1, 0))

    out = bytearray(b"\xff\xd8")
    qt_zz = QTABLE[ZIGZAG]
    out += _seg(0xDB, bytes([0x00]) + bytes(int(v) for v in qt_zz))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        ch, cv = samp[cid - 1]
        sof += bytes([cid, (ch << 4) | cv, 0])
    out += _seg(0xC2, sof)
    out += _seg(0xC4, _dht_body(0, 0, _DC_BITS, _DC_VALS))
    out += _seg(0xC4, _dht_body(1, 0, _ACP_BITS, _ACP_VALS))
    for comp_ids, ss, se, ah, al in scans:
        sos = bytes([len(comp_ids)])
        for c in comp_ids:
            sos += bytes([c + 1, 0x00])                # DC 0 / AC 0
        sos += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xDA, sos)
        bw = _BitWriter()
        if ss == 0:
            _enc_dc_scan(bw, qc, comp_ids, samp, mcux, mcuy, dims, ah, al)
        else:
            c = comp_ids[0]
            cbw, cbh = dims[c]
            if ah == 0:
                _enc_ac_first(bw, qc[c], cbw, cbh, ss, se, al)
            else:
                _enc_ac_refine(bw, qc[c], cbw, cbh, ss, se, al)
        out += bw.flush()
    out += b"\xff\xd9"
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
    """Decode a baseline (SOF0) or progressive (SOF2) JPEG to
    (w, h, HxWx3 uint8).

    Supports: 8-bit frames, 1 or 3 components, any sampling factors
    1-2 (4:4:4 / 4:2:2 / 4:2:0 / 4:4:0), multiple DQT/DHT segments,
    16-bit quant tables, restart intervals, and for progressive frames
    the full annex-G scan algebra: DC first/refine scans (interleaved
    or single-component), per-component AC first/refine scans with
    spectral selection, successive approximation and cross-block
    EOBRUN runs. Coefficients accumulate across scans into one buffer
    per component; a single dequant + IDCT at the end makes the
    progressive decode of a coefficient set bit-identical to the
    baseline decode of the same set. Raises ValueError on extended
    (SOF1), lossless (SOF3), arithmetic (SOF9+) or truncated streams.
    """
    if b[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    progressive = False
    restart = 0
    coef = None
    grids = None
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
        elif marker in (0xC0, 0xC2):
            progressive = marker == 0xC2
            depth, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            if depth != 8:
                raise ValueError(f"unsupported JPEG bit depth {depth}")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (fw, fh, comps)
        elif marker in (0xC1, 0xC3) or 0xC5 <= marker <= 0xCF and marker not in (0xC8,):
            raise ValueError(
                f"unsupported JPEG coding (SOF{marker - 0xC0}: extended/"
                "lossless/arithmetic) — baseline or progressive only"
            )
        elif marker == 0xDD:
            restart = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            if coef is None:
                coef, grids = _alloc_coef(frame)
            pos = _scan(
                b, pos + 2 + size, frame, progressive, body,
                htables, restart, coef, grids,
            )
            continue
        pos += 2 + size
    if coef is None:
        raise ValueError("JPEG has no scan data")
    return _finish(frame, qtables, coef, grids)


def _alloc_coef(frame: tuple):
    """Per-component quantized-coefficient buffers on the MCU-padded
    block grid, plus the grid geometry: (mcux, mcuy, per-comp
    (non-interleaved block dims cbw, cbh))."""
    fw, fh, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax > 2 or vmax > 2:
        raise ValueError("JPEG sampling factors above 2 not supported")
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    coef, dims = [], []
    for cid, ch, cv, tq in comps:
        coef.append(
            np.zeros((mcuy * cv, mcux * ch, 64), dtype=np.int64)
        )
        # non-interleaved (single-component) scans cover exactly the
        # component's OWN block grid (T.81 A.2.2), not the MCU padding
        cw = -(-fw * ch // hmax)
        chh = -(-fh * cv // vmax)
        dims.append((-(-cw // 8), -(-chh // 8)))
    return coef, (mcux, mcuy, dims)


def _next_marker(b: bytes, pos: int) -> int:
    """First real marker at/after ``pos`` (skips entropy bytes, 0xFF00
    stuffing, fill bytes and RSTn)."""
    n = len(b)
    while pos + 1 < n:
        if b[pos] == 0xFF:
            nxt = b[pos + 1]
            if nxt == 0xFF:                            # fill byte
                pos += 1
                continue
            if nxt != 0x00 and not (0xD0 <= nxt <= 0xD7):
                return pos
            pos += 2
            continue
        pos += 1
    return n


def _scan(
    b: bytes,
    data_pos: int,
    frame: tuple,
    progressive: bool,
    sos_body: bytes,
    htables: dict,
    restart: int,
    coef: list,
    grids: tuple,
) -> int:
    """Decode ONE entropy-coded scan into the coefficient buffers;
    returns the stream position of the next marker segment."""
    fw, fh, comps = frame
    mcux, mcuy, dims = grids
    ns = sos_body[0]
    scan_comps = []                                    # (ci, td, ta)
    by_id = {c[0]: i for i, c in enumerate(comps)}
    for i in range(ns):
        cs, tdta = sos_body[1 + 2 * i : 3 + 2 * i]
        scan_comps.append((by_id[cs], tdta >> 4, tdta & 0xF))
    ss, se = sos_body[1 + 2 * ns], sos_body[2 + 2 * ns]
    ah_al = sos_body[3 + 2 * ns]
    ah, al = ah_al >> 4, ah_al & 0xF

    if not progressive:
        if ns != len(comps):
            raise ValueError("non-interleaved JPEG scans not supported")
        if (ss, se, ah, al) != (0, 63, 0, 0):
            raise ValueError("baseline JPEG scan must cover band 0..63")
        return _scan_baseline(
            b, data_pos, comps, scan_comps, htables, restart, coef,
            mcux, mcuy,
        )
    # -- progressive scan validation (T.81 G.1.1.1.1)
    if ss == 0:
        if se != 0:
            raise ValueError(
                "invalid progressive spectral selection: a DC scan "
                "must have Se=0"
            )
    else:
        if ns != 1:
            raise ValueError(
                "progressive AC scans must be single-component"
            )
        if se < ss or se > 63:
            raise ValueError("invalid progressive spectral band")
    if ah and ah != al + 1:
        raise ValueError("invalid successive-approximation step")
    if ss == 0:
        return _scan_dc(
            b, data_pos, comps, scan_comps, htables, restart, coef,
            mcux, mcuy, dims, ah, al,
        )
    return _scan_ac(
        b, data_pos, scan_comps[0], htables, restart, coef, dims,
        ss, se, ah, al,
    )


def _scan_baseline(
    b, data_pos, comps, scan_comps, htables, restart, coef, mcux, mcuy
) -> int:
    br = _BitReader(b, data_pos)
    preds = [0] * len(comps)
    nmcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and nmcu and nmcu % restart == 0:
                br.align_after_rst()
                preds = [0] * len(comps)
            for ci, td, ta in scan_comps:
                _cid, ch, cv, _tq = comps[ci]
                dc_lut = htables[(0, td)]
                ac_lut = htables[(1, ta)]
                for by in range(cv):
                    for bx in range(ch):
                        zz = coef[ci][my * cv + by, mx * ch + bx]
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
            nmcu += 1
    return _next_marker(b, br.pos)


def _scan_dc(
    b, data_pos, comps, scan_comps, htables, restart, coef,
    mcux, mcuy, dims, ah, al,
) -> int:
    """Progressive DC scan — first (Ah=0: Huffman diff coding of
    dc>>Al, arithmetic shift) or refinement (Ah>0: one raw bit per
    block ORed in at Al). Interleaved when the scan lists >1 component;
    a single-component DC scan walks that component's own block grid."""
    br = _BitReader(b, data_pos)
    preds = [0] * len(comps)

    def one(ci: int, td: int, byy: int, bxx: int) -> None:
        zz = coef[ci][byy, bxx]
        if ah == 0:
            s = _huff_decode(br, htables[(0, td)])
            diff = _extend(br.bits(s), s) if s else 0
            preds[ci] += diff
            zz[0] = preds[ci] << al
        else:
            if br.bits(1):
                zz[0] |= 1 << al

    if len(scan_comps) > 1:
        nmcu = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart and nmcu and nmcu % restart == 0:
                    br.align_after_rst()
                    for i in range(len(preds)):
                        preds[i] = 0
                for ci, td, _ta in scan_comps:
                    _cid, ch, cv, _tq = comps[ci]
                    for by in range(cv):
                        for bx in range(ch):
                            one(ci, td, my * cv + by, mx * ch + bx)
                nmcu += 1
    else:
        ci, td, _ta = scan_comps[0]
        cbw, cbh = dims[ci]
        nblk = 0
        for byy in range(cbh):
            for bxx in range(cbw):
                if restart and nblk and nblk % restart == 0:
                    br.align_after_rst()
                    preds[ci] = 0
                one(ci, td, byy, bxx)
                nblk += 1
    return _next_marker(b, br.pos)


def _scan_ac(
    b, data_pos, scan_comp, htables, restart, coef, dims, ss, se, ah, al,
) -> int:
    """Progressive AC scan over one component's block grid — first
    (Ah=0: values at precision Al with EOBRUN runs) or refinement
    (Ah>0: newly-nonzero ±1<<Al with embedded correction bits for
    history coefficients, T.81 G.1.2.3 / the IJG decode_mcu_AC
    algorithms)."""
    ci, _td, ta = scan_comp
    ac_lut = htables[(1, ta)]
    cbw, cbh = dims[ci]
    br = _BitReader(b, data_pos)
    eobrun = 0
    p1, m1 = 1 << al, -1 << al
    nblk = 0
    for byy in range(cbh):
        for bxx in range(cbw):
            if restart and nblk and nblk % restart == 0:
                br.align_after_rst()
                eobrun = 0
            zz = coef[ci][byy, bxx]
            if ah == 0:
                # ---- first scan for this band
                if eobrun:
                    eobrun -= 1
                else:
                    k = ss
                    while k <= se:
                        rs = _huff_decode(br, ac_lut)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += br.bits(r)
                            break
                        k += r
                        if k > se:
                            raise ValueError("JPEG AC index overflow")
                        zz[k] = _extend(br.bits(s), s) << al
                        k += 1
            else:
                # ---- refinement scan
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = _huff_decode(br, ac_lut)
                        r, s = rs >> 4, rs & 0xF
                        val = 0
                        if s == 0:
                            if r < 15:
                                # the CURRENT block consumes one unit
                                # of the run via the tail below (its
                                # remaining correction bits must still
                                # be read) — unlike the first-scan
                                # branch, no -1 here
                                eobrun = 1 << r
                                if r:
                                    eobrun += br.bits(r)
                                break
                            # r == 15: skip 16 zero-history positions
                        else:
                            if s != 1:
                                raise ValueError(
                                    "JPEG AC refinement size must be 1"
                                )
                            val = p1 if br.bits(1) else m1
                        while k <= se:
                            if zz[k]:
                                if br.bits(1) and not (zz[k] & p1):
                                    zz[k] += p1 if zz[k] >= 0 else m1
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if val and k <= se:
                            zz[k] = val
                        k += 1
                if eobrun:
                    while k <= se:
                        if zz[k]:
                            if br.bits(1) and not (zz[k] & p1):
                                zz[k] += p1 if zz[k] >= 0 else m1
                        k += 1
                    eobrun -= 1
            nblk += 1
    return _next_marker(b, br.pos)


def _finish(
    frame: tuple, qtables: dict, coef: list, grids: tuple
) -> tuple[int, int, np.ndarray]:
    """Dequantize + IDCT the accumulated coefficients, upsample, crop
    and color-convert — shared by baseline and progressive decodes."""
    fw, fh, comps = frame
    mcux, mcuy, _dims = grids
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    planes = []
    for (cid, ch, cv, tq), blocks in zip(comps, coef):
        qt = qtables[tq]
        bh, bw = blocks.shape[:2]
        plane = np.zeros((bh * 8, bw * 8), dtype=np.float64)
        for byy in range(bh):
            for bxx in range(bw):
                zz = blocks[byy, bxx]
                c = np.zeros(64, dtype=np.float64)
                c[ZIGZAG] = (zz * qt[ZIGZAG]).astype(np.float64)
                plane[byy * 8 : byy * 8 + 8, bxx * 8 : bxx * 8 + 8] = (
                    _M.T @ c.reshape(8, 8) @ _M + 128.0
                )
        planes.append(plane)

    full_h, full_w = mcuy * vmax * 8, mcux * hmax * 8
    up = []
    for (cid, ch, cv, tq), plane in zip(comps, planes):
        p = np.repeat(
            np.repeat(plane, vmax // cv, axis=0), hmax // ch, axis=1
        )
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

