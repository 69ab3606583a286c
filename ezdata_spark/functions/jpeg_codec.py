"""Pure-numpy baseline JPEG codec (ITU-T T.81 / ISO 10918-1): DCT,
Annex-K quantization + Huffman tables, byte stuffing, restart markers.

Completes the no-dependency media tier (media_codecs.py BMP/PNG/WAV):
JPEG is the dominant training-image container, and baseline sequential
JPEG needs nothing beyond struct/numpy — the entropy coder is a bit
loop (fine for the executor-side mapInPandas batches this feeds;
decode runs where the data is, never on the driver).

Encoder: baseline sequential, 8-bit, grayscale or 4:4:4 YCbCr, IJG
quality scaling — exists so tests and fixtures can fabricate REAL
JPEG bytes deterministically. Decoder: baseline sequential with
arbitrary sampling factors (4:4:4, 4:2:0, 4:2:2), DRI/RSTn, DNL
rejected clearly; progressive (SOF2) and arithmetic coding raise
``NotImplementedError``.

All constant tables below are from the public standard's Annex K.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag index of each of the 64 coefficients (T.81 Figure 5)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1/K.2 reference quantization tables
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64).reshape(8, 8)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64).reshape(8, 8)

# Annex K.3 standard Huffman specs: (bits[1..16] counts, symbol list)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# orthonormal 8-point DCT-II basis: dct = A @ block @ A.T
_A = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(1.0 / 8) if _u == 0 else np.sqrt(2.0 / 8)
    for _x in range(8):
        _A[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex-K tables."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 / q if q < 50 else 200 - 2 * q
    out = []
    for base in (QT_LUMA, QT_CHROMA):
        t = np.floor((base * scale + 50) / 100)
        out.append(np.clip(t, 1, 255))
    return out[0], out[1]


def _huff_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical codes: symbol -> (code, length)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    return {(ln, code): sym for sym, (code, ln) in _huff_encode_table(bits, vals).items()}


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_block(bw, block_q, pred, dc_tbl, ac_tbl) -> int:
    zz = block_q.reshape(64)[ZIGZAG]
    dc = int(zz[0])
    diff = dc - pred
    s = _category(diff)
    code, ln = dc_tbl[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = np.nonzero(zz[1:])[0]
    last = last_nz[-1] + 1 if last_nz.size else 0
    for i in range(1, last + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tbl[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_tbl[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, ln = ac_tbl[0x00]  # EOB
        bw.write(code, ln)
    return dc


def _marker(tag: int, body: bytes) -> bytes:
    return struct.pack(">HH", tag, len(body) + 2) + body


def _pad_to(p: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """Edge-replicate a plane to (ph, pw)."""
    h, w = p.shape
    pp = np.empty((ph, pw))
    pp[:h, :w] = p
    if ph > h:
        pp[h:, :w] = p[-1:, :]
    if pw > w:
        pp[:, w:] = pp[:, w - 1 : w]
    return pp


def encode_jpeg(pixels: np.ndarray, quality: int = 85, subsampling: str = "444") -> bytes:
    """Encode (H, W) grayscale or (H, W, 3) RGB uint8 as a baseline
    sequential JPEG. ``subsampling``: '444' (none) or '420' (chroma
    mean-pooled 2x2 — the common camera/web layout, and the decoder's
    generic-MCU test vector)."""
    px = np.asarray(pixels, dtype=np.uint8)
    gray = px.ndim == 2
    if not gray and (px.ndim != 3 or px.shape[2] != 3):
        raise ValueError(f"encode_jpeg expects (H, W) or (H, W, 3) uint8, got {px.shape}")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w = px.shape[:2]
    qt_l, qt_c = _quality_tables(quality)
    sub = subsampling == "420" and not gray
    if gray:
        planes = [px.astype(np.float64)]
        qts = [qt_l]
        samps = [(1, 1)]
    else:
        r, g, b = (px[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if sub:
            he, we = h + (h & 1), w + (w & 1)
            cb = _pad_to(cb, he, we).reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            cr = _pad_to(cr, he, we).reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            samps = [(2, 2), (1, 1), (1, 1)]
        else:
            samps = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qts = [qt_l, qt_c, qt_c]

    dc_l = _huff_encode_table(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _huff_encode_table(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _huff_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _huff_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS)
    htabs = [(dc_l, ac_l)] + [(dc_c, ac_c)] * 2

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = [
        _pad_to(p, mcuy * sv * 8, mcux * sh * 8) - 128.0
        for p, (sh, sv) in zip(planes, samps)
    ]

    bw = _BitWriter()
    preds = [0] * len(planes)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, p in enumerate(padded):
                sh, sv = samps[ci]
                for v in range(sv):
                    for hh in range(sh):
                        y0 = (my * sv + v) * 8
                        x0 = (mx * sh + hh) * 8
                        blk = p[y0 : y0 + 8, x0 : x0 + 8]
                        coef = _A @ blk @ _A.T
                        q = np.round(coef / qts[ci]).astype(np.int64)
                        preds[ci] = _encode_block(bw, q, preds[ci], *htabs[ci])
    bw.flush()

    ncomp = 1 if gray else 3
    out = bytearray(b"\xff\xd8")  # SOI
    out += _marker(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _marker(0xFFDB, bytes([0]) + bytes(qt_l.reshape(64)[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += _marker(0xFFDB, bytes([1]) + bytes(qt_c.reshape(64)[ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sh, sv = samps[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += _marker(0xFFC0, sof)
    for tc, th, bits, vals in (
        (0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
        (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
    ) + (() if gray else (
        (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
        (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS),
    )):
        out += _marker(0xFFC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += _marker(0xFFDA, sos)
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """Entropy-segment reader: unstuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            raise ValueError("JPEG entropy data truncated (hit marker)")
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy data truncated (EOF)")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
            if nxt == 0x00:
                self.pos += 1
            else:
                self.marker = nxt
                self.pos += 1
                b = 0  # pad region past a marker reads as 0s per spec
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_restart(self, expected: int) -> None:
        """Consume an RSTn marker boundary."""
        self.nbits = 0
        self.acc = 0
        if self.marker is None:
            # marker not yet hit: scan forward for it
            while self.pos + 1 < len(self.data):
                if self.data[self.pos] == 0xFF and self.data[self.pos + 1] != 0x00:
                    self.marker = self.data[self.pos + 1]
                    self.pos += 2
                    break
                self.pos += 1
        if self.marker is None or not (0xD0 <= self.marker <= 0xD7):
            raise ValueError(f"expected RST marker, got {self.marker!r}")
        if self.marker != 0xD0 + (expected & 7):
            raise ValueError("JPEG restart marker out of sequence")
        self.marker = None


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _decode_block(br, dc_tbl, ac_tbl, pred: int) -> tuple[np.ndarray, int]:
    zz = np.zeros(64, dtype=np.int64)

    def read_sym(tbl):
        code, ln = 0, 0
        while ln < 16:
            code = (code << 1) | br.bit()
            ln += 1
            sym = tbl.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    s = read_sym(dc_tbl)
    diff = _extend(br.receive(s), s) if s else 0
    dc = pred + diff
    zz[0] = dc
    i = 1
    while i < 64:
        rs = read_sym(ac_tbl)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                i += 16  # ZRL
                continue
            break  # EOB
        i += r
        if i > 63:
            raise ValueError("JPEG AC run past end of block")
        zz[i] = _extend(br.receive(s), s)
        i += 1
    blk = np.zeros(64, dtype=np.float64)
    blk[ZIGZAG] = zz
    return blk.reshape(8, 8), dc


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline sequential JPEG to uint8: (H, W) for
    grayscale, (H, W, 3) RGB otherwise. Supports arbitrary sampling
    factors (4:4:4 / 4:2:0 / 4:2:2) and restart intervals; progressive
    (SOF2) and arithmetic-coded streams raise ``NotImplementedError``."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG file (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huffs: dict[tuple[int, int], dict] = {}
    frame = None
    restart = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        tag = data[pos + 1]
        if tag in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline sequential JPEG supported (SOF marker 0x{tag:02X})"
            )
        (size,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + size]
        if tag == 0xDB:  # DQT (possibly several tables per marker)
            at = 0
            while at < len(body):
                pq, tq = body[at] >> 4, body[at] & 0x0F
                if pq:
                    raise NotImplementedError("16-bit quantization tables unsupported")
                if at + 65 > len(body):
                    raise ValueError("truncated JPEG DQT segment")
                tbl = np.zeros(64)
                tbl[ZIGZAG] = np.frombuffer(body, np.uint8, 64, at + 1)
                qts[tq] = tbl.reshape(8, 8)
                at += 65
        elif tag == 0xC4:  # DHT
            at = 0
            while at < len(body):
                tc, th = body[at] >> 4, body[at] & 0x0F
                bits = list(body[at + 1 : at + 17])
                nv = sum(bits)
                vals = list(body[at + 17 : at + 17 + nv])
                if len(bits) != 16 or len(vals) != nv:
                    raise ValueError("truncated JPEG DHT segment")
                huffs[(tc, th)] = _huff_decode_table(bits, vals)
                at += 17 + nv
        elif tag == 0xC0 or tag == 0xC1:  # SOF0/1 (extended seq uses same layout)
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            comps = []
            for ci in range(nc):
                cid, samp, tq = body[6 + ci * 3 : 9 + ci * 3]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0x0F, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif tag == 0xDD:  # DRI
            (restart,) = struct.unpack_from(">H", body, 0)
        elif tag == 0xDA:  # SOS -> entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            sel = {}
            for si in range(ns):
                cid, tt = body[1 + si * 2 : 3 + si * 2]
                sel[cid] = (tt >> 4, tt & 0x0F)
            return _decode_scan(data, pos + 2 + size, frame, qts, huffs, sel, restart)
        elif tag == 0xD9:
            break
        pos += 2 + size
    raise ValueError("JPEG has no scan data")


def _decode_scan(data, pos, frame, qts, huffs, sel, restart) -> np.ndarray:
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = [
        np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8)) for c in comps
    ]
    br = _BitReader(data, pos)
    preds = [0] * len(comps)
    rst = 0
    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_i and mcu_i % restart == 0:
                br.align_restart(rst)
                rst = (rst + 1) & 7
                preds = [0] * len(comps)
            for ci, c in enumerate(comps):
                td, ta = sel[c["id"]]
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        blk, preds[ci] = _decode_block(
                            br, huffs[(0, td)], huffs[(1, ta)], preds[ci]
                        )
                        pix = _A.T @ (blk * qts[c["tq"]]) @ _A
                        y0 = (my * c["v"] + v) * 8
                        x0 = (mx * c["h"] + hh) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu_i += 1
    out_planes = []
    for ci, c in enumerate(comps):
        p = planes[ci] + 128.0
        # upsample to full MCU-grid resolution, then crop
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)
