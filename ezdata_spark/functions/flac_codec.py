"""Pure-numpy/stdlib FLAC codec (lossless audio, the xiph.org public
format): encoder + decoder with no codec-library dependency, in the
same no-dependency discipline as media_codecs.py (BMP/PNG/GIF/WAV) and
jpeg_codec.py.

Decoder coverage: CONSTANT / VERBATIM / FIXED (orders 0-4) / LPC
subframes, Rice residual coding incl. partitions and the escape mode,
wasted bits, 8/12/16/20/24-bit sample sizes, independent + left/side +
right/side + mid/side stereo decorrelation, CRC-8 (frame header) and
CRC-16 (whole frame) verification, and the STREAMINFO sample-count /
MD5 check.

Encoder coverage (enough to fabricate REAL files that any FLAC decoder
reads): 16-bit mono/stereo, fixed 4096-sample blocks (short final
block), per-block best-of fixed predictors (orders 0-2) or a true LPC
filter (Levinson-Durbin coefficients quantized to 12 bits) when
``lpc_order`` is set, mid/side decorrelation for stereo, single-
partition Rice residuals with per-block parameter choice, correct
CRCs and STREAMINFO MD5.

Everything here is the published bitstream layout (RFC 9639 /
xiph.org/flac/format.html); compression is lossless, so round-trips
are exact regardless of predictor quality.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _make_crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = []
    for b in range(256):
        crc = b << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) & mask if crc & top else (crc << 1) & mask
        table.append(crc)
    return table


_CRC8_TABLE = _make_crc_table(0x07, 8)
_CRC16_TABLE = _make_crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    crc = 0
    table = _CRC8_TABLE
    for b in data:
        crc = table[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    table = _CRC16_TABLE
    for b in data:
        crc = ((crc << 8) & 0xFF00) ^ table[(crc >> 8) ^ b]
    return crc


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        if bits == 0:
            return
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, bits: int) -> None:
        self.write(value & ((1 << bits) - 1), bits)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, bits: int) -> int:
        v = 0
        while bits:
            if self.byte >= len(self.data):
                raise ValueError("FLAC bitstream truncated")
            avail = 8 - self.bit
            take = min(bits, avail)
            cur = self.data[self.byte]
            v = (v << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            bits -= take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def read_signed(self, bits: int) -> int:
        v = self.read(bits)
        return v - (1 << bits) if v & (1 << (bits - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


def _utf8_number(n: int) -> bytes:
    """FLAC's UTF-8-style frame-number coding (values, not codepoints)."""
    if n < 0x80:
        return bytes([n])
    out = []
    # an N-byte sequence holds (7 - N) leading-data bits + 6 per tail byte
    for nbytes in range(2, 8):
        if n < (1 << (6 * (nbytes - 1) + (7 - nbytes))):
            break
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _read_utf8_number(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("invalid FLAC UTF-8 frame number")
    v = b0 & (0xFF >> (nbytes + 1))
    for _ in range(nbytes - 1):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("invalid FLAC UTF-8 continuation")
        v = (v << 6) | (c & 0x3F)
    return v


# ------------------------------------------------------------- residuals
def _rice_cost(residual: np.ndarray, param: int) -> int:
    folded = (residual.astype(np.int64) << 1) ^ (residual.astype(np.int64) >> 63)
    return int(np.sum(folded >> param)) + len(residual) * (param + 1)


def _best_rice_param(residual: np.ndarray) -> int:
    if len(residual) == 0:
        return 0
    folded = (residual.astype(np.int64) << 1) ^ (residual.astype(np.int64) >> 63)
    mean = float(folded.mean())
    p = max(0, int(np.log2(mean + 1)) - 1) if mean > 0 else 0
    best, best_cost = 0, _rice_cost(residual, 0)
    for cand in range(max(0, p - 1), min(15, p + 3)):
        c = _rice_cost(residual, cand)
        if c < best_cost:
            best, best_cost = cand, c
    return best


def _write_residual(bw: _BitWriter, residual: np.ndarray) -> None:
    """Rice method 0, partition order 0 (one partition)."""
    param = min(_best_rice_param(residual), 14)
    bw.write(0, 2)  # method: 4-bit rice
    bw.write(0, 4)  # partition order 0
    bw.write(param, 4)
    for v in residual.astype(np.int64):
        folded = int((v << 1) ^ (v >> 63))
        bw.write_unary(folded >> param)
        bw.write(folded & ((1 << param) - 1), param)


def _rice_decode_block(br: _BitReader, count: int, param: int) -> np.ndarray:
    """Vectorized Rice decode of ``count`` samples at one parameter:
    the unary terminators are found by walking the stream's set-bit
    positions (a tight integer loop — ~3 ops/sample instead of the
    per-bit _BitReader path), then ALL low-bit fields are gathered in
    one numpy indexing pass. Exactness is pinned by the codec
    round-trip tests; ~10x the scalar reader on real subframes."""
    if count == 0:
        return np.empty(0, np.int64)
    data = br.data
    base_byte = br.byte
    bit0 = br.bit
    step = param + 1
    est = (count * (param + 3)) // 8 + 64
    end = min(len(data), base_byte + est)
    bits = np.unpackbits(np.frombuffer(data, np.uint8, end - base_byte, base_byte))
    set_pos = np.flatnonzero(bits).tolist()  # plain ints: fast walk below
    ts_list = []
    cur = bit0
    j = 0
    n_set = len(set_pos)
    for _ in range(count):
        while True:
            if j >= n_set:
                new_end = min(len(data), end + max(est, 4096))
                if new_end == end:
                    raise ValueError("FLAC bitstream truncated")
                bits = np.unpackbits(
                    np.frombuffer(data, np.uint8, new_end - base_byte, base_byte)
                )
                set_pos = np.flatnonzero(bits).tolist()
                n_set = len(set_pos)
                end = new_end
                continue
            t = set_pos[j]
            if t >= cur:
                break
            j += 1
        ts_list.append(t)
        cur = t + step
        j += 1
    ts = np.asarray(ts_list, dtype=np.int64)
    if param:
        need = int(ts[-1]) + step
        if need > len(bits):
            new_end = min(len(data), base_byte + need // 8 + 2)
            bits = np.unpackbits(
                np.frombuffer(data, np.uint8, new_end - base_byte, base_byte)
            )
        idx = ts[:, None] + 1 + np.arange(param, dtype=np.int64)[None, :]
        weights = 1 << np.arange(param - 1, -1, -1, dtype=np.int64)
        low = bits[idx].astype(np.int64) @ weights
    else:
        low = np.zeros(count, np.int64)
    starts = np.concatenate(([bit0], ts[:-1] + step))
    q = ts - starts
    folded = (q << param) | low
    total = base_byte * 8 + int(ts[-1]) + step
    br.byte, br.bit = divmod(total, 8)
    return (folded >> 1) ^ -(folded & 1)


def _read_residual(br: _BitReader, block_size: int, pred_order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"reserved FLAC residual method {method}")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if block_size % nparts or (block_size >> porder) <= pred_order:
        raise ValueError(f"invalid FLAC partition order {porder} for block {block_size}")
    out = np.empty(block_size - pred_order, dtype=np.int64)
    at = 0
    for part in range(nparts):
        count = (block_size >> porder) - (pred_order if part == 0 else 0)
        if count < 0:
            raise ValueError("invalid FLAC partition order")
        param = br.read(plen)
        if param == escape:
            raw_bits = br.read(5)
            for i in range(count):
                out[at + i] = br.read_signed(raw_bits) if raw_bits else 0
        else:
            out[at : at + count] = _rice_decode_block(br, count, param)
        at += count
    return out


# ------------------------------------------------------------- subframes
def _fixed_residual(sig: np.ndarray, order: int) -> np.ndarray:
    r = sig.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _levinson(sig: np.ndarray, order: int) -> list[float]:
    x = sig.astype(np.float64)
    n = len(x)
    if n <= order:
        return [0.0] * order
    ac = np.array([float(np.dot(x[: n - k], x[k:])) for k in range(order + 1)])
    if ac[0] == 0:
        return [0.0] * order
    err = ac[0]
    coefs = np.zeros(order)
    for i in range(order):
        acc = ac[i + 1] - np.dot(coefs[:i], ac[i:0:-1][:i])
        k = acc / err if err != 0 else 0.0
        coefs[i] = k
        coefs[:i] = coefs[:i] - k * coefs[:i][::-1]
        err *= 1 - k * k
        if err <= 0:
            break
    return list(coefs)


def _write_subframe(bw: _BitWriter, sig: np.ndarray, bps: int, lpc_order: int | None) -> None:
    n = len(sig)
    s64 = sig.astype(np.int64)
    if n and np.all(s64 == s64[0]):
        bw.write(0, 1)
        bw.write(0, 6)  # CONSTANT
        bw.write(0, 1)
        bw.write_signed(int(s64[0]), bps)
        return
    if lpc_order and n > lpc_order:
        order = lpc_order
        fcoefs = _levinson(s64, order)
        precision = 12
        cmax = max((abs(c) for c in fcoefs), default=0.0)
        shift = 10
        while cmax * (1 << shift) >= (1 << (precision - 1)) - 1 and shift > 0:
            shift -= 1
        q = [
            int(np.clip(round(c * (1 << shift)), -(1 << (precision - 1)), (1 << (precision - 1)) - 1))
            for c in fcoefs
        ]
        pred = np.zeros(n - order, dtype=np.int64)
        for j, cj in enumerate(q):
            pred += cj * s64[order - 1 - j : n - 1 - j]
        residual = s64[order:] - (pred >> shift)
        bw.write(0, 1)
        bw.write(0x20 | (order - 1), 6)  # LPC
        bw.write(0, 1)
        for w in s64[:order]:
            bw.write_signed(int(w), bps)
        bw.write(precision - 1, 4)
        bw.write_signed(shift, 5)
        for cj in q:
            bw.write_signed(cj, precision)
        _write_residual(bw, residual)
        return
    # best fixed order 0-2 by rice cost
    best_order, best_res, best_cost = 0, _fixed_residual(s64, 0), None
    for order in range(0, 3):
        if n <= order:
            break
        res = _fixed_residual(s64, order)
        cost = _rice_cost(res, _best_rice_param(res)) + order * bps
        if best_cost is None or cost < best_cost:
            best_order, best_res, best_cost = order, res, cost
    # verbatim fallback if rice blows up (wild residuals)
    if best_cost is not None and best_cost > n * bps:
        bw.write(0, 1)
        bw.write(1, 6)  # VERBATIM
        bw.write(0, 1)
        for v in s64:
            bw.write_signed(int(v), bps)
        return
    bw.write(0, 1)
    bw.write(0x08 | best_order, 6)  # FIXED
    bw.write(0, 1)
    for w in s64[:best_order]:
        bw.write_signed(int(w), bps)
    _write_residual(bw, best_res)


def _read_subframe(br: _BitReader, n: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("invalid FLAC subframe padding bit")
    ftype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
        bps -= wasted
    if ftype == 0:  # CONSTANT
        out = np.full(n, br.read_signed(bps), dtype=np.int64)
    elif ftype == 1:  # VERBATIM
        out = np.array([br.read_signed(bps) for _ in range(n)], dtype=np.int64)
    elif 0x08 <= ftype <= 0x0C:  # FIXED
        order = ftype & 0x07
        warm = [br.read_signed(bps) for _ in range(order)]
        residual = _read_residual(br, n, order)
        if order == 0:
            out = residual.copy()
        else:
            # invert order-fold differencing with iterated cumsum
            # (vectorized; exact int64 arithmetic): level_j[i] =
            # level_j[i-1] + level_{j+1}[i], seeded by the warmup's
            # successive differences at position order-1
            w = np.asarray(warm, np.int64)
            seeds = []
            dw = w.copy()
            for _ in range(order):
                seeds.append(int(dw[-1]))
                dw = np.diff(dw)
            cur = residual
            for j in range(order - 1, -1, -1):
                cur = seeds[j] + np.cumsum(cur)
            out = np.concatenate((w, cur))
    elif ftype >= 0x20:  # LPC
        order = (ftype & 0x1F) + 1
        warm = [br.read_signed(bps) for _ in range(order)]
        precision = br.read(4) + 1
        if precision == 16:
            raise ValueError("invalid FLAC LPC precision")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [br.read_signed(precision) for _ in range(order)]
        residual = _read_residual(br, n, order)
        out = np.empty(n, dtype=np.int64)
        out[:order] = warm
        for i in range(order, n):
            acc = 0
            for j, c in enumerate(coefs):
                acc += c * int(out[i - 1 - j])
            out[i] = residual[i - order] + (acc >> shift)
    else:
        raise ValueError(f"reserved FLAC subframe type {ftype}")
    return out << wasted if wasted else out


# ---------------------------------------------------------------- frames
_BLOCK_CODES = {192: 0b0001, 576: 0b0010, 1152: 0b0011, 2304: 0b0100,
                4608: 0b0101, 256: 0b1000, 512: 0b1001, 1024: 0b1010,
                2048: 0b1011, 4096: 0b1100, 8192: 0b1101, 16384: 0b1110,
                32768: 0b1111}
_BPS_CODES = {8: 0b001, 12: 0b010, 16: 0b100, 20: 0b101, 24: 0b110}
_BPS_DECODE = {v: k for k, v in _BPS_CODES.items()}


def _encode_frame(
    frame_idx: int, block: np.ndarray, bps: int, mid_side: bool, lpc_order: int | None
) -> bytes:
    n, ch = block.shape
    bw = _BitWriter()
    bw.write(0b11111111111110, 14)
    bw.write(0, 1)  # reserved
    bw.write(0, 1)  # fixed blocksize strategy
    bs_code = _BLOCK_CODES.get(n, 0b0111)  # else 16-bit follows
    bw.write(bs_code, 4)
    bw.write(0, 4)  # sample rate: from STREAMINFO
    use_ms = mid_side and ch == 2
    if use_ms:
        bw.write(0b1010, 4)  # mid/side
    else:
        bw.write(ch - 1, 4)
    bw.write(_BPS_CODES[bps], 3)
    bw.write(0, 1)  # reserved
    bw.align()
    header = bytearray(bw.bytes())
    header += _utf8_number(frame_idx)
    if bs_code == 0b0111:
        header += struct.pack(">H", n - 1)
    header.append(_crc8(bytes(header)))

    body = _BitWriter()
    if use_ms:
        left = block[:, 0].astype(np.int64)
        right = block[:, 1].astype(np.int64)
        mid = (left + right) >> 1
        side = left - right
        _write_subframe(body, mid, bps, lpc_order)
        _write_subframe(body, side, bps + 1, lpc_order)
    else:
        for c in range(ch):
            _write_subframe(body, block[:, c], bps, lpc_order)
    body.align()
    frame = bytes(header) + body.bytes()
    return frame + struct.pack(">H", _crc16(frame))


def encode_flac(
    samples: np.ndarray,
    sample_rate: int = 16000,
    block_size: int = 4096,
    mid_side: bool = True,
    lpc_order: int | None = None,
) -> bytes:
    """Encode float samples in [-1, 1] (1-D mono or (N, C<=2)) as a
    16-bit FLAC stream. ``lpc_order`` switches the per-block predictor
    from best-of-fixed (orders 0-2) to a true quantized LPC filter;
    either way the result is lossless."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    if n == 0:
        raise ValueError("cannot encode empty audio")
    if ch > 2:
        raise ValueError("encode_flac supports mono/stereo")
    bps = 16
    pcm = np.clip(np.round(s * 32767.0), -32768, 32767).astype(np.int32)
    md5 = hashlib.md5()
    md5.update(pcm.astype("<i2").tobytes())  # interleaved LE, 2 bytes/sample

    frames = bytearray()
    sizes = []
    idx = 0
    for b0 in range(0, n, block_size):
        fr = _encode_frame(idx, pcm[b0 : b0 + block_size], bps, mid_side, lpc_order)
        sizes.append(len(fr))
        frames += fr
        idx += 1

    info = _BitWriter()
    info.write(min(block_size, n), 16)
    info.write(block_size if n > block_size else min(block_size, n), 16)
    info.write(min(sizes), 24)
    info.write(max(sizes), 24)
    info.write(sample_rate, 20)
    info.write(ch - 1, 3)
    info.write(bps - 1, 5)
    info.write(n, 36)
    info.align()
    streaminfo = info.bytes() + md5.digest()
    head = b"fLaC" + bytes([0x80]) + struct.pack(">I", len(streaminfo))[1:] + streaminfo
    return head + bytes(frames)


def decode_flac(data: bytes, verify: bool = True) -> tuple[np.ndarray, int]:
    """Decode a FLAC stream -> (float32 samples in [-1, 1] shaped (N,)
    mono or (N, C), sample_rate). CRC-8/CRC-16 and the STREAMINFO
    MD5 / sample count are verified when ``verify`` (MD5 only when the
    encoder recorded one)."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (missing fLaC magic)")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("FLAC metadata truncated")
        hdr = data[pos]
        size = int.from_bytes(data[pos + 1 : pos + 4], "big")
        if hdr & 0x7F == 0:
            streaminfo = data[pos + 4 : pos + 4 + size]
        pos += 4 + size
        if hdr & 0x80:
            break
    if streaminfo is None or len(streaminfo) < 34:
        raise ValueError("FLAC missing STREAMINFO")
    si = _BitReader(streaminfo)
    si.read(16)
    si.read(16)
    si.read(24)
    si.read(24)
    rate = si.read(20)
    ch = si.read(3) + 1
    bps = si.read(5) + 1
    total = si.read(36)
    md5_expect = streaminfo[18:34]

    chans: list[list[np.ndarray]] = [[] for _ in range(ch)]
    got = 0
    while pos < len(data) and (total == 0 or got < total):
        frame_start = pos
        br = _BitReader(data, pos)
        sync = br.read(14)
        if sync != 0b11111111111110:
            raise ValueError("lost FLAC frame sync")
        br.read(1)
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        bps_code = br.read(3)
        br.read(1)
        _read_utf8_number(br)
        if bs_code == 0b0110:
            bsize = br.read(8) + 1
        elif bs_code == 0b0111:
            bsize = br.read(16) + 1
        elif bs_code == 0b0001:
            bsize = 192
        elif 0b0010 <= bs_code <= 0b0101:
            bsize = 576 << (bs_code - 2)
        elif bs_code >= 0b1000:
            bsize = 256 << (bs_code - 8)
        else:
            raise ValueError(f"reserved FLAC block size code {bs_code}")
        if sr_code == 0b1100:
            br.read(8)
        elif sr_code in (0b1101, 0b1110):
            br.read(16)
        fbps = bps if bps_code == 0 else _BPS_DECODE[bps_code]
        br.align()
        if verify:
            hdr_bytes = data[frame_start : br.byte + 1]
            if _crc8(hdr_bytes[:-1]) != hdr_bytes[-1]:
                raise ValueError("FLAC frame header CRC-8 mismatch")
        else:
            br.byte += 0
        # skip crc8 byte
        br = _BitReader(data, br.byte + 1)

        if ch_code < 8:
            subs = [_read_subframe(br, bsize, fbps) for _ in range(ch_code + 1)]
            chans_out = subs
        elif ch_code == 8:  # left/side
            left = _read_subframe(br, bsize, fbps)
            side = _read_subframe(br, bsize, fbps + 1)
            chans_out = [left, left - side]
        elif ch_code == 9:  # right/side
            side = _read_subframe(br, bsize, fbps + 1)
            right = _read_subframe(br, bsize, fbps)
            chans_out = [right + side, right]
        elif ch_code == 10:  # mid/side
            mid = _read_subframe(br, bsize, fbps)
            side = _read_subframe(br, bsize, fbps + 1)
            mid2 = (mid << 1) | (side & 1)
            chans_out = [(mid2 + side) >> 1, (mid2 - side) >> 1]
        else:
            raise ValueError(f"reserved FLAC channel assignment {ch_code}")
        br.align()
        frame_end = br.byte + 2
        if verify:
            body = data[frame_start : br.byte]
            if _crc16(body) != struct.unpack_from(">H", data, br.byte)[0]:
                raise ValueError("FLAC frame CRC-16 mismatch")
        for c, arr in enumerate(chans_out):
            chans[c].append(arr)
        got += bsize
        pos = frame_end

    full = [np.concatenate(c) if c else np.empty(0, np.int64) for c in chans]
    if total:
        full = [c[:total] for c in full]
        if verify and len(full[0]) != total:
            raise ValueError("FLAC sample count mismatch vs STREAMINFO")
    arr = np.stack(full, axis=1)
    if verify and md5_expect != b"\x00" * 16 and bps == 16:
        if hashlib.md5(arr.astype("<i2").tobytes()).digest() != md5_expect:
            raise ValueError("FLAC MD5 mismatch (decoded audio corrupt)")
    out = arr.astype(np.float32) / float(1 << (bps - 1))
    if ch == 1:
        out = out[:, 0]
    return out, rate
