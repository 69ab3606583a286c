"""Pure-numpy codecs for media containers that need no codec library:
24-bit BMP, 16-bit PCM WAV, and 8-bit PNG (stdlib zlib + the five
scanline filters).

The multimodal tier (operators/multimodal.py) keeps its decode kernel
stubbed only for formats that genuinely need external codecs (JPEG/
MP3/video — PIL/libav are not in this container). BMP, WAV, and PNG
are fully public formats (Windows BITMAPINFOHEADER; RIFF/WAVE PCM;
RFC 2083 / ISO 15948 with DEFLATE via stdlib zlib) that decode with
struct/zlib/numpy — for these the decode path is REAL: bytes in, true
pixels/samples out, verified by encode->decode round-trip tests and
ground-truth pixel fixtures.

The encoders exist primarily so tests and fixtures can fabricate real
files deterministically; at scale the decoders run executor-side inside
mapInPandas batches (bounded memory, no Python-per-row).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


# --------------------------------------------------------------------- BMP
def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as an uncompressed 24-bit BMP
    (BITMAPINFOHEADER, bottom-up rows, BGR, 4-byte row padding)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError(f"encode_bmp expects (H, W, 3) RGB, got {px.shape}")
    h, w = px.shape[:2]
    row_bytes = (w * 3 + 3) // 4 * 4
    img_size = row_bytes * h
    header = b"BM" + struct.pack("<IHHI", 54 + img_size, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = bytearray()
    bgr = px[:, :, ::-1]  # RGB -> BGR
    pad = b"\x00" * (row_bytes - w * 3)
    for y in range(h - 1, -1, -1):  # bottom-up
        rows += bgr[y].tobytes() + pad
    return header + dib + bytes(rows)


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit BMP to an (H, W, 3) uint8 RGB array."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP file (missing 'BM' signature)")
    (offset,) = struct.unpack_from("<I", data, 10)
    (dib_size, w, h) = struct.unpack_from("<Iii", data, 14)
    (planes, bpp, compression) = struct.unpack_from("<HHI", data, 26)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (got bpp={bpp}, "
            f"compression={compression})"
        )
    flip = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(data, dtype=np.uint8, count=row_bytes * h, offset=offset)
    img = rows.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    if flip:
        img = img[::-1]
    return img[:, :, ::-1].copy()  # BGR -> RGB


# --------------------------------------------------------------------- PNG
_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    raw = tag + body
    return struct.pack(">I", len(body)) + raw + struct.pack(">I", zlib.crc32(raw))


def encode_png(pixels: np.ndarray, filter_type: int = 0, level: int = 6) -> bytes:
    """Encode an 8-bit image as a non-interlaced PNG: (H, W) gray,
    (H, W, 2) gray+alpha, (H, W, 3) RGB, or (H, W, 4) RGBA.

    ``filter_type`` applies one scanline filter (0 None, 1 Sub, 2 Up,
    3 Average, 4 Paeth) to every row — all five produce byte-identical
    pixels after decode, which is exactly what the round-trip tests
    exercise."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    if px.ndim != 3 or px.shape[2] not in (1, 2, 3, 4):
        raise ValueError(f"encode_png expects (H, W[, 1|2|3|4]) uint8, got {px.shape}")
    if filter_type not in range(5):
        raise ValueError(f"invalid PNG filter type {filter_type}")
    h, w, ch = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raw = px.astype(np.int16)
    prior = np.zeros((w, ch), dtype=np.int16)
    lines = bytearray()
    for y in range(h):
        row = raw[y]
        left = np.vstack([np.zeros((1, ch), np.int16), row[:-1]])
        if filter_type == 0:
            filt = row
        elif filter_type == 1:
            filt = row - left
        elif filter_type == 2:
            filt = row - prior
        elif filter_type == 3:
            filt = row - (left + prior) // 2
        else:  # Paeth
            ul = np.vstack([np.zeros((1, ch), np.int16), prior[:-1]])
            filt = np.empty_like(row)
            for x in range(w):
                for k in range(ch):
                    filt[x, k] = row[x, k] - _paeth(
                        int(left[x, k]), int(prior[x, k]), int(ul[x, k])
                    )
        lines += bytes([filter_type]) + (filt % 256).astype(np.uint8).tobytes()
        prior = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(lines), level))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG to a uint8 array: (H, W) for
    grayscale, (H, W, C) otherwise; palette images expand to RGB.
    Implements all five scanline filters (None/Sub/Up/Average/Paeth)
    over stdlib-zlib DEFLATE; 16-bit, sub-byte depths, interlacing, and
    palette transparency raise ``NotImplementedError``."""
    if data[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG file (bad signature)")
    pos = len(_PNG_SIG)
    ihdr = None
    idat = bytearray()
    palette = None
    while pos + 8 <= len(data):
        (size,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + size]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + size)
        if zlib.crc32(tag + body) != crc:
            raise ValueError(f"PNG chunk {tag!r} fails CRC")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            palette = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            raise NotImplementedError("PNG palette transparency (tRNS) unsupported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + size
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, comp, filt_method, interlace = ihdr
    if depth != 8 or comp != 0 or filt_method != 0 or interlace != 0:
        raise NotImplementedError(
            f"only 8-bit non-interlaced PNG supported (depth={depth}, "
            f"interlace={interlace})"
        )
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"invalid PNG color type {color_type}")
    ch = _PNG_CHANNELS[color_type]
    stride = w * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        if ft == 0:
            rec = line
        elif ft == 1:  # Sub: per-channel-lane prefix sum is exact mod 256
            rec = np.cumsum(line.reshape(w, ch), axis=0).reshape(stride) % 256
        elif ft == 2:  # Up
            rec = (line + prior) % 256
        elif ft in (3, 4):  # Average / Paeth: sequential in x
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = rec[x - ch] if x >= ch else 0
                b = prior[x]
                if ft == 3:
                    rec[x] = (line[x] + (a + b) // 2) % 256
                else:
                    c = prior[x - ch] if x >= ch else 0
                    rec[x] = (line[x] + _paeth(int(a), int(b), int(c))) % 256
        else:
            raise ValueError(f"invalid PNG filter byte {ft}")
        out[y] = rec
        prior = rec.astype(np.int32)
    img = out.reshape(h, w, ch)
    if color_type == 3:
        if palette is None:
            raise ValueError("PNG palette image missing PLTE chunk")
        img = palette[img[:, :, 0]]
    return img[:, :, 0] if img.shape[2] == 1 else img


# --------------------------------------------------------------------- AVI
def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """Encode (N, H, W, 3) uint8 RGB frames as an uncompressed AVI
    (RIFF 'AVI ' container, DIB/BI_RGB video stream — the same public
    fixed layout family as BMP/WAV: avih + strh/strf headers, '00db'
    frame chunks, idx1 index). Exists so tests and fixtures can
    fabricate REAL video payloads; real-world compressed codecs
    (H.264 etc.) are out of scope for a no-dependency codec."""
    fr = np.asarray(frames, dtype=np.uint8)
    if fr.ndim != 4 or fr.shape[3] != 3:
        raise ValueError(f"encode_avi expects (N, H, W, 3) RGB, got {fr.shape}")
    n, h, w = fr.shape[:3]
    row_bytes = (w * 3 + 3) // 4 * 4
    frame_size = row_bytes * h

    def chunk(tag: bytes, body: bytes) -> bytes:
        return tag + struct.pack("<I", len(body)) + body + (b"\x00" * (len(body) & 1))

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // max(fps, 1),  # us per frame
        frame_size * fps,  # max bytes/sec
        0, 0x10,  # padding, flags (HASINDEX)
        n, 0, 1, frame_size,  # total frames, initial, streams, buf size
        w, h, 0, 0, 0, 0,
    )
    strh = b"vids" + b"DIB " + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, frame_size, 0xFFFFFFFF, 0, 0) + struct.pack("<HHHH", 0, 0, w, h)
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 2835, 2835, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_body = bytearray(b"movi")
    offsets = []
    pad = b"\x00" * (row_bytes - w * 3)
    for i in range(n):
        offsets.append(len(movi_body))
        bgr = fr[i, :, :, ::-1]
        rows = bytearray()
        for y in range(h - 1, -1, -1):  # bottom-up DIB
            rows += bgr[y].tobytes() + pad
        movi_body += chunk(b"00db", bytes(rows))
    movi = chunk(b"LIST", bytes(movi_body))

    idx = bytearray()
    for off in offsets:
        idx += b"00db" + struct.pack("<III", 0x10, off, frame_size)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def avi_meta(data: bytes) -> dict:
    """Container metadata without decoding frames: n_frames, fps,
    width, height, and the frame-chunk offsets (from the movi scan)."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    pos, end = 12, min(len(data), 8 + struct.unpack_from("<I", data, 4)[0])
    meta: dict = {"frames": []}

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            tag = data[pos : pos + 4]
            (size,) = struct.unpack_from("<I", data, pos + 4)
            body_at = pos + 8
            if tag == b"LIST":
                kind = data[body_at : body_at + 4]
                if kind in (b"hdrl", b"strl", b"movi"):
                    walk(body_at + 4, body_at + size)
            elif tag == b"avih":
                us_frame, _, _, _, n = struct.unpack_from("<IIIII", data, body_at)
                w, h = struct.unpack_from("<II", data, body_at + 32)
                meta.update(
                    n_frames=n,
                    fps=round(1_000_000 / us_frame) if us_frame else 0,
                    width=w,
                    height=h,
                )
            elif tag in (b"00db", b"00dc"):
                meta["frames"].append((body_at, size))
            pos = body_at + size + (size & 1)

    walk(pos, end)
    if "n_frames" not in meta:
        raise ValueError("AVI missing avih header")
    return meta


def decode_avi_frame(data: bytes, index: int) -> np.ndarray:
    """Decode ONE uncompressed DIB frame to (H, W, 3) RGB — random
    access via the movi offsets, so sampling frame k of a long clip
    never touches the other frames' bytes."""
    meta = avi_meta(data)
    frames = meta["frames"]
    if not 0 <= index < len(frames):
        raise IndexError(f"frame {index} out of range (clip has {len(frames)})")
    at, size = frames[index]
    w, h = meta["width"], meta["height"]
    row_bytes = (w * 3 + 3) // 4 * 4
    if size < row_bytes * h:
        raise ValueError("AVI frame chunk truncated")
    rows = np.frombuffer(data, np.uint8, row_bytes * h, at)
    img = rows.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)[::-1]
    return img[:, :, ::-1].copy()  # bottom-up BGR -> RGB


# --------------------------------------------------------------------- WAV
def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode float samples in [-1, 1] (1-D mono or (N, C)) as a 16-bit
    PCM RIFF/WAVE file."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    pcm = np.clip(np.round(s * 32767.0), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    block = ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, sample_rate * block, block, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a 16-bit PCM RIFF/WAVE file -> (float32 samples in [-1, 1]
    shaped (N,) mono or (N, C), sample_rate). Walks RIFF chunks, so
    extra chunks (LIST/fact) are tolerated."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, end = 12, min(len(data), 8 + struct.unpack_from("<I", data, 4)[0])
    ch = rate = bits = fmt_code = None
    pcm = None
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body_at = pos + 8
        if cid == b"fmt ":
            fmt_code, ch, rate = struct.unpack_from("<HHI", data, body_at)
            (bits,) = struct.unpack_from("<H", data, body_at + 14)
        elif cid == b"data":
            pcm = data[body_at : body_at + size]
        pos = body_at + size + (size & 1)  # chunks are word-aligned
    if fmt_code is None or pcm is None:
        raise ValueError("WAV missing fmt or data chunk")
    if fmt_code != 1 or bits != 16:
        raise NotImplementedError(
            f"only 16-bit PCM WAV supported (got format={fmt_code}, bits={bits})"
        )
    arr = np.frombuffer(pcm, dtype="<i2").astype(np.float32) / 32768.0
    if ch > 1:
        arr = arr.reshape(-1, ch)
    return arr, rate
