"""Pure-numpy codecs for spec-simple media containers: 24-bit BMP and
16-bit PCM WAV.

The multimodal tier (operators/multimodal.py) keeps its decode kernel
stubbed for formats that need real codec libraries (JPEG/PNG/MP3/video
— PIL/libav are not in this container). BMP and WAV, however, are
fully public fixed-layout formats (Windows BITMAPINFOHEADER; RIFF/WAVE
PCM) that decode with nothing but struct/numpy — so for these two the
decode path is REAL: bytes in, true pixels/samples out, verified by
encode->decode round-trip tests.

Both encoders exist primarily so tests and fixtures can fabricate real
files deterministically; at scale the decoders run executor-side inside
mapInPandas batches (bounded memory, no Python-per-row).
"""

from __future__ import annotations

import struct

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
