"""Pure-numpy codecs for media containers that need no codec library:
24-bit BMP, 16-bit PCM + IMA-ADPCM + G.711 u/A-law WAV, 8-bit PNG
(stdlib zlib + the five scanline filters), GIF (LZW, interlace,
animation composition), and AVI (uncompressed DIB, intra-only
Motion-JPEG via functions/jpeg_codec.py, and inter-frame MS Video 1
'CRAM' with skip-block temporal compression).

The multimodal tier (operators/multimodal.py) keeps its decode kernel
stubbed only for formats that genuinely need external codecs (lossy
perceptual audio like MP3, modern DSP video like H.264 — libav is not
in this container). BMP, WAV, PNG, and
GIF are fully public formats (Windows BITMAPINFOHEADER; RIFF/WAVE PCM
and IMA/DVI ADPCM; RFC 2083 / ISO 15948 with DEFLATE via stdlib zlib;
GIF87a/89a with LZW) that decode with struct/zlib/numpy — for these
the decode path is REAL: bytes in, true pixels/samples out, verified
by encode->decode round-trip tests and ground-truth pixel fixtures.

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


# ------------------------------------------------------------ MS Video 1
# Microsoft Video 1 ('CRAM' / 'MSVC'), 16-bit RGB555 variant — a REAL,
# public INTER-FRAME video codec (multimedia.cx / MSDN documented): the
# frame is 4x4 blocks traversed bottom-up/left-to-right; a block is
# either SKIPPED (copied from the previous frame — the temporal path),
# painted with 1 color, 2 colors selected per pixel by a 16-bit mask,
# or 8 colors (2 per 2x2 quadrant). The encoder is closed-loop (skip
# decisions compare against its own reconstruction, so lossy blocks
# never drift) and emits frame 0 as a keyframe (no skips).
#
# Code words (little-endian u16):
#   0x0000-0x7FFF  pixel mask -> 2-color block (color_a bit15 clear)
#                  or 8-color block (color_a bit15 set)
#   0x8400-0x87FF  skip (word - 0x8400) blocks
#   0x8800-0xFFFF  1-color block, color = word & 0x7FFF
# Quadrant order and mask bit order follow the bottom-up traversal;
# layout implemented from the public description and locked by the
# codec's own round-trip tests (no reference decoder in-container).


def _rgb555(frame: np.ndarray) -> np.ndarray:
    f = frame.astype(np.uint16)
    return ((f[:, :, 0] >> 3) << 10) | ((f[:, :, 1] >> 3) << 5) | (f[:, :, 2] >> 3)


def _rgb888(q: np.ndarray) -> np.ndarray:
    out = np.empty(q.shape + (3,), np.uint8)
    out[:, :, 0] = ((q >> 10) & 0x1F) << 3
    out[:, :, 1] = ((q >> 5) & 0x1F) << 3
    out[:, :, 2] = (q & 0x1F) << 3
    return out


def _block_iter(h: int, w: int):
    for by in range(h - 4, -4, -4):  # bottom-up
        for bx in range(0, w, 4):
            yield by, bx


def _two_color_split(blk: np.ndarray) -> tuple[int, int, np.ndarray]:
    """Split a (k,) RGB555 sample set into 2 representative colors by
    luma threshold -> (color1, color0, bit_per_pixel[bit=1 -> color1])."""
    r, g, b = (blk >> 10) & 0x1F, (blk >> 5) & 0x1F, blk & 0x1F
    luma = 2 * r.astype(np.int32) + 5 * g + b
    thr = luma.mean()
    hi = luma >= thr
    if hi.all() or (~hi).all():
        c = int(np.bincount(blk).argmax())
        return c, c, hi
    mode = lambda v: int(np.bincount(v).argmax())  # noqa: E731
    return mode(blk[hi]), mode(blk[~hi]), hi


def _msvc_encode_frame(q: np.ndarray, prev: np.ndarray | None) -> tuple[bytes, np.ndarray]:
    """Encode one RGB555 frame -> (chunk bytes, reconstruction)."""
    h, w = q.shape
    recon = np.empty_like(q)
    out = bytearray()
    skip_run = 0

    def flush_skips():
        nonlocal skip_run
        while skip_run:
            take = min(skip_run, 0x3FF)
            out.extend(struct.pack("<H", 0x8400 + take))
            skip_run -= take

    for by, bx in _block_iter(h, w):
        blk = q[by : by + 4, bx : bx + 4]
        if prev is not None and np.array_equal(blk, prev[by : by + 4, bx : bx + 4]):
            recon[by : by + 4, bx : bx + 4] = blk
            skip_run += 1
            continue
        flush_skips()
        uniq = np.unique(blk)
        # 1-color code = 0x8000 | color, EXCEPT colors whose high byte
        # lands in the skip-code range (0x8400-0x87FF) — those fall back
        # to a 2-color block with both colors equal
        if len(uniq) == 1 and not 0x0400 <= int(uniq[0]) <= 0x07FF:
            out.extend(struct.pack("<H", 0x8000 | int(uniq[0])))
            recon[by : by + 4, bx : bx + 4] = uniq[0]
            continue
        if len(uniq) <= 2:
            c1, c0 = (int(uniq[0]), int(uniq[-1]))
            mask = 0
            bit = 0
            rblk = np.empty((4, 4), np.uint16)
            for yy in range(3, -1, -1):  # bottom row first
                for xx in range(4):
                    sel = int(blk[yy, xx]) == c1
                    mask |= int(sel) << bit
                    rblk[yy, xx] = c1 if sel else c0
                    bit += 1
            if mask & 0x8000:  # bit 15 belongs to the 1-color/skip space
                mask ^= 0xFFFF
                c1, c0 = c0, c1
            out.extend(struct.pack("<HHH", mask, c1, c0))
            recon[by : by + 4, bx : bx + 4] = rblk
            continue
        # 8-color: 2 colors per 2x2 quadrant, quadrants in bottom-up order
        mask = 0
        colors: list[int] = []
        rblk = np.empty((4, 4), np.uint16)
        quads = [(2, 0), (2, 2), (0, 0), (0, 2)]  # (row, col) of quadrant origin
        for qi, (qy, qx) in enumerate(quads):
            sub = blk[qy : qy + 2, qx : qx + 2]
            c1, c0, _ = _two_color_split(sub.reshape(-1))
            colors += [c1, c0]
            for yy in range(1, -1, -1):  # bottom row of quadrant first
                for xx in range(2):
                    v = int(sub[yy, xx])
                    sel = abs(v - c1) <= abs(v - c0)
                    # bit index: quadrant base + position within quadrant
                    bit = qi * 4 + (1 - yy) * 2 + xx
                    mask |= int(sel) << bit
                    rblk[qy + yy, qx + xx] = c1 if sel else c0
        if mask & 0x8000:  # keep bit 15 clear: flip quadrant 3's bits+colors
            mask ^= 0xF000
            colors[6], colors[7] = colors[7], colors[6]
        colors[0] |= 0x8000  # signals 8-color mode
        out.extend(struct.pack("<H", mask))
        for c in colors:
            out.extend(struct.pack("<H", c))
        recon[by : by + 4, bx : bx + 4] = rblk
    flush_skips()
    return bytes(out), recon


def _msvc_decode_frame(data: bytes, h: int, w: int, prev: np.ndarray | None) -> np.ndarray:
    q = np.zeros((h, w), np.uint16) if prev is None else prev.copy()
    pos = 0
    skip = 0
    for by, bx in _block_iter(h, w):
        if skip:
            skip -= 1
            continue
        if pos + 2 > len(data):
            continue  # early end: remaining blocks keep previous content
        (word,) = struct.unpack_from("<H", data, pos)
        pos += 2
        if 0x8400 <= word < 0x8800:
            skip = word - 0x8400
            if skip == 0:
                raise ValueError("MSVC zero-length skip code")
            skip -= 1  # this block is the first skipped one
            continue
        if word & 0x8000:  # 1-color (anything in the top half except skip)
            q[by : by + 4, bx : bx + 4] = word & 0x7FFF
            continue
        mask = word
        (ca,) = struct.unpack_from("<H", data, pos)
        if ca & 0x8000:  # 8-color
            colors = struct.unpack_from("<8H", data, pos)
            pos += 16
            colors = [colors[0] & 0x7FFF] + list(colors[1:])
            quads = [(2, 0), (2, 2), (0, 0), (0, 2)]
            for qi, (qy, qx) in enumerate(quads):
                c1, c0 = colors[2 * qi], colors[2 * qi + 1]
                for yy in range(1, -1, -1):
                    for xx in range(2):
                        bit = qi * 4 + (1 - yy) * 2 + xx
                        q[by + qy + yy, bx + qx + xx] = c1 if (mask >> bit) & 1 else c0
        else:  # 2-color
            c1, c0 = struct.unpack_from("<HH", data, pos)
            pos += 4
            bit = 0
            for yy in range(3, -1, -1):
                for xx in range(4):
                    q[by + yy, bx + xx] = c1 if (mask >> bit) & 1 else c0
                    bit += 1
    return q


# --------------------------------------------------------------------- AVI
def encode_avi(
    frames: np.ndarray, fps: int = 10, codec: str = "DIB ", quality: int = 85
) -> bytes:
    """Encode (N, H, W, 3) uint8 RGB frames as an AVI (RIFF 'AVI '
    container: avih + strh/strf headers, per-frame movi chunks, idx1
    index). ``codec='DIB '`` writes uncompressed bottom-up BGR '00db'
    chunks; ``codec='MJPG'`` writes Motion-JPEG — each frame a
    standalone baseline JPEG (functions/jpeg_codec.py) in a '00dc'
    chunk, the standard intra-only compressed-video layout; and
    ``codec='CRAM'`` writes Microsoft Video 1 — a real INTER-FRAME
    codec whose skip blocks copy from the previous frame (16-bit
    RGB555, lossy quantization, width/height multiples of 4). Exists
    so tests and fixtures can fabricate REAL video payloads; modern
    DSP-heavy codecs (H.264 etc.) stay out of scope."""
    fr = np.asarray(frames, dtype=np.uint8)
    if fr.ndim != 4 or fr.shape[3] != 3:
        raise ValueError(f"encode_avi expects (N, H, W, 3) RGB, got {fr.shape}")
    if codec not in ("DIB ", "MJPG", "CRAM"):
        raise ValueError(f"unsupported AVI codec {codec!r} (DIB /MJPG/CRAM)")
    n, h, w = fr.shape[:3]
    if codec == "CRAM" and (h % 4 or w % 4):
        raise ValueError(f"CRAM needs width/height multiples of 4, got {w}x{h}")
    row_bytes = (w * 3 + 3) // 4 * 4

    def chunk(tag: bytes, body: bytes) -> bytes:
        return tag + struct.pack("<I", len(body)) + body + (b"\x00" * (len(body) & 1))

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    if codec == "MJPG":
        from .jpeg_codec import encode_jpeg

        tag = b"00dc"
        payloads = [encode_jpeg(fr[i], quality=quality) for i in range(n)]
    elif codec == "CRAM":
        tag = b"00dc"
        payloads = []
        prev = None
        for i in range(n):
            body, prev = _msvc_encode_frame(_rgb555(fr[i]), prev)
            payloads.append(body)
    else:
        tag = b"00db"
        pad = b"\x00" * (row_bytes - w * 3)
        payloads = []
        for i in range(n):
            bgr = fr[i, :, :, ::-1]
            rows = bytearray()
            for y in range(h - 1, -1, -1):  # bottom-up DIB
                rows += bgr[y].tobytes() + pad
            payloads.append(bytes(rows))
    frame_size = max(len(p) for p in payloads) if payloads else 0

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // max(fps, 1),  # us per frame
        frame_size * fps,  # max bytes/sec
        0, 0x10,  # padding, flags (HASINDEX)
        n, 0, 1, frame_size,  # total frames, initial, streams, buf size
        w, h, 0, 0, 0, 0,
    )
    fourcc = codec.encode("ascii")
    compression = 0 if codec == "DIB " else struct.unpack("<I", fourcc)[0]
    bitcount = 16 if codec == "CRAM" else 24
    strh = b"vids" + fourcc + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, frame_size, 0xFFFFFFFF, 0, 0) + struct.pack("<HHHH", 0, 0, w, h)
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bitcount, compression, frame_size, 2835, 2835, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_body = bytearray(b"movi")
    sizes = []
    for p in payloads:
        sizes.append((len(movi_body), len(p)))
        movi_body += chunk(tag, p)
    movi = chunk(b"LIST", bytes(movi_body))

    idx = bytearray()
    for off, size in sizes:
        idx += tag + struct.pack("<III", 0x10, off, size)
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
            elif tag == b"strh" and data[body_at : body_at + 4] == b"vids":
                meta["codec"] = data[body_at + 4 : body_at + 8].decode("ascii", "replace")
            elif tag in (b"00db", b"00dc"):
                meta["frames"].append((body_at, size))
            pos = body_at + size + (size & 1)

    walk(pos, end)
    if "n_frames" not in meta:
        raise ValueError("AVI missing avih header")
    return meta


def decode_avi_frame(data: bytes, index: int) -> np.ndarray:
    """Decode ONE frame to (H, W, 3) RGB. For intra-only streams
    (uncompressed DIB; Motion-JPEG 'MJPG', each chunk a standalone
    baseline JPEG) this is random access via the movi offsets — frame k
    never touches the other frames' bytes. For the inter-frame 'CRAM'
    (MS Video 1) stream, frames 0..k are reconstructed in sequence
    (skip blocks reference the previous frame), the codec's inherent
    cost."""
    meta = avi_meta(data)
    frames = meta["frames"]
    if not 0 <= index < len(frames):
        raise IndexError(f"frame {index} out of range (clip has {len(frames)})")
    at, size = frames[index]
    if meta.get("codec", "DIB ") == "CRAM":
        w, h = meta["width"], meta["height"]
        q = None
        for i in range(index + 1):
            fat, fsize = frames[i]
            q = _msvc_decode_frame(data[fat : fat + fsize], h, w, q)
        return _rgb888(q)
    if meta.get("codec", "DIB ") == "MJPG":
        from .jpeg_codec import decode_jpeg

        px = decode_jpeg(data[at : at + size])
        if px.ndim == 2:
            px = np.repeat(px[:, :, None], 3, axis=2)
        return px
    w, h = meta["width"], meta["height"]
    row_bytes = (w * 3 + 3) // 4 * 4
    if size < row_bytes * h:
        raise ValueError("AVI frame chunk truncated")
    rows = np.frombuffer(data, np.uint8, row_bytes * h, at)
    img = rows.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)[::-1]
    return img[:, :, ::-1].copy()  # bottom-up BGR -> RGB


# --------------------------------------------------------------------- GIF
def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF-flavor LZW: variable code width starting at min+1, CLEAR and
    EOI codes, dictionary grows to 4096 then waits for CLEAR."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out: list[int] = []
    # bit reader: GIF packs codes LSB-first
    bitpos = 0
    nbits = len(data) * 8

    def read(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > nbits:
            return eoi  # truncated stream: treat as end
        byte0 = bitpos >> 3
        chunk = int.from_bytes(data[byte0 : byte0 + 3], "little")
        val = (chunk >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        return val

    table: list[bytes] = []

    def reset() -> None:
        nonlocal table, width
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1

    width = min_code_size + 1
    reset()
    prev: bytes | None = None
    while True:
        code = read(width)
        if code == clear:
            reset()
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table) and (code < clear or table[code]):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"invalid LZW code {code}")
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    """GIF-flavor LZW encoder (emits CLEAR up front and on dict reset)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    bits = bytearray()
    acc = 0
    nacc = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += width
        while nacc >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    cur = b""
    for ix in indices:
        nxt = cur + bytes([ix])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur], width)
        if next_code < 4096:
            table[nxt] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        cur = bytes([ix])
    if cur:
        emit(table[cur], width)
    emit(eoi, width)
    if nacc:
        bits.append(acc & 0xFF)
    return bytes(bits)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    out = np.empty_like(rows)
    src = 0
    for start, step in _GIF_INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y] = rows[src]
            src += 1
    return out


def gif_meta(data: bytes) -> dict:
    """Parse a GIF87a/89a container without decoding pixels: logical
    screen size, global palette, and per-frame descriptors (position,
    size, interlace, disposal, transparency, LZW payload offsets)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF file (bad signature)")
    w, h, packed, bg, _ = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    meta: dict = {"width": w, "height": h, "bg_index": bg, "palette": gct, "frames": []}
    gce: dict = {}
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                size = data[pos]
                flags, delay, trans = struct.unpack_from("<BHB", data, pos + 1)
                gce = {
                    "disposal": (flags >> 2) & 7,
                    "transparent": trans if flags & 1 else None,
                    "delay_cs": delay,
                }
                pos += 1 + size
            while data[pos]:  # skip (remaining) sub-blocks
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            left, top, fw, fh, fpacked = struct.unpack_from("<HHHHB", data, pos)
            pos += 9
            lct = None
            if fpacked & 0x80:
                n = 2 << (fpacked & 7)
                lct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            min_code = data[pos]
            pos += 1
            spans = []
            while data[pos]:
                spans.append((pos + 1, data[pos]))
                pos += 1 + data[pos]
            pos += 1
            meta["frames"].append(
                {
                    "left": left,
                    "top": top,
                    "width": fw,
                    "height": fh,
                    "interlace": bool(fpacked & 0x40),
                    "palette": lct,
                    "min_code_size": min_code,
                    "spans": spans,
                    **{
                        "disposal": gce.get("disposal", 0),
                        "transparent": gce.get("transparent"),
                        "delay_cs": gce.get("delay_cs", 0),
                    },
                }
            )
            gce = {}
        else:
            raise ValueError(f"invalid GIF block 0x{block:02x}")
    if not meta["frames"]:
        raise ValueError("GIF contains no image frames")
    meta["n_frames"] = len(meta["frames"])
    return meta


def decode_gif(data: bytes, frame: int = 0) -> np.ndarray:
    """Decode a GIF to the (H, W, 3) uint8 RGB logical screen after
    compositing frames 0..``frame`` (disposal methods 0/1 keep, 2
    restores background; 3 'restore previous' raises
    ``NotImplementedError``). Handles LZW, interlace, local palettes,
    and transparency; frame 0 of a plain GIF is just the image."""
    meta = gif_meta(data)
    frames = meta["frames"]
    if not 0 <= frame < len(frames):
        raise IndexError(f"frame {frame} out of range (gif has {len(frames)})")
    h, w = meta["height"], meta["width"]
    gct = meta["palette"]
    bg = meta["bg_index"]
    if gct is not None:
        canvas = np.tile(gct[bg % len(gct)], (h, w, 1)).astype(np.uint8)
    else:
        canvas = np.zeros((h, w, 3), np.uint8)
    for f in frames[: frame + 1]:
        if f["disposal"] == 3:
            raise NotImplementedError("GIF disposal method 3 (restore previous)")
        pal = f["palette"] if f["palette"] is not None else gct
        if pal is None:
            raise ValueError("GIF frame has no palette")
        payload = b"".join(data[at : at + n] for at, n in f["spans"])
        idx = _lzw_decode(payload, f["min_code_size"])
        fw, fh = f["width"], f["height"]
        if len(idx) < fw * fh:
            raise ValueError("GIF LZW data short of frame size")
        grid = np.asarray(idx[: fw * fh], np.int32).reshape(fh, fw)
        if f["interlace"]:
            grid = _gif_deinterlace(grid)
        rgb = pal[np.clip(grid, 0, len(pal) - 1)]
        y0, x0 = f["top"], f["left"]
        region = canvas[y0 : y0 + fh, x0 : x0 + fw]
        if f["transparent"] is not None:
            mask = grid != f["transparent"]
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        if f["disposal"] == 2 and gct is not None:
            canvas[y0 : y0 + fh, x0 : x0 + fw] = gct[bg % len(gct)]
    return canvas


def encode_gif(frames: np.ndarray, fps: int = 10, interlace: bool = False) -> bytes:
    """Encode (H, W, 3) or (N, H, W, 3) uint8 RGB as a GIF89a with one
    global palette built from the distinct colors (<= 256 required —
    this is a deterministic fixture encoder, not a quantizer)."""
    fr = np.asarray(frames, dtype=np.uint8)
    if fr.ndim == 3:
        fr = fr[None]
    if fr.ndim != 4 or fr.shape[3] != 3:
        raise ValueError(f"encode_gif expects (N, H, W, 3) RGB, got {fr.shape}")
    n, h, w = fr.shape[:3]
    colors, inverse = np.unique(fr.reshape(-1, 3), axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"encode_gif palette overflow: {len(colors)} distinct colors")
    pal_bits = max(1, int(np.ceil(np.log2(max(len(colors), 2)))))
    pal_n = 1 << pal_bits
    palette = np.zeros((pal_n, 3), np.uint8)
    palette[: len(colors)] = colors
    indexed = inverse.reshape(n, h, w)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((pal_bits - 1) << 4) | (pal_bits - 1), 0, 0)
    out += palette.tobytes()
    min_code = max(2, pal_bits)
    for i in range(n):
        if n > 1:
            out += b"\x21\xf9\x04" + struct.pack("<BHB", 0x04, 100 // max(fps, 1), 0) + b"\x00"
        flags = 0x40 if interlace else 0
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, flags)
        grid = indexed[i]
        if interlace:
            rows = [grid[y] for start, step in _GIF_INTERLACE_PASSES for y in range(start, h, step)]
            grid = np.stack(rows)
        out.append(min_code)
        lzw = _lzw_encode([int(v) for v in grid.reshape(-1)], min_code)
        for at in range(0, len(lzw), 255):
            sub = lzw[at : at + 255]
            out.append(len(sub))
            out += sub
        out.append(0)
    out.append(0x3B)
    return bytes(out)


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
    """Decode a RIFF/WAVE file -> (float32 samples in [-1, 1] shaped
    (N,) mono or (N, C), sample_rate). Handles 16-bit PCM (format 1),
    IMA/DVI ADPCM (format 0x11, 4-bit), and G.711 A-law/u-law
    (formats 6/7, 8-bit); walks RIFF chunks, so extra chunks
    (LIST/fact) are tolerated."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, end = 12, min(len(data), 8 + struct.unpack_from("<I", data, 4)[0])
    ch = rate = bits = fmt_code = None
    block_align = 0
    n_sample_frames = None
    pcm = None
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body_at = pos + 8
        if cid == b"fmt ":
            fmt_code, ch, rate = struct.unpack_from("<HHI", data, body_at)
            (block_align, bits) = struct.unpack_from("<HH", data, body_at + 12)
        elif cid == b"fact":
            (n_sample_frames,) = struct.unpack_from("<I", data, body_at)
        elif cid == b"data":
            pcm = data[body_at : body_at + size]
        pos = body_at + size + (size & 1)  # chunks are word-aligned
    if fmt_code is None or pcm is None:
        raise ValueError("WAV missing fmt or data chunk")
    if fmt_code == 0x11 and bits == 4:
        arr = _ima_adpcm_decode(pcm, ch, block_align)
        if n_sample_frames is not None:
            arr = arr[:n_sample_frames]
        if ch == 1:
            arr = arr[:, 0]
        return arr.astype(np.float32) / 32768.0, rate
    if fmt_code in (6, 7) and bits == 8:
        law = "ulaw" if fmt_code == 7 else "alaw"
        arr = _g711_expand(np.frombuffer(pcm, dtype=np.uint8), law)
        if n_sample_frames is not None:
            arr = arr[: n_sample_frames * ch]
        arr = arr.astype(np.float32) / 32768.0
        if ch > 1:
            arr = arr.reshape(-1, ch)
        return arr, rate
    if fmt_code != 1 or bits != 16:
        raise NotImplementedError(
            f"only 16-bit PCM / 4-bit IMA ADPCM / 8-bit G.711 WAV "
            f"supported (got format={fmt_code}, bits={bits})"
        )
    arr = np.frombuffer(pcm, dtype="<i2").astype(np.float32) / 32768.0
    if ch > 1:
        arr = arr.reshape(-1, ch)
    return arr, rate


# ------------------------------------------------------------- IMA ADPCM
# The public IMA/DVI ADPCM tables (IMA Digital Audio Focus Group, 1992;
# Microsoft WAVE format 0x11). 4 bits/sample, 4:1 vs 16-bit PCM.
_IMA_INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8)
_IMA_STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)


def _ima_step(pred: int, index: int, nibble: int) -> tuple[int, int]:
    """One IMA ADPCM state transition -> (new predictor, new index)."""
    step = _IMA_STEP_TABLE[index]
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    pred = pred - diff if nibble & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + _IMA_INDEX_TABLE[nibble & 7]))
    return pred, index


def _ima_adpcm_decode(pcm: bytes, ch: int, block_align: int) -> np.ndarray:
    """Decode IMA ADPCM data bytes -> (N, ch) int16-valued array.
    Block layout per the WAVE spec: a 4-byte header per channel
    (predictor i16, step index u8, reserved u8), then the nibble data
    interleaved 4 bytes (8 samples) per channel."""
    if block_align <= 4 * ch:
        raise ValueError(f"invalid IMA ADPCM block align {block_align}")
    spb = (block_align - 4 * ch) * 2 // ch + 1  # samples per block per channel
    chans: list[list[int]] = [[] for _ in range(ch)]
    for b0 in range(0, len(pcm) - 4 * ch + 1, block_align):
        block = pcm[b0 : b0 + block_align]
        preds, idxs, counts = [], [], []
        for c in range(ch):
            pred, index = struct.unpack_from("<hB", block, 4 * c)[0], block[4 * c + 2]
            idxs.append(max(0, min(88, index)))
            preds.append(pred)
            chans[c].append(pred)  # header predictor IS sample 0
            counts.append(1)
        at = 4 * ch
        while at + 4 * ch <= len(block) and min(counts) < spb:
            for c in range(ch):
                for byte in block[at + 4 * c : at + 4 * (c + 1)]:
                    for nib in (byte & 0xF, byte >> 4):
                        if counts[c] < spb:
                            preds[c], idxs[c] = _ima_step(preds[c], idxs[c], nib)
                            chans[c].append(preds[c])
                            counts[c] += 1
            at += 4 * ch
    n = min(len(x) for x in chans)
    return np.stack([np.asarray(x[:n], np.int32) for x in chans], axis=1)


def encode_wav_adpcm(
    samples: np.ndarray, sample_rate: int = 16000, block_align: int | None = None
) -> bytes:
    """Encode float samples in [-1, 1] (1-D mono or (N, C)) as an
    IMA ADPCM RIFF/WAVE file (format 0x11, 4 bits/sample — a REAL
    public compressed-audio codec at 4:1 vs 16-bit PCM)."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    if n == 0:
        raise ValueError("cannot encode empty audio")
    pcm16 = np.clip(np.round(s * 32767.0), -32768, 32767).astype(np.int32)
    if block_align is None:
        block_align = 256 * ch
    if block_align <= 4 * ch or (block_align - 4 * ch) % (4 * ch):
        raise ValueError(f"block_align {block_align} invalid for {ch} channel(s)")
    spb = (block_align - 4 * ch) * 2 // ch + 1
    # prime the step index to the first block's typical delta: the index
    # is re-announced in every block header, so this costs nothing and
    # removes the slow step-size ramp on non-quiet signal onsets
    steps = np.asarray(_IMA_STEP_TABLE)
    idxs = []
    for c in range(ch):
        d = np.abs(np.diff(pcm16[: min(n, spb), c])).mean() if n > 1 else 0.0
        idxs.append(int(np.abs(steps - d).argmin()))
    blocks = bytearray()
    for b0 in range(0, n, spb):
        frame = pcm16[b0 : b0 + spb]
        preds = [int(frame[0, c]) for c in range(ch)]
        header = bytearray()
        for c in range(ch):
            header += struct.pack("<hBB", preds[c], idxs[c], 0)
        nibbles: list[list[int]] = [[] for _ in range(ch)]
        for c in range(ch):
            for i in range(1, spb):
                sample = int(frame[i, c]) if i < len(frame) else preds[c]
                step = _IMA_STEP_TABLE[idxs[c]]
                diff = sample - preds[c]
                nib = 8 if diff < 0 else 0
                diff = abs(diff)
                if diff >= step:
                    nib |= 4
                    diff -= step
                if diff >= step >> 1:
                    nib |= 2
                    diff -= step >> 1
                if diff >= step >> 2:
                    nib |= 1
                preds[c], idxs[c] = _ima_step(preds[c], idxs[c], nib)
                nibbles[c].append(nib)
        body = bytearray()
        word_groups = (spb - 1 + 7) // 8
        for g in range(word_groups):
            for c in range(ch):
                for k in range(4):
                    j = g * 8 + 2 * k
                    lo = nibbles[c][j] if j < len(nibbles[c]) else 0
                    hi = nibbles[c][j + 1] if j + 1 < len(nibbles[c]) else 0
                    body.append(lo | (hi << 4))
        blocks += header + body
    byte_rate = sample_rate * block_align // spb
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, ch, sample_rate, byte_rate, block_align, 4, 2, spb
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"fact" + struct.pack("<II", 4, n)
    body += b"data" + struct.pack("<I", len(blocks)) + bytes(blocks)
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ----------------------------------------------------------- G.711 u/A-law
# ITU-T G.711 companded telephony audio (WAVE format tags 6 = A-law,
# 7 = u-law): 8 bits/sample log-quantized, the public 2:1 codec pair.
# Decode follows the standard segment expansion (sign | 3-bit segment |
# 4-bit mantissa); encode quantizes each 16-bit sample to the NEAREST
# decode level via one vectorized searchsorted over the 256-entry table.


def _g711_tables(law: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(decode_table[256] int16, sorted_levels, byte_for_sorted_level)."""
    b = np.arange(256, dtype=np.int32)
    if law == "ulaw":
        u = ~b & 0xFF
        t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
        lin = np.where(u & 0x80, 0x84 - t, t - 0x84)
    elif law == "alaw":
        a = b ^ 0x55
        seg = (a & 0x70) >> 4
        t = (a & 0x0F) << 4
        t = np.where(seg == 0, t + 8, (t + 0x108) << np.maximum(seg - 1, 0))
        lin = np.where(a & 0x80, t, -t)  # sign bit SET means positive
    else:  # pragma: no cover
        raise ValueError(f"unknown law {law!r}")
    order = np.argsort(lin, kind="stable")
    return lin.astype(np.int16), lin[order], order.astype(np.uint8)


_G711 = {law: _g711_tables(law) for law in ("ulaw", "alaw")}


def _g711_compress(pcm16: np.ndarray, law: str) -> np.ndarray:
    _, levels, bytes_for = _G711[law]
    mids = (levels[:-1] + levels[1:]) / 2.0
    return bytes_for[np.searchsorted(mids, pcm16.astype(np.int32))]


def _g711_expand(codes: np.ndarray, law: str) -> np.ndarray:
    return _G711[law][0][np.asarray(codes, dtype=np.uint8)]


def encode_wav_g711(
    samples: np.ndarray, sample_rate: int = 8000, law: str = "ulaw"
) -> bytes:
    """Encode float samples in [-1, 1] (1-D mono or (N, C)) as a G.711
    companded RIFF/WAVE file (format 7 u-law / 6 A-law, 8 bits/sample)."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    pcm16 = np.clip(np.round(s * 32767.0), -32768, 32767).astype(np.int32)
    codes = _g711_compress(pcm16.reshape(-1), law)
    fmt_code = 7 if law == "ulaw" else 6
    fmt = struct.pack("<HHIIHHH", fmt_code, ch, sample_rate, sample_rate * ch, ch, 8, 0)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"fact" + struct.pack("<II", 4, n)
    data = codes.tobytes()
    body += b"data" + struct.pack("<I", len(data)) + data + (b"\x00" * (len(data) & 1))
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ---------------------------------------------------------------------
# MPEG audio (MP3/MP2/MP1) frame-header metadata — NO PCM decode.
# Bitstream DECODE of Layer III needs spec table data (34 huffman
# tables, the 512-tap synthesis window) that cannot be re-derived from
# first principles; shipping half-remembered tables would decode real
# files silently WRONG, which is worse than decode_status='unsupported'
# (operators/multimodal.py keeps that contract). The frame HEADERS,
# however, are fully formula+small-table defined (ISO 11172-3 §2.4.1 /
# 13818-3), so duration / bitrate / VBR profiling of an MP3 corpus is
# exact without any DSP — the metadata-scan path a 100 TB audio
# pipeline runs before deciding what to transcode.
# ---------------------------------------------------------------------

_MPEG_BITRATES = {
    # (version_group, layer) -> kbps by index 1..14; index 0 = free format
    ("1", 1): (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    ("1", 2): (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    ("1", 3): (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    ("2", 1): (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    ("2", 2): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    ("2", 3): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_MPEG_RATES = {  # version bits -> sample rates by index 0..2
    3: (44100, 48000, 32000),   # MPEG-1
    2: (22050, 24000, 16000),   # MPEG-2
    0: (11025, 12000, 8000),    # MPEG-2.5
}


def _id3v2_size(data: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (0 if none)."""
    if data[:3] != b"ID3" or len(data) < 10:
        return 0
    sz = (data[6] << 21) | (data[7] << 14) | (data[8] << 7) | data[9]
    return 10 + sz + (10 if data[5] & 0x10 else 0)  # footer flag


def _parse_mpeg_header(h: int):
    """Decode one 32-bit MPEG audio frame header; None if invalid."""
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    vbits = (h >> 19) & 3          # 0=2.5, 1=reserved, 2=MPEG-2, 3=MPEG-1
    lbits = (h >> 17) & 3          # 1=III, 2=II, 3=I
    if vbits == 1 or lbits == 0:
        return None
    layer = 4 - lbits
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 3
    if br_idx == 0xF or sr_idx == 3:
        return None
    version = {3: "1", 2: "2", 0: "2.5"}[vbits]
    rate = _MPEG_RATES[vbits][sr_idx]
    if br_idx == 0:
        kbps = None  # free format: frame length defined by the stream
    else:
        kbps = _MPEG_BITRATES[("1" if vbits == 3 else "2", layer)][br_idx - 1]
    padding = (h >> 9) & 1
    mode = (h >> 6) & 3            # 0 stereo, 1 joint, 2 dual, 3 mono
    crc = not ((h >> 16) & 1)      # protection bit 0 => 16-bit CRC follows
    if layer == 1:
        samples, slot = 384, 4
        nbytes = None if kbps is None else (12 * kbps * 1000 // rate + padding) * 4
    else:
        samples = 576 if (layer == 3 and vbits != 3) else 1152
        slot = 1
        coef = samples // 8  # 144 for 1152-sample frames, 72 for 576
        nbytes = None if kbps is None else coef * kbps * 1000 // rate + padding * slot
    return {
        "version": version, "layer": layer, "kbps": kbps, "sample_rate": rate,
        "channels": 1 if mode == 3 else 2, "mode": mode, "crc": crc,
        "samples": samples, "frame_bytes": nbytes,
    }


def mpeg_audio_meta(data: bytes, max_frames: int | None = None) -> dict:
    """Walk every MPEG audio frame header: exact duration, frame count,
    mean bitrate, VBR flag, and the Xing/Info/VBRI tag if present.

    Resync-safe: a false sync inside payload bytes is rejected because
    the walk lands on real frame boundaries (each header's length field
    takes it to the next header); leading garbage is scanned past
    byte-by-byte until two consecutive valid headers agree on
    version/layer/samplerate.
    """
    tag_skip = _id3v2_size(data)
    pos, n = tag_skip, len(data)
    first = None
    # find first sync confirmed by a consistent follower frame
    while pos + 4 <= n:
        h = _parse_mpeg_header(int.from_bytes(data[pos:pos + 4], "big"))
        if h and h["frame_bytes"]:
            nxt = pos + h["frame_bytes"]
            if nxt + 4 > n:
                first = h
                break
            h2 = _parse_mpeg_header(int.from_bytes(data[nxt:nxt + 4], "big"))
            if h2 and (h2["version"], h2["layer"], h2["sample_rate"]) == (
                h["version"], h["layer"], h["sample_rate"]
            ):
                first = h
                break
        pos += 1
    if first is None:
        raise ValueError("no MPEG audio frames found")

    # Xing/Info (VBR/CBR tag) lives after the Layer III side info of
    # the first frame; VBRI at fixed offset 32
    xing = None
    if first["layer"] == 3:
        side = (17 if first["channels"] == 1 else 32) if first["version"] == "1" \
            else (9 if first["channels"] == 1 else 17)
        off = pos + 4 + (2 if first["crc"] else 0) + side
        tag = data[off:off + 4]
        if tag in (b"Xing", b"Info"):
            flags = int.from_bytes(data[off + 4:off + 8], "big")
            xing = {"tag": tag.decode(), "frames": None, "bytes": None}
            p = off + 8
            if flags & 1:
                xing["frames"] = int.from_bytes(data[p:p + 4], "big"); p += 4
            if flags & 2:
                xing["bytes"] = int.from_bytes(data[p:p + 4], "big")
        elif data[pos + 4 + 32:pos + 4 + 36] == b"VBRI":
            v = pos + 4 + 32
            xing = {"tag": "VBRI",
                    "bytes": int.from_bytes(data[v + 10:v + 14], "big"),
                    "frames": int.from_bytes(data[v + 14:v + 18], "big")}

    frames, kbps_sum, kbps_set = 0, 0, set()
    if xing is not None and first["frame_bytes"]:
        # the Xing/Info/VBRI tag frame carries no audio payload —
        # standard decoders exclude it from frame/duration/bitrate
        # accounting, so the walk starts at the second frame
        pos += first["frame_bytes"]
    while pos + 4 <= n:
        h = _parse_mpeg_header(int.from_bytes(data[pos:pos + 4], "big"))
        if not h or h["frame_bytes"] is None:
            break  # trailing tag (ID3v1/APE) or free-format: stop at last valid frame
        if (h["version"], h["layer"], h["sample_rate"]) != (
            first["version"], first["layer"], first["sample_rate"]
        ):
            break
        frames += 1
        kbps_sum += h["kbps"]
        kbps_set.add(h["kbps"])
        pos += h["frame_bytes"]
        if max_frames is not None and frames >= max_frames:
            break
    # prefer the tag's declared audio-frame count for duration when
    # present and the walk was not deliberately capped — it is what
    # standard decoders report, and it survives truncated payloads
    n_dur = frames
    if xing is not None and xing.get("frames") and max_frames is None:
        n_dur = xing["frames"]
    dur = n_dur * first["samples"] / first["sample_rate"]
    return {
        "format": f"mpeg{first['version']}-layer{first['layer']}",
        "sample_rate": first["sample_rate"], "channels": first["channels"],
        "frames": frames, "samples_per_frame": first["samples"],
        "duration_s": dur,
        "mean_kbps": (kbps_sum / frames) if frames else None,
        "vbr": len(kbps_set) > 1 or (xing is not None and xing["tag"] in ("Xing", "VBRI")),
        "xing": xing, "id3v2_bytes": tag_skip,
    }
