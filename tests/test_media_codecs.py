"""Pure-numpy BMP/WAV codecs: exact round-trips (example + property
tests) and the REAL decode path through the distributed multimodal
operators (mapInPandas over genuine file bytes)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ezdata_spark.functions.media_codecs import (
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
)


def test_bmp_roundtrip_exact():
    rng = np.random.RandomState(7)
    for h, w in [(1, 1), (3, 5), (16, 16), (7, 13)]:  # odd widths hit row padding
        px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        back = decode_bmp(encode_bmp(px))
        assert back.shape == (h, w, 3)
        assert np.array_equal(back, px)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    seed=st.integers(0, 2**31 - 1),
)
def test_bmp_roundtrip_property(h, w, seed):
    px = np.random.RandomState(seed).randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)


def test_bmp_rejects_non_bmp():
    with pytest.raises(ValueError, match="BM"):
        decode_bmp(b"\x89PNG1234567890123456789012345678901234567890123456789012345")


def test_wav_roundtrip_mono_and_stereo():
    t = np.linspace(0, 1, 8000, dtype=np.float32)
    mono = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    back, rate = decode_wav(encode_wav(mono, 8000))
    assert rate == 8000 and back.shape == mono.shape
    assert np.abs(back - mono).max() < 1.6 / 32768  # (|s|+0.5)/32768 quantization bound

    stereo = np.stack([mono, -mono], axis=1)
    back2, rate2 = decode_wav(encode_wav(stereo, 44100))
    assert rate2 == 44100 and back2.shape == stereo.shape
    assert np.abs(back2 - stereo).max() < 1.6 / 32768


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 2000),
    ch=st.integers(1, 2),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_property(n, ch, rate, seed):
    s = np.random.RandomState(seed).uniform(-1, 1, size=(n, ch)).astype(np.float32)
    if ch == 1:
        s = s[:, 0]
    back, r = decode_wav(encode_wav(s, rate))
    assert r == rate and back.shape == s.shape
    assert np.abs(back - s).max() <= 1.6 / 32768  # (|s|+0.5)/32768


def test_wav_tolerates_extra_chunks():
    body = encode_wav(np.zeros(10, dtype=np.float32), 8000)
    # splice a LIST chunk between fmt and data
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + (4).to_bytes(4, "little") + b"INFO"
    patched = body[:fmt_end] + extra + body[fmt_end:]
    import struct

    patched = (
        patched[:4]
        + struct.pack("<I", len(patched) - 8)
        + patched[8:]
    )
    back, rate = decode_wav(patched)
    assert rate == 8000 and len(back) == 10


# ------------------------------------------------------- distributed decode
def _real_media_df(spark, kind: str):
    """Build a media table whose payloads are REAL file bytes (one BMP
    or WAV per row), via mapInPandas so encoding runs executor-side."""
    import pandas as pd

    from ezdata_spark.operators.multimodal import IMAGE_SCHEMA

    def gen(batches):
        for b in batches:
            rows = []
            for mid in b["id"]:
                rng = np.random.RandomState(int(mid))
                if kind == "bmp":
                    w, h = int(rng.randint(4, 20)), int(rng.randint(4, 20))
                    px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
                    data = encode_bmp(px)
                    meta = {"format": "bmp", "width": w, "height": h, "channels": 3}
                else:
                    n = int(rng.randint(100, 2000))
                    s = rng.uniform(-0.9, 0.9, n).astype(np.float32)
                    data = encode_wav(s, 16000)
                    meta = {"format": "wav", "width": 0, "height": 0, "channels": 1}
                rows.append({"media_id": int(mid), "data": data, "meta": meta})
            yield pd.DataFrame(rows)

    return spark.range(0, 20).mapInPandas(gen, IMAGE_SCHEMA)


def test_image_features_real_bmp(spark):
    """image_features over genuine BMP bytes: luma stats must equal the
    numpy ground truth computed from the same deterministic pixels."""
    from ezdata_spark.operators.multimodal import image_features

    media = _real_media_df(spark, "bmp")
    got = {r.media_id: r for r in image_features(media).collect()}
    assert len(got) == 20
    for mid in range(20):
        rng = np.random.RandomState(mid)
        w, h = int(rng.randint(4, 20)), int(rng.randint(4, 20))
        px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        luma = px.astype("float64").mean(axis=2)
        r = got[mid]
        assert (r.width, r.height) == (w, h)
        assert abs(r.mean_luma - luma.mean()) < 1e-9
        assert abs(r.std_luma - luma.std()) < 1e-9


def test_audio_features_real_wav(spark):
    """audio_features over genuine RIFF/WAVE bytes: RMS/peak/zero-cross
    must match numpy ground truth through 16-bit quantization."""
    from ezdata_spark.operators.multimodal import audio_features

    media = _real_media_df(spark, "wav")
    got = {r.media_id: r for r in audio_features(media).collect()}
    assert len(got) == 20
    for mid in range(20):
        rng = np.random.RandomState(mid)
        n = int(rng.randint(100, 2000))
        s = rng.uniform(-0.9, 0.9, n).astype(np.float32)
        q = np.clip(np.round(s * 32767.0), -32768, 32767).astype(np.int16) / 32768.0
        q = q.astype(np.float32)
        r = got[mid]
        assert r.n_samples == n and r.sample_rate == 16000
        assert abs(r.rms - float(np.sqrt(np.mean(q**2)))) < 1e-6
        assert abs(r.peak - float(np.abs(q).max())) < 1e-6
        assert r.zero_crossings == int(np.sum(np.diff(np.signbit(q))))


def test_resize_real_bmp(spark):
    """resize over real BMP: thumbnail equals the strided slice of the
    true pixels, not of stub pixels."""
    from ezdata_spark.operators.multimodal import resize_images

    media = _real_media_df(spark, "bmp")
    got = {r.media_id: r for r in resize_images(media, max_side=6).collect()}
    for mid in (0, 7, 19):
        rng = np.random.RandomState(mid)
        w, h = int(rng.randint(4, 20)), int(rng.randint(4, 20))
        px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        scale = max(1, -(-max(h, w) // 6))
        thumb = px[::scale, ::scale]
        r = got[mid]
        assert (r.thumb_h, r.thumb_w) == thumb.shape[:2]
        assert np.array_equal(
            np.frombuffer(r.thumb, dtype=np.uint8).reshape(thumb.shape), thumb
        )


# --------------------------------------------------------------------- PNG
def test_png_roundtrip_all_filters_all_colortypes():
    """Every scanline filter (None/Sub/Up/Average/Paeth) x every 8-bit
    color layout decodes back to byte-identical pixels."""
    from ezdata_spark.functions.media_codecs import decode_png, encode_png

    rng = np.random.RandomState(21)
    for ch in (1, 2, 3, 4):
        px = rng.randint(0, 256, size=(9, 7, ch), dtype=np.uint8)
        want = px[:, :, 0] if ch == 1 else px
        for ft in range(5):
            back = decode_png(encode_png(px, filter_type=ft))
            assert np.array_equal(back, want), (ch, ft)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 10),
    w=st.integers(1, 10),
    ch=st.sampled_from([1, 3, 4]),
    ft=st.integers(0, 4),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(h, w, ch, ft, seed):
    from ezdata_spark.functions.media_codecs import decode_png, encode_png

    px = np.random.RandomState(seed).randint(0, 256, size=(h, w, ch), dtype=np.uint8)
    want = px[:, :, 0] if ch == 1 else px
    assert np.array_equal(decode_png(encode_png(px, filter_type=ft)), want)


def test_png_ground_truth_bytes():
    """Decode a PNG assembled by hand (independent of encode_png): 2x2
    RGB, filter 0, known pixel bytes."""
    import struct
    import zlib

    from ezdata_spark.functions.media_codecs import decode_png

    # rows: (255,0,0)(0,255,0) / (0,0,255)(255,255,255), filter byte 0
    raw = bytes([0, 255, 0, 0, 0, 255, 0]) + bytes([0, 0, 0, 255, 255, 255, 255])

    def chunk(tag, body):
        return struct.pack(">I", len(body)) + tag + body + struct.pack(
            ">I", zlib.crc32(tag + body)
        )

    blob = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    want = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]], dtype=np.uint8
    )
    assert np.array_equal(decode_png(blob), want)


def test_png_palette_expands_to_rgb():
    import struct
    import zlib

    from ezdata_spark.functions.media_codecs import decode_png

    def chunk(tag, body):
        return struct.pack(">I", len(body)) + tag + body + struct.pack(
            ">I", zlib.crc32(tag + body)
        )

    palette = bytes([10, 20, 30, 200, 100, 0])  # idx0, idx1
    raw = bytes([0, 0, 1]) + bytes([0, 1, 0])  # 2x2 indices with filter 0
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", palette)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    want = np.array(
        [[[10, 20, 30], [200, 100, 0]], [[200, 100, 0], [10, 20, 30]]], dtype=np.uint8
    )
    assert np.array_equal(decode_png(blob), want)


def test_png_error_paths():
    import struct
    import zlib

    from ezdata_spark.functions.media_codecs import decode_png, encode_png

    with pytest.raises(ValueError, match="signature"):
        decode_png(b"nope")
    good = encode_png(np.zeros((2, 2, 3), dtype=np.uint8))
    # corrupt one IDAT payload byte -> CRC failure
    bad = bytearray(good)
    idat_at = good.index(b"IDAT")
    bad[idat_at + 5] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))

    def chunk(tag, body):
        return struct.pack(">I", len(body)) + tag + body + struct.pack(
            ">I", zlib.crc32(tag + body)
        )

    deep = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes([0, 0, 0])))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="8-bit"):
        decode_png(deep)
    laced = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 1))
        + chunk(b"IDAT", zlib.compress(bytes([0, 0])))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="interlaced"):
        decode_png(laced)


def test_image_features_real_png(spark):
    """The distributed decode path over genuine PNG bytes: mean/std luma
    from image_features equal the numpy ground truth per image."""
    import pandas as pd

    from ezdata_spark.functions.media_codecs import encode_png
    from ezdata_spark.operators.multimodal import IMAGE_SCHEMA, image_features

    rng = np.random.RandomState(5)
    rows, truth = [], {}
    for i in range(6):
        h, w = int(rng.randint(4, 12)), int(rng.randint(4, 12))
        px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        ft = i % 5
        rows.append(
            {
                "media_id": i,
                "data": encode_png(px, filter_type=ft),
                "meta": {"format": "png", "width": w, "height": h, "channels": 3},
            }
        )
        luma = px.astype("float64").mean(axis=2)
        truth[i] = (float(luma.mean()), float(luma.std()))
    media = spark.createDataFrame(pd.DataFrame(rows), schema=IMAGE_SCHEMA)
    got = {r.media_id: (r.mean_luma, r.std_luma) for r in image_features(media).collect()}
    assert set(got) == set(truth)
    for i in truth:
        assert got[i][0] == pytest.approx(truth[i][0], abs=1e-9)
        assert got[i][1] == pytest.approx(truth[i][1], abs=1e-9)


# --------------------------------------------------------------------- JPEG
def _psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def test_jpeg_flat_image_near_exact():
    """A flat field survives quantization exactly (DC-only blocks)."""
    from ezdata_spark.functions.jpeg_codec import decode_jpeg, encode_jpeg

    flat = np.full((16, 24), 128, np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(flat, 90)), flat)
    flat_rgb = np.full((8, 8, 3), 200, np.uint8)
    back = decode_jpeg(encode_jpeg(flat_rgb, 90))
    assert back.shape == (8, 8, 3)
    assert _psnr(flat_rgb, back) > 45


def test_jpeg_roundtrip_quality_and_sampling():
    """Smooth content round-trips with high PSNR; quality and 4:4:4 vs
    4:2:0 order as expected; odd sizes exercise MCU padding."""
    from ezdata_spark.functions.jpeg_codec import decode_jpeg, encode_jpeg

    yy, xx = np.mgrid[0:33, 0:41]
    rgb = np.stack([(yy * 3) % 256, (xx * 5) % 256, ((yy + xx) * 2) % 256], axis=2).astype(
        np.uint8
    )
    p444 = _psnr(rgb, decode_jpeg(encode_jpeg(rgb, 90, subsampling="444")))
    p420 = _psnr(rgb, decode_jpeg(encode_jpeg(rgb, 90, subsampling="420")))
    p50 = _psnr(rgb, decode_jpeg(encode_jpeg(rgb, 50, subsampling="444")))
    assert p444 > 40 and p420 > 35
    assert p444 >= p420  # chroma pooling can only lose information
    assert p444 > p50  # higher quality -> higher fidelity

    odd = np.stack([yy[:17, :19] * 7, xx[:17, :19] * 9, yy[:17, :19] * 3], axis=2).astype(
        np.uint8
    )
    d = decode_jpeg(encode_jpeg(odd, 85, subsampling="420"))
    assert d.shape == odd.shape and _psnr(odd, d) > 33


def test_jpeg_gray_roundtrip():
    from ezdata_spark.functions.jpeg_codec import decode_jpeg, encode_jpeg

    yy, xx = np.mgrid[0:20, 0:30]
    g = ((yy * 5 + xx * 3) % 256).astype(np.uint8)
    back = decode_jpeg(encode_jpeg(g, 90))
    assert back.ndim == 2 and back.shape == g.shape
    assert _psnr(g, back) > 38


def test_jpeg_error_paths():
    from ezdata_spark.functions.jpeg_codec import decode_jpeg, encode_jpeg

    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")
    good = bytearray(encode_jpeg(np.full((8, 8), 99, np.uint8)))
    # flip SOF0 -> SOF2 (progressive): clear NotImplementedError
    at = bytes(good).index(b"\xff\xc0")
    prog = bytes(good[:at]) + b"\xff\xc2" + bytes(good[at + 2 :])
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg(prog)
    with pytest.raises(ValueError):
        decode_jpeg(bytes(good[: len(good) // 2]))  # truncated entropy data


def test_image_features_real_jpeg(spark):
    """Distributed decode over genuine JPEG bytes: features match the
    numpy truth of the DECODED pixels (lossy codec — the decoded array
    is the contract, pinned by the PSNR tests above)."""
    import pandas as pd

    from ezdata_spark.functions.jpeg_codec import decode_jpeg, encode_jpeg
    from ezdata_spark.operators.multimodal import IMAGE_SCHEMA, image_features

    rng = np.random.RandomState(9)
    rows, truth = [], {}
    for i in range(4):
        h, w = int(rng.randint(8, 20)), int(rng.randint(8, 20))
        yy, xx = np.mgrid[0:h, 0:w]
        px = np.stack(
            [(yy * (i + 2)) % 256, (xx * (i + 3)) % 256, ((yy + xx) * 2) % 256], axis=2
        ).astype(np.uint8)
        data = encode_jpeg(px, 90, subsampling="420" if i % 2 else "444")
        rows.append(
            {
                "media_id": i,
                "data": data,
                "meta": {"format": "jpeg", "width": w, "height": h, "channels": 3},
            }
        )
        luma = decode_jpeg(data).astype("float64").mean(axis=2)
        truth[i] = (float(luma.mean()), float(luma.std()))
    media = spark.createDataFrame(pd.DataFrame(rows), schema=IMAGE_SCHEMA)
    got = {r.media_id: (r.mean_luma, r.std_luma) for r in image_features(media).collect()}
    for i in truth:
        assert got[i][0] == pytest.approx(truth[i][0], abs=1e-9)
        assert got[i][1] == pytest.approx(truth[i][1], abs=1e-9)


# ------------------------------------------------------------------- GIF
def test_gif_roundtrip_exact_and_interlaced():
    """encode->decode is pixel-exact (palette built from the distinct
    colors, LZW lossless), both sequential and interlaced."""
    from ezdata_spark.functions.media_codecs import decode_gif, encode_gif

    rng = np.random.RandomState(3)
    pal = rng.randint(0, 256, (7, 3), dtype=np.uint8)
    for h, w in [(1, 1), (5, 9), (13, 17), (32, 47)]:
        px = pal[rng.randint(0, len(pal), (h, w))]
        for interlace in (False, True):
            back = decode_gif(encode_gif(px, interlace=interlace))
            assert back.shape == (h, w, 3)
            assert np.array_equal(back, px), (h, w, interlace)


def test_gif_lzw_code_growth_and_dict_reset():
    """A large high-entropy indexed image pushes LZW through code-width
    growth (and, at this size, dictionary resets) — still lossless."""
    from ezdata_spark.functions.media_codecs import decode_gif, encode_gif

    rng = np.random.RandomState(11)
    pal = rng.randint(0, 256, (256, 3), dtype=np.uint8)
    pal = np.unique(pal, axis=0)  # distinct colors only
    px = pal[rng.randint(0, len(pal), (64, 101))]
    assert np.array_equal(decode_gif(encode_gif(px)), px)


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    ncol=st.integers(2, 16),
    interlace=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_roundtrip_property(h, w, ncol, interlace, seed):
    from ezdata_spark.functions.media_codecs import decode_gif, encode_gif

    rng = np.random.RandomState(seed)
    pal = np.unique(rng.randint(0, 256, (ncol, 3), dtype=np.uint8), axis=0)
    px = pal[rng.randint(0, len(pal), (h, w))]
    assert np.array_equal(decode_gif(encode_gif(px, interlace=interlace)), px)


def test_gif_animation_frames_and_meta():
    from ezdata_spark.functions.media_codecs import decode_gif, encode_gif, gif_meta

    rng = np.random.RandomState(5)
    pal = rng.randint(0, 256, (5, 3), dtype=np.uint8)
    frames = np.stack([pal[rng.randint(0, 5, (9, 11))] for _ in range(4)])
    g = encode_gif(frames, fps=5)
    m = gif_meta(g)
    assert m["n_frames"] == 4 and m["width"] == 11 and m["height"] == 9
    for i in range(4):
        assert np.array_equal(decode_gif(g, frame=i), frames[i])


def test_gif_ground_truth_bytes():
    """Hand-assembled 2x2 GIF87a (2-color global palette, no extensions)
    decoded against the spec layout — the decoder, not the encoder, is
    the source of truth here."""
    import struct as _s

    from ezdata_spark.functions.media_codecs import _lzw_encode, decode_gif

    # palette: index 0 = red, 1 = blue; pixels: [[0,1],[1,0]]
    hdr = b"GIF87a" + _s.pack("<HHBBB", 2, 2, 0x80, 0, 0)
    pal = bytes([255, 0, 0, 0, 0, 255])
    lzw = _lzw_encode([0, 1, 1, 0], 2)
    img = b"\x2c" + _s.pack("<HHHHB", 0, 0, 2, 2, 0) + bytes([2, len(lzw)]) + lzw + b"\x00"
    g = hdr + pal + img + b"\x3b"
    out = decode_gif(g)
    expect = np.array([[[255, 0, 0], [0, 0, 255]], [[0, 0, 255], [255, 0, 0]]], np.uint8)
    assert np.array_equal(out, expect)


def test_gif_transparency_composites_over_previous_frame():
    import struct as _s

    from ezdata_spark.functions.media_codecs import (
        _lzw_encode,
        decode_gif,
        encode_gif,
        gif_meta,
    )

    rng = np.random.RandomState(9)
    pal = rng.randint(1, 255, (4, 3), dtype=np.uint8)
    base = pal[rng.randint(0, 4, (4, 4))]
    g = bytearray(encode_gif(base))
    # append a second frame: all-transparent except one pixel -> frame 1
    # must equal frame 0 with that single pixel changed
    m = gif_meta(bytes(g))
    pal_full = m["palette"]
    trans_ix = 3
    gce = b"\x21\xf9\x04" + _s.pack("<BHB", 0x01, 10, trans_ix) + b"\x00"
    grid = [trans_ix] * 16
    grid[5] = 1  # pixel (1,1) -> palette color 1
    lzw = _lzw_encode(grid, 2)
    frame = b"\x2c" + _s.pack("<HHHHB", 0, 0, 4, 4, 0) + bytes([2, len(lzw)]) + lzw + b"\x00"
    g = bytes(g[:-1]) + gce + frame + b"\x3b"
    out0, out1 = decode_gif(g, 0), decode_gif(g, 1)
    expect = out0.copy()
    expect[1, 1] = pal_full[1]
    assert np.array_equal(out1, expect)


def test_gif_error_paths():
    from ezdata_spark.functions.media_codecs import decode_gif, encode_gif, gif_meta

    with pytest.raises(ValueError, match="signature"):
        gif_meta(b"NOTGIF" + b"\x00" * 20)
    with pytest.raises(ValueError, match="no image frames"):
        gif_meta(b"GIF89a" + b"\x00\x01\x00\x01\x00\x00\x00" + b"\x3b")
    with pytest.raises(ValueError, match="palette overflow"):
        rng = np.random.RandomState(0)
        encode_gif(rng.randint(0, 256, (40, 40, 3), dtype=np.uint8))
    g = encode_gif(np.zeros((2, 2, 3), np.uint8))
    with pytest.raises(IndexError, match="out of range"):
        decode_gif(g, frame=1)


def test_image_features_real_gif(spark):
    """Distributed decode over genuine GIF bytes (lossless -> features
    match the ENCODED pixels exactly)."""
    import pandas as pd

    from ezdata_spark.functions.media_codecs import encode_gif
    from ezdata_spark.operators.multimodal import IMAGE_SCHEMA, image_features

    rng = np.random.RandomState(21)
    pal = rng.randint(0, 256, (9, 3), dtype=np.uint8)
    rows, truth = [], {}
    for i in range(4):
        h, w = int(rng.randint(6, 20)), int(rng.randint(6, 20))
        px = pal[rng.randint(0, len(pal), (h, w))]
        rows.append(
            {
                "media_id": i,
                "data": encode_gif(px, interlace=bool(i % 2)),
                "meta": {"format": "gif", "width": w, "height": h, "channels": 3},
            }
        )
        luma = px.astype("float64").mean(axis=2)
        truth[i] = (float(luma.mean()), float(luma.std()))
    media = spark.createDataFrame(pd.DataFrame(rows), schema=IMAGE_SCHEMA)
    got = {r.media_id: (r.mean_luma, r.std_luma) for r in image_features(media).collect()}
    for i in truth:
        assert got[i] == (pytest.approx(truth[i][0]), pytest.approx(truth[i][1]))


# ------------------------------------------------------------ IMA ADPCM
def test_adpcm_ground_truth_block():
    """Hand-built single block against the published IMA state machine:
    predictor 100, index 0, all nibbles 4 -> pred += full step, index
    += 2 each sample (step table walks 7, 9, 11, 13...)."""
    import struct as _s

    from ezdata_spark.functions.media_codecs import decode_wav

    block_align = 8  # mono: 4-byte header + 4 data bytes = 9 samples
    header = _s.pack("<hBB", 100, 0, 0)
    data = header + bytes([0x44] * 4)
    fmt = _s.pack("<HHIIHHHH", 0x11, 1, 8000, 4000, block_align, 4, 2, 9)
    body = b"WAVE" + b"fmt " + _s.pack("<I", len(fmt)) + fmt
    body += b"data" + _s.pack("<I", len(data)) + data
    wav = b"RIFF" + _s.pack("<I", len(body)) + body
    out, rate = decode_wav(wav)
    assert rate == 8000
    # steps at indices 0,2,4,6,...: 7,9,11,13,16,19,23,28; nibble 4 adds
    # the full step on top of the step>>3 base term
    expect = [100]
    steps = [7, 9, 11, 13, 16, 19, 23, 28]
    for s in steps:
        expect.append(expect[-1] + s + (s >> 3))
    assert np.allclose(out * 32768.0, expect)


def test_adpcm_roundtrip_tone_and_noise():
    from ezdata_spark.functions.media_codecs import (
        decode_wav,
        encode_wav,
        encode_wav_adpcm,
    )

    t = np.arange(6000) / 16000
    tone = (0.6 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    w = encode_wav_adpcm(tone, 16000)
    dec, rate = decode_wav(w)
    assert rate == 16000 and dec.shape == tone.shape
    assert np.sqrt(np.mean((dec - tone) ** 2)) < 0.02
    # genuinely compressed: ~4:1 vs 16-bit PCM
    assert len(w) < 0.3 * len(encode_wav(tone, 16000))

    rng = np.random.RandomState(2)
    noise = (rng.standard_normal(3000) * 0.1).astype(np.float32)
    dec2, _ = decode_wav(encode_wav_adpcm(noise, 8000))
    assert np.sqrt(np.mean((dec2 - noise) ** 2)) < 0.05


def test_adpcm_stereo_roundtrip_preserves_channels():
    from ezdata_spark.functions.media_codecs import decode_wav, encode_wav_adpcm

    t = np.arange(4000) / 8000
    left = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    right = (0.4 * np.sin(2 * np.pi * 550 * t + 1.0)).astype(np.float32)
    st2 = np.stack([left, right], axis=1)
    dec, rate = decode_wav(encode_wav_adpcm(st2, 8000))
    assert dec.shape == st2.shape and rate == 8000
    for c in range(2):
        err = np.sqrt(np.mean((dec[:, c] - st2[:, c]) ** 2))
        assert err < 0.02, (c, err)
    # channels not swapped: correlation with own source dominates
    assert np.corrcoef(dec[:, 0], left)[0, 1] > 0.99
    assert np.corrcoef(dec[:, 1], right)[0, 1] > 0.99


@settings(max_examples=15, deadline=None)
@given(
    n=st.integers(10, 3000),
    ch=st.integers(1, 2),
    seed=st.integers(0, 2**31 - 1),
)
def test_adpcm_roundtrip_property(n, ch, seed):
    """Arbitrary lengths (partial final blocks) decode to exactly n
    samples with bounded error."""
    from ezdata_spark.functions.media_codecs import decode_wav, encode_wav_adpcm

    rng = np.random.RandomState(seed)
    # smooth-ish signal: ADPCM's 4-bit delta tracks it closely
    sig = np.cumsum(rng.standard_normal((n, ch)) * 0.01, axis=0)
    sig = np.clip(sig, -0.9, 0.9).astype(np.float32)
    if ch == 1:
        sig = sig[:, 0]
    dec, _ = decode_wav(encode_wav_adpcm(sig, 16000))
    assert dec.shape == sig.shape
    assert np.sqrt(np.mean((dec - sig) ** 2)) < 0.05


def test_adpcm_error_paths():
    from ezdata_spark.functions.media_codecs import encode_wav_adpcm

    with pytest.raises(ValueError, match="empty"):
        encode_wav_adpcm(np.array([], dtype=np.float32))
    with pytest.raises(ValueError, match="block_align"):
        encode_wav_adpcm(np.zeros(10, np.float32), block_align=6)


def test_audio_features_real_adpcm(spark):
    """Distributed decode over genuine IMA-ADPCM bytes: features match
    the numpy truth of the DECODED waveform."""
    import pandas as pd

    from ezdata_spark.functions.media_codecs import decode_wav, encode_wav_adpcm
    from ezdata_spark.operators.multimodal import IMAGE_SCHEMA, audio_features

    rng = np.random.RandomState(31)
    rows, truth = [], {}
    for i in range(3):
        n = int(rng.randint(2000, 6000))
        t = np.arange(n) / 16000
        sig = (0.5 * np.sin(2 * np.pi * (200 + 100 * i) * t)).astype(np.float32)
        data = encode_wav_adpcm(sig, 16000)
        rows.append(
            {
                "media_id": i,
                "data": data,
                "meta": {"format": "adpcm", "width": 0, "height": 0, "channels": 1},
            }
        )
        wave, _ = decode_wav(data)
        truth[i] = (len(wave), float(np.sqrt(np.mean(wave**2))))
    media = spark.createDataFrame(pd.DataFrame(rows), schema=IMAGE_SCHEMA)
    got = {r.media_id: (r.n_samples, r.rms) for r in audio_features(media).collect()}
    for i in truth:
        assert got[i][0] == truth[i][0]
        assert got[i][1] == pytest.approx(truth[i][1], abs=1e-9)


# ------------------------------------------------------------ MJPEG / AVI
def test_mjpeg_avi_roundtrip_and_random_access():
    """Motion-JPEG AVI: per-frame baseline JPEGs in '00dc' chunks,
    random-access decode through the strh fourcc dispatch; smooth
    frames reconstruct within JPEG tolerance."""
    from ezdata_spark.functions.media_codecs import (
        avi_meta,
        decode_avi_frame,
        encode_avi,
    )

    x = np.linspace(0, 255, 48)
    base = np.add.outer(x, x)[:32, :48]
    frames = np.stack(
        [np.stack([(base + 10 * i) % 256] * 3, axis=2) for i in range(6)]
    ).astype(np.uint8)
    blob = encode_avi(frames, fps=12, codec="MJPG", quality=92)
    m = avi_meta(blob)
    assert m["codec"] == "MJPG"
    assert (m["n_frames"], m["fps"], m["width"], m["height"]) == (6, 12, 48, 32)
    assert len(m["frames"]) == 6
    for i in (0, 3, 5):
        px = decode_avi_frame(blob, i)
        assert px.shape == (32, 48, 3)
        mae = np.abs(px.astype(float) - frames[i].astype(float)).mean()
        assert mae < 3.0, f"frame {i} MAE {mae}"
    # frame chunks really are standalone JPEGs (SOI marker at offset)
    at, size = m["frames"][2]
    assert blob[at : at + 2] == b"\xff\xd8"
    # uncompressed stream unaffected: still byte-exact
    dib = encode_avi(frames, fps=12)
    assert avi_meta(dib)["codec"] == "DIB "
    assert np.array_equal(decode_avi_frame(dib, 4), frames[4])
    with pytest.raises(ValueError, match="codec"):
        encode_avi(frames, codec="H264")


def test_mjpeg_smaller_than_dib():
    """The point of the compressed stream: MJPG payload is materially
    smaller than the uncompressed DIB container for smooth content."""
    from ezdata_spark.functions.media_codecs import encode_avi

    x = np.linspace(0, 200, 64)
    base = np.add.outer(x, x)[:48, :64]
    frames = np.stack(
        [np.stack([(base + 5 * i) % 256] * 3, axis=2) for i in range(8)]
    ).astype(np.uint8)
    dib = encode_avi(frames)
    mjpg = encode_avi(frames, codec="MJPG", quality=85)
    assert len(mjpg) < len(dib) / 2


def test_frame_features_real_mjpeg(spark):
    """Distributed frame sampling over an MJPG clip: features match the
    numpy truth of the DECODED (lossy) frames."""
    import pandas as pd

    from ezdata_spark.functions.media_codecs import decode_avi_frame, encode_avi
    from ezdata_spark.operators.multimodal import (
        IMAGE_SCHEMA,
        frame_features,
        sample_frames,
    )

    rng = np.random.RandomState(17)
    frames = rng.randint(0, 256, (12, 16, 16, 3), np.uint8)
    blob = encode_avi(frames, fps=10, codec="MJPG")
    media = spark.createDataFrame(
        pd.DataFrame(
            [
                {
                    "media_id": 9,
                    "data": blob,
                    "meta": {"format": "avi", "width": 16, "height": 16, "channels": 3},
                }
            ]
        ),
        schema=IMAGE_SCHEMA,
    )
    sampled = sample_frames(media, every_n=10, max_frames=5)
    feats = {
        r.frame_index: (r.mean_luma, r.std_luma)
        for r in frame_features(sampled).collect()
    }
    assert set(feats) == {0, 10}
    for idx, (ml, sl) in feats.items():
        luma = decode_avi_frame(blob, idx).astype("float64").mean(axis=2)
        assert ml == pytest.approx(float(luma.mean()), abs=1e-9)
        assert sl == pytest.approx(float(luma.std()), abs=1e-9)


# ----------------------------------------------------------------- G.711
def test_g711_decode_tables_ground_truth():
    """Canonical G.711 segment-expansion values (ITU-T G.711 tables)."""
    from ezdata_spark.functions.media_codecs import _g711_expand

    # u-law: byte 0x00 is the negative extreme, 0xFF/0x7F both zero
    assert _g711_expand(np.array([0x00]), "ulaw")[0] == -32124
    assert _g711_expand(np.array([0x80]), "ulaw")[0] == 32124
    assert _g711_expand(np.array([0xFF]), "ulaw")[0] == 0
    assert _g711_expand(np.array([0x7F]), "ulaw")[0] == 0
    # A-law: 0x55 is the smallest negative step, extremes +-32256
    assert _g711_expand(np.array([0x55]), "alaw")[0] == -8
    assert _g711_expand(np.array([0xD5]), "alaw")[0] == 8
    assert _g711_expand(np.array([0x2A]), "alaw")[0] == -32256
    assert _g711_expand(np.array([0xAA]), "alaw")[0] == 32256


def test_g711_compress_is_nearest_and_consistent():
    """Every decode level re-encodes to a byte that decodes to the SAME
    level (quantizer is idempotent on its own outputs), and compression
    of arbitrary pcm picks the nearest level."""
    from ezdata_spark.functions.media_codecs import _g711_compress, _g711_expand

    for law in ("ulaw", "alaw"):
        all_bytes = np.arange(256, dtype=np.uint8)
        lin = _g711_expand(all_bytes, law)
        again = _g711_expand(_g711_compress(lin.astype(np.int32), law), law)
        assert np.array_equal(again, lin)
        rng = np.random.RandomState(5)
        pcm = rng.randint(-32768, 32768, 5000)
        got = _g711_expand(_g711_compress(pcm, law), law).astype(np.int64)
        levels = np.unique(lin.astype(np.int64))
        best = levels[np.abs(levels[None, :] - pcm[:, None]).argmin(axis=1)]
        assert np.array_equal(np.abs(got - pcm), np.abs(best - pcm))


def test_g711_wav_roundtrip_snr():
    """Encoded tone decodes with the codec's textbook ~38 dB SNR."""
    from ezdata_spark.functions.media_codecs import decode_wav, encode_wav_g711

    sig = (np.sin(np.linspace(0, 40 * np.pi, 4000)) * 0.7).astype(np.float32)
    for law, fmt in (("ulaw", 7), ("alaw", 6)):
        blob = encode_wav_g711(sig, 8000, law=law)
        import struct as _s

        assert _s.unpack_from("<H", blob, 20)[0] == fmt
        out, rate = decode_wav(blob)
        assert rate == 8000 and out.shape == sig.shape
        snr = 10 * np.log10(np.mean(sig**2) / np.mean((sig - out) ** 2))
        assert snr > 35.0


def test_g711_stereo_and_odd_length():
    """(N, 2) channel interleave survives the round trip; odd payload
    lengths stay word-aligned via the RIFF pad byte."""
    from ezdata_spark.functions.media_codecs import decode_wav, encode_wav_g711

    rng = np.random.RandomState(7)
    sig = np.clip(
        np.cumsum(rng.standard_normal((501, 2)) * 0.02, axis=0), -0.9, 0.9
    ).astype(np.float32)
    blob = encode_wav_g711(sig, 16000, law="alaw")
    out, rate = decode_wav(blob)
    assert rate == 16000 and out.shape == (501, 2)
    assert np.sqrt(np.mean((out - sig) ** 2)) < 0.02


def test_audio_features_real_g711(spark):
    """Distributed decode over genuine G.711 bytes: features match the
    numpy truth of the DECODED waveform."""
    import pandas as pd

    from ezdata_spark.functions.media_codecs import decode_wav, encode_wav_g711
    from ezdata_spark.operators.multimodal import IMAGE_SCHEMA, audio_features

    rng = np.random.RandomState(23)
    rows, truth = [], {}
    for i, law in enumerate(("ulaw", "alaw")):
        n = int(rng.randint(2000, 6000))
        t = np.arange(n) / 8000
        sig = (0.5 * np.sin(2 * np.pi * (150 + 90 * i) * t)).astype(np.float32)
        data = encode_wav_g711(sig, 8000, law=law)
        rows.append(
            {
                "media_id": i,
                "data": data,
                "meta": {"format": "g711", "width": 0, "height": 0, "channels": 1},
            }
        )
        wave, _ = decode_wav(data)
        truth[i] = (len(wave), float(np.sqrt(np.mean(wave**2))))
    media = spark.createDataFrame(pd.DataFrame(rows), schema=IMAGE_SCHEMA)
    got = {r.media_id: (r.n_samples, r.rms) for r in audio_features(media).collect()}
    for i in truth:
        assert got[i][0] == truth[i][0]
        assert got[i][1] == pytest.approx(truth[i][1], abs=1e-9)


# ------------------------------------------------------------------ FLAC
def _flac_rt(sig, **kw):
    from ezdata_spark.functions.flac_codec import decode_flac, encode_flac

    blob = encode_flac(np.asarray(sig), 16000, **kw)
    out, rate = decode_flac(blob)
    pcm_in = np.clip(np.round(np.asarray(sig) * 32767.0), -32768, 32767).astype(np.int32)
    pcm_out = np.round(np.asarray(out) * 32768.0).astype(np.int32)
    assert rate == 16000
    assert pcm_out.shape == pcm_in.shape
    assert np.array_equal(pcm_out, pcm_in), "FLAC round-trip not lossless"
    return blob


def test_flac_roundtrip_all_subframe_types():
    """Constant (silence), verbatim-ish (noise), fixed predictors
    (smooth walk), and true LPC all round-trip EXACTLY (lossless)."""
    rng = np.random.RandomState(3)
    t = np.arange(10000) / 16000.0
    _flac_rt(np.zeros(5000))                       # CONSTANT
    _flac_rt(np.full(300, 0.25))                   # CONSTANT, partial block
    _flac_rt(rng.uniform(-0.99, 0.99, 5000))       # noisy -> high rice/verbatim
    _flac_rt(0.5 * np.sin(2 * np.pi * 440 * t))    # FIXED
    _flac_rt(0.5 * np.sin(2 * np.pi * 440 * t), lpc_order=8)  # LPC
    walk = np.clip(np.cumsum(rng.standard_normal(20000)) * 1e-3, -0.9, 0.9)
    _flac_rt(walk)                                  # multi-block + tail block


def test_flac_stereo_modes_lossless():
    t = np.arange(9000) / 16000.0
    st = np.stack(
        [0.4 * np.sin(2 * np.pi * 300 * t), 0.4 * np.sin(2 * np.pi * 302 * t) + 0.01],
        axis=1,
    )
    _flac_rt(st)                    # mid/side
    _flac_rt(st, mid_side=False)    # independent channels
    _flac_rt(st, lpc_order=4)       # mid/side + LPC


def test_flac_compression_sanity():
    """The encoder actually compresses: silence collapses, LPC beats
    the fixed predictors on a pure tone, noise stays ~1:1 (lossless
    bound)."""
    from ezdata_spark.functions.flac_codec import encode_flac

    t = np.arange(10000) / 16000.0
    tone = 0.5 * np.sin(2 * np.pi * 440 * t)
    silence = encode_flac(np.zeros(10000), 16000)
    fixed = encode_flac(tone, 16000)
    lpc = encode_flac(tone, 16000, lpc_order=8)
    assert len(silence) < 200
    assert len(lpc) < len(fixed) < 20000  # raw is 20 kB
    rng = np.random.RandomState(0)
    noise = encode_flac(rng.uniform(-0.99, 0.99, 10000), 16000)
    assert len(noise) < 22000  # never blows past raw+headers


@settings(max_examples=10, deadline=None)
@given(
    n=st.integers(16, 12000),
    ch=st.integers(1, 2),
    lpc=st.sampled_from([None, 2, 6]),
    seed=st.integers(0, 2**31 - 1),
)
def test_flac_roundtrip_property(n, ch, lpc, seed):
    rng = np.random.RandomState(seed)
    sig = np.clip(np.cumsum(rng.standard_normal((n, ch)) * 0.01, axis=0), -0.9, 0.9)
    if ch == 1:
        sig = sig[:, 0]
    _flac_rt(sig.astype(np.float32), lpc_order=lpc)


def test_flac_many_frames_utf8_numbers():
    """>128 frames exercises the multi-byte UTF-8 frame-number coding."""
    from ezdata_spark.functions.flac_codec import decode_flac, encode_flac

    sig = (0.1 * np.sin(np.arange(40000) * 0.05)).astype(np.float32)
    blob = encode_flac(sig, 16000, block_size=256)  # 157 frames
    out, _ = decode_flac(blob)
    assert len(out) == 40000


def test_flac_corruption_detected():
    from ezdata_spark.functions.flac_codec import decode_flac, encode_flac

    sig = (0.3 * np.sin(np.arange(5000) * 0.1)).astype(np.float32)
    blob = bytearray(encode_flac(sig, 16000))
    with pytest.raises(ValueError, match="FLAC"):
        decode_flac(b"nope" + bytes(blob[4:]))
    # flip a byte mid-frame: CRC-16 (or upstream parse) must object
    blob[len(blob) // 2] ^= 0xFF
    with pytest.raises(ValueError):
        decode_flac(bytes(blob))
    with pytest.raises(ValueError, match="truncated|sync|FLAC"):
        decode_flac(bytes(encode_flac(sig, 16000))[:60])


def test_audio_features_real_flac(spark):
    """Distributed decode over genuine FLAC bytes: features match the
    numpy truth of the ORIGINAL waveform (lossless codec, so decode
    equals input at 16-bit precision)."""
    import pandas as pd

    from ezdata_spark.functions.flac_codec import decode_flac, encode_flac
    from ezdata_spark.operators.multimodal import IMAGE_SCHEMA, audio_features

    rng = np.random.RandomState(41)
    rows, truth = [], {}
    for i, lpc in enumerate((None, 6)):
        n = int(rng.randint(3000, 9000))
        t = np.arange(n) / 16000
        sig = (0.5 * np.sin(2 * np.pi * (180 + 70 * i) * t)).astype(np.float32)
        data = encode_flac(sig, 16000, lpc_order=lpc)
        rows.append(
            {
                "media_id": i,
                "data": data,
                "meta": {"format": "flac", "width": 0, "height": 0, "channels": 1},
            }
        )
        wave, _ = decode_flac(data)
        truth[i] = (len(wave), float(np.sqrt(np.mean(wave**2))))
    media = spark.createDataFrame(pd.DataFrame(rows), schema=IMAGE_SCHEMA)
    got = {r.media_id: (r.n_samples, r.rms) for r in audio_features(media).collect()}
    for i in truth:
        assert got[i][0] == truth[i][0]
        assert got[i][1] == pytest.approx(truth[i][1], abs=1e-9)


# ----------------------------------------------------- MS Video 1 (CRAM)
def _cram_fixture(n=6, h=16, w=24):
    """Checkerboard background + a moving square, all colors RGB555-
    exact and <=2 per block -> the lossy quantizer is exact here."""
    bg = np.zeros((h, w, 3), np.uint8)
    bg[(np.add.outer(np.arange(h) // 4, np.arange(w) // 4)) % 2 == 0] = [96, 128, 160]
    frames = []
    for i in range(n):
        f = bg.copy()
        x = 4 * i % (w - 8)
        f[4:12, x : x + 8] = [248, 64, 8]
        frames.append(f)
    return np.stack(frames)


def test_cram_interframe_roundtrip_exact():
    """Inter-frame decode reproduces every frame exactly for RGB555-
    exact, <=2-colors-per-block content; skip blocks make inter frames
    a fraction of the keyframe."""
    from ezdata_spark.functions.media_codecs import (
        avi_meta,
        decode_avi_frame,
        encode_avi,
    )

    frames = _cram_fixture()
    blob = encode_avi(frames, fps=10, codec="CRAM")
    m = avi_meta(blob)
    assert m["codec"] == "CRAM"
    for i in range(len(frames)):
        assert np.array_equal(decode_avi_frame(blob, i), frames[i]), f"frame {i}"
    sizes = [s for _, s in m["frames"]]
    assert sizes[0] > 1.8 * np.mean(sizes[1:])  # keyframe >> inter frames
    dib = encode_avi(frames)
    assert len(blob) < len(dib) / 5  # real temporal compression


def test_cram_static_clip_collapses():
    """A fully static clip: every inter frame is one skip run."""
    from ezdata_spark.functions.media_codecs import avi_meta, encode_avi

    frames = np.repeat(_cram_fixture(1), 5, axis=0)
    m = avi_meta(encode_avi(frames, codec="CRAM"))
    sizes = [s for _, s in m["frames"]]
    assert all(s == 2 for s in sizes[1:])  # one 16-bit skip code each


def test_cram_lossy_bounded_and_modes():
    """Random content exercises the 8-color quadrant path (lossy but
    bounded); dark colors in the skip-code range take the 2-color
    fallback and stay exact."""
    from ezdata_spark.functions.media_codecs import decode_avi_frame, encode_avi

    rng = np.random.RandomState(1)
    rf = rng.randint(0, 256, (4, 8, 12, 3), np.uint8)
    blob = encode_avi(rf, codec="CRAM")
    for i in range(4):
        px = decode_avi_frame(blob, i)
        mae = np.abs(px.astype(int) - rf[i].astype(int)).mean()
        assert mae < 60, f"frame {i} MAE {mae}"  # quantizer, not garbage
    dark = np.zeros((3, 4, 4, 3), np.uint8)
    dark[:] = [0, 33, 9]  # RGB555 cell 0x421 — inside the skip-code range
    px = decode_avi_frame(encode_avi(dark, codec="CRAM"), 2)
    assert np.array_equal(px, np.zeros((4, 4, 3), np.uint8) + [0, 32, 8])
    with pytest.raises(ValueError, match="multiples of 4"):
        encode_avi(np.zeros((2, 6, 6, 3), np.uint8), codec="CRAM")


def test_frame_features_real_cram(spark):
    """Distributed frame sampling over a CRAM clip: features match the
    numpy truth of the reconstructed frames (sequential inter-frame
    decode inside the Arrow batch)."""
    import pandas as pd

    from ezdata_spark.functions.media_codecs import decode_avi_frame, encode_avi
    from ezdata_spark.operators.multimodal import (
        IMAGE_SCHEMA,
        frame_features,
        sample_frames,
    )

    frames = _cram_fixture(n=12)
    blob = encode_avi(frames, fps=10, codec="CRAM")
    media = spark.createDataFrame(
        pd.DataFrame(
            [
                {
                    "media_id": 3,
                    "data": blob,
                    "meta": {"format": "avi", "width": 24, "height": 16, "channels": 3},
                }
            ]
        ),
        schema=IMAGE_SCHEMA,
    )
    sampled = sample_frames(media, every_n=5, max_frames=3)
    feats = {
        r.frame_index: (r.mean_luma, r.std_luma)
        for r in frame_features(sampled).collect()
    }
    assert set(feats) == {0, 5, 10}
    for idx, (ml, sl) in feats.items():
        luma = decode_avi_frame(blob, idx).astype("float64").mean(axis=2)
        assert ml == pytest.approx(float(luma.mean()), abs=1e-9)
        assert sl == pytest.approx(float(luma.std()), abs=1e-9)
