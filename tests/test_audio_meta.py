"""Header-only audio metadata: MPEG frame walk, WAV/FLAC containers.

The MPEG path is the metadata complement of the decode_status
contract (operators/multimodal.py): PCM decode of Layer III stays
'unsupported' (spec tables not re-derivable), but duration/bitrate/VBR
are exact from frame headers alone. Reference has no audio surface;
this is extension coverage for the LLM-pipeline multimodal tier.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest

from ezdata_spark.functions.media_codecs import mpeg_audio_meta

REAL_MP3 = "/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/test_data/test.mp3"


def _mpeg1_l3_frame(kbps=128, rate_idx=0, padding=0, mode=0, payload=None):
    """One MPEG-1 Layer III frame: valid header + zero payload (the
    metadata walk never reads payload bits)."""
    bitrates = (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    br_idx = bitrates.index(kbps) + 1
    rate = (44100, 48000, 32000)[rate_idx]
    h = (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16)  # sync, MPEG-1, L3, no CRC
    h |= (br_idx << 12) | (rate_idx << 10) | (padding << 9) | (mode << 6)
    n = 144 * kbps * 1000 // rate + padding
    body = payload if payload is not None else b"\x00" * (n - 4)
    return struct.pack(">I", h) + body[: n - 4]


def test_mpeg1_cbr_stream_exact():
    frames = 30
    data = b"".join(_mpeg1_l3_frame() for _ in range(frames))
    m = mpeg_audio_meta(data)
    assert m["format"] == "mpeg1-layer3"
    assert m["frames"] == frames
    assert m["sample_rate"] == 44100
    assert m["channels"] == 2
    assert m["samples_per_frame"] == 1152
    assert m["duration_s"] == pytest.approx(frames * 1152 / 44100)
    assert m["mean_kbps"] == 128.0 and m["vbr"] is False


def test_mpeg_vbr_and_padding_walk():
    # alternating bitrates + padding bits: the walk must follow each
    # frame's OWN length, and flag VBR
    data = b"".join(
        _mpeg1_l3_frame(kbps=(128 if i % 2 else 192), padding=i % 2)
        for i in range(20)
    )
    m = mpeg_audio_meta(data)
    assert m["frames"] == 20 and m["vbr"] is True
    assert m["mean_kbps"] == pytest.approx(160.0)


def test_id3v2_skip_and_trailing_tag():
    # syncsafe size 100 -> tag block of 110 bytes, then 5 frames, then
    # an ID3v1 trailer that must not be misread as a frame
    tag = b"ID3\x03\x00\x00" + bytes([0, 0, 0, 100]) + b"\x00" * 100
    data = tag + b"".join(_mpeg1_l3_frame() for _ in range(5)) + b"TAG" + b"\x00" * 125
    m = mpeg_audio_meta(data)
    assert m["id3v2_bytes"] == 110 and m["frames"] == 5


def test_false_sync_in_garbage_prefix():
    # 0xFF 0xFB in leading garbage parses as a header but its follower
    # does not confirm; the scan must land on the true first frame
    garbage = b"\x00\xff\xfb\x10\x00" + b"junk" * 3
    data = garbage + b"".join(_mpeg1_l3_frame() for _ in range(4))
    m = mpeg_audio_meta(data)
    assert m["frames"] == 4


def test_xing_header_detected():
    # MPEG-1 stereo side info = 32 bytes after the 4-byte header;
    # Xing tag with frames flag claims 99 frames
    payload = b"\x00" * 32 + b"Xing" + struct.pack(">I", 1) + struct.pack(">I", 99)
    first = _mpeg1_l3_frame(payload=payload + b"\x00" * 400)
    data = first + b"".join(_mpeg1_l3_frame() for _ in range(3))
    m = mpeg_audio_meta(data)
    assert m["xing"] == {"tag": "Xing", "frames": 99, "bytes": None}
    assert m["vbr"] is True  # Xing (not Info) tag implies VBR intent


def test_mono_mpeg2_frame():
    # MPEG-2 Layer III mono 64kbps 22050: 576 samples, 72-slot coef
    h = (0x7FF << 21) | (2 << 19) | (1 << 17) | (1 << 16) | (8 << 12) | (3 << 6)
    n = 72 * 64000 // 22050
    data = (struct.pack(">I", h) + b"\x00" * (n - 4)) * 7
    m = mpeg_audio_meta(data)
    assert m["format"] == "mpeg2-layer3" and m["channels"] == 1
    assert m["frames"] == 7 and m["samples_per_frame"] == 576


@pytest.mark.skipif(not os.path.exists(REAL_MP3), reason="real-world fixture absent")
def test_real_world_mp3_gsutil_fixture():
    """A real MPEG-2 Layer III file (gsutil test data, Apache-2.0):
    every field cross-checked by hand from the bitstream (frame header
    0xFFF380C4 at offset 32 after a 22-byte-payload ID3v2.3 tag)."""
    m = mpeg_audio_meta(open(REAL_MP3, "rb").read())
    assert m["format"] == "mpeg2-layer3"
    assert m["sample_rate"] == 22050 and m["channels"] == 1
    assert m["frames"] == 45 and m["mean_kbps"] == 64.0
    assert m["duration_s"] == pytest.approx(45 * 576 / 22050)
    assert m["vbr"] is False and m["id3v2_bytes"] == 32


def test_audio_metadata_operator(spark):
    from ezdata_spark.functions.flac_codec import encode_flac
    from ezdata_spark.functions.media_codecs import encode_wav
    from ezdata_spark.operators.multimodal import audio_metadata

    sr = 8000
    wave = (np.sin(np.linspace(0, 440 * 2 * np.pi, sr)) * 2**14).astype("int16")
    rows = [
        (0, bytearray(encode_wav(wave, sample_rate=sr))),
        (1, bytearray(encode_flac(wave, sample_rate=sr))),
        (2, bytearray(b"".join(_mpeg1_l3_frame() for _ in range(10)))),
        (3, bytearray(b"not audio at all")),
        (4, bytearray(b"RIFF\x10\x00\x00\x00WAVEjunk")),  # WAVE but no fmt
    ]
    df = spark.createDataFrame(rows, "media_id long, data binary")
    got = {r.media_id: r.asDict() for r in audio_metadata(df).collect()}
    assert got[0]["container"] == "wav" and got[0]["sample_rate"] == sr
    assert got[0]["duration_s"] == pytest.approx(1.0)
    assert got[1]["container"] == "flac" and got[1]["sample_rate"] == sr
    assert got[1]["duration_s"] == pytest.approx(1.0)
    assert got[2]["container"] == "mpeg1-layer3" and got[2]["n_frames"] == 10
    assert got[3]["meta_status"] == "unsupported"
    assert got[4]["meta_status"] == "error"
    assert all(got[i]["meta_status"] == "parsed" for i in (0, 1, 2))
