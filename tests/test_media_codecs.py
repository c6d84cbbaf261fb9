"""Unit tests for the pure-Python image codecs (functions/media_codecs.py):
the decoders must parse real on-disk layouts — PPM comment headers, BMP
bottom-up BGR rows with 4-byte padding, top-down negative-height BMPs — and
the resize sampler must match its closed form. The oracle-diff suite checks
the Spark-side chain end-to-end; these pin the codec internals directly."""

from __future__ import annotations

import struct

import pytest

from eviction_lab_etl_spark.functions import media_codecs as mc
from eviction_lab_etl_spark.operators.multimodal import _resize_nn, decode_media


@pytest.mark.parametrize("width", range(1, 9))  # covers every 3*w % 4 residue
@pytest.mark.parametrize("height", [1, 2, 5])
def test_roundtrip_both_formats(width, height):
    rgb = mc.test_pattern(17, width, height)
    assert mc.decode_ppm(mc.encode_ppm(width, height, rgb)) == (width, height, rgb)
    assert mc.decode_bmp(mc.encode_bmp(width, height, rgb)) == (width, height, rgb)


def test_ppm_header_with_comments_and_whitespace():
    rgb = mc.test_pattern(9, 3, 2)
    payload = b"P6\n# made by a real tool\n 3\t2 # dims\n255\n" + rgb
    assert mc.decode_ppm(payload) == (3, 2, rgb)


def test_bmp_top_down_negative_height():
    w, h = 3, 2
    rgb = mc.test_pattern(5, w, h)
    bmp = mc.encode_bmp(w, h, rgb)
    row_size = (3 * w + 3) & ~3
    rows = [bmp[54 + i * row_size : 54 + (i + 1) * row_size] for i in range(h)]
    top_down = bmp[:22] + struct.pack("<i", -h) + bmp[26:54] + b"".join(
        reversed(rows)
    )
    assert mc.decode_bmp(top_down) == (w, h, rgb)


def test_decode_rejects_malformed_payloads():
    with pytest.raises(ValueError):
        mc.decode_ppm(b"P5\n1 1\n255\n\0\0\0")  # P5 is grayscale, not P6
    with pytest.raises(ValueError):
        mc.decode_ppm(b"P6\n1 1\n65535\n" + b"\0" * 6)  # 16-bit maxval
    with pytest.raises(ValueError):
        mc.decode_ppm(b"P6\n2 2\n255\n\0\0\0")  # truncated raster
    with pytest.raises(ValueError):
        mc.decode_bmp(b"XX" + b"\0" * 60)  # bad magic
    with pytest.raises(ValueError):
        # 8-bit BMP variant must be refused, not mis-sliced
        good = bytearray(mc.encode_bmp(2, 2, mc.test_pattern(1, 2, 2)))
        good[28:30] = struct.pack("<H", 8)
        mc.decode_bmp(bytes(good))
    with pytest.raises(NotImplementedError):
        mc.decode_image(b"\0\0\0\0", "audio/wav")


def test_decode_media_feature_vector():
    w, h = 4, 3
    rgb = mc.test_pattern(2, w, h)
    feats = decode_media(mc.encode_ppm(w, h, rgb), mc.PPM_TYPE)
    assert len(feats) == 5
    assert feats[0] == float(w) and feats[1] == float(h)
    n = w * h
    for c in range(3):
        expected = sum(rgb[i] for i in range(c, 3 * n, 3)) / (255.0 * n)
        assert feats[2 + c] == pytest.approx(expected)
    # identical pixels through the BMP path must give identical features
    assert decode_media(mc.encode_bmp(w, h, rgb), mc.BMP_TYPE) == feats


def test_resize_nn_matches_closed_form():
    w, h, tw, th = 13, 7, 6, 3
    rgb = mc.test_pattern(11, w, h)
    small = _resize_nn(w, h, rgb, tw, th)
    assert len(small) == 3 * tw * th
    for y in range(th):
        for x in range(tw):
            si = 3 * (w * ((y * h) // th) + (x * w) // tw)
            assert small[3 * (tw * y + x) : 3 * (tw * y + x) + 3] == rgb[si : si + 3]


def test_wav_roundtrip_and_chunk_walking():
    samples = [((7 * i * 7919) % 65536) - 32768 for i in range(37)]
    plain = mc.encode_wav(16000, samples)
    assert mc.decode_wav(plain) == (16000, samples)
    # LIST/INFO chunk (odd-length body → word-alignment pad) before data:
    # a fixed-offset decoder would mis-slice; the chunk walker must not
    info = mc.encode_wav(16000, samples, ((b"LIST", b"INFOIART\x03\x00\x00\x00ab"),))
    assert mc.decode_wav(info) == (16000, samples)


def test_wav_rejects_malformed():
    samples = [0, 1, -1]
    good = bytearray(mc.encode_wav(8000, samples))
    with pytest.raises(ValueError):
        mc.decode_wav(b"RIFX" + bytes(good[4:]))  # bad magic
    stereo = bytearray(good)
    stereo[22:24] = struct.pack("<H", 2)  # channels=2 must be refused
    with pytest.raises(ValueError):
        mc.decode_wav(bytes(stereo))
    f32 = bytearray(good)
    f32[20:22] = struct.pack("<H", 3)  # IEEE float fmt must be refused
    with pytest.raises(ValueError):
        mc.decode_wav(bytes(f32))
    with pytest.raises(ValueError):
        mc.decode_wav(good[:12])  # no chunks at all


def test_wav_truncated_data_chunk_refused():
    from eviction_lab_etl_spark.functions.media_codecs import decode_wav, encode_wav

    whole = encode_wav(8000, [1, -2, 3, -4, 5, -6])
    # cut mid-data: declared chunk size now extends past the payload
    truncated = whole[: len(whole) - 4]
    with pytest.raises(ValueError, match="truncated WAV"):
        decode_wav(truncated)


def test_wav_short_fmt_chunk_raises_valueerror_not_struct_error():
    import struct

    from eviction_lab_etl_spark.functions.media_codecs import decode_wav

    fmt_body = b"\x01\x00\x01\x00"  # 4 bytes, need 16
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="short fmt chunk"):
        decode_wav(payload)


def test_video_roundtrip_and_truncation():
    from eviction_lab_etl_spark.functions.media_codecs import (
        decode_video,
        encode_video,
        test_pattern,
    )

    frames = [(3, 2, test_pattern(7, 3, 2)), (5, 1, test_pattern(8, 5, 1))]
    payload = encode_video(frames)
    assert decode_video(payload) == frames
    with pytest.raises(ValueError, match="truncated frame"):
        decode_video(payload[:-3])
    with pytest.raises(ValueError, match="trailing bytes"):
        decode_video(payload + b"x")
    with pytest.raises(ValueError, match="not a VID0"):
        decode_video(b"RIFF1234")


def test_video_header_and_separator_hardening():
    from eviction_lab_etl_spark.functions.media_codecs import decode_video

    with pytest.raises(ValueError, match="truncated VID0 header"):
        decode_video(b"VID0\x02\x00")
    # non-whitespace byte between maxval and raster: refuse, don't mis-slice
    bad = b"VID0" + b"\x01\x00\x00\x00" + b"P6\n1 1\n255X" + b"\x01\x02\x03\x04"
    with pytest.raises(ValueError, match="missing whitespace"):
        decode_video(bad)


def test_static_run_video_mint_matches_closed_form():
    """The keyframe fixture's planted structure, checked in pure python (no
    Spark): consecutive frames inside a run are byte-identical, and frames
    differ exactly at multiples of run — the set the oracle declares."""
    from eviction_lab_etl_spark.functions.media_codecs import decode_video
    from eviction_lab_etl_spark.operators.multimodal import (
        _mint_video_payload_static,
    )

    for doc_id in range(0, 40):
        run = doc_id % 3 + 1
        frames = decode_video(_mint_video_payload_static(doc_id))
        assert len(frames) == doc_id % 6 + 2
        for f in range(1, len(frames)):
            same = frames[f][2] == frames[f - 1][2]
            assert same == (f % run != 0), (doc_id, f, run)
