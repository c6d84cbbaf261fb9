"""Pure-Python image codecs for the multimodal path.

Two real, widely-documented pixel formats that need no external library:

- **PPM (P6)** — the netpbm binary RGB format: ASCII header
  ``P6 <width> <height> <maxval>`` (whitespace-separated, ``#`` comments
  allowed) followed by one whitespace byte and ``3*w*h`` raw RGB bytes.
- **BMP (24-bit, BI_RGB)** — 14-byte file header + 40-byte
  ``BITMAPINFOHEADER``, pixel rows stored bottom-up in BGR order, each row
  zero-padded to a 4-byte boundary (top-down images — negative height — are
  also accepted on decode).

Both decoders return the SAME canonical shape ``(width, height, rgb_bytes)``
with ``rgb_bytes`` row-major top-down RGB, so downstream feature extraction
is format-agnostic. The encoders exist so fixtures can mint real payloads
from a deterministic pixel pattern that a SQL oracle can derive
independently — the decoder is checked against arithmetic, not against
itself.

At 100 TB these functions run only inside Arrow-batched ``mapInPandas``
stages: the codec cost is per-byte CPU with zero shuffle amplification, and
the binary column is pruned from every stage that doesn't decode.
"""

from __future__ import annotations

import struct

PPM_TYPE = "image/x-portable-pixmap"
BMP_TYPE = "image/bmp"

_WS = b" \t\r\n"


def test_pattern(doc_id: int, width: int, height: int) -> bytes:
    """Deterministic RGB test pattern: byte ``i`` of the row-major RGB buffer
    is ``(doc_id*31 + 7*i) % 256``. The correctness oracle recomputes channel
    sums of this pattern in SQL, which is what lets a DECODER be hash-checked
    without a reference decoder."""
    return bytes((doc_id * 31 + 7 * i) % 256 for i in range(3 * width * height))


# --- PPM (P6) ---------------------------------------------------------------


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    if len(rgb) != 3 * width * height:
        raise ValueError("rgb length does not match dimensions")
    return b"P6\n%d %d\n255\n" % (width, height) + rgb


def _ppm_tokens(payload: bytes, start: int, n: int) -> tuple[list[int], int]:
    """Read ``n`` whitespace-separated ASCII integers starting at ``start``,
    skipping ``#``-to-end-of-line comments. Returns (values, next_offset)."""
    vals: list[int] = []
    i = start
    while len(vals) < n:
        while i < len(payload) and payload[i : i + 1] in (b" ", b"\t", b"\r", b"\n"):
            i += 1
        if i < len(payload) and payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and payload[j : j + 1].isdigit():
            j += 1
        if j == i:
            raise ValueError(f"bad PPM header near byte {i}")
        vals.append(int(payload[i:j]))
        i = j
    return vals, i


def decode_ppm(payload: bytes) -> tuple[int, int, bytes]:
    if payload[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    (width, height, maxval), i = _ppm_tokens(payload, 2, 3)
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval} (8-bit only)")
    # Exactly one whitespace byte separates the header from the raster.
    if i >= len(payload) or payload[i : i + 1] not in (b" ", b"\t", b"\r", b"\n"):
        raise ValueError("missing whitespace before PPM raster")
    i += 1
    n = 3 * width * height
    if len(payload) - i < n:
        raise ValueError("truncated PPM raster")
    return width, height, payload[i : i + n]


# --- BMP (24-bit BI_RGB) ----------------------------------------------------


def _bmp_row_size(width: int) -> int:
    return (3 * width + 3) & ~3


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    if len(rgb) != 3 * width * height:
        raise ValueError("rgb length does not match dimensions")
    row_size = _bmp_row_size(width)
    image_size = row_size * height
    file_header = struct.pack("<2sIHHI", b"BM", 14 + 40 + image_size, 0, 0, 54)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, image_size, 2835, 2835, 0, 0
    )
    pad = b"\0" * (row_size - 3 * width)
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up storage order
        row = bytearray()
        base = 3 * width * y
        for x in range(width):
            r, g, b = rgb[base + 3 * x : base + 3 * x + 3]
            row += bytes((b, g, r))  # BGR on disk
        rows.append(bytes(row) + pad)
    return file_header + info_header + b"".join(rows)


def decode_bmp(payload: bytes) -> tuple[int, int, bytes]:
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    _, _, _, _, data_offset = struct.unpack_from("<2sIHHI", payload, 0)
    header_size, width, raw_height, planes, bpp, compression = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size {header_size}")
    if planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP variant (planes={planes}, bpp={bpp}, "
            f"compression={compression}); 24-bit BI_RGB only"
        )
    top_down = raw_height < 0
    height = -raw_height if top_down else raw_height
    row_size = _bmp_row_size(width)
    if len(payload) - data_offset < row_size * height:
        raise ValueError("truncated BMP raster")
    out = bytearray(3 * width * height)
    for y in range(height):
        src_y = y if top_down else height - 1 - y
        row_off = data_offset + src_y * row_size
        base = 3 * width * y
        for x in range(width):
            b, g, r = payload[row_off + 3 * x : row_off + 3 * x + 3]
            out[base + 3 * x : base + 3 * x + 3] = bytes((r, g, b))
    return width, height, bytes(out)


# --- WAV (PCM 16-bit mono) --------------------------------------------------

WAV_TYPE = "audio/wav"


def encode_wav(
    sample_rate: int,
    samples: list[int],
    extra_chunks: tuple[tuple[bytes, bytes], ...] = (),
) -> bytes:
    """RIFF/WAVE container around 16-bit little-endian mono PCM.

    ``extra_chunks`` (chunk-id, body) pairs are inserted between fmt and
    data — the LIST/INFO metadata real encoders emit — so fixtures can
    exercise the decoder's chunk walking, not just the happy layout."""
    pcm = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * 2
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, byte_rate, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    for cid, cbody in extra_chunks:
        body += cid + struct.pack("<I", len(cbody)) + cbody
        if len(cbody) % 2:
            body += b"\0"  # word alignment pad
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, list[int]]:
    """Decode RIFF/WAVE to (sample_rate, samples) by walking the chunk list —
    real WAV files carry extra chunks (LIST/INFO, fact, cue) in arbitrary
    order before data, so a fixed-offset slice is wrong; only chunk walking
    is. PCM 16-bit mono only; anything else is refused, not mis-sliced."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, 8 + struct.unpack_from("<I", payload, 4)[0]
    sample_rate = None
    pcm = None
    while pos + 8 <= min(end, len(payload)):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        if pos + 8 + size > len(payload):
            # A declared chunk size past the payload is a truncated file —
            # refuse, as the image decoders do ("truncated raster"); slicing
            # short here would silently return partial PCM as if whole.
            raise ValueError(
                f"truncated WAV: chunk {cid!r} declares {size} bytes, "
                f"payload has {len(payload) - pos - 8}"
            )
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError(f"short fmt chunk ({len(body)} bytes, need 16)")
            audio_fmt, channels, sample_rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV variant (fmt={audio_fmt}, ch={channels}, "
                    f"bits={bits}); PCM 16-bit mono only"
                )
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or pcm is None:
        raise ValueError("WAV missing fmt or data chunk")
    if len(pcm) % 2:
        raise ValueError("odd PCM byte length for 16-bit samples")
    return sample_rate, list(struct.unpack(f"<{len(pcm) // 2}h", pcm))


# --- dispatch ---------------------------------------------------------------

_DECODERS = {PPM_TYPE: decode_ppm, BMP_TYPE: decode_bmp}


def decode_image(payload: bytes, media_type: str) -> tuple[int, int, bytes]:
    """Decode a supported image payload to canonical (width, height, RGB)."""
    try:
        decoder = _DECODERS[media_type]
    except KeyError:
        raise NotImplementedError(
            f"no image decoder for {media_type!r}: video codecs need ffmpeg, "
            "which this container does not ship (audio/wav has its own "
            "decoder, decode_wav)"
        ) from None
    return decoder(payload)


# --- video (PPM frame stream) -----------------------------------------------

VIDEO_TYPE = "video/x-ppm-stream"
_VIDEO_MAGIC = b"VID0"


def encode_video(frames: list[tuple[int, int, bytes]]) -> bytes:
    """Minimal raw-video container: magic + frame count + concatenated P6
    frames (each frame is a complete, self-delimiting PPM — header declares
    its own raster length). The MJPEG idea with PPM in place of JPEG: real
    enough that a decoder must walk variable-length frames by parsing each
    header, which is the part a fixed-stride slicer gets wrong."""
    body = b"".join(encode_ppm(w, h, rgb) for w, h, rgb in frames)
    return _VIDEO_MAGIC + struct.pack("<I", len(frames)) + body


def decode_video(payload: bytes) -> list[tuple[int, int, bytes]]:
    """Decode the PPM frame stream by walking frames: parse each frame's own
    header for its dimensions, slice exactly its raster, continue at the
    next byte. Truncation anywhere raises (decode_ppm's raster check)."""
    if payload[:4] != _VIDEO_MAGIC:
        raise ValueError("not a VID0 PPM stream")
    if len(payload) < 8:
        raise ValueError("truncated VID0 header")
    n_frames = struct.unpack_from("<I", payload, 4)[0]
    frames: list[tuple[int, int, bytes]] = []
    pos = 8
    for _ in range(n_frames):
        if payload[pos : pos + 2] != b"P6":
            raise ValueError(f"frame {len(frames)}: not a P6 frame at byte {pos}")
        (w, h, maxval), i = _ppm_tokens(payload, pos + 2, 3)
        if maxval != 255:
            raise ValueError(f"unsupported PPM maxval {maxval}")
        # same contract as decode_ppm: exactly one whitespace byte separates
        # header from raster — a non-whitespace byte here would shift the
        # raster slice, so refuse rather than mis-decode
        if i >= len(payload) or payload[i : i + 1] not in (b" ", b"\t", b"\r", b"\n"):
            raise ValueError(f"frame {len(frames)}: missing whitespace before raster")
        i += 1
        n = 3 * w * h
        if len(payload) - i < n:
            raise ValueError(f"truncated frame {len(frames)}")
        frames.append((w, h, payload[i : i + n]))
        pos = i + n
    if pos != len(payload):
        raise ValueError(f"{len(payload) - pos} trailing bytes after last frame")
    return frames
