"""Pure-stdlib image/audio codecs for the multimodal operators.

The container has no PIL/ffmpeg/torchaudio, but PNG is fully specified on
top of ``zlib`` + ``struct`` (both stdlib) and WAV on top of the stdlib
``wave`` module — so the *decode* step of the multimodal pipeline can be
REAL, not a stub: we write genuine spec-conformant PNG/WAV bytes and parse
them back (magic bytes, IHDR chunk, zlib-compressed scanlines with PNG
filter reconstruction, RIFF/fmt headers).

Everything here is executor-side pure Python invoked from Arrow-batched
``mapInPandas`` iterators (see ``operators/multimodal.py``) — per-batch
Python cost, never per-row pickling, and the payloads stay in parquet
BINARY columns end to end.

Reference parity note: the reference pipeline (LDAClustering.scala) is
text-only; the multimodal surface is rebuild-contract scope (training-data
pipeline ops), not reference scope.
"""

from __future__ import annotations

import struct
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png_gray(width: int, height: int, row_values: list[int]) -> bytes:
    """Write a real 8-bit grayscale PNG where every pixel of row ``y`` has
    value ``row_values[y]`` (constant-per-row keeps the oracle arithmetic
    SQL-expressible while the bytes remain spec-conformant)."""
    if len(row_values) != height:
        raise ValueError("row_values must have one entry per row")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)  # gray, 8-bit
    raw = b"".join(b"\x00" + bytes([v % 256]) * width for v in row_values)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def sniff_format(data: bytes) -> str:
    """Magic-byte container sniff (png/jpeg/gif/bmp/wav/unknown)."""
    if data[:8] == _PNG_SIG:
        return "png"
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if data[:2] == b"BM":
        return "bmp"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return "avi"
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    if len(data) >= 12 and data[4:8] == b"ftyp":
        return "mp4"
    return "unknown"


def decode_png_meta(data: bytes) -> tuple[int, int, int, int]:
    """Parse the IHDR chunk → (width, height, bit_depth, color_type)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    length, tag = struct.unpack(">I4s", data[8:16])
    if tag != b"IHDR" or length != 13:
        raise ValueError("malformed PNG: first chunk is not IHDR")
    width, height, bit_depth, color_type = struct.unpack(">IIBB", data[16:26])
    return width, height, bit_depth, color_type


def decode_png_gray_pixels(data: bytes) -> list[list[int]]:
    """Full pixel decode for 8-bit grayscale PNGs: concatenate IDAT chunks,
    zlib-inflate, and reconstruct scanlines through the five PNG filter
    types (None/Sub/Up/Average/Paeth) per the spec."""
    width, height, bit_depth, color_type = decode_png_meta(data)
    if (bit_depth, color_type) != (8, 0):
        raise ValueError("only 8-bit grayscale supported by this decoder")
    idat = b""
    pos = 8
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        if tag == b"IDAT":
            idat += data[pos + 8 : pos + 8 + length]
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = width  # 1 byte/pixel
    if len(raw) != height * (stride + 1):
        # a corrupt-but-inflatable IDAT can yield the wrong scanline total;
        # the spec size is exact, so anything else is a damaged stream
        raise ValueError("PNG scanline data size mismatch")
    rows: list[list[int]] = []
    prev = [0] * stride
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = list(raw[off + 1 : off + 1 + stride])
        if ftype == 1:  # Sub
            for x in range(1, stride):
                line[x] = (line[x] + line[x - 1]) % 256
        elif ftype == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) % 256
        elif ftype == 3:  # Average
            for x in range(stride):
                left = line[x - 1] if x else 0
                line[x] = (line[x] + (left + prev[x]) // 2) % 256
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = line[x - 1] if x else 0
                b, c = prev[x], (prev[x - 1] if x else 0)
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                line[x] = (line[x] + pred) % 256
        elif ftype != 0:
            raise ValueError(f"bad PNG filter type {ftype}")
        rows.append(line)
        prev = line
    return rows


def encode_wav_mono16(n_samples: int, sample_rate: int) -> bytes:
    """Write a real RIFF/WAVE file (mono, 16-bit PCM) with a deterministic
    triangle-ish sample pattern, via the stdlib ``wave`` module."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        frames = b"".join(
            struct.pack("<h", ((i * 257) % 4096) - 2048) for i in range(n_samples)
        )
        w.writeframes(frames)
    return buf.getvalue()


def decode_wav_meta(data: bytes) -> tuple[int, int, int, int]:
    """Parse WAV → (n_channels, sample_width_bytes, sample_rate, n_frames)
    using the stdlib ``wave`` reader (real RIFF chunk parsing). The stdlib
    raises a bare RuntimeError on some corrupt chunk seeks — translated to
    ValueError here so malformed payloads fail with the codec-standard
    error class."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            return (
                w.getnchannels(),
                w.getsampwidth(),
                w.getframerate(),
                w.getnframes(),
            )
    except RuntimeError as e:
        raise ValueError(f"corrupt WAV stream: {e or 'chunk seek failed'}") from e


def encode_wav_sine(
    n_samples: int, sample_rate: int, cycles_per_window: int, window: int = 256
) -> bytes:
    """Real RIFF/WAVE mono 16-bit PCM carrying a pure sine with exactly
    ``cycles_per_window`` periods per ``window`` samples — so an FFT of
    one window puts (essentially) all energy in that bin. Deterministic:
    samples are round(12000·sin(2π·k·i/window)) quantized to int16."""
    import io
    import math
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        frames = b"".join(
            struct.pack(
                "<h",
                int(round(12000 * math.sin(2 * math.pi * cycles_per_window * i / window))),
            )
            for i in range(n_samples)
        )
        w.writeframes(frames)
    return buf.getvalue()
