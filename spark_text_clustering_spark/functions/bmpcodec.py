"""Pure-numpy/stdlib Windows BMP codec (round 5) — 24-bit uncompressed
DIB (BITMAPINFOHEADER), the simplest widely-used raster container:
bottom-up BGR rows padded to 4-byte boundaries, no compression
(BI_RGB). Completes the in-repo codec suite next to PNG/JPEG/GIF/AVI
(functions/imagecodec.py, jpegcodec.py, gifcodec.py, avicodec.py).

Spec: the public BITMAPFILEHEADER/BITMAPINFOHEADER layout (Windows GDI
documentation). Truncated or malformed streams raise ValueError, never
IndexError — the same contract as the sibling codecs.
"""

from __future__ import annotations

import struct

import numpy as np

_FILE_HDR = 14  # BITMAPFILEHEADER
_INFO_HDR = 40  # BITMAPINFOHEADER


def encode_bmp24(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit BI_RGB BMP bytes (bottom-up BGR rows,
    4-byte row padding)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_bmp24 expects an (h, w, 3) array")
    h, w, _ = px.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    # RGB -> BGR, bottom-up
    bgr = px[::-1, :, ::-1]
    body = bytearray()
    zeros = b"\x00" * pad
    for row in bgr:
        body += row.tobytes() + zeros
    pixel_offset = _FILE_HDR + _INFO_HDR
    file_size = pixel_offset + len(body)
    file_hdr = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, pixel_offset)
    info_hdr = struct.pack(
        "<IiiHHIIiiII",
        _INFO_HDR,  # biSize
        w,  # biWidth
        h,  # biHeight (positive: bottom-up)
        1,  # biPlanes
        24,  # biBitCount
        0,  # biCompression = BI_RGB
        len(body),  # biSizeImage
        2835,  # biXPelsPerMeter (72 DPI)
        2835,  # biYPelsPerMeter
        0,  # biClrUsed
        0,  # biClrImportant
    )
    return file_hdr + info_hdr + bytes(body)


def decode_bmp24(data: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP bytes -> (h, w, 3) uint8 RGB array. Handles both
    bottom-up (positive biHeight) and top-down (negative) row orders."""
    if len(data) < _FILE_HDR + _INFO_HDR:
        raise ValueError("truncated BMP: missing headers")
    magic, _file_size, _r1, _r2, pixel_offset = struct.unpack(
        "<2sIHHI", data[:_FILE_HDR]
    )
    if magic != b"BM":
        raise ValueError("not a BMP (missing BM magic)")
    (
        bi_size,
        w,
        h_signed,
        planes,
        bpp,
        compression,
        _size_image,
        _xppm,
        _yppm,
        _clr_used,
        _clr_imp,
    ) = struct.unpack("<IiiHHIIiiII", data[_FILE_HDR : _FILE_HDR + _INFO_HDR])
    if bi_size < _INFO_HDR:
        raise ValueError("unsupported BMP header (BITMAPCOREHEADER)")
    if planes != 1:
        raise ValueError("BMP planes must be 1")
    if bpp != 24:
        raise ValueError(f"only 24-bit BMP supported (got {bpp}-bit)")
    if compression != 0:
        raise ValueError("only BI_RGB (uncompressed) BMP supported")
    top_down = h_signed < 0
    h = -h_signed if top_down else h_signed
    if w <= 0 or h <= 0:
        raise ValueError("invalid BMP dimensions")
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    need = pixel_offset + stride * h
    if len(data) < need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(
        data, dtype=np.uint8, count=stride * h, offset=pixel_offset
    ).reshape(h, stride)[:, :row_bytes]
    bgr = rows.reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    if not top_down:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)
