"""Minimal MJPEG-in-AVI container codec (pure stdlib struct, public spec).

Motion-JPEG video is just a sequence of independent baseline JPEG frames
inside a RIFF 'AVI ' container (Microsoft AVI spec + OpenDML): a 'hdrl'
LIST carrying the main ('avih') and stream ('strh'/'strf', fourcc MJPG)
headers, a 'movi' LIST whose '00dc' chunks are the compressed frames,
and an 'idx1' index. Combined with ``functions/jpegcodec.py`` this makes
the video frame-sampling operator REAL: the executor parses a genuine
video container and entropy-decodes genuine JPEG frames — no ffmpeg.

Writer emits a spec-conformant file; reader is a generic RIFF walker
that locates the 'movi' LIST and yields the '00dc'/'00db' frame payloads
in order (which is all a frame sampler needs — headers are validated but
sampling never trusts them over the actual chunk stream).

Reference parity note: the reference pipeline is text-only; this is
rebuild-contract scope (multimodal training-data columns).
"""

from __future__ import annotations

import struct


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""  # RIFF chunks are word-aligned
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Write an AVI file whose video stream is the given JPEG frames."""
    if not frames:
        raise ValueError("an AVI needs at least one frame")
    max_sz = max(len(f) for f in frames)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # microseconds per frame
        max_sz * fps,  # max bytes per second (approx)
        0,  # padding granularity
        0x10,  # flags: AVIF_HASINDEX
        len(frames),
        0,  # initial frames
        1,  # streams
        max_sz,  # suggested buffer size
        width,
        height,
        0, 0, 0, 0,  # reserved
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack("<10I", 0, 0, 0, 1, fps, 0, len(frames), max_sz, 0xFFFFFFFF, 0)
        + struct.pack("<4h", 0, 0, width, height)
    )
    strf = struct.pack(  # BITMAPINFOHEADER
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_payload = b"".join(_chunk(b"00dc", f) for f in frames)
    movi = _list(b"movi", movi_payload)
    # idx1 offsets are relative to the start of the 'movi' list type fourcc
    idx_entries = []
    off = 4
    for f in frames:
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    riff_payload = b"AVI " + hdrl + movi + idx1
    return _chunk(b"RIFF", riff_payload)


def decode_avi_meta(data: bytes) -> tuple[int, int, int, int]:
    """Parse the 'avih' header -> (width, height, n_frames, fps)."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI file")
    avih = _find_chunk(data, 12, len(data), b"avih")
    if avih is None or len(avih) < 56:
        raise ValueError("missing or truncated avih header")
    fields = struct.unpack("<14I", avih[:56])
    usec_per_frame, n_frames, width, height = fields[0], fields[4], fields[8], fields[9]
    fps = round(1_000_000 / usec_per_frame) if usec_per_frame else 0
    return width, height, n_frames, fps


def _find_chunk(data: bytes, pos: int, end: int, fourcc: bytes) -> bytes | None:
    """Depth-first RIFF walk for the first chunk with the given id."""
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if cid == fourcc:
            return body
        if cid == b"LIST":
            found = _find_chunk(data, pos + 12, pos + 8 + size, fourcc)
            if found is not None:
                return found
        pos += 8 + size + (size % 2)
    return None


def decode_avi_mjpeg_frames(data: bytes) -> list[bytes]:
    """Walk the RIFF tree to the 'movi' LIST and return the video frame
    payloads ('00dc'/'00db' chunks) in stream order."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI file")
    frames: list[bytes] = []

    def walk(pos: int, end: int, in_movi: bool) -> None:
        while pos + 8 <= end:
            cid = data[pos : pos + 4]
            (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            if cid == b"LIST":
                ltype = data[pos + 8 : pos + 12]
                walk(pos + 12, pos + 8 + size, in_movi or ltype == b"movi")
            elif in_movi and cid[2:4] in (b"dc", b"db"):
                frames.append(data[pos + 8 : pos + 8 + size])
            pos += 8 + size + (size % 2)

    walk(12, len(data), False)
    return frames
