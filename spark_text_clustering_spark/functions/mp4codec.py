"""Minimal ISO Base Media File Format (mp4) metadata codec — pure stdlib
struct, public spec (ISO/IEC 14496-12).

Round 6: moves the multimodal NotImplementedError boundary from "mp4"
to "mp4 frame decode". The writer emits a spec-shaped skeleton — ftyp,
moov(mvhd, trak(tkhd, mdia(mdhd, hdlr, minf(stbl(stsd ...))))), mdat —
and the reader is a generic length-prefixed box walker in the style of
``avicodec.py``'s RIFF walk: it recurses container boxes, handles
version-0/1 full boxes and 64-bit largesize headers, and extracts the
metadata a training-data pipeline catalogs per asset: brand, movie
timescale/duration, per-track handler + sample-entry fourcc +
dimensions. Frame/sample DECODE (avcC parsing, NAL units) is explicitly
out of scope — ``operators/multimodal.py::decode_real`` raises
NotImplementedError for it, honestly.

Reference parity note: the reference pipeline is text-only; this is
rebuild-contract scope (multimodal training-data columns).
"""

from __future__ import annotations

import struct

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}
_MAX_DEPTH = 16


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def _full_box(typ: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(typ, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + payload)


_UNITY_MATRIX = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)


def _mvhd(timescale: int, duration: int) -> bytes:
    p = struct.pack(">II", 0, 0)  # creation/modification
    p += struct.pack(">II", timescale, duration)
    p += struct.pack(">iHHII", 0x00010000, 0x0100, 0, 0, 0)  # rate, volume, rsvd
    p += _UNITY_MATRIX
    p += b"\x00" * 24  # pre_defined
    p += struct.pack(">I", 0xFFFFFFFF)  # next_track_ID
    return _full_box(b"mvhd", 0, 0, p)


def _tkhd(track_id: int, duration: int, width: int, height: int) -> bytes:
    p = struct.pack(">II", 0, 0)
    p += struct.pack(">III", track_id, 0, duration)
    p += b"\x00" * 8  # reserved
    p += struct.pack(">HHHH", 0, 0, 0x0100 if width == 0 else 0, 0)
    p += _UNITY_MATRIX
    p += struct.pack(">II", width << 16, height << 16)  # 16.16 fixed
    return _full_box(b"tkhd", 0, 7, p)  # flags: enabled | in_movie | in_preview


def _mdhd(timescale: int, duration: int) -> bytes:
    p = struct.pack(">II", 0, 0)
    p += struct.pack(">II", timescale, duration)
    # ISO-639-2 'und' packed as 3x5 bits + pad bit
    lang = 0
    for ch in b"und":
        lang = (lang << 5) | (ch - 0x60)
    p += struct.pack(">HH", lang, 0)
    return _full_box(b"mdhd", 0, 0, p)


def _hdlr(handler: bytes, name: bytes) -> bytes:
    p = struct.pack(">I", 0) + handler + b"\x00" * 12 + name + b"\x00"
    return _full_box(b"hdlr", 0, 0, p)


def _visual_sample_entry(fourcc: bytes, width: int, height: int) -> bytes:
    p = b"\x00" * 6 + struct.pack(">H", 1)  # reserved + data_reference_index
    p += b"\x00" * 16  # pre_defined / reserved
    p += struct.pack(">HH", width, height)
    p += struct.pack(">IIIH", 0x00480000, 0x00480000, 0, 1)  # dpi, rsvd, frames
    p += b"\x00" * 32  # compressorname (counted string, zeroed)
    p += struct.pack(">Hh", 24, -1)  # depth, pre_defined
    return _box(fourcc, p)


def _audio_sample_entry(fourcc: bytes, sample_rate: int) -> bytes:
    p = b"\x00" * 6 + struct.pack(">H", 1)
    p += b"\x00" * 8  # reserved
    p += struct.pack(">HHHHI", 2, 16, 0, 0, sample_rate << 16)
    return _box(fourcc, p)


def _stbl(sample_entry: bytes) -> bytes:
    stsd = _full_box(b"stsd", 0, 0, struct.pack(">I", 1) + sample_entry)
    stts = _full_box(b"stts", 0, 0, struct.pack(">I", 0))
    stsc = _full_box(b"stsc", 0, 0, struct.pack(">I", 0))
    stsz = _full_box(b"stsz", 0, 0, struct.pack(">II", 0, 0))
    stco = _full_box(b"stco", 0, 0, struct.pack(">I", 0))
    return _box(b"stbl", stsd + stts + stsc + stsz + stco)


def _dinf() -> bytes:
    url = _full_box(b"url ", 0, 1, b"")  # flag 1: data in this file
    dref = _full_box(b"dref", 0, 0, struct.pack(">I", 1) + url)
    return _box(b"dinf", dref)


def _trak(
    track_id: int,
    duration: int,
    handler: bytes,
    fourcc: bytes,
    width: int,
    height: int,
    media_timescale: int,
    media_duration: int,
) -> bytes:
    if handler == b"vide":
        header = _full_box(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
        entry = _visual_sample_entry(fourcc, width, height)
        name = b"VideoHandler"
    else:
        header = _full_box(b"smhd", 0, 0, struct.pack(">hH", 0, 0))
        entry = _audio_sample_entry(fourcc, 44100)
        name = b"SoundHandler"
    minf = _box(b"minf", header + _dinf() + _stbl(entry))
    mdia = _box(b"mdia", _mdhd(media_timescale, media_duration) + _hdlr(handler, name) + minf)
    return _box(b"trak", _tkhd(track_id, duration, width, height) + mdia)


def encode_mp4_skeleton(
    *,
    timescale: int,
    duration: int,
    video: tuple[bytes, int, int] | None = ("avc1", 0, 0),
    audio_fourcc: bytes | None = None,
    media_timescale: int | None = None,
) -> bytes:
    """Spec-shaped mp4 metadata skeleton: ftyp + moov + tiny mdat.

    ``video`` is (fourcc, width, height); ``audio_fourcc`` adds a second
    (sound) track. Durations are in movie-``timescale`` units; media
    durations reuse the movie duration rescaled to ``media_timescale``
    (defaults to the movie timescale, keeping everything integer)."""
    mts = media_timescale or timescale
    media_dur = duration * mts // timescale
    ftyp = _box(
        b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isom" + b"iso2" + b"mp41"
    )
    traks = b""
    tid = 1
    if video is not None:
        fourcc, w, h = video
        fourcc = fourcc.encode() if isinstance(fourcc, str) else fourcc
        traks += _trak(tid, duration, b"vide", fourcc, w, h, mts, media_dur)
        tid += 1
    if audio_fourcc is not None:
        fc = audio_fourcc.encode() if isinstance(audio_fourcc, str) else audio_fourcc
        traks += _trak(tid, duration, b"soun", fc, 0, 0, mts, media_dur)
    moov = _box(b"moov", _mvhd(timescale, duration) + traks)
    mdat = _box(b"mdat", b"\x00" * 16)
    return ftyp + moov + mdat


def _walk(data: bytes, start: int, end: int, depth: int = 0):
    """Yield (type, payload_start, payload_end) for each box in
    [start, end); recursion is the caller's job (see parse_mp4_meta)."""
    if depth > _MAX_DEPTH:
        raise ValueError("mp4 box nesting exceeds sanity depth")
    off = start
    while off < end:
        if off + 8 > end:
            raise ValueError("truncated mp4 box header")
        size = int.from_bytes(data[off : off + 4], "big")
        typ = bytes(data[off + 4 : off + 8])
        hdr = 8
        if size == 1:  # 64-bit largesize
            if off + 16 > end:
                raise ValueError("truncated mp4 largesize header")
            size = int.from_bytes(data[off + 8 : off + 16], "big")
            hdr = 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - off
        if size < hdr or off + size > end:
            raise ValueError(f"bad mp4 box size {size} for {typ!r}")
        yield typ, off + hdr, off + size
        off += size


def _full_header(data: bytes, start: int, end: int) -> tuple[int, int]:
    if start + 4 > end:
        raise ValueError("truncated mp4 full box")
    return data[start], start + 4


def _read(data: bytes, off: int, end: int, n: int) -> bytes:
    if off + n > end:
        raise ValueError("truncated mp4 field")
    return data[off : off + n]


def parse_mp4_meta(data: bytes) -> dict:
    """Walk the box tree and return the catalog-level metadata:
    {major_brand, timescale, duration, tracks: [{track_id, handler,
    codec, width, height, media_timescale, media_duration}]}.
    Handles version-0 and version-1 mvhd/tkhd/mdhd. Raises ValueError on
    malformed/truncated structure; never decodes samples."""
    if len(data) < 8:
        raise ValueError("too short for an mp4")
    meta: dict = {"major_brand": None, "timescale": None, "duration": None,
                  "tracks": []}

    def parse_container(start: int, end: int, depth: int, track: dict | None):
        for typ, ps, pe in _walk(data, start, end, depth):
            if typ == b"ftyp":
                meta["major_brand"] = _read(data, ps, pe, 4).decode(
                    "ascii", "replace"
                )
            elif typ == b"mvhd":
                v, off = _full_header(data, ps, pe)
                if v == 1:
                    raw = _read(data, off, pe, 28)
                    meta["timescale"] = int.from_bytes(raw[16:20], "big")
                    meta["duration"] = int.from_bytes(raw[20:28], "big")
                else:
                    raw = _read(data, off, pe, 16)
                    meta["timescale"] = int.from_bytes(raw[8:12], "big")
                    meta["duration"] = int.from_bytes(raw[12:16], "big")
            elif typ == b"trak":
                t: dict = {"track_id": None, "handler": None, "codec": None,
                           "width": None, "height": None,
                           "media_timescale": None, "media_duration": None}
                parse_container(ps, pe, depth + 1, t)
                meta["tracks"].append(t)
            elif typ == b"tkhd" and track is not None:
                v, off = _full_header(data, ps, pe)
                if v == 1:
                    raw = _read(data, off, pe, 32)
                    track["track_id"] = int.from_bytes(raw[16:20], "big")
                    body_off = off + 32
                else:
                    raw = _read(data, off, pe, 20)
                    track["track_id"] = int.from_bytes(raw[8:12], "big")
                    body_off = off + 20
                # reserved(8) layer(2) alt_group(2) volume(2) rsvd(2)
                # matrix(36) = 52 bytes between duration and width
                wh = _read(data, body_off + 52, pe, 8)
                track["width"] = int.from_bytes(wh[0:4], "big") >> 16
                track["height"] = int.from_bytes(wh[4:8], "big") >> 16
            elif typ == b"mdhd" and track is not None:
                v, off = _full_header(data, ps, pe)
                if v == 1:
                    raw = _read(data, off, pe, 28)
                    track["media_timescale"] = int.from_bytes(raw[16:20], "big")
                    track["media_duration"] = int.from_bytes(raw[20:28], "big")
                else:
                    raw = _read(data, off, pe, 16)
                    track["media_timescale"] = int.from_bytes(raw[8:12], "big")
                    track["media_duration"] = int.from_bytes(raw[12:16], "big")
            elif typ == b"hdlr" and track is not None:
                _, off = _full_header(data, ps, pe)
                track["handler"] = _read(data, off + 4, pe, 4).decode(
                    "ascii", "replace"
                )
            elif typ == b"stsd" and track is not None:
                _, off = _full_header(data, ps, pe)
                n = int.from_bytes(_read(data, off, pe, 4), "big")
                if n >= 1:
                    for etyp, _es, _ee in _walk(data, off + 4, pe, depth + 1):
                        track["codec"] = etyp.decode("ascii", "replace")
                        break
            elif typ in _CONTAINERS:
                parse_container(ps, pe, depth + 1, track)

    parse_container(0, len(data), 0, None)
    if meta["timescale"] is None:
        raise ValueError("no mvhd box: not a movie file")
    return meta
