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


# ---------------------------------------------------------------------------
# Round 7: real sample tables + MJPEG sample decode (ISO/IEC 14496-12 §8.5-8.7)
# ---------------------------------------------------------------------------
# The round-6 skeleton wrote EMPTY stts/stsc/stsz/stco, so the container
# carried no samples and frame decode was an honest NotImplementedError.
# These writers/readers fill the boundary for Motion-JPEG: each video
# sample is a complete baseline JPEG image (the 'jpeg' VisualSampleEntry
# convention, same payload family as avicodec's '00dc' chunks), located
# via the real sample tables — stsz sizes, stco chunk offsets, stsc
# sample-to-chunk runs. Non-MJPEG codecs (avc1/hev1: NAL units needing an
# external decoder) remain NotImplementedError — the boundary moves from
# "mp4 frame decode" to "non-MJPEG mp4 codecs".


def _stbl_mjpeg(
    width: int, height: int, sizes: list[int], offsets: list[int], delta: int
) -> bytes:
    entry = _visual_sample_entry(b"jpeg", width, height)
    n = len(sizes)
    stsd = _full_box(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stts = _full_box(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
    # one chunk per sample: a single run (first_chunk=1, samples=1, sdi=1)
    stsc = _full_box(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, 1, 1))
    stsz = _full_box(
        b"stsz", 0, 0, struct.pack(">II", 0, n) + struct.pack(f">{n}I", *sizes)
    )
    stco = _full_box(
        b"stco", 0, 0, struct.pack(">I", n) + struct.pack(f">{n}I", *offsets)
    )
    return _box(b"stbl", stsd + stts + stsc + stsz + stco)


def encode_mp4_mjpeg(
    frames: list[bytes], width: int, height: int, *, fps: int = 10,
    timescale: int = 1000,
) -> bytes:
    """A real single-track Motion-JPEG mp4: ftyp + mdat (the concatenated
    JPEG samples) + moov whose sample tables locate each sample by
    absolute file offset. mdat precedes moov (a legal and common layout)
    so offsets are known without a fixup pass."""
    if not frames:
        raise ValueError("mp4 needs at least one frame")
    ftyp = _box(
        b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isom" + b"iso2" + b"mp41"
    )
    payload = b"".join(frames)
    mdat = _box(b"mdat", payload)
    base = len(ftyp) + 8  # first sample starts right after mdat's header
    sizes = [len(f) for f in frames]
    offsets = []
    off = base
    for s in sizes:
        offsets.append(off)
        off += s
    delta = max(1, timescale // fps)
    duration = len(frames) * delta
    vmhd = _full_box(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    minf = _box(
        b"minf",
        vmhd + _dinf() + _stbl_mjpeg(width, height, sizes, offsets, delta),
    )
    mdia = _box(
        b"mdia",
        _mdhd(timescale, duration)
        + _hdlr(b"vide", b"VideoHandler")
        + minf,
    )
    trak = _box(b"trak", _tkhd(1, duration, width, height) + mdia)
    moov = _box(b"moov", _mvhd(timescale, duration) + trak)
    return ftyp + mdat + moov


def _first_child(data: bytes, start: int, end: int, typ: bytes, depth: int):
    for t, ps, pe in _walk(data, start, end, depth):
        if t == typ:
            return ps, pe
    return None


def _read_u32s(data: bytes, off: int, end: int, n: int, width: int = 4):
    raw = _read(data, off, end, n * width)
    return [
        int.from_bytes(raw[i * width : (i + 1) * width], "big") for i in range(n)
    ]


def extract_mp4_video_samples(data: bytes) -> tuple[str, list[bytes]]:
    """Locate the first video track's samples via its real sample tables
    and return (codec_fourcc, [sample bytes...]). Pure container work —
    no sample is interpreted. Raises ValueError on malformed structure
    (fuzz contract: never an IndexError/struct.error escape)."""
    moov = _first_child(data, 0, len(data), b"moov", 0)
    if moov is None:
        raise ValueError("no moov box")
    for t, ps, pe in _walk(data, moov[0], moov[1], 1):
        if t != b"trak":
            continue
        mdia = _first_child(data, ps, pe, b"mdia", 2)
        if mdia is None:
            continue
        hdlr = _first_child(data, mdia[0], mdia[1], b"hdlr", 3)
        if hdlr is None:
            continue
        _, hoff = _full_header(data, *hdlr)
        if _read(data, hoff + 4, hdlr[1], 4) != b"vide":
            continue
        minf = _first_child(data, mdia[0], mdia[1], b"minf", 3)
        stbl = minf and _first_child(data, minf[0], minf[1], b"stbl", 4)
        if not stbl:
            raise ValueError("video track without stbl")
        boxes = {
            bt: (bs, be)
            for bt, bs, be in _walk(data, stbl[0], stbl[1], 5)
            if bt in (b"stsd", b"stsz", b"stsc", b"stco", b"co64")
        }
        for need in (b"stsd", b"stsz", b"stsc"):
            if need not in boxes:
                raise ValueError(f"video stbl missing {need.decode()}")
        if b"stco" not in boxes and b"co64" not in boxes:
            raise ValueError("video stbl missing chunk offsets")

        s, e = boxes[b"stsd"]
        _, off = _full_header(data, s, e)
        n_entries = int.from_bytes(_read(data, off, e, 4), "big")
        if n_entries < 1:
            raise ValueError("empty stsd")
        codec = None
        for etyp, _es, _ee in _walk(data, off + 4, e, 6):
            codec = etyp.decode("ascii", "replace")
            break
        if codec is None:
            raise ValueError("stsd without a sample entry")

        s, e = boxes[b"stsz"]
        _, off = _full_header(data, s, e)
        fixed, n_samples = _read_u32s(data, off, e, 2)
        if n_samples > 1_000_000:
            raise ValueError("implausible mp4 sample count")
        sizes = (
            [fixed] * n_samples
            if fixed
            else _read_u32s(data, off + 8, e, n_samples)
        )

        key = b"stco" if b"stco" in boxes else b"co64"
        s, e = boxes[key]
        _, off = _full_header(data, s, e)
        n_chunks = int.from_bytes(_read(data, off, e, 4), "big")
        if n_chunks > 1_000_000:
            raise ValueError("implausible mp4 chunk count")
        chunk_offsets = _read_u32s(
            data, off + 4, e, n_chunks, width=4 if key == b"stco" else 8
        )

        s, e = boxes[b"stsc"]
        _, off = _full_header(data, s, e)
        n_runs = int.from_bytes(_read(data, off, e, 4), "big")
        if n_runs > 1_000_000:
            raise ValueError("implausible stsc run count")
        runs = [
            tuple(_read_u32s(data, off + 4 + 12 * i, e, 3))
            for i in range(n_runs)
        ]
        if any(r[0] < 1 for r in runs) or [r[0] for r in runs] != sorted(
            {r[0] for r in runs}
        ):
            raise ValueError("stsc first_chunk not strictly increasing")

        # walk chunks in order; each chunk holds samples_per_chunk of the
        # run covering it, laid out consecutively from the chunk offset
        samples: list[bytes] = []
        si = 0
        ri = 0
        for ci in range(1, n_chunks + 1):
            while ri + 1 < len(runs) and runs[ri + 1][0] <= ci:
                ri += 1
            if not runs or runs[ri][0] > ci:
                raise ValueError(f"no stsc run covers chunk {ci}")
            spc = runs[ri][1]
            pos = chunk_offsets[ci - 1]
            for _ in range(spc):
                if si >= n_samples:
                    break
                size = sizes[si]
                if pos + size > len(data):
                    raise ValueError("mp4 sample extends past end of file")
                samples.append(data[pos : pos + size])
                pos += size
                si += 1
        if si != n_samples:
            raise ValueError(
                f"sample tables inconsistent: placed {si} of {n_samples}"
            )
        return codec, samples
    raise ValueError("no video track")


def decode_mp4_mjpeg_frames(data: bytes) -> list[bytes]:
    """Frame payloads of a Motion-JPEG mp4 (each a complete baseline JPEG
    bitstream, ready for jpegcodec.decode_jpeg_gray). Non-MJPEG codecs
    raise NotImplementedError — the honest external-decoder boundary."""
    codec, samples = extract_mp4_video_samples(data)
    if codec not in ("jpeg", "mjpg", "mjpa"):
        raise NotImplementedError(
            f"mp4 video codec {codec!r} requires external codec libs; "
            "only Motion-JPEG sample entries decode in-repo"
        )
    return samples


# ---------------------------------------------------------------------------
# Round 7b: avc1 + avcC — H.264 catalog metadata without frame decode
# ---------------------------------------------------------------------------


def encode_mp4_avc(
    width: int, height: int, *, timescale: int = 1000, duration: int = 1000,
    level_idc: int = 30,
) -> bytes:
    """An mp4 skeleton whose ``avc1`` sample entry carries a real avcC
    configuration box: the SPS codes EXACTLY (width, height) via the
    macroblock grid + frame cropping. No samples — this is the catalog
    shape (the moov alone identifies profile/level/true dimensions)."""
    from . import h264sps

    sps = h264sps.encode_sps(width, height, level_idc=level_idc)
    avcc = _box(b"avcC", h264sps.encode_avcc(sps))
    # VisualSampleEntry with the avcC appended as a child box; tkhd
    # carries the MB-rounded display size a naive writer would use —
    # the SPS is the truth a catalog must prefer
    entry_body = _visual_sample_entry(b"avc1", width, height)
    entry = entry_body[:4]
    entry = struct.pack(">I", len(entry_body) + len(avcc)) + entry_body[4:] + avcc
    stsd = _full_box(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stts = _full_box(b"stts", 0, 0, struct.pack(">I", 0))
    stsc = _full_box(b"stsc", 0, 0, struct.pack(">I", 0))
    stsz = _full_box(b"stsz", 0, 0, struct.pack(">II", 0, 0))
    stco = _full_box(b"stco", 0, 0, struct.pack(">I", 0))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = _full_box(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    minf = _box(b"minf", vmhd + _dinf() + stbl)
    mdia = _box(
        b"mdia",
        _mdhd(timescale, duration) + _hdlr(b"vide", b"VideoHandler") + minf,
    )
    trak = _box(b"trak", _tkhd(1, duration, width, height) + mdia)
    moov = _box(b"moov", _mvhd(timescale, duration) + trak)
    ftyp = _box(
        b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isom" + b"iso2" + b"mp41"
    )
    return ftyp + moov + _box(b"mdat", b"")


_VISUAL_ENTRY_FIELDS = 78  # VisualSampleEntry fixed fields before child boxes


def parse_mp4_avc_meta(data: bytes) -> dict:
    """Walk the container to the first avc1 sample entry's avcC box and
    parse its SPS: {profile_idc, level_idc, width, height, n_sps, n_pps}.
    The SPS-coded dimensions are authoritative (tkhd/sample-entry sizes
    are MB-rounded display hints in sloppy writers). Raises ValueError
    when no avc1+avcC track exists or the structure is malformed."""
    from . import h264sps

    moov = _first_child(data, 0, len(data), b"moov", 0)
    if moov is None:
        raise ValueError("no moov box")
    for t, ps, pe in _walk(data, moov[0], moov[1], 1):
        if t != b"trak":
            continue
        mdia = _first_child(data, ps, pe, b"mdia", 2)
        if mdia is None:
            continue
        minf = _first_child(data, mdia[0], mdia[1], b"minf", 3)
        stbl = minf and _first_child(data, minf[0], minf[1], b"stbl", 4)
        stsd = stbl and _first_child(data, stbl[0], stbl[1], b"stsd", 5)
        if not stsd:
            continue
        _, off = _full_header(data, *stsd)
        n = int.from_bytes(_read(data, off, stsd[1], 4), "big")
        if n < 1:
            continue
        for etyp, es, ee in _walk(data, off + 4, stsd[1], 6):
            if etyp != b"avc1":
                continue
            child_start = es + _VISUAL_ENTRY_FIELDS
            if child_start >= ee:
                raise ValueError("avc1 entry carries no configuration box")
            avcc = _first_child(data, child_start, ee, b"avcC", 7)
            if avcc is None:
                raise ValueError("avc1 entry without avcC")
            return h264sps.parse_avcc(data[avcc[0] : avcc[1]])
    raise ValueError("no avc1 video track")


def encode_mp4_hevc(
    width: int, height: int, *, timescale: int = 1000, duration: int = 1000,
    level_idc: int = 93,
) -> bytes:
    """The HEVC twin of ``encode_mp4_avc``: an mp4 skeleton whose
    ``hev1`` sample entry carries a real hvcC configuration box — the
    SPS codes EXACTLY (width, height) via luma samples + conformance
    window."""
    from . import h265sps

    sps = h265sps.encode_sps_hevc(width, height, level_idc=level_idc)
    hvcc = _box(b"hvcC", h265sps.encode_hvcc(sps))
    entry_body = _visual_sample_entry(b"hev1", width, height)
    entry = struct.pack(">I", len(entry_body) + len(hvcc)) + entry_body[4:] + hvcc
    stsd = _full_box(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stts = _full_box(b"stts", 0, 0, struct.pack(">I", 0))
    stsc = _full_box(b"stsc", 0, 0, struct.pack(">I", 0))
    stsz = _full_box(b"stsz", 0, 0, struct.pack(">II", 0, 0))
    stco = _full_box(b"stco", 0, 0, struct.pack(">I", 0))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = _full_box(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    minf = _box(b"minf", vmhd + _dinf() + stbl)
    mdia = _box(
        b"mdia",
        _mdhd(timescale, duration) + _hdlr(b"vide", b"VideoHandler") + minf,
    )
    trak = _box(b"trak", _tkhd(1, duration, width, height) + mdia)
    moov = _box(b"moov", _mvhd(timescale, duration) + trak)
    ftyp = _box(
        b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isom" + b"iso2" + b"mp41"
    )
    return ftyp + moov + _box(b"mdat", b"")


def parse_mp4_hevc_meta(data: bytes) -> dict:
    """Walk to the first hev1/hvc1 sample entry's hvcC box and parse its
    SPS: {profile_idc, level_idc, width, height, n_arrays}."""
    from . import h265sps

    moov = _first_child(data, 0, len(data), b"moov", 0)
    if moov is None:
        raise ValueError("no moov box")
    for t, ps, pe in _walk(data, moov[0], moov[1], 1):
        if t != b"trak":
            continue
        mdia = _first_child(data, ps, pe, b"mdia", 2)
        if mdia is None:
            continue
        minf = _first_child(data, mdia[0], mdia[1], b"minf", 3)
        stbl = minf and _first_child(data, minf[0], minf[1], b"stbl", 4)
        stsd = stbl and _first_child(data, stbl[0], stbl[1], b"stsd", 5)
        if not stsd:
            continue
        _, off = _full_header(data, *stsd)
        n = int.from_bytes(_read(data, off, stsd[1], 4), "big")
        if n < 1:
            continue
        for etyp, es, ee in _walk(data, off + 4, stsd[1], 6):
            if etyp not in (b"hev1", b"hvc1"):
                continue
            child_start = es + _VISUAL_ENTRY_FIELDS
            if child_start >= ee:
                raise ValueError("hev1 entry carries no configuration box")
            hvcc = _first_child(data, child_start, ee, b"hvcC", 7)
            if hvcc is None:
                raise ValueError("hev1 entry without hvcC")
            return h265sps.parse_hvcc(data[hvcc[0] : hvcc[1]])
    raise ValueError("no hev1/hvc1 video track")
