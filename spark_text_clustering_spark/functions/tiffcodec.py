"""Pure-numpy/stdlib TIFF 6.0 baseline codec (round 5) — seventh in-repo
codec next to PNG/JPEG/GIF/AVI/WAV/BMP. Scope: 8-bit grayscale and RGB,
Compression = 1 (none) or 32773 (PackBits), strip-based layout with
arbitrary RowsPerStrip, both byte orders on decode (II little-endian and
MM big-endian); the encoder emits little-endian.

Spec: the public TIFF 6.0 specification (Adobe, 1992) — image file
header, single IFD, baseline tags 256/257/258/259/262/273/277/278/279 —
and its PackBits appendix (run lengths in [-127, -1] repeat, [0, 127]
literal, -128 no-op). Truncated or malformed streams raise ValueError,
never IndexError — the same contract as the sibling codecs
(functions/bmpcodec.py etc.), enforced by the shared decoder fuzz sweep.
"""

from __future__ import annotations

import struct

import numpy as np

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SAMPLES = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279

_COMP_NONE = 1
_COMP_PACKBITS = 32773

# field type -> byte size (only the ones the baseline uses)
_TYPE_SIZES = {1: 1, 3: 2, 4: 4}


def packbits_encode(row: bytes) -> bytes:
    """PackBits-compress one byte string (TIFF 6.0 appendix). Greedy:
    runs of >=2 identical bytes become replicate packets, everything else
    literal packets of <=128 bytes."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        # find run length at i
        run = 1
        while i + run < n and run < 128 and row[i + run] == row[i]:
            run += 1
        if run >= 2:
            out.append(257 - run)  # -(run-1) as unsigned
            out.append(row[i])
            i += run
            continue
        # literal: scan forward until a run of >=3 starts (2-runs inside a
        # literal are cheaper left literal) or 128 bytes collected
        start = i
        i += 1
        while i < n and (i - start) < 128:
            if i + 2 < n and row[i] == row[i + 1] == row[i + 2]:
                break
            if i + 1 < n and row[i] == row[i + 1] and i + 2 >= n:
                break
            i += 1
        lit = row[start:i]
        out.append(len(lit) - 1)
        out += lit
    return bytes(out)


def packbits_decode(data: bytes, expected: int) -> bytes:
    """Decompress PackBits to exactly ``expected`` bytes; raise ValueError
    on truncation or output-size mismatch."""
    out = bytearray()
    i, n = 0, len(data)
    while len(out) < expected:
        if i >= n:
            raise ValueError("truncated PackBits stream")
        ctrl = data[i]
        i += 1
        if ctrl == 128:  # no-op
            continue
        if ctrl < 128:  # literal of ctrl+1 bytes
            if i + ctrl + 1 > n:
                raise ValueError("truncated PackBits literal")
            out += data[i : i + ctrl + 1]
            i += ctrl + 1
        else:  # replicate next byte 257-ctrl times
            if i >= n:
                raise ValueError("truncated PackBits replicate")
            out += bytes([data[i]]) * (257 - ctrl)
            i += 1
    if len(out) != expected:
        raise ValueError("PackBits output overruns expected strip size")
    return bytes(out)


def encode_tiff(
    pixels: np.ndarray, *, packbits: bool = True, rows_per_strip: int = 2
) -> bytes:
    """(h, w) uint8 gray or (h, w, 3) uint8 RGB -> little-endian TIFF
    bytes, strip layout with the given RowsPerStrip, PackBits-compressed
    unless ``packbits=False``."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        spp, photometric = 1, 1  # BlackIsZero
    elif px.ndim == 3 and px.shape[2] == 3:
        spp, photometric = 3, 2  # RGB
    else:
        raise ValueError("encode_tiff expects (h, w) or (h, w, 3) uint8")
    h, w = px.shape[0], px.shape[1]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    rows_per_strip = max(1, min(int(rows_per_strip), h))
    raw = px.reshape(h, w * spp)
    strips = []
    for y0 in range(0, h, rows_per_strip):
        rows = raw[y0 : y0 + rows_per_strip]
        if packbits:
            # TIFF 6.0 §9: "When PackBits data is decompressed ... do not
            # compress across row boundaries" — each row is packed
            # independently and the per-row streams concatenated, so a
            # replicate/literal packet never spans two rows and strict
            # external decoders that reset per row stay in sync
            # (round-6 ADVICE fix; previously whole strips were packed).
            strips.append(b"".join(packbits_encode(r.tobytes()) for r in rows))
        else:
            strips.append(rows.tobytes())
    n_strips = len(strips)

    # layout: header(8) | IFD | [bits extra for RGB] | offsets/counts arrays | strips
    n_entries = 9
    ifd_size = 2 + n_entries * 12 + 4
    pos = 8 + ifd_size
    extra = bytearray()

    def _alloc(nbytes: int) -> int:
        nonlocal pos
        off = pos
        pos += nbytes
        return off

    # BitsPerSample: 3 SHORTs for RGB do not fit inline
    if spp == 3:
        bits_off = _alloc(6)
        extra += struct.pack("<3H", 8, 8, 8)
    if n_strips > 1:
        offsets_off = _alloc(4 * n_strips)
        counts_off = _alloc(4 * n_strips)
    strip_base = pos
    offs, here = [], strip_base
    for s in strips:
        offs.append(here)
        here += len(s)

    entries = []

    def _entry(tag, ftype, count, value):
        entries.append(struct.pack("<HHI", tag, ftype, count) + value)

    def _short(v):
        return struct.pack("<HH", v, 0)

    def _long(v):
        return struct.pack("<I", v)

    _entry(_TAG_WIDTH, 4, 1, _long(w))
    _entry(_TAG_HEIGHT, 4, 1, _long(h))
    if spp == 3:
        _entry(_TAG_BITS, 3, 3, _long(bits_off))
    else:
        _entry(_TAG_BITS, 3, 1, _short(8))
    _entry(_TAG_COMPRESSION, 3, 1, _short(_COMP_PACKBITS if packbits else _COMP_NONE))
    _entry(_TAG_PHOTOMETRIC, 3, 1, _short(photometric))
    if n_strips > 1:
        _entry(_TAG_STRIP_OFFSETS, 4, n_strips, _long(offsets_off))
    else:
        _entry(_TAG_STRIP_OFFSETS, 4, 1, _long(offs[0]))
    _entry(_TAG_SAMPLES, 3, 1, _short(spp))
    _entry(_TAG_ROWS_PER_STRIP, 4, 1, _long(rows_per_strip))
    if n_strips > 1:
        _entry(_TAG_STRIP_COUNTS, 4, n_strips, _long(counts_off))
    else:
        _entry(_TAG_STRIP_COUNTS, 4, 1, _long(len(strips[0])))

    if n_strips > 1:
        extra += struct.pack(f"<{n_strips}I", *offs)
        extra += struct.pack(f"<{n_strips}I", *(len(s) for s in strips))

    out = bytearray()
    out += struct.pack("<2sHI", b"II", 42, 8)
    out += struct.pack("<H", n_entries)
    for e in sorted(entries, key=lambda e: struct.unpack("<H", e[:2])[0]):
        out += e
    out += struct.pack("<I", 0)  # next IFD
    out += extra
    for s in strips:
        out += s
    return bytes(out)


def _read_values(data: bytes, bo: str, ftype: int, count: int, raw: bytes):
    """Resolve one IFD entry's value list (inline if it fits in 4 bytes,
    else at the encoded offset)."""
    size = _TYPE_SIZES.get(ftype)
    if size is None:
        raise ValueError(f"unsupported TIFF field type {ftype}")
    total = size * count
    if total <= 4:
        buf = raw[:total]
    else:
        (off,) = struct.unpack(bo + "I", raw)
        if off + total > len(data):
            raise ValueError("TIFF value offset out of bounds")
        buf = data[off : off + total]
    fmt = {1: "B", 3: "H", 4: "I"}[ftype]
    return list(struct.unpack(bo + fmt * count, buf))


def decode_tiff(data: bytes) -> np.ndarray:
    """TIFF bytes -> (h, w) or (h, w, 3) uint8 array. Supports II/MM byte
    order, 8-bit gray/RGB, none/PackBits compression, multi-strip."""
    if len(data) < 8:
        raise ValueError("truncated TIFF: missing header")
    order = data[:2]
    if order == b"II":
        bo = "<"
    elif order == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF (bad byte-order mark)")
    magic, ifd_off = struct.unpack(bo + "HI", data[2:8])
    if magic != 42:
        raise ValueError("not a TIFF (magic != 42)")
    if ifd_off + 2 > len(data):
        raise ValueError("TIFF IFD offset out of bounds")
    (n_entries,) = struct.unpack(bo + "H", data[ifd_off : ifd_off + 2])
    end = ifd_off + 2 + n_entries * 12
    if end + 4 > len(data):
        raise ValueError("truncated TIFF IFD")
    tags: dict[int, list[int]] = {}
    for k in range(n_entries):
        base = ifd_off + 2 + k * 12
        tag, ftype, count = struct.unpack(bo + "HHI", data[base : base + 8])
        if count > len(data):
            raise ValueError("TIFF entry count out of bounds")
        tags[tag] = _read_values(data, bo, ftype, count, data[base + 8 : base + 12])

    def _one(tag, default=None):
        if tag in tags:
            if len(tags[tag]) != 1:
                raise ValueError(f"TIFF tag {tag}: expected a single value")
            return tags[tag][0]
        if default is None:
            raise ValueError(f"TIFF missing required tag {tag}")
        return default

    w = _one(_TAG_WIDTH)
    h = _one(_TAG_HEIGHT)
    spp = _one(_TAG_SAMPLES, 1)
    comp = _one(_TAG_COMPRESSION, _COMP_NONE)
    rows_per_strip = _one(_TAG_ROWS_PER_STRIP, h)
    bits = tags.get(_TAG_BITS, [8])
    if spp not in (1, 3) or any(b != 8 for b in bits) or len(bits) != spp:
        raise ValueError("unsupported TIFF: only 8-bit gray/RGB baseline")
    if comp not in (_COMP_NONE, _COMP_PACKBITS):
        raise ValueError(f"unsupported TIFF compression {comp}")
    if w <= 0 or h <= 0 or rows_per_strip <= 0:
        raise ValueError("invalid TIFF dimensions")
    offsets = tags.get(_TAG_STRIP_OFFSETS)
    counts = tags.get(_TAG_STRIP_COUNTS)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF strip offsets/counts missing or mismatched")
    expected_strips = (h + rows_per_strip - 1) // rows_per_strip
    if len(offsets) != expected_strips:
        raise ValueError("TIFF strip count disagrees with RowsPerStrip")
    body = bytearray()
    for idx, (off, cnt) in enumerate(zip(offsets, counts)):
        if off + cnt > len(data):
            raise ValueError("TIFF strip out of bounds")
        strip = data[off : off + cnt]
        rows_here = min(rows_per_strip, h - idx * rows_per_strip)
        expected = rows_here * w * spp
        if comp == _COMP_PACKBITS:
            body += packbits_decode(strip, expected)
        else:
            if len(strip) != expected:
                raise ValueError("TIFF uncompressed strip size mismatch")
            body += strip
    px = np.frombuffer(bytes(body), dtype=np.uint8)
    if spp == 1:
        return px.reshape(h, w)
    return px.reshape(h, w, 3)
