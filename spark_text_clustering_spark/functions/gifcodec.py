"""Pure-stdlib GIF codec (GIF87a/89a, variable-width LZW — public spec).

Completes the in-repo codec matrix (PNG/WAV in ``imagecodec``, JPEG in
``jpegcodec``, AVI in ``avicodec``): GIF is a palette image in a block
container with LZW-compressed indices. Everything is public knowledge —
the GIF89a specification and the LZW algorithm (Welch 1984; the GIF
variant's variable code width, CLEAR/EOI codes and 12-bit cap).

The encoder writes a real compressing LZW stream (not the "uncompressed
GIF" trick): dictionary build-up, width growth mirrored against a
simulated decoder (the decoder's dictionary lags the encoder's by one
entry — the classic GIF off-by-one — so the encoder tracks the decoder's
``next_code`` separately to switch widths at the moment the decoder
will). The decoder handles CLEAR resets, the KwKwK ``code == next_code``
case, deferred width growth, sub-block reassembly, interlaced row order,
and both global and local color tables.

Used by ``operators/multimodal.py``'s ``decode_real`` dispatch; executor
usage is Arrow-batched ``mapInPandas`` like the other codecs.
"""

from __future__ import annotations

import struct

_MAX_WIDTH = 12


class _LsbBitWriter:
    """LSB-first bit packer (GIF's LZW bit order, opposite of JPEG's)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, width: int) -> None:
        self.acc |= (code & ((1 << width) - 1)) << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


class _LsbBitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, width: int) -> int:
        while self.nbits < width:
            if self.pos >= len(self.data):
                return -1  # truncated stream: treat as implicit EOI
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.nbits -= width
        return v


def lzw_compress(indices: list[int], min_code_size: int) -> bytes:
    """GIF variable-width LZW. Width switches are driven by a simulated
    decoder dictionary (which lags the encoder's by one entry), so any
    spec decoder — including ours — reads the same widths we wrote."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    bw = _LsbBitWriter()
    width = min_code_size + 1
    dec_next = eoi + 1  # the decoder's next_code, simulated
    first_after_clear = True

    def emit(code: int) -> None:
        nonlocal width, dec_next, first_after_clear
        bw.put(code, width)
        if code == clear:
            width = min_code_size + 1
            dec_next = eoi + 1
            first_after_clear = True
            return
        if first_after_clear:
            first_after_clear = False  # decoder adds no entry for the first code
            return
        dec_next += 1
        if dec_next == (1 << width) and width < _MAX_WIDTH:
            width += 1

    emit(clear)
    table: dict[tuple[int, ...], int] = {(i,): i for i in range(1 << min_code_size)}
    enc_next = eoi + 1
    buf: tuple[int, ...] = ()
    for idx in indices:
        cand = buf + (idx,)
        if cand in table:
            buf = cand
            continue
        emit(table[buf])
        table[cand] = enc_next
        enc_next += 1
        buf = (idx,)
        if enc_next == (1 << _MAX_WIDTH):  # table full: reset both sides
            emit(clear)
            table = {(i,): i for i in range(1 << min_code_size)}
            enc_next = eoi + 1
    if buf:
        emit(table[buf])
    bw.put(eoi, width)
    return bw.flush()


def lzw_decompress(data: bytes, min_code_size: int) -> list[int]:
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    br = _LsbBitReader(data)
    width = min_code_size + 1
    table: list[list[int]] = [[i] for i in range(1 << min_code_size)] + [[], []]
    out: list[int] = []
    prev: list[int] | None = None
    while True:
        code = br.read(width)
        if code < 0 or code == eoi:
            break
        if code == clear:
            width = min_code_size + 1
            table = table[: (1 << min_code_size) + 2]
            prev = None
            continue
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt LZW stream: code beyond table")
        if prev is not None:
            # 12-bit cap: once the table holds 4096 entries no more are
            # added until a CLEAR (deferred-clear streams stay at width 12
            # and keep referencing the frozen table — growing past 4096
            # would both leak memory and accept out-of-spec codes)
            if len(table) < (1 << _MAX_WIDTH):
                table.append(prev + entry[:1])
                if len(table) == (1 << width) and width < _MAX_WIDTH:
                    width += 1
        out.extend(entry)
        prev = entry
    return out


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(height: int) -> list[int]:
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, height, step))
    return order


def encode_gif_gray(
    img_rows: list[list[int]], interlace: bool = False
) -> bytes:
    """Write a real GIF89a: 256-entry grayscale global color table, one
    image block, LZW-compressed indices (optionally interlaced)."""
    height = len(img_rows)
    width = len(img_rows[0]) if height else 0
    if not height or not width:
        raise ValueError("empty image")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)  # GCT, 8-bit, 256
    for v in range(256):  # grayscale palette
        out += bytes([v, v, v])
    flags = 0x40 if interlace else 0x00
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, flags)
    rows = (
        [img_rows[y] for y in _interlace_order(height)] if interlace else img_rows
    )
    indices = [p % 256 for row in rows for p in row]
    out += bytes([8])  # LZW minimum code size
    compressed = lzw_compress(indices, 8)
    for i in range(0, len(compressed), 255):  # sub-blocks
        chunk = compressed[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00"  # block terminator
    out += b"\x3b"  # trailer
    return bytes(out)


def decode_gif_frames(data: bytes) -> list[list[list[tuple[int, int, int]]]]:
    """Decode every image block of a GIF to RGB pixel grids (rows of
    (r, g, b)): header + color tables, extension skip, sub-block
    reassembly, LZW decode, deinterlace."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct: list[tuple[int, int, int]] = []
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = [tuple(data[pos + 3 * i : pos + 3 * i + 3]) for i in range(n)]
        pos += 3 * n
    frames = []
    while pos < len(data):
        block = data[pos]
        if block == 0x21 and pos + 2 > len(data):
            raise ValueError("truncated GIF extension block")
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks, skip
            pos += 2
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            if pos >= len(data):
                raise ValueError("truncated GIF extension block")
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        _x, _y, w, h, iflags = struct.unpack("<HHHHB", data[pos + 1 : pos + 10])
        pos += 10
        palette = gct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            palette = [tuple(data[pos + 3 * i : pos + 3 * i + 3]) for i in range(n)]
            pos += 3 * n
        mcs = data[pos]
        pos += 1
        payload = bytearray()
        while pos < len(data) and data[pos] != 0:
            ln = data[pos]
            payload += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        if pos >= len(data):
            raise ValueError("truncated GIF image data blocks")
        pos += 1
        indices = lzw_decompress(bytes(payload), mcs)
        if len(indices) < w * h:
            raise ValueError("truncated GIF image data")
        if indices and max(indices[: w * h]) >= len(palette):
            # match the ValueError the truncation paths standardize on —
            # never let a short local color table surface as IndexError
            raise ValueError("GIF pixel index outside color table")
        rows = [indices[r * w : (r + 1) * w] for r in range(h)]
        if iflags & 0x40:  # deinterlace
            ordered: list[list[int]] = [[]] * h
            for src, y in enumerate(_interlace_order(h)):
                ordered[y] = rows[src]
            rows = ordered
        frames.append([[palette[i] for i in row] for row in rows])
    return frames
