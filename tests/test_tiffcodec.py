"""TIFF 6.0 baseline codec tests (functions/tiffcodec.py): lossless
round-trips across gray/RGB × PackBits/uncompressed × strip layouts,
big-endian (MM) decode, PackBits kernel goldens, and the same
adversarial-bytes contract the other six codecs carry."""

import struct

import numpy as np
import pytest

from spark_text_clustering_spark.functions import tiffcodec as tc


def test_roundtrip_matrix():
    rng = np.random.default_rng(7)
    for trial in range(60):
        h = int(rng.integers(1, 12))
        w = int(rng.integers(1, 20))
        shape = (h, w, 3) if trial % 2 else (h, w)
        if trial % 3 == 0:  # runny image: exercises replicate packets
            img = np.full(shape, int(rng.integers(0, 256)), dtype=np.uint8)
        else:
            img = rng.integers(0, 256, shape).astype(np.uint8)
        for pb in (True, False):
            for rps in (1, 2, 5, 100):
                dec = tc.decode_tiff(tc.encode_tiff(img, packbits=pb, rows_per_strip=rps))
                assert dec.shape == img.shape
                assert (dec == img).all()


def test_packbits_goldens():
    # TIFF 6.0 appendix semantics: replicate and literal packets
    assert tc.packbits_encode(b"\xaa" * 5) == bytes([257 - 5, 0xAA])
    assert tc.packbits_encode(b"\x01\x02\x03") == bytes([2]) + b"\x01\x02\x03"
    assert tc.packbits_decode(bytes([128, 257 - 3, 0x42]), 3) == b"\x42" * 3  # 128 = no-op
    long_run = b"\x00" * 300  # >128 splits into two replicate packets
    assert tc.packbits_decode(tc.packbits_encode(long_run), 300) == long_run
    with pytest.raises(ValueError):
        tc.packbits_decode(bytes([257 - 3]), 3)  # replicate byte missing
    with pytest.raises(ValueError):
        tc.packbits_decode(bytes([5, 1, 2]), 6)  # literal truncated


def test_big_endian_decode():
    img = np.arange(24, dtype=np.uint8).reshape(4, 6)
    strip = img.tobytes()
    n = 9
    strip_off = 8 + 2 + n * 12 + 4
    ents = []

    def ent(tag, ftype, count, val):
        ents.append(struct.pack(">HHI", tag, ftype, count) + val)

    sh = lambda v: struct.pack(">HH", v, 0)  # noqa: E731
    lg = lambda v: struct.pack(">I", v)  # noqa: E731
    ent(256, 4, 1, lg(6)); ent(257, 4, 1, lg(4)); ent(258, 3, 1, sh(8))
    ent(259, 3, 1, sh(1)); ent(262, 3, 1, sh(1)); ent(273, 4, 1, lg(strip_off))
    ent(277, 3, 1, sh(1)); ent(278, 4, 1, lg(4)); ent(279, 4, 1, lg(len(strip)))
    mm = (
        struct.pack(">2sHI", b"MM", 42, 8)
        + struct.pack(">H", n)
        + b"".join(ents)
        + struct.pack(">I", 0)
        + strip
    )
    assert (tc.decode_tiff(mm) == img).all()


def test_rejects_unsupported():
    img = np.zeros((2, 2), dtype=np.uint8)
    good = bytearray(tc.encode_tiff(img, packbits=False, rows_per_strip=2))
    with pytest.raises(ValueError):
        tc.decode_tiff(b"XX" + bytes(good[2:]))  # bad byte-order mark
    bad_magic = bytearray(good)
    bad_magic[2:4] = struct.pack("<H", 43)
    with pytest.raises(ValueError):
        tc.decode_tiff(bytes(bad_magic))
    with pytest.raises(ValueError):
        tc.encode_tiff(np.zeros((0, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        tc.encode_tiff(np.zeros((2, 2, 4), dtype=np.uint8))


def test_fuzz_fails_cleanly():
    """Same contract as test_multimodal::test_decoders_fuzz_fail_cleanly:
    garbage-with-magic, bit flips, truncations -> ValueError (or a clean
    decode), never IndexError/KeyError or unbounded memory."""
    rng = np.random.default_rng(99)
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    base = bytearray(tc.encode_tiff(img, packbits=True, rows_per_strip=3))
    for trial in range(300):
        kind = trial % 3
        if kind == 0:
            n = int(rng.integers(8, 200))
            data = bytes(base[:4]) + bytes(rng.integers(0, 256, n, dtype=np.uint8))
        elif kind == 1:
            data = bytearray(base)
            data[int(rng.integers(0, len(data)))] ^= int(rng.integers(1, 256))
            data = bytes(data)
        else:
            data = bytes(base[: int(rng.integers(0, len(base)))])
        try:
            tc.decode_tiff(data)
        except ValueError:
            pass
        except struct.error:
            pass
        except Exception as e:  # pragma: no cover
            raise AssertionError(
                f"tiff decoder raised {type(e).__name__} on fuzzed input "
                f"(trial {trial}, kind {kind}): {e}"
            ) from e
