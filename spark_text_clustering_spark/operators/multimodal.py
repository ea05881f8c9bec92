"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Two tiers of decode live here:

* **Real decode** (``multimodal_image_decode`` / ``multimodal_audio_meta``):
  genuine spec-conformant PNG and WAV bytes are encoded AND decoded
  executor-side with the pure-stdlib codecs in ``functions/imagecodec.py``
  (zlib-inflated IDAT scanlines with PNG filter reconstruction; RIFF/fmt
  parsing via the stdlib ``wave`` module). No PIL/ffmpeg needed.
* **Stub decode** (``multimodal_features`` / ``multimodal_frame_sample``):
  formats whose codecs genuinely aren't in this container (JPEG, video)
  keep the deterministic fake, clearly marked, while the Spark-side
  plumbing — binary column construction, schema, ``mapInPandas`` batch
  iteration, partition sizing — is real and tested. Swap
  ``_extract_features`` internals for PIL/torchaudio/ffmpeg calls on a real
  cluster and nothing else changes.

Scale design: payloads live in parquet BINARY columns (or are pointers to
object storage for >~100 MB blobs). ``mapInPandas`` streams Arrow batches,
so executor memory is bounded by ``maxRecordsPerBatch × payload size`` —
tune ``spark.sql.execution.arrow.maxRecordsPerBatch`` for fat blobs.
Feature extraction is a pure map: no shuffle at any scale.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .._registry import Registry
from ..catalog import load_table

REG = Registry()

_FRAME_SIZE = 256  # bytes per fake "frame"

_MM_ORACLE = f"""
SELECT doc_id,
       CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT) AS byte_len,
       CAST(octet_length(encode(coalesce(text, ''))) // {_FRAME_SIZE} AS BIGINT) AS n_frames,
       CAST('fake/v1' AS VARCHAR) AS codec
FROM documents
"""


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB DECODER (deterministic fake).

    A real implementation would decode the payload (image/audio/video) and
    emit typed features (dims, duration, frame samples). Here: byte length
    and a fake frame count derived from it. ``NotImplementedError`` paths
    for real codecs are intentional — see module docstring.
    """
    for pdf in batches:
        payload = pdf["payload"]
        byte_len = payload.map(len)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "byte_len": byte_len,
                "n_frames": byte_len // _FRAME_SIZE,
                "codec": "fake/v1",
            }
        )


def decode_real(payload: bytes, codec: str):
    """Real multimodal decode for the formats the stdlib can handle.

    PNG → list of pixel rows (full zlib + filter reconstruction), WAV →
    (channels, sampwidth, rate, nframes). JPEG/GIF/video still need
    external codec libs not present in this container and raise."""
    from ..functions import imagecodec as ic

    fmt = codec or ic.sniff_format(payload)
    if fmt == "png":
        return ic.decode_png_gray_pixels(payload)
    if fmt == "wav":
        return ic.decode_wav_meta(payload)
    raise NotImplementedError(f"decode for {fmt!r} requires external codec libs")


@REG.register("multimodal_features", oracle=_MM_ORACLE)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload feature extraction over ``mapInPandas``.

    The payload column is built from the document text (UTF-8 bytes) as the
    deterministic stand-in for real media bytes; the oracle recomputes the
    same features relationally (octet_length). The Arrow batch shape,
    binary schema, and iterator contract are exactly what a real decoder
    would use.
    """
    docs = load_table(spark, sf_dir, "documents")
    # null text -> zero-byte payload (decode of nothing), mirrored in the oracle
    payloads = docs.select(
        "doc_id",
        F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8").alias("payload"),
    )
    return payloads.mapInPandas(
        _extract_features,
        schema="doc_id long, byte_len long, n_frames long, codec string",
    )


_FRAME_ORACLE = f"""
WITH meta AS (
  SELECT doc_id, octet_length(encode(coalesce(text, ''))) AS byte_len FROM documents),
frames AS (
  SELECT doc_id, byte_len,
         unnest(generate_series(0, CAST(byte_len // {_FRAME_SIZE} AS BIGINT) - 1)) AS frame_idx
  FROM meta
  WHERE byte_len >= {_FRAME_SIZE})
SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       CAST(LEAST({_FRAME_SIZE}, byte_len - frame_idx * {_FRAME_SIZE}) AS BIGINT) AS frame_bytes
FROM frames
"""


def _sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB frame sampler: emits one row per fixed-size frame of the binary
    payload (a real decoder would emit decoded video/audio frames; the
    iterator/explode shape is identical)."""
    for pdf in batches:
        rows = {"doc_id": [], "frame_idx": [], "frame_bytes": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n = len(payload)
            for i in range(n // _FRAME_SIZE):
                rows["doc_id"].append(doc_id)
                rows["frame_idx"].append(i)
                rows["frame_bytes"].append(min(_FRAME_SIZE, n - i * _FRAME_SIZE))
        yield pd.DataFrame(rows, dtype="int64")


@REG.register("multimodal_frame_sample", oracle=_FRAME_ORACLE)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary payloads: mapInPandas explodes each blob
    into per-frame rows (decode step stubbed deterministically; the oracle
    recomputes the frame arithmetic relationally)."""
    docs = load_table(spark, sf_dir, "documents")
    # null text -> zero-byte payload (decode of nothing), mirrored in the oracle
    payloads = docs.select(
        "doc_id",
        F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8").alias("payload"),
    )
    return payloads.mapInPandas(
        _sample_frames, schema="doc_id long, frame_idx long, frame_bytes long"
    )


# ---------------------------------------------------------------------------
# REAL decode: spec-conformant PNG / WAV bytes round-tripped executor-side
# ---------------------------------------------------------------------------

# Deterministic image geometry derived from doc_id so the oracle can
# recompute the decoded facts arithmetically: width = doc_id%16+1,
# height = doc_id%9+1, every pixel of row y has value (doc_id+y)%256.
_IMG_ORACLE = """
WITH dims AS (
  SELECT doc_id,
         doc_id % 16 + 1 AS width,
         doc_id % 9 + 1  AS height
  FROM documents),
rws AS (
  SELECT doc_id, width, height,
         unnest(generate_series(0, height - 1)) AS y
  FROM dims)
SELECT doc_id,
       CAST(width  AS INT) AS width,
       CAST(height AS INT) AS height,
       CAST(8 AS INT)      AS bit_depth,
       CAST(width * height AS BIGINT)             AS n_pixels,
       CAST(SUM(((doc_id + y) % 256) * width) AS BIGINT) AS sum_pixels
FROM rws
GROUP BY doc_id, width, height
"""


def _png_roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Encode a real PNG per doc, then fully decode it (inflate + unfilter)
    and emit facts computed ONLY from the decoded pixels."""
    from ..functions import imagecodec as ic

    for pdf in batches:
        out = {
            "doc_id": [],
            "width": [],
            "height": [],
            "bit_depth": [],
            "n_pixels": [],
            "sum_pixels": [],
        }
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            w, h = d % 16 + 1, d % 9 + 1
            png = ic.encode_png_gray(w, h, [(d + y) % 256 for y in range(h)])
            dw, dh, depth, _ctype = ic.decode_png_meta(png)
            pixels = ic.decode_png_gray_pixels(png)
            out["doc_id"].append(d)
            out["width"].append(dw)
            out["height"].append(dh)
            out["bit_depth"].append(depth)
            out["n_pixels"].append(sum(len(r) for r in pixels))
            out["sum_pixels"].append(sum(sum(r) for r in pixels))
        yield pd.DataFrame(out)


@REG.register("multimodal_image_decode", oracle=_IMG_ORACLE)
def multimodal_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode over ``mapInPandas``: writes genuine PNG bytes and
    decodes them back (zlib IDAT inflate + PNG filter reconstruction, pure
    stdlib — ``functions/imagecodec.py``), emitting only decoded facts.
    Integer outputs (pixel sum/count) keep the oracle hash exact."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(
        _png_roundtrip,
        schema="doc_id long, width int, height int, bit_depth int,"
        " n_pixels long, sum_pixels long",
    )


_WAV_ORACLE = """
SELECT doc_id,
       CAST(1 AS INT)      AS n_channels,
       CAST(2 AS INT)      AS sample_width,
       CAST(16000 AS INT)  AS sample_rate,
       CAST((doc_id % 50 + 1) * 160 AS BIGINT) AS n_frames,
       CAST((doc_id % 50 + 1) * 10  AS BIGINT) AS duration_ms
FROM documents
"""


def _wav_roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from ..functions import imagecodec as ic

    for pdf in batches:
        out = {
            "doc_id": [],
            "n_channels": [],
            "sample_width": [],
            "sample_rate": [],
            "n_frames": [],
            "duration_ms": [],
        }
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            wav = ic.encode_wav_mono16((d % 50 + 1) * 160, 16000)
            ch, width, rate, frames = ic.decode_wav_meta(wav)
            out["doc_id"].append(d)
            out["n_channels"].append(ch)
            out["sample_width"].append(width)
            out["sample_rate"].append(rate)
            out["n_frames"].append(frames)
            out["duration_ms"].append(frames * 1000 // rate)
        yield pd.DataFrame(out)


@REG.register("multimodal_audio_meta", oracle=_WAV_ORACLE)
def multimodal_audio_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio metadata decode: writes genuine RIFF/WAVE PCM bytes and
    parses them back with the stdlib ``wave`` reader inside ``mapInPandas``;
    the oracle recomputes the expected header facts arithmetically."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(
        _wav_roundtrip,
        schema="doc_id long, n_channels int, sample_width int,"
        " sample_rate int, n_frames long, duration_ms long",
    )
