"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real image/audio decode libraries are not available in this container, so
the *decode* step is a deterministic fake (clearly marked below), while the
Spark-side plumbing — binary column construction, schema, ``mapInPandas``
batch iteration, partition sizing — is real and tested. Swap
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
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       CAST(octet_length(encode(text)) // {_FRAME_SIZE} AS BIGINT) AS n_frames,
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


def decode_real(payload: bytes, codec: str) -> bytes:  # pragma: no cover
    """Placeholder for real multimodal decode — requires PIL/ffmpeg/etc."""
    raise NotImplementedError("real multimodal decode requires image/audio libs")


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
    payloads = docs.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    return payloads.mapInPandas(
        _extract_features,
        schema="doc_id long, byte_len long, n_frames long, codec string",
    )


_FRAME_ORACLE = f"""
WITH meta AS (
  SELECT doc_id, octet_length(encode(text)) AS byte_len FROM documents),
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
    payloads = docs.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    return payloads.mapInPandas(
        _sample_frames, schema="doc_id long, frame_idx long, frame_bytes long"
    )
