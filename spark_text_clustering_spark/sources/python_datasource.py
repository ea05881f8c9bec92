"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API): a
whole-file text-corpus connector.

This is the connector-API rebuild of the reference's S1 scan
(``sc.wholeTextFiles``, LDAClustering.scala:113): one row per file, one
*input partition per file* so Spark schedules file reads independently —
exactly how wholeTextFiles partitions, but through the modern pluggable
source surface (usable as ``spark.read.format("textcorpus")``).

Scale notes: partition planning happens on the driver (cheap listing);
each executor task opens only its own file. For millions of small files,
batch several files per InputPartition (``files_per_partition`` option)
to amortize task overhead — the same knob wholeTextFiles' minPartitions
exposed.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


class _FilePartition(InputPartition):
    def __init__(self, paths: list[str]) -> None:
        self.paths = paths


class TextCorpusReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("textcorpus source requires option 'path'")
        self.per_part = int(options.get("files_per_partition", "1"))

    def partitions(self):
        files = sorted(glob.glob(os.path.join(self.path, "**", "*.txt"), recursive=True))
        return [
            _FilePartition(files[i : i + self.per_part])
            for i in range(0, len(files), self.per_part)
        ]

    def read(self, partition: _FilePartition):
        for p in partition.paths:
            with open(p, encoding="utf-8") as f:
                yield (p, f.read())


class TextCorpusStreamReader(SimpleDataSourceStreamReader):
    """Streaming variant: each microbatch picks up files that appeared
    since the last committed offset (offset = sorted-file-list position).

    This is the connector-API form of the file-stream source the engine's
    replay harness uses — new books land in the directory, the stream
    ingests them exactly once (offsets are committed by the engine's
    checkpoint, so restarts resume, not re-read).
    """

    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("textcorpus source requires option 'path'")

    def _files(self) -> list[str]:
        return sorted(glob.glob(os.path.join(self.path, "**", "*.txt"), recursive=True))

    def initialOffset(self) -> dict:
        return {"index": 0}

    def read(self, start: dict):
        files = self._files()
        i = start["index"]
        rows = []
        for p in files[i:]:
            with open(p, encoding="utf-8") as f:
                rows.append((p, f.read()))
        return iter(rows), {"index": len(files)}

    def readBetweenOffsets(self, start: dict, end: dict):
        files = self._files()
        for p in files[start["index"] : end["index"]]:
            with open(p, encoding="utf-8") as f:
                yield (p, f.read())


class TextCorpusDataSource(DataSource):
    """``spark.read.format("textcorpus").option("path", dir).load()`` and
    ``spark.readStream.format("textcorpus")...`` for the streaming form."""

    @classmethod
    def name(cls) -> str:
        return "textcorpus"

    def schema(self) -> str:
        return "path string, text string"

    def reader(self, schema) -> TextCorpusReader:
        return TextCorpusReader(self.options)

    def simpleStreamReader(self, schema) -> TextCorpusStreamReader:
        return TextCorpusStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(TextCorpusDataSource)
