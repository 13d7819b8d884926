"""Spark 4 Python DataSource for per-channel image directories.

SURVEY §4.3: the loader split (metadata scan → pixel attach) can live
behind Spark's Python DataSource API so users write
``spark.read.format("scip_images").load(path)`` and get event rows with
pixels attached. Partition planning happens in the reader: one input
partition per record batch, so a directory of millions of files fans
out across executors.

The decode step is injectable like everywhere else in the source layer
(no image codecs in this container): the format decodes with the
deterministic synthetic reader unless ``option("reader", "module:fn")``
points at a real one (e.g. ``tifffile:imread`` in production).
"""

from __future__ import annotations

import glob as _glob
import importlib
import os
import re
from dataclasses import dataclass

import numpy as np

try:
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceStreamReader,
        InputPartition,
    )

    HAVE_DATASOURCE_API = True
except ImportError:  # pragma: no cover - pre-Spark-4
    HAVE_DATASOURCE_API = False

    class DataSource:  # type: ignore[no-redef]
        pass

    class DataSourceReader:  # type: ignore[no-redef]
        pass

    class DataSourceStreamReader:  # type: ignore[no-redef]
        pass

    class InputPartition:  # type: ignore[no-redef]
        pass


SCHEMA_DDL = (
    "rec string, path_c0 string, path_c1 string, "
    "pixels array<float>, pixels_shape array<int>"
)

_DEFAULT_REGEX = r"^.*/(?P<rec>[^/]+)_(?P<channel>[0-9])\.[a-z]+$"


def _resolve_reader(spec: str | None):
    if not spec or spec == "synthetic":
        from scip_spark.sources.filescan import synthetic_reader

        return synthetic_reader
    mod, fn = spec.split(":", 1)
    return getattr(importlib.import_module(mod), fn)


@dataclass
class _RecordPartition(InputPartition):
    rows: list  # [(rec, path_c0, path_c1), ...]
    reader_spec: str | None


def _discover_records(path: str, regex: str) -> list[tuple[str, str, str]]:
    """Sorted complete (rec, path_c0, path_c1) triples under ``path``."""
    pat = re.compile(regex)
    by_rec: dict[str, dict[str, str]] = {}
    for f in sorted(_glob.glob(os.path.join(path, "**", "*"), recursive=True)):
        m = pat.match(f)
        if m:
            by_rec.setdefault(m.group("rec"), {})[m.group("channel")] = f
    return [
        (rec, chans["0"], chans["1"])
        for rec, chans in sorted(by_rec.items())
        if "0" in chans and "1" in chans  # drop incomplete records
    ]


def _chunk(rows, batch, reader_spec):
    return [
        _RecordPartition(rows[i : i + batch], reader_spec)
        for i in range(0, len(rows), batch)
    ]


def _decode_partition(partition: _RecordPartition):
    reader = _resolve_reader(partition.reader_spec)
    for rec, p0, p1 in partition.rows:
        stack = np.stack(
            [np.asarray(reader(p0), np.float32), np.asarray(reader(p1), np.float32)]
        )
        yield (rec, p0, p1, stack.ravel().tolist(), list(stack.shape))


class ImageDirReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        self.regex = options.get("regex", _DEFAULT_REGEX)
        self.reader_spec = options.get("reader")
        self.batch = int(options.get("recordsPerPartition", "64"))

    def partitions(self):
        return _chunk(
            _discover_records(self.path, self.regex), self.batch, self.reader_spec
        )

    def read(self, partition: _RecordPartition):
        return _decode_partition(partition)


class ImageDirStreamReader(DataSourceStreamReader):
    """Micro-batch reader over a growing acquisition directory.

    Offset = count of COMPLETE records in discovery order. Assumes the
    instrument emits monotonically-named records (seq-numbered
    filenames, the common acquisition layout), so new records extend
    the tail of the sorted record list and every record is read exactly
    once. Each micro-batch fans its slice out ``recordsPerPartition``
    per task, same as the batch reader."""

    def __init__(self, options):
        self.path = options.get("path")
        self.regex = options.get("regex", _DEFAULT_REGEX)
        self.reader_spec = options.get("reader")
        self.batch = int(options.get("recordsPerPartition", "64"))

    def initialOffset(self):
        return {"index": 0}

    def latestOffset(self):
        return {"index": len(_discover_records(self.path, self.regex))}

    def partitions(self, start, end):
        rows = _discover_records(self.path, self.regex)[
            start["index"] : end["index"]
        ]
        return _chunk(rows, self.batch, self.reader_spec)

    def read(self, partition: _RecordPartition):
        return _decode_partition(partition)


class ImageDirDataSource(DataSource):
    @classmethod
    def name(cls):
        return "scip_images"

    def schema(self):
        return SCHEMA_DDL

    def reader(self, schema):
        return ImageDirReader(self.options)

    def streamReader(self, schema):
        return ImageDirStreamReader(self.options)


def register_image_source(spark) -> bool:
    """Register the format on a session; returns False when the Python
    DataSource API isn't available (Spark < 4)."""
    if not HAVE_DATASOURCE_API:
        return False
    spark.dataSource.register(ImageDirDataSource)
    return True
