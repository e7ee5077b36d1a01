"""``spark.read.format("warc")`` — WARC segments as a first-class PySpark 4
Python DataSource (batch twin of ``lake/cdf_stream.py``'s streaming source).

:func:`warc.read_warc` (binaryFile + mapInPandas) stays the bulk path —
whole-stage pipelined with downstream expressions and zero extra
serialization. This registered format exists for the places a FORMAT is
the contract: SQL users (``CREATE TEMPORARY VIEW crawl USING warc``),
catalog-driven tooling, and option-driven readers that can't call Python
helpers. Same schema, same parser, byte-identical rows.

Scale shape matches the function path: one :class:`InputPartition` per
segment file (the crawl's ~1 GiB sharding IS the parallelism), each read
task parses its file independently — no shuffle, no coordination. Files
are enumerated driver-side at plan time (a directory listing — metadata
scale; an object-store deployment would swap in its lister here).

Registration pickles the DataSource BY VALUE into Spark's data-source
worker (which does not inherit ``--py-files`` — same constraint documented
at ``cdf_stream.register_changes_source``), so this module and the parser
module it closes over are registered with ``register_pickle_by_value``.
"""

from __future__ import annotations

import os
import sys
from fnmatch import fnmatch

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

# MODULE-LEVEL from-imports, deliberately: this module is pickled BY VALUE
# into Spark's data-source worker (which cannot `import data_pipeline_spark.…`
# — no --py-files inheritance), and by-value pickling carries these globals
# as serialized objects. A runtime `import` inside any method — including
# __init__, which ALSO runs in the worker — would die with
# ModuleNotFoundError under spark-submit.
from data_pipeline_spark.sources.warc import (  # noqa: E402
    WARC_RECORD_SCHEMA as _SCHEMA,
    iter_records as _iter_records,
)

FORMAT_NAME = "warc"
_COLS = [f.name for f in _SCHEMA.fields]


class _SegmentPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _WarcReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("warc format requires .option('path', dir) or load(dir)")
        self.path = path
        self.glob = options.get("glob", "*.warc*")

    def partitions(self):
        if os.path.isfile(self.path):
            return [_SegmentPartition(self.path)]
        files = sorted(
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if fnmatch(f, self.glob)
        )
        return [_SegmentPartition(f) for f in files]

    def read(self, partition: _SegmentPartition):
        with open(partition.path, "rb") as fh:
            content = fh.read()
        fname = os.path.basename(partition.path)
        for rec in _iter_records(content, fname):
            yield tuple(rec[c] for c in _COLS)


class _WarcStreamReader(DataSourceStreamReader):
    """Streaming tail of a segment landing zone: the offset is the
    lexicographic filename high-water mark, a micro-batch is the files
    that arrived past it, and each file reads as its own partition on the
    EXECUTORS (full ``DataSourceStreamReader``, not the driver-side simple
    form — segments are ~1 GiB, feed-scale they are not).

    Contract: segment names must be lexicographically increasing as they
    land (``crawl-000123.warc.gz`` — what crawlers emit); a file sorting
    below the high-water is never picked up. Landing must be atomic
    (write-then-rename), the same rule every file-based stream source has.
    """

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc stream requires .option('path', dir)")
        self.glob = options.get("glob", "*.warc*")

    def _names(self) -> list[str]:
        if not os.path.isdir(self.path):
            return []
        return sorted(f for f in os.listdir(self.path) if fnmatch(f, self.glob))

    def initialOffset(self) -> dict:
        return {"last": ""}

    def latestOffset(self) -> dict:
        names = self._names()
        return {"last": names[-1] if names else ""}

    def partitions(self, start: dict, end: dict):
        lo, hi = start.get("last", ""), end.get("last", "")
        return [
            _SegmentPartition(os.path.join(self.path, f))
            for f in self._names()
            if lo < f <= hi
        ]

    def read(self, partition: _SegmentPartition):
        return _WarcReader({"path": partition.path}).read(partition)

    def commit(self, end: dict) -> None:
        pass


class WarcDataSource(DataSource):
    """``spark.read.format("warc").load(dir)`` / ``.option("glob", ...)``;
    ``spark.readStream.format("warc")`` tails the directory (see
    :class:`_WarcStreamReader`)."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> StructType:
        return _SCHEMA

    def reader(self, schema: StructType) -> _WarcReader:
        return _WarcReader(self.options)

    def streamReader(self, schema: StructType) -> _WarcStreamReader:
        return _WarcStreamReader(self.options)


def register_warc_source(spark) -> None:
    """Register the batch format on the session (see module docstring for
    the by-value pickling constraint)."""
    from pyspark import cloudpickle

    from data_pipeline_spark.sources import warc as _warc

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    cloudpickle.register_pickle_by_value(_warc)
    spark.dataSource.register(WarcDataSource)
