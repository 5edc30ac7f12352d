"""S1's long-term path (SURVEY §2.1): a custom Python DataSource
(Spark 4 ``spark.dataSource.register`` API) for the MOH CKAN dump.

The reference fetches the CSV over HTTP with browser headers and parses
it in pandas (``il_analysis_git.py:37-45``).  Spark has no HTTP source;
the tactical answer is a driver-side fetch to a staging path
(``readers.fetch_http_to_staging``).  This module is the strategic one:
a first-class, SPLITTABLE source — ``partitions()`` carves the file
into byte ranges, each executor reads only its range (seeking to the
next newline boundary), so a multi-GB daily dump parallelizes without a
staging rewrite.  An ``url`` option (gated on ``requests`` being
importable) downloads to a local cache first, preserving the reference's
browser-header behavior at the same seam.

Dirty-schema contract: everything arrives as strings (the '<15'
censoring and 'TRUE'/'FALSE' flags make numeric inference wrong by
design); the clean stage owns the casts, exactly as at the S2 boundary.

Caveat (documented, matches the MOH dump): rows must not contain
embedded newlines — range splitting aligns on raw line boundaries.
"""

from __future__ import annotations

import csv
import io
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StringType, StructField, StructType

DEFAULT_NUM_PARTITIONS = 8


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


def _resolve_path(options: dict) -> str:
    if options.get("url"):
        try:
            import requests  # noqa: F401
        except ImportError as e:  # pragma: no cover - no network libs here
            raise ImportError(
                "the 'url' option needs the requests package; fetch the "
                "dump yourself and pass path= instead"
            ) from e
        from .readers import fetch_http_to_staging

        cache = options.get("cache_path") or os.path.join(
            "/tmp", "moh_datasource_cache.csv"
        )
        return fetch_http_to_staging(options["url"], cache)
    path = options.get("path")
    if not path:
        raise ValueError("moh_csv: one of path= or url= is required")
    return path


class MohCsvReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self._schema = schema
        self._path = _resolve_path(options)
        self._n = int(options.get("numpartitions", DEFAULT_NUM_PARTITIONS))
        self._size = os.path.getsize(self._path)
        with open(self._path, "rb") as f:
            self._header_end = len(f.readline())

    def partitions(self):
        body = self._size - self._header_end
        n = max(1, min(self._n, body))  # no empty ranges
        step = body // n
        bounds = [self._header_end + i * step for i in range(n)] + [self._size]
        return [_Range(bounds[i], bounds[i + 1]) for i in range(n)]

    def read(self, part: _Range):
        n_cols = len(self._schema)
        with open(self._path, "rb") as f:
            f.seek(part.start)
            if part.start > self._header_end:
                f.readline()  # skip the (possibly partial) line the
                # previous range finishes reading past its end
            while f.tell() <= part.end:
                line = f.readline()
                if not line:
                    break
                text = line.decode("utf-8").rstrip("\r\n")
                if not text:
                    continue
                row = next(csv.reader(io.StringIO(text)))
                # ragged guard: pad/truncate to schema width
                row = (row + [None] * n_cols)[:n_cols]
                yield tuple(row)


class MohCsvDataSource(DataSource):
    """``spark.read.format("moh_csv").option("path", ...).load()``.

    Schema: header column names, all StringType (dirty ingest boundary).
    """

    @classmethod
    def name(cls) -> str:
        return "moh_csv"

    def schema(self) -> StructType:
        path = _resolve_path(self.options)
        with open(path, "rb") as f:
            header = f.readline().decode("utf-8").rstrip("\r\n")
        cols = next(csv.reader(io.StringIO(header)))
        return StructType([StructField(c, StringType()) for c in cols])

    def reader(self, schema: StructType) -> MohCsvReader:
        return MohCsvReader(schema, self.options)


def register_moh_source(spark) -> None:
    """Register the source (idempotent) and make sure executors can
    import this package."""
    from ..session import ensure_package_on_workers

    ensure_package_on_workers(spark)
    spark.dataSource.register(MohCsvDataSource)
