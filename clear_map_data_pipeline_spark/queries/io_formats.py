"""Format round-trip queries (r07): the JSONL and ORC source/sink
pairs, upgraded from tests-only to driver-hash-checked.

The oracle trick: the builders write the documents table through the
REAL sink, read it back through the REAL source, and return the
round-tripped rows — while the DuckDB twin just selects the same
columns from the parquet fixture.  Hash equality therefore proves the
write+read composition is an exact identity (JSON string escaping,
unicode, column types, ORC encoding) without DuckDB ever needing to
read the staged files.  All document columns are BIGINT/VARCHAR, so
the identity claim has no float-rendering caveats.

Corrupt-line capture, schema-drift behavior, and scan-pruning plans
for these sources remain pinned in tests/test_sources.py; this suite
adds the driver-grade end-to-end fidelity check.
"""

from __future__ import annotations

import tempfile

from ..session import Tables
from ..sources.readers import read_jsonl, read_orc
from ..sources.writers import write_jsonl, write_orc
from .suites import SubQuery, register_suite

_DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]
_DOCS_SQL = "SELECT doc_id, text, lang, source, n_chars FROM documents"
_SPEC = [(c, "s") for c in _DOC_COLS]


def io_jsonl_roundtrip(spark, sf_dir):
    """documents -> write_jsonl -> read_jsonl(explicit schema) ->
    identical rows.  Proves JSON-lines escaping round-trips every
    document byte-exactly (the interchange format training-data drops
    arrive in)."""
    docs = Tables(spark, sf_dir).documents.select(*_DOC_COLS)
    out = tempfile.mkdtemp(prefix="clearmap_io_") + "/docs_jsonl"
    write_jsonl(docs, out)
    return read_jsonl(spark, out, schema=docs.schema).select(*_DOC_COLS)


def io_orc_roundtrip(spark, sf_dir):
    """documents -> write_orc -> read_orc -> identical rows: the other
    columnar lake format, same pushdown contract as parquet."""
    docs = Tables(spark, sf_dir).documents.select(*_DOC_COLS)
    out = tempfile.mkdtemp(prefix="clearmap_io_") + "/docs_orc"
    write_orc(docs, out)
    return read_orc(spark, out).select(*_DOC_COLS)


def io_shard_export_roundtrip(spark, sf_dir):
    """documents -> write_training_shards (the write-audit-publish
    sharded training export: partitioned write, storage re-read +
    checksum audit, manifest.json commit marker) -> read back ->
    identical rows.  The full WAP path executes — a failed audit
    aborts before the marker — and the driver hash proves the
    published dataset is row-for-row the input corpus."""
    import os

    from pyspark.sql import functions as F

    from ..operators.assembly import (
        audit_training_shards,
        write_training_shards,
    )

    docs = Tables(spark, sf_dir).documents.select(*_DOC_COLS)
    sharded = docs.withColumn(
        "shard", (F.col("doc_id") % 8).cast("int")
    )
    out = tempfile.mkdtemp(prefix="clearmap_io_") + "/shards"
    write_training_shards(sharded, out)
    fsck = audit_training_shards(spark, out)
    if not fsck["ok"]:  # never return a corrupt dataset as "published"
        raise RuntimeError(f"shard audit failed: {fsck}")
    return (
        spark.read.parquet(os.path.join(out, "data")).select(*_DOC_COLS)
    )


register_suite(
    "suite_io_roundtrip",
    [
        SubQuery("io_jsonl_roundtrip", io_jsonl_roundtrip, _DOCS_SQL, _SPEC),
        SubQuery("io_orc_roundtrip", io_orc_roundtrip, _DOCS_SQL, _SPEC),
        SubQuery(
            "io_shard_export_roundtrip",
            io_shard_export_roundtrip,
            _DOCS_SQL,
            _SPEC,
        ),
    ],
    doc="Source/sink round-trip suite: JSONL write+read, ORC "
    "write+read, and the write-audit-publish sharded training export "
    "must each be an exact identity over the documents table — "
    "hash-checked against the parquet fixture, so sink encoding, "
    "source decoding, and the WAP publish path are all "
    "driver-verified end to end.",
)
