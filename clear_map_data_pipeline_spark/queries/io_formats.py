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

from ..session import Tables
from ..streaming.drain import _tracked_mkdtemp
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
    out = _tracked_mkdtemp("clearmap_io_") + "/docs_jsonl"
    write_jsonl(docs, out)
    return read_jsonl(spark, out, schema=docs.schema).select(*_DOC_COLS)


def io_orc_roundtrip(spark, sf_dir):
    """documents -> write_orc -> read_orc -> identical rows: the other
    columnar lake format, same pushdown contract as parquet."""
    docs = Tables(spark, sf_dir).documents.select(*_DOC_COLS)
    out = _tracked_mkdtemp("clearmap_io_") + "/docs_orc"
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
    out = _tracked_mkdtemp("clearmap_io_") + "/shards"
    write_training_shards(sharded, out)
    fsck = audit_training_shards(spark, out)
    if not fsck["ok"]:  # never return a corrupt dataset as "published"
        raise RuntimeError(f"shard audit failed: {fsck}")
    return (
        spark.read.parquet(os.path.join(out, "data")).select(*_DOC_COLS)
    )


def io_compaction_roundtrip(spark, sf_dir):
    """Small-files compaction (r07, tests-only -> hash-checked): the
    documents table is deliberately shattered into many small files,
    then compact_parquet_dataset rewrites it to ~2 target-sized,
    doc_id-clustered files — and the compacted dataset must be
    row-identical to the original (the maintenance job's one
    inviolable contract).  The builder also asserts the file count
    actually dropped, so the hash can't pass on a no-op."""
    import os

    from ..operators.maintenance import compact_parquet_dataset

    docs = Tables(spark, sf_dir).documents.select(*_DOC_COLS)
    root = _tracked_mkdtemp("clearmap_io_")
    shattered, compacted = root + "/shattered", root + "/compacted"
    docs.repartition(24).write.parquet(shattered)
    n_in = len([f for f in os.listdir(shattered) if f.endswith(".parquet")])
    total = sum(
        os.path.getsize(os.path.join(shattered, f))
        for f in os.listdir(shattered)
        if f.endswith(".parquet")
    )
    compact_parquet_dataset(
        spark, shattered, compacted,
        target_file_bytes=max(1, total // 2), order_by=["doc_id"],
    )
    n_out = len([f for f in os.listdir(compacted) if f.endswith(".parquet")])
    if not n_out < n_in:  # the compaction must actually compact
        raise RuntimeError(f"compaction was a no-op: {n_in} -> {n_out}")
    return spark.read.parquet(compacted).select(*_DOC_COLS)


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
        SubQuery(
            "io_compaction_roundtrip",
            io_compaction_roundtrip,
            _DOCS_SQL,
            _SPEC,
        ),
    ],
    doc="Source/sink/maintenance round-trip suite: JSONL write+read, "
    "ORC write+read, the write-audit-publish sharded training export, "
    "and small-files compaction (24 shattered files -> ~2 clustered, "
    "builder-asserted) must each be an exact identity over the "
    "documents table — hash-checked against the parquet fixture, so "
    "sink encoding, source decoding, the WAP publish path, and the "
    "compaction rewrite are all driver-verified end to end.",
)
