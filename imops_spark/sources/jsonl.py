"""Line-delimited JSON (JSONL) source/sink — the raw-ingest format of a
training-data pipeline (crawl dumps, API exports, annotation tools all
speak JSONL before anything speaks parquet).

Scale design: line-delimited JSON is SPLITTABLE — Spark assigns byte
ranges of one file to many tasks and each task resynchronizes on the
next newline, so a single 1 TB .jsonl file still parallelizes (multiLine
JSON does not: one document = one task).  The reader REQUIRES an
explicit schema: schema inference is a full extra pass over the corpus
before the first real job — at 100 TB that is the difference between
one read and two.  Writers default to uncompressed or zstd/gzip per
file; note gzip files are NOT splittable (one task per file on re-read),
so compacted-many-files beats one-giant-gzip.

Malformed-line policy is explicit, never silent: ``on_corrupt='fail'``
raises on the first bad line (FAILFAST), ``'keep'`` routes bad lines to
a ``_corrupt_record`` column for quarantine (PERMISSIVE), ``'drop'``
discards them (DROPMALFORMED) — the quarantine column is how a pipeline
audits ingest loss instead of discovering it downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["read_jsonl", "stream_jsonl", "write_jsonl", "corrupt_lines_df"]

_CORRUPT_COL = "_corrupt_record"

_MODES = {"fail": "FAILFAST", "keep": "PERMISSIVE", "drop": "DROPMALFORMED"}


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    on_corrupt: str = "fail",
) -> DataFrame:
    """Read line-delimited JSON with an EXPLICIT schema (required — see
    module docstring for why inference is banned at scale).

    ``on_corrupt``: ``'fail'`` (default) raises on the first malformed
    line; ``'keep'`` appends a ``_corrupt_record`` string column holding
    each bad line's raw text (NULL on good rows); ``'drop'`` silently
    discards bad lines — use only when loss accounting happens elsewhere.
    """
    schema = _resolve_schema(schema, on_corrupt)
    return (
        spark.read.schema(schema)
        .option("mode", _MODES[on_corrupt])
        .option("columnNameOfCorruptRecord", _CORRUPT_COL)
        .json(path)
    )


def _resolve_schema(schema: T.StructType | str, on_corrupt: str) -> T.StructType:
    """Shared mode validation + keep-mode corrupt-column extension.
    Always returns a NEW StructType: ``StructType.add`` mutates in place
    (it returns ``self``), and extending the CALLER's schema object would
    make its second use raise 'already contains _corrupt_record' and
    haunt every other read/write with a phantom always-null column."""
    if on_corrupt not in _MODES:
        raise ValueError(
            f"on_corrupt must be one of {sorted(_MODES)}, got {on_corrupt!r}"
        )
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if _CORRUPT_COL in schema.fieldNames():
        raise ValueError(
            f"schema already contains {_CORRUPT_COL!r}; rename the field "
            "or use on_corrupt='fail'/'drop'"
        )
    fields = list(schema.fields)
    if on_corrupt == "keep":
        fields = fields + [T.StructField(_CORRUPT_COL, T.StringType())]
    return T.StructType(fields)


def stream_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    on_corrupt: str = "fail",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Structured-Streaming twin of :func:`read_jsonl` — the landing-zone
    ingest shape: a crawler drops ``.jsonl`` files into ``path`` and the
    stream picks each file up exactly once (file-source checkpointing),
    feeding the row-local operator family (quality scores, hashed
    embeddings, canonical URLs, entropy — all streaming-legal here).

    Same explicit-schema and malformed-line contract as the batch
    reader; ``max_files_per_trigger`` bounds micro-batch size so one
    giant backlog drop does not become one giant batch."""
    schema = _resolve_schema(schema, on_corrupt)
    r = (
        spark.readStream.schema(schema)
        .option("mode", _MODES[on_corrupt])
        .option("columnNameOfCorruptRecord", _CORRUPT_COL)
    )
    if max_files_per_trigger is not None:
        if int(max_files_per_trigger) < 1:
            # a silently-dropped 0 would ingest the whole backlog in one
            # micro-batch — the exact failure this knob exists to prevent
            raise ValueError(
                f"max_files_per_trigger must be >= 1, got {max_files_per_trigger}"
            )
        r = r.option("maxFilesPerTrigger", int(max_files_per_trigger))
    return r.json(path)


def corrupt_lines_df(
    spark: SparkSession, path: str, schema: T.StructType | str
) -> DataFrame:
    """The quarantine view: the raw MALFORMED lines of a JSONL path, for
    audit/repair — ``(raw string)``.

    Deliberately a separate text re-read (``from_json`` with a corrupt-
    record field — malformed lines land their raw text there; a bare
    ``from_json`` is useless for this, it returns a row of NULLs on
    malformed input, indistinguishable from a valid all-null object)
    rather than a filter on an ``on_corrupt='keep'`` frame: Spark
    REFUSES plans over a raw JSON scan that reference only the internal
    corrupt column (QUERY_ONLY_CORRUPT_RECORD_COLUMN — the parser skips
    non-referenced fields, so such a plan could not tell good lines from
    bad), and the documented workaround (cache the parsed frame) is
    exactly what a 100 TB audit must not do.  The text scan is
    splittable and projects one column."""
    with_corrupt = _resolve_schema(schema, "keep")
    lines = spark.read.text(path).select(F.col("value").alias("raw"))
    parsed = F.from_json(
        F.col("raw"),
        with_corrupt,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT_COL},
    )
    return lines.filter(parsed[_CORRUPT_COL].isNotNull())


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "error",
    compression: str | None = None,
    files: int | None = None,
) -> None:
    """Write line-delimited JSON.  ``compression`` in {None, 'gzip',
    'zstd', ...} — remember gzip parts are not splittable on re-read;
    ``files`` coalesces the output to a fixed part count (small exports),
    otherwise one part per partition."""
    if files is not None and int(files) < 1:
        raise ValueError(f"files must be >= 1, got {files}")
    out = df.coalesce(int(files)) if files is not None else df
    w = out.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)
