"""Parquet sources/sinks for tensor data (SURVEY.md §2.2 "Scans/sources/sinks").

The layout decisions here are the engine's analog of the reference's
contiguity handling (`utils.py:95-100`) and `boxed` data skipping:

- voxel tables are written **sorted by (image_id, i0, i1, ...)** so parquet
  row-group min/max statistics prune coordinate ranges — crop/box predicates
  then skip row groups exactly like the reference's bbox optimization skips
  voxels;
- optional **bucketing by image_id** (saveAsTable path) co-locates whole
  images, making per-image joins and ``applyInPandas`` groupings
  shuffle-free;
- blob tables write one row per image — partition count is controlled so
  ~100 MB of blobs land per file.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tensor_io import IMAGE_ID, VAL, TensorFrame, coord_cols

__all__ = [
    "write_voxels",
    "read_voxels",
    "write_blobs",
    "read_blobs",
    "write_bucketed",
    "ingest_npy_gz",
    "morton_key",
    "write_time_partitioned",
    "upsert_time_partitioned",
    "compact_partitions",
]


def morton_key(coords, bits: int = 10):
    """Morton (Z-order) key column: the bits of each coordinate interleaved,
    so consecutive keys stay spatially close in EVERY dimension at once.

    Row-major order prunes parquet row groups only on the leading coordinate
    — a slab filter on i1 or i2 touches every row group.  Z-ordering keeps
    each row group's min/max tight in all coordinates, so any axis-aligned
    box predicate skips most groups regardless of which axes it constrains —
    the layout trick Delta/Iceberg OPTIMIZE ZORDER applies to 100 TB tables,
    here as a pure column expression (shift/and/or, whole-stage codegen).

    ``bits`` bounds each coordinate (< 2**bits); bits * ndim must be <= 63.
    A coordinate at or above 2**bits would have its high bits silently
    DROPPED from the key — spatially scrambling the sort and gutting the
    row-group pruning this layout exists for — so size ``bits`` from the
    actual shape (``write_voxels`` derives it automatically).
    """
    coords = list(coords)
    nd = len(coords)
    if bits * nd > 63:
        raise ValueError(f"bits={bits} x ndim={nd} exceeds a long key")
    expr = F.lit(0).cast("long")
    for b in range(bits):
        for d, c in enumerate(coords):
            bit = F.shiftright(F.col(c).cast("long"), b).bitwiseAND(F.lit(1))
            expr = expr.bitwiseOR(F.shiftleft(bit, b * nd + d))
    return expr


def write_voxels(
    tf: TensorFrame,
    path: str,
    mode: str = "overwrite",
    layout: str = "rowmajor",
    **options,
) -> None:
    """Write a voxel table ordered for parquet row-group pruning.

    ``layout='rowmajor'`` sorts by (image_id, i0, i1, ...): best when box
    predicates constrain the leading coordinate (and for sequential decode).
    ``layout='zorder'`` sorts by (image_id, morton_key): best when box
    predicates may constrain ANY coordinate — see ``morton_key``.  The
    key's per-coordinate bit width is derived from ``tf.shape`` (a blind
    default would silently drop high coordinate bits past 2**bits and
    scramble the order for volumes >= 1024 per axis).
    Extra ``options`` pass through to the parquet writer (e.g.
    ``compression``, ``parquet.block.size`` to control row-group size).
    """
    if layout == "rowmajor":
        order = list(tf.coords)
    elif layout == "zorder":
        bits = max(1, max(int(s) - 1 for s in tf.shape).bit_length())
        order = [morton_key(tf.coords, bits=bits)]
    else:
        raise ValueError(f"unknown layout {layout!r}")
    w = (
        tf.df.repartition(IMAGE_ID)
        .sortWithinPartitions(IMAGE_ID, *order)
        .write.mode(mode)
    )
    for k, v in options.items():
        w = w.option(k, v)
    w.parquet(path)


def read_voxels(
    spark: SparkSession, path: str, shape, dtype=np.float64
) -> TensorFrame:
    """Read a voxel table back; shape/dtype are engine metadata (stored
    out-of-band by the caller, e.g. in a sidecar or table properties)."""
    df = spark.read.parquet(path)
    ndim = len(tuple(shape))
    expected = {IMAGE_ID, VAL, *coord_cols(ndim)}
    missing = expected - set(df.columns)
    if missing:
        raise ValueError(f"voxel table at {path} is missing columns {sorted(missing)}")
    return TensorFrame(df=df, shape=tuple(int(s) for s in shape), dtype=np.dtype(dtype))


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed parquet table: rows are hash-distributed
    into ``num_buckets`` files by ``bucket_cols`` at WRITE time, so equi-joins
    and groupBys on the bucket key between same-bucketed tables run with no
    Exchange at READ time — the pre-paid-shuffle strategy for the joins a
    100 TB pipeline repeats every day (e.g. voxel tables bucketed by
    image_id; fact tables by their join key).

    ``sort_cols`` additionally sorts within each bucket file (row-group
    pruning + cheaper sort-merge join).  ``path`` makes the table external.
    Requires ``saveAsTable`` (bucketing metadata lives in the catalog).
    """
    w = df.write.mode(mode).format("parquet").bucketBy(int(num_buckets), *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def write_blobs(blobs: DataFrame, path: str, mode: str = "overwrite", files: int | None = None) -> None:
    df = blobs
    if files:
        df = df.repartition(files)
    df.write.mode(mode).parquet(path)


def read_blobs(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def ingest_npy_gz(spark: SparkSession, paths: dict[int, str]) -> DataFrame:
    """Ingest .npy.gz files as a blob table (loader parity with the
    reference's benchmark ingestion, ``benchmarks/common.py:29-31``)."""
    from ..tensor_io import encode_blobs, load_npy_gz

    return encode_blobs(spark, {i: load_npy_gz(p) for i, p in paths.items()})


def write_time_partitioned(
    events: DataFrame,
    path: str,
    ts_sec_col: str = "ts_sec",
    granularity: str = "day",
    mode: str = "overwrite",
) -> None:
    """Write an event table hive-partitioned by event date (or hour): the
    standard time-series layout at 100 TB — every time-range query prunes
    whole directories before a single footer is read, retention is a
    directory delete, and backfills replace one partition atomically with
    dynamic partition overwrite.

    ``events`` must carry an epoch-seconds column (``ts_sec``, the engine's
    normalized event-time — see ``functions.events.load_events``); the
    partition value is derived from it with pure UTC integer arithmetic
    (``ts_sec DIV 86400`` days since epoch), NOT ``date_format`` — the
    session timezone must never move a row between partitions, or two
    writers with different timezones would shred the layout.
    """
    (
        events.withColumn("event_date", _event_date_expr(ts_sec_col, granularity))
        .repartition("event_date")
        .write.mode(mode)
        .partitionBy("event_date")
        .parquet(path)
    )


def _event_date_expr(ts_sec_col: str, granularity: str):
    # FLOOR division + pmod, not cast-truncation + %: pre-1970 timestamps
    # must land in their own day (int(-3600/86400) truncates to day 0 with
    # hour -1; floor gives 1969-12-31 hour 23) — two writers handling
    # historical data would otherwise shred the layout
    epoch_day = F.floor(F.col(ts_sec_col) / F.lit(86400)).cast("int")
    day = F.date_add(F.to_date(F.lit("1970-01-01")), epoch_day).cast("string")
    if granularity == "day":
        return day
    if granularity == "hour":
        hour = (F.pmod(F.col(ts_sec_col), F.lit(86400)) / 3600).cast("int")
        return F.concat_ws("-", day, F.lpad(hour.cast("string"), 2, "0"))
    raise ValueError(f"unknown granularity {granularity!r}")


def upsert_time_partitioned(
    events: DataFrame,
    path: str,
    ts_sec_col: str = "ts_sec",
    granularity: str = "day",
) -> None:
    """Backfill/replace ONLY the partitions present in ``events``, leaving
    every other partition's files untouched — the idempotent reprocessing
    primitive of a time-partitioned lake (re-run one bad day without
    rewriting the year).

    Implemented with Spark's dynamic partition overwrite: mode=overwrite
    deletes just the partition directories the incoming rows land in.  The
    mode rides on the ``DataFrameWriter`` itself
    (``.option("partitionOverwriteMode", "dynamic")``), NOT on the session
    conf: the per-write option takes precedence over the conf and is
    genuinely scoped to this one write — a session-conf flip, even
    try/finally-restored, races with any concurrently *planned* overwrite
    on the same session (e.g. a rollup-stream micro-batch overlapping a
    user batch job).

    Partition derivation is byte-identical to ``write_time_partitioned``
    (UTC integer arithmetic), so upserts can never shred a layout written
    by it.
    """
    (
        events.withColumn("event_date", _event_date_expr(ts_sec_col, granularity))
        .repartition("event_date")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("event_date")
        .parquet(path)
    )


def compact_partitions(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_col: str = "event_date",
    partitions: list[str] | None = None,
) -> dict[str, dict[str, int]]:
    """Rewrite small-file partitions of a hive-partitioned parquet table
    into ~``target_file_bytes`` files — the maintenance job every streaming
    sink needs: micro-batches append file-per-trigger-per-task, and a year
    of 30-second triggers turns scans into footer-fetch storms (each file
    costs a listing entry, a footer read, and a task).

    Per partition: list its files via the Hadoop FS API, compute the target
    file count ``ceil(bytes / target_file_bytes)``, and skip partitions
    already at or below it (compaction must be cheap to re-run).

    **Crash safety (staged swap)**: the compacted replacement is written to
    a dot-prefixed staging directory first — Spark/Hadoop file listings
    skip ``.``-names, so readers never see it — and the original files stay
    on disk untouched until the replacement is fully committed.  The
    ``_MANIFEST`` file (atomically renamed into the staging directory,
    listing the staged ``part-<uuid>`` names) is the commit point; the swap
    itself is per-file renames inside the partition directory: hide the
    originals under a ``.orig-`` prefix (a plain-named file is an original
    iff its name is NOT in the manifest — staged files keep their
    ``part-<uuid>`` names), move the staged files in, then delete the
    hidden originals and the staging directory (manifest LAST).
    :func:`_recover_partition` (run for every partition with staging debris
    before planning new work) rolls an interrupted swap BACK before the
    manifest exists and FORWARD after it.  A driver/app crash at any instant can
    therefore duplicate work or leave a transient visibility anomaly for
    concurrent readers of the partition being swapped — it can never lose
    rows UNDER THE SINGLE-WRITER CONTRACT below (the previous
    localCheckpoint+dynamic-overwrite design had an unrecoverable window
    where the only copy of the partition lived in executor storage).

    **Concurrency contract: one writer, any readers.**  The no-loss
    guarantee assumes no OTHER writer appends to a partition between the
    pre-compaction listing and the end of its swap: the hide step treats
    every plain-named ``part-`` file not in the manifest as an original, so
    a file appended mid-swap (or before a crash-recovery re-run) would be
    hidden and deleted with the originals — concurrently appended rows
    would be lost.  Run compaction from the same maintenance loop as the
    appender (``streaming.events.start_time_partitioned_sink`` does: its
    foreachBatch serializes append and compact), or compact only
    partitions the appender has sealed (e.g. past days of a
    date-partitioned sink).  Concurrent READERS are always safe.
    One partition per job bounds cluster memory: the partition, not the
    table, must fit.

    Returns ``{partition_value: {"files_before": n, "files_after": m,
    "bytes": b}}`` for the partitions rewritten.
    """
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    Path = jvm.org.apache.hadoop.fs.Path
    root = Path(path)
    fs = root.getFileSystem(hconf)
    staging_root = Path(path, _STAGING_DIR)

    def _part_dirs():
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if st.isDirectory() and name.startswith(f"{partition_col}="):
                yield name.split("=", 1)[1], st.getPath()

    def _data_files(jpath):
        return [
            s
            for s in fs.listStatus(jpath)
            if s.isFile() and not s.getPath().getName().startswith(("_", "."))
        ]

    # finish or roll back any swap a previous run left behind BEFORE
    # planning new work — a fresh staged write would otherwise clobber the
    # only complete copy of a half-swapped partition
    if fs.exists(staging_root):
        for st in fs.listStatus(staging_root):
            if st.isDirectory():
                _recover_partition(jvm, fs, Path, root, st.getPath())
        fs.delete(staging_root, True)

    report: dict[str, dict[str, int]] = {}
    for value, jdir in _part_dirs():
        if partitions is not None and value not in partitions:
            continue
        files = _data_files(jdir)
        nbytes = sum(s.getLen() for s in files)
        n_target = max(1, -(-nbytes // int(target_file_bytes)))
        if len(files) <= n_target:
            continue
        # 1. stage: write the compacted replacement next to the partition.
        #    Reading jdir directly (not the table root) keeps the scan
        #    partition-pruned — a plain read of `path` would relist every
        #    partition per loop iteration, O(n_compacted x n_total)
        #    metadata calls at scale.  The partition value is encoded in
        #    the directory name, so the staged schema matches the hive
        #    data files (no partition column).
        stage = Path(staging_root, jdir.getName())
        part_df = spark.read.parquet(jdir.toString())
        part_df.repartition(n_target).write.mode("overwrite").parquet(stage.toString())
        # 2. commit point: the manifest records the staged file names; from
        #    here recovery rolls FORWARD through any crash inside the swap
        _write_manifest(fs, Path, stage)
        # 3-5. swap + cleanup
        _swap_in_staged(jvm, fs, Path, jdir, stage)
        _cleanup_stage(fs, Path, stage)
        report[value] = {
            "files_before": len(files),
            "files_after": len(_data_files(jdir)),
            "bytes": int(nbytes),
        }
    if fs.exists(staging_root) and len(fs.listStatus(staging_root)) == 0:
        fs.delete(staging_root, True)
    return report


_STAGING_DIR = ".compact_staging"
_HIDDEN_ORIG = ".orig-"
_MANIFEST = "_MANIFEST"


def _rename_or_raise(fs, src, dst) -> None:
    """Hadoop rename signals failure by RETURNING FALSE (dest exists,
    quota, cross-scheme...); the swap protocol must stop on the spot —
    proceeding past a failed manifest rename would hand recovery an
    empty manifest (hide everything, restore nothing), and a silently
    failed hide/move leaves duplicated or missing rows.  Raising leaves
    the protocol in a recoverable state by construction: every crash
    point is covered by the recovery preamble."""
    if not fs.rename(src, dst):
        raise IOError(f"rename failed: {src} -> {dst}")


def _stage_data_names(fs, jpath):
    return [
        s.getPath().getName()
        for s in fs.listStatus(jpath)
        if s.isFile() and not s.getPath().getName().startswith(("_", "."))
    ]


def _write_manifest(fs, Path, stage) -> None:
    # The manifest is the COMMIT POINT, so its creation must be atomic: a
    # crash between create() and write/close would leave a visible empty
    # manifest, recovery would treat the swap as committed with
    # staged_names = {} — hide every original, move nothing in, delete the
    # hidden originals — and destroy both generations.  Write the content
    # to a dot-prefixed temp name (invisible to listings and to
    # _stage_data_names) and rename into place; the rename IS the commit.
    tmp = Path(stage, "._MANIFEST.tmp")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray("\n".join(_stage_data_names(fs, stage)).encode()))
    finally:
        out.close()
    _rename_or_raise(fs, tmp, Path(stage, _MANIFEST))


def _read_manifest(jvm, fs, Path, stage) -> set:
    p = Path(stage, _MANIFEST)
    if not fs.exists(p):
        return set()
    ins = fs.open(p)
    try:
        # py4j passes byte[] by VALUE, so stream-into-buffer APIs
        # (readFully) can't return data — decode JVM-side into a String
        text = jvm.org.apache.commons.io.IOUtils.toString(ins, "UTF-8")
    finally:
        ins.close()
    return {line for line in text.split("\n") if line}


def _swap_in_staged(jvm, fs, Path, jdir, stage) -> None:
    """Swap a committed (manifest-bearing) staged compaction into its
    partition directory.  Every step is a per-file rename inside one
    filesystem — no copy, and both generations' bytes exist on disk until
    the final delete.  The manifest makes the swap resumable from any crash
    point: a plain-named partition file is an original iff its name is NOT
    in the manifest (original and staged names are distinct Spark
    part-<uuid> names), so re-running the three loops below is idempotent.
    """
    staged_names = _read_manifest(jvm, fs, Path, stage)
    # hide originals (skip already-moved-in staged files)
    for s in list(fs.listStatus(jdir)):
        name = s.getPath().getName()
        if s.isFile() and not name.startswith(("_", ".")) and name not in staged_names:
            _rename_or_raise(fs, s.getPath(), Path(jdir, _HIDDEN_ORIG + name))
    # move staged files in under their manifest names
    for s in list(fs.listStatus(stage)):
        name = s.getPath().getName()
        if s.isFile() and name in staged_names:
            _rename_or_raise(fs, s.getPath(), Path(jdir, name))
    # drop the hidden originals — the replacement is fully visible now
    for s in list(fs.listStatus(jdir)):
        name = s.getPath().getName()
        if s.isFile() and name.startswith(_HIDDEN_ORIG):
            fs.delete(s.getPath(), False)


def _cleanup_stage(fs, Path, stage) -> None:
    """Delete staging debris, manifest LAST: the manifest is the commit
    marker, so it must outlive every other staged byte or a cleanup crash
    would flip a committed swap back into the roll-back branch."""
    for s in list(fs.listStatus(stage)):
        if s.getPath().getName() != _MANIFEST:
            fs.delete(s.getPath(), s.isDirectory())
    fs.delete(Path(stage, _MANIFEST), False)
    fs.delete(stage, True)


def _recover_partition(jvm, fs, Path, root, stage) -> None:
    """Resolve a swap interrupted by a crash, using the staging manifest as
    the commit point.

    - manifest present: the staged generation (staging files + any already
      moved into the partition) is a complete snapshot — roll FORWARD by
      re-running the idempotent swap.
    - manifest absent: the staged write died mid-flight and the swap never
      started — roll BACK (restore any hidden originals defensively, drop
      the staged debris).
    """
    jdir = Path(root, stage.getName())
    committed = fs.exists(Path(stage, _MANIFEST))
    if committed and fs.exists(jdir):
        _swap_in_staged(jvm, fs, Path, jdir, stage)
    elif fs.exists(jdir):
        for s in list(fs.listStatus(jdir)):
            name = s.getPath().getName()
            if s.isFile() and name.startswith(_HIDDEN_ORIG):
                _rename_or_raise(fs, s.getPath(), Path(jdir, name[len(_HIDDEN_ORIG):]))
    _cleanup_stage(fs, Path, stage) if committed else fs.delete(stage, True)
