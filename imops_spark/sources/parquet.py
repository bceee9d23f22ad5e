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
]


def write_voxels(tf: TensorFrame, path: str, mode: str = "overwrite") -> None:
    """Write a voxel table sorted by (image_id, coords) for row-group pruning."""
    (
        tf.df.repartition(IMAGE_ID)
        .sortWithinPartitions(IMAGE_ID, *tf.coords)
        .write.mode(mode)
        .parquet(path)
    )


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
