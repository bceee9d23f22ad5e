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
