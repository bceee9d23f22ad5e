"""Measurement operators: center_of_mass, label (connected components).

Reference semantics: ``/root/reference/imops/measure.py:33-229``.

Spark mapping (SURVEY.md §2.1 #11-12):
- ``center_of_mass`` is a pure aggregation: ``sum(val*i_k)/sum(val)`` per axis
  (reference kernel ``src/_measure.pyx:73-91``) — one shuffle, map-side partial
  aggregation, no UDFs; scales linearly with voxel count.
- ``label`` is an iterative min-label fixpoint over the voxel adjacency graph
  (reference delegates to cc3d's sequential union-find, ``measure.py:114-119``;
  a single-node union-find cannot scale past one machine, so we run the
  alternating neighbor-min + pointer-jumping scheme that converges in
  O(log diameter) rounds — the GraphFrames/large-star-small-star family).
  Final labels are renumbered 1..N in raster order of first occurrence via
  ``dense_rank`` to match skimage/cc3d numbering (`measure.py:62-73`).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..backend import dispatch_strategy, resolve_backend
from ..tensor_io import IMAGE_ID, VAL, TensorFrame, decode_volume, encode_volume
from ..utils import normalize_num_threads

__all__ = [
    "center_of_mass",
    "center_of_mass_df",
    "label",
    "label_df",
    "connectivity_offsets",
]


# ---------------------------------------------------------------------------
# center_of_mass
# ---------------------------------------------------------------------------

def center_of_mass_df(tf: TensorFrame, labels: DataFrame | None = None) -> DataFrame:
    """Per-image center of mass as a DataFrame ``(image_id, c0..c{ndim-1})``.

    With ``labels`` (a DataFrame with the same coord columns plus ``label``),
    returns ``(image_id, label, c0..)`` — the labeled variant
    (`measure.py:140-191`).
    """
    df = tf.df
    keys = [IMAGE_ID]
    if labels is not None:
        join_cols = [IMAGE_ID, *tf.coords]
        df = df.join(labels, on=join_cols, how="inner")
        keys = [IMAGE_ID, "label"]
    aggs = [
        (F.sum(F.col(VAL) * F.col(c)) / F.sum(VAL)).alias(f"c{k}")
        for k, c in enumerate(tf.coords)
    ]
    return df.groupBy(*keys).agg(*aggs)


def center_of_mass(
    array: np.ndarray,
    labels: np.ndarray | None = None,
    index: int | Sequence[int] | None = None,
    num_threads: int = -1,
    backend=None,
):
    """Mass-weighted mean coordinate; ndarray convenience wrapper.

    API parity with the reference (`measure.py:140-229`): returns a tuple for
    the global case, a list of tuples for the labeled/indexed case.
    """
    strategy = resolve_backend(backend)
    normalize_num_threads(num_threads)
    array = np.asarray(array)
    if array.dtype == bool:
        array = array.astype(np.float64)

    # Single-volume ndarray input: 'auto' size-dispatches — the per-image
    # kernel below the task-size threshold, the distributed voxel-table plan
    # above it (or when the caller forces 'join').
    if dispatch_strategy(strategy, array.nbytes) == "udf":
        from ..kernels import center_of_mass_numpy

        if labels is None:
            return center_of_mass_numpy(array)
        labels = np.asarray(labels)
        if labels.shape != array.shape:
            raise ValueError("labels must have the same shape as the input array")
        if index is None:
            index = [int(v) for v in np.unique(labels) if v != 0]
        if np.isscalar(index):
            return center_of_mass_numpy(array, labels, [int(index)])[0]
        return center_of_mass_numpy(array, labels, index)

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError("No active SparkSession; call get_spark() first")
    tf = encode_volume(spark, array.astype(np.float64, copy=False))

    if labels is None:
        row = center_of_mass_df(tf).collect()[0]
        return tuple(float(row[f"c{k}"]) for k in range(tf.ndim))

    labels = np.asarray(labels)
    if labels.shape != array.shape:
        raise ValueError("labels must have the same shape as the input array")
    if index is None:
        index = [int(v) for v in np.unique(labels) if v != 0]
    scalar = np.isscalar(index)
    index_list = [int(index)] if scalar else [int(v) for v in index]

    ltf = encode_volume(spark, labels.astype(np.int64))
    ldf = ltf.df.withColumnRenamed(VAL, "label").filter(F.col("label").isin(index_list))
    rows = {
        int(r["label"]): tuple(float(r[f"c{k}"]) for k in range(tf.ndim))
        for r in center_of_mass_df(tf, labels=ldf).collect()
    }
    nan = tuple(float("nan") for _ in range(tf.ndim))
    out = [rows.get(i, nan) for i in index_list]
    return out[0] if scalar else out


# ---------------------------------------------------------------------------
# label
# ---------------------------------------------------------------------------

def connectivity_offsets(ndim: int, connectivity: int) -> list[tuple[int, ...]]:
    """Positive-direction neighbor offsets for a given connectivity.

    connectivity c: neighbors differing in at most c axes by +-1
    (reference translation table `measure.py:22-29`).  Only lexicographically
    positive offsets are returned (each undirected edge generated once).
    """
    if not 1 <= connectivity <= ndim:
        raise ValueError(
            f"Connectivity for {ndim}D image should be in [1, ..., {ndim}], got {connectivity}"
        )
    offsets = []
    for raw in np.ndindex(*([3] * ndim)):
        off = tuple(int(v) - 1 for v in raw)
        nz = [v for v in off if v != 0]
        if not nz or len(nz) > connectivity:
            continue
        if off > tuple([0] * ndim):  # lexicographic positivity
            offsets.append(off)
    return offsets


def label_df(
    tf: TensorFrame,
    background: int = 0,
    connectivity: int | None = None,
    max_iterations: int = 50,
) -> DataFrame:
    """Connected-component labels as ``(image_id, i0.., label)`` (foreground only).

    skimage semantics: equal-valued neighboring voxels share a component;
    ``background``-valued voxels get no row (label 0 implicitly).  Labels are
    1..N in raster order of each component's first voxel.
    """
    ndim = tf.ndim
    connectivity = ndim if connectivity is None else connectivity
    offsets = connectivity_offsets(ndim, connectivity)
    spark = tf.df.sparkSession

    # Linear raster id doubles as the initial component id.
    lin = None
    for k, c in enumerate(tf.coords):
        stride = int(np.prod(tf.shape[k + 1:], dtype=np.int64))
        term = F.col(c).cast("long") * F.lit(stride)
        lin = term if lin is None else lin + term

    fg = (
        tf.df.filter(F.col(VAL) != F.lit(background))
        .select(IMAGE_ID, *tf.coords, VAL, lin.alias("node"))
    )
    fg = fg.localCheckpoint()

    # Edge list: one shuffle join per build; offsets are a tiny broadcast.
    off_df = spark.createDataFrame(
        [tuple(int(v) for v in o) for o in offsets],
        schema=", ".join(f"o{k} int" for k in range(ndim)),
    )
    shifted = fg.crossJoin(F.broadcast(off_df)).select(
        IMAGE_ID,
        *[(F.col(c) + F.col(f"o{k}")).alias(c) for k, c in enumerate(tf.coords)],
        F.col(VAL),
        F.col("node").alias("src"),
    )
    edges = (
        shifted.join(fg, on=[IMAGE_ID, *tf.coords, VAL], how="inner")
        .select(IMAGE_ID, "src", F.col("node").alias("dst"))
    )
    from .graph import connected_components_df

    comp = connected_components_df(
        edges,
        nodes=fg.select(IMAGE_ID, "node"),
        partition_cols=[IMAGE_ID],
        max_iterations=max_iterations,
    )

    # Renumber 1..N in raster order: root == min linear id of the component,
    # so dense_rank over root ascending reproduces first-encounter numbering.
    w = Window.partitionBy(IMAGE_ID).orderBy("comp")
    out = (
        comp.withColumn("label", F.dense_rank().over(w))
        .join(fg.select(IMAGE_ID, *tf.coords, "node"), on=[IMAGE_ID, "node"])
        .select(IMAGE_ID, *tf.coords, F.col("label").cast("long").alias("label"))
    )
    return out


def label_blobs(blobs: DataFrame, background: int = 0, connectivity: int | None = None) -> DataFrame:
    """Connected-component labeling per image over a blob table (udf
    strategy): one vectorized pass per image inside Arrow tasks."""
    from ..kernels import label_numpy
    from ..tensor_io import map_blobs

    def run(arr):
        labels, _ = label_numpy(arr, background=background, connectivity=connectivity)
        return labels

    return map_blobs(blobs, run)


def _min_label_dtype(n: int) -> np.dtype:
    # Minimal-width unsigned output, parity with `measure.py:62-73`.
    for dt in (np.uint16, np.uint32, np.uint64):
        if n <= np.iinfo(dt).max:
            return np.dtype(dt)
    return np.dtype(np.uint64)


def label(
    label_image: np.ndarray,
    background: int = 0,
    connectivity: int | None = None,
    return_num: bool = False,
    return_labels: bool = False,
    return_sizes: bool = False,
    dtype: type | None = None,
    backend=None,
):
    """Connected-component labeling; ndarray wrapper (`measure.py:33-137`).

    ``backend`` (engine extension): 'join' runs the distributed fixpoint,
    'udf' the per-image vectorized kernel (kernels.label_numpy), and 'auto'
    (default) size-dispatches between them — the hybrid used at scale:
    in-memory images take one Arrow pass, oversized ones the iterative
    join path.
    """
    arr = np.asarray(label_image)
    ndim = arr.ndim
    connectivity = ndim if connectivity is None else connectivity
    if not 1 <= connectivity <= ndim:
        raise ValueError(
            f"Connectivity for {ndim}D image should be in [1, ..., {ndim}], got {connectivity}"
        )
    squeeze_1d = False
    if ndim == 1:  # 1-D promoted to 2-D, parity with `measure.py:103-104`
        arr = arr[None]
        squeeze_1d = True
        connectivity = min(connectivity + 1, 2)

    strategy = resolve_backend(backend)
    # 'auto' size-dispatch: a volume that fits one task must not pay the
    # multi-round distributed CC fixpoint; oversized volumes still take it.
    if dispatch_strategy(strategy, arr.nbytes) == "udf":
        from ..kernels import label_numpy

        labeled64, n = label_numpy(
            arr.astype(np.int64), background=background, connectivity=connectivity
        )
        sizes_arr = np.bincount(labeled64[labeled64 > 0]) if n else np.zeros(1, np.int64)
        out_dtype = np.dtype(dtype) if dtype is not None else _min_label_dtype(max(n, 1))
        labeled = labeled64.astype(out_dtype)
        if squeeze_1d:
            labeled = labeled[0]
        res = [labeled]
        if return_num:
            res.append(int(n))
        if return_labels:
            res.append(np.arange(1, int(n) + 1, dtype=out_dtype))
        if return_sizes:
            res.append(sizes_arr[1:].astype(np.int64))
        return res[0] if len(res) == 1 else tuple(res)

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError("No active SparkSession; call get_spark() first")
    tf = encode_volume(spark, arr.astype(np.int64))
    out_df = label_df(tf, background=background, connectivity=connectivity)

    n = out_df.agg(F.max("label")).collect()[0][0] or 0
    out_dtype = np.dtype(dtype) if dtype is not None else _min_label_dtype(max(n, 1))
    labeled_tf = TensorFrame(
        df=out_df.withColumnRenamed("label", VAL), shape=tf.shape, dtype=out_dtype
    )
    labeled = decode_volume(labeled_tf, default=0)
    if squeeze_1d:
        labeled = labeled[0]

    res = [labeled]
    if return_num:
        res.append(int(n))
    if return_labels:
        res.append(np.arange(1, int(n) + 1, dtype=out_dtype))
    if return_sizes:
        sizes_rows = out_df.groupBy("label").count().orderBy("label").collect()
        res.append(np.array([r["count"] for r in sizes_rows], dtype=np.int64))
    return res[0] if len(res) == 1 else tuple(res)
