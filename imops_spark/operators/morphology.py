"""Binary morphology: dilation/erosion/closing/opening + Euclidean distance
transform, as sparse neighbor-offset joins.

Reference semantics: ``/root/reference/imops/morphology.py:30-259`` with the
erosion/dilation duality and border rules of
``/root/reference/imops/src/_morphology.pyx:190-330`` (erosion: out-of-bounds
counts True; dilation: counts False; dilation = reflected-footprint erosion of
the complement).

Spark mapping (SURVEY.md §2.1 #5-9):
- **dilation** ``X ⊕ B``: the union of translates of X by B's offsets — only
  the *true* voxels join against the broadcast offset table, then a
  ``groupBy(coords)`` dedupes.  Shuffle volume = |trues| x |footprint|.
- **erosion** ``X ⊖ B``: a voxel dies iff some in-bounds footprint probe hits
  a false — only the *false* voxels generate "kill" positions; survivors =
  trues anti-joined with kills.  Shuffle volume = |falses| x |footprint|.
Each side processes only the minority class it needs — the same work-skipping
the reference gets from its ``boxed`` bbox optimization, obtained here from
sparsity instead.
"""

from __future__ import annotations

import warnings

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..backend import resolve_backend
from ..tensor_io import IMAGE_ID, VAL, TensorFrame, decode_volume, encode_volume
from ..utils import normalize_num_threads

__all__ = [
    "binary_dilation",
    "binary_erosion",
    "binary_closing",
    "binary_opening",
    "binary_dilation_df",
    "binary_erosion_df",
    "distance_transform_edt",
    "generate_binary_structure",
    "footprint_offsets",
]


def generate_binary_structure(rank: int, connectivity: int) -> np.ndarray:
    """Connectivity-c cross/ball structuring element (scipy-compatible)."""
    if rank < 1:
        return np.array(True, dtype=bool)
    output = np.fabs(np.indices([3] * rank) - 1)
    output = np.add.reduce(output, 0)
    return output <= connectivity


def footprint_offsets(footprint: np.ndarray) -> list[tuple[int, ...]]:
    """Offsets (pos - center) of true cells; center = shape//2 (scipy origin)."""
    footprint = np.asarray(footprint).astype(bool)
    center = np.array(footprint.shape) // 2
    return [tuple(int(v) for v in (pos - center)) for pos in np.argwhere(footprint)]


def _offsets_df(spark: SparkSession, offsets, ndim: int) -> DataFrame:
    schema = ", ".join(f"o{k} int" for k in range(ndim))
    return spark.createDataFrame([tuple(int(v) for v in o) for o in offsets], schema=schema)


def _shift(tf: TensorFrame, src: DataFrame, sign: int) -> DataFrame:
    """Shift coords by sign*offset and keep in-bounds rows."""
    out = src.select(
        IMAGE_ID,
        *[(F.col(c) + sign * F.col(f"o{k}")).alias(c) for k, c in enumerate(tf.coords)],
    )
    for k, c in enumerate(tf.coords):
        out = out.filter((F.col(c) >= 0) & (F.col(c) < tf.shape[k]))
    return out


def binary_dilation_df(tf: TensorFrame, footprint: np.ndarray | None = None) -> TensorFrame:
    """Dilation of a boolean voxel table (dense in, dense out).

    Voxel tables are dense by contract (one row per coordinate) so operators
    compose; the sparse true-set is only the intermediate join input.
    """
    footprint = generate_binary_structure(tf.ndim, 1) if footprint is None else footprint
    offsets = footprint_offsets(footprint)
    spark = tf.df.sparkSession
    trues = tf.df.filter(F.col(VAL)).select(IMAGE_ID, *tf.coords)
    shifted = trues.crossJoin(F.broadcast(_offsets_df(spark, offsets, tf.ndim)))
    hits = (
        _shift(tf, shifted, +1)
        .groupBy(IMAGE_ID, *tf.coords)
        .agg(F.lit(True).alias("__hit"))
    )
    grid = tf.df.select(IMAGE_ID, *tf.coords)
    out = grid.join(hits, on=[IMAGE_ID, *tf.coords], how="left").select(
        IMAGE_ID, *tf.coords, F.coalesce(F.col("__hit"), F.lit(False)).alias(VAL)
    )
    return tf.with_df(out)


def binary_erosion_df(tf: TensorFrame, footprint: np.ndarray | None = None) -> TensorFrame:
    """Erosion of a boolean voxel table (dense in, dense out).

    A grid position p fails iff x[p + o] is false for some in-bounds offset o
    (out-of-bounds probes count True, the scipy/reference border rule) —
    kills are generated from false voxels as p = q - o, then erosion output =
    grid-wide survivors.  Positions where x is false can still erode to True
    only if the footprint misses every false in-bounds probe; those are
    exactly the non-killed non-true positions, handled via the full grid.
    """
    footprint = generate_binary_structure(tf.ndim, 1) if footprint is None else footprint
    offsets = footprint_offsets(footprint)
    spark = tf.df.sparkSession
    falses = tf.df.filter(~F.col(VAL)).select(IMAGE_ID, *tf.coords)
    kills = (
        _shift(tf, falses.crossJoin(F.broadcast(_offsets_df(spark, offsets, tf.ndim))), -1)
        .groupBy(IMAGE_ID, *tf.coords)
        .agg(F.lit(True).alias("__kill"))
    )
    grid = tf.df.select(IMAGE_ID, *tf.coords)
    out = grid.join(kills, on=[IMAGE_ID, *tf.coords], how="left").select(
        IMAGE_ID, *tf.coords, F.col("__kill").isNull().alias(VAL)
    )
    return tf.with_df(out)


def _np_op(op_name):
    from ..kernels import dilation_numpy, erosion_numpy

    def run(arr, footprint):
        offsets = footprint_offsets(footprint)
        if op_name == "binary_dilation":
            return dilation_numpy(arr, offsets)
        if op_name == "binary_erosion":
            return erosion_numpy(arr, offsets)
        if op_name == "binary_closing":
            return erosion_numpy(dilation_numpy(arr, offsets), offsets)
        return dilation_numpy(erosion_numpy(arr, offsets), offsets)

    return run


def _morph_wrapper(op_name, df_op):
    def wrapped(
        image,
        footprint: np.ndarray | None = None,
        output=None,
        boxed: bool = False,
        num_threads: int = -1,
        backend=None,
    ):
        strategy = resolve_backend(backend)
        normalize_num_threads(num_threads)
        if output is not None:
            raise ValueError("output= (in-place) is not supported by the Spark engine")
        if isinstance(image, TensorFrame):
            return df_op(image, footprint)
        image = np.asarray(image).astype(bool)
        ndim = image.ndim
        if footprint is None:
            footprint = generate_binary_structure(ndim, 1)
        elif not footprint.size:
            raise RuntimeError("Footprint must not be empty.")
        if np.asarray(footprint).ndim != ndim:
            raise ValueError("Input image and footprint number of dimensions must be the same.")
        # Trivial-input short-circuits, parity with morphology.py:87-97.
        if not image.any():
            warnings.warn(
                f"{op_name} is applied to the fully False mask (mask.any() == False)."
            )
            return np.zeros_like(image)
        if image.all():
            warnings.warn(
                f"{op_name} is applied to the fully True mask (mask.all() == True)."
            )
            return np.ones_like(image)
        if strategy.name == "udf":
            # Per-image vectorized kernel — the reference's Scipy-backend
            # analog; on blob tables this runs inside Arrow tasks.
            return _np_op(op_name)(image, np.asarray(footprint))
        spark = SparkSession.getActiveSession()
        tf = encode_volume(spark, image)
        return decode_volume(df_op(tf, np.asarray(footprint)), default=False)

    wrapped.__name__ = op_name
    return wrapped


binary_dilation = _morph_wrapper("binary_dilation", binary_dilation_df)
binary_erosion = _morph_wrapper("binary_erosion", binary_erosion_df)


def _closing_df(tf, footprint):
    return binary_erosion_df(binary_dilation_df(tf, footprint), footprint)


def _opening_df(tf, footprint):
    return binary_dilation_df(binary_erosion_df(tf, footprint), footprint)


binary_closing = _morph_wrapper("binary_closing", _closing_df)
binary_opening = _morph_wrapper("binary_opening", _opening_df)


def morphology_blobs(blobs: DataFrame, op_name: str, footprint: np.ndarray | None = None) -> DataFrame:
    """Apply a morphology op per image over a blob table (udf strategy):
    one Arrow task per batch of images, vectorized numpy inside."""
    from ..tensor_io import map_blobs

    def run(arr):
        fp = generate_binary_structure(arr.ndim, 1) if footprint is None else footprint
        return _np_op(op_name)(arr.astype(bool), np.asarray(fp))

    return map_blobs(blobs, run)


# ---------------------------------------------------------------------------
# Euclidean distance transform
# ---------------------------------------------------------------------------

def _edt_1d_sq(f: np.ndarray, w: float) -> tuple[np.ndarray, np.ndarray]:
    """Felzenszwalb-Huttenlocher 1-D squared distance transform with argmin.

    ``f`` is the row of squared distances so far; ``w`` the axis sampling.
    Returns (d, arg) where arg[i] is the parabola index achieving d[i].
    """
    n = len(f)
    d = np.empty(n)
    arg = np.empty(n, dtype=np.int64)
    v = np.zeros(n, dtype=np.int64)  # parabola locations
    z = np.empty(n + 1)
    z[0], z[1] = -np.inf, np.inf
    k = 0
    w2 = w * w
    for q in range(1, n):
        if np.isinf(f[q]):
            continue
        while True:
            p = v[k]
            if np.isinf(f[p]):
                v[k] = q
                if k == 0:
                    z[0], z[k + 1] = -np.inf, np.inf
                    break
                k -= 1
                continue
            s = ((f[q] + w2 * q * q) - (f[p] + w2 * p * p)) / (2.0 * w2 * (q - p))
            if s <= z[k]:
                k -= 1
                if k < 0:
                    k = 0
                    v[0] = q
                    z[0], z[1] = -np.inf, np.inf
                    break
                continue
            k += 1
            v[k] = q
            z[k], z[k + 1] = s, np.inf
            break
    k = 0
    for q in range(n):
        while z[k + 1] < q:
            k += 1
        p = v[k]
        d[q] = w2 * (q - p) * (q - p) + f[p]
        arg[q] = p
    return d, arg


def edt_numpy(
    image: np.ndarray, sampling=None, return_distances=True, return_indices=False
):
    """Exact EDT in pure numpy (separable lower-envelope passes).

    The per-image kernel executed inside ``map_blobs`` by the distributed
    path; also the test oracle (the reference delegates to the external
    ``edt``/scipy C++ kernels, ``morphology.py:499-507``).
    """
    image = np.asarray(image).astype(bool)
    ndim = image.ndim
    if sampling is None:
        sampling = (1.0,) * ndim
    elif np.isscalar(sampling):
        sampling = (float(sampling),) * ndim
    sq = np.where(image, np.inf, 0.0)
    feat = None
    if return_indices:
        feat = np.stack(np.indices(image.shape))
    for ax in range(ndim):
        w = float(sampling[ax])
        moved = np.moveaxis(sq, ax, -1)
        shp = moved.shape
        flat = moved.reshape(-1, shp[-1])
        if return_indices:
            fmoved = [np.moveaxis(feat[a], ax, -1).reshape(-1, shp[-1]) for a in range(ndim)]
        for r in range(flat.shape[0]):
            d, arg = _edt_1d_sq(flat[r], w)
            if return_indices:
                for a in range(ndim):
                    fmoved[a][r] = fmoved[a][r][arg]
            flat[r] = d
        sq = np.moveaxis(flat.reshape(shp), -1, ax)
        if return_indices:
            feat = np.stack(
                [np.moveaxis(fa.reshape(shp), -1, ax) for fa in fmoved]
            )
    res = []
    if return_distances:
        res.append(np.sqrt(sq))
    if return_indices:
        res.append(feat.astype(np.int32))
    return res[0] if len(res) == 1 else tuple(res)


def distance_transform_edt(
    image,
    sampling=None,
    return_distances: bool = True,
    return_indices: bool = False,
    num_threads: int = -1,
    backend=None,
):
    """Exact Euclidean distance transform (parity ``morphology.py:372-521``).

    ndarray path runs the numpy kernel directly; TensorFrame/blob-table paths
    go through ``tensor_io.map_blobs`` (one Arrow task per image) — EDT's
    separable 3-pass structure is inherently per-volume, the documented UDF
    backend of this engine (SURVEY.md §2.1 #9).
    """
    resolve_backend(backend)
    normalize_num_threads(num_threads)
    if not (return_distances or return_indices):
        raise RuntimeError("At least one of `return_distances`/`return_indices` must be True")
    if isinstance(image, DataFrame):  # blob table
        from ..tensor_io import map_blobs

        if return_indices:
            raise ValueError("return_indices is only supported on the ndarray path")
        return map_blobs(image, lambda a: edt_numpy(a, sampling).astype(np.float32))
    return edt_numpy(
        np.asarray(image), sampling, return_distances=return_distances,
        return_indices=return_indices,
    )
