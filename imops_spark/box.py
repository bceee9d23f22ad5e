"""Box algebra: axis-aligned regions as min/max aggregates + range predicates.

Reference: ``/root/reference/imops/box.py`` — a Box is an immutable
``[2, ndim]`` int array ``[[start...], [stop...]]``.  The Spark analog of
``mask_to_box`` is a per-image min/max aggregation (the same statistics Parquet
row-group pruning uses, SURVEY.md §4 "boxed morphology" row).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .tensor_io import IMAGE_ID, VAL, TensorFrame

__all__ = [
    "make_box",
    "mask_to_box",
    "mask_to_box_df",
    "shape_to_box",
    "box_to_shape",
    "add_margin",
    "returns_box",
]


def make_box(iterable) -> np.ndarray:
    """Build an immutable [[start...],[stop...]] box (parity ``box.py:12-24``)."""
    box = np.asarray(iterable)
    if box.ndim != 2 or box.shape[0] != 2:
        raise ValueError(f"Box must have shape (2, ndim), got {box.shape}")
    if not (box[0] <= box[1]).all():
        raise ValueError(f"Box start must be <= stop, got {box}")
    box = box.copy()
    box.setflags(write=False)
    return box


def returns_box(fn):
    def wrapper(*args, **kwargs):
        return make_box(fn(*args, **kwargs))

    wrapper.__name__ = fn.__name__
    return wrapper


def mask_to_box_df(tf: TensorFrame) -> DataFrame:
    """Tight bounding box of true voxels, per image:
    ``(image_id, min0, max0, min1, max1, ...)`` with stop = max+1."""
    aggs = []
    for k, c in enumerate(tf.coords):
        aggs.append(F.min(c).alias(f"start{k}"))
        aggs.append((F.max(c) + 1).alias(f"stop{k}"))
    return tf.df.filter(F.col(VAL)).groupBy(IMAGE_ID).agg(*aggs)


@returns_box
def mask_to_box(mask_or_tf) -> np.ndarray:
    """Bounding box of a boolean mask (parity ``box.py:39-55``)."""
    if isinstance(mask_or_tf, TensorFrame):
        tf = mask_or_tf
        rows = mask_to_box_df(tf).collect()
        if not rows:
            raise ValueError("Mask is empty (no true voxels)")
        r = rows[0]
        return [
            [r[f"start{k}"] for k in range(tf.ndim)],
            [r[f"stop{k}"] for k in range(tf.ndim)],
        ]
    mask = np.asarray(mask_or_tf)
    if not mask.any():
        raise ValueError("Mask is empty (no true voxels)")
    idx = np.nonzero(mask)
    return [[int(i.min()) for i in idx], [int(i.max()) + 1 for i in idx]]


@returns_box
def shape_to_box(shape) -> np.ndarray:
    return [[0] * len(shape), list(shape)]


def box_to_shape(box) -> tuple[int, ...]:
    return tuple(int(v) for v in (box[1] - box[0]))


@returns_box
def add_margin(box, margin) -> np.ndarray:
    """Symmetrically expand a box (parity ``box.py:67-74``)."""
    box = np.asarray(box)
    margin = np.broadcast_to(np.asarray(margin), box.shape[1])
    return [box[0] - margin, box[1] + margin]
