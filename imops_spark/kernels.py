"""Vectorized numpy kernels — the engine's 'udf' backend.

These replicate the reference kernels' exact semantics
(``/root/reference/imops/src/_zoom.pyx``, ``src/_morphology.pyx``) in
vectorized numpy.  They serve two roles:

1. the ``backend='udf'`` strategy: per-image execution inside Arrow tasks
   (``tensor_io.map_blobs`` over blob tables) — the analog of the reference's
   Scipy backend, scaling by image count;
2. cross-checking the relational ('join') strategy: both backends must agree
   bit-for-bit on the same inputs (tested in tests/test_backends.py).
"""

from __future__ import annotations

import numpy as np

__all__ = ["zoom_numpy", "dilation_numpy", "erosion_numpy"]


def zoom_numpy(x: np.ndarray, scale, order: int = 1, fill_value: float = 0.0) -> np.ndarray:
    """Rescale with the reference's round()/grid-corner conventions
    (`src/_zoom.pyx:146-149,372-399`), vectorized over all output voxels."""
    x = np.asarray(x)
    ndim = x.ndim
    scale = np.broadcast_to(np.asarray(scale, dtype=float), (ndim,))
    new_shape = tuple(int(round(s * z)) for s, z in zip(x.shape, scale))
    coefs = [
        (x.shape[k] if new_shape[k] == 1 else (x.shape[k] - 1) / (new_shape[k] - 1))
        for k in range(ndim)
    ]
    # Per-axis source coordinates and floors.
    cs = [np.arange(new_shape[k]) * coefs[k] for k in range(ndim)]
    fs = [np.floor(c).astype(np.int64) for c in cs]
    fracs = [c - f for c, f in zip(cs, fs)]

    if order == 0:
        idxs = []
        for k in range(ndim):
            use_max = (fracs[k] >= 0.5) & (fs[k] + 1 < x.shape[k])
            idxs.append(np.where(use_max, fs[k] + 1, fs[k]))
        grid = np.meshgrid(*idxs, indexing="ij")
        return x[tuple(grid)]

    if order != 1:
        raise ValueError(f"Interpolation order {order} is not supported (only 0 and 1)")

    work = x.astype(np.float64, copy=False)
    out = np.zeros(new_shape, dtype=np.float64)
    for corner in np.ndindex(*([2] * ndim)):
        w = np.ones(new_shape)
        idx = []
        oob = np.zeros(new_shape, dtype=bool)
        for k in range(ndim):
            fk = fs[k] + corner[k]
            wk = fracs[k] if corner[k] else 1 - fracs[k]
            shape_k = [1] * ndim
            shape_k[k] = new_shape[k]
            w = w * wk.reshape(shape_k)
            oob |= ((fk < 0) | (fk >= x.shape[k])).reshape(shape_k)
            idx.append(np.clip(fk, 0, x.shape[k] - 1))
        grid = np.meshgrid(*idx, indexing="ij")
        vals = np.where(oob, float(fill_value), work[tuple(grid)])
        out += w * vals
    return out


def _shift_or(out, x, o, op):
    src = tuple(
        slice(max(0, -d), x.shape[k] - max(0, d)) for k, d in enumerate(o)
    )
    dst = tuple(
        slice(max(0, d), x.shape[k] - max(0, -d)) for k, d in enumerate(o)
    )
    if op == "or":
        out[dst] |= x[src]
    else:
        probe = np.ones_like(x)
        # erosion probe: x[p + o] with OOB=True
        psrc = tuple(
            slice(max(0, d), x.shape[k] - max(0, -d)) for k, d in enumerate(o)
        )
        pdst = tuple(
            slice(max(0, -d), x.shape[k] - max(0, d)) for k, d in enumerate(o)
        )
        probe[pdst] = x[psrc]
        out &= probe


def dilation_numpy(x: np.ndarray, offsets) -> np.ndarray:
    """X ⊕ B as a union of shifts (OOB=False, `_morphology.pyx:329`)."""
    out = np.zeros_like(x, dtype=bool)
    for o in offsets:
        _shift_or(out, x.astype(bool), o, "or")
    return out


def erosion_numpy(x: np.ndarray, offsets) -> np.ndarray:
    """X ⊖ B as an intersection of probes (OOB=True, `_morphology.pyx:319`)."""
    out = np.ones_like(x, dtype=bool)
    for o in offsets:
        _shift_or(out, x.astype(bool), o, "and")
    return out
