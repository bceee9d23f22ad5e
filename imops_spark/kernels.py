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

__all__ = ["zoom_numpy", "dilation_numpy", "erosion_numpy", "label_numpy"]


def label_numpy(arr: np.ndarray, background: int = 0, connectivity: int | None = None):
    """Connected components by vectorized min-label propagation.

    Per-image kernel for the 'udf' strategy: O(diameter) full-array sweeps,
    each a handful of numpy shift/minimum ops — the in-memory counterpart of
    the distributed pointer-jumping loop (operators/graph.py).  skimage
    numbering (1..N in raster order of first occurrence).  Returns
    (labels int64 array, n_components).
    """
    arr = np.asarray(arr)
    ndim = arr.ndim
    connectivity = ndim if connectivity is None else connectivity
    fg = arr != background
    lab = np.where(fg, np.arange(arr.size, dtype=np.int64).reshape(arr.shape), -1)

    offsets = []
    for raw in np.ndindex(*([3] * ndim)):
        off = tuple(v - 1 for v in raw)
        nz = [v for v in off if v != 0]
        if nz and len(nz) <= connectivity and off > tuple([0] * ndim):
            offsets.append(off)

    def sweep(cur):
        new = cur.copy()
        for off in offsets:
            src = tuple(slice(max(0, o), arr.shape[k] - max(0, -o)) for k, o in enumerate(off))
            dst = tuple(slice(max(0, -o), arr.shape[k] - max(0, o)) for k, o in enumerate(off))
            # neighbors connected only when foreground AND equal-valued
            ok = fg[src] & fg[dst] & (arr[src] == arr[dst])
            new[dst] = np.where(ok, np.minimum(new[dst], new[src]), new[dst])
            new[src] = np.where(ok, np.minimum(new[src], new[dst]), new[src])
        return new

    while True:
        new = sweep(lab)
        if (new == lab).all():
            break
        lab = new

    roots = np.unique(lab[fg])
    remap = {int(r): i + 1 for i, r in enumerate(roots)}  # raster order == root order
    out = np.zeros(arr.shape, dtype=np.int64)
    if len(roots):
        lut = np.zeros(int(roots.max()) + 1, dtype=np.int64)
        for r, v in remap.items():
            lut[r] = v
        out[fg] = lut[lab[fg]]
    return out, len(roots)


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
