"""Linear2DInterpolator: Delaunay triangulation + barycentric interpolation.

Reference: ``/root/reference/imops/interp2d.py:12-121`` with the C++
triangulation walk ``cpp/interp2d/triangulator.h:13-198`` and barycentric
evaluation ``triangulator.h:176-197``.

Spark design (SURVEY.md §2.1 #4): triangulation is inherently sequential, so
it runs once on the driver (Bowyer-Watson, pure numpy — the reference runs
vendored delaunator on one thread the same way).  *Evaluation* is the
parallel part: the triangle table (index triple + vertex coords + values) is
broadcast and query points probe it — here via a vectorized per-batch numpy
kernel over ``mapInPandas``, the same point-in-triangle math the reference
parallelizes with OpenMP.  ``interp2d_batch_df`` evaluates many independent
point sets per Arrow task (the 100 TB shape: millions of small scattered-data
problems, one per group).
"""

from __future__ import annotations

import numpy as np

from ..utils import normalize_num_threads

__all__ = ["Linear2DInterpolator", "delaunay_bw", "interp2d_batch_df"]


def delaunay_bw(points: np.ndarray) -> np.ndarray:
    """Bowyer-Watson Delaunay triangulation; returns [n_tri, 3] index array.

    O(n^2) incremental construction — adequate for the per-set sizes this
    operator sees (the reference's delaunator is also a single-threaded
    build; only evaluation parallelizes).
    """
    pts = np.asarray(points, dtype=np.float64)
    n = len(pts)
    if n < 3:
        return np.empty((0, 3), dtype=np.int64)
    # Super-triangle enclosing everything.
    cmin, cmax = pts.min(0), pts.max(0)
    c = (cmin + cmax) / 2
    d = max(float((cmax - cmin).max()), 1.0) * 64
    sup = np.array([[c[0] - 2 * d, c[1] - d], [c[0] + 2 * d, c[1] - d], [c[0], c[1] + 2 * d]])
    allp = np.vstack([pts, sup])

    def circum(tri_arr):
        """Circumcenters + squared radii for [T,3] index rows (vectorized).
        Degenerate triangles get r2 = -1 so they never test as 'bad'."""
        a, b, cc = allp[tri_arr[:, 0]], allp[tri_arr[:, 1]], allp[tri_arr[:, 2]]
        ax, ay = a[:, 0], a[:, 1]
        bx, by = b[:, 0], b[:, 1]
        cx, cy = cc[:, 0], cc[:, 1]
        dd = 2 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
        ok = dd != 0
        safe = np.where(ok, dd, 1.0)
        ux = ((ax**2 + ay**2) * (by - cy) + (bx**2 + by**2) * (cy - ay) + (cx**2 + cy**2) * (ay - by)) / safe
        uy = ((ax**2 + ay**2) * (cx - bx) + (bx**2 + by**2) * (ax - cx) + (cx**2 + cy**2) * (bx - ax)) / safe
        centers = np.stack([ux, uy], axis=1)
        r2 = ((a - centers) ** 2).sum(1)
        r2[~ok] = -1.0
        return centers, r2

    # Growable parallel arrays of live triangles; the bad-triangle search per
    # insertion is one vectorized distance test over all live triangles
    # (numpy row-batched — no per-triangle Python loop).
    cap = max(16, 4 * n)
    tri_buf = np.empty((cap, 3), dtype=np.int64)
    cen_buf = np.empty((cap, 2), dtype=np.float64)
    r2_buf = np.empty(cap, dtype=np.float64)
    tri_buf[0] = (n, n + 1, n + 2)
    cen_buf[:1], r2_buf[:1] = circum(tri_buf[:1])
    size = 1
    for i in range(n):
        p = allp[i]
        d2 = ((cen_buf[:size] - p) ** 2).sum(1)
        bad = np.nonzero(d2 <= r2_buf[:size] * (1 + 1e-12))[0]
        # Boundary polygon of the bad-triangle cavity.
        edge_count: dict = {}
        for bi in bad:
            t = tri_buf[bi]
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                key = (min(e), max(e)) if e[0] > e[1] else (e[0], e[1])
                edge_count[key] = edge_count.get(key, 0) + 1
        new_tris = [(u, v, i) for (u, v), cnt in edge_count.items() if cnt == 1]
        # Compact out the bad rows, then append the cavity re-triangulation.
        if len(bad):
            keep = np.ones(size, dtype=bool)
            keep[bad] = False
            ksize = int(keep.sum())
            tri_buf[:ksize] = tri_buf[:size][keep]
            cen_buf[:ksize] = cen_buf[:size][keep]
            r2_buf[:ksize] = r2_buf[:size][keep]
            size = ksize
        if new_tris:
            need = size + len(new_tris)
            if need > len(tri_buf):
                cap = max(need, 2 * len(tri_buf))
                tri_buf = np.resize(tri_buf, (cap, 3))
                cen_buf = np.resize(cen_buf, (cap, 2))
                r2_buf = np.resize(r2_buf, cap)
            newt = np.asarray(new_tris, dtype=np.int64)
            tri_buf[size:need] = newt
            cen_buf[size:need], r2_buf[size:need] = circum(newt)
            size = need
    live = tri_buf[:size]
    out = live[live.max(axis=1) < n]
    return np.array(sorted(tuple(sorted(t)) for t in out.tolist()), dtype=np.int64)


def _barycentric_eval(
    tri_pts: np.ndarray, tri_vals: np.ndarray, queries: np.ndarray, fill_value: float
) -> np.ndarray:
    """Vectorized point-in-triangle + barycentric interpolation.

    tri_pts: [T,3,2]; tri_vals: [T,3]; queries: [Q,2].  For each query, find a
    containing triangle (eps-tolerant, matching ``triangulator.h:176-197``)
    and lerp; outside the hull -> fill_value.
    """
    out = np.full(len(queries), float(fill_value))
    if len(tri_pts) == 0 or len(queries) == 0:
        return out
    a, b, c = tri_pts[:, 0], tri_pts[:, 1], tri_pts[:, 2]
    det = (b[:, 1] - c[:, 1]) * (a[:, 0] - c[:, 0]) + (c[:, 0] - b[:, 0]) * (a[:, 1] - c[:, 1])
    ok = det != 0
    remaining = np.arange(len(queries))
    # Chunk over triangles to bound the Q x T temp (driver/executor memory).
    chunk = max(1, int(4e6 / max(len(queries), 1)))
    eps = 1e-9
    for start in range(0, len(tri_pts), chunk):
        idx = np.nonzero(ok[start : start + chunk])[0] + start
        if len(idx) == 0 or len(remaining) == 0:
            continue
        q = queries[remaining]
        aa, bb, cc, dd = a[idx], b[idx], c[idx], det[idx]
        l1 = ((bb[:, 1] - cc[:, 1])[None, :] * (q[:, 0, None] - cc[None, :, 0])
              + (cc[:, 0] - bb[:, 0])[None, :] * (q[:, 1, None] - cc[None, :, 1])) / dd[None, :]
        l2 = ((cc[:, 1] - aa[:, 1])[None, :] * (q[:, 0, None] - cc[None, :, 0])
              + (aa[:, 0] - cc[:, 0])[None, :] * (q[:, 1, None] - cc[None, :, 1])) / dd[None, :]
        l3 = 1.0 - l1 - l2
        inside = (l1 >= -eps) & (l2 >= -eps) & (l3 >= -eps)
        hit = inside.any(axis=1)
        if not hit.any():
            continue
        first = inside[hit].argmax(axis=1)
        rows = remaining[hit]
        tsel = idx[first]
        v = tri_vals[tsel]
        lam = np.stack(
            [l1[hit, first], l2[hit, first], l3[hit, first]], axis=1
        )
        out[rows] = (lam * v).sum(axis=1)
        remaining = remaining[~hit]
    return out


class Linear2DInterpolator:
    """Drop-in for the reference's Linear2DInterpolator (interp2d.py:12-121)."""

    def __init__(
        self,
        points: np.ndarray,
        values: np.ndarray | None = None,
        num_threads: int = 1,
        triangles: np.ndarray | None = None,
        **kwargs,
    ):
        if triangles is not None:
            if not isinstance(triangles, np.ndarray):
                raise TypeError(
                    f"Wrong type of `triangles` argument, expected np.ndarray. Got {type(triangles)}"
                )
            if triangles.ndim != 2 or triangles.shape[1] != 3:
                raise ValueError("Passed `triangles` argument has an incorrect shape")
        if not isinstance(points, np.ndarray):
            raise TypeError(
                f"Wrong type of `points` argument, expected np.ndarray. Got {type(points)}"
            )
        if points.ndim != 2 or points.shape[1] != 2:
            raise ValueError("Passed `points` argument has an incorrect shape")
        if values is not None:
            if not isinstance(values, np.ndarray):
                raise TypeError(
                    f"Wrong type of `values` argument, expected np.ndarray. Got {type(values)}"
                )
            if values.ndim > 1:
                raise ValueError(
                    f"Wrong shape of `values` argument, expected ndim=1. Got shape {values.shape}"
                )
        self.points = np.asarray(points, dtype=np.float64)
        self.values = values
        self.triangles = (
            np.asarray(triangles, dtype=np.int64) if triangles is not None else delaunay_bw(self.points)
        )
        self.num_threads = normalize_num_threads(num_threads)

    def __call__(
        self, points: np.ndarray, values: np.ndarray | None = None, fill_value: float = 0.0
    ) -> np.ndarray:
        if values is None:
            values = self.values
        if values is None:
            raise ValueError(
                "`values` argument was never passed neither in __init__ or __call__ methods"
            )
        if not isinstance(values, np.ndarray):
            raise TypeError(
                f"Wrong type of `values` argument, expected np.ndarray. Got {type(values)}"
            )
        if values.ndim > 1:
            raise ValueError(
                f"Wrong shape of `values` argument, expected ndim=1. Got shape {values.shape}"
            )
        if not isinstance(points, np.ndarray):
            raise TypeError(
                f"Wrong type of `points` argument, expected np.ndarray. Got {type(points)}"
            )
        if points.ndim != 2 or points.shape[1] != 2:
            raise ValueError("Passed `points` argument has an incorrect shape")
        tri_pts = self.points[self.triangles]
        tri_vals = np.asarray(values, dtype=np.float64)[self.triangles]
        return _barycentric_eval(
            tri_pts, tri_vals, np.asarray(points, dtype=np.float64), fill_value
        )


def interp2d_batch_df(point_sets, fill_value: float = 0.0):
    """Distributed scattered interpolation over many independent point sets.

    ``point_sets``: DataFrame ``(set_id, x, y, v)`` where rows with non-null
    ``v`` are knots and null-``v`` rows are queries (FIXTURES.md F6 layout).
    Returns ``(set_id, x, y, v_interp)`` for the query rows.  One Arrow task
    per set — triangulate + evaluate with the same kernels as the class.

    Knots are deduplicated per (x, y) (max ``v`` wins) and sorted before
    triangulation: Bowyer-Watson insertion order decides the triangulation in
    near-cocircular configurations, so without a canonical order the result
    would depend on Spark's partitioning/row arrival order.
    """
    import pandas as pd

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        knots = (
            pdf[pdf["v"].notna()]
            .groupby(["x", "y"], as_index=False)["v"].max()
            .sort_values(["x", "y"], kind="mergesort")
        )
        queries = pdf[pdf["v"].isna()]
        if len(knots) < 3 or len(queries) == 0:
            return pd.DataFrame({"set_id": [], "x": [], "y": [], "v_interp": []}).astype(
                {"set_id": "int64", "x": "int64", "y": "int64", "v_interp": "float64"}
            )
        interp = Linear2DInterpolator(
            knots[["x", "y"]].to_numpy(dtype=np.float64),
            knots["v"].to_numpy(dtype=np.float64),
        )
        out = interp(queries[["x", "y"]].to_numpy(dtype=np.float64), fill_value=fill_value)
        return pd.DataFrame(
            {
                "set_id": queries["set_id"].to_numpy(),
                "x": queries["x"].to_numpy(),
                "y": queries["y"].to_numpy(),
                "v_interp": out,
            }
        )

    return point_sets.groupBy("set_id").applyInPandas(
        run, schema="set_id long, x long, y long, v_interp double"
    )
