"""Tests for convex_hull_image: invariants + numpy scanline oracle."""

import numpy as np
import pytest
from numpy.testing import assert_array_equal

from imops_spark.operators.convex_hull import (
    _offset_candidates,
    convex_hull_image,
    monotone_chain,
)


def np_raster(verts, M, N):
    """Independent numpy replication of _grid_points_in_poly (float32 + fudge)."""
    verts = verts.astype(np.float32)
    lb = np.full(M, np.inf)
    rb = np.full(M, -1.0)
    assigned = np.zeros(M, dtype=bool)
    nv = len(verts)
    for i in range(nv):
        px, py = verts[(i - 1) % nv]
        cx, cy = verts[i]
        if px == cx:
            x = int(np.floor(px) if py < cy else np.ceil(px))
            assigned[x] = True
            lb[x] = min(lb[x], py, cy)
            rb[x] = max(rb[x], py, cy)
        else:
            fx, fy, tx, ty = (px, py, cx, cy) if px < cx else (cx, cy, px, py)
            for x in range(int(np.ceil(fx)), int(np.floor(tx + 1))):
                t = (x - fx) / (tx - fx)
                y = fy * (1 - t) + ty * t
                assigned[x] = True
                lb[x] = min(lb[x], y)
                rb[x] = max(rb[x], y)
    out = np.zeros((M, N), dtype=bool)
    for m in range(M):
        if assigned[m]:
            lo = max(0, int(np.ceil(np.float32(lb[m] - np.float32(0.2)))))
            hi = min(N - 1, int(np.floor(np.float32(rb[m] + np.float32(0.2)))))
            out[m, lo : hi + 1] = True
    return out


def oracle_hull_image(img, offset_coordinates=True):
    rows = []
    for i in range(img.shape[0]):
        cols = np.nonzero(img[i])[0]
        if len(cols):
            rows.append((i, cols[0]))
            rows.append((i, cols[-1]))
    bounds = np.array(sorted(set(rows)), dtype=np.float64)
    pts = _offset_candidates(bounds) if offset_coordinates else bounds
    verts = monotone_chain(pts)
    if len(verts) < 3:
        return np.zeros(img.shape, dtype=bool)
    return np_raster(verts, *img.shape)


def test_monotone_chain_square():
    pts = np.array([[0, 0], [0, 2], [2, 0], [2, 2], [1, 1]])
    hull = monotone_chain(pts)
    assert len(hull) == 4
    assert {tuple(v) for v in hull} == {(0, 0), (0, 2), (2, 0), (2, 2)}


@pytest.mark.parametrize("p", [0.1, 0.35])
def test_hull_matches_oracle(spark, p):
    img = np.random.binomial(1, p, (20, 24)).astype(bool)
    img[3, 4] = True
    got = convex_hull_image(img)
    assert_array_equal(got, oracle_hull_image(img))


def test_hull_contains_input(spark):
    img = np.random.binomial(1, 0.2, (15, 15)).astype(bool)
    img[7, 7] = True
    got = convex_hull_image(img)
    assert (got | img == got).all()


def test_hull_of_rectangle_is_rectangle(spark):
    img = np.zeros((12, 12), dtype=bool)
    img[3:8, 2:9] = True
    got = convex_hull_image(img)
    assert_array_equal(got, img)


def test_hull_no_offset(spark):
    img = np.random.binomial(1, 0.3, (14, 14)).astype(bool)
    img[2, 3] = True
    got = convex_hull_image(img, offset_coordinates=False)
    assert_array_equal(got, oracle_hull_image(img, offset_coordinates=False))


def test_hull_multi_image(spark):
    """Multi-image voxel tables must yield one hull per image_id."""
    from imops_spark.operators.convex_hull import convex_hull_image as chi
    from imops_spark.tensor_io import decode_volume, encode_volumes

    rng = np.random.default_rng(7)
    imgs = {}
    for k in range(3):
        im = rng.binomial(1, 0.15 + 0.1 * k, (16, 18)).astype(bool)
        im[k + 2, k + 3] = True
        imgs[k] = im
    tf = encode_volumes(spark, imgs)
    out = chi(tf)
    for k, im in imgs.items():
        got = decode_volume(out, image_id=k, default=False)
        assert_array_equal(got, oracle_hull_image(im)), f"image {k}"


def test_hull_empty(spark):
    assert not convex_hull_image(np.zeros((5, 5), dtype=bool)).any()


def test_hull_3d_raises(spark):
    with pytest.raises(ValueError):
        convex_hull_image(np.zeros((3, 3, 3), dtype=bool))
