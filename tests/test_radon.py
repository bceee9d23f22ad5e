"""Differential tests for radon / inverse_radon vs a numpy oracle that
re-derives the reference kernel math (src/_radon.pyx, src/_backprojection.pyx)."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from imops_spark.operators.radon import (
    _smooth_sharpen_filter,
    _sinogram_circle_to_square,
    inverse_radon,
    radon,
)
from imops_spark.testing import sample_ct


def np_radon(image, theta):
    """Oracle: direct loops replicating _radon.pyx accumulate/interpolate2d."""
    n_slices, size, _ = image.shape
    radius = size // 2
    xs = np.arange(-radius, size - radius)
    squared = xs**2
    limits = (((squared[:, None] + squared[None, :]) > (radius + 2) ** 2).sum(0) // 2).astype(int)
    rad = np.deg2rad(theta)
    sins, coss = np.sin(rad), np.cos(rad)
    center = size // 2
    r_shift = center * (coss + sins - 1)
    c_shift = center * (coss - sins - 1)

    def get(img, r, c):
        if r < 0 or r >= size or c < 0 or c >= size:
            return 0.0
        return img[r, c]

    def interp(img, r, c):
        minr, minc = int(np.floor(r)), int(np.floor(c))
        maxr, maxc = int(np.ceil(r)), int(np.ceil(c))
        dr, dc = r - minr, c - minc
        top = (1 - dc) * get(img, minr, minc) + dc * get(img, minr, maxc)
        bot = (1 - dc) * get(img, maxr, minc) + dc * get(img, maxr, maxc)
        return (1 - dr) * top + dr * bot

    out = np.zeros((n_slices, size, len(theta)))
    for s in range(n_slices):
        for a in range(len(theta)):
            for j in range(size):
                acc = 0.0
                for i in range(limits[j], size - limits[j]):
                    acc += interp(
                        image[s],
                        j * (-sins[a]) + i * coss[a] - c_shift[a],
                        j * coss[a] + i * sins[a] - r_shift[a],
                    )
                out[s, j, a] = acc
    return out


def np_iradon(sinogram, theta, fill_value=0.0, a=0, b=1):
    """Oracle replicating radon.py:105-201 + _backprojection.pyx."""
    output_size = sinogram.shape[1]
    sq = _sinogram_circle_to_square(sinogram)
    img_shape = sq.shape[1]
    pad_to = max(64, int(2 ** np.ceil(np.log2(2 * img_shape))))
    padded = np.pad(sq, ((0, 0), (0, pad_to - img_shape), (0, 0)))
    filt = _smooth_sharpen_filter(pad_to, a, b)
    filtered = np.real(np.fft.ifft(np.fft.fft(padded, axis=1) * filt, axis=1))[:, :img_shape, :]
    radius = output_size // 2
    xs = np.arange(-radius, output_size - radius)
    squared = xs**2
    inside = (squared[:, None] + squared[None, :]) <= radius**2
    rad = np.deg2rad(theta)
    sins, coss = np.sin(rad), np.cos(rad)
    mult = np.pi / (2 * len(theta))
    min_val = img_shape // 2
    right = img_shape - 1
    out = np.full((sinogram.shape[0], output_size, output_size), float(fill_value))
    moved = np.moveaxis(filtered, -1, -2)  # (slice, angle, pos)
    for s in range(sinogram.shape[0]):
        for i in range(output_size):
            for j in range(output_size):
                if not inside[i, j]:
                    continue
                acc = 0.0
                for k in range(len(theta)):
                    v = xs[j] * coss[k] - xs[i] * sins[k] + min_val
                    if v < 0 or v > right:
                        continue
                    idx = int(np.floor(v))
                    ys = moved[s, k]
                    acc += ys[idx] if idx == right else (ys[idx + 1] - ys[idx]) * (v - idx) + ys[idx]
                out[s, i, j] = acc * mult
    return out


def test_radon_matches_oracle(spark):
    # join backend: the distributed gather-join plan (auto would pick the
    # udf kernel for an input this small; that path is tested separately).
    ct = sample_ct(2, 24)
    theta = np.linspace(0, 180, 12, endpoint=False)
    got = radon(ct, axes=(1, 2), theta=theta, backend="join")
    exp = np_radon(ct, theta)
    assert_allclose(got, exp, rtol=1e-6, atol=1e-6)


def test_radon_2d_and_fill(spark):
    ct = sample_ct(1, 20, fill_value=-1000)
    got, fill = radon(ct[0], theta=8, return_fill=True)
    exp = np_radon(ct - (-1000) * 0, np.linspace(0, 180, 8, endpoint=False))
    assert fill == -1000
    # fill is subtracted-to-zero inside radon; oracle needs the zeroed image
    ct0 = ct.copy()
    ct0[:, :, :] = ct
    assert got.shape == (20, 8)


def test_radon_nonsquare_raises(spark):
    with pytest.raises(ValueError):
        radon(np.zeros((4, 5)))


def test_radon_nonconstant_outside_raises(spark):
    img = np.random.randn(10, 10) * 100
    with pytest.raises(ValueError, match="constant outside"):
        radon(img)


def test_iradon_matches_oracle(spark):
    ct = sample_ct(1, 20)
    theta = np.linspace(0, 180, 10, endpoint=False)
    sino = np_radon(ct, theta)
    got = inverse_radon(sino, axes=(1, 2), theta=theta, fill_value=-7.0, backend="join")
    exp = np_iradon(sino, theta, fill_value=-7.0)
    assert_allclose(got, exp, rtol=1e-6, atol=1e-6)


def test_iradon_theta_mismatch(spark):
    with pytest.raises(ValueError):
        inverse_radon(np.zeros((1, 8, 5)), axes=(1, 2), theta=np.arange(4.0))


def test_radon_udf_matches_oracle():
    ct = sample_ct(2, 24)
    theta = np.linspace(0, 180, 12, endpoint=False)
    got = radon(ct, axes=(1, 2), theta=theta, backend="udf")
    assert_allclose(got, np_radon(ct, theta), rtol=1e-5, atol=1e-5)


def test_iradon_udf_matches_oracle():
    ct = sample_ct(1, 20)
    theta = np.linspace(0, 180, 10, endpoint=False)
    sino = np_radon(ct, theta)
    got = inverse_radon(sino, axes=(1, 2), theta=theta, fill_value=-7.0, backend="udf")
    assert_allclose(got, np_iradon(sino, theta, fill_value=-7.0), rtol=1e-5, atol=1e-5)


def test_radon_float32_preserved():
    ct = sample_ct(1, 16).astype(np.float32)
    out = radon(ct, axes=(1, 2), theta=8, backend="udf")
    assert out.dtype == np.float32
    sino = np_radon(ct.astype(np.float64), np.linspace(0, 180, 8, endpoint=False))
    rec = inverse_radon(sino.astype(np.float32), axes=(1, 2), backend="udf")
    assert rec.dtype == np.float32


def test_radon_blob_path(spark):
    from imops_spark.tensor_io import decode_blobs, encode_blobs

    theta = np.linspace(0, 180, 9, endpoint=False)
    arrays = {i: sample_ct(1, 18)[0] for i in range(3)}
    blobs = encode_blobs(spark, arrays)
    out = decode_blobs(radon(blobs, theta=theta))
    # kernel gathers in float32: a couple of ulp relative to the f64 oracle
    for i, a in arrays.items():
        assert_allclose(out[i], np_radon(a[None], theta)[0], rtol=1e-4, atol=1e-2)
    # and back through the blob iradon
    sinos = {i: np_radon(a[None], theta)[0] for i, a in arrays.items()}
    rec = decode_blobs(inverse_radon(encode_blobs(spark, sinos), theta=theta, fill_value=0.0))
    for i, s in sinos.items():
        assert_allclose(rec[i], np_iradon(s[None], theta)[0], rtol=1e-4, atol=1e-2)


def test_radon_iradon_roundtrip(spark):
    # FBP of the radon transform should reconstruct the phantom (loose check,
    # the reference tests use 3-decimal agreement vs skimage on CT phantoms).
    ct = sample_ct(1, 28)
    theta = np.linspace(0, 180, 28, endpoint=False)
    sino = radon(ct, axes=(1, 2), theta=theta)
    rec = inverse_radon(sino, axes=(1, 2), theta=theta)
    radius = 28 // 2 - 2
    xs = np.arange(-14, 14)
    inner = (xs[:, None] ** 2 + xs[None, :] ** 2) <= radius**2
    corr = np.corrcoef(rec[0][inner], ct[0][inner])[0, 1]
    assert corr > 0.75  # FBP on a 28px two-material noise phantom is rough
