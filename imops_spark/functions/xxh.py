"""Pure-numpy XXH64 matching Spark's ``xxhash64`` bit-for-bit (seed 42).

Why this exists: the winnowing family's production fast path hashes
k-char grams with ``xxhash64``.  Computed JVM-side, the per-document
hash ARRAY needs either an interpreted higher-order ``transform``
(measured BIMODAL in long-lived mixed JVMs: 15→88 s pass-to-pass on the
same 320k-doc corpus — the round-6 simhash JIT lesson) or a 145M-row
explode + exchange + sort (the window form's stable-but-heavy shape).
Hashing INSIDE the Arrow kernel removes both: the kernel receives the
normalized strings, builds every gram hash with vectorized uint64
arithmetic, and no interpreted JVM expression is left to deoptimize.

The algorithm is the public XXH64 specification (Collet,
github.com/Cyan4973/xxHash): small-input path for < 32 bytes (one
accumulator), four-lane stripe path for >= 32.  Spark's ``xxhash64``
is exactly XXH64 with seed 42 over the UTF-8 bytes; bit-equality is
pinned by test against ``F.xxhash64`` for every gram width 1..40 and
for multi-byte text.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "xxh64_bytes",
    "xxh64_sliding",
    "xxh64_rows",
    "xxh64_chain_int",
    "SPARK_XXH64_SEED",
]

SPARK_XXH64_SEED = 42

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

_uP1 = np.uint64(_P1)
_uP2 = np.uint64(_P2)
_uP3 = np.uint64(_P3)
_uP4 = np.uint64(_P4)
_uP5 = np.uint64(_P5)


def _rotl_i(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def xxh64_bytes(data: bytes, seed: int = SPARK_XXH64_SEED) -> int:
    """Scalar XXH64 over arbitrary-length bytes, returned SIGNED (the
    BIGINT Spark's ``xxhash64`` produces).  The fallback path for
    multi-byte grams (whose UTF-8 widths vary) and for k >= 32."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = (_rotl_i((v1 + int.from_bytes(data[i : i + 8], "little") * _P2) & _M, 31) * _P1) & _M
            v2 = (_rotl_i((v2 + int.from_bytes(data[i + 8 : i + 16], "little") * _P2) & _M, 31) * _P1) & _M
            v3 = (_rotl_i((v3 + int.from_bytes(data[i + 16 : i + 24], "little") * _P2) & _M, 31) * _P1) & _M
            v4 = (_rotl_i((v4 + int.from_bytes(data[i + 24 : i + 32], "little") * _P2) & _M, 31) * _P1) & _M
            i += 32
        h = (_rotl_i(v1, 1) + _rotl_i(v2, 7) + _rotl_i(v3, 12) + _rotl_i(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl_i((v * _P2) & _M, 31) * _P1) & _M
            h = (h * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        k1 = (_rotl_i((int.from_bytes(data[i : i + 8], "little") * _P2) & _M, 31) * _P1) & _M
        h ^= k1
        h = (_rotl_i(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl_i(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl_i(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def _rotl_v(x: np.ndarray, r: int) -> np.ndarray:
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def xxh64_sliding(
    b: np.ndarray, k: int, seed: int = SPARK_XXH64_SEED
) -> np.ndarray:
    """XXH64(seed) of EVERY k-byte sliding window of ``b`` (uint8),
    vectorized over all ``len(b) - k + 1`` windows at once — int64 out,
    bit-identical to Spark's ``xxhash64(substring(s, p, k))`` on ASCII
    text.  Requires ``k < 32`` (the small-input path; winnowing grams
    are); larger k takes :func:`xxh64_bytes` per window upstream."""
    k = int(k)
    if k >= 32:
        raise ValueError(f"xxh64_sliding is the k < 32 path, got k={k}")
    n = len(b) - k + 1
    if n <= 0:
        return np.zeros(0, dtype=np.int64)
    sw = np.lib.stride_tricks.sliding_window_view(np.ascontiguousarray(b), k)
    return _xxh64_small_rows(sw, seed)


def xxh64_rows(mat: np.ndarray, seed: int = SPARK_XXH64_SEED) -> np.ndarray:
    """XXH64(seed) of each ROW of a 2D uint8 matrix ``(n, width)`` —
    the gather-then-hash form for VARIABLE-WIDTH grams grouped by byte
    length (multi-byte text: UTF-8 k-codepoint grams share a byte width
    within a group even though widths differ across grams).  Same
    small-input path as :func:`xxh64_sliding` (``width < 32``); int64
    out, bit-identical to ``xxhash64`` over each row's bytes."""
    if mat.ndim != 2:
        raise ValueError(f"xxh64_rows wants a 2D matrix, got ndim={mat.ndim}")
    if mat.shape[1] >= 32:
        raise ValueError(
            f"xxh64_rows is the width < 32 path, got width={mat.shape[1]}"
        )
    if mat.shape[0] == 0:
        return np.zeros(0, dtype=np.int64)
    return _xxh64_small_rows(mat, seed)


def _xxh64_small_rows(sw: np.ndarray, seed: int) -> np.ndarray:
    """Shared small-input (< 32 byte) XXH64 over the rows of a 2D uint8
    view — the compute body of :func:`xxh64_sliding` (strided windows)
    and :func:`xxh64_rows` (gathered windows)."""
    n, k = sw.shape
    with np.errstate(over="ignore"):
        h = np.full(n, np.uint64(seed) + _uP5 + np.uint64(k), dtype=np.uint64)
        off, rem = 0, k
        while rem >= 8:
            w = np.zeros(n, dtype=np.uint64)
            for j in range(8):  # little-endian u64
                w |= sw[:, off + j].astype(np.uint64) << np.uint64(8 * j)
            h ^= _rotl_v(w * _uP2, 31) * _uP1
            h = _rotl_v(h, 27) * _uP1 + _uP4
            off += 8
            rem -= 8
        if rem >= 4:
            w = np.zeros(n, dtype=np.uint64)
            for j in range(4):
                w |= sw[:, off + j].astype(np.uint64) << np.uint64(8 * j)
            h ^= w * _uP1
            h = _rotl_v(h, 23) * _uP2 + _uP3
            off += 4
            rem -= 4
        while rem > 0:
            h ^= sw[:, off].astype(np.uint64) * _uP5
            h = _rotl_v(h, 11) * _uP1
            off += 1
            rem -= 1
        h ^= h >> np.uint64(33)
        h *= _uP2
        h ^= h >> np.uint64(29)
        h *= _uP3
        h ^= h >> np.uint64(32)
    return h.view(np.int64)


def xxh64_chain_int(h: np.ndarray, value: int) -> np.ndarray:
    """The second step of Spark's multi-argument ``xxhash64(s, i)`` with an
    INT literal ``i``, vectorized over the first step's hashes: each input
    element (the int64 hash of ``s``) becomes the SEED, and ``value`` is
    hashed through the 4-byte XXH64 tail (Collet's spec: the <8-byte lane,
    then the avalanche).  ``xxhash64(s, i) == xxh64_chain_int(xxh64(s), i)``
    bit-for-bit — test-pinned against ``F.expr("xxhash64(s, i)")``.

    This is what makes a MULTI-HASH family nearly free on top of one
    sliding-hash pass: the expensive byte-gathering of ``xxh64_sliding``
    runs once, and each family member ``i`` costs only this 8-op chain.
    Input may be the int64 view or uint64; output is int64 (Spark BIGINT).
    """
    with np.errstate(over="ignore"):
        s = (
            h.view(np.uint64)
            if h.dtype == np.int64
            else h.astype(np.uint64, copy=False)
        )
        out = s + _uP5 + np.uint64(4)
        out = out ^ np.uint64((int(value) & 0xFFFFFFFF) * _P1 & _M)
        out = _rotl_v(out, 23) * _uP2 + _uP3
        out ^= out >> np.uint64(33)
        out *= _uP2
        out ^= out >> np.uint64(29)
        out *= _uP3
        out ^= out >> np.uint64(32)
    return out.view(np.int64)
