"""Test fixture helpers (parity ``/root/reference/imops/testing.py:9-59``)."""

from __future__ import annotations

from functools import wraps

import numpy as np

__all__ = ["sample_ct", "fill_outside", "seeded_by"]


def fill_outside(x: np.ndarray, fill_value: float) -> np.ndarray:
    """Zero (fill) everything outside the inscribed circle of each slice."""
    x = x.copy()
    size = x.shape[1]
    radius = size // 2
    xs = np.arange(-radius, size - radius)
    squared = xs**2
    outside = (squared[:, None] + squared[None, :]) > radius**2
    x[:, outside] = fill_value
    return x


def sample_ct(n_slices: int, size: int, fill_value: float = 0) -> np.ndarray:
    """Synthetic two-material CT phantom: water ~N(0,100), air ~N(-1000,100),
    constant outside the inscribed circle (``testing.py:26-43``)."""
    shape = (n_slices, size, size)
    water = np.random.normal(0, 100, size=shape)
    air = np.random.normal(-1000, 100, size=shape)
    choice = np.random.binomial(1, 0.5, size=shape).astype(bool)
    ct = np.where(choice, water, air)
    return fill_outside(ct, fill_value)


def seeded_by(seed: int):
    """Decorator fixing the numpy seed around a test (``testing.py:46-59``)."""

    def decorator(fn):
        @wraps(fn)
        def wrapper(*args, **kwargs):
            state = np.random.get_state()
            np.random.seed(seed)
            try:
                return fn(*args, **kwargs)
            finally:
                np.random.set_state(state)

        return wrapper

    return decorator
