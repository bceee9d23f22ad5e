"""Execution-strategy registry (API parity with the reference's backend system).

The reference (``/root/reference/imops/backend.py:7-95``) exposes a ``Backend``
class registry plus ``set_backend`` / ``imops_backend`` context manager that pick
which compiled kernel executes an operator.  In a Spark engine the equivalent
choice is *physical strategy*: express an operator as Catalyst-native DataFrame
algebra (joins/aggregates, scales horizontally) or as an Arrow-batched
``applyInPandas`` kernel over per-image blobs (single-pass NumPy, scales by
image count).  We keep the reference's API shape so callers can port unchanged:

    set_backend('join')            # force relational strategy
    with imops_backend('udf'):     # scoped override
        ...

Strategies:
- ``'join'`` — voxel-table relational plans (default for correctness tests).
- ``'udf'``  — per-image Arrow/pandas kernels over blob tables.
- ``'auto'`` — operator picks by input size (the reference's dispatch analog).

Unknown names raise ``ValueError`` like the reference's ``resolve_backend``
(`backend.py:29-48`).
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from dataclasses import dataclass, field

__all__ = [
    "Backend",
    "BACKENDS",
    "set_backend",
    "get_backend",
    "imops_backend",
    "resolve_backend",
]


@dataclass(frozen=True)
class Backend:
    """A named execution strategy (analog of reference ``Backend`` dataclass)."""

    name: str
    # Hints consumed by operators; partitioning analog of num_threads.
    options: dict = field(default_factory=dict)

    def __init_subclass__(cls, **kwargs):  # registry, mirrors backend.py:7-26
        super().__init_subclass__(**kwargs)
        BACKENDS[cls.__name__.lower()] = cls


BACKENDS: dict[str, type] = {}
_VALID = ("join", "udf", "auto")

_state = threading.local()


def _current() -> str:
    return getattr(_state, "backend", "auto")


def resolve_backend(backend: str | Backend | None) -> Backend:
    """Normalize str/Backend/None to a Backend, raising on unknown names."""
    if backend is None:
        return Backend(_current())
    if isinstance(backend, Backend):
        return backend
    if isinstance(backend, type) and issubclass(backend, Backend):
        return backend()  # type: ignore[call-arg]
    if isinstance(backend, str):
        name = backend.lower()
        # Accept the reference's backend names for drop-in compatibility:
        # Cython/Numba were its fast in-process kernels -> our relational path;
        # Scipy was its fallback kernel -> our per-image UDF path.
        alias = {"cython": "join", "numba": "join", "scipy": "udf"}
        name = alias.get(name, name)
        if name not in _VALID:
            raise ValueError(
                f"Unknown backend {backend!r}; expected one of {_VALID} "
                f"(or reference aliases Cython/Numba/Scipy)"
            )
        return Backend(name)
    raise ValueError(f"Cannot resolve backend from {backend!r}")


def set_backend(backend: str | Backend) -> None:
    _state.backend = resolve_backend(backend).name


def get_backend() -> str:
    return _current()


@contextmanager
def imops_backend(backend: str | Backend):
    """Scoped backend override (parity with reference ``imops_backend``)."""
    prev = _current()
    set_backend(backend)
    try:
        yield resolve_backend(None)
    finally:
        _state.backend = prev
