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
- ``'auto'`` — operator picks by input size (the reference's dispatch analog):
  ndarray wrappers run the vectorized kernel when the input fits comfortably
  in one task (``<= AUTO_UDF_MAX_BYTES``) and the distributed voxel-table
  plan above that (``dispatch_strategy``).

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
    "Cython",
    "Numba",
    "Scipy",
    "AUTO_UDF_MAX_BYTES",
    "set_backend",
    "get_backend",
    "imops_backend",
    "resolve_backend",
    "dispatch_strategy",
]

# 'auto' threshold: inputs at or under this take the per-image NumPy kernel
# (one Arrow task's worth of data); larger ones take the distributed plan.
# 64 MiB ~= a 256^3 float32 volume — far below executor memory, far above
# the per-task fixed overhead that dominates small inputs.
AUTO_UDF_MAX_BYTES = 64 << 20


@dataclass(frozen=True)
class Backend:
    """A named execution strategy (analog of reference ``Backend`` dataclass)."""

    name: str
    # Hints consumed by operators; partitioning analog of num_threads.
    options: dict = field(default_factory=dict)

    def __init_subclass__(cls, **kwargs):  # registry, mirrors backend.py:7-26
        super().__init_subclass__(**kwargs)
        BACKENDS[cls.__name__.lower()] = cls
        if not hasattr(Backend, cls.__name__):  # Backend.Cython etc., backend.py:13-14
            setattr(Backend, cls.__name__, cls)


BACKENDS: dict[str, type] = {}
_VALID = ("join", "udf", "auto")


@dataclass(frozen=True)
class Cython(Backend):
    """Reference drop-in (`/root/reference/imops/backend.py:86-88`): the
    compiled in-process path maps to our relational 'join' strategy.
    ``fast`` is accepted for signature parity and warns like the reference."""

    name: str = field(default="join", init=False)
    fast: bool = False


@dataclass(frozen=True)
class Numba(Backend):
    """Reference drop-in (`backend.py:70-80`): also the compiled path ->
    'join'.  The numba flags are accepted as inert hints (no numba needed —
    parallelism comes from partitioning, not JIT threads)."""

    name: str = field(default="join", init=False)
    parallel: bool = True
    nogil: bool = True
    cache: bool = True


@dataclass(frozen=True)
class Scipy(Backend):
    """Reference drop-in (`backend.py:91-93`): the fallback kernel path maps
    to our per-image Arrow 'udf' strategy."""

    name: str = field(default="udf", init=False)

_state = threading.local()


def _current() -> str:
    return getattr(_state, "backend", "auto")


def _checked(b: Backend) -> Backend:
    if isinstance(b, Cython) and b.fast:
        # parity with reference resolve_backend (backend.py:44-45)
        import warnings

        warnings.warn("`fast=True` has no effect for `Cython` backend for now.", stacklevel=3)
    return b


def resolve_backend(backend: str | Backend | None) -> Backend:
    """Normalize str/Backend/None to a Backend, raising on unknown names."""
    if backend is None:
        return Backend(_current())
    if isinstance(backend, Backend):
        return _checked(backend)
    if isinstance(backend, type) and issubclass(backend, Backend):
        return backend()  # type: ignore[call-arg]
    if isinstance(backend, str):
        name = backend.lower()
        # Accept the reference's backend names for drop-in compatibility:
        # Cython/Numba were its fast in-process kernels -> our relational path;
        # Scipy was its fallback kernel -> our per-image UDF path.
        if name in BACKENDS:
            return BACKENDS[name]()
        if name not in _VALID:
            raise ValueError(
                f"Unknown backend {backend!r}; expected one of {_VALID} "
                f"(or reference aliases Cython/Numba/Scipy)"
            )
        return Backend(name)
    raise ValueError(f"Cannot resolve backend from {backend!r}")


def dispatch_strategy(strategy: Backend, nbytes: int) -> str:
    """Concrete strategy name for an ndarray input of ``nbytes`` bytes.

    Resolves ``'auto'`` by size: the per-image vectorized kernel for inputs
    that fit one task (``nbytes <= AUTO_UDF_MAX_BYTES``), the distributed
    voxel-table plan above that.  Explicit ``'join'``/``'udf'`` pass through
    unchanged.  This is the Spark analog of the reference's backend dispatch
    (`/root/reference/imops/backend.py:29-48`): small inputs must not pay
    multi-job fixpoint latency, oversized volumes must not be forced through
    a single in-memory kernel.
    """
    if strategy.name != "auto":
        return strategy.name
    return "udf" if nbytes <= AUTO_UDF_MAX_BYTES else "join"


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
