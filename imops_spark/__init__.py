"""imops_spark — a PySpark-native engine with the capabilities of neuro-ml/imops.

Public surface mirrors the reference's ``imops/__init__.py`` (study target at
/root/reference, read-only), re-expressed as Spark DataFrame algebra:
every operator has an ndarray convenience wrapper (encode → plan → decode) and
a DataFrame-level core (``*_df``) that scales horizontally.
"""

def _tune_allocator() -> None:
    """Keep large numpy buffers in the reusable heap arena.

    glibc serves big allocations from fresh ``mmap`` regions, and this
    environment's minor page faults run ~10 µs/page — every large numpy
    temporary then costs ~2.5 ms/MB of fault overhead on EVERY call.
    Raising the malloc mmap/trim thresholds lets long-lived processes (the
    driver and Spark's reused python workers) fault each page once and
    recycle it across kernel calls; repeated 134 MB alloc+fill drops from
    ~650 ms to ~18 ms here.  Best-effort: silently skipped off glibc.
    """
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD
        libc.mallopt(-1, 1 << 30)  # M_TRIM_THRESHOLD
    except Exception:  # non-glibc platform: default allocator behavior
        pass


_tune_allocator()

from .backend import (  # noqa: F401,E402
    Backend,
    Cython,
    Numba,
    Scipy,
    imops_backend,
    set_backend,
)
from .box import (  # noqa: F401
    add_margin,
    box_to_shape,
    make_box,
    mask_to_box,
    shape_to_box,
)
from .session import get_spark, stop_spark  # noqa: F401
from .tensor_io import (  # noqa: F401
    TensorFrame,
    decode_volume,
    encode_blobs,
    encode_volume,
    encode_volumes,
    load_npy_gz,
)
from .utils import isin  # noqa: F401
from .operators.convex_hull import convex_hull_image  # noqa: F401
from .operators.crop import crop_to_box, crop_to_shape  # noqa: F401
from .operators.interp1d import interp1d  # noqa: F401
from .operators.interp2d import Linear2DInterpolator  # noqa: F401
from .operators.radon import inverse_radon, radon  # noqa: F401
from .operators.measure import center_of_mass, label  # noqa: F401
from .operators.morphology import (  # noqa: F401
    binary_closing,
    binary_dilation,
    binary_erosion,
    binary_opening,
    distance_transform_edt,
)
from .operators.zoom import zoom, zoom_to_shape  # noqa: F401
from .operators.numeric import copy, fill_, full, pointwise_add  # noqa: F401
from .operators.pad import (  # noqa: F401
    pad,
    pad_to_divisible,
    pad_to_shape,
    restore_crop,
)

__version__ = "0.1.0"
