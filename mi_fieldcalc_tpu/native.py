"""ctypes bindings for the native host boundary codec.

The compute path of this framework is JAX/Pallas on TPU; what remains
host-side work is the numpy *boundary* — turning sentinel-encoded grids
(``miutil::UNDEF = 1e35``, reference FieldDefined.cc:34) into
``(values, mask)`` pairs before ``device_put``, re-encoding device results,
and answering ``checkDefined``-style tri-state queries
(FieldDefined.cc:41-70) without an accelerator round trip.  Those scans are
memory-bound; ``native/fieldcodec.cc`` does each in one fused multithreaded
pass (size-adaptive threads mirroring openmp_tools.cc:38-69) where numpy
needs 3-4 full passes.

Every entry point falls back to a numpy implementation when the shared
library is absent (it is built on demand with ``native/build.sh``; the
wrapper also attempts one quiet build on first use if ``g++`` exists).

Functions take/return numpy arrays; nothing here touches JAX.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

from .field import UNDEF, ValuesDefined

__all__ = [
    "available",
    "decode",
    "encode",
    "count_defined",
    "defined_state_host",
]

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SO = os.path.join(_REPO, "native", "build", "libmifieldcalc_host.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO):
        script = os.path.join(_REPO, "native", "build.sh")
        if os.path.exists(script):
            try:
                subprocess.run(["sh", script], capture_output=True,
                               timeout=120, check=True)
            except Exception:
                return None
    if not os.path.exists(_SO):
        return None
    try:
        lib = ctypes.CDLL(_SO)
        i64, f32p = ctypes.c_int64, ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.mf_decode.restype = i64
        lib.mf_decode.argtypes = [f32p, i64, ctypes.c_float, ctypes.c_float,
                                  f32p, u8p]
        lib.mf_encode.restype = None
        lib.mf_encode.argtypes = [f32p, u8p, i64, ctypes.c_float, f32p]
        lib.mf_count_defined.restype = i64
        lib.mf_count_defined.argtypes = [f32p, i64, ctypes.c_float]
        lib.mf_count_mask.restype = i64
        lib.mf_count_mask.argtypes = [u8p, i64]
        if lib.mf_native_abi_version() != 1:
            return None
        _lib = lib
    except OSError:
        return None
    return _lib


def available() -> bool:
    """Whether the compiled codec is loadable (builds it if needed)."""
    return _load() is not None


def _f32c(a) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.float32)


def decode(values, undef: float = UNDEF, fill: float = 0.0,
           ) -> Tuple[np.ndarray, np.ndarray, int]:
    """Sentinel array -> ``(sanitized values, bool mask, n_defined)``.

    One fused pass over the array: the point predicate is ``is_defined``
    (FieldCalculations.h:42-45), undefined points are replaced by ``fill``
    (numerically safe for downstream transcendentals), and the defined
    count for the tri-state summary comes for free.
    """
    v = _f32c(values)
    lib = _load()
    if lib is None:
        mask = ~np.isnan(v) & (v != np.float32(undef))
        out = np.where(mask, v, np.float32(fill))
        return out, mask, int(mask.sum())
    out = np.empty_like(v)
    mask = np.empty(v.shape, dtype=np.uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    n_def = lib.mf_decode(v.ctypes.data_as(f32p), v.size,
                          ctypes.c_float(undef), ctypes.c_float(fill),
                          out.ctypes.data_as(f32p), mask.ctypes.data_as(u8p))
    return out, mask.view(np.bool_), int(n_def)


def encode(values, mask, undef: float = UNDEF) -> np.ndarray:
    """(values, mask) -> sentinel array (``Field.to_sentinel`` host dual)."""
    v = _f32c(values)
    m = np.ascontiguousarray(mask)
    if m.shape != v.shape:
        m = np.broadcast_to(m, v.shape)
        m = np.ascontiguousarray(m)
    m = m.astype(np.uint8, copy=False)
    lib = _load()
    if lib is None:
        return np.where(m != 0, v, np.float32(undef))
    out = np.empty_like(v)
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.mf_encode(v.ctypes.data_as(f32p), m.ctypes.data_as(u8p), v.size,
                  ctypes.c_float(undef), out.ctypes.data_as(f32p))
    return out


def count_defined(values, undef: float = UNDEF) -> int:
    """Defined-point count of a sentinel array (no outputs written)."""
    v = _f32c(values)
    lib = _load()
    if lib is None:
        return int((~np.isnan(v) & (v != np.float32(undef))).sum())
    f32p = ctypes.POINTER(ctypes.c_float)
    return int(lib.mf_count_defined(v.ctypes.data_as(f32p), v.size,
                                    ctypes.c_float(undef)))


def defined_state_host(values, undef: float = UNDEF) -> ValuesDefined:
    """``checkDefined(const float*, n)`` (FieldDefined.cc:41-57) on the
    host: tri-state summary of a sentinel-encoded numpy array."""
    v = _f32c(values)
    n_def = count_defined(v, undef)
    if n_def == v.size:
        return ValuesDefined.ALL_DEFINED
    if n_def == 0:
        return ValuesDefined.NONE_DEFINED
    return ValuesDefined.SOME_DEFINED
