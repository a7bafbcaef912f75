"""Canonical tile-aligned device layout for gridded fields.

TPU DMA moves (8, 128)-tiled f32 data.  When a grid's trailing dims are
not tile-aligned (the MET Norway operational grid is 719x929), every
block transfer of the Pallas pipelines takes a ragged slow path that
costs ~2x in effective HBM bandwidth: the flagship fused pipeline
measured 11.5 ms at 719x929 vs 5.7 ms at 720x1024 on identical logical
work (tools/perf_lab_pad.py; ny padded to a multiple of 8 and nx to a
multiple of 128 — either alone does not help, nx matters most).

The framework therefore defines a *canonical padded layout*: grids are
padded once at the host boundary (rows to a multiple of 8, lanes to a
multiple of 128), carried padded through whole pipelines, and trimmed
back to the logical extent only when results leave the device.  Padding
rules:

* ``Field`` values pad with zeros and masks pad with ``False`` — dead
  points are simply undefined points, so every mask-respecting operator
  is automatically correct on padded grids.
* Kernels that need the *physical* grid boundary (``fillEdges``) take
  the logical ``(ny, nx)`` as ``global_shape`` and patch logical edges,
  never padded ones (ops/fused.py already does this for shard seams).
* Reductions respect masks, so dead lanes never contaminate counts or
  means.

The reference has no analog: its flat C arrays have no tiling
(FieldCalculations.h:102-107 just takes ``nx*ny`` floats).
"""

from __future__ import annotations

import jax.numpy as jnp

from .field import Field

__all__ = ["ROW_TILE", "LANE_TILE", "padded_shape", "padded_shape_sharded",
           "pad_field", "pad_array", "trim_field", "trim_array"]

#: f32 sublane / lane tile extents on current TPUs.
ROW_TILE = 8
LANE_TILE = 128


def _up(n: int, m: int) -> int:
    return -(-n // m) * m


def padded_shape(ny: int, nx: int) -> tuple[int, int]:
    """The canonical padded extent of a logical ``(ny, nx)`` grid."""
    return _up(ny, ROW_TILE), _up(nx, LANE_TILE)


def pad_array(a, ny_p: int | None = None, nx_p: int | None = None,
              fill=0):
    """Pad the trailing two dims of ``a`` to ``(ny_p, nx_p)`` (defaults:
    the canonical padded shape) with ``fill``."""
    ny, nx = a.shape[-2:]
    dny, dnx = padded_shape(ny, nx)
    ny_p = dny if ny_p is None else ny_p
    nx_p = dnx if nx_p is None else nx_p
    if (ny_p, nx_p) == (ny, nx):
        return a
    widths = [(0, 0)] * (a.ndim - 2) + [(0, ny_p - ny), (0, nx_p - nx)]
    return jnp.pad(a, widths, constant_values=fill)


def pad_field(f: Field, ny_p: int | None = None,
              nx_p: int | None = None) -> Field:
    """Pad a Field to the canonical layout: values 0, mask ``False``."""
    return Field(pad_array(f.values, ny_p, nx_p),
                 pad_array(f.mask, ny_p, nx_p))


def padded_shape_sharded(ny: int, nx: int, gy: int = 1,
                         gx: int = 1) -> tuple[int, int]:
    """Global padded extent for a ``(gy, gx)``-decomposed grid such that
    every shard's *local* block is tile-aligned: ``ny_p/gy % 8 == 0`` and
    ``nx_p/gx % 128 == 0``.  The sharded fused pipeline exchanges 8-row
    y-halos (one row tile) and no x-halo when ``gx == 1``, so local
    alignment makes every per-shard Pallas transfer tile-aligned too.
    With ``gx > 1`` the non-overlap path's 2-lane x-halos make the
    kernel's input blocks ``nx_loc + 4`` lanes (ragged — the ~2x
    ragged-DMA penalty applies to those reads), while the overlap path
    runs the interior kernel on the exact tile-aligned local block and
    recomputes the seam columns from narrow strips — at 64+ chips the
    2-D split's smaller padded footprint wins either way (PERF.md "2-D
    (gy, gx) decomposition"; footprint is AOT byte accounting, not a
    measured multi-chip step time)."""
    return (_up(-(-ny // gy), ROW_TILE) * gy,
            _up(-(-nx // gx), LANE_TILE) * gx)


def trim_array(a, ny: int, nx: int):
    """Slice the trailing two dims back to the logical ``(ny, nx)``."""
    if a.shape[-2:] == (ny, nx):
        return a
    return a[..., :ny, :nx]


def trim_field(f: Field, ny: int, nx: int) -> Field:
    return Field(trim_array(f.values, ny, nx), trim_array(f.mask, ny, nx))
