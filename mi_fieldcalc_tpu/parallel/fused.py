"""Sharded execution of the fused Pallas pipeline kernel.

The single-chip flagship path (:func:`mi_fieldcalc_tpu.ops.fused.
derived_fields_fused`) runs one Pallas program per chip; on a
``(lev, gy, gx)`` mesh each shard runs the SAME kernel on its local block
padded with a radius-2 halo ring exchanged over ICI
(:func:`..parallel.halo.halo_exchange`), with the kernel's physical-edge
``fillEdges`` selects driven by the shard's *global* grid offsets — so
boundary patches fire only on shards that touch the domain edge, never at
shard seams.  Outputs are cropped by the halo and stay sharded.

This is the production multi-chip layout: level-batch parallelism over
``lev`` (no communication) times spatial decomposition over ``(gy, gx)``
(one radius-2 ``ppermute`` ring per input, overlapped with compute by
XLA's scheduler).  Equivalence with the unsharded kernel is tested on the
8-device CPU mesh in tests/test_parallel_fused.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..field import Field
from ..ops.fused import derived_fields_fused
from .halo import halo_exchange
from .mesh import partition_spec

__all__ = ["derived_fields_fused_sharded"]

#: Composed stencil radius of the pipeline (TFP through |grad T|).
RADIUS = 2


def derived_fields_fused_sharded(mesh: Mesh, tk: Field, q: Field, u: Field,
                                 v: Field, ps: Field, alevel, blevel,
                                 xmapr, ymapr, fcoriolis,
                                 interpret: bool = False):
    """Run the fused pipeline kernel per-shard over ``mesh``.

    Arguments as :func:`..models.pipeline.derived_fields`; ``xmapr`` /
    ``ymapr`` must be ``(ny, nx)`` arrays (map factors are per-point
    fields in any real projection).  Returns a sharded
    :class:`DerivedFields`.
    """
    nyg, nxg = tk.values.shape[-2:]
    args = (tk, q, u, v, ps, jnp.asarray(alevel, jnp.float32),
            jnp.asarray(blevel, jnp.float32),
            jnp.asarray(xmapr, jnp.float32), jnp.asarray(ymapr, jnp.float32),
            jnp.asarray(fcoriolis, jnp.float32))
    leaves = tuple(jax.tree_util.tree_flatten(args)[0])
    fn = _sharded_fn(mesh, (nyg, nxg), bool(interpret))
    return fn(leaves)


@functools.lru_cache(maxsize=64)
def _sharded_fn(mesh: Mesh, global_shape, interpret: bool):
    """One jitted shard_map program per (mesh, global grid) — repeat calls
    dispatch the cached executable instead of re-tracing."""
    nyg, nxg = global_shape
    names = mesh.axis_names

    def body(leaves):
        tk, q, u, v, ps, al, bl, xm, ym, fc = \
            jax.tree_util.tree_unflatten(_TREEDEF, leaves)

        def padf(f):
            # mask rides through int8: bool ppermute support varies
            m = halo_exchange(f.mask.astype(jnp.int8), RADIUS, mesh) != 0
            return Field(halo_exchange(f.values, RADIUS, mesh), m)

        tkp, qp, up, vp, psp = map(padf, (tk, q, u, v, ps))
        xmp = halo_exchange(xm, RADIUS, mesh)
        ymp = halo_exchange(ym, RADIUS, mesh)
        fcp = halo_exchange(fc, RADIUS, mesh)

        ny_loc, nx_loc = tk.values.shape[-2:]
        iy = lax.axis_index("gy") if "gy" in names else 0
        ix = lax.axis_index("gx") if "gx" in names else 0
        offs = jnp.stack([iy * ny_loc - RADIUS, ix * nx_loc - RADIUS]
                         ).astype(jnp.int32)

        out = derived_fields_fused(tkp, qp, up, vp, psp, al, bl, xmp, ymp,
                                   fcp, interpret=interpret,
                                   global_shape=(nyg, nxg),
                                   grid_offsets=offs)
        return jax.tree_util.tree_map(
            lambda a: a[..., RADIUS:-RADIUS, RADIUS:-RADIUS], out)

    from ..models.pipeline import DerivedFields
    out_spec = partition_spec(3, mesh)
    out_specs = DerivedFields(*[Field(out_spec, out_spec)] * 12)
    # leaf order: (values, mask) x tk,q,u,v [3-D], ps [2-D], alevel/blevel
    # [1-D], xmapr/ymapr/fcoriolis [2-D]
    in_specs = tuple(partition_spec(nd, mesh)
                     for nd in [3] * 8 + [2] * 2 + [1] * 2 + [2] * 3)
    return jax.jit(shard_map(body, mesh=mesh, in_specs=(in_specs,),
                             out_specs=out_specs, check_vma=False))


# flat structure of the 10 pipeline arguments (5 Fields + 5 arrays)
_TREEDEF = jax.tree_util.tree_structure(
    (Field(0, 0), Field(0, 0), Field(0, 0), Field(0, 0), Field(0, 0),
     0, 0, 0, 0, 0))
