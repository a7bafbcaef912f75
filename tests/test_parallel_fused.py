"""Sharded-vs-unsharded equivalence of the fused Pallas pipeline kernel.

Runs the fused kernel per-shard (interpret mode) on the 8-device CPU mesh
and compares against the single-device jnp pipeline: masks bit-for-bit,
values to f32 round-off.  This validates the halo exchange, the
global-offset-driven physical-edge fills (no fills at shard seams), and
the output cropping.
"""

import jax
import numpy as np
import pytest

from mi_fieldcalc_tpu.models.pipeline import derived_fields
from mi_fieldcalc_tpu.parallel import grid_mesh
from mi_fieldcalc_tpu.parallel.fused import derived_fields_fused_sharded

from test_fused import _inputs


@pytest.mark.parametrize("overlap", [False, True])
@pytest.mark.parametrize("mesh_shape,nlev,ny,nx", [
    ((1, 2, 2), 2, 48, 64),
    ((2, 2, 1), 4, 40, 137),    # lev-sharded + y-split, ragged nx
    ((1, 4, 1), 2, 64, 96),     # deep y-split
    ((1, 1, 4), 2, 32, 128),    # x-split only
])
def test_sharded_fused_matches_unsharded(mesh_shape, nlev, ny, nx, overlap):
    ndev = int(np.prod(mesh_shape))
    if len(jax.devices()) < ndev:
        pytest.skip("not enough devices")
    if overlap and mesh_shape[2] > 1:
        pytest.skip("overlap mode is gy-only")
    mesh = grid_mesh(mesh_shape, devices=jax.devices()[:ndev])
    args = _inputs(nlev, ny, nx, seed=ny + nx, undefs=True)

    ref = jax.jit(derived_fields)(*args)
    got = derived_fields_fused_sharded(mesh, *args, interpret=True,
                                       overlap=overlap)

    for name in ref._fields:
        rv = np.asarray(getattr(ref, name).values)
        rm = np.asarray(getattr(ref, name).mask)
        gv = np.asarray(getattr(got, name).values)
        gm = np.asarray(getattr(got, name).mask)
        assert np.array_equal(rm, gm), f"{name}: mask mismatch"
        w = rm
        with np.errstate(all="ignore"):
            assert np.allclose(rv[w], gv[w], rtol=2e-5, atol=1e-30), \
                f"{name}: value mismatch"
