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


@pytest.mark.parametrize("mesh_shape,nlev,ny,nx", [
    ((1, 2, 2), 10, 48, 64),
    ((1, 4, 1), 8, 64, 96),
    ((1, 1, 4), 8, 32, 128),
])
@pytest.mark.parametrize("overlap", [False, True])
def test_sharded_isobaric_matches_unsharded(mesh_shape, nlev, ny, nx,
                                            overlap):
    """Config-5 per-host program: per-shard column interpolation + halo
    exchange on the interpolated stack + per-shard pipeline kernel equals
    the unsharded fused isobaric pipeline (masks bit-for-bit)."""
    import numpy as _np

    from mi_fieldcalc_tpu.models.pipeline import derived_fields_isobaric
    from mi_fieldcalc_tpu.parallel.fused import (
        derived_fields_isobaric_sharded)

    ndev = int(np.prod(mesh_shape))
    if len(jax.devices()) < ndev:
        pytest.skip("not enough devices")
    mesh = grid_mesh(mesh_shape, devices=jax.devices()[:ndev])
    args = list(_inputs(nlev, ny, nx, seed=7 * ny + nx, undefs=True))
    # monotone-increasing hybrid columns (model top first, surface last)
    import jax.numpy as jnp
    args[5] = jnp.asarray(_np.linspace(50, 300, nlev), jnp.float32)
    args[6] = jnp.asarray(_np.linspace(0.0, 0.7, nlev) ** 1.5, jnp.float32)
    plv = (925.0, 850.0, 700.0, 500.0, 300.0)

    ref = derived_fields_isobaric(*args, plevels=plv, fused=True)
    got = derived_fields_isobaric_sharded(mesh, *args, plevels=plv,
                                          interpret=True, overlap=overlap)
    for name in ref._fields:
        rv = np.asarray(getattr(ref, name).values)
        rm = np.asarray(getattr(ref, name).mask)
        gv = np.asarray(getattr(got, name).values)
        gm = np.asarray(getattr(got, name).mask)
        assert np.array_equal(rm, gm), f"{name}: mask mismatch"
        with np.errstate(all="ignore"):
            assert np.allclose(rv[rm], gv[rm], rtol=2e-5, atol=1e-30), \
                f"{name}: value mismatch"


def test_sharded_isobaric_rejects_lev_mesh():
    from mi_fieldcalc_tpu.parallel.fused import (
        derived_fields_isobaric_sharded)

    if len(jax.devices()) < 2:
        pytest.skip("not enough devices")
    mesh = grid_mesh((2, 1, 1), devices=jax.devices()[:2])
    args = _inputs(4, 16, 32)
    with pytest.raises(ValueError, match="lev == 1"):
        derived_fields_isobaric_sharded(mesh, *args, plevels=(900.0,),
                                        interpret=True)


@pytest.mark.parametrize("overlap", [False, True])
@pytest.mark.parametrize("mesh_shape,nlev,ny,nx", [
    ((1, 2, 1), 2, 45, 130),    # pads to (48, 256): dead rows + lanes
    ((2, 2, 1), 2, 41, 96),     # lev-sharded, pads to (48, 128)
    ((1, 2, 2), 2, 45, 140),    # gx > 1: ragged locals allowed, still exact
])
def test_sharded_padded_layout_matches(mesh_shape, nlev, ny, nx, overlap):
    """Shard-aligned padded layout (layout.padded_shape_sharded): padded
    global + logical global_shape gives logical outputs identical to the
    unsharded jnp pipeline; dead rows/lanes stay masked and fills fire at
    logical edges only."""
    from mi_fieldcalc_tpu.layout import (pad_array, pad_field,
                                         padded_shape_sharded, trim_field)

    ndev = int(np.prod(mesh_shape))
    if len(jax.devices()) < ndev:
        pytest.skip("not enough devices")
    mesh = grid_mesh(mesh_shape, devices=jax.devices()[:ndev])
    args = _inputs(nlev, ny, nx, seed=5 * ny + nx, undefs=True)
    ref = jax.jit(derived_fields)(*args)

    ny_p, nx_p = padded_shape_sharded(ny, nx, mesh_shape[1], mesh_shape[2])
    assert (ny_p, nx_p) != (ny, nx)
    pargs = tuple(
        pad_field(a, ny_p, nx_p) if hasattr(a, "mask") else
        (pad_array(a, ny_p, nx_p) if a.ndim == 2 else a)
        for a in args)
    got = derived_fields_fused_sharded(mesh, *pargs, interpret=True,
                                       overlap=overlap,
                                       global_shape=(ny, nx))
    for name in ref._fields:
        ra = getattr(ref, name)
        ga = trim_field(getattr(got, name), ny, nx)
        rm = np.asarray(ra.mask)
        assert np.array_equal(rm, np.asarray(ga.mask)), name
        rv, gv = np.asarray(ra.values), np.asarray(ga.values)
        with np.errstate(all="ignore"):
            assert np.allclose(rv[rm], gv[rm], rtol=2e-5, atol=1e-30), name


def test_sharded_isobaric_padded_layout_matches():
    from mi_fieldcalc_tpu.layout import (pad_array, pad_field,
                                         padded_shape_sharded, trim_field)
    from mi_fieldcalc_tpu.models.pipeline import derived_fields_isobaric
    from mi_fieldcalc_tpu.parallel.fused import (
        derived_fields_isobaric_sharded)
    import jax.numpy as jnp

    mesh_shape, nlev, ny, nx = (1, 4, 1), 8, 60, 96
    ndev = int(np.prod(mesh_shape))
    if len(jax.devices()) < ndev:
        pytest.skip("not enough devices")
    mesh = grid_mesh(mesh_shape, devices=jax.devices()[:ndev])
    args = list(_inputs(nlev, ny, nx, seed=13, undefs=True))
    args[5] = jnp.asarray(np.linspace(50, 300, nlev), jnp.float32)
    args[6] = jnp.asarray(np.linspace(0.0, 0.7, nlev) ** 1.5, jnp.float32)
    plv = (925.0, 850.0, 700.0, 500.0)
    ref = derived_fields_isobaric(*args, plevels=plv, fused=True)

    ny_p, nx_p = padded_shape_sharded(ny, nx, mesh_shape[1], mesh_shape[2])
    assert ny_p == 64 and nx_p == 128
    pargs = tuple(
        pad_field(a, ny_p, nx_p) if hasattr(a, "mask") else
        (pad_array(a, ny_p, nx_p) if hasattr(a, "ndim") and a.ndim == 2
         else a)
        for a in args)
    got = derived_fields_isobaric_sharded(mesh, *pargs, plevels=plv,
                                          interpret=True,
                                          global_shape=(ny, nx))
    for name in ref._fields:
        ra = getattr(ref, name)
        ga = trim_field(getattr(got, name), ny, nx)
        rm = np.asarray(ra.mask)
        assert np.array_equal(rm, np.asarray(ga.mask)), name
        rv, gv = np.asarray(ra.values), np.asarray(ga.values)
        with np.errstate(all="ignore"):
            assert np.allclose(rv[rm], gv[rm], rtol=2e-5, atol=5e-6), name


@pytest.mark.parametrize("mesh_shape", [(1, 2, 2), (1, 4, 1)])
def test_sharded_ensemble_matches_unsharded(mesh_shape):
    """Sharded ensemble pipeline (per-member overlap kernel + summary):
    mean/spread/probabilities equal the unsharded jnp path, including
    the probability denominator's whole-field member flags — member 2
    below is defined ONLY inside shard (0, 0)'s subdomain, so a
    per-shard `any` would give other shards a different denominator."""
    import jax.numpy as jnp
    from mi_fieldcalc_tpu.field import Field
    from mi_fieldcalc_tpu.models.ensemble import ensemble_derived_summary
    from mi_fieldcalc_tpu.parallel.fused import ensemble_summary_sharded

    ndev = int(np.prod(mesh_shape))
    if len(jax.devices()) < ndev:
        pytest.skip("not enough devices")
    mesh = grid_mesh(mesh_shape, devices=jax.devices()[:ndev])
    nmem, nlev, ny, nx = 3, 2, 32, 64

    members = [_inputs(nlev, ny, nx, seed=100 + m, undefs=True)
               for m in range(nmem)]

    def stack(i):
        vals = jnp.stack([np.asarray(mm[i].values) for mm in members])
        msks = jnp.stack([np.asarray(mm[i].mask) for mm in members])
        if i == 0:   # tk: member 2 defined only in the top-left corner
            m2 = np.zeros((nlev, ny, nx), bool)
            m2[:, :4, :4] = np.asarray(members[2][0].mask)[:, :4, :4]
            msks = msks.at[2].set(jnp.asarray(m2))
        return Field(vals, msks)

    tk, q, u, v, ps = (stack(i) for i in range(5))
    al, bl, xm, ym, fc = members[0][5:]
    xm2 = jnp.broadcast_to(xm, (ny, nx))
    ym2 = jnp.broadcast_to(ym, (ny, nx))
    fc2 = jnp.broadcast_to(fc, (ny, nx))

    # SHARDING correctness: reference is the SAME kernel arithmetic on
    # a 1-device mesh — spread is a cancellation-amplifying statistic,
    # so comparing it across DIFFERENT implementations (kernel vs jnp)
    # at 2e-5 would really be testing the kernel's deliberate ulp-level
    # pow divergence (ops/fused.py), not the sharding
    mesh1 = grid_mesh((1, 1, 1), devices=jax.devices()[:1])
    ref = ensemble_summary_sharded(mesh1, tk, q, u, v, ps, al, bl,
                                   xm2, ym2, fc2, interpret=True)
    got = ensemble_summary_sharded(mesh, tk, q, u, v, ps, al, bl,
                                   xm2, ym2, fc2, interpret=True)
    # and a SYSTEMATIC-error cross-check against the jnp path: tight on
    # means/probabilities, amplification-aware on spread
    jref = jax.jit(lambda *a: ensemble_derived_summary(*a))(
        tk, q, u, v, ps, al, bl, xm2, ym2, fc2)

    def cmp(r, g, name, rtol=2e-5, atol=1e-5):
        rm, gm = np.asarray(r.mask), np.asarray(g.mask)
        assert np.array_equal(rm, gm), f"{name}: mask"
        rv, gv = np.asarray(r.values), np.asarray(g.values)
        with np.errstate(all="ignore"):
            assert np.allclose(rv[rm], gv[rm], rtol=rtol, atol=atol), \
                f"{name}: values"

    for fam in ("mean", "spread"):
        for fname in ref.mean._fields:
            cmp(getattr(getattr(ref, fam), fname),
                getattr(getattr(got, fam), fname), f"{fam}.{fname}")
    cmp(ref.prob_wind, got.prob_wind, "prob_wind")
    cmp(ref.prob_t_freeze, got.prob_t_freeze, "prob_t_freeze")
    for fname in jref.mean._fields:
        cmp(getattr(jref.mean, fname), getattr(got.mean, fname),
            f"jnp-x-check mean.{fname}")
        cmp(getattr(jref.spread, fname), getattr(got.spread, fname),
            f"jnp-x-check spread.{fname}", rtol=1e-2, atol=0.3)
    cmp(jref.prob_wind, got.prob_wind, "jnp-x-check prob_wind")
    cmp(jref.prob_t_freeze, got.prob_t_freeze, "jnp-x-check prob_tf")


@pytest.mark.parametrize("overlap", [False, True])
def test_sharded_stacked_matches_per_field(overlap):
    """stacked=True on the sharded entry returns the SoA layout with the
    same values/masks as the per-field result (accessors recover each
    Field bitwise)."""
    mesh_shape, nlev, ny, nx = (1, 2, 2), 2, 32, 64
    ndev = int(np.prod(mesh_shape))
    if len(jax.devices()) < ndev:
        pytest.skip("not enough devices")
    mesh = grid_mesh(mesh_shape, devices=jax.devices()[:ndev])
    args = _inputs(nlev, ny, nx, seed=17, undefs=True)

    ref = derived_fields_fused_sharded(mesh, *args, interpret=True,
                                       overlap=overlap)
    got = derived_fields_fused_sharded(mesh, *args, interpret=True,
                                       overlap=overlap, stacked=True)
    assert got.values.shape == (12, nlev, ny, nx)
    for i, name in enumerate(ref._fields):
        ra, ga = getattr(ref, name), got.field(i)
        rm = np.asarray(ra.mask)
        assert np.array_equal(rm, np.asarray(ga.mask)), name
        assert np.array_equal(np.asarray(ra.values)[rm],
                              np.asarray(ga.values)[rm]), name


@pytest.mark.parametrize("overlap", [False, True])
@pytest.mark.parametrize("mesh_shape,nlev,ny,nx", [
    ((1, 2, 2), 2, 48, 64),
    ((1, 4, 1), 2, 64, 96),
    ((1, 1, 4), 2, 32, 128),
])
def test_sharded_all_defined_matches(mesh_shape, nlev, ny, nx, overlap):
    """The sharded ALL_DEFINED fast path (mask-free halo legs + the
    2-gate kernel) equals the default sharded path bitwise on fully
    defined inputs, per-field and stacked, with and without seam-strip
    overlap."""
    ndev = int(np.prod(mesh_shape))
    if len(jax.devices()) < ndev:
        pytest.skip("not enough devices")
    mesh = grid_mesh(mesh_shape, devices=jax.devices()[:ndev])
    args = list(_inputs(nlev, ny, nx, seed=5 * ny + nx, undefs=False))
    # exercise both data-dependent gates
    import jax.numpy as jnp
    from mi_fieldcalc_tpu.field import Field
    tv = np.asarray(args[0].values).copy()
    tv[0, 3, 3] = 500.0            # beyond the e_sat table
    tv[-1, ny // 2:ny // 2 + 4, 5:9] = 290.0    # |grad T| = 0 plateau
    args[0] = Field(jnp.asarray(tv), args[0].mask)

    ref = derived_fields_fused_sharded(mesh, *args, interpret=True,
                                       overlap=overlap)
    got = derived_fields_fused_sharded(mesh, *args, interpret=True,
                                       overlap=overlap, all_defined=True)
    for name in ref._fields:
        ra, ga = getattr(ref, name), getattr(got, name)
        rm = np.asarray(ra.mask)
        assert np.array_equal(rm, np.asarray(ga.mask)), name
        assert np.array_equal(np.asarray(ra.values)[rm],
                              np.asarray(ga.values)[rm]), name

    st = derived_fields_fused_sharded(mesh, *args, interpret=True,
                                      overlap=overlap, stacked=True,
                                      all_defined=True)
    assert st.masks.shape[0] == 2
    for i, name in enumerate(ref._fields):
        ra, ga = getattr(ref, name), st.field(i)
        rm = np.asarray(ra.mask)
        assert np.array_equal(rm, np.asarray(ga.mask)), name
        assert np.array_equal(np.asarray(ra.values)[rm],
                              np.asarray(ga.values)[rm]), name


@pytest.mark.parametrize("overlap", [False, True])
def test_sharded_isobaric_all_defined_matches(overlap):
    """Isobaric all_defined: the interp kernel runs mask-free per shard
    and the non-overlap halo leg exchanges one shared mask strip; the
    result equals the default sharded path bitwise on fully defined
    inputs."""
    import jax.numpy as jnp
    import numpy as _np
    from mi_fieldcalc_tpu.parallel.fused import (
        derived_fields_isobaric_sharded)

    mesh_shape, nlev, ny, nx = (1, 2, 2), 8, 48, 64
    ndev = int(np.prod(mesh_shape))
    if len(jax.devices()) < ndev:
        pytest.skip("not enough devices")
    mesh = grid_mesh(mesh_shape, devices=jax.devices()[:ndev])
    args = list(_inputs(nlev, ny, nx, seed=13, undefs=False))
    args[5] = jnp.asarray(_np.linspace(50, 300, nlev), jnp.float32)
    args[6] = jnp.asarray(_np.linspace(0.0, 0.7, nlev) ** 1.5, jnp.float32)
    plv = (925.0, 850.0, 500.0)

    ref = derived_fields_isobaric_sharded(mesh, *args, plevels=plv,
                                          interpret=True, overlap=overlap)
    got = derived_fields_isobaric_sharded(mesh, *args, plevels=plv,
                                          interpret=True, overlap=overlap,
                                          all_defined=True)
    for name in ref._fields:
        ra, ga = getattr(ref, name), getattr(got, name)
        rm = np.asarray(ra.mask)
        assert np.array_equal(rm, np.asarray(ga.mask)), name
        assert np.array_equal(np.asarray(ra.values)[rm],
                              np.asarray(ga.values)[rm]), name


@pytest.mark.parametrize("overlap", [False, True])
def test_sharded_padded_all_defined_matches(overlap):
    """Sharded + padded + fast path, together: the pipeline kernel's
    offset-driven region gate keeps dead rows/lanes masked False on
    every shard, and results equal the sharded masked path bitwise."""
    from mi_fieldcalc_tpu.layout import (pad_array, pad_field,
                                         padded_shape_sharded)

    mesh_shape, nlev, ny, nx = (1, 2, 2), 2, 43, 117
    ndev = int(np.prod(mesh_shape))
    if len(jax.devices()) < ndev:
        pytest.skip("not enough devices")
    mesh = grid_mesh(mesh_shape, devices=jax.devices()[:ndev])
    args = _inputs(nlev, ny, nx, seed=11 * ny, undefs=False)

    ny_p, nx_p = padded_shape_sharded(ny, nx, mesh_shape[1], mesh_shape[2])
    assert (ny_p, nx_p) != (ny, nx)
    pargs = tuple(
        pad_field(a, ny_p, nx_p) if hasattr(a, "mask") else
        (pad_array(a, ny_p, nx_p) if a.ndim == 2 else a)
        for a in args)
    ref = derived_fields_fused_sharded(mesh, *pargs, interpret=True,
                                       overlap=overlap,
                                       global_shape=(ny, nx))
    got = derived_fields_fused_sharded(mesh, *pargs, interpret=True,
                                       overlap=overlap,
                                       global_shape=(ny, nx),
                                       all_defined=True)
    for name in ref._fields:
        ra, ga = getattr(ref, name), getattr(got, name)
        gm = np.asarray(ga.mask)
        # dead rows/lanes stay False on every shard (invariant)
        assert not gm[..., ny:, :].any() and not gm[..., :, nx:].any(), name
        rm = np.asarray(ra.mask)
        assert np.array_equal(rm, gm), name
        assert np.array_equal(np.asarray(ra.values)[rm],
                              np.asarray(ga.values)[rm]), name
