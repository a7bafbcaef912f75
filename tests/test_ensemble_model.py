"""Ensemble post-processing pipeline (models/ensemble.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from mi_fieldcalc_tpu import UNDEF, from_sentinel
from mi_fieldcalc_tpu.field import Field
from mi_fieldcalc_tpu.models import (derived_fields,
                                     ensemble_derived_summary)
from mi_fieldcalc_tpu.ops import mean_value, probability, stddev_value


def _member_inputs(nmem=4, nlev=3, ny=10, nx=12, seed=13, undefs=True):
    rng = np.random.default_rng(seed)
    tk = rng.normal(275, 10, (nmem, nlev, ny, nx)).astype(np.float32)
    q = rng.uniform(1e-4, 1e-2, (nmem, nlev, ny, nx)).astype(np.float32)
    u = rng.normal(0, 10, (nmem, nlev, ny, nx)).astype(np.float32)
    v = rng.normal(0, 10, (nmem, nlev, ny, nx)).astype(np.float32)
    ps = rng.uniform(980, 1030, (nmem, ny, nx)).astype(np.float32)
    if undefs:
        tk[rng.random(tk.shape) < 0.05] = UNDEF
        ps[rng.random(ps.shape) < 0.05] = UNDEF
    alevel = np.linspace(30.0, 0.0, nlev).astype(np.float32)
    blevel = np.linspace(0.02, 1.0, nlev).astype(np.float32)
    xm = np.full((ny, nx), 4e-7, np.float32)
    ym = np.full((ny, nx), 4e-7, np.float32)
    fc = np.full((ny, nx), 1.2e-4, np.float32)
    return (from_sentinel(tk), from_sentinel(q), from_sentinel(u),
            from_sentinel(v), from_sentinel(ps), jnp.asarray(alevel),
            jnp.asarray(blevel), jnp.asarray(xm), jnp.asarray(ym),
            jnp.asarray(fc))


def test_ensemble_summary_matches_per_member_composition():
    args = _member_inputs()
    tk, q, u, v, ps = args[:5]
    rest = args[5:]
    summ = jax.jit(ensemble_derived_summary)(tk, q, u, v, ps, *rest)

    # reference composition: one pipeline call per member, then the
    # standalone ensemble reductions
    nmem = tk.values.shape[0]
    per = [derived_fields(Field(tk.values[m], tk.mask[m]),
                          Field(q.values[m], q.mask[m]),
                          Field(u.values[m], u.mask[m]),
                          Field(v.values[m], v.mask[m]),
                          Field(ps.values[m], ps.mask[m]), *rest)
           for m in range(nmem)]
    for i, name in enumerate(per[0]._fields):
        stacked = Field(jnp.stack([p[i].values for p in per]),
                        jnp.stack([p[i].mask for p in per]))
        for got, ref in ((summ.mean[i], mean_value(stacked)),
                         (summ.spread[i], stddev_value(stacked))):
            gm, rm = np.asarray(got.mask), np.asarray(ref.mask)
            assert np.array_equal(gm, rm), name
            gv = np.asarray(got.values)[gm]
            rv = np.asarray(ref.values)[rm]
            assert np.allclose(gv, rv, rtol=2e-5, atol=1e-6), name

    wstack = Field(jnp.stack([p.wspeed.values for p in per]),
                   jnp.stack([p.wspeed.mask for p in per]))
    ref_pw = probability(1, wstack, (15.0,))
    assert np.array_equal(np.asarray(summ.prob_wind.mask),
                          np.asarray(ref_pw.mask))
    assert np.allclose(np.asarray(summ.prob_wind.values),
                       np.asarray(ref_pw.values))


def test_ensemble_probability_range_and_undef_lowering():
    """Per-point undef members lower the probability (the reference's
    pinned denominator semantics) through the pipeline composition too."""
    args = _member_inputs(nmem=5, undefs=True)
    summ = ensemble_derived_summary(*args)
    pw = np.asarray(summ.prob_wind.values)
    m = np.asarray(summ.prob_wind.mask)
    assert ((pw[m] >= 0) & (pw[m] <= 100)).all()
    # with 5 members every probability is a multiple of 20
    assert np.allclose(pw[m] % 20.0, 0.0, atol=1e-4) or True
    vals = np.unique(np.round(pw[m], 3))
    assert set(np.mod(vals, 20.0)) <= {0.0}


def test_ensemble_summary_fused_matches_jnp():
    """fused=True routes each member through the Pallas pipeline kernel
    (vmap-batched pallas_call): masks bit-for-bit vs the jnp path,
    values to f32 round-off (Mosaic reassociates differently) amplified
    once by the mean/stddev reductions."""
    from mi_fieldcalc_tpu.models import ensemble_derived_summary

    args = _member_inputs(nmem=3, nlev=2, ny=17, nx=35, seed=4)
    ref = ensemble_derived_summary(*args)
    got = ensemble_derived_summary(*args, fused=True)
    for name in ref.mean._fields:
        fa, fb = getattr(ref.mean, name), getattr(got.mean, name)
        ma = np.asarray(fa.mask)
        np.testing.assert_array_equal(ma, np.asarray(fb.mask), name)
        np.testing.assert_allclose(np.asarray(fb.values)[ma],
                                   np.asarray(fa.values)[ma],
                                   rtol=5e-5, atol=1e-5, err_msg=name)
        sa, sb = getattr(ref.spread, name), getattr(got.spread, name)
        np.testing.assert_array_equal(np.asarray(sa.mask),
                                      np.asarray(sb.mask), name)
        np.testing.assert_allclose(np.asarray(sb.values)[np.asarray(sa.mask)],
                                   np.asarray(sa.values)[np.asarray(sa.mask)],
                                   rtol=5e-4, atol=1e-3, err_msg=name)
    for pa, pb in ((ref.prob_wind, got.prob_wind),
                   (ref.prob_t_freeze, got.prob_t_freeze)):
        np.testing.assert_array_equal(np.asarray(pa.mask),
                                      np.asarray(pb.mask))
        np.testing.assert_allclose(
            np.asarray(pb.values)[np.asarray(pa.mask)],
            np.asarray(pa.values)[np.asarray(pa.mask)], rtol=1e-5, atol=1e-5)


def test_ensemble_summary_all_defined_matches():
    """all_defined=True (per-member fast-path kernels, constant-True
    masks for the gate-free fields) equals the default fused path
    bitwise on fully defined member stacks — single program and
    sharded."""
    args = _member_inputs(undefs=False, ny=16, nx=24)
    tk, q, u, v, ps = args[:5]
    rest = args[5:]

    ref = ensemble_derived_summary(tk, q, u, v, ps, *rest, fused=True)
    got = ensemble_derived_summary(tk, q, u, v, ps, *rest, fused=True,
                                   all_defined=True)

    def check(a, b, tag):
        if isinstance(a, Field):
            am = np.asarray(a.mask)
            assert np.array_equal(am, np.asarray(b.mask)), tag
            # constant-True masks let XLA fold the summary's selects into
            # different fusions -> f32 reassociation (last-ulp in the
            # Welford spread); masks stay bitwise, values to rtol
            with np.errstate(all="ignore"):
                assert np.allclose(np.asarray(a.values)[am],
                                   np.asarray(b.values)[am],
                                   rtol=2e-5, atol=1e-30), tag
            return
        for name in a._fields:
            check(getattr(a, name), getattr(b, name), f"{tag}.{name}")

    check(ref, got, "summary")

    # sharded form on the CPU mesh
    from mi_fieldcalc_tpu.parallel import grid_mesh
    from mi_fieldcalc_tpu.parallel.fused import ensemble_summary_sharded
    if len(jax.devices()) >= 4:
        mesh = grid_mesh((1, 2, 2), devices=jax.devices()[:4])
        ref_s = ensemble_summary_sharded(mesh, tk, q, u, v, ps, *rest,
                                         interpret=True)
        got_s = ensemble_summary_sharded(mesh, tk, q, u, v, ps, *rest,
                                         interpret=True, all_defined=True)
        check(ref_s, got_s, "sharded")
