"""Vertical interpolation (ops/vertical.py) and the isobaric pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mi_fieldcalc_tpu.field import UNDEF, Field, from_sentinel, from_values
from mi_fieldcalc_tpu.models.pipeline import derived_fields_isobaric
from mi_fieldcalc_tpu.ops import hlevel_to_plevel, plevel_interp


def _column(nlev=10, ny=4, nx=5):
    """Monotone pressure columns 100..1000 hPa, field linear in ln(p)."""
    p1d = np.linspace(100.0, 1000.0, nlev).astype(np.float32)
    p = np.broadcast_to(p1d[:, None, None], (nlev, ny, nx)).copy()
    f = (3.0 * np.log(p) + 7.0).astype(np.float32)
    return from_values(f), from_values(p)


def test_logp_linear_exact():
    f, p = _column()
    targets = [150.0, 312.5, 999.0]
    out = plevel_interp(f, p, targets, log_p=True)
    expect = 3.0 * np.log(np.asarray(targets, np.float32)) + 7.0
    got = np.asarray(out.values)
    assert np.asarray(out.mask).all()
    for i, e in enumerate(expect):
        assert np.allclose(got[i], e, rtol=2e-6), (i, got[i, 0, 0], e)


def test_linear_p_exact():
    f, p = _column()
    fv = (0.5 * np.asarray(p.values) - 20.0).astype(np.float32)
    out = plevel_interp(from_values(fv), p, [450.0], log_p=False)
    assert np.allclose(np.asarray(out.values), 0.5 * 450.0 - 20.0, rtol=1e-6)


def test_out_of_range_masked():
    f, p = _column()
    out = plevel_interp(f, p, [50.0, 500.0, 1500.0])
    m = np.asarray(out.mask)
    assert not m[0].any()      # above model top
    assert m[1].all()
    assert not m[2].any()      # below lowest level


def test_undef_bracketing_level_masks_out():
    f, p = _column()
    fv = np.asarray(f.values).copy()
    fv[4, 1, 1] = UNDEF        # level 4 undefined at one point
    fof = from_sentinel(fv)
    p1d = np.asarray(p.values)[:, 0, 0]
    # a target bracketed by levels 4 and 5 is undef exactly there
    tgt = float(0.5 * (p1d[4] + p1d[5]))
    out = plevel_interp(fof, p, [tgt])
    m = np.asarray(out.mask)[0]
    assert not m[1, 1]
    assert m.sum() == m.size - 1
    # a target away from level 4 is unaffected
    out2 = plevel_interp(fof, p, [float(0.5 * (p1d[7] + p1d[8]))])
    assert np.asarray(out2.mask).all()


def test_hlevel_to_plevel_matches_manual():
    nlev, ny, nx = 8, 6, 7
    rng = np.random.default_rng(3)
    alevel = np.linspace(50.0, 0.0, nlev).astype(np.float32)
    blevel = np.linspace(0.05, 1.0, nlev).astype(np.float32)
    ps = from_values(rng.uniform(950, 1030, (ny, nx)).astype(np.float32))
    f = from_values(rng.normal(0, 1, (nlev, ny, nx)).astype(np.float32))
    out = hlevel_to_plevel(f, ps, alevel, blevel, [850.0])
    # manual per-point log-p interpolation
    pv = alevel[:, None, None] + blevel[:, None, None] * np.asarray(ps.values)
    got = np.asarray(out.values)[0]
    fv = np.asarray(f.values)
    for y in range(ny):
        for x in range(nx):
            col = pv[:, y, x]
            k = np.searchsorted(col, 850.0) - 1
            w = (np.log(np.float32(850.0)) - np.log(col[k])) / (
                np.log(col[k + 1]) - np.log(col[k]))
            e = fv[k, y, x] + (fv[k + 1, y, x] - fv[k, y, x]) * w
            assert abs(got[y, x] - e) < 5e-5, (y, x, got[y, x], e)


@pytest.mark.parametrize("variant", ["packed", "inplace", "carrysel"])
@pytest.mark.parametrize("log_p", [True, False])
def test_fused_interp_matches_jnp(log_p, variant):
    """Pallas column kernel == vmap one-hot path (masks bitwise, values
    to f32 round-off), with undefs in both the fields and ps — for every
    kernel variant (tools/perf_lab_vinterp.py picks the default)."""
    from mi_fieldcalc_tpu.ops.vertical_fused import hlevel_to_plevel_fused

    nlev, ny, nx = 13, 21, 37
    rng = np.random.default_rng(5)
    alevel = np.sort(rng.uniform(0, 300, nlev)).astype(np.float32)
    blevel = np.sort(rng.uniform(0, 1, nlev)).astype(np.float32)
    psv = rng.uniform(900, 1050, (ny, nx)).astype(np.float32)
    psv[2, 3] = UNDEF
    ps = from_sentinel(psv)
    fields = []
    for s in range(3):
        fv = rng.normal(280, 10, (nlev, ny, nx)).astype(np.float32)
        fv[rng.random((nlev, ny, nx)) < 0.15] = UNDEF
        fields.append(from_sentinel(fv))
    targets = (1000.0, 925.0, 850.0, 500.0, 100.0, 50.0)

    got = hlevel_to_plevel_fused(tuple(fields), ps, alevel, blevel,
                                 targets, log_p=log_p, interpret=True,
                                 variant=variant)
    for i, f in enumerate(fields):
        ref = hlevel_to_plevel(f, ps, alevel, blevel, targets, log_p=log_p)
        rm, gm = np.asarray(ref.mask), np.asarray(got[i].mask)
        assert np.array_equal(rm, gm), f"var {i}: mask mismatch"
        rv = np.asarray(ref.values)[rm]
        gv = np.asarray(got[i].values)[rm]
        assert np.allclose(rv, gv, rtol=2e-5, atol=1e-6), f"var {i}: values"


def test_fused_interp_single_var_tall_stack():
    """137-level column stack picks a narrower x chunk; still equivalent."""
    from mi_fieldcalc_tpu.ops.vertical_fused import (_pick_cx,
                                                     hlevel_to_plevel_fused)

    assert _pick_cx(137, 929, 4, 11) <= 256   # tall stacks chunk narrower
    assert _pick_cx(32, 929, 4, 11) >= 384
    nlev, ny, nx = 137, 9, 150
    rng = np.random.default_rng(9)
    alevel = np.linspace(50.0, 0.0, nlev).astype(np.float32)
    blevel = np.linspace(0.05, 1.0, nlev).astype(np.float32)
    ps = from_values(rng.uniform(950, 1030, (ny, nx)).astype(np.float32))
    f = from_values(rng.normal(0, 1, (nlev, ny, nx)).astype(np.float32))
    targets = (850.0, 500.0, 70.0)
    (got,) = hlevel_to_plevel_fused((f,), ps, alevel, blevel, targets,
                                    interpret=True)
    ref = hlevel_to_plevel(f, ps, alevel, blevel, targets)
    assert np.array_equal(np.asarray(ref.mask), np.asarray(got.mask))
    rm = np.asarray(ref.mask)
    # At 137 levels the ln(p) brackets are ~0.008 wide, so one ulp of the
    # f32 log (~4.8e-7 at ln 850) moves the interpolation weight by ~1e-4;
    # both paths carry that error vs float64 truth, in different
    # directions.  Assert each against the float64 ground truth.
    pv64 = (alevel.astype(np.float64)[:, None, None]
            + blevel.astype(np.float64)[:, None, None]
            * np.asarray(ps.values, np.float64))
    fv64 = np.asarray(f.values, np.float64)
    for t, tgt in enumerate(targets):
        cnt = (pv64 <= tgt).sum(axis=0)
        k = np.clip(cnt - 1, 0, nlev - 2)
        p0 = np.take_along_axis(pv64, k[None], 0)[0]
        p1 = np.take_along_axis(pv64, k[None] + 1, 0)[0]
        w = (np.log(tgt) - np.log(p0)) / (np.log(p1) - np.log(p0))
        f0 = np.take_along_axis(fv64, k[None], 0)[0]
        f1 = np.take_along_axis(fv64, k[None] + 1, 0)[0]
        truth = f0 + (f1 - f0) * w
        if not rm[t].any():     # 70 hPa sits above the model top
            continue
        for name, arr in (("jnp", ref.values), ("pallas", got.values)):
            err = np.abs(np.asarray(arr)[t] - truth)[rm[t]]
            assert err.max() < 1e-3, (name, t, err.max())


def test_isobaric_pipeline_runs_and_masks():
    nlev, ny, nx = 12, 16, 20
    rng = np.random.default_rng(7)
    tk = rng.normal(275, 10, (nlev, ny, nx)).astype(np.float32)
    q = rng.uniform(1e-4, 1e-2, (nlev, ny, nx)).astype(np.float32)
    u = rng.normal(0, 10, (nlev, ny, nx)).astype(np.float32)
    v = rng.normal(0, 10, (nlev, ny, nx)).astype(np.float32)
    ps = rng.uniform(980, 1030, (ny, nx)).astype(np.float32)
    alevel = np.linspace(30.0, 0.0, nlev).astype(np.float32)
    blevel = np.linspace(0.02, 1.0, nlev).astype(np.float32)
    xm = np.full((ny, nx), 4e-7, np.float32)
    ym = np.full((ny, nx), 4e-7, np.float32)
    fc = np.full((ny, nx), 1.2e-4, np.float32)
    args = (from_sentinel(tk), from_sentinel(q), from_sentinel(u),
            from_sentinel(v), from_sentinel(ps), jnp.asarray(alevel),
            jnp.asarray(blevel), jnp.asarray(xm), jnp.asarray(ym),
            jnp.asarray(fc))
    plevels = (850.0, 700.0, 500.0)
    out = jax.jit(lambda *a: derived_fields_isobaric(*a, plevels=plevels))(
        *args)
    assert out.th.values.shape == (3, ny, nx)
    # 850/700/500 hPa are inside every column (ps >= 980, top ~ 30-50 hPa)
    assert np.asarray(out.th.mask).all()
    assert np.isfinite(np.asarray(out.th.values)).all()
    # interpolated theta at 500 hPa should exceed theta at 850 (stable atm
    # not guaranteed with random T, so just check ranges are sane)
    assert np.asarray(out.rh.values)[np.asarray(out.rh.mask)].max() < 1e4


def test_isobaric_fused_matches_jnp():
    nlev, ny, nx = 6, 24, 40
    rng = np.random.default_rng(11)
    tk = rng.normal(275, 10, (nlev, ny, nx)).astype(np.float32)
    q = rng.uniform(1e-4, 1e-2, (nlev, ny, nx)).astype(np.float32)
    u = rng.normal(0, 10, (nlev, ny, nx)).astype(np.float32)
    v = rng.normal(0, 10, (nlev, ny, nx)).astype(np.float32)
    ps = rng.uniform(980, 1030, (ny, nx)).astype(np.float32)
    tk[2, 5, 5] = UNDEF
    args = (from_sentinel(tk), from_sentinel(q), from_sentinel(u),
            from_sentinel(v), from_sentinel(ps),
            jnp.linspace(30.0, 0.0, nlev).astype(jnp.float32),
            jnp.linspace(0.02, 1.0, nlev).astype(jnp.float32),
            jnp.full((ny, nx), 4e-7, jnp.float32),
            jnp.full((ny, nx), 4e-7, jnp.float32),
            jnp.full((ny, nx), 1.2e-4, jnp.float32))
    plv = (850.0, 700.0)
    ref = jax.jit(lambda *a: derived_fields_isobaric(*a, plevels=plv))(*args)
    got = derived_fields_isobaric(*args, plevels=plv, fused=True)
    for name in ref._fields:
        rm = np.asarray(getattr(ref, name).mask)
        gm = np.asarray(getattr(got, name).mask)
        rv = np.asarray(getattr(ref, name).values)
        gv = np.asarray(getattr(got, name).values)
        assert np.array_equal(rm, gm), f"{name}: mask mismatch"
        with np.errstate(all="ignore"):
            # atol floor: cancellation in the advection sum leaves ~1e-7
            # absolute noise on near-zero results under reassociation
            assert np.allclose(rv[rm], gv[rm], rtol=2e-5, atol=5e-6), \
                f"{name}: values"


def test_isobaric_fused_padded_layout_matches():
    """Canonical padded layout through the WHOLE isobaric pipeline:
    tile-aligned inputs + logical global_shape give the same logical
    outputs as the unpadded fused path, bitwise (same kernels, dead
    lanes masked out by construction)."""
    from mi_fieldcalc_tpu.layout import pad_array, pad_field, trim_field

    nlev, ny, nx = 6, 24, 40     # pads to (24, 128)
    rng = np.random.default_rng(13)
    tk = rng.normal(275, 10, (nlev, ny, nx)).astype(np.float32)
    q = rng.uniform(1e-4, 1e-2, (nlev, ny, nx)).astype(np.float32)
    u = rng.normal(0, 10, (nlev, ny, nx)).astype(np.float32)
    v = rng.normal(0, 10, (nlev, ny, nx)).astype(np.float32)
    ps = rng.uniform(980, 1030, (ny, nx)).astype(np.float32)
    tk[2, 5, 5] = UNDEF
    ps[3, 3] = UNDEF
    args = (from_sentinel(tk), from_sentinel(q), from_sentinel(u),
            from_sentinel(v), from_sentinel(ps),
            jnp.linspace(30.0, 0.0, nlev).astype(jnp.float32),
            jnp.linspace(0.02, 1.0, nlev).astype(jnp.float32),
            jnp.full((ny, nx), 4e-7, jnp.float32),
            jnp.full((ny, nx), 4e-7, jnp.float32),
            jnp.full((ny, nx), 1.2e-4, jnp.float32))
    plv = (850.0, 700.0)
    ref = derived_fields_isobaric(*args, plevels=plv, fused=True)
    pargs = tuple(
        pad_field(a) if hasattr(a, "mask") else
        (pad_array(a) if a.ndim == 2 else a)
        for a in args)
    got = derived_fields_isobaric(*pargs, plevels=plv, fused=True,
                                  global_shape=(ny, nx))
    for name in ref._fields:
        ra = getattr(ref, name)
        ga = trim_field(getattr(got, name), ny, nx)
        rm = np.asarray(ra.mask)
        assert np.array_equal(rm, np.asarray(ga.mask)), name
        assert np.array_equal(np.asarray(ra.values)[rm],
                              np.asarray(ga.values)[rm]), name
    with pytest.raises(ValueError):
        derived_fields_isobaric(*pargs, plevels=plv, fused=False,
                                global_shape=(ny, nx))
    # stacked SoA output through the isobaric pipeline
    stk = derived_fields_isobaric(*pargs, plevels=plv, fused=True,
                                  global_shape=(ny, nx), stacked=True)
    for i, name in enumerate(ref._fields):
        ra = getattr(ref, name)
        ga = trim_field(stk.field(i), ny, nx)
        rm = np.asarray(ra.mask)
        assert np.array_equal(rm, np.asarray(ga.mask)), name
        assert np.array_equal(np.asarray(ra.values)[rm],
                              np.asarray(ga.values)[rm]), name


def test_interp_fused_all_defined_matches():
    """all_defined=True (no input mask planes, one shared bracket-gate
    output mask) is bitwise-identical to the default path on fully
    defined inputs, for every kernel variant."""
    import jax.numpy as jnp
    from mi_fieldcalc_tpu.field import from_values
    from mi_fieldcalc_tpu.ops.vertical_fused import hlevel_to_plevel_fused

    rng = np.random.default_rng(17)
    nlev, ny, nx = 9, 16, 140
    flds = tuple(
        from_values(rng.normal(270, 20, (nlev, ny, nx)).astype(np.float32))
        for _ in range(3))
    ps = from_values(rng.uniform(700, 1030, (ny, nx)).astype(np.float32))
    al = jnp.asarray(np.linspace(50, 300, nlev), jnp.float32)
    bl = jnp.asarray(np.linspace(0.0, 0.7, nlev) ** 1.5, jnp.float32)
    tg = (925.0, 850.0, 500.0, 100.0)   # 100 hPa is above the top: gate
    for variant in ("packed", "inplace", "carrysel"):
        ref = hlevel_to_plevel_fused(flds, ps, al, bl, tg,
                                     interpret=True, variant=variant)
        got = hlevel_to_plevel_fused(flds, ps, al, bl, tg,
                                     interpret=True, variant=variant,
                                     all_defined=True)
        for i, (r, g) in enumerate(zip(ref, got)):
            rm = np.asarray(r.mask)
            assert np.array_equal(rm, np.asarray(g.mask)), (variant, i)
            assert np.array_equal(np.asarray(r.values)[rm],
                                  np.asarray(g.values)[rm]), (variant, i)
        assert not np.asarray(ref[0].mask).all()   # the gate fired
