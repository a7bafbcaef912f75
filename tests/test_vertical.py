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
