"""Level-family operator tests, mirroring FieldCalculationsTest.cc
(absHum, XLevelHum, ALevelTempPerformance) plus extra coverage."""

import numpy as np
import jax.numpy as jnp
import pytest

from mi_fieldcalc_tpu import ValuesDefined, from_sentinel, from_values, ops
from mi_fieldcalc_tpu.constants import kappa, p0inv, t0

UNDEF = 12356789.0
T0 = 273.15
ALL = ValuesDefined.ALL_DEFINED


def one(v):
    return from_values(np.full((1, 1), v, np.float32))


def test_abshum():
    # FieldCalculationsTest.cc:56-68
    out = ops.abshum(one(293.16), one(0.8))
    assert abs(float(out.values[0, 0]) - 13.82) < 0.1
    assert out.defined_state() == ALL


# alevelhum/hlevelhum vs plevelhum compute numbering
# (FieldCalculationsTest.cc:72-83)
LEVELHUM_PARAMS = [
    # (cah, cp, t, humin, p, expect, near)
    (1, 1, 30.68 + T0, .025, 1013, 91.9, 0.1),
    (2, 2, 302.71, .025, 1013, 91.9, 0.1),
    (3, 3, 30.68 + T0, 55, 1013, 0.014963, .000001),
    (4, 4, 302.71, 55, 1013, 0.014963, .000001),
    (5, 7, 30.68 + T0, .015, 1013, 20.6, 0.1),
    (6, 8, 302.71, .015, 1013, 20.6, 0.1),
    (7, 5, 30.68 + T0, 55, 1013, 20.6, 0.1),
    (8, 6, 302.71, 55, 1013, 20.6, 0.1),
]


@pytest.mark.parametrize("cah,cp_,t,humin,p,expect,near", LEVELHUM_PARAMS)
def test_xlevelhum(cah, cp_, t, humin, p, expect, near):
    tf, hf, pf = one(t), one(humin), one(p)

    for unit, offset in [("celsius", 0.0)] + (
            [("kelvin", T0)] if cah >= 5 else []):
        a = ops.alevelhum(tf, hf, pf, cah, unit)
        h = ops.hlevelhum(tf, hf, pf, 0.0, 1.0, cah, unit)
        pl = ops.plevelhum(tf, hf, p, cp_, unit)
        for name, o in [("alevelhum", a), ("hlevelhum", h), ("plevelhum", pl)]:
            assert abs(float(o.values[0, 0]) - (expect + offset)) <= near, \
                (name, unit)
            assert o.defined_state() == ALL, (name, unit)


def test_aleveltemp_canary_719x929():
    """ALevelTempPerformance (FieldCalculationsTest.cc:145-170): T->theta on
    the operational AROME-MetCoOp grid, checked against the closed form
    evaluated with the same pow implementation."""
    N = 719 * 929
    F = 1e-5
    i = np.arange(N, dtype=np.float32)
    tk = (20 + i * F + T0).astype(np.float32).reshape(719, 929)
    p = (1005 + i * F).astype(np.float32).reshape(719, 929)
    th = ops.aleveltemp(from_values(tk), from_values(p), 3, "kelvin")
    # bit-exact vs the closed form through the library's own pow (the
    # reference's expected side likewise calls ITS std::pow,
    # FieldCalculationsTest.cc:160; since round 5 that is the
    # narrow-domain deterministic _libm.pow_posc_f32 — shared bitwise
    # with the flagship kernel)
    from mi_fieldcalc_tpu._libm import pow_posc_f32
    expect = jnp.asarray(tk) / pow_posc_f32(jnp.asarray(p) * p0inv, kappa)
    np.testing.assert_array_equal(np.asarray(th.values), np.asarray(expect))
    assert th.defined_state() == ALL
    # and within EXPECT_FLOAT_EQ-class tolerance (~4 ulp) of an
    # INDEPENDENT pow: both jnp.power and libm powf
    expect_x = np.asarray(
        jnp.asarray(tk) / jnp.power(jnp.asarray(p) * p0inv, kappa))
    np.testing.assert_allclose(np.asarray(th.values), expect_x, rtol=5e-7)
    expect_np = tk / np.power(p * np.float32(p0inv), np.float32(kappa))
    np.testing.assert_allclose(np.asarray(th.values), expect_np, rtol=1e-5)


def test_pleveltemp_modes():
    pidcp = np.float32((925.0 / 1000.0) ** np.float32(287.0 / 1004.0))
    t = one(280.0)
    c1 = ops.pleveltemp(t, 925.0, 1)
    np.testing.assert_allclose(float(c1.values[0, 0]),
                               280.0 * pidcp - T0, rtol=1e-6)
    c2 = ops.pleveltemp(t, 925.0, 2)
    c3 = ops.pleveltemp(c2, 925.0, 3)
    np.testing.assert_allclose(float(c3.values[0, 0]), 280.0, rtol=1e-6)
    # unit override: compute<3 with unit
    cu = ops.pleveltemp(t, 925.0, 2, "celsius")
    np.testing.assert_allclose(float(cu.values[0, 0]),
                               float(c1.values[0, 0]), rtol=1e-6)


def test_pleveltemp_thesat_out_of_table_is_undef():
    # T far above +100C leaves the saturation table -> undefined
    t = one(400.0)
    out = ops.pleveltemp(t, 925.0, 4)
    assert out.defined_state() == ValuesDefined.NONE_DEFINED


def test_plevelhum_p_undef_fills():
    out = ops.plevelhum(one(280.0), one(50.0), UNDEF, 3, undef=UNDEF)
    assert out.defined_state() == ValuesDefined.NONE_DEFINED
    # pressure-independent mode still computes
    out = ops.plevelhum(one(280.0), one(50.0), UNDEF, 5, undef=UNDEF)
    assert out.defined_state() == ALL


def test_hlevel_invalid_coefficients_raise():
    t, ps = one(280.0), one(1000.0)
    with pytest.raises(ValueError):
        ops.hleveltemp(t, ps, -1.0, 0.5, 2)
    with pytest.raises(ValueError):
        ops.hleveltemp(t, ps, 0.0, 0.0, 2)
    with pytest.raises(ValueError):
        ops.hleveltemp(t, ps, 0.0, 1.5, 2)


def test_three_level_families_agree_on_same_pressure():
    rng = np.random.default_rng(0)
    t = rng.uniform(250, 310, (8, 8)).astype(np.float32)
    q = rng.uniform(0.001, 0.02, (8, 8)).astype(np.float32)
    p = np.full((8, 8), 850.0, np.float32)
    tf, qf, pf = from_values(t), from_values(q), from_values(p)
    a = ops.alevelhum(tf, qf, pf, 1)
    h = ops.hlevelhum(tf, qf, pf, 0.0, 1.0, 1)
    np.testing.assert_allclose(np.asarray(a.values), np.asarray(h.values),
                               rtol=1e-6)
    pl = ops.plevelhum(tf, qf, 850.0, 1)
    np.testing.assert_allclose(np.asarray(a.values), np.asarray(pl.values),
                               rtol=1e-5)


def test_undef_propagation_through_masks():
    t = from_sentinel(np.array([[280.0, UNDEF], [290.0, 300.0]], np.float32),
                      undef=UNDEF)
    rh = from_sentinel(np.array([[50.0, 50.0], [UNDEF, 60.0]], np.float32),
                       undef=UNDEF)
    out = ops.plevelhum(t, rh, 850.0, 3)
    assert out.mask.tolist() == [[True, False], [False, True]]
    enc = out.to_numpy(UNDEF)
    assert enc[0, 1] == np.float32(UNDEF) and enc[1, 0] == np.float32(UNDEF)


def test_plevelthe_basic():
    # theta_e should exceed theta for moist air
    out = ops.plevelthe(one(285.0), one(80.0), 850.0, 1)
    assert out.defined_state() == ALL
    theta = ops.pleveltemp(one(285.0), 850.0, 3)
    assert float(out.values[0, 0]) > float(theta.values[0, 0])


def test_hlevelpressure():
    ps = one(1013.0)
    out = ops.hlevelpressure(ps, 100.0, 0.5)
    np.testing.assert_allclose(float(out.values[0, 0]), 100.0 + 0.5 * 1013.0,
                               rtol=1e-6)


def test_sea_sound_speed():
    # T=10C, S=35ppt, z=0: canonical value ~1490 m/s
    out = ops.sea_sound_speed(one(10.0), one(35.0), 0.0, 1)
    v = float(out.values[0, 0])
    assert 1480 < v < 1500
    # Kelvin input agrees with Celsius input
    outk = ops.sea_sound_speed(one(10.0 + T0), one(35.0), 0.0, 2)
    np.testing.assert_allclose(v, float(outk.values[0, 0]), atol=1e-3)


def test_pleveldz2tmean():
    # equal heights -> tmean == tconvert; basic smoke on all modes
    z1, z2 = one(5500.0), one(1400.0)
    for compute in (1, 2, 3):
        out = ops.pleveldz2tmean(z1, z2, 500.0, 850.0, compute)
        assert out.defined_state() == ALL
    m1 = float(ops.pleveldz2tmean(z1, z2, 500.0, 850.0, 1).values[0, 0])
    m2 = float(ops.pleveldz2tmean(z1, z2, 500.0, 850.0, 2).values[0, 0])
    np.testing.assert_allclose(m2 - m1, T0, rtol=1e-5)
