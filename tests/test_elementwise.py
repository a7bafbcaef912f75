"""Elementwise / arithmetic / ensemble operator tests, mirroring
FieldCalculationsTest.cc (XOperX, Probability, Probability12,
ReplaceDefined, ReplaceUndefined) plus extra coverage."""

import numpy as np
import pytest

from mi_fieldcalc_tpu import (
    UNDEF as MIUNDEF, ValuesDefined, from_sentinel, from_values, full_undef,
    ops,
)

UNDEF = 12356789.0
T0 = 273.15
ALL = ValuesDefined.ALL_DEFINED
NONE = ValuesDefined.NONE_DEFINED
SOME = ValuesDefined.SOME_DEFINED


def one(v, defined=True):
    f = from_values(np.full((1, 1), v, np.float32))
    if not defined:
        return full_undef((1, 1))
    return f


# --- XOperX (FieldCalculationsTest.cc:180-223) ------------------------------
PLUS, MINUS, MUL, DIV = 1, 2, 3, 4
OPER_PARAMS = [
    (PLUS, 1, 3, 4), (MINUS, 1, 3, -2), (MUL, 1.5, 3, 4.5),
    (DIV, 3, 1.5, 2), (DIV, 3, 0, None),  # None = expect undefined
]


@pytest.mark.parametrize("c,a,b,expect", OPER_PARAMS)
def test_field_oper_field(c, a, b, expect):
    out = ops.field_oper_field(c, one(a), one(b))
    if expect is None:
        assert out.defined_state() == NONE
    else:
        assert abs(float(out.values[0, 0]) - expect) < 1e-6
        assert out.defined_state() == ALL


@pytest.mark.parametrize("c,a,b,expect", OPER_PARAMS)
def test_field_oper_constant(c, a, b, expect):
    out = ops.field_oper_constant(c, one(a), b, undef=UNDEF)
    if expect is None:
        assert out.defined_state() == NONE
    else:
        assert abs(float(out.values[0, 0]) - expect) < 1e-6


@pytest.mark.parametrize("c,a,b,expect", OPER_PARAMS)
def test_constant_oper_field(c, a, b, expect):
    out = ops.constant_oper_field(c, a, one(b), undef=UNDEF)
    if expect is None:
        assert out.defined_state() == NONE
    else:
        assert abs(float(out.values[0, 0]) - expect) < 1e-6


# --- Probability (FieldCalculationsTest.cc:225-305) --------------------------

def test_probability():
    n_ens = 10
    vals = np.full((n_ens, 1, 1), UNDEF, np.float32)
    vals[2] = 940
    vals[4] = 3500
    members = from_sentinel(vals, undef=UNDEF)
    defined = [SOME] * n_ens
    defined[0] = NONE
    defined[8] = NONE

    out = ops.probability(2, members, [3000, 3000], defined)
    assert abs(float(out.values[0, 0]) - 100.0 * 1 / 8) < 1e-6
    assert out.defined_state() == ALL

    out = ops.probability(1, members, [3000, 3000], defined)
    assert abs(float(out.values[0, 0]) - 100.0 * 1 / 8) < 1e-6

    out = ops.probability(2, members, [4000, 3000], defined)
    assert abs(float(out.values[0, 0]) - 100.0 * 2 / 8) < 1e-6

    out = ops.probability(3, members, [500, 4000], defined)
    assert abs(float(out.values[0, 0]) - 100.0 * 2 / 8) < 1e-6


def test_probability12():
    """Per-point undefs lower the probability, not the denominator
    (FieldCalculationsTest.cc:276-305)."""
    n_ens = 10
    vals = np.full((n_ens, 1, 1), 12.0, np.float32)
    vals[3] = UNDEF
    vals[5] = UNDEF
    members = from_sentinel(vals, undef=UNDEF)
    defined = [SOME] * n_ens

    out = ops.probability(2, members, [3000], defined)
    assert abs(float(out.values[0, 0]) - 80.0) < 1e-6
    assert out.defined_state() == ALL

    out = ops.probability(1, members, [3000], defined)
    assert abs(float(out.values[0, 0])) < 1e-6


def test_probability_traced_member_flags():
    """member_defined_mask (a traced [nmem] bool vector — the sharded
    path's globally-reduced flags) reproduces the static member_defined
    semantics exactly, and passing both raises."""
    import jax.numpy as jnp
    import pytest as _pytest

    n_ens = 10
    vals = np.full((n_ens, 1, 1), UNDEF, np.float32)
    vals[2] = 940
    vals[4] = 3500
    members = from_sentinel(vals, undef=UNDEF)
    defined = [SOME] * n_ens
    defined[0] = NONE
    defined[8] = NONE
    mask_vec = jnp.asarray([d != NONE for d in defined])

    for compute, limits, expect in ((2, [3000, 3000], 100.0 / 8),
                                    (1, [3000, 3000], 100.0 / 8),
                                    (3, [500, 4000], 200.0 / 8)):
        ref = ops.probability(compute, members, limits, defined)
        got = ops.probability(compute, members, limits,
                              member_defined_mask=mask_vec)
        assert float(ref.values[0, 0]) == float(got.values[0, 0])
        assert got.defined_state() == ALL

    with _pytest.raises(ValueError):
        ops.probability(1, members, [3000], defined,
                        member_defined_mask=mask_vec)


def test_probability_counts():
    vals = np.array([[[1.0]], [[5.0]], [[9.0]]], np.float32)
    members = from_sentinel(vals, undef=UNDEF)
    out = ops.probability(4, members, [2.0], [ALL] * 3)  # above, count
    assert float(out.values[0, 0]) == 2.0


# --- Replace (FieldCalculationsTest.cc:453-513) ------------------------------

def test_replace_defined():
    f = from_sentinel(np.array([0.0, 1.0], np.float32), undef=0.0)
    out = ops.replace_defined(f, 5.0, undef=0.0)
    assert np.asarray(out.to_sentinel(0.0)).tolist() == [0.0, 5.0]
    # reference force-flags ALL_DEFINED here while keeping the sentinel in
    # the data (cc:2600-2607); we keep the honest mask (see replace_defined)
    assert out.defined_state() == SOME

    f2 = from_values(np.array([0.0, 1.0], np.float32))
    out = ops.replace_defined(f2, 7.0, undef=-1.0)
    assert np.asarray(out.values).tolist() == [7.0, 7.0]

    f3 = full_undef((2,))
    out = ops.replace_defined(f3, 7.0, undef=-1.0)
    assert out.defined_state() == NONE

    # value == undef -> all undefined
    out = ops.replace_defined(f, 1.0, undef=1.0)
    assert out.defined_state() == NONE


def test_replace_undefined():
    f = from_sentinel(np.array([0.0, 1.0], np.float32), undef=0.0)
    out = ops.replace_undefined(f, 5.0, undef=0.0)
    assert np.asarray(out.values).tolist() == [5.0, 1.0]
    assert out.defined_state() == ALL

    f3 = full_undef((2,))
    out = ops.replace_undefined(f3, 7.0, undef=-1.0)
    assert np.asarray(out.values).tolist() == [7.0, 7.0]
    assert out.defined_state() == ALL

    # value == undef -> no-op
    out = ops.replace_undefined(f, 0.0, undef=0.0)
    assert out.defined_state() == SOME


# --- ensemble statistics -----------------------------------------------------

def test_sum_mean_stddev():
    vals = np.array([[[1.0, 2.0]], [[3.0, UNDEF]], [[5.0, 4.0]]], np.float32)
    members = from_sentinel(vals, undef=UNDEF)
    s = ops.sum_fields(members)
    assert float(s.values[0, 0]) == 9.0
    assert s.mask.tolist() == [[True, False]]

    m = ops.mean_value(members)
    assert float(m.values[0, 0]) == 3.0
    assert float(m.values[0, 1]) == 3.0  # mean of 2, 4 over defined
    assert m.defined_state() == ALL

    sd = ops.stddev_value(members)
    np.testing.assert_allclose(float(sd.values[0, 0]),
                               np.sqrt(((1 - 3)**2 + 0 + (5 - 3)**2) / 3),
                               rtol=1e-6)


def test_extreme_value_modes_and_quirks():
    vals = np.array([[[1.0, UNDEF, UNDEF]],
                     [[5.0, 2.0, UNDEF]],
                     [[3.0, UNDEF, UNDEF]]], np.float32)
    members = from_sentinel(vals, undef=UNDEF)
    mx = ops.extreme_value(1, members)
    assert float(mx.values[0, 0]) == 5.0
    assert float(mx.values[0, 1]) == 2.0
    assert not bool(mx.mask[0, 2])  # all undef -> undefined

    mn = ops.extreme_value(2, members)
    assert float(mn.values[0, 0]) == 1.0

    amx = ops.extreme_value(3, members)
    assert float(amx.values[0, 0]) == 1.0  # member index of 5.0
    assert float(amx.values[0, 1]) == 1.0
    # reference quirk: all-undef point yields last index, marked defined
    assert float(amx.values[0, 2]) == 2.0
    assert bool(amx.mask[0, 2])

    amn = ops.extreme_value(4, members)
    assert float(amn.values[0, 0]) == 0.0


# --- assorted elementwise ops -------------------------------------------------

def test_cvtemp_modes():
    t = one(280.0)
    out = ops.cvtemp(t, 1)
    np.testing.assert_allclose(float(out.values[0, 0]), 280.0 - T0, rtol=1e-6)
    out = ops.cvtemp(t, 2)
    np.testing.assert_allclose(float(out.values[0, 0]), 280.0 + T0, rtol=1e-6)
    # auto-detect: 280K looks like Kelvin -> converts
    out = ops.cvtemp(t, 3)
    np.testing.assert_allclose(float(out.values[0, 0]), 280.0 - T0, rtol=1e-6)
    # 6.85C does not look like Kelvin -> unchanged
    out = ops.cvtemp(one(6.85), 3)
    np.testing.assert_allclose(float(out.values[0, 0]), 6.85, rtol=1e-6)
    # 6.85C looks like Celsius -> converts
    out = ops.cvtemp(one(6.85), 4)
    np.testing.assert_allclose(float(out.values[0, 0]), 6.85 + T0, rtol=1e-6)


def test_cvhum_roundtrip():
    # T, RH -> Td, then T, Td -> RH
    td = ops.cvhum(one(293.15), one(70.0), 1)  # Td in Kelvin
    rh = ops.cvhum(one(293.15), one(float(td.values[0, 0])), 4)
    np.testing.assert_allclose(float(rh.values[0, 0]), 70.0, atol=0.5)
    # unit "1" gives fraction
    rh1 = ops.cvhum(one(293.15), one(float(td.values[0, 0])), 4, unit="1")
    np.testing.assert_allclose(float(rh1.values[0, 0]), 0.70, atol=0.005)


def test_vectorabs():
    out = ops.vectorabs(one(3.0), one(4.0))
    assert float(out.values[0, 0]) == 5.0


def test_wind_cooling():
    # 0C, 10 m/s wind: NWS wind chill ~ -7C => difference ~ -7
    out = ops.wind_cooling(one(T0), one(10.0), one(0.0), 1)
    v = float(out.values[0, 0])
    assert -9 < v < -5
    # clamped at 0 for warm/no wind
    out = ops.wind_cooling(one(30.0), one(0.0), one(0.0), 2)
    assert float(out.values[0, 0]) == 0.0


def test_under_cooled_rain():
    out = ops.under_cooled_rain(one(1.0), one(0.0), one(T0 - 1.0),
                                0.1, 0.5, 0.0)
    assert float(out.values[0, 0]) == 1.0
    out = ops.under_cooled_rain(one(0.01), one(0.0), one(T0 - 1.0),
                                0.1, 0.5, 0.0)
    assert float(out.values[0, 0]) == 0.0


def test_pressure2flightlevel():
    from mi_fieldcalc_tpu.constants import P_LEVEL_TABLE, F_LEVEL_TABLE
    # exact at table nodes
    f = from_values(P_LEVEL_TABLE.reshape(4, 4))
    out = ops.pressure2flightlevel(f)
    np.testing.assert_allclose(np.asarray(out.values).reshape(-1),
                               F_LEVEL_TABLE, rtol=1e-6)
    # clamping beyond table ends
    out = ops.pressure2flightlevel(one(1100.0))
    np.testing.assert_allclose(float(out.values[0, 0]), 5.0, rtol=1e-6)
    out = ops.pressure2flightlevel(one(5.0))
    np.testing.assert_allclose(float(out.values[0, 0]), 1020.0, rtol=1e-6)
    # interpolation between 850 and 800
    out = ops.pressure2flightlevel(one(825.0))
    np.testing.assert_allclose(float(out.values[0, 0]), 57.5, rtol=1e-6)


def test_values2classes():
    f = from_values(np.array([[0.5, 1.5, 2.5, 3.5, -1.0, 99.0]], np.float32))
    out = ops.values2classes(f, [0.0, 1.0, 2.0, 3.0, 4.0])
    got = np.asarray(out.values)
    # the reference's scan caps j at nvalues (cc:2488-2491), so the top
    # in-range bucket [3, 4) folds into class nvalues-1 = 2
    assert got[0, 0] == 0 and got[0, 1] == 1 and got[0, 2] == 2 \
        and got[0, 3] == 2
    assert not bool(out.mask[0, 4]) and not bool(out.mask[0, 5])


def test_min_max_and_unary():
    a = from_values(np.array([1.0, 5.0], np.float32))
    b = from_values(np.array([3.0, 2.0], np.float32))
    assert np.asarray(ops.minvalue_fields(a, b).values).tolist() == [1.0, 2.0]
    assert np.asarray(ops.maxvalue_fields(a, b).values).tolist() == [3.0, 5.0]
    assert np.asarray(ops.minvalue_field_const(a, 2.0).values).tolist() == [1.0, 2.0]
    assert ops.maxvalue_field_const(a, UNDEF, undef=UNDEF).defined_state() == NONE
    np.testing.assert_allclose(
        np.asarray(ops.log10_field(from_values(np.array([100.0]))).values),
        [2.0], rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ops.pow10_field(from_values(np.array([2.0]))).values),
        [100.0], rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ops.power_field(from_values(np.array([3.0])), 2.0).values),
        [9.0], rtol=1e-5)


def test_snow_in_cm():
    # cold case: factor > 1
    out = ops.snow_in_cm(one(5.0), one(T0 - 10.0), one(T0 - 12.0))
    assert float(out.values[0, 0]) > 5.0
    # warm case: factor clamped, model consistency keeps snow_water
    out = ops.snow_in_cm(one(5.0), one(T0 + 5.0), one(T0 + 3.0))
    assert float(out.values[0, 0]) == 5.0
    # zero snow
    out = ops.snow_in_cm(one(0.0), one(T0 - 10.0), one(T0 - 12.0))
    assert float(out.values[0, 0]) == 0.0
