"""Constants / ICAO atmosphere tests, mirroring MetConstantsTest.cc."""

import numpy as np
import pytest

from mi_fieldcalc_tpu import constants as C

# from ICAO doc 7488 (MetConstantsTest.cc:39-58)
P_H_DOC7488 = [
    (8.7, 31985), (10.0, 31055), (11.1, 30360), (19.4, 26680),
    (97.3, 16353), (139.5, 14069), (244.1, 10517), (354.2, 8035),
    (459.7, 6189), (590.8, 4324), (739.7, 2576), (840.7, 1547),
    (936.8, 657), (1010.0, 27), (1020.0, -56), (1050.0, -302),
    (1130.0, -929),
]

P_FL_EXAMPLES = [
    (600, 140), (500, 185), (400, 235), (300, 300), (250, 340),
    (200, 385), (150, 445),
]


def test_icao_geo_altitude_from_pressure():
    for p, h in P_H_DOC7488:
        assert abs(C.icao_geo_altitude_from_pressure(p) - h) < 1.55, p


def test_icao_fl_examples():
    for p, fl in P_FL_EXAMPLES:
        got = C.fl_from_geo_altitude(C.icao_geo_altitude_from_pressure(p))
        assert got == fl, p


def test_icao_flight_level_table_roundtrip():
    # MetConstantsTest.cc:94-102
    for p, fl in zip(C.P_LEVEL_TABLE, C.F_LEVEL_TABLE):
        got = C.fl_from_geo_altitude(
            C.icao_geo_altitude_from_pressure(float(p)))
        assert got == fl, p


def test_icao_pressure_from_geo_altitude():
    for p, h in P_H_DOC7488:
        got = C.icao_pressure_from_geo_altitude(h)
        assert abs(got - p) < 0.01 * p, h


def test_icao_vectorized():
    ps = np.array([x[0] for x in P_H_DOC7488])
    hs = np.array([x[1] for x in P_H_DOC7488], dtype=float)
    got = C.icao_geo_altitude_from_pressure(ps)
    assert np.all(np.abs(got - hs) < 1.55)


def test_ewt_table_interp_and_inverse():
    import jax.numpy as jnp
    # exact at table nodes
    for i, tc in enumerate(range(-100, 101, 5)):
        if tc >= 100:
            continue  # last node is the open end of the table
        x, l = C.ewt_index(float(tc))
        assert bool(C.ewt_defined(l)), tc
        assert np.isclose(float(C.ewt_value(x, l)), C.EWT[i], rtol=1e-6), tc
    # midpoint interpolation
    x, l = C.ewt_index(2.5)  # between 0 and 5 degC
    expect = 0.5 * (C.EWT[20] + C.EWT[21])
    assert np.isclose(float(C.ewt_value(x, l)), expect, rtol=1e-6)
    # inverse round trip: T -> e -> T
    for tc in [-40.0, -7.5, 0.0, 12.3, 25.0, 37.0]:
        x, l = C.ewt_index(tc)
        et = C.ewt_value(x, l)
        back = float(C.ewt_inverse(et, l))
        assert abs(back - tc) < 1e-3, tc


def test_ewt_out_of_range_matches_reference_truncation():
    # C truncation toward zero: t in (-105, -100) gives l == 0 => defined
    x, l = C.ewt_index(-102.0)
    assert int(l) == 0 and bool(C.ewt_defined(l))
    x, l = C.ewt_index(-106.0)
    assert not bool(C.ewt_defined(l))
    x, l = C.ewt_index(100.0)
    assert not bool(C.ewt_defined(l))
    x, l = C.ewt_index(99.9)
    assert bool(C.ewt_defined(l))
