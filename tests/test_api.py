"""Drop-in compatibility tests for mi_fieldcalc_tpu.api.

Mirrors the reference's python unittest (python/test_mi_fieldcalc.py:36-41)
and the binding's None-return conventions (py_mi_fieldcalc.cc:72-96).
"""

import numpy as np

import mi_fieldcalc_tpu.api as fc


def test_abshum_reference_value():
    # python/test_mi_fieldcalc.py:36-41: abshum(293.16K, 0.8) ~= 13.83
    tk = np.array([[293.16]])
    rh = np.array([[0.8]])
    ah = fc.abshum(tk, rh, -1)
    assert ah is not None
    assert abs(ah[0, 0] - 13.83) < 0.02


def test_shape_mismatch_returns_none():
    a = np.zeros((2, 2), np.float32)
    b = np.zeros((2, 3), np.float32)
    assert fc.abshum(a, b) is None


def test_non_2d_returns_none():
    a = np.zeros((4,), np.float32)
    assert fc.cvtemp(a, 1) is None


def test_bad_parameter_returns_none():
    a = np.zeros((2, 2), np.float32)
    assert fc.cvtemp(a, 99) is None
    assert fc.seaSoundSpeed(a, a, 10.0, 3) is None


def test_undef_sentinel_roundtrip():
    undef = 1.0e35
    t = np.full((3, 3), 280.0, np.float32)
    t[1, 1] = undef
    u = np.full((3, 3), 5.0, np.float32)
    v = np.full((3, 3), 5.0, np.float32)
    out = fc.windCooling(t, u, v, 1, undef)
    assert out is not None
    assert out[1, 1] == undef
    assert out[0, 0] != undef


def test_cvhum_dewpoint():
    # cvhum compute=1: T(K), RH(%) -> Td(K); Td <= T, sane range
    t = np.full((2, 2), 290.0, np.float32)
    rh = np.full((2, 2), 50.0, np.float32)
    td = fc.cvhum(t, rh, "", 1)
    assert td is not None
    assert np.all(td < 290.0) and np.all(td > 250.0)


def test_vessel_icing_runs():
    shp = (4, 4)
    airtemp = np.full(shp, -10.0, np.float32)
    seatemp = np.full(shp, 2.0, np.float32)
    u = np.full(shp, 15.0, np.float32)
    v = np.full(shp, 5.0, np.float32)
    sal = np.full(shp, 35.0, np.float32)
    aice = np.zeros(shp, np.float32)
    over = fc.vesselIcingOverland(airtemp, seatemp, u, v, sal, aice)
    mert = fc.vesselIcingMertins(airtemp, seatemp, u, v, sal, aice)
    assert over is not None and np.all(over > 0)
    assert mert is not None and np.all(mert >= 0)
