"""Drop-in replacement for the reference's ``mi_fieldcalc`` python module.

The reference binds 15 functions via pybind11 (python/py_mi_fieldcalc.cc:
179-208) with numpy-in / numpy-out signatures, a trailing ``undef``
sentinel float, and ``None`` returned for invalid shapes or parameters
(py_mi_fieldcalc.cc:72-96).  This module reproduces that surface exactly —
``import mi_fieldcalc_tpu.api as fc`` is a drop-in for
``import mi_fieldcalc as fc`` — while running every calculation through
the TPU-native mask-lane kernels.

Sentinel decode/encode happens only here, at the boundary, mirroring
``is_defined`` (FieldCalculations.h:42-45); inside, everything is Fields.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .field import UNDEF, ValuesDefined, from_sentinel  # noqa: F401 (enum re-export)
from . import ops

__all__ = [
    "ValuesDefined", "kIndex", "ductingIndex", "showalterIndex",
    "boydenIndex", "sweatIndex", "seaSoundSpeed", "cvtemp", "cvhum",
    "abshum", "windCooling", "underCooledRain", "vesselIcingOverland",
    "vesselIcingMertins", "vesselIcingModStall", "vesselIcingMincog",
]


def _wrap(op, undef, *arrays, scalars=(), kwscalars=None):
    """The py_wrap_2d equivalent: validate 2-D equal shapes, decode
    sentinels, run, re-encode.  Returns None on invalid input, like the
    reference binding."""
    npa = [np.asarray(a, dtype=np.float32) for a in arrays]
    if npa[0].ndim != 2 or any(a.shape != npa[0].shape for a in npa[1:]):
        return None
    fields = [from_sentinel(a, undef) for a in npa]
    try:
        out = op(*fields, *scalars, **(kwscalars or {}))
    except ValueError:
        return None  # reference operators signal bad parameters with false
    return np.asarray(out.to_sentinel(undef))


def kIndex(t500, t700, rh700, t850, rh850, p500: float, p700: float,
           p850: float, compute: int, undef: float = UNDEF):
    return _wrap(ops.k_index, undef, t500, t700, rh700, t850, rh850,
                 scalars=(p500, p700, p850, compute))


def ductingIndex(t850, rh850, p850: float, compute: int,
                 undef: float = UNDEF):
    return _wrap(ops.ducting_index, undef, t850, rh850,
                 scalars=(p850, compute))


def showalterIndex(t500, t850, rh850, p500: float, p850: float,
                   compute: int, undef: float = UNDEF):
    return _wrap(ops.showalter_index, undef, t500, t850, rh850,
                 scalars=(p500, p850, compute))


def boydenIndex(t700, z700, z1000, p700: float, p1000: float, compute: int,
                undef: float = UNDEF):
    return _wrap(ops.boyden_index, undef, t700, z700, z1000,
                 scalars=(p700, p1000, compute))


def sweatIndex(t850, t500, td850, td500, u850, v850, u500, v500,
               undef: float = UNDEF):
    return _wrap(ops.sweat_index, undef, t850, t500, td850, td500,
                 u850, v850, u500, v500)


def seaSoundSpeed(t, s, z: float, compute: int, undef: float = UNDEF):
    return _wrap(ops.sea_sound_speed, undef, t, s, scalars=(z, compute))


def cvtemp(tinp, compute: int, undef: float = UNDEF):
    return _wrap(ops.cvtemp, undef, tinp, scalars=(compute,))


def cvhum(t, huminp, unit: str, compute: int, undef: float = UNDEF):
    return _wrap(ops.cvhum, undef, t, huminp, scalars=(compute, unit))


def abshum(t, rhum, undef: float = UNDEF):
    return _wrap(ops.abshum, undef, t, rhum)


def windCooling(t, u, v, compute: int, undef: float = UNDEF):
    return _wrap(ops.wind_cooling, undef, t, u, v, scalars=(compute,))


def underCooledRain(precip, snow, tk, precipMin: float, snowRateMax: float,
                    tcMax: float, undef: float = UNDEF):
    return _wrap(ops.under_cooled_rain, undef, precip, snow, tk,
                 scalars=(precipMin, snowRateMax, tcMax))


def vesselIcingOverland(airtemp, seatemp, u, v, sal, aice,
                        undef: float = UNDEF):
    return _wrap(ops.vessel_icing_overland, undef, airtemp, seatemp, u, v,
                 sal, aice)


def vesselIcingMertins(airtemp, seatemp, u, v, sal, aice,
                       undef: float = UNDEF):
    return _wrap(ops.vessel_icing_mertins, undef, airtemp, seatemp, u, v,
                 sal, aice)


def vesselIcingModStall(sal, wave, x_wind, y_wind, airtemp, rh, sst, p, Pw,
                        aice, depth, vs: float, alpha: float, zmin: float,
                        zmax: float, undef: float = UNDEF):
    return _wrap(ops.vessel_icing_modstall, undef, sal, wave, x_wind,
                 y_wind, airtemp, rh, sst, p, Pw, aice, depth,
                 scalars=(vs, alpha, zmin, zmax))


def vesselIcingMincog(sal, wave, x_wind, y_wind, airtemp, rh, sst, p, Pw,
                      aice, depth, vs: float, alpha: float, zmin: float,
                      zmax: float, alt: int, undef: float = UNDEF):
    return _wrap(ops.vessel_icing_mincog, undef, sal, wave, x_wind, y_wind,
                 airtemp, rh, sst, p, Pw, aice, depth,
                 scalars=(vs, alpha, zmin, zmax, alt))
