"""Generate conformance goldens by replaying tests/conformance_cases.py
through the compiled reference library (tools/oracle/build.sh).

Usage:  python tools/oracle/gen_goldens.py [output.npz]

Writes tests/goldens/goldens.npz with, per case:
  <name>__out   float32 output grid (sentinel-encoded)
  <name>__out2  second output (ilevelgwind only)
  <name>__fd    output ValuesDefined flag (int)
  <name>__ok    the bool the reference returned
Inputs are NOT stored — they are regenerated deterministically from the
case spec on the test side.
"""

from __future__ import annotations

import ctypes
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..",
                                "tests"))
from conformance_cases import (CASES, LARGE_CASES, UNDEF,  # noqa: E402
                               case_inputs)

ORACLE = os.environ.get("ORACLE_SO", "/tmp/ref_build/liboracle.so")

cf = ctypes.c_float
ci = ctypes.c_int


def ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def run_case(lib, case):
    ins = case_inputs(case)
    s = dict(case.scalars)
    fd = ctypes.c_int(case.fdef_in)
    NY, NX = case.shape
    out = np.full((NY, NX), np.nan, np.float32)
    out2 = None
    op = case.op
    nxny = (ci(NX), ci(NY))
    tail = (ptr(out), ctypes.byref(fd), cf(UNDEF))
    fn = getattr(lib, "o_" + op)

    if op == "pleveltemp":
        ok = fn(*nxny, ptr(ins[0]), cf(s["p"]), s["unit"].encode(),
                ci(s["compute"]), *tail)
    elif op == "plevelthe":
        ok = fn(*nxny, ptr(ins[0]), ptr(ins[1]), cf(s["p"]),
                ci(s["compute"]), *tail)
    elif op == "plevelhum":
        ok = fn(*nxny, ptr(ins[0]), ptr(ins[1]), cf(s["p"]),
                s["unit"].encode(), ci(s["compute"]), *tail)
    elif op == "pleveldz2tmean":
        ok = fn(*nxny, ptr(ins[0]), ptr(ins[1]), cf(s["p1"]), cf(s["p2"]),
                ci(s["compute"]), *tail)
    elif op == "plevelducting":
        ok = fn(*nxny, ptr(ins[0]), ptr(ins[1]), cf(s["p"]),
                ci(s["compute"]), *tail)
    elif op == "hleveltemp":
        ok = fn(*nxny, ptr(ins[0]), ptr(ins[1]), cf(s["alevel"]),
                cf(s["blevel"]), s["unit"].encode(), ci(s["compute"]), *tail)
    elif op == "hlevelthe":
        ok = fn(*nxny, ptr(ins[0]), ptr(ins[1]), ptr(ins[2]),
                cf(s["alevel"]), cf(s["blevel"]), ci(s["compute"]), *tail)
    elif op == "hlevelhum":
        ok = fn(*nxny, ptr(ins[0]), ptr(ins[1]), ptr(ins[2]),
                cf(s["alevel"]), cf(s["blevel"]), s["unit"].encode(),
                ci(s["compute"]), *tail)
    elif op == "hlevelducting":
        ok = fn(*nxny, ptr(ins[0]), ptr(ins[1]), ptr(ins[2]),
                cf(s["alevel"]), cf(s["blevel"]), ci(s["compute"]), *tail)
    elif op == "hlevelpressure":
        ok = fn(*nxny, ptr(ins[0]), cf(s["alevel"]), cf(s["blevel"]), *tail)
    elif op == "aleveltemp":
        ok = fn(*nxny, ptr(ins[0]), ptr(ins[1]), s["unit"].encode(),
                ci(s["compute"]), *tail)
    elif op == "alevelthe":
        ok = fn(*nxny, ptr(ins[0]), ptr(ins[1]), ptr(ins[2]),
                ci(s["compute"]), *tail)
    elif op == "alevelhum":
        ok = fn(*nxny, ptr(ins[0]), ptr(ins[1]), ptr(ins[2]),
                s["unit"].encode(), ci(s["compute"]), *tail)
    elif op == "alevelducting":
        ok = fn(*nxny, ptr(ins[0]), ptr(ins[1]), ptr(ins[2]),
                ci(s["compute"]), *tail)
    elif op == "ilevelgwind":
        out2 = np.full(case.shape, np.nan, np.float32)
        ok = fn(*nxny, ptr(ins[0]), ptr(ins[1]), ptr(ins[2]), ptr(ins[3]),
                ptr(out), ptr(out2), ctypes.byref(fd), cf(UNDEF))
    elif op == "seaSoundSpeed":
        ok = fn(*nxny, ptr(ins[0]), ptr(ins[1]), cf(s["z"]),
                ci(s["compute"]), *tail)
    elif op == "kIndex":
        ok = fn(*nxny, *map(ptr, ins), cf(s["p500"]), cf(s["p700"]),
                cf(s["p850"]), ci(s["compute"]), *tail)
    elif op == "ductingIndex":
        ok = fn(*nxny, *map(ptr, ins), cf(s["p850"]), ci(s["compute"]),
                *tail)
    elif op == "showalterIndex":
        ok = fn(*nxny, *map(ptr, ins), cf(s["p500"]), cf(s["p850"]),
                ci(s["compute"]), *tail)
    elif op == "boydenIndex":
        ok = fn(*nxny, *map(ptr, ins), cf(s["p700"]), cf(s["p1000"]),
                ci(s["compute"]), *tail)
    elif op == "sweatIndex":
        ok = fn(*nxny, *map(ptr, ins), *tail)
    elif op == "cvtemp":
        ok = fn(*nxny, ptr(ins[0]), ci(s["compute"]), *tail)
    elif op == "cvhum":
        ok = fn(*nxny, ptr(ins[0]), ptr(ins[1]), s["unit"].encode(),
                ci(s["compute"]), *tail)
    elif op in ("abshum", "vectorabs", "jacobian", "relvort", "divergence"):
        ok = fn(*nxny, *map(ptr, ins), *tail)
    elif op == "windCooling":
        ok = fn(*nxny, *map(ptr, ins), ci(s["compute"]), *tail)
    elif op == "underCooledRain":
        ok = fn(*nxny, *map(ptr, ins), cf(s["precipMin"]),
                cf(s["snowRateMax"]), cf(s["tcMax"]), *tail)
    elif op in ("pressure2FlightLevel", "snow_in_cm",
                "thermalFrontParameter", "absvort", "plevelgwind_xcomp",
                "plevelgwind_ycomp", "plevelgvort"):
        ok = fn(*nxny, *map(ptr, ins), *tail)
    elif op == "values2classes":
        vals = np.asarray(s["values"], np.float32)
        ok = fn(*nxny, ptr(ins[0]), ptr(out), ptr(vals), ci(len(vals)),
                ctypes.byref(fd), cf(UNDEF))
    elif op == "fieldOPERfield":
        ok = fn(ci(s["compute"]), *nxny, ptr(ins[0]), ptr(ins[1]), *tail)
    elif op == "fieldOPERconstant":
        ok = fn(ci(s["compute"]), *nxny, ptr(ins[0]), cf(s["value"]), *tail)
    elif op == "constantOPERfield":
        ok = fn(ci(s["compute"]), *nxny, cf(s["value"]), ptr(ins[0]), *tail)
    elif op in ("absvalueField", "log10Field", "pow10Field", "logField",
                "expField", "copy_field"):
        ok = fn(*nxny, ptr(ins[0]), *tail)
    elif op in ("powerField", "replaceUndefined", "replaceDefined",
                "minvalueFieldConst", "maxvalueFieldConst"):
        ok = fn(*nxny, ptr(ins[0]), cf(s["value"]), *tail)
    elif op in ("minvalueFields", "maxvalueFields"):
        ok = fn(*nxny, ptr(ins[0]), ptr(ins[1]), *tail)
    elif op == "plevelqvector":
        ok = fn(*nxny, *map(ptr, ins), cf(s["p"]), ci(s["compute"]), *tail)
    elif op == "advection":
        ok = fn(*nxny, *map(ptr, ins), cf(s["hours"]), *tail)
    elif op == "gradient":
        ok = fn(*nxny, *map(ptr, ins), ci(s["compute"]), *tail)
    elif op == "shapiro2_filter":
        work = ins[0].copy()  # reference may use the input as workspace
        ok = fn(*nxny, ptr(work), *tail)
    elif op in ("momentumXcoordinate", "momentumYcoordinate"):
        ok = fn(*nxny, *map(ptr, ins), cf(s["fcoriolisMin"]), *tail)
    elif op == "sumFields":
        ok = fn(*nxny, ptr(ins[0]), ci(case.n_members), *tail)
    elif op in ("meanValue", "stddevValue"):
        fdin = np.full(case.n_members, 2, np.int32)
        ok = fn(*nxny, ptr(ins[0]), iptr(fdin), ci(case.n_members), *tail)
    elif op == "extremeValue":
        ok = fn(ci(s["compute"]), *nxny, ptr(ins[0]), ci(case.n_members),
                *tail)
    elif op == "probability":
        fdin = np.full(case.n_members, 2, np.int32)
        lim = np.asarray(s["limits"], np.float32)
        ok = fn(ci(s["compute"]), *nxny, ptr(ins[0]), iptr(fdin),
                ci(case.n_members), ptr(lim), ci(len(lim)), *tail)
    elif op in ("neighbourProbFunctions", "neighbourFunctions"):
        cst = np.asarray(s["constants"], np.float32)
        ok = fn(*nxny, ptr(ins[0]), ptr(cst), ci(len(cst)),
                ci(s["compute"]), *tail)
    elif op in ("vesselIcingOverland", "vesselIcingMertins"):
        ok = fn(*nxny, *map(ptr, ins), *tail)
    elif op == "vesselIcingModStall":
        ok = fn(*nxny, *map(ptr, ins), cf(s["vs"]), cf(s["alpha"]),
                cf(s["zmin"]), cf(s["zmax"]), *tail)
    elif op == "vesselIcingMincog":
        ok = fn(*nxny, *map(ptr, ins), cf(s["vs"]), cf(s["alpha"]),
                cf(s["zmin"]), cf(s["zmax"]), ci(s["alt"]), *tail)
    else:
        raise KeyError(f"no oracle adapter for {op}")
    return out, out2, fd.value, bool(ok)


def main():
    lib = ctypes.CDLL(ORACLE)
    args = [a for a in sys.argv[1:] if a != "--large"]
    large = "--large" in sys.argv[1:]
    cases = LARGE_CASES if large else CASES
    out_path = args[0] if args else os.path.join(
        os.path.dirname(__file__), "..", "..", "tests", "goldens",
        "goldens_large.npz" if large else "goldens.npz")
    data = {}
    for case in cases:
        out, out2, fd, ok = run_case(lib, case)
        if not ok:
            raise RuntimeError(f"oracle returned false for {case.name}")
        data[case.name + "__out"] = out
        if out2 is not None:
            data[case.name + "__out2"] = out2
        data[case.name + "__fd"] = np.int32(fd)
        print(f"{case.name}: fd={fd}", flush=True)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    np.savez_compressed(out_path, **data)
    print(f"wrote {len(cases)} cases -> {out_path}")


if __name__ == "__main__":
    main()
