"""Debug: trace ModStall divergence at the precision-lab worst point.

Compares, at the single worst grid point:
  * the oracle (compiled reference, f64 intermediates),
  * a pure-python f64 replica of the reference per-height loop,
  * a pure-python f32 replica (same trajectories, f32 arithmetic),
  * our jnp path per-height intermediates.
"""
import ctypes
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.precision_lab import adversarial_inputs, oracle_lib, o_call, UNDEF  # noqa: E402

ny, nx = 96, 128
g = adversarial_inputs(ny, nx, 5)
lib = oracle_lib()

i11 = [g["sal"], g["wave"], g["xw"], g["yw"], g["at"], g["rh"],
       g["sst"], g["p"], g["pw"], g["aice"], g["depth"]]
vsz = (5.0, 90.0, 2.0, 4.0)
ref = o_call(lib, "vesselIcingModStall", ny, nx, i11, scalars=vsz)

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
import mi_fieldcalc_tpu.api as fc  # noqa: E402

ours = np.asarray(fc.vesselIcingModStall(*i11, *vsz))

d = np.abs(ours.astype(np.float64) - ref.astype(np.float64))
d[(ours == UNDEF) | (ref == UNDEF)] = 0
order = np.argsort(d.ravel())[::-1]
print("worst 10 points:")
for k in order[:10]:
    iy, ix = divmod(int(k), nx)
    print(f"  ({iy},{ix}) ref={ref[iy, ix]:.6g} ours={ours[iy, ix]:.6g} "
          f"d={d[iy, ix]:.6g} at={g['at'][iy, ix]:.3f} sst={g['sst'][iy, ix]:.3f} "
          f"wave={g['wave'][iy, ix]:.3f} pw={g['pw'][iy, ix]:.3f} "
          f"sal={g['sal'][iy, ix]:.3f} rh={g['rh'][iy, ix]:.3f}")

iy, ix = divmod(int(order[0]), nx)
P = {k: float(v[iy, ix]) for k, v in g.items()}
vs, alpha, zmin, zmax = vsz
number = int((zmax - zmin) * 2 + 1)


def replica(dtype, trace=False):
    """Reference ModStall for one point; dtype = np.float64 or np.float32."""
    f = dtype
    sal, wave, xw, yw, at, rh, sst, p, pw, depth = (
        f(P["sal"]), f(P["wave"]), f(P["xw"]), f(P["yw"]), f(P["at"]),
        f(P["rh"]), f(P["sst"]), f(P["p"]), f(P["pw"]), f(P["depth"]))

    def f1(t):
        return f(0.6112) * np.exp(f(17.67) * t / (t + f(243.5)))

    c = f(9.81 / (2 * math.pi)) * pw
    if depth <= c * pw and c != 0:
        c, err, j = f(1.0), f(1.0), 0
        while err > 1e-5:
            c_new = f(9.81) * pw / f(2 * math.pi) * np.tanh(
                f(2 * math.pi) * depth / (pw * c))
            err = abs(c_new - c)
            c = c_new
            j += 1
            if j > 10000:
                c = f(0.0)
                break
        if trace:
            print(f"  [{dtype.__name__}] wave fp: j={j} c={c:.8g}")
    vr = c - f(vs) * f(math.cos(alpha))
    v = np.hypot(xw, yw).astype(f) if dtype is np.float32 else np.hypot(xw, yw)
    tf = (f(-0.002) - f(0.0524) * sal) - f(6.0e-5) * (sal * sal)
    ha = f(5.17) * np.power(v, f(0.8))
    ratio = f(89.5 / 5.17)
    tau = f(11.25) - v / f(4.0)
    k1 = sst
    if tau > 0:
        K = f(311000.0) / ((p / f(10.0)) * f(1005.0))
        M = f(0.2) * at + K * rh * f1(at)
        h = tau / f(50.0)
        y = sst
        for _ in range(50):
            k1 = (M - f(0.2) * y) - K * f1(y)
            y2 = y + f(0.5) * h * k1
            k2 = (M - f(0.2) * y2) - K * f1(y2)
            y3 = y + f(0.5) * h * k2
            y2 = (M - f(0.2) * y3) - K * f1(y3)
            y4 = y + h * y2
            y = y + h * (f(1.0 / 6.0) * (((k1 + f(2.0) * k2) + f(2.0) * y2)
                                         + ((M - f(0.2) * y4) - K * f1(y4))))
            k1 = y
    ice = f(0.0)
    for counter in range(number):
        rw = f(6.46e-5) * wave * (vr * vr) * f(
            np.exp(f(-0.55) * f(zmin + 0.5 * counter))) * v
        N, err, j = f(0.0), f(1.0), 0
        while err >= 1e-5 and 0 <= N <= 1:
            Ts = (f(1.0) + N) * tf
            ri = (f(0.012012012) * rw * (Ts - k1)
                  + (ha / f(333000.0))
                  * ((Ts - at) + ratio * (f1(Ts) - rh * f1(at))))
            N1 = ri / rw
            err = abs(N1 - N)
            N = N1
            j += 1
            if j > 1000:
                N = f(0.0)
                break
        if trace:
            print(f"  [{dtype.__name__}] h{counter}: rw={rw:.6g} j={j} "
                  f"N_exit={N:.8g}")
        N = f(0.0) if N < 0 else (f(1.0) if N > 1 else N)
        ice = ice + N * (rw / f(890.0)) * f(3600.0) * f(100.0)
    return abs(ice / f(number))


print(f"\npoint ({iy},{ix}): oracle={ref[iy, ix]:.8g} ours={ours[iy, ix]:.8g}")
r64 = replica(np.float64, trace=True)
print(f"replica f64 = {r64:.8g}")
r32 = replica(np.float32, trace=True)
print(f"replica f32 = {r32:.8g}")
