"""Perf lab 2: component attribution for vesselIcingMincog.

Times the wave fixed point, the RK-50 droplet loop, and the 39-height
Newton sweep in isolation to find where the ~11 ms goes.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_lab_mincog2.py
"""
import math
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from mi_fieldcalc_tpu.ops import icing  # noqa: E402
from tools.perf_lab_mincog import make_inputs, qtime  # noqa: E402

_f32 = jnp.float32


def main():
    args = jax.device_put(make_inputs())
    (sal, wave, xw, yw, at, rh, sst, p, pw, aice, depth) = args

    class R:
        values = None

    def wrap(x):
        r = R()
        r.values = x
        return r

    # --- wave fixed point alone
    pwv = pw.values
    c0 = _f32(9.81 / (2 * math.pi)) * pwv
    gate = jnp.ones_like(pwv, bool)
    shallow = (depth.values <= c0 * pwv) & (c0 != 0) & gate
    a = _f32(2 * math.pi) * depth.values / jnp.where(pwv != 0, pwv, _f32(1))
    print("shallow lanes:", float(jnp.mean(shallow)))

    fp = jax.jit(lambda c0, a, s: icing._wave_speed_fixed_point(
        c0, a, s, 1000, 1e-5))
    dt = qtime(lambda: wrap(fp(c0, a, shallow)), iters=10)
    print(f"wave fixed point: {dt*1e3:.2f} ms")

    # --- RK-50 alone (mincog variant)
    ea = _f32(10.0) * icing._icing_f1(at.values)
    K = _f32(0.2 * 0.622 * 2.5e6) / (p.values * _f32(1005.0))
    M = _f32(0.2) * at.values + K * rh.values * ea
    tau = jnp.full_like(pwv, 2.0)

    def rk(tau, M, K, y0):
        def f10mk(t):
            return (M - _f32(0.2) * t) - K * _f32(10.0) * icing._icing_f1(t)
        h = tau / _f32(50.0)
        h2 = h / _f32(2.0)

        def body(_, y):
            k1 = h2 * f10mk(y)
            k2 = h * f10mk(y + k1)
            k3 = h * f10mk(y + k2 / _f32(2.0))
            k4 = h2 * f10mk(y + k3)
            return y + (k1 + k2 + k3 + k4) / _f32(3.0)
        return jax.lax.fori_loop(0, 50, body, y0)

    rkj = jax.jit(rk)
    dt = qtime(lambda: wrap(rkj(tau, M, K, sst.values)), iters=10)
    print(f"RK-50: {dt*1e3:.2f} ms")

    # --- full op for reference
    fn = jax.jit(lambda *a: icing.vessel_icing_mincog(
        *a, 5.0, 0.52, 2.0, 11.0, 2))
    dt = qtime(lambda: fn(*args), iters=10)
    print(f"full mincog: {dt*1e3:.2f} ms")


if __name__ == "__main__":
    main()
