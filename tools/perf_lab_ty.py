"""Perf lab: fused-kernel row-tile (TY) sweep, one process, back-to-back.

The shared chip's bandwidth drifts run to run, so every variant is timed
in THIS process against the same x+1 calibration (CLAUDE.md methodology:
queue-drain timing, never block_until_ready).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_lab_ty.py
"""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from __graft_entry__ import _example_inputs
from mi_fieldcalc_tpu.ops.fused import derived_fields_fused

NLEV, NY, NX = 32, 719, 929


def qtime(fn, probe, iters=30, reps=2):
    best = float("inf")
    for _ in range(reps):
        out = fn()
        probe(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        probe(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    args = jax.device_put(_example_inputs(NLEV, NY, NX))
    xcal = args[0].values
    add1 = jax.jit(lambda x: x + 1.0)
    cal = qtime(lambda: add1(xcal), lambda o: float(o[0, 0, 0]))
    bw = 2 * 4 * NLEV * NY * NX / cal / 1e9
    print(f"x+1 calibration: {cal*1e3:.3f} ms  ({bw:.0f} GB/s)")

    for ty in (32, 48, 64, 80, 96):
        try:
            fn = lambda: derived_fields_fused(*args, ty=ty)
            dt = qtime(fn, lambda o: float(o.tfp.values[0, 0, 0]))
            print(f"TY={ty:3d}: {dt*1e3:.3f} ms "
                  f"({NLEV*NY*NX/dt/1e9:.2f} Gpts/s)")
        except Exception as e:  # VMEM blowups etc.
            print(f"TY={ty:3d}: FAILED {type(e).__name__}: {str(e)[:120]}")

    # re-calibrate at the end to observe drift
    cal2 = qtime(lambda: add1(xcal), lambda o: float(o[0, 0, 0]))
    print(f"x+1 recheck: {cal2*1e3:.3f} ms "
          f"({2*4*NLEV*NY*NX/cal2/1e9:.0f} GB/s)")


if __name__ == "__main__":
    main()
