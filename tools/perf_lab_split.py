"""Perf lab: split fused kernel (elementwise + stencil) vs the monolith.

Same-process back-to-back methodology as perf_lab_ty.py (CLAUDE.md).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_lab_split.py
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
    print(f"x+1 calibration: {cal*1e3:.3f} ms "
          f"({2*4*NLEV*NY*NX/cal/1e9:.0f} GB/s)")

    probe = lambda o: float(o.tfp.values[0, 0, 0])
    dt = qtime(lambda: derived_fields_fused(*args), probe)
    print(f"monolith TY=48      : {dt*1e3:.3f} ms")

    for ty, ty_ew in ((48, 64), (48, 96), (48, 128), (48, 192),
                      (64, 96), (64, 128), (80, 128)):
        try:
            fn = lambda: derived_fields_fused(*args, split=True, ty=ty,
                                              ty_ew=ty_ew)
            dt = qtime(fn, probe)
            print(f"split TY={ty:3d} TYE={ty_ew:3d}: {dt*1e3:.3f} ms")
        except Exception as e:
            print(f"split TY={ty:3d} TYE={ty_ew:3d}: FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}")

    cal2 = qtime(lambda: add1(xcal), lambda o: float(o[0, 0, 0]))
    print(f"x+1 recheck: {cal2*1e3:.3f} ms "
          f"({2*4*NLEV*NY*NX/cal2/1e9:.0f} GB/s)")


if __name__ == "__main__":
    main()
