"""Perf lab: fused-kernel row-tile (TY) sweep on the canonical padded layout.

Motivation: the original TY sweep (perf_lab_ty.py) ran on the ragged
719x929 grid and picked TY=48.  On the padded (720, 1024) layout the f32
sublane tile is 8 rows but the *int8 mask* tile is 32 rows — TY=48 leaves
every int8 mask block tile-ragged (1.5 tiles), the exact DMA class the
padded layout exists to avoid.  TY in {32, 64, 96} aligns both dtypes.

Same-process, back-to-back, queue-drain timing (CLAUDE.md methodology).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_lab_ty_padded.py
"""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from __graft_entry__ import _example_inputs  # noqa: E402
from mi_fieldcalc_tpu import pad_array, pad_field  # noqa: E402
from mi_fieldcalc_tpu.field import Field  # noqa: E402
from mi_fieldcalc_tpu.ops.fused import derived_fields_fused  # noqa: E402

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
    raw = _example_inputs(NLEV, NY, NX)
    args = jax.device_put(tuple(
        pad_field(a) if isinstance(a, Field) else
        (pad_array(a) if a.ndim == 2 else a)
        for a in raw))
    xcal = args[0].values
    add1 = jax.jit(lambda x: x + 1.0)
    cal = qtime(lambda: add1(xcal), lambda o: float(o[0, 0, 0]))
    npts = xcal.size
    print(f"x+1 calibration: {cal*1e3:.3f} ms  "
          f"({2*4*npts/cal/1e9:.0f} GB/s)")

    for stacked in (True, False):
        for ty in (16, 24, 32, 40, 48, 64, 80, 96):
            try:
                fn = lambda: derived_fields_fused(
                    *args, global_shape=(NY, NX), stacked=stacked, ty=ty)
                if stacked:
                    probe = lambda o: float(o.values[0, 0, 0, 0])
                else:
                    probe = lambda o: float(o.tfp.values[0, 0, 0])
                dt = qtime(fn, probe)
                print(f"stacked={int(stacked)} TY={ty:3d}: {dt*1e3:.3f} ms "
                      f"({NLEV*NY*NX/dt/1e9:.2f} Gpts/s logical)")
            except Exception as e:
                print(f"stacked={int(stacked)} TY={ty:3d}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}")

    cal2 = qtime(lambda: add1(xcal), lambda o: float(o[0, 0, 0]))
    print(f"x+1 recheck: {cal2*1e3:.3f} ms "
          f"({2*4*npts/cal2/1e9:.0f} GB/s)")


if __name__ == "__main__":
    main()
