"""Perf lab: where does vesselIcingMincog's time go, and what do warm
starts buy?

The height loop solves 39 near-identical root problems (only the spray
flux ``rw`` changes, by the height-decay factor exp(-0.275) per step),
each with an 8-iteration safeguarded Newton.  Candidates:

* fewer Newton iterations (the ts-space residual is near-linear);
* warm-starting each height's solve from the previous height's root.

Same-process, queue-drain timing (CLAUDE.md methodology).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_lab_mincog.py
"""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402

from mi_fieldcalc_tpu import from_sentinel  # noqa: E402
from mi_fieldcalc_tpu.ops import icing  # noqa: E402

NY, NX = 719, 929


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    f = lambda lo, hi: from_sentinel(
        rng.uniform(lo, hi, (NY, NX)).astype(np.float32))
    sal = f(0.0, 35.0)
    wave = f(0.1, 8.0)
    xw = f(-25.0, 25.0)
    yw = f(-25.0, 25.0)
    at = f(-25.0, 2.0)
    rh = f(0.3, 1.0)
    sst = f(-1.0, 8.0)
    p = f(960.0, 1040.0)
    pw = f(2.0, 12.0)
    aice = f(0.0, 0.3)
    depth = f(5.0, 500.0)
    return (sal, wave, xw, yw, at, rh, sst, p, pw, aice, depth)


def qtime(fn, iters=10, reps=2):
    best = float("inf")
    for _ in range(reps):
        out = fn()
        float(out.values[0, 0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        float(out.values[0, 0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    args = jax.device_put(make_inputs())
    run = jax.jit(lambda *a: icing.vessel_icing_mincog(
        *a, 5.0, 0.52, 2.0, 11.0, 2))

    orig = icing._rtsafe_lanes
    base = None
    try:
        for iters in (8, 6, 4, 3, 2):
            icing._rtsafe_lanes = (
                lambda fg, a, b, it=iters: orig(fg, a, b, it))
            fn = jax.jit(lambda *a: icing.vessel_icing_mincog(
                *a, 5.0, 0.52, 2.0, 11.0, 2))
            dt = qtime(lambda: fn(*args))
            out = fn(*args)
            if base is None:
                base = np.asarray(out.values)
                note = "(reference config)"
            else:
                cur = np.asarray(out.values)
                d = np.abs(cur - base)
                note = f"max|d| vs iters=8: {d.max():.2e}"
            print(f"newton iters={iters}: {dt*1e3:.2f} ms  {note}")
    finally:
        icing._rtsafe_lanes = orig


if __name__ == "__main__":
    main()
