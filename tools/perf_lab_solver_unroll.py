"""Perf lab: solver loop-unroll sweep for the fused icing kernels.

MF_SOLVER_UNROLL=fp,rk,newton (trace-time env) — steps per loop-carry
handoff in the wave fixed point, droplet RK, and Newton/freezing-fraction
loops.  Per-lane identical for any fp/rk and newton <= 4 (newton = 8
fully unrolls the solve and XLA's excess-precision fusion shifts ulps).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_lab_solver_unroll.py
"""
import importlib
import os

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402

from tools.perf_lab_mincog import make_inputs, qtime  # noqa: E402
from tools.perf_lab_mincog_fused import _adversarial_inputs  # noqa: E402

MC_SCAL = (5.0, 0.52, 2.0, 11.0, 2)
MS_SCAL = (5.0, 0.52, 2.0, 11.0)


def _reload(unroll):
    if unroll:
        os.environ["MF_SOLVER_UNROLL"] = unroll
    else:
        os.environ.pop("MF_SOLVER_UNROLL", None)
    import mi_fieldcalc_tpu.ops.icing as icing_mod
    import mi_fieldcalc_tpu.ops.icing_fused as fused_mod
    importlib.reload(icing_mod)
    importlib.reload(fused_mod)
    return fused_mod


def main():
    friendly = jax.device_put(make_inputs())
    advers = jax.device_put(_adversarial_inputs())
    base = {}
    for unroll in (None, "4,5,2", "8,5,4", "16,10,4", "4,10,4"):
        fused = _reload(unroll)
        mc = jax.jit(lambda *a: fused.vessel_icing_mincog_fused(
            *a, *MC_SCAL))
        ms = jax.jit(lambda *a: fused.vessel_icing_modstall_fused(
            *a, *MS_SCAL))
        row = []
        for tag, args in (("mc-fr", friendly), ("mc-ad", advers)):
            out = mc(*args)
            v = np.asarray(out.values)[np.asarray(out.mask)]
            base.setdefault(tag, v)
            d = np.abs(v - base[tag]).max()
            row.append(f"{tag} {qtime(lambda: mc(*args))*1e3:6.2f} ms"
                       f" d={d:.0e}")
        for tag, args in (("ms-fr", friendly), ("ms-ad", advers)):
            out = ms(*args)
            v = np.asarray(out.values)[np.asarray(out.mask)]
            base.setdefault(tag, v)
            d = np.abs(v - base[tag]).max()
            row.append(f"{tag} {qtime(lambda: ms(*args))*1e3:6.2f} ms"
                       f" d={d:.0e}")
        print(f"unroll={unroll or '1,1,1':8s} | " + " | ".join(row))


if __name__ == "__main__":
    main()
