"""Perf lab: fused Pallas MINCOG kernel vs the jnp whole-array path.

Same-process, queue-drain timing (CLAUDE.md methodology); also checks
value/mask agreement on the real chip.  With --ablate, times the fused
kernel with each solver stage stubbed out (MF_MINCOG_ABLATE) to
attribute the in-kernel cost.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_lab_mincog_fused.py [--ablate] [ty ...]
"""
import os
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402

from mi_fieldcalc_tpu.ops import icing  # noqa: E402
from mi_fieldcalc_tpu.ops.icing_fused import vessel_icing_mincog_fused  # noqa: E402
from tools.perf_lab_mincog import make_inputs, qtime  # noqa: E402


def _reload_icing():
    import importlib

    import mi_fieldcalc_tpu.ops.icing as icing_mod
    import mi_fieldcalc_tpu.ops.icing_fused as fused_mod
    importlib.reload(icing_mod)
    importlib.reload(fused_mod)
    return fused_mod.vessel_icing_mincog_fused


def _adversarial_inputs(seed=1):
    """Long periods + shallow depths: wave-fixed-point lanes near
    |slope| = 1 (cap/projection paths; the jnp path's worst case)."""
    import numpy as _np

    from mi_fieldcalc_tpu import from_sentinel
    from tools.perf_lab_mincog import NX, NY
    rng = _np.random.default_rng(seed)
    f = lambda lo, hi: from_sentinel(
        rng.uniform(lo, hi, (NY, NX)).astype(_np.float32))
    return (f(0.0, 35.0), f(0.1, 8.0), f(-25.0, 25.0), f(-25.0, 25.0),
            f(-25.0, 2.0), f(0.3, 1.0), f(-1.0, 8.0), f(960.0, 1040.0),
            f(6.0, 14.0), f(0.0, 0.3), f(2.0, 40.0))


def main():
    argv = sys.argv[1:]
    ablate_mode = "--ablate" in argv
    tys = [int(t) for t in argv if t != "--ablate"] or [8, 16]
    scal = (5.0, 0.52, 2.0, 11.0, 2)

    for label, args in (("friendly", jax.device_put(make_inputs())),
                        ("adversarial",
                         jax.device_put(_adversarial_inputs()))):
        ref_fn = jax.jit(lambda *a: icing.vessel_icing_mincog(*a, *scal))
        ref = ref_fn(*args)
        dt = qtime(lambda: ref_fn(*args))
        print(f"[{label}] jnp path: {dt*1e3:.2f} ms")

        mr = np.asarray(ref.mask)
        vr = np.asarray(ref.values)[mr]
        for ty in tys:
            for sh in (False, True):
                fn = jax.jit(lambda *a, ty=ty, sh=sh:
                             vessel_icing_mincog_fused(
                                 *a, *scal, ty=ty, stack_heights=sh))
                got = fn(*args)
                ok = (mr == np.asarray(got.mask)).all()
                d = np.abs(vr - np.asarray(got.values)[mr])
                dt = qtime(lambda: fn(*args))
                print(f"[{label}] fused ty={ty} stacked={int(sh)}: "
                      f"{dt*1e3:.2f} ms  masks_equal={ok} "
                      f"max|d|={d.max():.3e}")

    if ablate_mode:
        # stage ablations: stub one solver stage at a time (values WRONG;
        # timing attribution only).  Reload so the trace-time env is seen.
        for stages in ("fp", "rk", "newton", "fp,rk,newton"):
            os.environ["MF_MINCOG_ABLATE"] = stages
            fused = _reload_icing()
            fn = jax.jit(lambda *a: fused(*a, *scal, ty=8))
            fn(*args)
            dt = qtime(lambda: fn(*args))
            print(f"fused minus [{stages}]: {dt*1e3:.2f} ms")
        os.environ.pop("MF_MINCOG_ABLATE")


if __name__ == "__main__":
    main()
