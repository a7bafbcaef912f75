"""Perf lab: warm-started ModStall height sweep (MF_WARM_FP sweep).

The 19-height freezing-fraction sweep is 16.3 of the fused kernel's
19.6 ms (tools/perf_lab_modstall_ablate.py).  Heights differ only by the
static decay factor, so height k's fixed point sits near height k-1's;
warm-starting from the previous exit iterate with the analytic
projection armed after MF_WARM_FP iterations (instead of 32) collapses
most per-height trips.  This lab sweeps the warmup and reports step time
and max |d| vs the exact jnp path (conformance tolerance for icing is
2e-3).

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python tools/perf_lab_modstall_warm.py
"""
import os

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402

from mi_fieldcalc_tpu.ops import icing  # noqa: E402
from tools.perf_lab_mincog import make_inputs, qtime  # noqa: E402
from tools.perf_lab_mincog_fused import (_adversarial_inputs,  # noqa: E402
                                         _reload_icing)

SCAL = (5.0, 0.52, 2.0, 11.0)


def main():
    for label, args in (("friendly", jax.device_put(make_inputs())),
                        ("adversarial",
                         jax.device_put(_adversarial_inputs()))):
        ref_fn = jax.jit(lambda *a: icing.vessel_icing_modstall(*a, *SCAL))
        ref = ref_fn(*args)
        mr = np.asarray(ref.mask)
        vr = np.asarray(ref.values)[mr]
        print(f"[{label}] jnp path: {qtime(lambda: ref_fn(*args))*1e3:.2f} ms")

        for warm in (0, 4, 8, 16):
            os.environ["MF_WARM_FP"] = str(warm)
            _reload_icing()
            from mi_fieldcalc_tpu.ops.icing_fused import \
                vessel_icing_modstall_fused as fused
            fn = jax.jit(lambda *a, _f=fused: _f(*a, *SCAL, ty=8))
            got = fn(*args)
            ok = (mr == np.asarray(got.mask)).all()
            d = np.abs(vr - np.asarray(got.values)[mr])
            frac = (d > 2e-3).mean()
            dt = qtime(lambda: fn(*args))
            print(f"[{label}] warm_fp={warm}: {dt*1e3:.2f} ms  "
                  f"masks_equal={ok} max|d|={d.max():.3e} "
                  f"frac>2e-3={frac:.2e}")
        os.environ.pop("MF_WARM_FP", None)


if __name__ == "__main__":
    main()
