"""Perf lab: ModStall height sweep — (fp unroll, warmup) quantization.

With KERNEL_SOLVER_UNROLL fp=16, the while cond fires every 16 steps,
so any warmup <= 16 quantizes to >= 16 iterations per height (which is
why warm_fp 4/8/16 measured identical).  This lab sweeps the fp unroll
together with MF_WARM_FP to find the real minimum.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python tools/perf_lab_modstall_quant.py
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

#: (fp_unroll, warm_fp) combos; the SHIPPED defaults are (8, 8) —
#: KERNEL_SOLVER_UNROLL_MS fp=8 + KERNEL_WARM_FP=8, measured 8.0 ms;
#: (16, 16) is the pre-quantization configuration (11.6 ms) and
#: (16, 0) the exact 32-warmup baseline (19.8 ms)
COMBOS = ((16, 16), (8, 8), (8, 16), (4, 8), (16, 0))


def main():
    ref_vals = {}
    for label, args in (("friendly", jax.device_put(make_inputs())),
                        ("adversarial",
                         jax.device_put(_adversarial_inputs()))):
        ref = jax.jit(
            lambda *a: icing.vessel_icing_modstall(*a, *SCAL))(*args)
        ref_vals[label] = (np.asarray(ref.mask), np.asarray(ref.values))

        for fp_u, warm in COMBOS:
            os.environ["MF_SOLVER_UNROLL"] = f"{fp_u},10,4"
            os.environ["MF_WARM_FP"] = str(warm)
            _reload_icing()
            from mi_fieldcalc_tpu.ops.icing_fused import \
                vessel_icing_modstall_fused as fused
            fn = jax.jit(lambda *a, _f=fused: _f(*a, *SCAL, ty=8))
            got = fn(*args)
            mr, vr = ref_vals[label]
            ok = (mr == np.asarray(got.mask)).all()
            d = np.abs(vr - np.asarray(got.values))[mr]
            dt = qtime(lambda: fn(*args))
            print(f"[{label}] fp_u={fp_u} warm={warm}: {dt*1e3:.2f} ms  "
                  f"masks_equal={ok} max|d|={d.max():.3e} "
                  f"frac>2e-3={(d > 2e-3).mean():.2e}")
    os.environ.pop("MF_SOLVER_UNROLL", None)
    os.environ.pop("MF_WARM_FP", None)


if __name__ == "__main__":
    main()
