"""Perf lab: ModStall fused-kernel cost attribution via stage ablation.

MF_MODSTALL_ABLATE stubs out solver stages (fp = wave fixed point,
rk = droplet RK-50, heights = the 19-height freezing-fraction sweep) at
trace time; outputs are WRONG with any ablation active — this lab only
reads the step time.  Each config re-traces in the same process so the
comparisons are same-chip back-to-back (CLAUDE.md timing rules).

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python tools/perf_lab_modstall_ablate.py
"""
import os

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tools.perf_lab_mincog import make_inputs, qtime  # noqa: E402
from tools.perf_lab_mincog_fused import (_adversarial_inputs,  # noqa: E402
                                         _reload_icing)

SCAL = (5.0, 0.52, 2.0, 11.0)

CONFIGS = ("", "fp", "rk", "heights", "fp,rk", "fp,rk,heights")


def main():
    for label, args in (("friendly", jax.device_put(make_inputs())),
                        ("adversarial",
                         jax.device_put(_adversarial_inputs()))):
        for ab in CONFIGS:
            os.environ["MF_MODSTALL_ABLATE"] = ab
            # reload busts the inner jit cache so the trace-time env
            # is re-read (same trick as the mincog ablation lab)
            _reload_icing()
            from mi_fieldcalc_tpu.ops.icing_fused import \
                vessel_icing_modstall_fused as fused
            fn = jax.jit(lambda *a, _f=fused: _f(*a, *SCAL, ty=8))
            fn(*args)
            dt = qtime(lambda: fn(*args))
            print(f"[{label}] ablate='{ab}': {dt*1e3:.2f} ms")
        os.environ.pop("MF_MODSTALL_ABLATE", None)


if __name__ == "__main__":
    main()
