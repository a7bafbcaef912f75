"""Perf lab: fused Pallas ModStall kernel vs the jnp whole-array path.

The jnp path's per-height freezing-fraction while_loop pays the slowest
unconverged lane at FULL grid cost per iteration; the kernel pays it per
tile.  Adversarial inputs (long periods, shallow depths) are the case
that measured 81 ms on the jnp path (534 ms before projection).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_lab_modstall_fused.py
"""
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402

from mi_fieldcalc_tpu.ops import icing  # noqa: E402
from mi_fieldcalc_tpu.ops.icing_fused import vessel_icing_modstall_fused  # noqa: E402
from tools.perf_lab_mincog import make_inputs, qtime  # noqa: E402
from tools.perf_lab_mincog_fused import _adversarial_inputs  # noqa: E402

SCAL = (5.0, 0.52, 2.0, 11.0)


def main():
    for label, args in (("friendly", jax.device_put(make_inputs())),
                        ("adversarial",
                         jax.device_put(_adversarial_inputs()))):
        ref_fn = jax.jit(lambda *a: icing.vessel_icing_modstall(*a, *SCAL))
        ref = ref_fn(*args)
        dt = qtime(lambda: ref_fn(*args))
        print(f"[{label}] jnp path: {dt*1e3:.2f} ms")

        mr = np.asarray(ref.mask)
        vr = np.asarray(ref.values)[mr]
        for ty, stack in ((8, False), (8, True)):
            fn = jax.jit(lambda *a, ty=ty, stack=stack:
                         vessel_icing_modstall_fused(
                             *a, *SCAL, ty=ty, stack_heights=stack))
            got = fn(*args)
            ok = (mr == np.asarray(got.mask)).all()
            d = np.abs(vr - np.asarray(got.values)[mr])
            dt = qtime(lambda: fn(*args))
            print(f"[{label}] fused ty={ty} stack={int(stack)}: "
                  f"{dt*1e3:.2f} ms  masks_equal={ok} "
                  f"max|d|={d.max():.3e}")


if __name__ == "__main__":
    main()
