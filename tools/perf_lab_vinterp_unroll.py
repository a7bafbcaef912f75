"""Perf lab: unroll sweep for the vertical-interp kernel's level loop.

The packed kernel's binding cost is fori-loop CARRY traffic per
iteration (PERF.md): unrolling u bracket steps per iteration amortizes
one carry handoff over u levels with bit-identical arithmetic.  Padded
operational stack (4 vars, 32 hybrid levels -> 11 standard levels),
same-process queue-drain timing.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_lab_vinterp_unroll.py [--nlev 32]
"""
import argparse
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from mi_fieldcalc_tpu import pad_field  # noqa: E402
from mi_fieldcalc_tpu.field import Field  # noqa: E402
from mi_fieldcalc_tpu.models.pipeline import STANDARD_PLEVELS  # noqa: E402
from mi_fieldcalc_tpu.ops.vertical_fused import hlevel_to_plevel_fused  # noqa: E402


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
    ap = argparse.ArgumentParser()
    ap.add_argument("--nlev", type=int, default=32)
    args = ap.parse_args()
    nlev, ny, nx = args.nlev, 719, 929

    rng = np.random.default_rng(7)
    sigma = (np.arange(1, nlev + 1) / nlev).astype(np.float32)
    alevel = jnp.asarray(1013.0 * 0.3 * (1 - sigma), jnp.float32)
    blevel = jnp.asarray(sigma ** 1.5, jnp.float32)

    def mk(lo, hi):
        v = rng.uniform(lo, hi, (nlev, ny, nx)).astype(np.float32)
        m = rng.random((nlev, ny, nx)) > 0.02
        return pad_field(Field(jnp.asarray(v), jnp.asarray(m)))

    fields = jax.device_put((mk(220, 310), mk(1e-4, 1e-2),
                             mk(-40, 40), mk(-40, 40)))
    psv = rng.uniform(960, 1040, (ny, nx)).astype(np.float32)
    ps = jax.device_put(pad_field(
        Field(jnp.asarray(psv), jnp.ones((ny, nx), bool))))
    targets = tuple(STANDARD_PLEVELS)

    base = None
    for u in (1, 2, 4, 8):
        fn = lambda u=u: hlevel_to_plevel_fused(
            fields, ps, alevel, blevel, targets, unroll=u)
        out = fn()
        if base is None:
            base = [np.asarray(o.values) for o in out]
            note = "(reference)"
        else:
            d = max(np.abs(np.asarray(o.values) - b)[
                np.asarray(o.mask)].max(initial=0.0)
                for o, b in zip(out, base))
            note = f"max|d|={d:.1e}"
        dt = qtime(fn, lambda o: float(o[0].values[0, 0, 0]))
        print(f"unroll={u}: {dt*1e3:.2f} ms  {note}")


if __name__ == "__main__":
    main()
