"""Perf lab: vertical-interp kernel variants, same-process A/B on the chip.

The one-pass column kernel is genuinely VPU-bound (PERF.md): intrinsic
traffic ~0.46 GB (~1.5 ms) vs 8.0 ms measured, and every byte lever is
exhausted.  Remaining levers are vector-op count per fori iteration.
Variants:

* inplace  — interpolate at the bracket iteration (round-1 kernel):
             per (level, target): sel(3) + w(2) + nvar*(FMA+select) and
             nvar mask selects.
* carrysel — select only bracket quantities (f0, f1, x0, 1/denom, one
             packed int32 mask plane) in the loop; interpolate after.

Usage: python tools/perf_lab_vinterp.py [--iters 30] [--nlev 32]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--nlev", type=int, default=32)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from mi_fieldcalc_tpu.field import Field
    from mi_fieldcalc_tpu.models.pipeline import STANDARD_PLEVELS
    from mi_fieldcalc_tpu.ops.vertical_fused import hlevel_to_plevel_fused

    nlev, ny, nx = args.nlev, 719, 929
    rng = np.random.default_rng(7)
    sigma = (np.arange(1, nlev + 1) / nlev).astype(np.float32)
    alevel = (1013.0 * 0.3 * (1 - sigma)).astype(np.float32)
    blevel = (sigma ** 1.5).astype(np.float32)

    def mkfield(lo, hi, undef_frac=0.02):
        v = rng.uniform(lo, hi, (nlev, ny, nx)).astype(np.float32)
        m = rng.random((nlev, ny, nx)) > undef_frac
        return Field(jnp.asarray(v), jnp.asarray(m))

    fields = (mkfield(200, 310), mkfield(0, 0.02),
              mkfield(-40, 40), mkfield(-40, 40))
    psv = rng.uniform(950, 1040, (ny, nx)).astype(np.float32)
    ps = Field(jnp.asarray(psv), jnp.asarray(rng.random((ny, nx)) > 0.02))
    fields = jax.device_put(fields)
    ps = jax.device_put(ps)
    targets = STANDARD_PLEVELS

    def run(variant):
        return hlevel_to_plevel_fused(fields, ps, alevel, blevel, targets,
                                      variant=variant)

    def qtime(fn, iters):
        out = fn()
        float(out[0].values[0, 0, 0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        float(out[0].values[0, 0, 0])
        return (time.perf_counter() - t0) / iters

    variants = ("inplace", "carrysel", "packed")
    a = run("inplace")
    for var_name in variants[1:]:
        b = run(var_name)
        for v, (fa, fb) in enumerate(zip(a, b)):
            ma, mb = np.asarray(fa.mask), np.asarray(fb.mask)
            assert np.array_equal(ma, mb), f"{var_name} var {v}: mask mismatch"
            va, vb = np.asarray(fa.values)[ma], np.asarray(fb.values)[ma]
            bit = np.array_equal(va, vb)
            assert np.allclose(va, vb, rtol=2e-5, atol=1e-6)
            print(f"{var_name} var {v}: masks equal, bit={bit}")

    for _ in range(3):
        ts = [qtime(lambda vn=vn: run(vn), args.iters) for vn in variants]
        print("  ".join(f"{vn} {t * 1e3:.2f} ms"
                        for vn, t in zip(variants, ts)))


if __name__ == "__main__":
    main()
