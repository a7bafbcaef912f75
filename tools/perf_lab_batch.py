"""Call-storm A/B: eager drop-in calls vs batch() on the real TPU.

BASELINE config 1's workload class: many small-grid (96x128) operator
calls per forecast cycle (the Diana caller pattern).  Eager drop-in
calls pay this backend's per-program dispatch each (~0.9-4 ms);
batch() runs the whole storm as one program.

Usage: python tools/perf_lab_batch.py [--rounds 5]
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

NY, NX = 96, 128


def storm(fc, g):
    """A ~22-call mixed storm; returns the list of results."""
    t5, t7, t8, rh7, rh8, q8, z7, z10, u8, v8, u5, v5, td8, td5 = g
    r = []
    r.append(fc.kIndex(t5, t7, rh7, t8, rh8, 500., 700., 850., 1))
    r.append(fc.ductingIndex(t8, rh8, 850., 1))
    r.append(fc.showalterIndex(t5, t8, rh8, 500., 850., 1))
    r.append(fc.boydenIndex(t7, z7, z10, 700., 1000., 1))
    r.append(fc.sweatIndex(t8, t5, td8, td5, u8, v8, u5, v5))
    c8 = fc.cvtemp(t8, 2)
    r.append(c8)
    r.append(fc.abshum(t8, rh8, fc.UNDEF))
    r.append(fc.windCooling(c8, u8, v8, 2))
    for c in (1, 3, 5):
        r.append(fc.plevelhum(t8, rh8 if c in (3, 5) else q8, 850., "", c))
    for c in (1, 3, 4):
        r.append(fc.pleveltemp(t8, 850., "", c))
    r.append(fc.vectorabs(u8, v8))
    r.append(fc.underCooledRain(q8, q8, t8, 1e-5, 1e-3, 275.0))
    for const in (0.5, 2.0):
        r.append(fc.fieldOPERconstant(2, t8, const))
    r.append(fc.sumFields([t5, t7, t8]))
    r.append(fc.minvalueFields(t5, t8))
    r.append(fc.maxvalueFields(t5, t8))
    r.append(fc.absvalueField(u8))
    return r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    a = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import mi_fieldcalc_tpu.api as fc

    rng = np.random.default_rng(7)

    def u(lo, hi):
        x = rng.uniform(lo, hi, (NY, NX)).astype(np.float32)
        x[0, 0] = fc.UNDEF
        return x

    g = (u(240, 260), u(250, 275), u(260, 290), u(5, 95), u(5, 95),
         u(1e-4, 8e-3), u(2800, 3200), u(0, 300), u(-20, 20), u(-20, 20),
         u(-40, 40), u(-40, 40), u(255, 285), u(230, 255))

    n = len(storm(fc, g))            # eager warm-up (compiles each op)
    with fc.batch():
        storm(fc, g)                 # batched warm-up (compiles the storm)

    for r in range(a.rounds):
        t0 = time.perf_counter()
        out_e = storm(fc, g)
        te = time.perf_counter() - t0
        t0 = time.perf_counter()
        with fc.batch():
            out_b = storm(fc, g)
        out_b = [np.asarray(x) if not isinstance(x, tuple) else x
                 for x in out_b]
        tb = time.perf_counter() - t0
        print(f"round {r}: eager {te*1e3:.1f} ms  batch {tb*1e3:.1f} ms  "
              f"({te/tb:.1f}x, {n} calls)")
    worst = 0.0
    for i, (e, b) in enumerate(zip(out_e, out_b)):
        ev, bv = np.asarray(e), np.asarray(b)
        und = ev == np.float32(fc.UNDEF)
        assert np.array_equal(und, bv == np.float32(fc.UNDEF)), i
        d = np.abs(ev[~und] - bv[~und])
        rel = float((d / np.maximum(np.abs(ev[~und]), 1e-6)).max()) \
            if d.size else 0.0
        # one fused program reassociates f32 differently than 22
        # separate programs — last-ulp territory only
        assert rel < 2e-5, (i, rel)
        worst = max(worst, rel)
    print(f"results equal (sentinels exact, max value rel dev {worst:.2e})")


if __name__ == "__main__":
    main()
