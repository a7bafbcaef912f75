"""Forecast-cycle steady state: repeated storms with device-resident
input caching (batch(cache_inputs=True), round 4).

Production forecast cycles re-issue the same call storm with mostly
unchanged inputs (terrain, map factors, thresholds; only the forecast
fields move).  Round 3 measured the storm transfer-bound: 50-65 of the
63-70 ms cycle was H2D (one ~13 ms stacked transfer per shape group +
payload at the tunnel's per-transfer bandwidth), re-shipped EVERY
cycle.  With the identity-keyed device cache, a steady-state cycle
ships only the arrays whose objects changed.

Measured modes, all dispatch-probe-gated (tools/timing.py):
  eager        - 22 drop-in calls, one dispatch each (round-3 baseline)
  batch        - one program, all 14 inputs re-shipped (round-3 batch())
  cached       - one program, 2 fresh inputs shipped, 12 device-resident
  cached+pipe  - as cached, but cycle i+1's program is dispatched
                 BEFORE cycle i's outputs are fetched (the lazy-fetch
                 design makes this a statement reorder), overlapping
                 the output fetch with the next upload/compute

Each mode's outputs are fetched every cycle (np.asarray on all 22
results) and checked against the eager path per cycle.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
       python tools/perf_lab_batch_cycles.py [--rounds 5] [--cycles 6]
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, __file__.rsplit("/", 2)[0])

from tools.perf_lab_batch import storm, NY, NX  # noqa: E402


def fresh_pair(rng):
    """The two per-cycle forecast fields (t8, rh8) as NEW arrays —
    the cache must miss these and hit everything else."""
    t8 = rng.uniform(260, 290, (NY, NX)).astype(np.float32)
    rh8 = rng.uniform(5, 95, (NY, NX)).astype(np.float32)
    t8[0, 0] = 1.0e35
    return t8, rh8


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--cycles", type=int, default=6)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke run)")
    a = ap.parse_args()

    import jax
    if a.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import mi_fieldcalc_tpu.api as fc
    import mi_fieldcalc_tpu.batch as B
    from tools.timing import make_dispatch_probe

    rng = np.random.default_rng(7)

    def u(lo, hi):
        x = rng.uniform(lo, hi, (NY, NX)).astype(np.float32)
        x[0, 0] = fc.UNDEF
        return x

    base = [u(240, 260), u(250, 275), u(260, 290), u(5, 95), u(5, 95),
            u(1e-4, 8e-3), u(2800, 3200), u(0, 300), u(-20, 20),
            u(-20, 20), u(-40, 40), u(-40, 40), u(255, 285), u(230, 255)]

    def cycle_args(r):
        g = list(base)
        g[2], g[4] = fresh_pair(np.random.default_rng(100 + r))
        return tuple(g)

    def fetch(out):
        return [np.asarray(x) if not isinstance(x, tuple) else
                tuple(np.asarray(y) for y in x) for x in out]

    disp = make_dispatch_probe()
    n = len(storm(fc, cycle_args(0)))         # eager warm-up compiles

    # warm every batched signature (cold stack layout + steady layout)
    B.clear_input_cache()
    with fc.batch(cache_inputs=True):
        fetch(storm(fc, cycle_args(0)))
    with fc.batch(cache_inputs=True):
        fetch(storm(fc, cycle_args(1)))
    with fc.batch():
        fetch(storm(fc, cycle_args(1)))

    def run_eager(args):
        return fetch(storm(fc, args))

    def run_batch(args):
        with fc.batch():
            out = storm(fc, args)
        return fetch(out)

    def run_cached(args):
        with fc.batch(cache_inputs=True):
            out = storm(fc, args)
        return fetch(out)

    def run_bf16(args):
        # half-width fetch: the cycle is D2H-bound, so halving the
        # output bytes attacks the measured floor directly
        with fc.batch(cache_inputs=True, fetch_dtype="bfloat16"):
            out = storm(fc, args)
        return fetch(out)

    #: the subset a Diana-style display consumer actually reads per
    #: cycle (3 products of the 22-call storm)
    SUBSET = (0, 7, 15)

    def run_subset(args):
        # per-consumer grouped fetch (round 5): only the requested rows
        # cross the link — one gather+transfer per dtype — instead of
        # every same-shape sibling's plane
        with fc.batch(cache_inputs=True, fetch_dtype="bfloat16"):
            out = storm(fc, args)
        flat = [out[i][0] if isinstance(out[i], tuple) else out[i]
                for i in SUBSET]
        return fc.fetch(*flat)

    def mode_cached_pipe(cycles):
        """Dispatch cycle i+1 before fetching cycle i's outputs."""
        outs, fetched = [], []
        for args in cycles:
            with fc.batch(cache_inputs=True):
                out = storm(fc, args)
            outs.append(out)
            if len(outs) > 1:
                fetched.append(fetch(outs[-2]))
        fetched.append(fetch(outs[-1]))
        return fetched

    rows = []
    for r in range(a.rounds):
        cyc = [cycle_args(1000 * r + c) for c in range(a.cycles)]
        d0 = disp()
        t0 = time.perf_counter()
        ref = [run_eager(args) for args in cyc]
        te = (time.perf_counter() - t0) / a.cycles
        t0 = time.perf_counter()
        got_b = [run_batch(args) for args in cyc]
        tb = (time.perf_counter() - t0) / a.cycles

        def warm(run, r0):
            # fill the cache with warm-only cycles so BOTH program
            # layouts (cold ship-all, steady 2-fresh) are compiled
            # before the clock starts, and every timed cycle hits the
            # steady signature
            B.clear_input_cache()
            run(cycle_args(90000 + r0))
            run(cycle_args(90001 + r0))

        warm(run_cached, 0)
        t0 = time.perf_counter()
        got_c = [run_cached(args) for args in cyc]
        tc = (time.perf_counter() - t0) / a.cycles
        warm(run_cached, 2)
        t0 = time.perf_counter()
        got_p = mode_cached_pipe(cyc)
        tp = (time.perf_counter() - t0) / a.cycles
        warm(run_bf16, 4)
        t0 = time.perf_counter()
        got_h = [run_bf16(args) for args in cyc]
        th = (time.perf_counter() - t0) / a.cycles
        warm(run_subset, 6)
        t0 = time.perf_counter()
        got_s = [run_subset(args) for args in cyc]
        ts = (time.perf_counter() - t0) / a.cycles
        d1 = disp()
        dm = max(d0, d1)
        rows.append((dm, te, tb, tc, tp, th, ts))
        print(f"round {r}: disp {dm*1e3:5.2f} ms | eager {te*1e3:6.1f}  "
              f"batch {tb*1e3:5.1f}  cached {tc*1e3:5.1f}  "
              f"cached+pipe {tp*1e3:5.1f}  cached+bf16 {th*1e3:5.1f}  "
              f"subset3+bf16 {ts*1e3:5.1f} ms/cycle", flush=True)
        for ci, (es, bs) in enumerate(zip(ref, got_s)):
            for i, b in zip(SUBSET, bs):
                e = np.asarray(es[i][0] if isinstance(es[i], tuple)
                               else es[i])
                b = np.asarray(b)
                und = e == np.float32(fc.UNDEF)
                assert np.array_equal(und, b == np.float32(fc.UNDEF)), \
                    ("subset", ci, i)
                d = np.abs(e[~und] - b[~und])
                rel = (d / np.maximum(np.abs(e[~und]), 1e-2)).max() \
                    if d.size else 0.0
                assert rel < 1e-2, ("subset", ci, i, float(rel))
        for tag, got, rtol, floor in (("batch", got_b, 2e-5, 1e-6),
                                      ("cached", got_c, 2e-5, 1e-6),
                                      ("pipe", got_p, 2e-5, 1e-6),
                                      ("bf16", got_h, 1e-2, 1e-2)):
            for ci, (es, bs) in enumerate(zip(ref, got)):
                for i, (e, b) in enumerate(zip(es, bs)):
                    e, b = np.asarray(e), np.asarray(b)
                    und = e == np.float32(fc.UNDEF)
                    assert np.array_equal(und, b == np.float32(fc.UNDEF)), \
                        (tag, ci, i)
                    d = np.abs(e[~und] - b[~und])
                    rel = (d / np.maximum(np.abs(e[~und]), floor)).max() \
                        if d.size else 0.0
                    assert rel < rtol, (tag, ci, i, float(rel))

    from tools.timing import select_uncongested
    ok, dmin, _ = select_uncongested(rows)
    best = [min(r[k] for r in ok) for k in range(1, 7)]
    print(f"best uncongested ({len(ok)}/{len(rows)} rounds, "
          f"disp {dmin*1e3:.2f} ms): eager {best[0]*1e3:.1f}  "
          f"batch {best[1]*1e3:.1f}  cached {best[2]*1e3:.1f}  "
          f"cached+pipe {best[3]*1e3:.1f}  cached+bf16 {best[4]*1e3:.1f}  "
          f"subset3+bf16 {best[5]*1e3:.1f} "
          f"ms/cycle  ({n} calls, 2 of 14 inputs fresh per cycle; "
          f"subset = fc.fetch of {len(SUBSET)} of {n} outputs)")


if __name__ == "__main__":
    main()
