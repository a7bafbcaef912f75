"""A/B for VERDICT r3 item 7: does a plevel-family SUITE KERNEL buy
anything over api.batch()'s one-jit XLA storm?

Workload: the plevel conversion family on a 10-level isobaric stack of
the operational 719x929 grid — pleveltemp modes (1, 3, 4) + plevelhum
modes (1, 3, 5) per level = 60 drop-in calls per forecast cycle
(FieldCalculations.cc:328-636 callers issue exactly this shape of
storm).

A) api.batch(cache_inputs=True): the 60 calls trace into ONE XLA
   program (inputs device-resident after the first cycle; outputs
   fetched as one stacked transfer).
B) alevel_suite_fused: the existing hand-fused Pallas suite kernel —
   plevel with per-level constant pressure IS alevel with a
   constant-per-level pressure field, so the candidate kernel already
   exists and the A/B needs no new code.  Same modes, same stack,
   inputs device-resident.

Timing is FETCH-FREE queue-drain: enqueue the program(s), then drain
through a tiny independent program's scalar (device programs execute
in order).  Both sides' boundary costs are identical either way (this
tunnel's D2H saturates at ~125 MB/s and would drown the device-time
difference the decision needs — PERF.md "Forecast cycles").  A full
fetch + value cross-check runs once, untimed.  Decision rule
(VERDICT): build a dedicated plevel suite kernel only if B/A > 1.3x.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
       python tools/perf_lab_plevel_suite.py [--rounds 5]
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, __file__.rsplit("/", 2)[0])

NLEV, NY, NX = 10, 719, 929
PLEVELS = np.linspace(1000.0, 100.0, NLEV).astype(np.float32)
# pleveltemp and aleveltemp share compute numbering (levels.py:84-145);
# plevelhum and alevelhum differ: plevel 5 (RH->Td C) == alevel 7
# (levels.py:195-232).  Storm modes below; the suite's matching request
# is temps=TEMPS, hums_q=(1,), hums_rh=(3, 7).
TEMPS = (1, 3, 4)          # TH->T(C), T->theta, T->theta_e,sat
P_HUMS_Q = (1,)            # (T, q) -> RH%
P_HUMS_RH = (3, 5)         # (T, RH%) -> q; (T, RH%) -> Td(C)
A_HUMS_RH = (3, 7)         # the same two computations, alevel numbering


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke run)")
    a = ap.parse_args()

    import jax
    if a.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import mi_fieldcalc_tpu.api as fc
    import mi_fieldcalc_tpu.batch as B
    from mi_fieldcalc_tpu import from_sentinel
    from mi_fieldcalc_tpu.layout import pad_field
    from mi_fieldcalc_tpu.ops.fused_suite import alevel_suite_fused
    from tools.timing import make_dispatch_probe

    on_tpu = jax.devices()[0].platform == "tpu"
    rng = np.random.default_rng(3)

    def stack(lo, hi):
        x = rng.uniform(lo, hi, (NLEV, NY, NX)).astype(np.float32)
        x[:, 0, 0] = fc.UNDEF
        return x

    tk3, q3, rh3 = stack(250, 300), stack(1e-4, 1e-2), stack(5, 95)
    # per-level 2-D views for the drop-in storm (contiguous slices)
    tkl = [np.ascontiguousarray(tk3[k]) for k in range(NLEV)]
    ql = [np.ascontiguousarray(q3[k]) for k in range(NLEV)]
    rhl = [np.ascontiguousarray(rh3[k]) for k in range(NLEV)]

    def storm_batch():
        outs = []
        with fc.batch(cache_inputs=True):
            for k in range(NLEV):
                p = float(PLEVELS[k])
                for c in TEMPS:
                    outs.append(fc.pleveltemp(tkl[k], p, "", c))
                for c in P_HUMS_Q:
                    outs.append(fc.plevelhum(tkl[k], ql[k], p, "", c))
                for c in P_HUMS_RH:
                    outs.append(fc.plevelhum(tkl[k], rhl[k], p, "", c))
        return [np.asarray(o) for o in outs]

    # suite kernel: p as a constant-per-level field
    def fld(x):
        f = from_sentinel(x)
        return pad_field(f) if on_tpu else f
    tkf, qf, rhf = fld(tk3), fld(q3), fld(rh3)
    pf = fld(np.broadcast_to(PLEVELS[:, None, None],
                             (NLEV, NY, NX)).copy())
    args_dev = jax.device_put((tkf, qf, rhf, pf))

    import functools
    suite = functools.partial(
        alevel_suite_fused, temps=TEMPS, hums_q=P_HUMS_Q,
        hums_rh=A_HUMS_RH)
    if not on_tpu:
        # jnp fallback for a smoke run off-TPU
        from mi_fieldcalc_tpu.ops import aleveltemp, alevelhum

        @jax.jit
        def suite(tk, q, rh, p):
            outs = [aleveltemp(tk, p, compute=c) for c in TEMPS]
            outs += [alevelhum(tk, q, p, compute=c) for c in P_HUMS_Q]
            outs += [alevelhum(tk, rh, p, compute=c) for c in A_HUMS_RH]
            return outs

    def storm_suite():
        outs = suite(*args_dev)
        return [(np.asarray(o.values), np.asarray(o.mask)) for o in outs]

    disp = make_dispatch_probe()
    B.clear_input_cache()
    ra = storm_batch()                        # compiles + fills cache
    rb = storm_suite()                        # compiles
    ncalls = len(ra)

    tiny = jnp.ones((8, 128), jnp.float32)
    add1 = jax.jit(lambda x: x + 1.0)
    float(add1(tiny)[0, 0])

    def drain():
        return float(add1(tiny)[0, 0])

    def run_batch_nofetch():
        # flush at context exit enqueues the ONE program; outputs stay
        # device-resident (lazy fetch) — nothing crosses the link
        with fc.batch(cache_inputs=True):
            outs = []
            for k in range(NLEV):
                p = float(PLEVELS[k])
                for c in TEMPS:
                    outs.append(fc.pleveltemp(tkl[k], p, "", c))
                for c in P_HUMS_Q:
                    outs.append(fc.plevelhum(tkl[k], ql[k], p, "", c))
                for c in P_HUMS_RH:
                    outs.append(fc.plevelhum(tkl[k], rhl[k], p, "", c))
        return outs

    recs = []
    for r in range(a.rounds):
        d0 = disp()
        t0 = time.perf_counter()
        for _ in range(5):
            run_batch_nofetch()
        drain()
        ta = (time.perf_counter() - t0) / 5
        t0 = time.perf_counter()
        for _ in range(5):
            suite(*args_dev)
        drain()
        tb = (time.perf_counter() - t0) / 5
        d1 = disp()
        recs.append((max(d0, d1), ta, tb))
        print(f"round {r}: disp {max(d0, d1)*1e3:5.2f} ms | "
              f"batch-XLA {ta*1e3:7.1f} ms  suite-kernel {tb*1e3:7.1f} ms "
              f"({ta/tb:.2f}x)", flush=True)

    # cross-check: suite outputs equal the batched drop-in storm (storm
    # emits per level [temps..., hums_q..., hums_rh...]; the suite emits
    # per MODE a [NLEV, ...] stack in the same request order)
    nmode = len(TEMPS) + len(P_HUMS_Q) + len(P_HUMS_RH)
    worst = 0.0
    for mi in range(nmode):
        kb = np.stack([ra[k * nmode + mi] for k in range(NLEV)])
        sv, sm = rb[mi]
        sv, sm = sv[..., :NY, :NX], sm[..., :NY, :NX]
        und = kb == np.float32(fc.UNDEF)
        assert np.array_equal(und, ~(sm != 0)), mi
        m = ~und
        d = np.abs(kb[m] - sv[m])
        # allclose-style: Celsius-scale outputs cross zero, so a bare
        # relative check explodes at the crossing lanes
        tol = 1e-3 + 2e-4 * np.abs(kb[m])
        nbad = int((d > tol).sum())
        assert nbad == 0, (mi, nbad, float(d.max()))
        worst = max(worst, float(d.max()))

    from tools.timing import select_uncongested
    ok, _, _ = select_uncongested(recs)
    ta = min(r[1] for r in ok)
    tb = min(r[2] for r in ok)
    print(f"best uncongested ({len(ok)}/{len(recs)}): batch-XLA "
          f"{ta*1e3:.1f} ms vs suite-kernel {tb*1e3:.1f} ms -> "
          f"kernel buys {ta/tb:.2f}x ({ncalls} calls, max |d| "
          f"{worst:.1e}; decision threshold 1.3x)")


if __name__ == "__main__":
    main()
