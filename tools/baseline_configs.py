"""Measure every BASELINE.json config that fits on one chip.

Prints one JSON line per config (points/s + ms/step, queue-drain
timing per CLAUDE.md methodology):

1. potential temperature + dewpoint, one pressure level, small grid
   with undefs (mirrors FieldCalculationsTest; dispatch-bound),
2. the full humidity/temperature conversion suite (aleveltemp 5 modes +
   alevelhum 12 modes) batched over 10 levels with undef masking,
3. the horizontal stencil set (geostrophic wind x/y, relative
   vorticity, divergence, gradient modes 1-4) on the global 0.25
   degree single-host grid,
4. the 3-D vertical pipeline (hybrid -> 11 isobaric surfaces + the
   12-output derived-field kernel) on a 137-level column stack —
   bench.py's sibling at the north-star level count,
5. (multi-host) not measurable on one chip — audited AOT by
   tools/northstar_aot.py; this script just echoes that pointer.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/baseline_configs.py
"""
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp

from mi_fieldcalc_tpu import UNDEF, from_sentinel
from mi_fieldcalc_tpu.field import Field


from tools.timing import (make_dispatch_probe, qtime_probed,  # noqa: E402
                          select_uncongested)


def emit(config, desc, pts, dt, extra=None):
    row = {"config": config, "desc": desc,
           "points": pts, "ms_per_step": round(dt * 1e3, 3),
           "points_per_sec": round(pts / dt, 1)}
    if extra:
        row.update(extra)
    print(json.dumps(row), flush=True)


def _sent(rng, lo, hi, shape, undef_frac=0.02):
    a = rng.uniform(lo, hi, shape).astype(np.float32)
    a[rng.random(shape) < undef_frac] = UNDEF
    return a


def config1(disp):
    """Theta + dewpoint on one pressure level, small grid, undefs."""
    from mi_fieldcalc_tpu.ops import pleveltemp, plevelhum

    rng = np.random.default_rng(0)
    ny, nx = 96, 128
    tk = from_sentinel(_sent(rng, 250, 300, (ny, nx)))
    q = from_sentinel(_sent(rng, 1e-4, 1e-2, (ny, nx)))

    @jax.jit
    def step(tk, q):
        th = pleveltemp(tk, 850.0, compute=3)            # T -> theta
        td = plevelhum(tk, q, 850.0, compute=11)         # q -> Td(K)
        return th, td

    dt, info = qtime_probed(lambda: step(tk, q),
                            lambda o: float(o[1].values[0, 0]),
                            disp=disp)
    emit(1, "theta+dewpoint, 1 plevel, 96x128 with undefs",
         ny * nx, dt, info)


def config1b(disp):
    """The same small-grid class as config 1 but at the production call
    pattern: a 22-call drop-in storm (tools/perf_lab_batch.storm) run
    through api.batch() — one device program per cycle instead of one
    dispatch per call (PERF.md "Call-storm batching").  Wall-clock reps
    are dispatch-probe-gated like the qtime_probed rounds: a rep taken
    inside a tunnel congestion spike is rejected."""
    import time

    import mi_fieldcalc_tpu.api as fc
    from tools.perf_lab_batch import storm, NY, NX

    rng = np.random.default_rng(7)

    def u(lo, hi):
        x = rng.uniform(lo, hi, (NY, NX)).astype(np.float32)
        x[0, 0] = UNDEF
        return x

    g = (u(240, 260), u(250, 275), u(260, 290), u(5, 95), u(5, 95),
         u(1e-4, 8e-3), u(2800, 3200), u(0, 300), u(-20, 20), u(-20, 20),
         u(-40, 40), u(-40, 40), u(255, 285), u(230, 255))
    ncalls = len(storm(fc, g))                   # eager compile pass
    with fc.batch():
        storm(fc, g)                             # batched compile pass
    recs = []
    for _ in range(5):
        d0 = disp()
        t0 = time.perf_counter()
        storm(fc, g)
        de = time.perf_counter() - t0
        t0 = time.perf_counter()
        with fc.batch():
            out = storm(fc, g)
        np.asarray(out[0])
        dt = time.perf_counter() - t0
        d1 = disp()
        recs.append((max(d0, d1), de, dt))
    sel, dmin, congested = select_uncongested(recs)
    eager = min(r[1] for r in sel)
    best = min(r[2] for r in sel)
    emit("1b", f"config-1 class at the production call pattern: "
         f"{ncalls}-call storm via api.batch(), 96x128",
         ncalls * NY * NX, best,
         extra={"eager_ms": round(eager * 1e3, 1),
                "speedup": round(eager / best, 1),
                "disp_ms": round(dmin * 1e3, 3),
                "rounds_used": len(sel), "rounds": len(recs),
                "congested": congested})


def config2(disp):
    """Humidity/temperature conversion suite, 10 levels, undef masking."""
    from mi_fieldcalc_tpu.ops import aleveltemp, alevelhum
    from mi_fieldcalc_tpu.ops.fused_suite import alevel_suite_fused

    rng = np.random.default_rng(1)
    nlev, ny, nx = 10, 719, 929
    on_tpu = jax.devices()[0].platform == "tpu"

    def pad(f):
        from mi_fieldcalc_tpu.layout import pad_field
        return pad_field(f) if on_tpu else f

    tk = pad(from_sentinel(_sent(rng, 250, 300, (nlev, ny, nx))))
    q = pad(from_sentinel(_sent(rng, 1e-4, 1e-2, (nlev, ny, nx))))
    rh = pad(from_sentinel(_sent(rng, 5, 95, (nlev, ny, nx))))
    p = pad(from_sentinel(rng.uniform(300, 1000, (nlev, ny, nx)
                                      ).astype(np.float32)))

    # alevelhum numbering (differs from plevelhum, levels.py
    # _levelhum_core): 5/6/9/10 take q, 7/8/11/12 take RH
    temps = (3, 4)
    hq = (1, 5, 9)            # q->RH, q->Td(C), q->Td(K)
    hr = (3, 7, 11)           # RH->q, RH->Td(C), RH->Td(K)
    if on_tpu:
        import functools
        step = functools.partial(alevel_suite_fused, temps=temps,
                                 hums_q=hq, hums_rh=hr)
        tag = "fused suite kernel"
    else:
        @jax.jit
        def step(tk, q, rh, p):
            outs = [aleveltemp(tk, p, compute=c) for c in temps]
            outs += [alevelhum(tk, q, p, compute=c) for c in hq]
            outs += [alevelhum(tk, rh, p, compute=c) for c in hr]
            return outs
        tag = "jnp/XLA"

    dt, info = qtime_probed(lambda: step(tk, q, rh, p),
                            lambda o: float(o[-1].values[0, 0, 0]),
                            disp=disp)
    # 8 derived fields per point per step
    emit(2, f"humidity/temperature suite (8 conversions, {tag}), "
            "10 levels, 719x929, undef masking", 8 * nlev * ny * nx, dt,
         info)


def config3(disp):
    """Horizontal stencil set on the global 0.25-degree grid."""
    from mi_fieldcalc_tpu.ops import (divergence, gradient,
                                      plevelgwind_xcomp,
                                      plevelgwind_ycomp, relvort)

    rng = np.random.default_rng(2)
    ny, nx = 721, 1440
    z = from_sentinel(_sent(rng, 4800, 5900, (ny, nx), undef_frac=0.005))
    u = from_sentinel(_sent(rng, -30, 30, (ny, nx), undef_frac=0.005))
    v = from_sentinel(_sent(rng, -30, 30, (ny, nx), undef_frac=0.005))
    tk = from_sentinel(_sent(rng, 250, 300, (ny, nx), undef_frac=0.005))
    xm = jnp.full((ny, nx), 4e-6, jnp.float32)
    ym = jnp.full((ny, nx), 4e-6, jnp.float32)
    fc = jnp.full((ny, nx), 1.2e-4, jnp.float32)

    @jax.jit
    def step(z, u, v, tk):
        outs = [plevelgwind_xcomp(z, xm, ym, fc),
                plevelgwind_ycomp(z, xm, ym, fc),
                relvort(u, v, xm, ym),
                divergence(u, v, xm, ym)]
        outs += [gradient(tk, xm, ym, compute=c) for c in (1, 2, 3, 4)]
        return outs

    dt, info = qtime_probed(lambda: step(z, u, v, tk),
                            lambda o: float(o[-1].values[0, 0]),
                            disp=disp)
    emit(3, "stencil set (8 fields: gwind x/y, vort, div, gradient 1-4) "
            "on global 0.25deg 721x1440", 8 * ny * nx, dt, info)


def config4(disp):
    """137-level hybrid stack -> 11 isobaric surfaces -> 12 derived
    fields, one jitted program on the canonical padded layout."""
    from mi_fieldcalc_tpu import pad_array, pad_field
    from mi_fieldcalc_tpu.models.pipeline import (STANDARD_PLEVELS,
                                                  derived_fields_isobaric)

    rng = np.random.default_rng(3)
    nlev, ny, nx = 137, 719, 929
    on_tpu = jax.devices()[0].platform == "tpu"

    def fld(lo, hi):
        f = from_sentinel(_sent(rng, lo, hi, (nlev, ny, nx),
                                undef_frac=0.005))
        return pad_field(f) if on_tpu else f

    tk, q = fld(220, 300), fld(1e-4, 1e-2)
    u, v = fld(-40, 40), fld(-40, 40)
    ps = from_sentinel(rng.uniform(950, 1030, (ny, nx)).astype(np.float32))
    ps = pad_field(ps) if on_tpu else ps
    al = jnp.asarray(np.linspace(50, 300, nlev), jnp.float32)
    bl = jnp.asarray(np.linspace(0.0, 0.7, nlev) ** 1.5, jnp.float32)
    xm = np.full((ny, nx), 4e-7, np.float32)
    ym = np.full((ny, nx), 4e-7, np.float32)
    fc = jnp.asarray(np.full((ny, nx), 1.2e-4, np.float32))
    xmp = pad_array(xm) if on_tpu else jnp.asarray(xm)
    ymp = pad_array(ym) if on_tpu else jnp.asarray(ym)

    import functools
    step = jax.jit(functools.partial(
        derived_fields_isobaric, plevels=STANDARD_PLEVELS,
        fused=on_tpu, stacked=on_tpu,
        global_shape=(ny, nx) if on_tpu else None))
    fn = lambda: step(tk, q, u, v, ps, al, bl, xmp, ymp, fc)
    probe = ((lambda o: float(o.values[11, 0, 0, 0])) if on_tpu
             else (lambda o: float(o.tfp.values[0, 0, 0])))
    dt, info = qtime_probed(fn, probe, iters=10, disp=disp)
    # points processed: the 137-level input columns
    emit(4, "137L hybrid -> 11 plevels -> 12 derived fields, 719x929, "
            "fused", nlev * ny * nx, dt,
         {"plevels": len(STANDARD_PLEVELS), **info})


def phase_probe(disp):
    """Row 0: the chip/tunnel phase this ledger was measured in.
    Rounds-over-rounds comparison of configs 1-3 is meaningful only
    between ledgers whose phase probes match (~30%): the shared chip's
    dispatch (0.9-4 ms) and streaming bandwidth (150-350+ GB/s) both
    drift minute-to-minute, and the dispatch-bound (1, 1b) and
    bandwidth-bound (2, 3, 4) configs track them directly."""
    import time

    x = jnp.ones((64, 1024, 1024), jnp.float32)   # 256 MB
    cp = jax.jit(lambda a: a + 1.0)
    y = cp(x)
    float(y[0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(4):
        y = cp(x)
    float(y[0, 0, 0])
    dt = (time.perf_counter() - t0) / 4
    d = disp()
    bw = 2 * x.nbytes / max(dt - d, 1e-6)
    print(json.dumps({"config": 0, "desc": "phase probes (condition "
                      "rows on these before cross-ledger comparison)",
                      "disp_ms": round(d * 1e3, 3),
                      "bw_gbps": round(bw / 1e9, 1)}), flush=True)


def main():
    disp = make_dispatch_probe()
    phase_probe(disp)
    for f in (config1, config1b, config2, config3, config4):
        f(disp)
    print(json.dumps({
        "config": 5,
        "desc": "multi-host 0.25deg x 137L: not measurable on one chip; "
                "AOT-audited for v5e topologies (PERF.md, "
                "tools/northstar_aot.py); sharding equivalence-tested on "
                "the 8-device CPU mesh (tests/test_parallel_fused.py)",
    }), flush=True)


if __name__ == "__main__":
    main()
