"""Shared queue-drain timing helper for the perf labs.

The tunneled TPU backend's ``block_until_ready`` does not reliably
block (CLAUDE.md): time by enqueueing ``iters`` calls and forcing
completion with a scalar fetch from the last output.  Never let the
first-ever compile (even of the scalar-fetch gather) inside a timed
region — ``qtime`` runs one warm-up call + probe per rep before
starting the clock.

bench.py keeps its own copy on purpose (the driver runs it standalone;
it must not depend on tools/).
"""
import time


def qtime(fn, probe, iters=20, reps=3):
    """Best-of-``reps`` mean step time of ``fn`` over ``iters`` calls."""
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


def make_dispatch_probe():
    """A negligible-bytes program whose queue-drain time is pure
    dispatch: the shared tunnel's enqueue cost drifts 0.9-4 ms
    minute-to-minute (PERF.md "Structural light speed"), and a timing
    round taken inside such a spike is noise, not signal.  Compile
    happens here, outside any timed region."""
    import jax
    import jax.numpy as jnp
    tiny = jnp.ones((8, 128), jnp.float32)
    add1 = jax.jit(lambda x: x + 1.0)
    float(add1(tiny)[0, 0])

    def disp(iters=10):
        out = add1(tiny)
        float(out[0, 0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = add1(tiny)
        float(out[0, 0])
        return (time.perf_counter() - t0) / iters

    return disp


def select_uncongested(recs, key=0):
    """Shared congestion gate for (dispatch, ...) measurement rounds:
    keep rounds whose dispatch estimate sits within ``max(1.5x,
    +0.5 ms)`` of the best round's; fall back to ALL rounds when every
    one is congested.  Returns ``(selected, dmin, congested)`` — the
    single source of the thresholds for qtime_probed and the perf labs
    (retuning them in one place keeps cross-ledger gating consistent)."""
    dmin = min(r[key] for r in recs)
    ok = [r for r in recs if r[key] <= max(1.5 * dmin, dmin + 5e-4)]
    return (ok if ok else list(recs)), dmin, not ok


def qtime_probed(fn, probe, iters=20, rounds=5, disp=None,
                 retry_disp=1.8e-3, retries=1):
    """Congestion-robust queue-drain timing (bench.py's rejection
    machinery, shared): each round brackets the step measurement with
    dispatch probes and is REJECTED when the dispatch estimate spikes
    above ``max(1.5x, +0.5 ms)`` of the best round's — a congested
    tunnel inflates every sample taken through it.  When even the BEST
    round's dispatch exceeds ``retry_disp`` (the whole attempt sat in a
    congestion phase the relative gate cannot see), the full attempt is
    repeated up to ``retries`` times and the lowest-dispatch attempt
    wins.  Returns ``(step_time, info)``: min over surviving rounds,
    plus the dispatch estimate and rejection tally — cross-run ledger
    comparisons should condition on ``disp_ms``."""
    if disp is None:
        disp = make_dispatch_probe()

    def attempt():
        recs = []
        for _ in range(rounds):
            d0 = disp()
            out = fn()
            probe(out)
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn()
            probe(out)
            dt = (time.perf_counter() - t0) / iters
            d1 = disp()
            recs.append((max(d0, d1), dt))
        return recs

    best = None
    for k in range(retries + 1):
        recs = attempt()
        dmin = min(d for d, _ in recs)
        if best is None or dmin < best[0]:
            best = (dmin, recs, k)
        if dmin <= retry_disp:
            break
    dmin, recs, _ = best
    sel, _, congested = select_uncongested(recs)
    return min(dt for _, dt in sel), {
        "disp_ms": round(dmin * 1e3, 3),
        "rounds_used": len(sel),
        "rounds": rounds,
        "congested": congested or dmin > retry_disp,
    }
