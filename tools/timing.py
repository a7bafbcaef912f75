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
