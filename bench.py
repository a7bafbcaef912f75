"""Headline benchmark: the flagship derived-field pipeline on one chip.

Workload (BASELINE.json config 4): the full hybrid-level derived-field
pipeline (pressure, theta, RH, Td, theta_e, ducting, wind speed, vorticity,
divergence, T-advection, |grad T|, TFP — 12 outputs) on a 32-level stack of
the MET Norway operational 719x929 AROME grid, with undef-mask lanes live.

Execution path: the fused single-pass Pallas kernel
(mi_fieldcalc_tpu/ops/fused.py) — all 12 outputs in one sweep over
(level, y-tile) blocks; falls back to the jnp/XLA pipeline off-TPU.

Methodology: the tunneled TPU backend's ``block_until_ready`` does not
reliably block, so timing uses queue-drain: N enqueued steps followed by a
scalar fetch from the final output (device programs execute in order).

The reference publishes no benchmark numbers (BASELINE.md), so
``vs_baseline`` reports the north-star target instead: the fraction of
this device's *measured* streaming roofline.  The pipeline is
elementwise/stencil work with trivial arithmetic intensity, so
speed-of-light is one program dispatch plus streaming every input once
and every output once at the bandwidth the chip actually delivers.
Calibration runs ``x+1`` streams at two sizes in the same run and fits
``time = overhead + bytes / BW`` — on this tunneled chip the fixed
dispatch overhead is ~0.9 ms, so a single same-size ``x+1`` wildly
understates the marginal bandwidth (a 21 M-point stream looks like
160 GB/s when the marginal rate is ~520 GB/s).  The roofline time is
``overhead + intrinsic_bytes / BW``; ``vs_baseline`` is the ratio of
that to the measured step time.

This bills *logical* bytes — the strictest possible denominator.  The
kernel's DMA engine must additionally move the canonical layout's
lane padding (929 -> 1024), the int8 mask planes' 32-row sublane tiles,
and the stencil halo blocks: ~1.4x the logical bytes (PERF.md "DMA cost
decomposition").  Against that structural bound the kernel measures
~90%; against the logical-bytes bound reported here it lands at
~0.5-0.7 depending on the shared chip's phase.  (The same-chip XLA
pipeline is 3.8x slower either way.)

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "points/s", "vs_baseline": N}
"""

import json
import time

NLEV, NY, NX = 32, 719, 929


def _hbm_bytes_per_step(nlev, ny, nx):
    """Minimal HBM traffic: each input read once, each output written once."""
    pts3 = nlev * ny * nx
    pts2 = ny * nx
    f32, b8 = 4, 1
    reads = 4 * pts3 * (f32 + b8)          # tk, q, u, v values+masks
    reads += pts2 * (f32 + b8)             # ps
    reads += 3 * pts2 * f32 + 2 * nlev * f32   # maps, coriolis, a/b levels
    writes = 12 * pts3 * (f32 + b8)        # 12 output fields values+masks
    return reads + writes


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from __graft_entry__ import _example_inputs
    from mi_fieldcalc_tpu.models import derived_fields

    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu:
        # canonical padded layout (layout.py): grids tile-aligned on
        # device, edge fills at the logical (NY, NX) boundary; ragged
        # grids pay ~2x in DMA bandwidth (tools/perf_lab_pad.py)
        import functools
        from mi_fieldcalc_tpu import pad_array, pad_field
        from mi_fieldcalc_tpu.field import Field
        from mi_fieldcalc_tpu.ops.fused import derived_fields_fused
        # stacked SoA outputs (DerivedFieldsStacked): 2 output buffers
        # instead of 21; 4.6 vs 5.3 ms on the padded layout
        step = functools.partial(derived_fields_fused,
                                 global_shape=(NY, NX), stacked=True)
        raw = _example_inputs(NLEV, NY, NX)
        args = jax.device_put(tuple(
            pad_field(a) if isinstance(a, Field) else
            (pad_array(a) if a.ndim == 2 else a)
            for a in raw))
    else:
        step = jax.jit(derived_fields)
        args = jax.device_put(_example_inputs(NLEV, NY, NX))

    def qtime(fn, probe, iters):
        out = fn()
        probe(out)                      # drain queue + force completion
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        probe(out)
        return (time.perf_counter() - t0) / iters

    # measured streaming roofline: x+1 at two sizes -> overhead + BW fit.
    # The shared chip's bandwidth drifts minute-to-minute (150-350 GB/s;
    # CLAUDE.md), so a single calibration phase followed by a single
    # step phase produces ratios anywhere in 0.5-1.8 on identical code.
    # Interleave (calibrate, step) ROUNDS and report the median ratio —
    # each round's comparison is adjacent in time, the median rejects
    # rounds where the chip shifted mid-round (5 rounds ~2 s: cheap
    # insurance against a 2-good-1-bad split landing on the bad one).
    add1 = jax.jit(lambda x: x + 1.0)
    big = args[0].values                          # nlev x ny x nx f32
    small = big[: max(NLEV // 4, 1)]
    b_big = 2 * 4 * big.size
    b_small = 2 * 4 * small.size
    probe = lambda o: float(o[0, 0, 0])
    add1(big), add1(small)                        # compile outside rounds
    step(*args)

    points = NLEV * NY * NX
    bytes_step = _hbm_bytes_per_step(NLEV, NY, NX)
    ratios, dts = [], []
    for _ in range(5):
        t_big = qtime(lambda: add1(big), probe, 30)
        t_small = qtime(lambda: add1(small), probe, 30)
        dt = qtime(lambda: step(*args),
                   lambda o: float(o.tfp.values[0, 0, 0]), 30)
        dts.append(dt)
        if t_big <= t_small:                      # degenerate fit: skip
            continue
        bw = (b_big - b_small) / (t_big - t_small)
        # a fit above the chip's physical HBM peak (v5e: 819 GB/s) is
        # measurement error by definition — clamp so one noisy round
        # cannot manufacture an unattainable roofline
        bw = min(bw, 819e9)
        overhead = max(t_big - b_big / bw, 0.0)
        ratios.append((overhead + bytes_step / bw) / dt)

    dt = min(dts)
    ratios.sort()
    if ratios:
        # lower-middle for even counts: with 2 surviving rounds take the
        # conservative one, not the favorable one
        vs = ratios[(len(ratios) - 1) // 2]
    else:
        # every fit degenerate (t_big <= t_small three times): fall back
        # to the strictest roofline — logical bytes at the physical HBM
        # peak with zero dispatch overhead.  Conservative, never 0.0
        # (which downstream run-to-run comparison would read as a
        # catastrophic regression).
        vs = (bytes_step / 819e9) / dt
    print(json.dumps({
        "metric": "derived_field_pipeline_points_per_sec",
        "value": round(points / dt, 1),
        "unit": "points/s",
        "vs_baseline": round(vs, 4),
    }))


if __name__ == "__main__":
    main()
