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

    # measured streaming roofline: x+1 at two sizes -> overhead + BW fit
    add1 = jax.jit(lambda x: x + 1.0)
    big = args[0].values                          # nlev x ny x nx f32
    small = big[: max(NLEV // 4, 1)]
    t_big = min(qtime(lambda: add1(big), lambda o: float(o[0, 0, 0]), 30)
                for _ in range(2))
    t_small = min(qtime(lambda: add1(small), lambda o: float(o[0, 0, 0]), 30)
                  for _ in range(2))
    b_big = 2 * 4 * big.size
    b_small = 2 * 4 * small.size
    bw = (b_big - b_small) / max(t_big - t_small, 1e-9)   # marginal bytes/s
    overhead = max(t_big - b_big / bw, 0.0)               # fixed dispatch s

    dt = min(qtime(lambda: step(*args),
                   lambda o: float(o.tfp.values[0, 0, 0]), 30)
             for _ in range(2))

    points = NLEV * NY * NX
    pts_per_sec = points / dt
    roofline_t = overhead + _hbm_bytes_per_step(NLEV, NY, NX) / bw
    print(json.dumps({
        "metric": "derived_field_pipeline_points_per_sec",
        "value": round(pts_per_sec, 1),
        "unit": "points/s",
        "vs_baseline": round(roofline_t / dt, 4),
    }))


if __name__ == "__main__":
    main()
