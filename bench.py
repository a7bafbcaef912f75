"""Headline benchmark: the flagship derived-field pipeline on one chip.

Workload (BASELINE.json config 4): the full hybrid-level derived-field
pipeline (pressure, theta, RH, Td, theta_e, ducting, wind speed, vorticity,
divergence, T-advection, |grad T|, TFP — 12 outputs) on a 32-level stack of
the MET Norway operational 719x929 AROME grid, with undef-mask lanes live.

The reference publishes no benchmark numbers (BASELINE.md), so
``vs_baseline`` reports the north-star target instead: the measured
fraction of the chip's HBM-bandwidth roofline (>= 0.9 is the target).
Roofline model: the pipeline is elementwise/stencil work with trivial
arithmetic intensity, so speed-of-light is streaming every input once and
every output once at full HBM bandwidth.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "points/s", "vs_baseline": N}
"""

import json
import time

import numpy as np


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


def _peak_hbm_gbps(device) -> float:
    """Per-chip HBM bandwidth by device kind (public TPU spec sheets)."""
    kind = getattr(device, "device_kind", "").lower()
    table = {
        "v5 lite": 819e9, "v5e": 819e9,
        "v5p": 2765e9, "v5": 2765e9,
        "v4": 1228e9,
        "v6 lite": 1638e9, "v6e": 1638e9,
    }
    for key, bw in table.items():
        if key in kind:
            return bw
    return 819e9  # conservative default


def main():
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _example_inputs
    from mi_fieldcalc_tpu.models import derived_fields

    nlev, ny, nx = 32, 719, 929
    args = _example_inputs(nlev, ny, nx)
    args = jax.device_put(args)

    step = jax.jit(derived_fields)
    out = step(*args)
    jax.block_until_ready(out)  # compile + warm up
    jax.block_until_ready(step(*args))

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    points = nlev * ny * nx
    pts_per_sec = points / dt

    dev = jax.devices()[0]
    roofline_pts = _peak_hbm_gbps(dev) / (_hbm_bytes_per_step(nlev, ny, nx)
                                          / points)
    print(json.dumps({
        "metric": "derived_field_pipeline_points_per_sec",
        "value": round(pts_per_sec, 1),
        "unit": "points/s",
        "vs_baseline": round(pts_per_sec / roofline_pts, 4),
    }))


if __name__ == "__main__":
    main()
