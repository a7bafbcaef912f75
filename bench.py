"""Headline benchmark: the flagship derived-field pipeline on one chip.

Workload (BASELINE.json config 4): the full hybrid-level derived-field
pipeline (pressure, theta, RH, Td, theta_e, ducting, wind speed, vorticity,
divergence, T-advection, |grad T|, TFP — 12 outputs) on a 32-level stack of
the MET Norway operational 719x929 AROME grid, with undef-mask lanes live.

Methodology: the pipeline is iterated on-device inside ``lax.fori_loop``
(each iteration's input carries a perturbation folded from *all* previous
outputs and masks, so no stage can be hoisted or dead-code-eliminated) and
timed by K-difference (K_hi vs K_lo runs), which cancels host->device
dispatch latency — essential here because the dev tunnel adds large
per-call overhead that is not chip time.

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

import numpy as np

NLEV, NY, NX = 32, 719, 929
K_LO, K_HI = 2, 12


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
        "v5p": 2765e9,
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
    from jax import lax
    from functools import partial
    from __graft_entry__ import _example_inputs
    from mi_fieldcalc_tpu import Field
    from mi_fieldcalc_tpu.models import derived_fields

    args = jax.device_put(_example_inputs(NLEV, NY, NX))
    tk, q, u, v, ps, a, b, xm, ym, fc = args

    @partial(jax.jit, static_argnums=(10,))
    def pipeline_k(tkv, q, u, v, ps, a, b, xm, ym, fc, k):
        """k pipeline applications; every output and mask is folded back
        into the carry so nothing is loop-hoisted or eliminated."""
        tk_mask = tk.mask  # closed over; constant across iterations

        def body(i, carry):
            out = derived_fields(Field(carry, tk_mask), q, u, v, ps,
                                 a, b, xm, ym, fc)
            upd = (out.p.values + out.th.values + out.rh.values
                   + out.td.values + out.thetae.values + out.ducting.values
                   + out.wspeed.values + out.vort.values + out.div.values
                   + out.tadv.values + out.gradt.values + out.tfp.values)
            m = out.p.mask
            for o in out[1:]:
                m = m & o.mask
            return carry + (upd + m.astype(jnp.float32)) * jnp.float32(1e-30)

        return lax.fori_loop(0, k, body, tkv).sum()

    run = lambda k: float(pipeline_k(tk.values, q, u, v, ps, a, b,  # noqa: E731
                                     xm, ym, fc, k))
    run(K_LO)
    run(K_HI)  # compile both variants

    reps = 3
    t_lo = min(_timed(run, K_LO) for _ in range(reps))
    t_hi = min(_timed(run, K_HI) for _ in range(reps))
    dt = (t_hi - t_lo) / (K_HI - K_LO)

    points = NLEV * NY * NX
    pts_per_sec = points / dt

    dev = jax.devices()[0]
    roofline_pts = _peak_hbm_gbps(dev) / (_hbm_bytes_per_step(NLEV, NY, NX)
                                          / points)
    print(json.dumps({
        "metric": "derived_field_pipeline_points_per_sec",
        "value": round(pts_per_sec, 1),
        "unit": "points/s",
        "vs_baseline": round(pts_per_sec / roofline_pts, 4),
    }))


def _timed(fn, *a):
    t0 = time.perf_counter()
    fn(*a)
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
