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

Calibration (redesigned round 3 — PERF.md "Structural light speed"):
each round measures (1) the fixed dispatch cost from a negligible-bytes
program, (2) the attainable streaming bandwidth as wire_bytes /
(time - dispatch) of a STRUCTURE-MATCHED Pallas copy probe — same block
structure, buffer count, and read:write mix as the kernel, trivial
compute — and (3) the step time; the roofline is ``dispatch +
logical_bytes / BW`` and ``vs_baseline`` the per-round ratio's
conservative median over 7 interleaved rounds.  Rounds where the
tunnel's enqueue cost spikes (0.9-4 ms minute-to-minute on this shared
backend, making the subtraction degenerate or super-physical) are
rejected; if every round is congested the fallback is the dispatch-free
scaled-copy ratio, never a physical-peak roofline no pattern attains.
(The previous two-point x+1 fit regularly went degenerate at these
probe sizes and was then CLAMPED to the 819 GB/s physical peak —
recording ~0.63 against a roofline nothing on this chip can reach;
same-process probes put the best attainable pattern at ~570 GB/s and
this kernel within ~5% of its structure-matched copy.)

This bills *logical* bytes — the strictest possible denominator.  The
kernel's DMA engine must additionally move the canonical layout's
lane padding (929 -> 1024), the int8 mask planes' sublane tiles, and
the stencil halo blocks: ~1.12x the logical bytes on the padded
layout.  The kernel runs at ~95-100% of its structure-matched copy in
every measured chip phase — all in-kernel compute hides behind DMA
(every math ablation is a wash, PERF.md).  (The same-chip XLA pipeline
is 3.8x slower either way.)

Tile-aligned control (round 4, VERDICT r3 item 3): the same kernel on
a 720x1024 LOGICAL grid — where logical bytes equal wire bytes, i.e.
zero lane padding — is measured in the same rounds and reported as
``aligned_vs_baseline``/``aligned_points_per_sec`` on the same line.
It separates "kernel at light speed, grid is ragged" (aligned ratio
>= ~0.93 while the 719x929 ratio sits at its ~0.88 structural ceiling)
from residual kernel headroom (both low).

Production aligned-ingest path (round 5, VERDICT r4 item 1): the
aligned-control inputs are no longer synthetic — they are the 719x929
production grids re-gridded through the shipped aligned-ingest helper
(ingest.resample_align / resample_maps, what staging's
``align=True`` / MF_STAGING_ALIGN=1 runs per step), so the aligned
measurement IS the production path for a caller that opts into the
tile-aligned product grid.  It is additionally reported as
``production_vs_baseline``/``production_points_per_sec`` — the
≥0.90-of-roofline target assessed on the grid the pipeline actually
serves under aligned ingest (the host-side re-grid cost is bound
separately in PERF.md "Aligned ingest"; it is once-per-step codec
work overlapped by the streaming executor, not device time).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "points/s", "vs_baseline": N,
   "aligned_vs_baseline": N, "aligned_points_per_sec": N,
   "production_vs_baseline": N, "production_points_per_sec": N}
(off-TPU the aligned/production keys are omitted)
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
        # tile-aligned production path: the SAME 719x929 inputs entered
        # through the aligned-ingest helper (logical grid = wire grid)
        import numpy as np
        from mi_fieldcalc_tpu.field import UNDEF, from_sentinel
        from mi_fieldcalc_tpu.ingest import (aligned_target,
                                             resample_align, resample_maps)
        NYA, NXA = aligned_target(NY, NX)
        step_al = functools.partial(derived_fields_fused,
                                    global_shape=(NYA, NXA), stacked=True)

        def _sent(f):
            return np.where(np.asarray(f.mask), np.asarray(f.values),
                            np.float32(UNDEF))

        # widen tk's undef point to a 3x3 patch so undef-mask lanes
        # survive the mask-aware re-grid (a lone point's neighbours keep
        # every target corner-set partially defined); timing is
        # data-independent, this keeps the workload description honest
        tk_s = _sent(raw[0])
        tk_s[:, NY // 3:NY // 3 + 3, NX // 3:NX // 3 + 3] = np.float32(UNDEF)
        sents = [tk_s] + [_sent(f) for f in raw[1:5]]
        xm_a, ym_a = resample_maps(np.asarray(raw[7]), np.asarray(raw[8]),
                                   NY, NX)
        args_al = jax.device_put(tuple(
            [from_sentinel(resample_align(s)) for s in sents]
            + [raw[5], raw[6], jnp.asarray(xm_a), jnp.asarray(ym_a),
               jnp.asarray(resample_align(np.asarray(raw[9]),
                                          mask_aware=False))]))
    else:
        step = jax.jit(derived_fields)
        args = jax.device_put(_example_inputs(NLEV, NY, NX))
        step_al = None

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
    # rounds where the chip shifted mid-round (5 rounds ~3 s: cheap
    # insurance against a 2-good-1-bad split landing on the bad one).
    #
    # Probe choice matters (round-3 calibration fix, PERF.md "Structural
    # light speed"): the old calibration ran x+1 on a 94 MB buffer,
    # where the ~0.9 ms fixed dispatch overhead dominates both points,
    # delta-t sits at noise level, and the two-point fit regularly went
    # degenerate — the old code then CLAMPED those fits to the 819 GB/s
    # physical peak, a rate NO measured access pattern on this chip
    # attains.  Same-process probes: plain x+1 sustains only ~290 GB/s
    # marginal (it UNDERSTATES what the chip delivers — using it sends
    # the ratio above 1.0, equally dishonest), write-heavy 12-output
    # streams sustain ~570 GB/s marginal — the fastest measured pattern
    # and the same read:write mix as this workload (~30:70) — and a
    # structure-matched copy of this very kernel runs within ~5% of the
    # kernel itself (all compute hides behind DMA).  So: calibrate with
    # the 12-output probe at two sizes (delta ~0.9 GB, delta-t ~1.6 ms
    # >> noise) and REJECT implausible fits (> physical peak) instead
    # of clamping — an erroneous fit must not manufacture an
    # unattainable roofline.
    # Three-part roofline (round-3 calibration redesign): (1) fixed
    # dispatch overhead from a negligible-bytes program; (2) attainable
    # streaming bandwidth measured DIRECTLY as wire_bytes / streaming
    # time of a STRUCTURE-MATCHED copy probe — the same block structure,
    # buffer count, and read:write mix as the kernel, with trivial
    # compute.  Two-point delta fits were tried (x+1 small, x+1 4x,
    # XLA 12-output, Pallas 12-output) and are hopeless on this shared
    # drifting chip: the delta sits at noise level or the probe's own
    # fixed costs pollute the intercept, producing ratios 0.6-1.7 on
    # identical code.  The single-program copy probe shares the
    # kernel's phase sensitivity (adjacent in time), so the ratio is
    # stable; (3) roofline = dispatch + logical_bytes / BW_attained.
    # BW_attained is the FASTEST measured access pattern on this chip
    # (~570 GB/s streaming; plain XLA streams sustain less).
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    NYP = args[0].values.shape[1]                 # padded rows (720)
    NXP = args[0].values.shape[2]                 # padded lanes (1024)
    TYP = 48
    nb8, r8 = NYP // 8, TYP // 8

    def _ck(tkc, tkp, tkn, uc, up, un, vc, vp, vn, qc,
            m0, m1, m2, m3, m4, ps_r, ov, om):
        v = tkc[0] + uc[0] + vc[0] + qc[0] + ps_r[...]
        v = (v + tkp[0, 7, :] + tkn[0, 0, :] + up[0, 7, :]
             + un[0, 0, :] + vp[0, 7, :] + vn[0, 0, :])
        mm = (m0[0].astype(jnp.int32) & m1[0].astype(jnp.int32)
              & m2[0].astype(jnp.int32) & m3[0].astype(jnp.int32)
              & m4[0].astype(jnp.int32))
        for k in range(12):
            ov[k, 0] = v + jnp.float32(k)
        for k in range(9):
            om[k, 0] = mm.astype(jnp.int8)

    c3 = lambda: pl.BlockSpec((1, TYP, NXP), lambda j, l: (l, j, 0),
                              memory_space=pltpu.VMEM)
    p83 = lambda: pl.BlockSpec(
        (1, 8, NXP), lambda j, l: (l, jnp.maximum(j * r8 - 1, 0), 0),
        memory_space=pltpu.VMEM)
    n83 = lambda: pl.BlockSpec(
        (1, 8, NXP), lambda j, l: (l, jnp.minimum((j + 1) * r8, nb8 - 1), 0),
        memory_space=pltpu.VMEM)
    copyk = jax.jit(pl.pallas_call(
        _ck,
        grid=(NYP // TYP, NLEV),
        in_specs=[c3(), p83(), n83()] * 3 + [c3()] * 6
        + [pl.BlockSpec((TYP, NXP), lambda j, l: (j, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((12, 1, TYP, NXP),
                                lambda j, l: (0, l, j, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((9, 1, TYP, NXP),
                                lambda j, l: (0, l, j, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((12, NLEV, NYP, NXP), jnp.float32),
                   jax.ShapeDtypeStruct((9, NLEV, NYP, NXP), jnp.int8))))
    xb = [args[0].values, args[2].values, args[3].values, args[1].values]
    mb = [jnp.ones((NLEV, NYP, NXP), jnp.int8) for _ in range(5)]
    psb = jnp.ones((NYP, NXP), jnp.float32)
    cargs = (xb[0], xb[0], xb[0], xb[1], xb[1], xb[1], xb[2], xb[2],
             xb[2], xb[3], *mb, psb)
    n3 = NLEV * NYP * NXP
    # probe wire bytes: 4 f32 center reads + 16 halo rows per 3 stencil
    # inputs per TYP-row tile + 5 int8 mask planes + ps, then 12 f32 +
    # 9 int8 plane writes
    bytes_copy = (4 * n3 * 4 + (16 * 3 / TYP) * n3 * 4
                  + 5 * n3 + NYP * NXP * 4 + 12 * n3 * 4 + 9 * n3)
    tiny = jnp.ones((8, 128), jnp.float32)
    add1 = jax.jit(lambda x: x + 1.0)
    probe = lambda o: float(o[0][0, 0, 0, 0])
    probe1 = lambda o: float(o[0, 0])
    copyk(*cargs), add1(tiny)                     # compile outside rounds
    step(*args)

    points = NLEV * NY * NX
    bytes_step = _hbm_bytes_per_step(NLEV, NY, NX)
    if on_tpu:
        step_al(*args_al)                         # compile outside rounds
        bytes_al = _hbm_bytes_per_step(NLEV, NYA, NXA)
    ratios, scaled, dts = [], [], []
    ratios_al, scaled_al, dts_al = [], [], []
    for _ in range(7):
        t_disp = qtime(lambda: add1(tiny), probe1, 10)
        t_copy = qtime(lambda: copyk(*cargs), probe, 15)
        dt = qtime(lambda: step(*args),
                   lambda o: float(o.tfp.values[0, 0, 0]), 30)
        dts.append(dt)
        if on_tpu:
            dt_al = qtime(lambda: step_al(*args_al),
                          lambda o: float(o.tfp.values[0, 0, 0]), 30)
            dts_al.append(dt_al)
        # dispatch-free fallback ratio: scale the copy's time to the
        # workload's logical bytes.  Tunnel congestion (enqueue cost
        # 0.9-4 ms minute-to-minute on this shared backend) hits copy
        # and kernel alike, so it largely cancels here.
        scaled.append((t_copy * bytes_step / bytes_copy) / dt)
        if on_tpu:
            scaled_al.append((t_copy * bytes_al / bytes_copy) / dt_al)
        if t_copy <= t_disp:                      # enqueue-bound: skip
            continue
        bw = bytes_copy / (t_copy - t_disp)
        if bw > 819e9:   # > physical peak: congested-dispatch artifact
            continue
        r = (t_disp + bytes_step / bw) / dt
        if r <= 1.05:
            # measured-beats-roofline is physically impossible when the
            # roofline is real — the round's dispatch sample was taken
            # in a congestion spike the copy/step samples missed
            ratios.append(r)
        if on_tpu:
            r_al = (t_disp + bytes_al / bw) / dt_al
            if r_al <= 1.05:
                ratios_al.append(r_al)

    def _pick(rs, sc):
        rs, sc = sorted(rs), sorted(sc)
        if rs:
            # lower-middle for even counts: with 2 surviving rounds take
            # the conservative one, not the favorable one
            return rs[(len(rs) - 1) // 2]
        # every round was enqueue-congested: use the dispatch-free
        # scaled-copy ratio (never the old physical-peak fallback — an
        # unattainable roofline is not a baseline)
        return sc[(len(sc) - 1) // 2]

    dt = min(dts)
    row = {
        "metric": "derived_field_pipeline_points_per_sec",
        "value": round(points / dt, 1),
        "unit": "points/s",
        "vs_baseline": round(_pick(ratios, scaled), 4),
    }
    if on_tpu:
        # tile-aligned control == production aligned-ingest path: same
        # kernel, logical bytes == wire bytes, inputs re-gridded from
        # the 719x929 production grids by ingest.resample_align
        dt_al = min(dts_al)
        r_al = round(_pick(ratios_al, scaled_al), 4)
        pps_al = round(NLEV * NYA * NXA / dt_al, 1)
        row["aligned_vs_baseline"] = r_al
        row["aligned_points_per_sec"] = pps_al
        row["production_vs_baseline"] = r_al
        row["production_points_per_sec"] = pps_al
    print(json.dumps(row))


if __name__ == "__main__":
    main()
