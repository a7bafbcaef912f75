"""Weak-scaling harness for the sharded derived-field pipeline.

BASELINE.json configs 3/5: domain-decomposed pipeline with halo exchange
over ICI, weak scaling 1 chip -> N chips (fixed per-device block, global
grid grows with the mesh).  On a real TPU slice this reports the
weak-scaling efficiency headline; on the CPU backend
(``JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8``)
it validates the harness end-to-end.

Usage::

    python tools/scaling_bench.py [--local-ny 360] [--local-nx 360]
                                  [--nlev 16] [--iters 10]

Prints one JSON line per mesh size with points/s and efficiency relative
to the single-device run.

``--artifact OUT.json`` (round 4, VERDICT r3 weak #3) records what IS
measurable on a virtual CPU mesh, instead of a wall-clock "efficiency"
that mostly measures N virtual devices contending for 4 host cores:

* ``comm_overhead_frac`` — the sharded step against a CONTENTION-
  MATCHED control: the same per-shard compute on the same mesh with
  radius-0 sharding (no halo exchange, seam values wrong, timing
  valid).  Both sides share the host cores identically, so the ratio
  isolates what the collectives + seam machinery cost.
* ``hlo_collective_permutes`` / ``hlo_all_gathers`` — counted from the
  compiled sharded step's HLO: the communication STRUCTURE the SPMD
  partitioner actually emitted, which is what transfers to real
  slices (the per-chip byte counts are audited separately by
  tools/northstar_aot.py on real v5e topologies).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--local-ny", type=int, default=360)
    ap.add_argument("--local-nx", type=int, default=360)
    ap.add_argument("--nlev", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--overlap", action="store_true",
                    help="route the TPU path through the seam-strip "
                         "overlap variant (interior kernel independent "
                         "of the halo collectives)")
    ap.add_argument("--all-defined", action="store_true",
                    help="ALL_DEFINED fast path: mask-free halo legs "
                         "(one ppermute per direction) + the 2-gate "
                         "kernel per shard (TPU path only)")
    ap.add_argument("--cpu", type=int, default=0, metavar="N",
                    help="force an N-device virtual CPU mesh (the axon "
                         "plugin pins the platform, so the env var alone "
                         "is not enough)")
    ap.add_argument("--artifact", default=None, metavar="OUT.json",
                    help="write the contention-matched overhead artifact "
                         "(see module docstring) instead of the wall-"
                         "clock efficiency headline")
    args_ns = ap.parse_args()

    if args_ns.cpu:
        import os
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                                   f" --xla_force_host_platform_device_count="
                                   f"{args_ns.cpu}")
    import jax
    if args_ns.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import numpy as np
    from __graft_entry__ import _example_inputs
    from mi_fieldcalc_tpu.models import derived_fields
    from mi_fieldcalc_tpu.models.pipeline import RADIUS
    from mi_fieldcalc_tpu.parallel import grid_mesh, run_sharded
    from mi_fieldcalc_tpu.parallel.fused import derived_fields_fused_sharded

    ndev_all = len(jax.devices())
    on_tpu = jax.devices()[0].platform == "tpu"
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= ndev_all]

    import re

    def qtime(step, probe, iters):
        out = step()
        probe(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step()
        probe(out)
        return (time.perf_counter() - t0) / iters

    rows = []
    base_pps = None
    for n in sizes:
        gy = int(np.sqrt(n))
        while n % gy:
            gy -= 1
        gx = n // gy
        ny, nx = args_ns.local_ny * gy, args_ns.local_nx * gx
        mesh = grid_mesh((1, gy, gx), devices=jax.devices()[:n])
        inp = list(jax.device_put(_example_inputs(args_ns.nlev, ny, nx)))
        import jax.numpy as jnp
        xm2 = jnp.broadcast_to(inp[7], (ny, nx))
        ym2 = jnp.broadcast_to(inp[8], (ny, nx))
        fc2 = jnp.broadcast_to(inp[9], (ny, nx))

        if on_tpu:
            step = lambda: derived_fields_fused_sharded(
                mesh, *inp[:7], xm2, ym2, fc2, overlap=args_ns.overlap,
                all_defined=args_ns.all_defined)
        else:
            fn = jax.jit(lambda *a: run_sharded(
                derived_fields, mesh, RADIUS, *a))
            step = lambda: fn(*inp)

        probe = lambda o: float(o.tfp.values[0, 0, 0])
        dt = qtime(step, probe, args_ns.iters)
        pts = args_ns.nlev * ny * nx
        pps = pts / dt
        if base_pps is None:
            base_pps = pps
        row = {
            "devices": n, "mesh": [1, gy, gx],
            "grid": [args_ns.nlev, ny, nx],
            "overlap": bool(args_ns.overlap and on_tpu),
            "all_defined": bool(args_ns.all_defined and on_tpu),
            "points_per_sec": round(pps, 1),
            "ms_per_step": round(dt * 1e3, 2),
        }
        if args_ns.artifact and not on_tpu:
            # contention-matched control: same compute, same mesh, no
            # halo exchange (radius 0; seam values wrong, timing valid)
            fn0 = jax.jit(lambda *a: run_sharded(
                derived_fields, mesh, 0, *a))
            dt0 = qtime(lambda: fn0(*inp), probe, args_ns.iters)
            row["ms_nocomm_control"] = round(dt0 * 1e3, 2)
            row["comm_overhead_frac"] = round(max(dt - dt0, 0.0) / dt, 4)
            # reuse the already-compiled step's executable for the HLO
            # (a fresh jit object would recompile the largest program
            # in the run a second time per mesh size)
            hlo = fn.lower(*inp).compile().as_text()
            row["hlo_collective_permutes"] = len(re.findall(
                r"collective-permute(?:-start)?\(", hlo))
            row["hlo_all_gathers"] = len(re.findall(
                r"all-gather(?:-start)?\(", hlo))
            if n > 1:
                # ---- overhead DECOMPOSITION (VERDICT r4 item 2) ------
                # self-permute control: identical slice/collective/
                # concat structure and byte counts, but every ppermute
                # targets SELF — zero cross-device movement.  On this
                # backend transport and restructure are both host
                # memcpy; the pair of controls splits the radius-2
                # overhead into
                #   restructure_ms = t_selfperm - t_nocomm   (the
                #     halo-concat rebuild of every >=2-D operand; the
                #     TPU fused path does NOT do this — its packed
                #     exchange moves strips and the kernel reads them
                #     in place)
                #   transport_ms  = t_step - t_selfperm      (neighbour
                #     delivery; predicted on ICI below)
                import os as _os
                _os.environ["MF_LAB_SELF_PERMUTE"] = "1"
                try:
                    fn_id = jax.jit(lambda *a: run_sharded(
                        derived_fields, mesh, RADIUS, *a))
                    dt_id = qtime(lambda: fn_id(*inp), probe,
                                  args_ns.iters)
                finally:
                    _os.environ.pop("MF_LAB_SELF_PERMUTE", None)
                # analytic per-device byte attribution
                h = RADIUS
                halo_b = restr_b = 0
                for leaf in jax.tree_util.tree_leaves(inp):
                    if leaf.ndim < 2:
                        continue
                    loc = list(leaf.shape)
                    loc[-2] //= gy
                    loc[-1] //= gx
                    bpe = 1 if leaf.dtype == np.bool_ else leaf.dtype.itemsize
                    blk = int(np.prod(loc)) * bpe
                    if gy > 1:
                        halo_b += 2 * h * (blk // loc[-2])
                    if gx > 1:
                        halo_b += 2 * h * (blk // loc[-1])
                    # concat materializes the widened block once per
                    # exchanged axis
                    restr_b += 2 * blk
                row["decomposition"] = {
                    "ms_selfperm_control": round(dt_id * 1e3, 2),
                    "restructure_ms": round((dt_id - dt0) * 1e3, 2),
                    "transport_ms": round((dt - dt_id) * 1e3, 2),
                    "halo_transport_bytes_per_dev": int(halo_b),
                    "restructure_bytes_per_dev": int(restr_b),
                    "predicted_ici_transport_ms": round(
                        halo_b / 4.5e10 * 1e3, 4),
                    "note": ("restructure is a jnp-fallback-path "
                             "artifact (full-block concat per operand "
                             "per axis); the TPU fused path exchanges "
                             "packed strips only, so its predicted "
                             "transport rides ICI at "
                             "halo_transport_bytes/45GBps — see "
                             "AOT weak_scaling_model rows"),
                }
        else:
            row["weak_scaling_efficiency"] = round(pps / (base_pps * n), 4)
            if not on_tpu:
                row["caveat"] = ("wall-clock on a virtual CPU mesh: "
                                 "devices contend for host cores; use "
                                 "--artifact for the meaningful record")
        rows.append(row)
        print(json.dumps(row), flush=True)

    if args_ns.artifact:
        import os
        doc = {"note": ("virtual-CPU-mesh record of what IS measurable "
                        "without multi-chip hardware: communication + "
                        "seam overhead vs a contention-matched no-comm "
                        "control, and the compiled collective structure. "
                        "Real-slice byte/placement audit: AOT_r04.json."),
               "platform": jax.devices()[0].platform,
               "host_cores": os.cpu_count(),
               "rows": rows}
        with open(args_ns.artifact, "w") as fh:
            json.dump(doc, fh, indent=1)
        print("wrote", args_ns.artifact)


if __name__ == "__main__":
    main()
