"""AOT-compile the north-star workload for multi-chip v5e topologies.

BASELINE.json config 5: the full isobaric pipeline (hybrid->pressure
interpolation + 12-output derived-field kernel) on a global 0.25-degree,
137-level grid, domain-decomposed over N chips.  No multi-chip hardware
is attached here, so this tool compiles the exact production program
ahead-of-time for real TPU topologies (`jax.experimental.topologies`)
and reports what the optimized executable looks like: collective count
and placement, per-chip HBM footprint, and compile health.  Execution
on hardware needs only `jax.jit`'s normal path — the program is the
same one tests/test_parallel_fused.py validates numerically on the
8-device CPU mesh.

Grid: 721 x 1440 global, padded per layout.padded_shape_sharded so each
shard's local block is (8,128)-tile aligned; 137 hybrid levels onto 13
standard pressure levels.

Usage::

    python tools/northstar_aot.py [--topology v5e:4x4] [--gy 16] [--gx 1]

``--gx > 1`` audits the 2-D (gy, gx) decomposition: x-halos (radius 2)
join the packed exchange and each shard pays 128-lane x alignment, but
the 8-row y alignment is amortised over fewer gy shards — at 64+ chips
this keeps the live fraction near 0.9 where 1-D gy drops below 0.7
(see PERF.md "Config-5 AOT").
"""

from __future__ import annotations

import argparse
import json
import re
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

NLEV = 137
NY, NX = 721, 1440          # global 0.25 deg
PLEVELS = (1000.0, 925.0, 850.0, 700.0, 600.0, 500.0, 400.0, 300.0,
           250.0, 200.0, 150.0, 100.0, 50.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--topology", default="v5e:4x4")
    ap.add_argument("--gy", type=int, default=0,
                    help="devices on the gy axis (default: all / gx)")
    ap.add_argument("--overlap", action="store_true",
                    help="audit the seam-strip overlap variant (interior "
                         "kernel independent of the halo collectives)")
    ap.add_argument("--all-defined", action="store_true",
                    help="audit the ALL_DEFINED fast path (mask-free "
                         "interp inputs; one shared interp mask strip on "
                         "the halo legs)")
    ap.add_argument("--gx", type=int, default=1,
                    help="devices on the gx axis: a 2-D (gy, gx) "
                    "decomposition pays 128-lane alignment per shard on x "
                    "but 8-row alignment only per gy shard — past ~32 "
                    "chips it wastes far less than 1-D gy on this grid "
                    "(PERF.md)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding
    from mi_fieldcalc_tpu.layout import padded_shape_sharded
    from mi_fieldcalc_tpu.parallel.fused import _isobaric_sharded_fn
    from mi_fieldcalc_tpu.parallel.mesh import partition_spec

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name=args.topology)
    gx = args.gx
    ndev = len(topo.devices)
    if gx < 1 or ndev % gx:
        raise SystemExit(f"--gx {gx} must divide the topology's "
                         f"{ndev} devices ({args.topology})")
    gy = args.gy or ndev // gx
    if gy * gx > ndev:
        raise SystemExit(f"--gy {gy} x --gx {gx} = {gy * gx} devices, but "
                         f"{args.topology} has only {ndev}")
    # Flat enumeration order, not mesh_utils.create_device_mesh: the
    # audit inspects collective structure and byte counts, which do not
    # depend on placement — but it means gy/gx neighbours here are not
    # necessarily ICI-adjacent (production meshes should come from
    # parallel.mesh.grid_mesh, which uses create_device_mesh).  The
    # caveat is echoed in the JSON output as "device_order".
    devs = np.asarray(topo.devices[:gy * gx]).reshape(1, gy, gx)
    mesh = Mesh(devs, ("lev", "gy", "gx"))

    ny_p, nx_p = padded_shape_sharded(NY, NX, gy, gx)
    fn = _isobaric_sharded_fn(mesh, (NY, NX), PLEVELS, False,
                              overlap=args.overlap,
                              all_defined=args.all_defined)

    def sds(shape, dtype, ndim):
        return jax.ShapeDtypeStruct(
            shape, dtype,
            sharding=NamedSharding(mesh, partition_spec(ndim, mesh)))

    f32 = np.float32
    g3, g2 = (NLEV, ny_p, nx_p), (ny_p, nx_p)
    leaves = []
    for _ in range(4):                       # tk, q, u, v
        leaves += [sds(g3, f32, 3), sds(g3, np.bool_, 3)]
    leaves += [sds(g2, f32, 2), sds(g2, np.bool_, 2)]        # ps
    leaves += [sds((NLEV,), f32, 1), sds((NLEV,), f32, 1)]   # a/b level
    leaves += [sds(g2, f32, 2)] * 3                          # maps, coriolis
    leaves = tuple(leaves)

    import time
    t0 = time.perf_counter()
    compiled = fn.lower(leaves).compile()
    dt = time.perf_counter() - t0
    hlo = compiled.as_text()

    starts = len(re.findall(r"collective-permute-start\(", hlo))
    sync_cp = len(re.findall(r"collective-permute\(", hlo))
    kernels = len(re.findall(r'custom_call_target="tpu_custom_call"', hlo))
    ag = len(re.findall(r"all-gather(?:-start)?\(", hlo))
    mem = getattr(compiled, "memory_analysis", lambda: None)()
    per_chip = {}
    if mem is not None:
        per_chip = {
            "argument_mb": round(mem.argument_size_in_bytes / 2**20, 1),
            "output_mb": round(mem.output_size_in_bytes / 2**20, 1),
            "temp_mb": round(mem.temp_size_in_bytes / 2**20, 1),
        }

    # ---- analytic weak-scaling model (VERDICT r4 item 2) -------------
    # Exact per-chip halo wire bytes: sum the operand bytes of every
    # collective-permute in the optimized HLO (each participating chip
    # sends its operand once per instruction).  The regex deliberately
    # matches `collective-permute(` / `collective-permute-start(` but
    # not `-done(`, so async pairs count once.
    dtype_bytes = {"f32": 4, "f64": 8, "bf16": 2, "f16": 2, "s32": 4,
                   "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
                   "pred": 1}
    halo_bytes = 0
    for line in hlo.splitlines():
        if not re.search(r"collective-permute(?:-start)?\(", line):
            continue
        # the instruction's result type precedes the op name; for the
        # async start it is a tuple whose FIRST element is the operand
        # (sent) shape — take the line's first dtype[dims] occurrence
        m = re.search(r"([a-z0-9]+)\[([0-9,]*)\]", line)
        if m is None:
            continue
        n = 1
        for d in m.group(2).split(","):
            if d:
                n *= int(d)
        halo_bytes += n * dtype_bytes.get(m.group(1), 4)
    # Per-chip compute time: this pipeline is DMA-bound (bench.py: every
    # math ablation is a wash), so t_compute = HBM bytes / attained BW.
    # HBM traffic lower bound = arguments read once + outputs written
    # once (temps excluded: VMEM-resident in the fused kernels).
    # Constants: BW_HBM = 5.7e11 B/s, the fastest MEASURED streaming
    # pattern on the bench chip (bench.py structure-matched copy probe;
    # physical peak 819 GB/s is unattained by any measured pattern);
    # W_ICI = 4.5e10 B/s one-way per link (public v5e spec, 2-D torus).
    # Conservative: ALL halo bytes are billed to ONE link serially,
    # although the y/x legs ride different torus axes.
    BW_HBM, W_ICI = 5.7e11, 4.5e10
    model = {}
    if mem is not None:
        compute_bytes = (mem.argument_size_in_bytes
                         + mem.output_size_in_bytes)
        t_compute = compute_bytes / BW_HBM
        t_comm = halo_bytes / W_ICI
        if args.overlap:
            # seam-strip overlap: the interior kernel runs concurrently
            # with the exchange; comm is exposed only past compute
            eff = t_compute / max(t_compute, t_comm)
            formula = ("eff = t_compute / max(t_compute, t_comm) "
                       "[overlapped exchange]")
        else:
            eff = t_compute / (t_compute + t_comm)
            formula = "eff = t_compute / (t_compute + t_comm) [serial]"
        model = {
            "halo_bytes_per_chip_per_step": halo_bytes,
            "compute_bytes_per_chip_per_step": compute_bytes,
            "predicted_compute_ms": round(t_compute * 1e3, 3),
            "predicted_comm_ms": round(t_comm * 1e3, 4),
            "predicted_comm_fraction": round(
                t_comm / (t_comm + t_compute), 4),
            "predicted_efficiency": round(eff, 4),
            "weak_scaling_target_met": bool(eff >= 0.90),
            "assumptions": {
                "bw_hbm_attained_Bps": BW_HBM,
                "w_ici_oneway_per_link_Bps": W_ICI,
                "formula": formula,
                "notes": ("halo bytes exact from optimized-HLO "
                          "collective-permute operands; compute time = "
                          "(args+outputs)/BW on this DMA-bound "
                          "pipeline; all halo bytes billed to one ICI "
                          "link (conservative)"),
            },
        }
    print(json.dumps({
        "workload": "config5_isobaric_global_0.25deg_137L",
        "topology": args.topology, "mesh": [1, gy, gx],
        "overlap": bool(args.overlap),
        "all_defined": bool(args.all_defined),
        "global_grid": [NLEV, NY, NX], "padded": [ny_p, nx_p],
        "live_fraction": round(NY * NX / (ny_p * nx_p), 3),
        "plevels": len(PLEVELS),
        "compile_s": round(dt, 1),
        "collective_permutes_async": starts,
        "collective_permutes_sync": sync_cp, "all_gathers": ag,
        "mosaic_kernels": kernels,
        "per_chip_memory": per_chip,
        "weak_scaling_model": model,
        "device_order": "enumeration (audit only; gy/gx neighbours may "
                        "not be ICI-adjacent — use parallel.mesh.grid_mesh "
                        "for production placement)",
        "ok": bool(kernels >= 2),
    }), flush=True)


if __name__ == "__main__":
    main()
