"""Halo/compute overlap audit for the sharded fused pipeline.

Only one physical TPU chip is attached here, so multi-chip *execution*
cannot be measured.  This tool produces the two strongest pieces of
evidence available short of hardware:

1. **Structural independence (backend-free)** — trace the overlap-mode
   shard_map body to a jaxpr and verify by reachability that the
   interior fused kernel (`pallas_call` over the full local block)
   consumes NO value derived from a `ppermute`: any latency-hiding
   scheduler is then free to run it concurrently with the seam
   exchange.  Only the 8-row seam-strip kernels may depend on the
   collective.

2. **TPU schedule (AOT, v5e:2x2 topology)** — compile the same program
   ahead-of-time for a real 4-chip v5e topology
   (`jax.experimental.topologies`) and scan the optimized, scheduled
   HLO: the halo exchange must lower to async
   `collective-permute-start/done` pairs, and at least one interior
   Mosaic kernel (`tpu_custom_call`) must be scheduled *between* a
   start and its matching done — i.e. the XLA latency-hiding scheduler
   actually overlapped the ICI transfer with interior compute.

Prints one JSON line per check plus a summary verdict.

Reference anchor: the upstream library has no distributed backend at all
(SURVEY.md §2.7); this subsystem is the TPU-native replacement for its
stencil edge handling (FieldCalculations.cc:59-74 fillEdges) at scale.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def _abstract_leaves(mesh, nlev, ny, nx):
    """ShapeDtypeStruct leaves (flat pipeline args) sharded over mesh."""
    import jax
    from jax.sharding import NamedSharding
    from mi_fieldcalc_tpu.parallel.mesh import partition_spec

    def sds(shape, dtype, ndim):
        return jax.ShapeDtypeStruct(
            shape, dtype, sharding=NamedSharding(mesh, partition_spec(ndim, mesh)))

    f32 = np.float32
    g3 = (nlev, ny, nx)
    g2 = (ny, nx)
    leaves = []
    for _ in range(4):                       # tk, q, u, v
        leaves += [sds(g3, f32, 3), sds(g3, np.bool_, 3)]
    leaves += [sds(g2, f32, 2), sds(g2, np.bool_, 2)]        # ps
    leaves += [sds((nlev,), f32, 1), sds((nlev,), f32, 1)]   # alevel, blevel
    leaves += [sds(g2, f32, 2)] * 3                          # xmapr, ymapr, fc
    return tuple(leaves)


def check_jaxpr_independence(nlev=4, ny=64, nx=256, gy=4, gx=1):
    """Interior pallas_call must not (transitively) read ppermute output."""
    import jax
    from mi_fieldcalc_tpu.parallel.fused import _sharded_fn_overlap
    from mi_fieldcalc_tpu.parallel.mesh import grid_mesh

    # abstract trace only — use the host CPU devices for the mesh even
    # when the TPU backend is primary (works with 1 physical chip)
    mesh = grid_mesh((1, gy, gx), devices=jax.devices("cpu")[:gy * gx])
    fn = _sharded_fn_overlap(mesh, (ny, nx), False)
    leaves = _abstract_leaves(mesh, nlev, ny, nx)
    jaxpr = jax.make_jaxpr(fn)(leaves)

    # walk into the shard_map body (it sits under the outer jit eqn)
    def find_inner(jxp):
        for eqn in jxp.eqns:
            if eqn.primitive.name == "shard_map":
                b = eqn.params["jaxpr"]
                return b.jaxpr if hasattr(b, "jaxpr") else b
        for eqn in jxp.eqns:
            for v in eqn.params.values():
                sub = getattr(v, "jaxpr", v)
                if hasattr(sub, "eqns"):
                    r = find_inner(sub)
                    if r is not None:
                        return r
        return None

    inner = find_inner(jaxpr.jaxpr)
    assert inner is not None, "no shard_map eqn found"

    pallas = []              # (out_rows, reads_tainted)

    def walk(jxp, tainted):
        """Propagate ppermute taint through ``jxp``; record pallas_calls.
        Returns the set of tainted outvars of ``jxp``."""
        tainted = set(tainted)
        for eqn in jxp.eqns:
            reads = any(hasattr(v, "count") and v in tainted
                        for v in eqn.invars)
            sub = eqn.params.get("jaxpr")
            sub = getattr(sub, "jaxpr", sub) if sub is not None else None
            if eqn.primitive.name == "pallas_call":
                # (rows, cols) extent of the first >=2-D output: the
                # interior kernel covers the whole local block; y-seam
                # strips are 8 rows, x-seam strips <= 128+ragged lanes
                shp = [ov.aval.shape for ov in eqn.outvars
                       if len(ov.aval.shape) >= 2]
                pallas.append((shp[0][-2:] if shp else (0, 0), reads))
                if reads:
                    tainted.update(eqn.outvars)
            elif sub is not None and hasattr(sub, "eqns"):
                tin = {si for si, oi in zip(sub.invars, eqn.invars)
                       if hasattr(oi, "count") and oi in tainted}
                tout = walk(sub, tin)
                tainted.update(ov for ov, so in zip(eqn.outvars, sub.outvars)
                               if hasattr(so, "count") and so in tout)
            elif eqn.primitive.name == "ppermute" or reads:
                tainted.update(eqn.outvars)
        return {v for v in jxp.outvars if hasattr(v, "count") and v in tainted}

    walk(inner, set())

    assert pallas, "no pallas_call in the shard_map body"
    ny_loc, nx_loc = ny // gy, nx // gx
    # x-seam strips span all local rows but <= 130 lanes; pick audit
    # shapes with nx_loc > 130 so the classification is unambiguous
    assert gx == 1 or nx_loc > 130, "audit shape too narrow to classify"
    is_interior = [rc[0] >= ny_loc and rc[1] >= nx_loc for rc, _ in pallas]
    interior = [p for p, it in zip(pallas, is_interior) if it]
    strips = [p for p, it in zip(pallas, is_interior) if not it]
    ok = (interior and all(not reads for _, reads in interior)
          and all(reads for _, reads in strips))
    res = {
        "check": "jaxpr_independence", "mesh": [1, gy, gx],
        "interior_kernels": len(interior),
        "interior_reads_collective": any(r for _, r in interior),
        "strip_kernels": len(strips),
        "strips_read_collective": all(r for _, r in strips) if strips else None,
        "ok": bool(ok),
    }
    print(json.dumps(res), flush=True)
    return res


def check_tpu_schedule(nlev=8, ny=384, nx=1024, gy=4, gx=1,
                       topology="v5e:2x2"):
    """AOT-compile for a 4-chip v5e and scan the scheduled HLO."""
    import jax
    from jax.experimental import topologies
    from jax.sharding import Mesh
    from mi_fieldcalc_tpu.parallel.fused import _sharded_fn_overlap

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name=topology)
    devs = np.asarray(topo.devices[:gy * gx]).reshape(1, gy, gx)
    mesh = Mesh(devs, ("lev", "gy", "gx"))
    fn = _sharded_fn_overlap(mesh, (ny, nx), False)
    leaves = _abstract_leaves(mesh, nlev, ny, nx)
    compiled = fn.lower(leaves).compile()
    hlo = compiled.as_text()

    import re
    lines = hlo.splitlines()
    # schedule scan (scheduled HLO lists instructions in execution
    # order): does a Mosaic kernel sit between a collective-permute-start
    # and its done?  Match opcodes at the definition position only —
    # consumer lines mention result names like %collective-permute-done.3.
    op_start = re.compile(r"collective-permute-start\(")   # opcode+args
    op_done = re.compile(r"collective-permute-done\(")
    op_kernel = re.compile(r'custom_call_target="tpu_custom_call"')
    starts, dones, kernels, overlapped = 0, 0, 0, 0
    open_starts = 0
    for ln in lines:
        if op_done.search(ln):
            dones += 1
            open_starts = max(open_starts - 1, 0)
        elif op_start.search(ln):
            starts += 1
            open_starts += 1
        elif op_kernel.search(ln):
            kernels += 1
            if open_starts > 0:
                overlapped += 1
    res = {
        "check": "tpu_schedule", "topology": topology,
        "collective_permute_start": starts, "done": dones,
        "mosaic_kernels": kernels,
        "kernels_inside_start_done_window": overlapped,
        "ok": bool(starts and dones and overlapped > 0),
    }
    print(json.dumps(res), flush=True)
    return res, hlo


def main():
    import os
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=8")
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    on_tpu = jax.devices()[0].platform == "tpu"

    if not on_tpu:
        jax.config.update("jax_platforms", "cpu")
    r1 = check_jaxpr_independence()
    r1b = check_jaxpr_independence(ny=64, nx=768, gy=2, gx=2)

    ok2 = True               # vacuous off-TPU / when AOT is unavailable
    if on_tpu:
        for gy, gx, tag in ((4, 1, "v5e_2x2"), (2, 2, "v5e_2x2_gx2")):
            try:
                r2, hlo = check_tpu_schedule(gy=gy, gx=gx)
                ok2 = ok2 and bool(r2["ok"])
                with open(f"/root/repo/.hlo_overlap_{tag}.txt", "w") as f:
                    f.write(hlo)
            except Exception as e:  # topology AOT not available everywhere
                print(json.dumps({"check": "tpu_schedule", "ok": None,
                                  "mesh": [1, gy, gx],
                                  "error": f"{type(e).__name__}: {e}"}),
                      flush=True)
    print(json.dumps({"check": "summary",
                      "ok": bool(r1["ok"] and r1b["ok"] and ok2)}),
          flush=True)


if __name__ == "__main__":
    main()
