"""Perf lab: decompose the fused kernel's DMA cost into per-grid-step
and per-buffer(chunk) overheads with x+1 Pallas probes at fixed bytes.

All probes stream the SAME 32x719x929 f32 array in and out; only the
grid/block/buffer structure varies.  Compare probe times to the XLA x+1
baseline: the delta at equal bytes is pure pipelining overhead.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_lab_dma.py
"""
import functools
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NLEV, NY, NX = 32, 719, 929


def qtime(fn, probe, iters=30, reps=2):
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


def probe(o):
    o = o[0] if isinstance(o, (tuple, list)) else o
    return float(o[0, 0, 0])


def pallas_add1(ty, nbuf):
    """x+1 with the fused kernel's block structure: grid (jy, nlev),
    (1, ty, NX) blocks, `nbuf` input buffers + `nbuf` outputs (each
    input passed nbuf times; only out[0] is checked)."""
    jy = -(-NY // ty)

    def kern(*refs):
        ins, outs = refs[:nbuf], refs[nbuf:]
        for i, o in zip(ins, outs):
            o[0] = i[0] + 1.0

    spec = pl.BlockSpec((1, ty, NX), lambda j, lev: (lev, j, 0),
                        memory_space=pltpu.VMEM)
    f32 = jax.ShapeDtypeStruct((NLEV, NY, NX), jnp.float32)
    call = pl.pallas_call(
        kern,
        grid=(jy, NLEV),
        in_specs=[spec] * nbuf,
        out_specs=tuple([spec] * nbuf) if nbuf > 1 else spec,
        out_shape=tuple([f32] * nbuf) if nbuf > 1 else f32,
    )

    @jax.jit
    def run(x):
        return call(*([x] * nbuf))

    return run


def pallas_add1_flat(x):
    """one grid step per level, full-level (ny, nx) blocks."""
    spec = pl.BlockSpec((1, NY, NX), lambda lev: (lev, 0, 0),
                        memory_space=pltpu.VMEM)

    def kern(i, o):
        o[0] = i[0] + 1.0

    return pl.pallas_call(
        kern, grid=(NLEV,), in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((NLEV, NY, NX), jnp.float32))(x)


def main():
    x = jax.device_put(jnp.ones((NLEV, NY, NX), jnp.float32))
    gb = 2 * 4 * x.size / 1e9

    add1 = jax.jit(lambda v: v + 1.0)
    t = qtime(lambda: add1(x), probe)
    print(f"XLA x+1                         : {t*1e3:7.3f} ms "
          f"({gb/t:.0f} GB/s)")

    t = qtime(functools.partial(pallas_add1_flat, x), probe)
    print(f"pallas grid(32) full-lev blocks : {t*1e3:7.3f} ms  "
          f"(32 steps, 2 chunks/step)")

    for ty, nbuf in ((48, 1), (48, 6), (48, 12), (48, 24),
                     (32, 1), (96, 1), (96, 12)):
        jy = -(-NY // ty)
        try:
            fn = pallas_add1(ty, nbuf)
            t = qtime(lambda: fn(x), probe)
            print(f"pallas TY={ty:3d} bufs={2*nbuf:3d}        : "
                  f"{t*1e3:7.3f} ms  ({jy*NLEV} steps, "
                  f"{2*nbuf} chunks/step, {gb*nbuf:.1f} GB)")
        except Exception as e:
            print(f"pallas TY={ty:3d} bufs={2*nbuf:3d}        : FAILED "
                  f"{type(e).__name__}: {str(e)[:100]}")

    t = qtime(lambda: add1(x), probe)
    print(f"XLA x+1 recheck                 : {t*1e3:7.3f} ms "
          f"({gb/t:.0f} GB/s)")


if __name__ == "__main__":
    main()
