"""Perf lab: does lane/sublane padding of the whole pipeline pay?

The fused kernel's traffic accounting bills every (TY, 929) f32 block at
(TY, 1024) tiled bytes (PERF.md).  If the DMA engine bills the same
whether the HBM array is 929- or 1024-lanes wide, padding end-to-end is
a wash; if ragged-minor transfers cost extra (stride descriptors, granule
waste), a 1024-wide pipeline should run measurably faster on identical
logical work.  Same-process back-to-back per CLAUDE.md methodology.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_lab_pad.py
"""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _example_inputs
from mi_fieldcalc_tpu.ops.fused import derived_fields_fused

NLEV, NY, NX = 32, 719, 929


def qtime(fn, probe, iters=30, reps=3):
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


def pad_args(args, ny_p, nx_p):
    """Zero-pad every field/map to (ny_p, nx_p); masks pad False."""
    from mi_fieldcalc_tpu.field import Field

    def pad(a):
        if a.ndim == 3:
            return jnp.pad(a, ((0, 0), (0, ny_p - NY), (0, nx_p - NX)))
        if a.ndim == 2:
            return jnp.pad(a, ((0, ny_p - NY), (0, nx_p - NX)))
        return a

    out = []
    for a in args:
        if isinstance(a, Field):
            out.append(Field(pad(a.values), pad(a.mask)))
        else:
            out.append(pad(a))
    return tuple(out)


def main():
    args = jax.device_put(_example_inputs(NLEV, NY, NX))
    xcal = args[0].values
    add1 = jax.jit(lambda x: x + 1.0)
    cal = qtime(lambda: add1(xcal), lambda o: float(o[0, 0, 0]))
    print(f"x+1 calibration: {cal*1e3:.3f} ms "
          f"({2*4*NLEV*NY*NX/cal/1e9:.0f} GB/s)")

    variants = [("929x719 (status quo)", args, None)]
    for ny_p, nx_p in ((720, 1024),):
        pa = jax.device_put(pad_args(args, ny_p, nx_p))
        variants.append((f"{nx_p}x{ny_p} padded", pa, (ny_p, nx_p)))

    for tag, a, shp in variants:
        try:
            gs = (NY, NX) if shp is not None else None
            fn = lambda: derived_fields_fused(*a, global_shape=gs)
            dt = qtime(fn, lambda o: float(o.tfp.values[0, 0, 0]))
            print(f"{tag:24s}: {dt*1e3:.3f} ms")
        except Exception as e:
            print(f"{tag:24s}: FAILED {type(e).__name__}: {str(e)[:140]}")

    # interleaved recheck of the status quo to bound drift
    dt = qtime(lambda: derived_fields_fused(*args),
               lambda o: float(o.tfp.values[0, 0, 0]))
    print(f"{'status quo recheck':24s}: {dt*1e3:.3f} ms")

    # ---- isobaric pipeline (config 4): interp kernel + fused tail -----
    from functools import partial

    from mi_fieldcalc_tpu.models.pipeline import derived_fields_isobaric

    iso = jax.jit(partial(derived_fields_isobaric, fused=True))
    dt = qtime(lambda: iso(*args), lambda o: float(o.tfp.values[0, 0, 0]))
    print(f"{'isobaric 929x719':24s}: {dt*1e3:.3f} ms")

    pa = jax.device_put(pad_args(args, 720, 1024))
    iso_p = jax.jit(partial(derived_fields_isobaric, fused=True,
                            global_shape=(NY, NX)))
    dt = qtime(lambda: iso_p(*pa), lambda o: float(o.tfp.values[0, 0, 0]))
    print(f"{'isobaric 1024x720 padded':24s}: {dt*1e3:.3f} ms")

    cal2 = qtime(lambda: add1(xcal), lambda o: float(o[0, 0, 0]))
    print(f"x+1 recheck: {cal2*1e3:.3f} ms "
          f"({2*4*NLEV*NY*NX/cal2/1e9:.0f} GB/s)")


if __name__ == "__main__":
    main()
