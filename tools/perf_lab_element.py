"""Perf lab: Element-indexed (overlapping) stencil windows in the fused kernel.

Today each stencil operand is fetched three times per grid step — the
(1, TY, nx) center block plus two 8-row halo blocks — because Blocked
indexing cannot overlap.  ``pl.Element`` windows (jax 0.9) let the index
map return *element* offsets, so one (TY+4, nx) window per operand can
replace all three fetches.  Expected saving: the 8-row f32 halo blocks
round to (8,1024) DMAs and the i8 ones to (32,1024); an overlapping
window touches at most one extra 8/32-row tile instead of two.

Stage 1 (this file, --probe): semantics probe — what does the kernel see
at array edges with padding=(2,2), and does Mosaic/the pipeline emitter
accept Element windows under PrefetchScalarGridSpec with a mix of
Element and Blocked operands?

Stage 2 (--ab): same-process A/B of the fused pipeline with
MF_FUSED_ELEMENT=0/1 (correctness + queue-drain timing).
"""

import argparse
import functools
import os
import sys

sys.path.insert(0, "/root/repo")


def probe():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ny, nx = 32, 256
    TY = 8

    def kern(off_ref, xw_ref, y_ref, o_ref, ow_ref):
        # copy the window through so we can inspect what was fetched
        ow_ref[...] = xw_ref[...]
        o_ref[...] = xw_ref[4:TY + 4] + y_ref[0]

    jy = ny // TY
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(jy,),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(TY + 8, (4, 4)), pl.Element(nx)),
                lambda j, off: (j * TY - 4, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TY, nx), lambda j, off: (0, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TY, nx), lambda j, off: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TY + 8, nx), lambda j, off: (j, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    f = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((ny, nx), jnp.float32),
                   jax.ShapeDtypeStruct((jy * (TY + 8), nx), jnp.float32)),
    )
    x = jnp.arange(ny * nx, dtype=jnp.float32).reshape(ny, nx)
    y = jnp.ones((1, ny, nx), jnp.float32)
    off = jnp.zeros(1, jnp.int32)
    out, win = f(off, x, y)
    out, win = np.asarray(out), np.asarray(win)
    exp = np.asarray(x) + 1
    print("center rows exact:", np.array_equal(out, exp))
    w0 = win[:TY + 8]
    print("first window rows 2..4 == x rows 0..2:",
          np.array_equal(w0[4:7], np.asarray(x)[0:3]))
    print("first window rows 0..3 (padded region):",
          w0[:4, :2].ravel())
    wl = win[-(TY + 8):]
    print("last window rows TY+4.. (padded region):",
          wl[-4:, :2].ravel())
    print("last window row TY+1 == x row ny-1:",
          np.array_equal(wl[TY + 3], np.asarray(x)[ny - 1]))


def ab(iters=30):
    # CONCLUDED (PERF.md "Dead ends"): the --probe stage showed Mosaic
    # requires Element offsets divisible by the sublane tiling (8 for
    # f32), so the smallest legal overlap window fetches exactly the
    # same 64 rows the 8-row halo-block scheme does — an Element-window
    # kernel variant was therefore never built, and this A/B stage has
    # nothing to compare.
    raise SystemExit(
        "perf_lab_element --ab: no Element-window kernel variant exists "
        "(the probe proved it cannot beat the halo-block scheme; see "
        "PERF.md 'Dead ends' and this file's comments)")
    import time

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np

    from __graft_entry__ import _example_inputs
    from mi_fieldcalc_tpu.ops import fused

    NLEV, NY, NX = 32, 719, 929
    args = jax.device_put(_example_inputs(NLEV, NY, NX))

    def run(element):
        return fused.derived_fields_fused(*args, element=element)

    def qtime(fn, iters):
        out = fn()
        float(out.tfp.values[0, 0, 0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        float(out.tfp.values[0, 0, 0])
        return (time.perf_counter() - t0) / iters

    ref = run(False)
    new = run(True)
    for name in ("p", "th", "rh", "td", "the", "duc", "ws", "vo", "dv",
                 "ad", "gt", "tfp"):
        a, b = getattr(ref, name), getattr(new, name)
        mask_eq = bool((a.mask == b.mask).all())
        va = np.asarray(a.values)[np.asarray(a.mask)]
        vb = np.asarray(b.values)[np.asarray(b.mask)]
        val_eq = np.allclose(va, vb, rtol=2e-5, atol=1e-6)
        bit_eq = np.array_equal(va, vb)
        print(f"{name:4s} mask_eq={mask_eq} val_allclose={val_eq} "
              f"bit={bit_eq}")

    for _ in range(2):
        t0 = qtime(lambda: run(False), iters)
        t1 = qtime(lambda: run(True), iters)
        print(f"blocked {t0 * 1e3:.2f} ms   element {t1 * 1e3:.2f} ms")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", action="store_true")
    ap.add_argument("--ab", action="store_true")
    a = ap.parse_args()
    if a.probe:
        probe()
    if a.ab:
        ab()
