"""Perf lab: native batch staging vs per-field codec calls.

Times the host boundary of a production step on the operational stack
(4 input fields of 32x719x929 + 12 outputs): per-field mf_decode_pad
calls (one thread-team spawn each, ABI v2 behavior) vs ONE
mf_decode_pad_batch on the persistent pool (ABI v3), plus the
encode_trim side, and numpy reference passes.

Usage: python tools/perf_lab_staging.py   (host-only; the streaming
section forces the CPU backend so host codec vs compute overlap is
measurable — on the tunneled TPU the link transfer dominates instead)
"""
import os
import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from mi_fieldcalc_tpu import native
from mi_fieldcalc_tpu.field import UNDEF

NLEV, NY, NX = 32, 719, 929


def timeit(fn, reps=7):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    assert native.available()
    rng = np.random.default_rng(0)
    fields = []
    for _ in range(4):
        v = rng.normal(275.0, 20.0, (NLEV, NY, NX)).astype(np.float32)
        v[rng.uniform(size=v.shape) < 0.02] = np.float32(UNDEF)
        fields.append(v)
    gb = 4 * v.nbytes / 1e9

    t = timeit(lambda: [native.decode_pad(f) for f in fields])
    print(f"decode_pad x4 (per-field): {t*1e3:7.2f} ms  {gb/t:6.1f} GB/s in")

    out = np.empty((4, NLEV, 720, 1024), np.float32)
    msk = np.empty_like(out, dtype=np.uint8)
    t = timeit(lambda: native.decode_pad_batch(fields, out=out, mask=msk))
    print(f"decode_pad_batch (pool):   {t*1e3:7.2f} ms  {gb/t:6.1f} GB/s in")

    os.environ["MF_NATIVE_POOL"] = "0"
    t = timeit(lambda: native.decode_pad_batch(fields, out=out, mask=msk))
    print(f"decode_pad_batch (spawn):  {t*1e3:7.2f} ms  {gb/t:6.1f} GB/s in")
    os.environ.pop("MF_NATIVE_POOL")

    # LEV-packed staging (ABI v5): same values block, masks as ONE
    # uint32 bit-plane per field instead of NLEV uint8 planes — the
    # mask payload shipped to the device drops NLEV/4 = 8x at nlev=32
    lp_out = np.empty((4, NLEV, 720, 1024), np.float32)
    lp_pm = np.empty((4, 720, 1024), np.uint32)
    t = timeit(lambda: native.decode_pad_levpack_batch(
        fields, out=lp_out, pmask=lp_pm))
    mask_mb = (4 * NLEV * 720 * 1024) / 1e6
    lp_mb = lp_pm.nbytes / 1e6
    print(f"decode_pad_levpack_batch:  {t*1e3:7.2f} ms  {gb/t:6.1f} GB/s in"
          f"  (mask payload {mask_mb:.0f} -> {lp_mb:.0f} MB)")

    t = timeit(lambda: [np.where(~np.isnan(f) & (f != np.float32(UNDEF)),
                                 f, 0.0) for f in fields])
    print(f"numpy 2-pass (no pad):     {t*1e3:7.2f} ms")

    # output side: 12 padded planes back to sentinel
    vals = np.broadcast_to(out[0], (12,) + out[0].shape).copy()
    masks = np.broadcast_to(msk[0], vals.shape).copy()
    gbo = vals.nbytes / 1e9
    t = timeit(lambda: native.encode_trim_batch(vals, masks, NY, NX))
    print(f"encode_trim_batch x12:     {t*1e3:7.2f} ms  {gbo/t:6.1f} GB/s")
    t = timeit(lambda: [native.encode_trim(vals[i], masks[i], NY, NX)
                        for i in range(12)])
    print(f"encode_trim x12 per-field: {t*1e3:7.2f} ms  {gbo/t:6.1f} GB/s")
    # LEV-packed device masks (the kernel's levpack_masks output): 9
    # uint32 planes instead of 9 x NLEV int8 — the mask FETCH payload
    # drops NLEV/4 = 8x; the encode consumes the bit-planes in place
    bits = (np.uint32(1) << np.arange(NLEV, dtype=np.uint32))[:, None, None]
    plane = (msk[0].astype(np.uint32) * bits).sum(0, dtype=np.uint32)
    pm9 = np.ascontiguousarray(np.broadcast_to(plane, (9,) + plane.shape))
    m9 = [0, 1, 2, 2, 3, 3, 4, 5, 5, 6, 7, 8]      # MASK9
    t = timeit(lambda: native.encode_trim_batch(vals, pm9, NY, NX,
                                                mask_map=m9))
    print(f"encode_trim_batch levpack: {t*1e3:7.2f} ms  {gbo/t:6.1f} GB/s")

    # streaming executor: decode(i+1) + encode(i-1) overlap compute(i)
    from mi_fieldcalc_tpu.staging import (run_derived_fields_np,
                                          stream_derived_fields_np)
    nlev2 = 8     # keep the device step short so the host side dominates
    def step_args(seed):
        r = np.random.default_rng(seed)
        g3 = lambda lo, hi: r.uniform(lo, hi, (nlev2, NY, NX)).astype(
            np.float32)
        return (g3(250, 300), g3(1e-4, 1e-2), g3(-25, 25), g3(-25, 25),
                r.uniform(950, 1050, (NY, NX)).astype(np.float32),
                np.linspace(0, 50, nlev2, dtype=np.float32),
                np.linspace(1, .5, nlev2, dtype=np.float32),
                np.full((NY, NX), 4e-7, np.float32),
                np.full((NY, NX), 3.6e-7, np.float32),
                np.full((NY, NX), 1.2e-4, np.float32))

    steps = [step_args(s) for s in range(4)]
    run_derived_fields_np(*steps[0])      # compile outside timing
    t0 = time.perf_counter()
    for s in steps:
        run_derived_fields_np(*s)
    t_serial = (time.perf_counter() - t0) / len(steps)
    t0 = time.perf_counter()
    for _ in stream_derived_fields_np(iter(steps)):
        pass
    t_stream = (time.perf_counter() - t0) / len(steps)
    print(f"serial step:   {t_serial*1e3:7.2f} ms/step")
    print(f"streamed step: {t_stream*1e3:7.2f} ms/step  "
          f"({t_serial/t_stream:.2f}x)")


if __name__ == "__main__":
    main()
