"""Host-side cost of aligned ingest (round 5, VERDICT r4 item 1).

The aligned-ingest production path buys ~10% device throughput by
re-gridding ragged producer grids once at staging (PERF.md "Aligned
ingest"); this lab prices the host side of that trade on the
operational 4-stack step (32x719x929 + ps):

  pad        - decode_pad_batch (the align=False staging pass)
  np-resample- ingest.resample_align per stack + decode (the numpy
               fallback path)
  native     - mf_decode_resample_batch (ABI v6 fused pass: decode +
               mask-aware bilinear in one parallel region)

Host-only (no device); run while nothing else owns the cores.

Usage: python tools/perf_lab_ingest.py [--iters 5]
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

NLEV, NY, NX = 32, 719, 929


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    a = ap.parse_args()

    from mi_fieldcalc_tpu import native
    from mi_fieldcalc_tpu.ingest import aligned_target, resample_align

    rng = np.random.default_rng(0)
    stacks = [rng.uniform(200.0, 300.0, (NLEV, NY, NX)).astype(np.float32)
              for _ in range(4)]
    for s in stacks:
        s[:, NY // 3, NX // 3] = 1e35
    ny_t, nx_t = aligned_target(NY, NX)
    print(f"native codec: {native.available()}  "
          f"({NLEV}x{NY}x{NX} x4 -> {ny_t}x{nx_t})")

    def t(fn):
        fn()                                  # warm (buffers, pool)
        t0 = time.perf_counter()
        for _ in range(a.iters):
            fn()
        return (time.perf_counter() - t0) / a.iters

    out_p = np.empty((4, NLEV, ny_t, nx_t), np.float32)
    msk_p = np.empty((4, NLEV, ny_t, nx_t), np.uint8)
    t_pad = t(lambda: native.decode_pad_batch(stacks, ny_t, nx_t,
                                              out=out_p, mask=msk_p))

    t_np = t(lambda: [native.decode(resample_align(s, 1e35))
                      for s in stacks])

    dense = [s.copy() for s in stacks]
    for s in dense:
        s[:, NY // 3, NX // 3] = 250.0   # no undefs: separable 1-pass
    t_np_dense = t(lambda: [native.decode(resample_align(s, 1e35))
                            for s in dense])

    t_nat = t(lambda: native.decode_resample_batch(
        stacks, ny_t, nx_t, out=out_p, mask=msk_p))

    gb = 4 * NLEV * NY * NX * 4 / 1e9
    print(f"pad (align=False):    {t_pad*1e3:7.1f} ms "
          f"({gb/t_pad:5.1f} GB/s in)")
    print(f"numpy resample+decode:{t_np*1e3:7.1f} ms "
          f"(dense stacks {t_np_dense*1e3:7.1f} ms — separable 1-pass)")
    print(f"native fused resample:{t_nat*1e3:7.1f} ms "
          f"({t_np/t_nat:4.1f}x vs numpy, "
          f"{t_nat/t_pad:4.2f}x the plain pad pass)")


if __name__ == "__main__":
    main()
