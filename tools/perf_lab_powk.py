"""In-kernel pow cost A/B (round 5, VERDICT r4 item 4).

Round 4 measured the exp∘log deterministic pow at 9% of flagship-kernel
step time and rejected it (PERF.md "In-kernel pow").  Round 5 ships the
narrow-domain ``_libm.pow_posc_f32`` in BOTH tiers (bitwise kernel ==
jnp on pow ops); this lab prices it against the round-4 hardware pow
(``MF_KERNEL_POW_HW=1``) with interleaved same-process rounds on the
32x719x929 production shape — the only honest comparison on a chip
whose bandwidth drifts minute-to-minute (CLAUDE.md).

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
       python tools/perf_lab_powk.py [--rounds 3] [--iters 30] [--cpu]
"""
import argparse
import importlib
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, __file__.rsplit("/", 2)[0])

NLEV, NY, NX = 32, 719, 929


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--nlev", type=int, default=NLEV)
    ap.add_argument("--ny", type=int, default=NY)
    ap.add_argument("--nx", type=int, default=NX)
    a = ap.parse_args()

    import jax
    if a.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _example_inputs
    from mi_fieldcalc_tpu import pad_array, pad_field
    from mi_fieldcalc_tpu.field import Field
    from tools.timing import make_dispatch_probe, select_uncongested

    raw = _example_inputs(a.nlev, a.ny, a.nx)
    args = jax.device_put(tuple(
        pad_field(x) if isinstance(x, Field) else
        (pad_array(x) if x.ndim == 2 else x) for x in raw))

    def build(hw: bool):
        # MF_KERNEL_POW_HW is read at trace time inside the kernel body;
        # reload the module so its jit cache cannot serve the other
        # variant's executable (same pattern as perf_lab_modstall_warm)
        if hw:
            os.environ["MF_KERNEL_POW_HW"] = "1"
        else:
            os.environ.pop("MF_KERNEL_POW_HW", None)
        import mi_fieldcalc_tpu.ops.fused as fused
        importlib.reload(fused)
        import functools
        return functools.partial(fused.derived_fields_fused,
                                 global_shape=(a.ny, a.nx), stacked=True,
                                 interpret=a.cpu)

    def qtime(fn, iters):
        out = fn(*args)
        float(out.values[0, 0, 0, 0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(out.values[0, 0, 0, 0])
        return (time.perf_counter() - t0) / iters

    disp = make_dispatch_probe()
    # value check once: variants agree inside the fused-vs-jnp contract
    s_new = build(False)
    o_new = s_new(*args)
    v_new = np.asarray(o_new.values)
    s_hw = build(True)
    o_hw = s_hw(*args)
    d = np.abs(v_new - np.asarray(o_hw.values))
    rel = d / np.maximum(np.abs(v_new), 1e-6)
    print(f"variant agreement: max rel {np.nanmax(rel):.2e} "
          f"(contract 2e-5-class)", flush=True)

    rows = []
    for r in range(a.rounds):
        d0 = disp()
        s_new = build(False)
        t_new = qtime(s_new, a.iters)
        s_hw = build(True)
        t_hw = qtime(s_hw, a.iters)
        # second leg reversed: drift between the two legs cancels in
        # the round average
        s_hw2 = build(True)
        t_hw2 = qtime(s_hw2, a.iters)
        s_new2 = build(False)
        t_new2 = qtime(s_new2, a.iters)
        d1 = disp()
        tn = (t_new + t_new2) / 2
        th = (t_hw + t_hw2) / 2
        rows.append((max(d0, d1), tn, th))
        print(f"round {r}: disp {max(d0, d1)*1e3:5.2f} ms | "
              f"pow_posc {tn*1e3:6.2f}  hw {th*1e3:6.2f} ms/step  "
              f"cost {(tn / th - 1) * 100:+.1f}%", flush=True)
    os.environ.pop("MF_KERNEL_POW_HW", None)

    ok, dmin, _ = select_uncongested(rows)
    tn = min(r[1] for r in ok)
    th = min(r[2] for r in ok)
    print(f"best uncongested ({len(ok)}/{len(rows)} rounds, disp "
          f"{dmin*1e3:.2f} ms): pow_posc {tn*1e3:.2f} ms  hw "
          f"{th*1e3:.2f} ms  cost {(tn / th - 1) * 100:+.1f}% "
          f"(budget: <=5%)")


if __name__ == "__main__":
    main()
