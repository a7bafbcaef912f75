"""A/B: LEV-packed masks vs the dedup9 int8 stacked layout (VERDICT r2
item 1 lever a) on the padded bench grid, real TPU.

Same-process interleaved rounds; queue-drain timing (CLAUDE.md).
Usage: python tools/perf_lab_levpack.py [--rounds 5] [--iters 30]
"""
import argparse
import functools
import sys
import time

sys.path.insert(0, ".")

NLEV, NY, NX = 32, 719, 929


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--iters", type=int, default=30)
    a = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from __graft_entry__ import _example_inputs
    from mi_fieldcalc_tpu import pad_array, pad_field
    from mi_fieldcalc_tpu.field import Field
    from mi_fieldcalc_tpu.ops.fused import derived_fields_fused

    assert jax.devices()[0].platform == "tpu", "real-TPU lab"

    raw = _example_inputs(NLEV, NY, NX)
    args = jax.device_put(tuple(
        pad_field(x) if isinstance(x, Field) else
        (pad_array(x) if hasattr(x, "ndim") and x.ndim == 2 else x)
        for x in raw))
    sh = jnp.arange(NLEV, dtype=jnp.int32)[:, None, None]
    pm = jax.device_put(tuple(
        (args[i].mask.astype(jnp.int32) << sh).sum(0) for i in range(4)))

    base = functools.partial(derived_fields_fused, global_shape=(NY, NX),
                             stacked=True)
    lev = functools.partial(base, levpack_masks=True,
                            packed_input_masks=pm, ty=40)

    def qtime(fn, iters):
        out = fn(*args)
        float(out.values[0, 0, 0, 0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(out.values[0, 0, 0, 0])
        return (time.perf_counter() - t0) / iters

    qtime(base, 1), qtime(lev, 1)        # compile
    rows = []
    for r in range(a.rounds):
        tb = qtime(base, a.iters)
        tl = qtime(lev, a.iters)
        rows.append((tb, tl))
        print(f"round {r}: dedup9 {tb*1e3:.2f} ms  levpack {tl*1e3:.2f} ms "
              f"({tb/tl:.3f}x)")
    rows.sort(key=lambda x: x[0] / x[1])
    tb, tl = rows[len(rows) // 2]
    print(f"median: dedup9 {tb*1e3:.2f} ms  levpack {tl*1e3:.2f} ms  "
          f"speedup {tb/tl:.3f}x")


if __name__ == "__main__":
    main()
