"""A/B: stacked output masks 12 planes vs 9 deduplicated planes
(td/duc/dv share rh/the/vo) on the padded operational grid.  Same
process, queue-drain timing (CLAUDE.md)."""
import functools
import time

NLEV, NY, NX = 32, 719, 929


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from __graft_entry__ import _example_inputs
    from mi_fieldcalc_tpu import pad_array, pad_field
    from mi_fieldcalc_tpu.field import Field
    from mi_fieldcalc_tpu.ops.fused import derived_fields_fused

    raw = _example_inputs(NLEV, NY, NX)
    args = jax.device_put(tuple(
        pad_field(a) if isinstance(a, Field) else
        (pad_array(a) if a.ndim == 2 else a) for a in raw))

    step12 = functools.partial(derived_fields_fused, global_shape=(NY, NX),
                               stacked=True, dedup_masks=False)
    step9 = functools.partial(derived_fields_fused, global_shape=(NY, NX),
                              stacked=True, dedup_masks=True)

    def qtime(fn, iters=30):
        out = fn(*args)
        float(out.values[0, 0, 0, 0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(out.values[0, 0, 0, 0])
        return (time.perf_counter() - t0) / iters

    qtime(step12, 2); qtime(step9, 2)        # compile outside timing
    for rnd in range(3):
        t12 = qtime(step12)
        t9 = qtime(step9)
        print(f"round {rnd}: 12-plane {t12*1e3:.2f} ms   "
              f"9-plane {t9*1e3:.2f} ms   ratio {t12/t9:.3f}")


if __name__ == "__main__":
    main()
