"""Perf lab: the ALL_DEFINED fast path on the real chip.

derived_fields_fused(all_defined=True) drops 5 input + 7 output int8
mask planes from a DMA-byte-bound kernel.  Accounting on the padded
32x720x1024 layout (int8 blocks bill 32-row sublane tiles): the default
step moves ~1.72 GB, the fast path ~1.43 GB -> ~17% expected.  Measured
back-to-back in one process per CLAUDE.md methodology (bandwidth drifts
run-to-run on the shared chip).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_lab_allmask.py
"""
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import functools

from __graft_entry__ import _example_inputs
from mi_fieldcalc_tpu import pad_array, pad_field
from mi_fieldcalc_tpu.field import Field
from mi_fieldcalc_tpu.ops.fused import derived_fields_fused

NLEV, NY, NX = 32, 719, 929


from tools.timing import qtime  # noqa: E402


def main():
    raw = _example_inputs(NLEV, NY, NX)
    args = jax.device_put(tuple(
        pad_field(a) if isinstance(a, Field) else
        (pad_array(a) if a.ndim == 2 else a)
        for a in raw))

    base = functools.partial(derived_fields_fused, *args,
                             global_shape=(NY, NX))
    variants = [
        ("stacked (bench default)", dict(stacked=True), True),
        ("stacked all_defined", dict(stacked=True, all_defined=True), True),
        ("per-field", {}, False),
        ("per-field all_defined", dict(all_defined=True), False),
    ]
    for _round in range(3):
        for tag, kw, stk in variants:
            fn = functools.partial(base, **kw)
            probe = ((lambda o: float(o.values[11, 0, 0, 0])) if stk
                     else (lambda o: float(o.tfp.values[0, 0, 0])))
            dt = qtime(fn, probe)
            pts = NLEV * NY * NX
            print(f"{tag:26s}: {dt*1e3:6.3f} ms  "
                  f"({pts/dt/1e9:.2f} Gpts/s)")
        print()


if __name__ == "__main__":
    main()
