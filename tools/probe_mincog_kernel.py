"""Probe: do tanh / while_loop-with-scalar-cond / isnan lower through
Mosaic on this backend?  De-risks the fused MINCOG kernel design.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_mincog_kernel.py
"""
import functools

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

_f32 = jnp.float32


def kernel(decay_ref, c0_ref, a_ref, o_ref):
    c0 = c0_ref[...]
    a = a_ref[...]

    # while_loop, scalar cond from an any() reduction, tanh in body
    def cond(state):
        c, done, j = state
        return jnp.logical_and(j < 100, ~jnp.all(done != 0))

    def body(state):
        c, done, j = state
        c_new = c0 * jnp.tanh(a / c)
        err = jnp.abs(c_new - c)
        done2 = done | (err <= _f32(1e-5)).astype(jnp.int32)
        return jnp.where(done != 0, c, c_new), done2, j + 1

    c, done, j = jax.lax.while_loop(
        cond, body, (jnp.ones_like(c0), jnp.zeros_like(c0, jnp.int32),
                     jnp.int32(0)))

    # SMEM scalar-prefetch indexing inside fori (vertical_fused pattern)
    def hbody(k, acc):
        return acc + decay_ref[k] * c

    acc = jax.lax.fori_loop(0, 5, hbody, jnp.zeros_like(c))
    # isnan via x != x selects
    bad = acc != acc
    o_ref[...] = jnp.where(bad, _f32(0.0), acc)


def main():
    ny, nx = 64, 256
    rng = np.random.default_rng(0)
    c0 = jnp.asarray(rng.uniform(1.0, 20.0, (ny, nx)), _f32)
    a = jnp.asarray(rng.uniform(0.5, 50.0, (ny, nx)), _f32)
    decay = jnp.asarray([1.0, 0.8, 0.6, 0.4, 0.2], _f32)

    spec = pl.BlockSpec((8, 128), lambda y, x, *_: (y, x),
                        memory_space=pltpu.VMEM)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(ny // 8, nx // 128),
        in_specs=[spec, spec], out_specs=spec)
    run = pl.pallas_call(
        kernel, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((ny, nx), _f32))
    out = jax.jit(run)(decay, c0, a)
    out_i = pl.pallas_call(
        kernel, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((ny, nx), _f32),
        interpret=True)(decay, c0, a)
    d = np.abs(np.asarray(out) - np.asarray(out_i))
    print("max |tpu - interpret|:", d.max())
    print("OK")


if __name__ == "__main__":
    main()
