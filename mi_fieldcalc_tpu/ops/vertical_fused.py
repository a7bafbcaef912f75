"""Fused Pallas column kernel for hybrid -> pressure-level interpolation.

:func:`..ops.vertical.plevel_interp` expresses the bracket search and
level selection as one-hot reductions; under XLA + vmap-over-targets the
model-level stack is re-read from HBM once per target (11x the intrinsic
traffic at the standard-level count) and the operational-shape compile
takes ~2 minutes on the remote TPU compiler.  This kernel interpolates
ALL variables to ALL targets in one pass over column blocks:

* the hybrid pressure profile ``p_k = alevel[k] + blevel[k]*ps`` never
  touches HBM — it is rebuilt per level from the ``[nlev]`` coefficient
  vectors (SMEM scalars) and the surface-pressure tile already in VMEM,
  so the bracket search is shared by every variable,
* two ``lax.fori_loop`` passes over levels: pass A counts
  ``cnt_t = #{k : p_k <= target_t}`` (the bracket index, exactly as
  vertical.py:57-61), pass B selects the bracketing values/masks and
  pressures with ``k == k_t`` / ``k == k_t+1`` lane selects — no gathers
  (Mosaic sublane gathers are unsupported), no unrolling (compiles in
  seconds),
* each variable's ``[nlev, TY, CX]`` block is read once and its
  ``[ntarget, TY, CX]`` outputs written once — intrinsic traffic,
* mask semantics identical to vertical.py:82-84: defined where in-range,
  both bracketing levels defined, surface pressure defined, and the
  ln(p)/p bracket is non-degenerate.

The x extent is chunked to ``CX`` lanes so the per-variable level stack
fits VMEM at 137 levels (CX adapts to nlev; see ``_pick_cx``).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field import Field
from ._harness import require

__all__ = ["hlevel_to_plevel_fused"]

_f32 = jnp.float32


def _interp_kernel(nlev, nt, nvar, TY, CX, log_p,
                   a_ref, b_ref, xt_ref, *refs):
    fvals = refs[:nvar]
    fmasks = refs[nvar:2 * nvar]
    ps_ref, psm_ref = refs[2 * nvar], refs[2 * nvar + 1]
    outs = refs[2 * nvar + 2: 3 * nvar + 2]
    omasks = refs[3 * nvar + 2:]

    psv = ps_ref[...]                       # (TY, CX)

    def p_at(k):
        return a_ref[k] + b_ref[k] * psv

    # ---- pass A: bracket count per target (vertical.py:57-58) ------------
    def cnt_body(k, cnt):
        p_k = p_at(k)
        below = jnp.stack([(p_k <= xt_ref[t]).astype(jnp.int32)
                           for t in range(nt)])
        return cnt + below

    cnt = jax.lax.fori_loop(
        0, nlev, cnt_body, jnp.zeros((nt, TY, CX), jnp.int32))
    k0 = jnp.clip(cnt - 1, 0, nlev - 2)     # (nt, TY, CX)
    # mask lanes ride as int32 (Mosaic cannot select/rotate i1 vectors)
    in_range = ((cnt >= 1) & (cnt <= nlev - 1)).astype(jnp.int32)

    # ---- pass B: select bracketing pressures, values, masks --------------
    zf = jnp.zeros((nt, TY, CX), _f32)
    ones = jnp.ones((nt, TY, CX), jnp.int32)
    carry0 = (zf, zf,                        # p0, p1
              tuple(zf for _ in range(nvar)),      # f0 per var
              tuple(zf for _ in range(nvar)),      # f1 per var
              tuple(ones for _ in range(nvar)))    # m[k0]&m[k0+1] per var

    def sel_body(k, carry):
        p0, p1, f0s, f1s, ms = carry
        p_k = p_at(k)[None]
        sel0 = k0 == k
        sel1 = k0 == k - 1
        sel01 = sel0 | sel1
        p0 = jnp.where(sel0, p_k, p0)
        p1 = jnp.where(sel1, p_k, p1)
        nf0, nf1, nm = [], [], []
        for v in range(nvar):
            fk = fvals[v][k][None]
            mk = fmasks[v][k].astype(jnp.int32)[None]
            nf0.append(jnp.where(sel0, fk, f0s[v]))
            nf1.append(jnp.where(sel1, fk, f1s[v]))
            nm.append(ms[v] & jnp.where(sel01, mk, 1))
        return p0, p1, tuple(nf0), tuple(nf1), tuple(nm)

    p0, p1, f0s, f1s, ms = jax.lax.fori_loop(0, nlev, sel_body, carry0)

    # ---- weights + outputs (vertical.py:76-84) ----------------------------
    if log_p:
        x0 = jnp.log(jnp.where(p0 > 0, p0, _f32(1.0)))
        x1 = jnp.log(jnp.where(p1 > 0, p1, _f32(1.0)))
    else:
        x0, x1 = p0, p1
    xt = jnp.stack([jnp.full((TY, CX), xt_ref[t], _f32) for t in range(nt)])
    if log_p:
        xt = jnp.log(xt)
    denom = x1 - x0
    w = (xt - x0) / jnp.where(denom != 0, denom, _f32(1))
    psm = psm_ref[...].astype(jnp.int32)[None]
    base = in_range & psm & (denom != 0).astype(jnp.int32)
    for v in range(nvar):
        outs[v][...] = f0s[v] + (f1s[v] - f0s[v]) * w
        om = (base & ms[v]) != 0
        omasks[v][...] = om if omasks[v].dtype == jnp.bool_ \
            else om.astype(omasks[v].dtype)


def _pick_cx(nlev: int, nx: int, nvar: int, nt: int) -> int:
    """Largest 128-multiple x chunk keeping the whole block set — the
    double-buffered input stacks, the double-buffered outputs, and the
    fori carries — inside the 16 MB scoped-VMEM limit (13 MB budget; the
    first real compile at CX=768 measured 16.12 MB and OOMed)."""
    budget = 13 * 2 ** 20
    per_lane = (2 * nvar * nlev * 8 * 5          # inputs, f32 + i8
                + 2 * nvar * nt * 8 * 5          # outputs, f32 + i8
                + (5 + 3 * nvar) * nt * 8 * 4)   # carries + temps, i32/f32
    cx = (budget // per_lane) // 128 * 128
    return int(max(128, min(cx, -(-nx // 128) * 128, 1024)))


@functools.partial(jax.jit, static_argnames=("targets", "log_p", "interpret"))
def hlevel_to_plevel_fused(fields: Tuple[Field, ...], ps: Field,
                           alevel, blevel, targets: Sequence[float],
                           log_p: bool = True,
                           interpret: bool = False) -> Tuple[Field, ...]:
    """Interpolate several hybrid-level Fields to constant-pressure
    surfaces in one fused pass (equivalent to
    :func:`..ops.vertical.hlevel_to_plevel` per field, same masks).

    Args:
      fields: tuple of ``[nlev, ny, nx]`` Fields sharing the same grid.
      ps: ``[ny, nx]`` surface-pressure Field (hPa).
      alevel, blevel: ``[nlev]`` hybrid coefficients.
      targets: static tuple of target pressures (hPa).

    Returns a tuple of ``[len(targets), ny, nx]`` Fields.
    """
    fields = tuple(fields)
    nvar = len(fields)
    require(nvar >= 1, "hlevel_to_plevel_fused: no fields")
    nlev, ny, nx = fields[0].values.shape
    for f in fields:
        require(f.values.shape == (nlev, ny, nx),
                "hlevel_to_plevel_fused: field shape mismatch")
    targets = tuple(float(t) for t in targets)
    nt = len(targets)
    require(nt >= 1, "hlevel_to_plevel_fused: no targets")

    TY = 8
    CX = _pick_cx(nlev, nx, nvar, nt)
    jy, jx = -(-ny // TY), -(-nx // CX)

    xt = np.asarray(targets, np.float32)

    def im3(y, x, *_):
        return (0, y, x)

    def im2(y, x, *_):
        return (y, x)

    stack3 = pl.BlockSpec((nlev, TY, CX), im3, memory_space=pltpu.VMEM)
    tile2 = pl.BlockSpec((TY, CX), im2, memory_space=pltpu.VMEM)
    out3 = pl.BlockSpec((nt, TY, CX), im3, memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(jy, jx),
        in_specs=[stack3] * nvar + [stack3] * nvar + [tile2, tile2],
        out_specs=tuple([out3] * (2 * nvar)),
    )
    f32_o = jax.ShapeDtypeStruct((nt, ny, nx), jnp.float32)
    # masks cross the Pallas boundary as int8: i1 operands/results lower
    # to i32 buffers with materialized converts on both sides (4x DMA)
    i8_o = jax.ShapeDtypeStruct((nt, ny, nx), jnp.int8)

    outs = pl.pallas_call(
        functools.partial(_interp_kernel, nlev, nt, nvar, TY, CX, log_p),
        grid_spec=grid_spec,
        out_shape=tuple([f32_o] * nvar + [i8_o] * nvar),
        interpret=interpret,
    )(jnp.asarray(alevel, _f32), jnp.asarray(blevel, _f32),
      jnp.asarray(xt),
      *[f.values for f in fields],
      *[f.mask.astype(jnp.int8) for f in fields],
      ps.values, ps.mask.astype(jnp.int8))

    return tuple(Field(outs[v], outs[nvar + v] != 0) for v in range(nvar))
