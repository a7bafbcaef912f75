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
* ONE ``lax.fori_loop`` pass over level pairs: ``p_k`` is monotone in k,
  so the bracket test ``p_k <= t < p_{k+1}`` is *local* and each target
  interpolates in place at its bracketing iteration — no gathers (Mosaic
  sublane gathers are unsupported), no counting pass, no unrolling
  (compiles in seconds),
* the kernel is VPU-bound, and the binding constraint is fori-loop CARRY
  traffic, not vector-op count: the default ``variant="packed"`` packs
  the nvar per-target defined bits into ONE int32 carry plane (7.8 ->
  6.2 ms on the 4-var operational stack; ``carrysel``, which halves the
  selects but carries 3 more planes, measured *slower* — see
  tools/perf_lab_vinterp.py),
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


def _interp_kernel(nlev, nt, nvar, TY, CX, log_p, variant, unroll, allm,
                   a_ref, b_ref, xt_ref, *refs):
    fvals = refs[:nvar]
    if allm:
        # ALL_DEFINED fast path: no input mask planes, no ps mask; the
        # per-var defined bits collapse to the shared bracket gate
        # (in-range & non-degenerate), which stays data-dependent —
        # written once as a single shared output mask plane
        fmasks = psm_ref = None
        ps_ref = refs[nvar]
        outs = refs[nvar + 1: 2 * nvar + 1]
        omasks = refs[2 * nvar + 1:]
    else:
        fmasks = refs[nvar:2 * nvar]
        ps_ref, psm_ref = refs[2 * nvar], refs[2 * nvar + 1]
        outs = refs[2 * nvar + 2: 3 * nvar + 2]
        omasks = refs[3 * nvar + 2:]

    def var_bits(k, okm):
        """int32 plane with bit v = (var v defined at k and k+1) & ok;
        in the fast path every var shares the ok bit (bit 0)."""
        if allm:
            return okm & jnp.int32(1)
        packed = jnp.zeros((TY, CX), jnp.int32)
        for v in range(nvar):
            mk2 = (fmasks[v][k].astype(jnp.int32)
                   & fmasks[v][k + 1].astype(jnp.int32))
            packed = packed | (mk2 << v)
        return packed & okm

    psv = ps_ref[...]                       # (TY, CX)

    def p_at(k):
        return a_ref[k] + b_ref[k] * psv

    def lx(p_k):
        if not log_p:
            return p_k
        return jnp.log(jnp.where(p_k > 0, p_k, _f32(1.0)))

    # Single pass over level pairs.  ``p_k`` is monotone in k (hybrid
    # coordinate), so target t is bracketed by (k, k+1) exactly where
    # ``p_k <= xt_t < p_{k+1}`` — the bracket test is *local* and the
    # old count pass (vertical.py:57-58) plus the p0/p1/f0/f1 carry
    # selects collapse into interpolating in place at the bracketing
    # iteration.  Out-of-bracket lanes keep their zero init; they are
    # masked out exactly as vertical.py:82-84 masks them (in-range,
    # both bracketing levels defined, ps defined, non-degenerate
    # bracket).  x1 (= ln p_{k+1}) is carried to the next iteration so
    # each level's log is taken once.
    xts = [xt_ref[t] for t in range(nt)]
    lxts = [jnp.log(x) if log_p else x for x in xts]
    zf = jnp.zeros((nt, TY, CX), _f32)
    zi = jnp.zeros((nt, TY, CX), jnp.int32)

    if variant == "inplace":
        # interpolate at the bracketing iteration; carry per-var results
        nmask = 1 if allm else nvar
        carry0 = (p_at(0), lx(p_at(0)),
                  tuple(zf for _ in range(nvar)),   # out per var
                  tuple(zi for _ in range(nmask)))  # defined per var (i32)

        def body(k, carry):
            p_k, x0, os_, ms = carry
            p_k1 = p_at(k + 1)
            x1 = lx(p_k1)
            denom = x1 - x0
            dinv = _f32(1.0) / jnp.where(denom != 0, denom, _f32(1.0))
            ok = (denom != 0).astype(jnp.int32)[None]
            # (nt, TY, CX) bracket predicate and weight
            sel = jnp.stack([(p_k <= t) & (p_k1 > t)
                             for t in xts])
            w = jnp.stack([(t - x0) * dinv for t in lxts])
            no, nm = [], []
            for v in range(nvar):
                fk = fvals[v][k]
                dv = fvals[v][k + 1] - fk
                no.append(jnp.where(sel, fk[None] + dv[None] * w, os_[v]))
                if not allm:
                    mk2 = (fmasks[v][k].astype(jnp.int32)
                           & fmasks[v][k + 1].astype(jnp.int32))[None] & ok
                    nm.append(jnp.where(sel, mk2, ms[v]))
            if allm:
                nm.append(jnp.where(sel, ok, ms[0]))
            return p_k1, x1, tuple(no), tuple(nm)

        _, _, os_, ms = jax.lax.fori_loop(0, nlev - 1, body, carry0)
        mbit = [(m, 1) for m in ms]
    elif variant == "packed":
        # in-place interpolation, but the nvar mask planes are packed
        # into ONE int32 carry plane (bit v = var v defined & ok): the
        # per-target mask selects collapse nvar -> 1 and the loop carry
        # shrinks from 2*nvar+2 planes to nvar+3.  The level loop is
        # unrolled `unroll` bracket steps per fori iteration — the
        # kernel's binding cost is CARRY traffic per iteration (PERF.md),
        # and unrolling amortizes one carry handoff over several steps
        # with bit-identical arithmetic (same op sequence per level).
        def step(k, p_k, x0, os_, mp):
            p_k1 = p_at(k + 1)
            x1 = lx(p_k1)
            denom = x1 - x0
            dinv = _f32(1.0) / jnp.where(denom != 0, denom, _f32(1.0))
            okm = -(denom != 0).astype(jnp.int32)      # 0 or all-ones
            packed = var_bits(k, okm)
            sel = jnp.stack([(p_k <= t) & (p_k1 > t) for t in xts])
            w = jnp.stack([(t - x0) * dinv for t in lxts])
            no = tuple(
                jnp.where(sel, fvals[v][k][None]
                          + (fvals[v][k + 1] - fvals[v][k])[None] * w,
                          os_[v])
                for v in range(nvar))
            return p_k1, x1, no, jnp.where(sel, packed[None], mp)

        steps = nlev - 1
        u = max(1, min(int(unroll), steps))

        def body(i, carry):
            p_k, x0, os_, mp = carry
            for j in range(u):
                p_k, x0, os_, mp = step(i * u + j, p_k, x0, os_, mp)
            return p_k, x0, os_, mp

        carry = (p_at(0), lx(p_at(0)),
                 tuple(zf for _ in range(nvar)), zi)
        carry = jax.lax.fori_loop(0, steps // u, body, carry)
        p_k, x0, os_, mp = carry
        for k in range((steps // u) * u, steps):   # static tail
            p_k, x0, os_, mp = step(k, p_k, x0, os_, mp)
        mbit = ([(mp, 1)] if allm
                else [(mp, 1 << v) for v in range(nvar)])
    else:
        # carry-select: the loop only *selects* the bracket quantities
        # (f0, f1, x0, 1/denom, and the nvar defined bits packed into ONE
        # int32 plane); the interpolation itself happens once after the
        # loop.  Per (level, target) work drops from
        # nvar*(FMA+select)+select to nvar*2+3 selects and the mask
        # selects collapse nvar -> 1, ~35% fewer vector ops per iteration
        # (the kernel is VPU-bound, PERF.md) while the bracket arithmetic
        # stays bit-identical: the post-loop w/out use exactly the floats
        # the in-place variant would have used at the bracket iteration.
        carry0 = (p_at(0), lx(p_at(0)),
                  tuple(zf for _ in range(nvar)),   # f0 per var
                  tuple(zf for _ in range(nvar)),   # f1 per var
                  zf, zf, zi)                       # x0_t, dinv_t, packed m

        def body(k, carry):
            p_k, x0, f0s, f1s, x0t, dvt, mp = carry
            p_k1 = p_at(k + 1)
            x1 = lx(p_k1)
            denom = x1 - x0
            # 0 where degenerate -> w=0 -> out=f0 (masked: ok bit below)
            dinv = jnp.where(denom != 0, _f32(1.0) / denom, _f32(0.0))
            okm = -(denom != 0).astype(jnp.int32)      # 0 or all-ones
            # per-var defined bits (shared across targets), AND ok
            packed = var_bits(k, okm)
            sel = jnp.stack([(p_k <= t) & (p_k1 > t) for t in xts])
            nf0 = tuple(jnp.where(sel, fvals[v][k][None], f0s[v])
                        for v in range(nvar))
            nf1 = tuple(jnp.where(sel, fvals[v][k + 1][None], f1s[v])
                        for v in range(nvar))
            nx0 = jnp.where(sel, x0[None], x0t)
            ndv = jnp.where(sel, dinv[None], dvt)
            nmp = jnp.where(sel, packed[None], mp)
            return p_k1, x1, nf0, nf1, nx0, ndv, nmp

        _, _, f0s, f1s, x0t, dvt, mp = jax.lax.fori_loop(
            0, nlev - 1, body, carry0)
        lxt = jnp.stack([jnp.full((TY, CX), t, _f32) for t in lxts])
        w = (lxt - x0t) * dvt
        os_ = [f0s[v] + (f1s[v] - f0s[v]) * w for v in range(nvar)]
        mbit = ([(mp, 1)] if allm
                else [(mp, 1 << v) for v in range(nvar)])

    for v in range(nvar):
        outs[v][...] = os_[v]
    if allm:
        m, bit = mbit[0]
        om = (m & bit) != 0
        omasks[0][...] = om if omasks[0].dtype == jnp.bool_ \
            else om.astype(omasks[0].dtype)
        return
    # mask lanes ride as int32 (Mosaic cannot select/rotate i1 vectors)
    psm = psm_ref[...].astype(jnp.int32)[None]
    for v in range(nvar):
        m, bit = mbit[v]
        om = ((m & bit) != 0) & (psm != 0)
        omasks[v][...] = om if omasks[v].dtype == jnp.bool_ \
            else om.astype(omasks[v].dtype)


def _pick_cx(nlev: int, nx: int, nvar: int, nt: int, ty: int = 8,
             unroll: int = 1) -> int:
    """x chunk minimizing total *processed* lanes, then chunk count,
    within the 16 MB scoped-VMEM limit (13 MB budget).  Maximizing CX is
    the wrong objective: nx=929 at CX=640 runs 2x640=1280 lanes/row
    while CX=512 covers the same row in 2x512=1024 — the per-chunk
    VPU/select work scales with jx*CX, so CX should be the minimal
    128-multiple whose chunk count jx keeps jx*CX == ceil(nx/128)*128.
    Unrolled bracket steps keep ~2.5 extra (nt, ty, cx) planes live each
    (measured: unroll=16 at the unroll=1 CX overflows scoped vmem by
    2.2 MB; unroll=8 fits)."""
    budget = 13 * 2 ** 20
    per_lane = (2 * nvar * nlev * ty * 5         # inputs, f32 + i8, 2-buf
                + 2 * nvar * nt * ty * 5         # outputs, f32 + i8, 2-buf
                + (2 * nvar + 4) * nt * ty * 4   # out/mask carries + temps
                + 4 * ty * 4                     # p/ln-p carries
                + int(2.5 * unroll * nt * ty * 4))  # unrolled live temps
    lanes = -(-nx // 128) * 128                  # minimal padded row
    for jx in range(1, lanes // 128 + 1):
        cx = -(-lanes // (128 * jx)) * 128
        if cx * per_lane <= budget and jx * cx == lanes:
            return int(cx)
    return 128


@functools.partial(jax.jit, static_argnames=("targets", "log_p", "interpret",
                                             "variant", "ty", "unroll",
                                             "all_defined"))
def hlevel_to_plevel_fused(fields: Tuple[Field, ...], ps: Field,
                           alevel, blevel, targets: Sequence[float],
                           log_p: bool = True,
                           interpret: bool = False,
                           variant: str = "packed",
                           ty: int = 8, unroll: int = 8,
                           all_defined: bool = False) -> Tuple[Field, ...]:
    """Interpolate several hybrid-level Fields to constant-pressure
    surfaces in one fused pass (equivalent to
    :func:`..ops.vertical.hlevel_to_plevel` per field, same masks).

    Args:
      fields: tuple of ``[nlev, ny, nx]`` Fields sharing the same grid.
      ps: ``[ny, nx]`` surface-pressure Field (hPa).
      alevel, blevel: ``[nlev]`` hybrid coefficients.
      targets: static tuple of target pressures (hPa).
      all_defined: caller asserts every input point (fields and ps) is
        defined — no input mask planes are read, and the per-var output
        masks (still data-dependent through the in-range/non-degenerate
        bracket gate, vertical.py:82-84) collapse to ONE shared plane:
        ``nvar + 1`` fewer int8 reads and ``nvar - 1`` fewer int8
        writes per step.  Output Fields share one mask buffer.

    Returns a tuple of ``[len(targets), ny, nx]`` Fields.
    """
    fields = tuple(fields)
    nvar = len(fields)
    require(nvar >= 1, "hlevel_to_plevel_fused: no fields")
    # packed/carrysel bit-pack one mask bit per variable into an int32
    # plane; 1 << 31 overflows (the inplace variant has no such limit)
    require(nvar <= 31 or variant == "inplace",
            "hlevel_to_plevel_fused: packed mask carries hold at most "
            "31 fields — use variant='inplace' beyond that")
    nlev, ny, nx = fields[0].values.shape
    for f in fields:
        require(f.values.shape == (nlev, ny, nx),
                "hlevel_to_plevel_fused: field shape mismatch")
    require(ps.values.shape == (ny, nx),
            "hlevel_to_plevel_fused: ps must be (ny, nx)")
    targets = tuple(float(t) for t in targets)
    nt = len(targets)
    require(nt >= 1, "hlevel_to_plevel_fused: no targets")

    require(ty > 0 and ty % 8 == 0, "hlevel_to_plevel_fused: bad ty")
    # ty=8 default: taller tiles would cut i8 mask sublane padding (8-row
    # blocks move 32 rows) but measured slower — the kernel is VPU/carry
    # bound, and 8/16/32 gave 4.50/4.57/4.75 ms on the padded operational
    # stack (tile-aligned inputs; 6.0/6.1/6.3 ms ragged)
    TY = min(ty, -(-ny // 8) * 8)
    CX = _pick_cx(nlev, nx, nvar, nt, TY, unroll if variant == "packed"
                  else 1)
    jy, jx = -(-ny // TY), -(-nx // CX)

    xt = np.asarray(targets, np.float32)

    def im3(y, x, *_):
        return (0, y, x)

    def im2(y, x, *_):
        return (y, x)

    stack3 = pl.BlockSpec((nlev, TY, CX), im3, memory_space=pltpu.VMEM)
    tile2 = pl.BlockSpec((TY, CX), im2, memory_space=pltpu.VMEM)
    out3 = pl.BlockSpec((nt, TY, CX), im3, memory_space=pltpu.VMEM)

    nmask = 1 if all_defined else nvar
    if all_defined:
        in_specs = [stack3] * nvar + [tile2]
        operands = [f.values for f in fields] + [ps.values]
    else:
        in_specs = [stack3] * nvar + [stack3] * nvar + [tile2, tile2]
        operands = ([f.values for f in fields]
                    + [f.mask.astype(jnp.int8) for f in fields]
                    + [ps.values, ps.mask.astype(jnp.int8)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(jy, jx),
        in_specs=in_specs,
        out_specs=tuple([out3] * (nvar + nmask)),
    )
    f32_o = jax.ShapeDtypeStruct((nt, ny, nx), jnp.float32)
    # masks cross the Pallas boundary as int8: i1 operands/results lower
    # to i32 buffers with materialized converts on both sides (4x DMA)
    i8_o = jax.ShapeDtypeStruct((nt, ny, nx), jnp.int8)

    if variant not in ("carrysel", "inplace", "packed"):
        raise ValueError(f"hlevel_to_plevel_fused: bad variant {variant!r}")
    outs = pl.pallas_call(
        functools.partial(_interp_kernel, nlev, nt, nvar, TY, CX, log_p,
                          variant, unroll, all_defined),
        grid_spec=grid_spec,
        out_shape=tuple([f32_o] * nvar + [i8_o] * nmask),
        interpret=interpret,
    )(jnp.asarray(alevel, _f32), jnp.asarray(blevel, _f32),
      jnp.asarray(xt), *operands)

    if all_defined:
        m = outs[nvar] != 0                  # one shared gate plane
        return tuple(Field(outs[v], m) for v in range(nvar))
    return tuple(Field(outs[v], outs[nvar + v] != 0) for v in range(nvar))
