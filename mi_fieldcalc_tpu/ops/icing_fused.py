"""Fused Pallas MINCOG kernel: the iterative solvers run in VMEM.

:func:`.icing.vessel_icing_mincog` is an 11 ms op whose cost is NOT the
solver math: its three iterative stages — the shallow-water wave-speed
fixed point (VI:494-508), the 50-step droplet Runge-Kutta (VI:450-463),
and the 39-height Newton sweep on the freezing-fraction heat balance
(VI:381-415, 593-671) — are whole-array ``lax`` loops under XLA, and
every iteration is a full-grid HBM round trip (~2-3 planes x 2.7 MB on
the operational grid), while the op's *intrinsic* traffic is 11 input
planes + 1 output ~ 32 MB ~ 0.1 ms (PERF.md "Mincog cost attribution").

This kernel runs the SAME solve per VMEM tile:

* the c-independent prologue (spray geometry, heat-transfer/humidity
  coefficients) stays in XLA via :func:`.icing._mincog_static` — it
  needs arcsin/sin/cos/pow, which Mosaic does not lower — and its
  planes enter the kernel through VMEM once,
* the c-dependent solve is :func:`.icing._mincog_core` traced INSIDE
  the tile — zero formula duplication with the jnp path; the function
  is written kernel-safe (int32 mask carries, no isfinite/sinh),
* the wave fixed point's ``while_loop`` gets per-TILE early exit (the
  scalar any-unconverged cond now ranges over one tile, not the grid),
  and every loop's carry lives in VMEM/registers instead of HBM,
* the height sweep solves all ``number`` heights as ONE stacked
  ``(number, TY, CX)`` Newton problem (``stack_heights=True``): the
  per-height problems differ only in the static decay factor, so the
  ``number x 8`` sequential loop steps collapse to 8 and Mosaic's
  per-step loop overhead stops dominating,
* grids pad to the canonical tile-aligned layout (layout.py) with the
  skip bit set on dead lanes, and trim at exit.

Masks cross the boundary packed into ONE int8 bit-plane (gate=1,
shallow=2, skip=4): i1 operands lower to i32 buffers with materialized
converts (4x DMA), and int8 sublane padding makes every extra i8 plane
cost a 32-row tile.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field import Field
from ..layout import pad_array
from ._harness import and_masks, out_field, require
from .icing import (KERNEL_SOLVER_UNROLL, KERNEL_SOLVER_UNROLL_MS,
                    KERNEL_WARM_FP, KERNEL_WARM_NEWTON, _mincog_core,
                    _mincog_decay, _mincog_static, _modstall_core,
                    _modstall_static)

__all__ = ["vessel_icing_mincog_fused", "vessel_icing_modstall_fused"]

_f32 = jnp.float32

#: f32 planes entering the MINCOG kernel, in argument order.
_PLANES = ("c0", "a", "wave", "pw", "depth", "v", "sst", "sal", "airtemp",
           "rh", "ha", "he", "ea", "M", "K", "tau", "vd")

#: f32 planes entering the ModStall kernel, in argument order.
_MS_PLANES = ("c0", "a", "wave", "v", "sst", "airtemp", "rh", "tf", "ha",
              "tau", "K", "M")


def _mincog_kernel(vsca, alt, decay, stack_heights, decay_ref, *refs):
    vals = {name: ref[...] for name, ref in zip(_PLANES, refs)}
    bits = refs[len(_PLANES)][...].astype(jnp.int32)
    o_ref = refs[len(_PLANES) + 1]

    shallow = (bits & 2) != 0
    skip0 = (bits & 4) != 0

    out = _mincog_core(
        vals["c0"], vals["a"], shallow, skip0, vals["wave"], vals["pw"],
        vals["depth"], vals["v"], vals["sst"], vals["sal"], vals["airtemp"],
        vals["rh"], vals["ha"], vals["he"], vals["ea"], vals["M"],
        vals["K"], vals["tau"], vals["vd"], vsca, alt, decay,
        stack_heights=stack_heights,
        # non-stacked mode indexes the SMEM decay table per height
        # (pallas rejects captured array constants in the kernel)
        decay_at=lambda counter: decay_ref[counter],
        unrolls=KERNEL_SOLVER_UNROLL, warm_newton=KERNEL_WARM_NEWTON)
    o_ref[...] = out


def _pick_cx(nx_p: int, ty: int, number: int) -> int:
    """Largest x chunk (multiple of 128 dividing the padded row) whose
    tile fits the scoped-VMEM budget: ~17 double-buffered input planes,
    the output, the i8 bit plane (32-row i8 tiling), ~10 live lane-plane
    temporaries, and ~16 ``(number, ty, cx)`` stacked-Newton planes."""
    budget = 12 * 2 ** 20
    per_lane = ((len(_PLANES) + 1) * 2 * ty * 4   # f32 in/out, 2-buffered
                + 2 * max(ty, 32)                 # i8 bits, 32-row tiles
                + 10 * ty * 4                     # lane-plane temporaries
                + 16 * number * ty * 4)           # stacked height solve
    for jx in range(1, nx_p // 128 + 1):
        if nx_p % (128 * jx):
            continue
        cx = nx_p // jx
        if cx * per_lane <= budget:
            return cx
    return 128


@functools.partial(jax.jit, static_argnames=(
    "vs", "alpha", "zmin", "zmax", "alt", "interpret", "ty",
    "stack_heights"))
def vessel_icing_mincog_fused(sal: Field, wave: Field, x_wind: Field,
                              y_wind: Field, airtemp: Field, rh: Field,
                              sst: Field, p: Field, pw: Field, aice: Field,
                              depth: Field, vs: float, alpha: float,
                              zmin: float, zmax: float, alt: int,
                              interpret: bool = False, ty: int = 8,
                              stack_heights: bool = False) -> Field:
    """MINCOG icing rate, fused solver kernel — numerically equivalent to
    :func:`.icing.vessel_icing_mincog` (tests/test_icing_fused.py: masks
    bit-for-bit, values to solver tolerance)."""
    require(vs >= 0 and alpha >= 0 and zmin >= 0 and zmax >= 0
            and zmax >= zmin and math.fmod(zmax - zmin, 1.0) == 0.0,
            "vesselIcingMincog: bad parameters")
    # ty=32 MISCOMPILES through Mosaic on (32, 1024) tiles (wrong values,
    # max|d|~12 on the operational grid; interpret mode is correct at any
    # ty) — keep to the validated tile heights.  ty=8 measured fastest.
    require(ty in (8, 16), "vessel_icing_mincog_fused: ty must be 8 or 16")
    mask = and_masks(sal, wave, x_wind, y_wind, airtemp, rh, sst, p,
                     aice, depth)
    brine_freeze = _f32(-54.1126) * sal.values / (_f32(1000.0) - sal.values)
    gate = mask & (aice.values < _f32(0.4)) & (sst.values > brine_freeze)

    (v, skip0, c0, a, ha, tau, ea, K, M, vd, he), shallow = _static_planes(
        sal, wave, x_wind, y_wind, airtemp, rh, p, pw, depth, vs, alpha,
        gate)

    number = int((zmax - zmin) * 2 + 1)
    decay = tuple(_mincog_decay(zmin, number))

    planes = dict(c0=c0, a=a, wave=wave.values, pw=pw.values,
                  depth=depth.values, v=v, sst=sst.values, sal=sal.values,
                  airtemp=airtemp.values, rh=rh.values, ha=ha, he=he,
                  ea=ea, M=M, K=K, tau=tau, vd=vd)
    bits = (gate.astype(jnp.int8)
            | (shallow.astype(jnp.int8) << 1)
            | (skip0.astype(jnp.int8) << 2))

    ny, nx = v.shape
    # canonical padded layout; dead lanes carry the skip bit (=> out 0,
    # no fixed-point iteration burden) and benign f32 values
    padded = [pad_array(planes[name], fill=1.0) for name in _PLANES]
    bits_p = pad_array(bits, fill=4)
    ny_p, nx_p = bits_p.shape

    TY = min(ty, ny_p)
    CX = _pick_cx(nx_p, TY, number)
    grid = (ny_p // TY, nx_p // CX)

    tile = pl.BlockSpec((TY, CX), lambda y, x, *_: (y, x),
                        memory_space=pltpu.VMEM)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=grid,
        in_specs=[tile] * (len(_PLANES) + 1), out_specs=tile)

    out = pl.pallas_call(
        functools.partial(_mincog_kernel, float(vs * math.cos(alpha)),
                          alt, decay, stack_heights),
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((ny_p, nx_p), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(decay, jnp.float32), *padded, bits_p)

    return out_field(out[:ny, :nx], gate)


def _static_planes(sal, wave, x_wind, y_wind, airtemp, rh, p, pw, depth,
                   vs, alpha, gate):
    (v, skip0, c0, shallow, a, ha, tau, ea, K, M, vd, he) = _mincog_static(
        sal.values, wave.values, x_wind.values, y_wind.values,
        airtemp.values, rh.values, p.values, pw.values, depth.values,
        vs, alpha, gate)
    return (v, skip0, c0, a, ha, tau, ea, K, M, vd, he), shallow


def _modstall_kernel(vsca, decay, stack_heights, warm_fp, decay_ref, *refs):
    vals = {name: ref[...] for name, ref in zip(_MS_PLANES, refs)}
    bits = refs[len(_MS_PLANES)][...].astype(jnp.int32)
    o_ref = refs[len(_MS_PLANES) + 1]

    gate = (bits & 1) != 0
    shallow = (bits & 2) != 0

    out = _modstall_core(
        vals["c0"], vals["a"], shallow, gate, vals["wave"], vals["v"],
        vals["sst"], vals["airtemp"], vals["rh"], vals["tf"], vals["ha"],
        vals["tau"], vals["K"], vals["M"], vsca, decay,
        decay_at=lambda counter: decay_ref[counter],
        unrolls=KERNEL_SOLVER_UNROLL_MS, stack_heights=stack_heights,
        warm_fp=warm_fp)
    o_ref[...] = out


@functools.partial(jax.jit, static_argnames=(
    "vs", "alpha", "zmin", "zmax", "interpret", "ty", "stack_heights",
    "warm_fp"))
def vessel_icing_modstall_fused(sal: Field, wave: Field, x_wind: Field,
                                y_wind: Field, airtemp: Field, rh: Field,
                                sst: Field, p: Field, pw: Field,
                                aice: Field, depth: Field, vs: float,
                                alpha: float, zmin: float, zmax: float,
                                interpret: bool = False,
                                ty: int = 8,
                                stack_heights: bool = False,
                                warm_fp: int | None = None) -> Field:
    """Modified Stallabrass icing rate, fused solver kernel — equivalent
    to :func:`.icing.vessel_icing_modstall`.  The win over the jnp path
    is largest on adversarial inputs: the per-height freezing-fraction
    fixed point pays the slowest unconverged lane per WHILE iteration,
    and per-tile early exit confines that cost to the tiles that have
    such lanes (81 ms -> see PERF.md).  ``stack_heights`` solves the
    ``number`` heights as one stacked fixed-point problem — same op
    sequence per lane as the sequential sweep, equal to solver tolerance
    (see :func:`._modstall_core`), trip count max-over-heights instead
    of sum-over-heights.  Measured a 2.4x LOSS on the chip (47.9 vs
    19.8 ms at ty=8; ty=16 exceeds scoped VMEM): per-height iteration
    counts are similar so the trip-count saving is small, while the
    ``number`` x wider VMEM state destroys pipelining — kept as an
    option for documentation, default off (PERF.md 2026-08-18).

    ``warm_fp``: projection warmup for the height sweep — ``None``
    ships :data:`.icing.KERNEL_WARM_FP`, ``0`` forces the jnp path's
    exact 32-iteration warmup (tolerances: CONFORMANCE.md)."""
    num = zmax - zmin
    require(zmax >= zmin and math.fmod(num, 1.0) == 0.0,
            "vesselIcingModStall: bad zmin/zmax")
    require(vs >= 0 and alpha >= 0 and zmin >= 0 and zmax >= 0,
            "vesselIcingModStall: negative parameter")
    require(ty in (8, 16),
            "vessel_icing_modstall_fused: ty must be 8 or 16")
    # stacked mode carries (number, TY, CX) solver state: ty=16 exceeds
    # the 16M scoped-VMEM stack even at CX=512 (measured OOM)
    require(ty == 8 or not stack_heights,
            "vessel_icing_modstall_fused: stack_heights needs ty=8")
    number = int(num * 2 + 1)

    mask = and_masks(sal, wave, x_wind, y_wind, airtemp, rh, sst, p,
                     aice, depth)
    gate = mask & (aice.values < _f32(0.4))

    v, c0, shallow, a, tf, ha, tau, K, M = _modstall_static(
        sal.values, wave.values, x_wind.values, y_wind.values,
        airtemp.values, rh.values, p.values, pw.values, depth.values, gate)
    decay = tuple(_mincog_decay(zmin, number))

    planes = dict(c0=c0, a=a, wave=wave.values, v=v, sst=sst.values,
                  airtemp=airtemp.values, rh=rh.values, tf=tf, ha=ha,
                  tau=tau, K=K, M=M)
    bits = (gate.astype(jnp.int8) | (shallow.astype(jnp.int8) << 1))

    if warm_fp is None:
        warm_fp = KERNEL_WARM_FP

    ny, nx = v.shape
    # dead lanes: gate bit 0 (the fixed point starts done), benign values
    padded = [pad_array(planes[name], fill=1.0) for name in _MS_PLANES]
    bits_p = pad_array(bits, fill=0)
    ny_p, nx_p = bits_p.shape

    TY = min(ty, ny_p)
    CX = _pick_cx(nx_p, TY, number if stack_heights else 1)
    grid = (ny_p // TY, nx_p // CX)

    tile = pl.BlockSpec((TY, CX), lambda y, x, *_: (y, x),
                        memory_space=pltpu.VMEM)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=grid,
        in_specs=[tile] * (len(_MS_PLANES) + 1), out_specs=tile)

    out = pl.pallas_call(
        functools.partial(_modstall_kernel, float(vs * math.cos(alpha)),
                          decay, stack_heights, warm_fp),
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((ny_p, nx_p), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(decay, jnp.float32), *padded, bits_p)

    return out_field(out[:ny, :nx], gate)
