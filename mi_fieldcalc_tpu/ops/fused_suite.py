"""Single-pass Pallas kernel for the level-conversion suite.

BASELINE config 2 — the full humidity/temperature conversion suite on a
level stack — composes many *independent* pointwise operators over the
same four inputs.  One jitted XLA program CSEs the shared saturation
math but still builds one fusion per output, so the inputs are re-read
from HBM once per consumer: 8 conversions measure ~160 B/pt of traffic
where the intrinsic requirement (4 inputs read once, 8 outputs written
once) is ~60 B/pt (PERF.md "BASELINE configs").

:func:`alevel_suite_fused` computes ANY requested set of the pointwise
a-level family (``aleveltemp`` / ``alevelhum`` / ``alevelthe`` /
``alevelducting`` modes) in ONE pass over ``(y-tile, level)`` blocks —
the elementwise sibling of the 12-output pipeline kernel
(ops/fused.py).  The formulas are NOT duplicated: the kernel traces the
exact ``levels.*`` implementations inside the tile (the ``icing_fused``
pattern), with masks riding as int32 lanes (Mosaic cannot treat i1
vectors as data) and ONE substitution installed for the trace: the
41-entry saturation table's pair lookup becomes a Mosaic lane-gather
(:class:`..constants.ewt_pair_impl`) — the jnp path's select chain
measured a net in-kernel LOSS (Mosaic VPU select codegen; PERF.md).
Both lookups return exact table values, so results stay bit-equal.
:class:`.thermo.esat_memo` additionally dedupes the shared saturation
evaluation across conversions of the same temperature tracer at trace
time.

Equivalence: interpret-mode results are bitwise identical to the jitted
jnp ops (tests/test_fused_suite.py — with undefs and out-of-table
temperatures); on-chip, masks identical and values to f32 reassociation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import ewt_pair_impl
from ..field import Field
from ._harness import require
from .fused import _TAB128, _lookup
from .levels import alevelducting, alevelhum, alevelthe, aleveltemp

__all__ = ["alevel_suite_fused", "hlevel_suite_fused"]


def _suite_kernel(reqs, nin, tab_ref, *refs):
    vals = [r[0] for r in refs[:nin]]
    msks = [r[0].astype(jnp.int32) for r in refs[nin:2 * nin]]
    out_refs = refs[2 * nin:]

    fields = [Field(v, m) for v, m in zip(vals, msks)]
    it = iter(fields)
    tF = next(it)
    qF = next(it) if any(f in ("hum_q", "the", "duct_q")
                         for f, _ in reqs) else None
    rF = next(it) if any(f in ("hum_rh", "duct_rh")
                         for f, _ in reqs) else None
    pF = next(it)

    def pair(ls):
        # Mosaic lane-gather pair lookup (exact table values) — the jnp
        # select chain is ~5x costlier inside the kernel (PERF.md)
        return _lookup(tab_ref, ls), _lookup(tab_ref, ls + 1)

    from .thermo import esat_memo
    with ewt_pair_impl(pair), esat_memo():
        outs = []
        for fam, c in reqs:
            if fam == "temp":
                outs.append(aleveltemp(tF, pF, compute=c))
            elif fam == "hum_q":
                outs.append(alevelhum(tF, qF, pF, compute=c))
            elif fam == "hum_rh":
                outs.append(alevelhum(tF, rF, pF, compute=c))
            elif fam == "the":
                outs.append(alevelthe(tF, qF, pF, compute=c))
            elif fam == "duct_q":
                outs.append(alevelducting(tF, qF, pF, compute=c))
            else:  # "duct_rh"
                outs.append(alevelducting(tF, rF, pF, compute=c))

    n = len(outs)
    for k, f in enumerate(outs):
        out_refs[k][0] = f.values
        mref = out_refs[n + k]
        m = f.mask
        if m.dtype != jnp.bool_:
            m = m != 0
        mref[0] = m.astype(mref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "temps", "hums_q", "hums_rh", "thes", "ducts_q", "ducts_rh",
    "interpret", "ty"))
def alevel_suite_fused(t: Field, q: Field, rh: Field, p: Field,
                       temps=(), hums_q=(), hums_rh=(),
                       thes=(), ducts_q=(), ducts_rh=(),
                       interpret: bool = False,
                       ty: int | None = None):
    """All requested a-level conversions in one kernel pass.

    Args:
      t: ``[nlev, ny, nx]`` temperature Field (Kelvin for odd computes,
        theta for even — exactly :func:`..ops.levels.aleveltemp` /
        :func:`..ops.levels.alevelhum` semantics per mode).
      q, rh: specific humidity / RH% Fields (same shape; an input whose
        request tuples are all empty is ignored entirely — it never
        touches the device, so any placeholder works).
      p: pressure Field (hPa).
      temps: tuple of ``aleveltemp`` computes (1-5).
      hums_q: tuple of ``alevelhum`` computes taking ``q`` (1/2, 5/6,
        9/10 after unit remap).
      hums_rh: tuple of ``alevelhum`` computes taking ``rh``.
      thes: tuple of ``alevelthe`` computes (1/2; both take ``q``).
      ducts_q / ducts_rh: ``alevelducting`` computes taking ``q``
        (1/2) / ``rh`` (3/4).

    Returns the outputs as a list of Fields, in
    ``temps + hums_q + hums_rh + thes + ducts_q + ducts_rh`` request
    order.  Works on the canonical padded layout with no extra
    arguments — the suite is pointwise (no edge fills), so dead-lane
    masks stay False through the ANDs.
    """
    reqs = tuple(
        [("temp", int(c)) for c in temps]
        + [("hum_q", int(c)) for c in hums_q]
        + [("hum_rh", int(c)) for c in hums_rh]
        + [("the", int(c)) for c in thes]
        + [("duct_q", int(c)) for c in ducts_q]
        + [("duct_rh", int(c)) for c in ducts_rh])
    nout = len(reqs)
    require(nout >= 1, "alevel_suite_fused: no conversions requested")
    # unused inputs never touch the device (the kernel is byte-bound)
    need_q = any(f in ("hum_q", "the", "duct_q") for f, _ in reqs)
    need_rh = any(f in ("hum_rh", "duct_rh") for f, _ in reqs)
    fields = [t] + ([q] if need_q else []) + ([rh] if need_rh else []) + [p]
    nin = len(fields)
    nlev, ny, nx = t.values.shape
    for f in fields:
        require(f.values.shape == (nlev, ny, nx),
                "alevel_suite_fused: field shape mismatch")

    # elementwise tiles: no halos, no fill constraint — any multiple of
    # 8; 48 measured faster than 96 on the operational grid (PERF.md),
    # shrinking with the VMEM footprint of the double-buffered
    # (nin + nout) x (f32 + i8) blocks on wide grids / big suites
    if ty is None:
        budget = 12 * 2 ** 20
        per_row_lane = 2 * 5 * (nin + nout) + 8 * 4   # blocks + temps
        TY = 8
        for cand in (48, 40, 32, 24, 16, 8):
            if cand * max(nx, 128) * per_row_lane <= budget:
                TY = cand
                break
        TY = min(TY, -(-ny // 8) * 8)
    else:
        TY = ty
    require(TY % 8 == 0 and TY > 0, "alevel_suite_fused: bad ty")
    jy = -(-ny // TY)

    def c3():
        return pl.BlockSpec((1, TY, nx), lambda j, lev: (lev, j, 0),
                            memory_space=pltpu.VMEM)

    operands = [jnp.asarray(_TAB128),
                *[f.values for f in fields],
                *[f.mask.view(jnp.int8) for f in fields]]
    tabspec = pl.BlockSpec(memory_space=pltpu.VMEM)

    f32_3d = jax.ShapeDtypeStruct((nlev, ny, nx), jnp.float32)
    i8_3d = jax.ShapeDtypeStruct((nlev, ny, nx), jnp.int8)
    outs = pl.pallas_call(
        functools.partial(_suite_kernel, reqs, nin),
        grid=(jy, nlev),
        in_specs=[tabspec] + [c3()] * (2 * nin),
        out_specs=tuple([c3()] * (2 * nout)),
        out_shape=tuple([f32_3d] * nout + [i8_3d] * nout),
        interpret=interpret,
    )(*operands)

    return [Field(outs[k], outs[nout + k].view(jnp.bool_))
            for k in range(nout)]


def _hsuite_kernel(reqs, nin, a_ref, b_ref, tab_ref, *refs):
    from .levels import (_levelducting_core, _levelhum_core,
                         _levelthe_core, _leveltemp_core)

    vals = [r[0] for r in refs[:nin - 1]]
    psv = refs[nin - 1][...]
    msks = [r[0].astype(jnp.int32) for r in refs[nin:2 * nin - 1]]
    psm = refs[2 * nin - 1][...].astype(jnp.int32)
    out_refs = refs[2 * nin:]

    fields = [Field(v, m) for v, m in zip(vals, msks)]
    it = iter(fields)
    tF = next(it)
    qF = next(it) if any(f in ("hum_q", "the", "duct_q")
                         for f, _ in reqs) else None
    rF = next(it) if any(f in ("hum_rh", "duct_rh")
                         for f, _ in reqs) else None

    lev = pl.program_id(1)
    p_arr = a_ref[lev] + b_ref[lev] * psv    # hybrid pressure, per point

    def pair(ls):
        return _lookup(tab_ref, ls), _lookup(tab_ref, ls + 1)

    from ._harness import and_masks
    from .thermo import esat_memo
    with ewt_pair_impl(pair), esat_memo():
        outs = []
        for fam, c in reqs:
            if fam == "temp":
                outs.append(_leveltemp_core(
                    tF, p_arr, and_masks(tF) & psm, c))
            elif fam in ("hum_q", "hum_rh"):
                hF = qF if fam == "hum_q" else rF
                # hlevel gate (cc:1187): ps defined except modes 7/11
                p_mask = None if c in (7, 11) else psm
                outs.append(_levelhum_core(tF, hF, p_arr, p_mask, c))
            elif fam == "the":
                outs.append(_levelthe_core(
                    tF, qF, p_arr, and_masks(tF, qF) & psm, c))
            else:  # duct_q / duct_rh
                hF = qF if fam == "duct_q" else rF
                outs.append(_levelducting_core(
                    tF, hF, p_arr, and_masks(tF, hF) & psm, c))

    n = len(outs)
    for k, f in enumerate(outs):
        out_refs[k][0] = f.values
        mref = out_refs[n + k]
        m = f.mask
        if m.dtype != jnp.bool_:
            m = m != 0
        mref[0] = m.astype(mref.dtype)


def hlevel_suite_fused(t: Field, q: Field, rh: Field, ps: Field,
                       alevel, blevel,
                       temps=(), hums_q=(), hums_rh=(),
                       thes=(), ducts_q=(), ducts_rh=(),
                       interpret: bool = False,
                       ty: int | None = None):
    """The hybrid-level conversion suite in one kernel pass — the
    production form: prognostic surface pressure + per-level hybrid
    coefficients instead of a materialized 3-D pressure field (which
    never touches HBM: ``p = alevel[k] + blevel[k]*ps`` is rebuilt per
    level from SMEM scalars and the ps tile, exactly like the pipeline
    and interpolation kernels).

    Semantics are hleveltemp / hlevelhum / hlevelthe / hlevelducting
    per mode — including hlevelhum's ps-definedness gate (defined ps
    required except for the pressure-independent modes 7/11,
    FieldCalculations.cc:1187), which is INVERTED vs alevelhum's.

    Args as :func:`alevel_suite_fused` except ``ps`` is the ``(ny, nx)``
    surface-pressure Field and ``alevel``/``blevel`` are length-``nlev``
    coefficient sequences (static: validated per level like the
    per-level hlevel* calls).
    """
    alevel = tuple(float(a) for a in np.asarray(alevel))
    blevel = tuple(float(b) for b in np.asarray(blevel))
    from .levels import _bad_hlevel
    for a, b in zip(alevel, blevel):
        require(not _bad_hlevel(a, b), "hlevel_suite_fused: bad a/b level")
    return _hlevel_suite_fused(t, q, rh, ps, alevel, blevel,
                               temps=tuple(int(c) for c in temps),
                               hums_q=tuple(int(c) for c in hums_q),
                               hums_rh=tuple(int(c) for c in hums_rh),
                               thes=tuple(int(c) for c in thes),
                               ducts_q=tuple(int(c) for c in ducts_q),
                               ducts_rh=tuple(int(c) for c in ducts_rh),
                               interpret=interpret, ty=ty)


@functools.partial(jax.jit, static_argnames=(
    "alevel", "blevel", "temps", "hums_q", "hums_rh", "thes",
    "ducts_q", "ducts_rh", "interpret", "ty"))
def _hlevel_suite_fused(t, q, rh, ps, alevel, blevel,
                        temps, hums_q, hums_rh, thes, ducts_q, ducts_rh,
                        interpret, ty):
    reqs = tuple(
        [("temp", c) for c in temps]
        + [("hum_q", c) for c in hums_q]
        + [("hum_rh", c) for c in hums_rh]
        + [("the", c) for c in thes]
        + [("duct_q", c) for c in ducts_q]
        + [("duct_rh", c) for c in ducts_rh])
    nout = len(reqs)
    require(nout >= 1, "hlevel_suite_fused: no conversions requested")
    need_q = any(f in ("hum_q", "the", "duct_q") for f, _ in reqs)
    need_rh = any(f in ("hum_rh", "duct_rh") for f, _ in reqs)
    stacks = [t] + ([q] if need_q else []) + ([rh] if need_rh else [])
    nin = len(stacks) + 1                      # + ps
    nlev, ny, nx = t.values.shape
    require(len(alevel) == nlev and len(blevel) == nlev,
            "hlevel_suite_fused: alevel/blevel must have nlev entries")
    for f in stacks:
        require(f.values.shape == (nlev, ny, nx),
                "hlevel_suite_fused: field shape mismatch")
    require(ps.values.shape == (ny, nx),
            "hlevel_suite_fused: ps must be (ny, nx)")

    if ty is None:
        budget = 12 * 2 ** 20
        per_row_lane = 2 * 5 * (nin + nout) + 8 * 4
        TY = 8
        for cand in (48, 40, 32, 24, 16, 8):
            if cand * max(nx, 128) * per_row_lane <= budget:
                TY = cand
                break
        TY = min(TY, -(-ny // 8) * 8)
    else:
        TY = ty
    require(TY % 8 == 0 and TY > 0, "hlevel_suite_fused: bad ty")
    jy = -(-ny // TY)

    def c3():
        return pl.BlockSpec((1, TY, nx), lambda j, lev, *_: (lev, j, 0),
                            memory_space=pltpu.VMEM)

    def c2():
        return pl.BlockSpec((TY, nx), lambda j, lev, *_: (j, 0),
                            memory_space=pltpu.VMEM)

    tabspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = ([tabspec] + [c3()] * (nin - 1) + [c2()]
                + [c3()] * (nin - 1) + [c2()])
    operands = [jnp.asarray(_TAB128),
                *[f.values for f in stacks], ps.values,
                *[f.mask.view(jnp.int8) for f in stacks],
                ps.mask.view(jnp.int8)]

    f32_3d = jax.ShapeDtypeStruct((nlev, ny, nx), jnp.float32)
    i8_3d = jax.ShapeDtypeStruct((nlev, ny, nx), jnp.int8)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(jy, nlev),
        in_specs=in_specs,
        out_specs=tuple([c3()] * (2 * nout)))
    outs = pl.pallas_call(
        functools.partial(_hsuite_kernel, reqs, nin),
        grid_spec=grid_spec,
        out_shape=tuple([f32_3d] * nout + [i8_3d] * nout),
        interpret=interpret,
    )(jnp.asarray(alevel, jnp.float32), jnp.asarray(blevel, jnp.float32),
      *operands)

    return [Field(outs[k], outs[nout + k].view(jnp.bool_))
            for k in range(nout)]
