"""The flagship derived-field pipeline.

One fused, jittable program mapping prognostic model output — temperature,
specific humidity, wind, surface pressure on hybrid model levels — to the
full set of diagnostic fields a forecaster's workstation requests, i.e. the
composition the reference computes one C++ call at a time:

* per-point hybrid-level pressure      (hlevelpressure,  cc:1276-1304)
* potential temperature                (aleveltemp 3,     cc:1310-1353)
* relative humidity                    (alevelhum 1,      cc:1394-1458)
* dewpoint (K)                         (alevelhum 9,      cc:1394-1458)
* equivalent potential temperature     (alevelthe 1,      cc:1355-1392)
* ducting index                        (alevelducting 1,  cc:1460-1505)
* wind speed                           (vectorabs,        cc:1819-1841)
* relative vorticity                   (relvort,          cc:1843-1873)
* divergence                           (divergence,       cc:1910-1940)
* temperature advection (1 h)          (advection,        cc:1942-1983)
* |grad T|                             (gradient 3,       cc:1985-2074)
* thermal front parameter              (cc:2266-2309)

All operators are batched over the leading level axis; the stencil ops
read radius-1 neighbourhoods (TFP composes to radius 2), so the pipeline's
composed halo radius for sharded execution is ``RADIUS = 2``.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from ..field import Field
from ..ops import (
    aleveltemp, alevelhum, alevelthe, alevelducting, vectorabs, relvort,
    divergence, advection, gradient, thermal_front_parameter, plevelhum,
    pleveltemp,
)

__all__ = ["DerivedFields", "derived_fields", "derived_fields_plevel",
           "derived_fields_isobaric", "STANDARD_PLEVELS", "RADIUS"]

#: Composed stencil radius of the pipeline (TFP = gradient ∘ gradient).
RADIUS = 2


class DerivedFields(NamedTuple):
    """Pipeline output bundle (all Fields, same shape as the inputs)."""
    p: Field          # pressure (hPa)
    th: Field         # potential temperature (K)
    rh: Field         # relative humidity (%)
    td: Field         # dewpoint (K)
    thetae: Field     # equivalent potential temperature (K)
    ducting: Field    # ducting index
    wspeed: Field     # wind speed (m/s)
    vort: Field       # relative vorticity (1/s)
    div: Field        # divergence (1/s)
    tadv: Field       # 1-hour temperature advection (K)
    gradt: Field      # |grad T| (K/m)
    tfp: Field        # thermal front parameter


class DerivedFieldsStacked(NamedTuple):
    """Structure-of-arrays pipeline output: all 12 value planes in ONE
    ``(12, nlev, ny, nx)`` float32 array plus one mask array, in
    :class:`DerivedFields` field order.

    This is the production layout of the fused kernel
    (``derived_fields_fused(..., stacked=True)``): two output buffers
    instead of 24 means fewer, larger DMA writes, and downstream
    consumers (file writers, ensemble reducers) usually want the planes
    contiguous anyway.  ``masks`` is an int8 plane stack — by DEFAULT
    the 9 DEDUPLICATED planes (``dedup_masks=True``: td/duc/dv are
    bitwise-identical to rh/the/vo by construction, so the kernel skips
    3 of 12 plane writes per step on a DMA-byte-bound path), indexed
    through :data:`MASK9`; ``dedup_masks=False`` restores the plain
    12-plane stack; ``packed_masks=True`` ONE ``(nlev, ny, nx)``
    int32 bit-plane with bit ``k`` = field ``k`` defined (fewer mask
    bytes, measured slightly slower; kept as an ABI option); and
    ``levpack_masks=True`` a ``(9, ny, nx)`` **uint32** stack with bit
    ``L`` = level ``L`` defined — the most compact mask payload (8x
    smaller than the int8 stack; step time a wash, the int8 mask
    streams already hide behind the f32 streams — PERF.md "Structural
    light speed").  Named accessors slice / unpack lazily — outside
    ``jit`` each access is one device-side op.

    ``region`` is populated only for the ALL_DEFINED 2-plane gate
    layout: a ``[1, ny, nx]`` bool plane, True exactly on the logical
    grid region, that the accessors AND into the 10 synthesized
    constant-True masks — so the canonical padded-layout invariant
    (masks False on dead rows/lanes) holds on EVERY accessor path with
    no caller-side trimming.  ``None`` for the written-mask layouts,
    whose planes are region-gated by the kernel itself.  (On unsharded
    unpadded grids the plane is compile-time constant True and XLA
    folds it out of downstream reductions.)"""
    values: jax.Array
    masks: jax.Array
    region: jax.Array | None = None

    #: field index -> plane index in the deduplicated 9-plane mask stack
    #: (DerivedFields order: p th rh td the duc ws vo dv ad gt tf)
    MASK9 = (0, 1, 2, 2, 3, 3, 4, 5, 5, 6, 7, 8)

    #: field index -> plane index in the ALL_DEFINED 2-plane mask stack
    #: (plane 0 = humidity table gate for rh/td, plane 1 = TFP's
    #: |grad T| != 0 gate; -1 = constant True)
    MASK2 = (-1, -1, 0, 0, -1, -1, -1, -1, -1, -1, -1, 1)

    @classmethod
    def mask_plane(cls, masks, i: int, values_i, axis: int = 0,
                   region=None):
        """Field ``i``'s bool mask from any stacked-mask layout — the
        packed int32 bit-plane, the 2-plane ALL_DEFINED gate stack
        (region-gated True for the 10 gate-free fields), the
        deduplicated 9-plane stack, or the plain 12-plane stack.
        ``axis`` is the plane axis (1 for member-batched
        ``[nmem, planes, ...]`` stacks); ``values_i`` supplies the
        shape for synthesized masks; ``region`` is the producing
        stack's ``region`` plane (broadcast-ANDed into synthesized
        masks so they are False on padded dead rows/lanes — the
        canonical-layout invariant holds on every accessor path).
        Single source of truth for the layout mapping — used by
        :meth:`field`, the ensemble summary, and the sharded ensemble
        body."""
        if masks.dtype == jnp.uint32:
            # LEV-packed: plane j of the deduplicated 9-stack, bit L =
            # level L.  Unpack along a fresh lev axis at `axis`.
            j = cls.MASK9[i] if masks.shape[axis] == 9 else i
            m = jnp.take(masks, j, axis=axis) if axis else masks[j]
            nlev = values_i.shape[axis]
            m_e = jnp.expand_dims(m.view(jnp.int32), axis)
            levs = jnp.arange(nlev, dtype=jnp.int32).reshape(
                [-1 if d == axis else 1 for d in range(m_e.ndim)])
            return ((m_e >> levs) & 1) != 0
        if masks.ndim == values_i.ndim:            # packed bit-plane
            return ((masks >> i) & 1) != 0
        nplanes = masks.shape[axis]
        if nplanes == 2:                           # all_defined gates
            j = cls.MASK2[i]
            if j < 0:
                if region is not None:
                    return jnp.broadcast_to(region, values_i.shape)
                return jnp.ones(values_i.shape, bool)
        else:
            j = cls.MASK9[i] if nplanes == 9 else i
        m = jnp.take(masks, j, axis=axis) if axis else masks[j]
        return m if m.dtype == jnp.bool_ else m != 0

    def field(self, i: int) -> Field:
        return Field(self.values[i],
                     self.mask_plane(self.masks, i, self.values[i],
                                     region=self.region))

    def as_fields(self) -> "DerivedFields":
        return DerivedFields(*[self.field(i) for i in range(12)])

    def __getattr__(self, name):
        if name in DerivedFields._fields:
            return self.field(DerivedFields._fields.index(name))
        raise AttributeError(name)


def derived_fields(tk: Field, q: Field, u: Field, v: Field, ps: Field,
                   alevel: jax.Array, blevel: jax.Array,
                   xmapr: jax.Array, ymapr: jax.Array,
                   fcoriolis: jax.Array) -> DerivedFields:
    """Full derived-field pipeline on hybrid model levels.

    Args:
      tk, q, u, v: ``[nlev, ny, nx]`` Fields (temperature K, specific
        humidity kg/kg, wind m/s).
      ps: ``[ny, nx]`` surface-pressure Field (hPa).
      alevel, blevel: ``[nlev]`` hybrid coefficients.
      xmapr, ymapr, fcoriolis: ``[ny, nx]`` map-factor / coriolis arrays
        (or ``[nlev, ny, nx]``; broadcast over levels otherwise).
    """
    nlev = tk.values.shape[0]
    a = jnp.asarray(alevel, jnp.float32).reshape(nlev, 1, 1)
    b = jnp.asarray(blevel, jnp.float32).reshape(nlev, 1, 1)
    p = Field(a + b * ps.values[None],
              jnp.broadcast_to(ps.mask[None], tk.values.shape))

    def bcast(arr):
        arr = jnp.asarray(arr, jnp.float32)
        return jnp.broadcast_to(arr, tk.values.shape) if arr.ndim == 2 else arr

    xm, ym, fc = bcast(xmapr), bcast(ymapr), bcast(fcoriolis)

    th = aleveltemp(tk, p, compute=3)
    rh = alevelhum(tk, q, p, compute=1)
    td = alevelhum(tk, q, p, compute=9)
    thetae = alevelthe(tk, q, p, compute=1)
    ducting = alevelducting(tk, q, p, compute=1)
    wspeed = vectorabs(u, v)
    vort = relvort(u, v, xm, ym)
    div = divergence(u, v, xm, ym)
    tadv = advection(tk, u, v, xm, ym, hours=1.0)
    gradt = gradient(tk, xm, ym, compute=3)
    tfp = thermal_front_parameter(tk, xm, ym)

    return DerivedFields(p=p, th=th, rh=rh, td=td, thetae=thetae,
                         ducting=ducting, wspeed=wspeed, vort=vort, div=div,
                         tadv=tadv, gradt=gradt, tfp=tfp)


#: Standard isobaric surfaces for the 3-D vertical pipeline (hPa).
STANDARD_PLEVELS = (1000.0, 925.0, 850.0, 700.0, 500.0, 400.0, 300.0,
                    250.0, 200.0, 150.0, 100.0)


def derived_fields_isobaric(tk: Field, q: Field, u: Field, v: Field,
                            ps: Field, alevel: jax.Array, blevel: jax.Array,
                            xmapr: jax.Array, ymapr: jax.Array,
                            fcoriolis: jax.Array,
                            plevels=STANDARD_PLEVELS,
                            fused: bool = False,
                            global_shape=None,
                            stacked: bool = False,
                            all_defined: bool = False) -> DerivedFields:
    """The 3-D vertical pipeline (BASELINE.json config 4): interpolate the
    prognostic fields from hybrid model levels to standard isobaric
    surfaces (log-p linear, mask-aware — ops/vertical.py), then run the
    full derived-field suite on the interpolated stack.  One jittable
    program; the interpolation's level reductions fuse with the
    elementwise suite under XLA.

    ``fused=True`` runs both stages through Pallas: the interpolation via
    the one-pass multi-variable column kernel
    (ops/vertical_fused.hlevel_to_plevel_fused — reads each level stack
    once instead of once per target), and the derived-field tail through
    the single-pass pipeline kernel — the constant-pressure surfaces are
    expressible in the kernel's hybrid law as ``alevel = plevels,
    blevel = 0`` with an all-defined surface-pressure field.

    ``global_shape`` (fused path only): the logical ``(ny, nx)`` when
    the inputs are in the canonical padded layout (layout.py) — edge
    fills fire at the logical boundary; outputs come back padded.

    ``all_defined=True`` (fused path only) asserts every input point is
    defined: the interpolation kernel skips its 5 input mask planes and
    writes ONE shared bracket-gate mask.  The derived-field tail keeps
    its full mask machinery — the interpolated masks are data-dependent
    (below-surface / above-top points are undefined) even on fully
    defined inputs."""
    from ..ops import hlevel_to_plevel

    if (global_shape is not None or stacked or all_defined) and not fused:
        raise ValueError("derived_fields_isobaric: global_shape/stacked/"
                         "all_defined require fused=True")
    nlev = tk.values.shape[0]
    plevels = tuple(float(t) for t in plevels)
    if fused:
        from ..ops.vertical_fused import hlevel_to_plevel_fused
        tki, qi, ui, vi = hlevel_to_plevel_fused(
            (tk, q, u, v), ps, alevel, blevel, plevels,
            interpret=jax.devices()[0].platform != "tpu",
            all_defined=all_defined)
    else:
        tki = hlevel_to_plevel(tk, ps, alevel, blevel, plevels)
        qi = hlevel_to_plevel(q, ps, alevel, blevel, plevels)
        ui = hlevel_to_plevel(u, ps, alevel, blevel, plevels)
        vi = hlevel_to_plevel(v, ps, alevel, blevel, plevels)
    np_ = len(plevels)
    if fused:
        from ..ops.fused import derived_fields_fused
        ny, nx = tki.values.shape[-2:]
        ps1 = Field(jnp.zeros((ny, nx), jnp.float32),
                    jnp.ones((ny, nx), bool))
        return derived_fields_fused(
            tki, qi, ui, vi, ps1,
            jnp.asarray(plevels, jnp.float32), jnp.zeros(np_, jnp.float32),
            xmapr, ymapr, fcoriolis,
            interpret=jax.devices()[0].platform != "tpu",
            global_shape=global_shape, stacked=stacked)
    # constant-pressure "field" per target level; defined everywhere
    pvals = jnp.asarray(plevels, jnp.float32).reshape(np_, 1, 1)
    p = Field(jnp.broadcast_to(pvals, tki.values.shape),
              jnp.ones(tki.values.shape, bool))

    def bcast(arr):
        arr = jnp.asarray(arr, jnp.float32)
        return jnp.broadcast_to(arr, tki.values.shape) if arr.ndim == 2 else arr

    xm, ym = bcast(xmapr), bcast(ymapr)

    th = aleveltemp(tki, p, compute=3)
    rh = alevelhum(tki, qi, p, compute=1)
    td = alevelhum(tki, qi, p, compute=9)
    thetae = alevelthe(tki, qi, p, compute=1)
    ducting = alevelducting(tki, qi, p, compute=1)
    wspeed = vectorabs(ui, vi)
    vort = relvort(ui, vi, xm, ym)
    div = divergence(ui, vi, xm, ym)
    tadv = advection(tki, ui, vi, xm, ym, hours=1.0)
    gradt = gradient(tki, xm, ym, compute=3)
    tfp = thermal_front_parameter(tki, xm, ym)
    return DerivedFields(p=p, th=th, rh=rh, td=td, thetae=thetae,
                         ducting=ducting, wspeed=wspeed, vort=vort, div=div,
                         tadv=tadv, gradt=gradt, tfp=tfp)


def derived_fields_plevel(tk: Field, rh: Field, u: Field, v: Field,
                          p: float, xmapr: jax.Array, ymapr: jax.Array,
                          fcoriolis: jax.Array) -> Dict[str, Field]:
    """Pressure-level variant (BASELINE.json config 1): potential
    temperature + dewpoint + kinematics on one constant-pressure surface."""
    th = pleveltemp(tk, p, compute=3)
    td = plevelhum(tk, rh, p, compute=11)   # T(K), RH -> Td(K)
    wspeed = vectorabs(u, v)
    vort = relvort(u, v, xmapr, ymapr)
    div = divergence(u, v, xmapr, ymapr)
    gradt = gradient(tk, xmapr, ymapr, compute=3)
    return {"th": th, "td": td, "wspeed": wspeed, "vort": vort,
            "div": div, "gradt": gradt}
