"""Host staging pipeline: numpy sentinel grids -> padded device Fields
and back, through the native batch codec.

This is the production serving boundary.  The reference's callers hand
flat sentinel-encoded ``float*`` grids to each operator
(FieldCalculations.h:102-107); here the same numpy arrays are staged
once per step for the whole fused pipeline:

* decode + tile-aligned padding (layout.py) for ALL input stacks in ONE
  native parallel pass (``native.decode_pad_batch`` — one thread-team
  dispatch instead of one per field, buffers reused across steps),
* one ``jax.device_put`` of the contiguous staging block,
* the fused Pallas kernel on the padded layout,
* one fetch + ``native.encode_trim_batch`` back to 12 logical sentinel
  arrays.

Everything degrades gracefully: without the native library the codec
falls back to numpy, off-TPU the pipeline falls back to the jnp path.
"""

from __future__ import annotations

import threading
from typing import Dict, List, Optional

import numpy as np

from . import native
from .field import UNDEF, Field
from .layout import padded_shape

__all__ = ["HostStager", "run_derived_fields_np",
           "stream_derived_fields_np", "run_hlevel_suite_np",
           "run_vessel_icing_np"]


class HostStager:
    """Reusable staging buffers for K same-shape sentinel inputs.

    Owns one contiguous ``[K, ..., ny_p, nx_p]`` (values, mask) host
    block sized at first use and reused for every subsequent step with
    the same shape — the allocation/page-faulting cost of ~100 MB/step
    staging buffers is paid once.

    >>> stager = HostStager(k=4)
    >>> fields = stager.stage(tk, q, u, v)   # list of padded device Fields
    """

    def __init__(self, k: int, undef: float = UNDEF, fill: float = 0.0,
                 pad: bool = True):
        self.k = int(k)
        self.undef = float(undef)
        self.fill = float(fill)
        self.pad = bool(pad)
        self._values: Optional[np.ndarray] = None
        self._mask: Optional[np.ndarray] = None
        self._shape = None
        self._lp_values: Optional[np.ndarray] = None
        self._lp_pmask: Optional[np.ndarray] = None
        self._lp_shape = None
        self.counts: List[int] = []

    def stage(self, *arrays, device=None) -> List[Field]:
        """Decode+pad the K sentinel arrays and put them on device as
        one block; returns K padded Fields (views into the block)."""
        import jax

        if len(arrays) != self.k:
            raise ValueError(f"HostStager(k={self.k}) got {len(arrays)}")
        a0 = np.asarray(arrays[0])
        ny, nx = a0.shape[-2:]
        ny_p, nx_p = padded_shape(ny, nx) if self.pad else (ny, nx)
        oshape = (self.k,) + a0.shape[:-2] + (ny_p, nx_p)
        if self._shape != oshape:
            self._values = np.empty(oshape, np.float32)
            self._mask = np.empty(oshape, np.uint8)
            self._shape = oshape
        vals, mask, self.counts = native.decode_pad_batch(
            arrays, ny_p, nx_p, self.undef, self.fill,
            out=self._values, mask=self._mask)
        dv = jax.device_put(vals, device)
        dm = jax.device_put(mask, device)
        return [Field(dv[i], dm[i]) for i in range(self.k)]

    def stage_resample(self, *arrays, shape_to, device=None):
        """Aligned ingest: decode + mask-aware bilinear re-grid of the
        K sentinel arrays onto ``shape_to`` in ONE native pass
        (native.decode_resample_batch; numpy fallback), device_put as
        one block.  Returns K Fields on the aligned logical grid."""
        import jax

        if len(arrays) != self.k:
            raise ValueError(f"HostStager(k={self.k}) got {len(arrays)}")
        a0 = np.asarray(arrays[0])
        ny_t, nx_t = shape_to
        oshape = (self.k,) + a0.shape[:-2] + (ny_t, nx_t)
        if self._shape != oshape:
            self._values = np.empty(oshape, np.float32)
            self._mask = np.empty(oshape, np.uint8)
            self._shape = oshape
        vals, mask, self.counts = native.decode_resample_batch(
            arrays, ny_t, nx_t, self.undef, self.fill,
            out=self._values, mask=self._mask)
        dv = jax.device_put(vals, device)
        dm = jax.device_put(mask, device)
        return [Field(dv[i], dm[i]) for i in range(self.k)]

    def stage_levpack(self, *arrays, device=None):
        """Like :meth:`stage` for ``[nlev <= 32, ny, nx]`` stacks, but
        masks ship LEV-bit-packed: ONE ``[K, ny_p, nx_p]`` uint32 block
        (bit L = level L defined) instead of the K full uint8 blocks —
        nlev/32 of the mask payload over a latency-bound host link.
        Returns ``(fields, packed)`` where each Field carries
        ``mask=None`` (the fused kernel's levpack ABI never reads it;
        pass ``packed`` as ``packed_input_masks``)."""
        import jax

        if len(arrays) != self.k:
            raise ValueError(f"HostStager(k={self.k}) got {len(arrays)}")
        a0 = np.asarray(arrays[0])
        ny, nx = a0.shape[-2:]
        ny_p, nx_p = padded_shape(ny, nx) if self.pad else (ny, nx)
        oshape = (self.k,) + a0.shape[:-2] + (ny_p, nx_p)
        if self._lp_shape != oshape:
            self._lp_values = np.empty(oshape, np.float32)
            self._lp_pmask = np.empty((self.k, ny_p, nx_p), np.uint32)
            self._lp_shape = oshape
        vals, pmask, self.counts = native.decode_pad_levpack_batch(
            arrays, ny_p, nx_p, self.undef, self.fill,
            out=self._lp_values, pmask=self._lp_pmask)
        dv = jax.device_put(vals, device)
        dp = jax.device_put(pmask, device)
        return [Field(dv[i], None) for i in range(self.k)], dp


def _stage_step(args, stager: HostStager, undef: float, on_tpu: bool,
                levpack: bool = False, align: bool = False):
    """Decode + pad one step's inputs onto the device (host-thread-safe:
    everything here is numpy + the native codec + async device_put).
    ``levpack=True`` (TPU, nlev <= 32) ships the 4 stack masks as one
    LEV-bit-packed uint32 block — nlev/32 of the mask payload.
    ``align=True`` re-grids ragged inputs onto the tile-aligned logical
    grid at ingest (ingest.py) — the product grid changes; map ratios
    are rescaled for the new spacing so physical gradients match."""
    import jax
    import jax.numpy as jnp

    tk, q, u, v, ps, alevel, blevel, xmapr, ymapr, fcoriolis = args
    tk = np.ascontiguousarray(tk, np.float32)
    nlev, ny, nx = tk.shape
    resampled = False
    if align:
        from .ingest import aligned_target, resample_align, resample_maps
        tgt = aligned_target(ny, nx)
        if tgt != (ny, nx):
            xmapr, ymapr = resample_maps(xmapr, ymapr, ny, nx, tgt)
            fcoriolis = resample_align(np.asarray(fcoriolis, np.float32),
                                       mask_aware=False)
            resampled = True

    packed = None
    if resampled:
        # fused native decode+re-grid straight into the staging block;
        # levpack input packing does not compose with the re-grid pass
        # (independent link optimizations — masks ship unpacked here)
        tkf, qf, uf, vf = stager.stage_resample(tk, q, u, v,
                                                shape_to=tgt)
        psp, psm, pc = native.decode_resample_batch(
            [np.asarray(ps, np.float32)], *tgt, undef)
        ps_ndef = pc[0]
        psf = Field(jnp.asarray(psp[0]), jnp.asarray(psm[0]))
        ny, nx = tgt
        ny_p, nx_p = padded_shape(ny, nx) if on_tpu else (ny, nx)
    else:
        ny_p, nx_p = padded_shape(ny, nx) if on_tpu else (ny, nx)
        if levpack and on_tpu and nlev <= 32:
            (tkf, qf, uf, vf), packed = stager.stage_levpack(tk, q, u, v)
        else:
            tkf, qf, uf, vf = stager.stage(tk, q, u, v)
        psp, psm, ps_ndef = native.decode_pad(np.asarray(ps, np.float32),
                                              ny_p, nx_p, undef)
        psf = Field(jnp.asarray(psp), jnp.asarray(psm))
    # the decode counts prove (or disprove) full definedness over the
    # LOGICAL points — the gate for the kernel's ALL_DEFINED fast path
    # (the reference's inAllDefined shortcut, FieldCalculations.cc:100)
    logical = nlev * ny * nx
    all_defined = (ps_ndef == ny * nx
                   and all(c == logical for c in stager.counts))

    def pad2(a):
        a = np.asarray(a, np.float32)
        return jnp.asarray(np.pad(a, ((0, ny_p - ny), (0, nx_p - nx)),
                                  mode="edge"))

    al = jnp.asarray(np.asarray(alevel, np.float32))
    bl = jnp.asarray(np.asarray(blevel, np.float32))
    return ((tkf, qf, uf, vf, psf, al, bl, pad2(xmapr), pad2(ymapr),
             pad2(fcoriolis)), (ny, nx), all_defined, packed)


def _compute_fetch(staged, shape, on_tpu: bool, all_defined: bool = False,
                   packed=None):
    """Dispatch the pipeline and fetch (values, masks) numpy stacks."""
    import jax

    if on_tpu:
        from .ops.fused import derived_fields_fused
        # the mask-mapped encode codec (encode_trim_batch mask_map=...)
        # consumes the kernel's native mask layouts directly: the
        # deduplicated 9-plane stack, the LEV-packed uint32 planes, or
        # the ALL_DEFINED fast path's 2 data-dependent planes (~23%
        # step time, PERF.md) — no plane-aligned 12-stack expansion on
        # device or host
        if packed is not None and not all_defined:
            # levpack staging: input masks arrived LEV-bit-packed; the
            # kernel consumes the planes directly and writes its masks
            # in the same packed layout (nlev/4 of the int8 fetch)
            out = derived_fields_fused(*staged, global_shape=shape,
                                       stacked=True, levpack_masks=True,
                                       packed_input_masks=packed)
        else:
            out = derived_fields_fused(*staged, global_shape=shape,
                                       stacked=True,
                                       all_defined=all_defined)
        return np.asarray(out.values), np.asarray(out.masks)
    from .models import derived_fields
    out = jax.jit(derived_fields)(*staged)
    return (np.stack([np.asarray(f.values) for f in out]),
            np.stack([np.asarray(f.mask) for f in out]))


def _encode_step(values, masks, ny, nx, undef) -> Dict[str, np.ndarray]:
    from .models.pipeline import DerivedFields, DerivedFieldsStacked

    mask_map = {12: None, 9: DerivedFieldsStacked.MASK9,
                2: DerivedFieldsStacked.MASK2}[masks.shape[0]]
    planes = native.encode_trim_batch(values, masks, ny, nx, undef,
                                      mask_map=mask_map)
    return dict(zip(DerivedFields._fields, planes))


def run_derived_fields_np(tk, q, u, v, ps, alevel, blevel, xmapr, ymapr,
                          fcoriolis, undef: float = UNDEF,
                          levpack: Optional[bool] = None,
                          align: Optional[bool] = None,
                          ) -> Dict[str, np.ndarray]:
    """The 12-output derived-field pipeline, numpy sentinel boundary to
    numpy sentinel boundary, on the production padded device layout.

    Inputs mirror :func:`mi_fieldcalc_tpu.models.derived_fields`
    (reference semantics per operator; see models/pipeline.py) but as
    sentinel-encoded numpy arrays; returns ``{name: [nlev, ny, nx]}``
    sentinel arrays for the 12 :class:`DerivedFields` outputs.

    The jnp fallback (off-TPU) fills edges at ARRAY extent, so it runs
    on the logical shape; the fused kernel takes ``global_shape`` and
    runs on the canonical padded layout.

    ``levpack`` (TPU, nlev <= 32): masks cross the host link
    LEV-bit-packed in BOTH directions — one uint32 plane per stack
    instead of nlev int8 planes (input payload /32, output mask fetch
    /8 at nlev=32; kernel step time is a wash, PERF.md item 4).
    Values are unchanged.  Default: the ``MF_STAGING_LEVPACK`` env var
    (unset = off).

    ``align`` (opt-in; default the ``MF_STAGING_ALIGN`` env var, unset
    = off): re-grid ragged inputs onto the canonical TILE-ALIGNED
    logical grid at ingest (mask-aware bilinear over the same physical
    extent, map ratios rescaled — see ingest.py).  The returned product
    grids are then the aligned shape (e.g. 719x929 -> 720x1024) and
    every device byte moved is a logical byte: the production path runs
    at the tile-aligned roofline fraction (~0.96 vs the ragged grid's
    ~0.88 structural ceiling, BENCH_r04), for the one-time cost of an
    ingest re-grid and a changed (documented) product grid.

    Interaction: when ``align`` actually re-grids, input masks ship
    UNPACKED even with ``levpack`` set — the LEV-bit-packing pass does
    not compose with the fused re-grid codec pass, so the nlev/32 input
    mask saving is traded for the aligned grid's ~12% whole-step wire
    saving (output-side packing is unaffected only in the sense that
    neither path packs outputs; see PERF.md "Aligned ingest").
    """
    import jax

    if levpack is None:
        import os
        levpack = os.environ.get("MF_STAGING_LEVPACK", "0") != "0"
    if align is None:
        import os
        align = os.environ.get("MF_STAGING_ALIGN", "0") != "0"
    on_tpu = jax.devices()[0].platform == "tpu"
    stager = _stager_cache(k=4, undef=undef, pad=on_tpu)
    staged, (ny, nx), all_defined, packed = _stage_step(
        (tk, q, u, v, ps, alevel, blevel, xmapr, ymapr, fcoriolis),
        stager, undef, on_tpu, levpack=levpack, align=align)
    values, masks = _compute_fetch(staged, (ny, nx), on_tpu, all_defined,
                                   packed)
    return _encode_step(values, masks, ny, nx, undef)


def stream_derived_fields_np(steps, undef: float = UNDEF,
                             levpack: Optional[bool] = None,
                             align: Optional[bool] = None):
    """Streaming executor: drive the pipeline over an iterable of input
    tuples (the 10 arguments of :func:`run_derived_fields_np`), yielding
    one output dict per step in order.

    Three-stage software pipeline on two worker threads: while the
    device computes step ``i``, one thread decodes+stages step ``i+1``
    (double-buffered :class:`HostStager` pair, so a buffer is never
    rewritten until the transfer that reads it has long completed) and
    another re-encodes step ``i-1``'s outputs to sentinel numpy.  The
    host codec is the serial bottleneck of serving-style use (PERF.md
    "Native batch staging"), so overlapping it with device time is the
    throughput lever on hosts with a discrete accelerator.  Measured
    caveat (PERF.md): on the CPU backend this is a LOSS (XLA:CPU
    compute contends for the codec threads' cores), and the tunneled
    test TPU serializes everything behind link transfer — the win is
    bound analysis (~1.4x at the operational grid) until a host with a
    local accelerator runs tools/perf_lab_staging.py.

    ``align``/``levpack`` as in :func:`run_derived_fields_np`
    (including their interaction: a re-gridding step ships unpacked
    input masks).
    """
    import concurrent.futures as cf

    import jax

    if levpack is None:
        import os
        levpack = os.environ.get("MF_STAGING_LEVPACK", "0") != "0"
    if align is None:
        import os
        align = os.environ.get("MF_STAGING_ALIGN", "0") != "0"
    on_tpu = jax.devices()[0].platform == "tpu"
    stagers = (HostStager(4, undef, pad=on_tpu),
               HostStager(4, undef, pad=on_tpu))
    it = iter(steps)
    try:
        first = next(it)
    except StopIteration:
        return
    with cf.ThreadPoolExecutor(1) as ex_in, \
            cf.ThreadPoolExecutor(1) as ex_out:
        fut_stage = ex_in.submit(_stage_step, first, stagers[0], undef,
                                 on_tpu, levpack, align)
        prev_encode = None
        i = 0
        while fut_stage is not None:
            staged, (ny, nx), all_defined, packed = fut_stage.result()
            nxt = next(it, None)
            fut_stage = None if nxt is None else ex_in.submit(
                _stage_step, nxt, stagers[(i + 1) % 2], undef, on_tpu,
                levpack, align)
            values, masks = _compute_fetch(staged, (ny, nx), on_tpu,
                                           all_defined, packed)
            if prev_encode is not None:
                yield prev_encode.result()
            prev_encode = ex_out.submit(_encode_step, values, masks,
                                        ny, nx, undef)
            i += 1
        yield prev_encode.result()


#: thread-local stager cache: the staging buffers are mutable per-step
#: state, so two threads calling run_derived_fields_np concurrently
#: must not share one block (thread B's decode would overwrite thread
#: A's inputs mid-flight) — each thread amortizes its own buffers.
_TLS = threading.local()


def _stager_cache(k: int, undef: float, pad: bool) -> HostStager:
    cache = getattr(_TLS, "stagers", None)
    if cache is None:
        cache = _TLS.stagers = {}
    key = (k, undef, pad)
    if key not in cache:
        cache[key] = HostStager(k, undef, pad=pad)
    return cache[key]


def run_hlevel_suite_np(tk, q, rh, ps, alevel, blevel,
                        temps=(), hums_q=(), hums_rh=(),
                        thes=(), ducts_q=(), ducts_rh=(),
                        undef: float = UNDEF,
                        align: Optional[bool] = None,
                        ) -> Dict[str, np.ndarray]:
    """The hybrid-level conversion suite, sentinel numpy to sentinel
    numpy — the drop-in replacement for looping one ``fc.hlevel*`` call
    per product.

    Inputs: ``[nlev, ny, nx]`` sentinel stacks (``q``/``rh`` may be
    ``None`` when no requested mode consumes them), ``(ny, nx)``
    surface pressure, per-level coefficients; request tuples as
    :func:`..ops.fused_suite.hlevel_suite_fused`.  On TPU the whole
    suite runs as ONE kernel pass on the canonical padded layout, with
    the decode counts auto-routing fully defined steps to the
    ALL_DEFINED fast path; off-TPU it falls back to the per-level jnp
    ops.  Returns ``{"temp3": ..., "hum_q1": ..., ...}`` keyed by
    family + compute, in request order.

    ``align`` (default the ``MF_STAGING_ALIGN`` env var): re-grid
    ragged inputs onto the tile-aligned logical grid at ingest, as in
    :func:`run_derived_fields_np` — the suite is pointwise, so only
    the product-grid change applies (no map-ratio rescale needed).
    """
    import jax
    import jax.numpy as jnp

    from .ops.fused_suite import _build_reqs, _consumes

    if align is None:
        import os
        align = os.environ.get("MF_STAGING_ALIGN", "0") != "0"
    on_tpu = jax.devices()[0].platform == "tpu"
    tk = np.ascontiguousarray(tk, np.float32)
    nlev, ny, nx = tk.shape
    resampled = False
    if align:
        from .ingest import aligned_target
        tgt = aligned_target(ny, nx)
        if tgt != (ny, nx):
            resampled = True
            ny, nx = tgt
    ny_p, nx_p = padded_shape(ny, nx) if on_tpu else (ny, nx)

    # same validation as the kernels (so CPU and TPU raise identically)
    reqs = _build_reqs("run_hlevel_suite_np", temps, hums_q, hums_rh,
                       thes, ducts_q, ducts_rh)
    need_q, need_rh = _consumes(reqs)
    if need_q and q is None:
        raise ValueError("run_hlevel_suite_np: a requested mode "
                         "consumes q but q is None")
    if need_rh and rh is None:
        raise ValueError("run_hlevel_suite_np: a requested mode "
                         "consumes rh but rh is None")

    placeholder = (Field(jnp.zeros((1, 1, 1), jnp.float32),
                         jnp.ones((1, 1, 1), bool)), 0)
    if resampled:
        # ONE fused native pass over every needed 3-D stack (the
        # batched call exists precisely to amortize the parallel-region
        # dispatch); ps separately (different shape)
        stacks = [tk] + ([np.ascontiguousarray(q, np.float32)]
                         if need_q else []) \
            + ([np.ascontiguousarray(rh, np.float32)] if need_rh else [])
        v3, m3, c3 = native.decode_resample_batch(stacks, ny_p, nx_p,
                                                  undef)
        fields = [(Field(jnp.asarray(v3[i]), jnp.asarray(m3[i])), c3[i])
                  for i in range(len(stacks))]
        it = iter(fields)
        tkf, n_t = next(it)
        qf, n_q = next(it) if need_q else placeholder
        rhf, n_r = next(it) if need_rh else placeholder
        vp, mp, cp_ = native.decode_resample_batch(
            [np.ascontiguousarray(ps, np.float32)], ny_p, nx_p, undef)
        psv, psm, n_ps = vp[0], mp[0], cp_[0]
    else:
        def dec3(a, needed):
            if not needed:
                # pruned by the kernel; a tiny placeholder never moves
                return placeholder
            v, m, n_def = native.decode_pad(
                np.ascontiguousarray(a, np.float32), ny_p, nx_p, undef)
            return Field(jnp.asarray(v), jnp.asarray(m)), n_def

        tkf, n_t = dec3(tk, True)
        qf, n_q = dec3(q, need_q)
        rhf, n_r = dec3(rh, need_rh)
        psv, psm, n_ps = native.decode_pad(
            np.ascontiguousarray(ps, np.float32), ny_p, nx_p, undef)
    psf = Field(jnp.asarray(psv), jnp.asarray(psm))

    logical = nlev * ny * nx
    all_defined = (n_t == logical and n_ps == ny * nx
                   and (not need_q or n_q == logical)
                   and (not need_rh or n_r == logical))

    kw = dict(temps=tuple(temps), hums_q=tuple(hums_q),
              hums_rh=tuple(hums_rh), thes=tuple(thes),
              ducts_q=tuple(ducts_q), ducts_rh=tuple(ducts_rh))
    if on_tpu:
        from .ops.fused_suite import hlevel_suite_fused
        outs = hlevel_suite_fused(
            tkf, qf, rhf, psf, np.asarray(alevel, np.float32),
            np.asarray(blevel, np.float32),
            all_defined=all_defined,
            global_shape=(ny, nx) if all_defined else None, **kw)
    else:
        from .ops import (hlevelducting, hlevelhum,
                          hlevelthe, hleveltemp)
        al = [float(a) for a in np.asarray(alevel)]
        bl = [float(b) for b in np.asarray(blevel)]

        def lvl(f, k):
            return Field(f.values[k], f.mask[k])

        def stack(make):
            fs = [make(k) for k in range(nlev)]
            return Field(jnp.stack([f.values for f in fs]),
                         jnp.stack([f.mask for f in fs]))

        outs = []
        for fam, c in reqs:
            if fam == "temp":
                outs.append(stack(lambda k, c=c: hleveltemp(
                    lvl(tkf, k), psf, al[k], bl[k], compute=c)))
            elif fam in ("hum_q", "hum_rh"):
                h = qf if fam == "hum_q" else rhf
                outs.append(stack(lambda k, c=c, h=h: hlevelhum(
                    lvl(tkf, k), lvl(h, k), psf, al[k], bl[k],
                    compute=c)))
            elif fam == "the":
                outs.append(stack(lambda k, c=c: hlevelthe(
                    lvl(tkf, k), lvl(qf, k), psf, al[k], bl[k],
                    compute=c)))
            else:
                h = qf if fam == "duct_q" else rhf
                outs.append(stack(lambda k, c=c, h=h: hlevelducting(
                    lvl(tkf, k), lvl(h, k), psf, al[k], bl[k],
                    compute=c)))

    from .ops.fused_suite import _gate_kind
    result = {}
    for (fam, c), f in zip(reqs, outs):
        if on_tpu and all_defined and _gate_kind(fam, c) is None:
            # constant-defined output: plain trim, no mask fetch (the
            # region-gated ones mask encodes nothing in the logical
            # region by construction)
            arr = np.asarray(f.values)[..., :ny, :nx].copy()
        else:
            arr = native.encode_trim(np.asarray(f.values),
                                     np.asarray(f.mask), ny, nx, undef)
        result[f"{fam}{c}"] = arr
    return result


def run_vessel_icing_np(sal, wave, x_wind, y_wind, airtemp, rh, sst, p,
                        pw, aice, depth,
                        vs: float, alpha: float, zmin: float, zmax: float,
                        alt: int = 1,
                        products=("overland", "mertins", "modstall",
                                  "mincog"),
                        undef: float = UNDEF,
                        align: Optional[bool] = None,
                        ) -> Dict[str, np.ndarray]:
    """All requested vessel-icing products from ONE decode of the shared
    inputs — the production form of the reference's per-product
    `vesselIcing*` calls (each re-reading the same 11 sentinel grids).

    Inputs: ``(ny, nx)`` sentinel arrays (the ModStall/MINCOG set;
    Overland/Mertins use the ``airtemp/sst/x_wind/y_wind/sal/aice``
    subset); scalars as :func:`..api.vesselIcingMincog`.  On TPU the
    solver products run their fused VMEM kernels (auto-selected, as in
    the drop-in api).  Returns ``{product: sentinel array}``.

    ``align`` (default the ``MF_STAGING_ALIGN`` env var): re-grid the
    ragged inputs onto the tile-aligned logical grid at ingest
    (:mod:`..ingest`) — the icing products are pointwise, so only the
    product-grid change applies; outputs are then the aligned shape.
    """
    import jax.numpy as jnp

    from .api import _icing_mincog_auto, _icing_modstall_auto
    from .ops import vessel_icing_mertins, vessel_icing_overland

    known = ("overland", "mertins", "modstall", "mincog")
    for prod in products:
        if prod not in known:
            raise ValueError(f"run_vessel_icing_np: unknown product "
                             f"{prod!r} (known: {known})")

    if align is None:
        import os
        align = os.environ.get("MF_STAGING_ALIGN", "0") != "0"

    # one decode pass for all 11 shared inputs (the icing kernels pad
    # internally, so the stager stays at the logical extent)
    arrays = [np.ascontiguousarray(a, np.float32) for a in
              (sal, wave, x_wind, y_wind, airtemp, rh, sst, p, pw,
               aice, depth)]
    ny, nx = arrays[0].shape[-2:]
    resampled = False
    if align:
        from .ingest import aligned_target
        tgt = aligned_target(ny, nx)
        resampled = tgt != (ny, nx)
    if resampled:
        # ONE fused native decode+re-grid pass over all 11 inputs
        v, m, _ = native.decode_resample_batch(arrays, tgt[0], tgt[1],
                                               undef)
        (salf, wavef, xwf, ywf, atf, rhf, sstf, pf, pwf, aicef,
         depthf) = [Field(jnp.asarray(v[i]), jnp.asarray(m[i]))
                    for i in range(len(arrays))]
    else:
        stager = _stager_cache(k=11, undef=undef, pad=False)
        (salf, wavef, xwf, ywf, atf, rhf, sstf, pf, pwf, aicef,
         depthf) = stager.stage(*arrays)

    result = {}
    for prod in products:
        if prod == "overland":
            f = vessel_icing_overland(atf, sstf, xwf, ywf, salf, aicef)
        elif prod == "mertins":
            f = vessel_icing_mertins(atf, sstf, xwf, ywf, salf, aicef)
        elif prod == "modstall":
            f = _icing_modstall_auto(salf, wavef, xwf, ywf, atf, rhf,
                                     sstf, pf, pwf, aicef, depthf,
                                     vs, alpha, zmin, zmax)
        else:
            f = _icing_mincog_auto(salf, wavef, xwf, ywf, atf, rhf,
                                   sstf, pf, pwf, aicef, depthf,
                                   vs, alpha, zmin, zmax, alt)
        result[prod] = native.encode(np.asarray(f.values),
                                     np.asarray(f.mask), undef)
    return result
