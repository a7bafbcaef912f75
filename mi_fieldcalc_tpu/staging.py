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

from typing import Dict, List, Optional

import numpy as np

from . import native
from .field import UNDEF, Field
from .layout import padded_shape

__all__ = ["HostStager", "run_derived_fields_np"]


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


def run_derived_fields_np(tk, q, u, v, ps, alevel, blevel, xmapr, ymapr,
                          fcoriolis, undef: float = UNDEF,
                          ) -> Dict[str, np.ndarray]:
    """The 12-output derived-field pipeline, numpy sentinel boundary to
    numpy sentinel boundary, on the production padded device layout.

    Inputs mirror :func:`mi_fieldcalc_tpu.models.derived_fields`
    (reference semantics per operator; see models/pipeline.py) but as
    sentinel-encoded numpy arrays; returns ``{name: [nlev, ny, nx]}``
    sentinel arrays for the 12 :class:`DerivedFields` outputs.
    """
    import jax
    import jax.numpy as jnp

    from .models.pipeline import DerivedFields

    tk = np.ascontiguousarray(tk, np.float32)
    nlev, ny, nx = tk.shape
    on_tpu = jax.devices()[0].platform == "tpu"
    # the jnp fallback fills edges at ARRAY extent, so it must run on
    # the logical shape; the fused kernel takes global_shape and runs
    # on the canonical padded layout
    ny_p, nx_p = padded_shape(ny, nx) if on_tpu else (ny, nx)

    stager = _stager_cache(k=4, undef=undef, pad=on_tpu)
    tkf, qf, uf, vf = stager.stage(tk, q, u, v)
    psp, psm, _ = native.decode_pad(np.asarray(ps, np.float32),
                                    ny_p, nx_p, undef)
    psf = Field(jnp.asarray(psp), jnp.asarray(psm))

    def pad2(a):
        a = np.asarray(a, np.float32)
        return jnp.asarray(np.pad(a, ((0, ny_p - ny), (0, nx_p - nx)),
                                  mode="edge"))

    al = jnp.asarray(np.asarray(alevel, np.float32))
    bl = jnp.asarray(np.asarray(blevel, np.float32))
    xm, ym, fc = pad2(xmapr), pad2(ymapr), pad2(fcoriolis)

    if on_tpu:
        from .ops.fused import derived_fields_fused
        out = derived_fields_fused(tkf, qf, uf, vf, psf, al, bl, xm, ym,
                                   fc, global_shape=(ny, nx), stacked=True)
        values = np.asarray(out.values)
        masks = np.asarray(out.masks)
    else:
        from .models import derived_fields
        out = jax.jit(derived_fields)(tkf, qf, uf, vf, psf, al, bl,
                                      xm, ym, fc)
        values = np.stack([np.asarray(f.values) for f in out])
        masks = np.stack([np.asarray(f.mask) for f in out])

    planes = native.encode_trim_batch(values, masks, ny, nx, undef)
    return dict(zip(DerivedFields._fields, planes))


_STAGERS: Dict[tuple, HostStager] = {}


def _stager_cache(k: int, undef: float, pad: bool) -> HostStager:
    key = (k, undef, pad)
    if key not in _STAGERS:
        _STAGERS[key] = HostStager(k, undef, pad=pad)
    return _STAGERS[key]
