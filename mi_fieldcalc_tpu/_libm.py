"""Platform-deterministic f32 transcendentals (round 4).

XLA:TPU's pow/log/log10 are coarse approximations (the round-4 on-TPU
golden pass measured logField ~3000 ulp and pow-heavy conversions
~30-60 ulp off the host-libm oracle — TPUTEST_r04 "golden_jnp_tpu"),
and the icing solvers showed that last-ulp libm drift amplifies through
sensitive stages.  These Cephes-structured implementations use ONLY
mul/add/select/int/bitcast, so XLA:CPU, XLA:TPU, and Mosaic lower them
to the same arithmetic:

* every backend computes the same bits (Mosaic-vs-XLA probed bitwise
  on chip, PRECISION.md "TPU revalidation");
* accuracy is libm-class — exp ≤1 ulp (bitwise equal to XLA:CPU expf
  on 400k samples), log ≤0.9 ulp, tanh ≤1.3 ulp, the pow composition
  ≤~5 ulp over (1e-6, 1e6) — so TPU results inherit the CPU-calibrated
  conformance the goldens were tuned against.

Constants are the public-domain Cephes expf/logf/tanhf reduction
constants.  All functions are elementwise jnp and safe inside Pallas
kernels (no gather, no i1 vectors, non-negative shifts).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["exp_f32", "tanh_f32", "log_f32", "log10_f32", "pow_f32",
           "pow10_f32", "pow_posc_f32"]

_f32 = jnp.float32

#: ln2 split (Cephes C1/C2) and log2(e)
_LOG2E = 1.44269504088896341
_LN2_HI = 0.693359375
_LN2_LO = -2.12194440e-4
#: 1/ln10
_LOG10E = 0.43429448190325176


def exp_f32(x):
    """Cephes expf: reduce by ln2 (hi/lo), degree-5 minimax, 2^k by a
    two-factor exponent bitcast (gradual underflow, natural inf)."""
    # clamp to the saturated region first: beyond it the answer is
    # exactly 0/inf, and the ln2 reduction's cancellation is garbage
    # for |x| >> 1e4 (z*ln2_hi no longer tracks x)
    x = jnp.clip(x, _f32(-104.0), _f32(89.5))
    z = jnp.floor(_f32(_LOG2E) * x + _f32(0.5))
    r = x - z * _f32(_LN2_HI)
    r = r - z * _f32(_LN2_LO)
    p = _f32(1.9875691500e-4)
    p = p * r + _f32(1.3981999507e-3)
    p = p * r + _f32(8.3334519073e-3)
    p = p * r + _f32(4.1665795894e-2)
    p = p * r + _f32(1.6666665459e-1)
    p = p * r + _f32(5.0000001201e-1)
    e = r * r * p + r + _f32(1.0)
    # 2^k in TWO bitcast factors (k = n1 + n2, each in normal range):
    # the product underflows gradually through the subnormal band and
    # overflows to inf exactly where libm expf does — no special cases
    n = jnp.clip(z, -252.0, 254.0).astype(jnp.int32)
    n1 = n // 2
    n2 = n - n1
    s1 = lax.bitcast_convert_type(
        ((n1 + 127) << 23).astype(jnp.int32), jnp.float32)
    s2 = lax.bitcast_convert_type(
        ((n2 + 127) << 23).astype(jnp.int32), jnp.float32)
    return (e * s1) * s2


def tanh_f32(x):
    """Cephes tanhf: odd minimax polynomial for |x| < 0.625, else
    1 - 2/(e^{2|x|}+1) with the sign restored."""
    ax = jnp.abs(x)
    z2 = x * x
    p = _f32(-5.70498872745e-3)
    p = p * z2 + _f32(2.06390887954e-2)
    p = p * z2 - _f32(5.37397155531e-2)
    p = p * z2 + _f32(1.33314422036e-1)
    p = p * z2 - _f32(3.33332819422e-1)
    small = z2 * x * p + x
    big = _f32(1.0) - _f32(2.0) / (exp_f32(_f32(2.0) * ax) + _f32(1.0))
    big = jnp.where(x < 0, -big, big)
    out = jnp.where(ax < _f32(0.625), small, big)
    return jnp.where(ax > _f32(9.0), jnp.sign(x), out)


def log_f32(x):
    """Cephes logf: mantissa in [sqrt(1/2), sqrt(2)), degree-8 minimax,
    e*ln2 re-added in two parts.  Domain edges follow libm: log(0) =
    -inf, log(negative) = nan (propagated through the mask lanes the
    same way jnp.log's were)."""
    xi = lax.bitcast_convert_type(x, jnp.int32)
    e = ((xi >> 23) & 0xFF) - 126
    m = lax.bitcast_convert_type(
        (xi & 0x007FFFFF) | (126 << 23), jnp.float32)
    big = m > _f32(0.70710678118654752440)
    m = jnp.where(big, m, m * _f32(2.0))
    e = jnp.where(big, e, e - 1).astype(jnp.float32)
    z = m - _f32(1.0)
    p = _f32(7.0376836292e-2)
    p = p * z - _f32(1.1514610310e-1)
    p = p * z + _f32(1.1676998740e-1)
    p = p * z - _f32(1.2420140846e-1)
    p = p * z + _f32(1.4249322787e-1)
    p = p * z - _f32(1.6668057665e-1)
    p = p * z + _f32(2.0000714765e-1)
    p = p * z - _f32(2.4999993993e-1)
    p = p * z + _f32(3.3333331174e-1)
    zz = z * z
    r = z + (z * zz * p - zz * _f32(0.5))
    r = r + e * _f32(_LN2_LO)
    r = r + e * _f32(_LN2_HI)
    # libm edges: the bit-field path above would return garbage for
    # zero/negative/non-finite inputs.  Subnormal positives (no
    # implicit mantissa bit) fall back to the backend log — they never
    # occur on the physical op domains, and the fallback keeps the
    # extreme tail exact instead of silently wrong.
    r = jnp.where(x < _f32(1.1754944e-38), jnp.log(x), r)
    r = jnp.where(x > 0, r, jnp.where(x == 0, -jnp.inf, jnp.nan))
    return jnp.where(jnp.isfinite(x), r, jnp.where(x > 0, x, jnp.nan))


def log10_f32(x):
    return log_f32(x) * _f32(_LOG10E)


def pow_f32(x, c):
    """x**c for static float ``c`` as exp(c*log x) on the positive
    interior; zero/negative bases keep jnp.power's semantics (integer-
    exponent sign rules, 0**c edges), which only those edge lanes see.

    Accuracy envelope: the singly-rounded product c*log(x) costs
    ~0.15 ulp per unit of |c*ln x| — ≤~5 ulp on every production
    exponent domain (kappa over pressure ratios, 0.16 over wind
    speeds, powerField over field magnitudes), and still an order of
    magnitude tighter than XLA:TPU's native power.  If a future op
    needs large |c*ln x| at ≤2 ulp, do the Cephes base-2 reduction as
    in :func:`pow10_f32` with a two-product c*log2(x)."""
    r = exp_f32(_f32(c) * log_f32(x))
    return jnp.where(x > 0, r, jnp.power(x, _f32(c)))


def pow_posc_f32(x, c):
    """Narrow-domain ``x**c`` for a static ``c``: the hot-kernel tier of
    the deterministic pow (round 5, VERDICT r4 item 4).

    Contract (vs the general :func:`pow_f32`):

    * POSITIVE-domain only — ``x`` is clamped to the normal range
      ``[2^-126, inf)`` first, so zero/negative/NaN bases produce
      finite garbage instead of libm edge values.  Callers gate those
      lanes (mask semantics never flow through the value plane).
    * ``|c * log2(x)|`` must stay within ~120 (single bitcast exponent
      scale, no gradual underflow).  The Exner domain is |t| <= ~5;
      the sentinel 1e35 through kappa is ~33.
    * accuracy <= ~2.5 ulp on the Exner domain (measured in
      tests/test_libm.py), vs ~5 ulp for the exp∘log composition.

    Why it is cheaper than ``exp_f32(c*log_f32(x))``: base-2 reduction
    with an EXACT integer split.  ``t = c*log2 x`` is assembled as
    ``c_hi*e`` (exact: 12-bit ``c_hi`` times a small integer) plus a
    small residual, the exponent integer ``n = round(t)`` is removed
    from the exact term before rounding can eat it, and ``2^f`` uses
    one Cephes poly — dropping pow_f32's in-kernel baggage: log_f32's
    subnormal ``jnp.log`` fallback and nan/inf edge selects, exp_f32's
    clamp + two-step ln2 reduction, and the ``jnp.power`` fallback
    branch (all evaluated on every lane under ``where``).  Arithmetic
    is mul/add/select/int/bitcast only — bitwise identical across
    XLA:CPU, XLA:TPU, and Mosaic like the rest of this module, so the
    flagship kernel and the jnp op surface share one result.
    """
    c_d = float(c)
    c_hi = float(np.float32(round(c_d * 4096.0) / 4096.0))  # 12-bit hi
    c_lo = float(np.float32(c_d) - np.float32(c_hi))        # exact tail
    c_l2e = float(np.float32(c_d * _LOG2E))                 # c/ln2
    x = jnp.maximum(jnp.asarray(x, jnp.float32), _f32(1.1754944e-38))
    xi = lax.bitcast_convert_type(x, jnp.int32)
    e = ((xi >> 23) & 0xFF) - 126
    m = lax.bitcast_convert_type(
        (xi & 0x007FFFFF) | (126 << 23), jnp.float32)
    big = m > _f32(0.70710678118654752440)
    m = jnp.where(big, m, m * _f32(2.0))
    e = jnp.where(big, e, e - 1)
    z = m - _f32(1.0)
    p = _f32(7.0376836292e-2)
    p = p * z - _f32(1.1514610310e-1)
    p = p * z + _f32(1.1676998740e-1)
    p = p * z - _f32(1.2420140846e-1)
    p = p * z + _f32(1.4249322787e-1)
    p = p * z - _f32(1.6668057665e-1)
    p = p * z + _f32(2.0000714765e-1)
    p = p * z - _f32(2.4999993993e-1)
    p = p * z + _f32(3.3333331174e-1)
    zz = z * z
    lnm = z + (z * zz * p - zz * _f32(0.5))   # ln(m), |.| <= 0.347
    ef = e.astype(jnp.float32)
    th = _f32(c_hi) * ef                      # EXACT (12-bit x int)
    r = _f32(c_lo) * ef + _f32(c_l2e) * lnm   # small residual
    t = th + r
    n = jnp.floor(t + _f32(0.5))
    f = (th - n) + r                          # near-exact fraction
    w = f * _f32(0.693147180559945309)        # f*ln2, |w| <= ~0.36
    q = _f32(1.9875691500e-4)
    q = q * w + _f32(1.3981999507e-3)
    q = q * w + _f32(8.3334519073e-3)
    q = q * w + _f32(4.1665795894e-2)
    q = q * w + _f32(1.6666665459e-1)
    q = q * w + _f32(5.0000001201e-1)
    e2 = w * w * q + w + _f32(1.0)
    ni = jnp.clip(n, -126.0, 127.0).astype(jnp.int32)
    s = lax.bitcast_convert_type(
        ((ni + 127) << 23).astype(jnp.int32), jnp.float32)
    return e2 * s


def pow10_f32(x):
    """10**x, Cephes exp10f reduction: split off an exact power of two
    (x = px*log10(2) + w, |w| <= log10(2)/2) so no large-magnitude
    product is ever rounded — ~2 ulp across the full f32 range."""
    x = jnp.clip(x, _f32(-46.0), _f32(39.0))     # saturated beyond
    px = jnp.floor(_f32(3.32192809488736235) * x + _f32(0.5))
    w = x - px * _f32(3.01025390625e-1)      # log10(2) hi (exact bits)
    w = w - px * _f32(4.605038981195213739e-6)   # log10(2) lo
    e = exp_f32(w * _f32(2.302585092994046))     # |w*ln10| <= 0.35
    n = jnp.clip(px, -252.0, 254.0).astype(jnp.int32)
    n1 = n // 2
    n2 = n - n1
    s1 = lax.bitcast_convert_type(
        ((n1 + 127) << 23).astype(jnp.int32), jnp.float32)
    s2 = lax.bitcast_convert_type(
        ((n2 + 127) << 23).astype(jnp.int32), jnp.float32)
    return (e * s1) * s2
