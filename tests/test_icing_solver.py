"""MINCOG root-solver equivalence: safeguarded Newton vs the reference's
fixed-17-step bisection (FieldCalculationsVesselIcing.cc:381-415).

The production path solves the freezing-fraction heat balance with
``_rtsafe_lanes`` (analytic-derivative Newton inside the sign-change
bracket); the reference semantics are the fixed bisection.  Both must land
on the same root far inside the conformance tolerance (2e-3), including
the no-sign-change => 0 lanes, and the end-to-end op must agree between
the two solver paths.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mi_fieldcalc_tpu.ops import icing as ic
from mi_fieldcalc_tpu import from_sentinel


def _physical_lanes(rng, n):
    """Randomized physically-plausible MINCOG residual parameters."""
    return dict(
        sw=rng.uniform(5.0, 40.0, n).astype(np.float32),        # salinity
        ta=rng.uniform(-25.0, 2.0, n).astype(np.float32),       # air T (C)
        ha=rng.uniform(20.0, 400.0, n).astype(np.float32),
        he=rng.uniform(0.05, 1.2, n).astype(np.float32),
        ea=rng.uniform(0.5, 12.0, n).astype(np.float32),
        rh=rng.uniform(0.3, 1.0, n).astype(np.float32),
        rw=rng.uniform(1e-4, 0.5, n).astype(np.float32),
        tsp=rng.uniform(-10.0, 6.0, n).astype(np.float32),
        lwdown=rng.uniform(150.0, 320.0, n).astype(np.float32),
        swdown=np.zeros(n, np.float32),
    )


def test_rtsafe_matches_bisection_roots():
    rng = np.random.default_rng(7)
    n = 4096
    par = {k: jnp.asarray(v) for k, v in _physical_lanes(rng, n).items()}
    rest = (par["sw"], par["ta"], par["ha"], par["he"], par["ea"],
            par["rh"], par["rw"], par["tsp"], par["lwdown"], par["swdown"])

    def f(x):
        return ic._freeze_frac_zero(x, *rest)

    r_bis = np.asarray(ic._bisection_lanes(f, (n,), ic._BISECT_A,
                                           ic._BISECT_B))

    # production path: safeguarded Newton on the ts-space residual over
    # the salinity-dependent bracket, mapped back to a freezing fraction
    ts_hi = ic._ts_of_n(ic._BISECT_A, par["sw"])
    ts_lo = ic._ts_of_n(ic._BISECT_B, par["sw"])

    def fg(ts):
        r, dr, _ = ic._freeze_frac_ts(ts, *rest)
        return r, dr

    ts_root = ic._rtsafe_lanes(fg, ts_lo, ts_hi)
    _, _, n_ts = ic._freeze_frac_ts(ts_root, *rest)
    r_new = np.where(np.isnan(np.asarray(ts_root)), 0.0, np.asarray(n_ts))

    # no-root lanes agree exactly (both 0)
    zero_b = r_bis == 0.0
    zero_n = r_new == 0.0
    np.testing.assert_array_equal(zero_b, zero_n)
    # rooted lanes: both within the reference's own bracket tolerance
    # (1.8 / 2^17 ~ 1.4e-5) of each other
    sel = ~zero_b
    assert sel.sum() > 100, "test inputs produced too few rooted lanes"
    np.testing.assert_allclose(r_new[sel], r_bis[sel], atol=5e-5)


def test_gradient_is_consistent():
    rng = np.random.default_rng(11)
    n = 2048
    par = {k: jnp.asarray(v) for k, v in _physical_lanes(rng, n).items()}
    x = jnp.asarray(rng.uniform(-0.45, 1.25, n).astype(np.float32))

    def fg(x):
        return ic._freeze_frac_zero(x, par["sw"], par["ta"], par["ha"],
                                    par["he"], par["ea"], par["rh"],
                                    par["rw"], par["tsp"], par["lwdown"],
                                    par["swdown"], with_grad=True)

    f0, g = fg(x)
    eps = 1e-3
    f1, _ = fg(x + eps)
    fm, _ = fg(x - eps)
    num = (np.asarray(f1) - np.asarray(fm)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g), num, rtol=2e-2, atol=2e-2)


def test_mincog_end_to_end_solver_paths_agree(monkeypatch):
    rng = np.random.default_rng(3)
    shape = (12, 16)

    def F(lo, hi):
        return from_sentinel(rng.uniform(lo, hi, shape).astype(np.float32))

    args = (F(5, 35), F(0.5, 8), F(-20, 20), F(-20, 20), F(-25, 0),
            F(0.3, 1.0), F(-1, 8), F(950, 1040), F(4, 12), F(0, 0.3),
            F(20, 300))
    kw = dict(vs=5.0, alpha=90.0, zmin=2.0, zmax=4.0, alt=2)

    monkeypatch.setenv("MF_MINCOG_BISECT", "1")
    ref = ic.vessel_icing_mincog(*args, **kw)
    monkeypatch.delenv("MF_MINCOG_BISECT")
    out = ic.vessel_icing_mincog(*args, **kw)
    np.testing.assert_array_equal(np.asarray(out.mask), np.asarray(ref.mask))
    np.testing.assert_allclose(np.asarray(out.values)[np.asarray(out.mask)],
                               np.asarray(ref.values)[np.asarray(ref.mask)],
                               rtol=1e-4, atol=1e-5)


def test_regula_falsi_lanes_matches_scalar_replay():
    """regula_falsi_lanes reproduces the reference's Illinois recurrence
    (VI:417-448) lane-for-lane: compare against a scalar Python replay
    of the same update rule on a batch of brackets/functions."""
    import numpy as np
    from mi_fieldcalc_tpu.ops.icing import regula_falsi_lanes

    def scalar_replay(f, a, b, eps, iters=100):
        side = 0
        ffa, ffb = f(a), f(b)
        c = a
        same = lambda x, y: (x > 0) == (y > 0)
        for _ in range(iters):
            c = (ffa * b - ffb * a) / (ffa - ffb)
            if abs(b - a) < eps * abs(b + a):
                break
            ffc = f(c)
            if same(ffc, ffb):
                b, ffb = c, ffc
                if side == -1:
                    ffa /= 2
                side = -1
            elif same(ffa, ffc):
                a, ffa = c, ffc
                if side == 1:
                    ffb /= 2
                side = 1
            else:
                break
        return c

    # one vector function evaluated lane-wise: cubic, transcendental,
    # and a linear lane (converges in one step)
    def fvec(x):
        return jnp.stack([x[0] ** 3 - 2 * x[0] - 5.0,
                          jnp.cos(x[1]) - x[1],
                          2.0 * x[2] - 1.0])

    a = np.array([1.0, 0.0, -3.0], np.float32)
    b = np.array([3.0, 2.0, 4.0], np.float32)
    eps = 1e-6
    got = np.asarray(regula_falsi_lanes(fvec, a, b, eps))

    fs = [lambda x: x ** 3 - 2 * x - 5.0,
          lambda x: np.cos(x) - x,
          lambda x: 2.0 * x - 1.0]
    want = [scalar_replay(
        lambda x, f=f: np.float32(f(np.float32(x))),
        np.float32(a[i]), np.float32(b[i]), np.float32(eps))
        for i, f in enumerate(fs)]
    np.testing.assert_allclose(got, np.asarray(want, np.float32),
                               rtol=0, atol=2e-6)
    # the roots are right, not just self-consistent
    np.testing.assert_allclose(
        got, [2.0945515, 0.7390851, 0.5], rtol=2e-5)
