"""Equivalence of the fused level-conversion suite kernel
(ops/fused_suite.py) with the jnp ops it traces.

The kernel traces the exact ``levels.aleveltemp`` / ``levels.alevelhum``
implementations in-kernel with the lane-gather table override
(constants.ewt_pair_impl) and the esat trace memo (thermo.esat_memo) —
both are exact-table-value implementations, so interpret-mode results
are bitwise identical to the jitted jnp ops.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mi_fieldcalc_tpu.field import UNDEF, Field, from_sentinel
from mi_fieldcalc_tpu.ops import alevelhum, aleveltemp
from mi_fieldcalc_tpu.ops.fused_suite import alevel_suite_fused


def _inputs(nlev=3, ny=25, nx=140, seed=0):
    rng = np.random.default_rng(seed)

    def sent(lo, hi, frac=0.03):
        a = rng.uniform(lo, hi, (nlev, ny, nx)).astype(np.float32)
        a[rng.random(a.shape) < frac] = UNDEF
        return from_sentinel(a)

    tk = sent(250, 300)
    v = np.asarray(tk.values).copy()
    v[0, 2, 2] = 520.0            # beyond the e_sat table: ok gate
    tk = Field(jnp.asarray(v), tk.mask)
    return tk, sent(1e-4, 1e-2), sent(5, 95), sent(300, 1000)


@pytest.mark.parametrize("temps,hq,hr", [
    ((3, 4), (1, 5, 9), (3, 7, 11)),    # BASELINE config-2 suite
    ((3, 4), (1, 7, 11), (3, 5, 9)),    # cross-pairing (degenerate
                                        # clamp paths still bitwise)
    ((1, 2, 5), (), ()),                # temperature-only, incl. theta-in
    ((), (2, 6, 10), (4, 8, 12)),       # theta-input humidity modes
])
def test_suite_kernel_matches_jnp(temps, hq, hr):
    tk, q, rh, p = _inputs(seed=len(temps) + len(hq))
    got = alevel_suite_fused(tk, q, rh, p, temps=temps, hums_q=hq,
                             hums_rh=hr, interpret=True)
    ref = [jax.jit(lambda tk, p, c=c: aleveltemp(tk, p, compute=c))(tk, p)
           for c in temps]
    ref += [jax.jit(lambda tk, h, p, c=c:
                    alevelhum(tk, h, p, compute=c))(tk, q, p) for c in hq]
    ref += [jax.jit(lambda tk, h, p, c=c:
                    alevelhum(tk, h, p, compute=c))(tk, rh, p) for c in hr]
    assert len(got) == len(ref)
    for k, (r, g) in enumerate(zip(ref, got)):
        rm = np.asarray(r.mask)
        assert np.array_equal(rm, np.asarray(g.mask)), (k, "mask")
        assert np.array_equal(np.asarray(r.values)[rm],
                              np.asarray(g.values)[rm]), (k, "values")


def test_suite_kernel_padded_layout():
    """Pointwise suite on the canonical padded layout: dead-lane masks
    stay False through the input-mask ANDs with no extra arguments."""
    from mi_fieldcalc_tpu.layout import pad_field

    nlev, ny, nx = 2, 21, 150
    tk, q, rh, p = _inputs(nlev, ny, nx, seed=9)
    ref = alevel_suite_fused(tk, q, rh, p, temps=(3,), hums_q=(1, 11),
                             interpret=True)
    pf = [pad_field(f) for f in (tk, q, rh, p)]
    got = alevel_suite_fused(*pf, temps=(3,), hums_q=(1, 11),
                             interpret=True)
    for r, g in zip(ref, got):
        gm = np.asarray(g.mask)
        assert not gm[..., ny:, :].any() and not gm[..., :, nx:].any()
        rm = np.asarray(r.mask)
        assert np.array_equal(rm, gm[..., :ny, :nx])
        assert np.array_equal(np.asarray(r.values)[rm],
                              np.asarray(g.values)[..., :ny, :nx][rm])


def test_suite_kernel_validation():
    tk, q, rh, p = _inputs()
    with pytest.raises(ValueError):
        alevel_suite_fused(tk, q, rh, p)              # nothing requested
    with pytest.raises(ValueError):
        alevel_suite_fused(tk, q, rh, p, temps=(9,))  # bad compute


def test_suite_kernel_the_and_ducting():
    """The suite kernel covers the whole pointwise a-level family: THE
    and ducting modes trace to the same jnp ops bitwise."""
    from mi_fieldcalc_tpu.ops import alevelducting, alevelthe

    tk, q, rh, p = _inputs(seed=3)
    got = alevel_suite_fused(tk, q, rh, p, temps=(3,), thes=(1, 2),
                             ducts_q=(1, 2), ducts_rh=(3, 4),
                             interpret=True)
    ref = [jax.jit(lambda tk, p: aleveltemp(tk, p, compute=3))(tk, p)]
    ref += [jax.jit(lambda tk, q, p, c=c:
                    alevelthe(tk, q, p, compute=c))(tk, q, p)
            for c in (1, 2)]
    ref += [jax.jit(lambda tk, h, p, c=c:
                    alevelducting(tk, h, p, compute=c))(tk, q, p)
            for c in (1, 2)]
    ref += [jax.jit(lambda tk, h, p, c=c:
                    alevelducting(tk, h, p, compute=c))(tk, rh, p)
            for c in (3, 4)]
    for k, (r, g) in enumerate(zip(ref, got)):
        rm = np.asarray(r.mask)
        assert np.array_equal(rm, np.asarray(g.mask)), (k, "mask")
        assert np.array_equal(np.asarray(r.values)[rm],
                              np.asarray(g.values)[rm]), (k, "values")
