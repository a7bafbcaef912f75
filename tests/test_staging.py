"""Host staging pipeline (mi_fieldcalc_tpu/staging.py).

End-to-end: numpy sentinel stacks -> native batch codec -> device Fields
-> pipeline -> sentinel numpy, compared against the plain Field-API
path.  Runs on the CPU test backend (the stager skips padding there
because the jnp pipeline fills edges at array extent; the padded branch
is exercised by bench.py / the fused-kernel tests on TPU).
"""

import numpy as np
import jax
import jax.numpy as jnp

from mi_fieldcalc_tpu import from_sentinel
from mi_fieldcalc_tpu.field import UNDEF
from mi_fieldcalc_tpu.models import derived_fields
from mi_fieldcalc_tpu.staging import HostStager, run_derived_fields_np


def _inputs(nlev=3, ny=24, nx=40, seed=0):
    rng = np.random.default_rng(seed)
    tk = rng.normal(275.0, 15.0, (nlev, ny, nx)).astype(np.float32)
    q = rng.uniform(1e-4, 1e-2, (nlev, ny, nx)).astype(np.float32)
    u = rng.normal(0.0, 12.0, (nlev, ny, nx)).astype(np.float32)
    v = rng.normal(0.0, 12.0, (nlev, ny, nx)).astype(np.float32)
    ps = rng.normal(1000.0, 15.0, (ny, nx)).astype(np.float32)
    tk[:, ny // 3, nx // 3] = UNDEF
    q[1, 2, 3] = np.nan
    alevel = np.linspace(0.0, 50.0, nlev).astype(np.float32)
    blevel = np.linspace(1.0, 0.5, nlev).astype(np.float32)
    xmapr = np.full((ny, nx), 4.0e-7, np.float32)
    ymapr = np.full((ny, nx), 3.6e-7, np.float32)
    fcor = np.full((ny, nx), 1.2e-4, np.float32)
    return tk, q, u, v, ps, alevel, blevel, xmapr, ymapr, fcor


def test_host_stager_matches_from_sentinel():
    tk, q, u, v, *_ = _inputs()
    stager = HostStager(k=4, pad=False)
    fields = stager.stage(tk, q, u, v)
    for arr, f in zip((tk, q, u, v), fields):
        ref = from_sentinel(arr)
        np.testing.assert_array_equal(np.asarray(f.mask),
                                      np.asarray(ref.mask))
        m = np.asarray(ref.mask)
        np.testing.assert_array_equal(np.asarray(f.values)[m],
                                      np.asarray(ref.values)[m])
    assert stager.counts[0] == int(np.asarray(fields[0].mask).sum())


def test_host_stager_padded_layout():
    tk, q, u, v, *_ = _inputs(ny=21, nx=70)
    stager = HostStager(k=4)
    fields = stager.stage(tk, q, u, v)
    assert fields[0].values.shape == (3, 24, 128)
    m = np.asarray(fields[0].mask)
    assert not m[..., 21:, :].any() and not m[..., :, 70:].any()
    np.testing.assert_array_equal(
        m[..., :21, :70], np.asarray(from_sentinel(tk).mask))


def test_run_derived_fields_np_matches_field_api():
    args = _inputs(seed=3)
    got = run_derived_fields_np(*args)

    fa = [from_sentinel(a) for a in args[:5]]
    rest = [jnp.asarray(a) for a in args[5:]]
    ref = jax.jit(derived_fields)(*fa, *rest)
    assert set(got) == set(ref._fields)
    for name in ref._fields:
        rf = getattr(ref, name)
        rm = np.asarray(rf.mask)
        g = got[name]
        assert g.shape == rm.shape
        np.testing.assert_array_equal(g == np.float32(UNDEF), ~rm)
        np.testing.assert_allclose(g[rm], np.asarray(rf.values)[rm],
                                   rtol=2e-5, atol=1e-6)


def test_stream_matches_single_steps():
    """The streaming executor yields, in order, exactly what
    run_derived_fields_np produces per step."""
    from mi_fieldcalc_tpu.staging import stream_derived_fields_np

    steps = [_inputs(seed=s) for s in (1, 2, 3)]
    got = list(stream_derived_fields_np(iter(steps)))
    assert len(got) == 3
    for args, out in zip(steps, got):
        ref = run_derived_fields_np(*args)
        assert set(out) == set(ref)
        for name in ref:
            np.testing.assert_array_equal(out[name], ref[name])


def test_stream_empty_and_single():
    from mi_fieldcalc_tpu.staging import stream_derived_fields_np

    assert list(stream_derived_fields_np(iter(()))) == []
    one = list(stream_derived_fields_np(iter([_inputs(seed=9)])))
    assert len(one) == 1 and "tfp" in one[0]
