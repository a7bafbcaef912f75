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


def test_stage_step_all_defined_gate():
    """The decode counts route fully defined steps to the kernel's
    ALL_DEFINED fast path (and only those)."""
    from mi_fieldcalc_tpu.staging import HostStager, _stage_step

    args = list(_inputs())          # has undefs in tk and q
    stager = HostStager(k=4, pad=True)
    _, _, all_defined, _ = _stage_step(tuple(args), stager, UNDEF, True)
    assert not all_defined

    clean = list(_inputs(seed=9))
    clean[0] = np.abs(clean[0])     # fresh arrays, no sentinels planted
    for a in clean[:5]:
        a[np.isnan(a)] = 1.0
        a[a == np.float32(UNDEF)] = 1.0
    _, _, all_defined, _ = _stage_step(tuple(clean), stager, UNDEF, True)
    assert all_defined

    dirty_ps = [a.copy() if isinstance(a, np.ndarray) else a
                for a in clean]
    dirty_ps[4][0, 0] = UNDEF       # a single undef in ps flips the gate
    _, _, all_defined, _ = _stage_step(tuple(dirty_ps), stager, UNDEF,
                                       True)
    assert not all_defined


def test_encode_step_mask_map_layouts():
    """_encode_step consumes the kernel's native mask stacks (12-plane,
    9-plane dedup, 2-plane fast path) and produces identical sentinel
    output dicts."""
    from mi_fieldcalc_tpu.layout import pad_array, pad_field
    from mi_fieldcalc_tpu.ops.fused import derived_fields_fused
    from mi_fieldcalc_tpu.staging import _encode_step

    nlev, ny, nx = 2, 21, 140
    clean = list(_inputs(nlev, ny, nx, seed=4))
    for a in clean[:5]:
        a[np.isnan(a)] = 1.0
        a[a == np.float32(UNDEF)] = 1.0
    tk, q, u, v = [pad_field(from_sentinel(a)) for a in clean[:4]]
    ps = pad_field(from_sentinel(clean[4]))
    al, bl = jnp.asarray(clean[5]), jnp.asarray(clean[6])
    xm, ym = pad_array(clean[7]), pad_array(clean[8])
    fc = jnp.asarray(clean[9])

    outs = {}
    for tag, kw in (("12", dict(dedup_masks=False)),
                    ("9", {}),
                    ("2", dict(all_defined=True))):
        o = derived_fields_fused(tk, q, u, v, ps, al, bl, xm, ym, fc,
                                 interpret=True, stacked=True,
                                 global_shape=(ny, nx), **kw)
        assert o.masks.shape[0] == int(tag)
        outs[tag] = _encode_step(np.asarray(o.values),
                                 np.asarray(o.masks), ny, nx, UNDEF)
    for tag in ("9", "2"):
        assert outs[tag].keys() == outs["12"].keys()
        for name in outs["12"]:
            np.testing.assert_array_equal(outs["12"][name],
                                          outs[tag][name],
                                          err_msg=f"{tag}/{name}")


def test_run_hlevel_suite_np():
    """Sentinel-numpy suite runner: per-level hlevel* agreement,
    sentinel propagation, and unused-input pruning (q/rh may be None)."""
    from mi_fieldcalc_tpu.ops import hlevelhum, hleveltemp
    from mi_fieldcalc_tpu.staging import run_hlevel_suite_np

    rng = np.random.default_rng(0)
    nlev, ny, nx = 2, 12, 20
    tk = rng.uniform(250, 300, (nlev, ny, nx)).astype(np.float32)
    q = rng.uniform(1e-4, 1e-2, (nlev, ny, nx)).astype(np.float32)
    tk[0, 3, 3] = UNDEF
    ps = rng.uniform(950, 1030, (ny, nx)).astype(np.float32)
    al = np.linspace(30.0, 0.0, nlev).astype(np.float32)
    bl = np.linspace(0.02, 1.0, nlev).astype(np.float32)

    out = run_hlevel_suite_np(tk, q, None, ps, al, bl,
                              temps=(3,), hums_q=(1, 9))
    assert sorted(out) == ["hum_q1", "hum_q9", "temp3"]
    assert out["temp3"].shape == (nlev, ny, nx)
    assert out["temp3"][0, 3, 3] == np.float32(UNDEF)

    for name, fn, c, h in (("temp3", hleveltemp, 3, None),
                           ("hum_q1", hlevelhum, 1, q)):
        for k in range(nlev):
            args = [from_sentinel(tk[k])]
            if h is not None:
                args.append(from_sentinel(h[k]))
            ref = fn(*args, from_sentinel(ps), float(al[k]),
                     float(bl[k]), compute=c)
            m = np.asarray(ref.mask)
            got = out[name][k]
            assert np.array_equal(got == np.float32(UNDEF), ~m)
            with np.errstate(all="ignore"):
                assert np.allclose(np.asarray(ref.values)[m], got[m],
                                   rtol=3e-6)


def test_run_vessel_icing_np():
    """Batch icing boundary: one decode of the 11 shared inputs, all
    requested products, sentinel propagation, product validation."""
    import pytest
    from mi_fieldcalc_tpu.ops import (vessel_icing_mertins,
                                      vessel_icing_overland)
    from mi_fieldcalc_tpu.staging import run_vessel_icing_np

    rng = np.random.default_rng(2)
    ny, nx = 16, 24
    f = lambda lo, hi: rng.uniform(lo, hi, (ny, nx)).astype(np.float32)
    sal, wave = f(30, 36), f(0.5, 6)
    xw, yw = f(-25, 25), f(-25, 25)
    at, rh = f(-25, -3), f(40, 95)
    sst, p = f(-1, 8), f(960, 1040)
    pw, aice, depth = f(6, 14), f(0, 0.3), f(25, 350)
    at[2, 2] = UNDEF
    scal = (5.0, 0.52, 2.0, 5.0)

    out = run_vessel_icing_np(sal, wave, xw, yw, at, rh, sst, p, pw,
                              aice, depth, *scal, alt=1)
    assert sorted(out) == ["mertins", "mincog", "modstall", "overland"]
    for prod, arr in out.items():
        assert arr.shape == (ny, nx)
        assert arr[2, 2] == np.float32(UNDEF), prod

    for prod, op in (("overland", vessel_icing_overland),
                     ("mertins", vessel_icing_mertins)):
        ref = op(*[from_sentinel(a)
                   for a in (at, sst, xw, yw, sal, aice)])
        m = np.asarray(ref.mask)
        assert np.array_equal(out[prod] == np.float32(UNDEF), ~m), prod
        with np.errstate(all="ignore"):
            assert np.allclose(np.asarray(ref.values)[m],
                               out[prod][m], rtol=1e-6), prod

    sub = run_vessel_icing_np(sal, wave, xw, yw, at, rh, sst, p, pw,
                              aice, depth, *scal,
                              products=("overland",))
    assert sorted(sub) == ["overland"]
    np.testing.assert_array_equal(sub["overland"], out["overland"])

    with pytest.raises(ValueError):
        run_vessel_icing_np(sal, wave, xw, yw, at, rh, sst, p, pw,
                            aice, depth, *scal, products=("nope",))


def test_stage_levpack_feeds_kernel_abi():
    """stage_levpack: codec-packed uint32 planes equal the in-device
    pack of stage()'s masks (same bit order as ops/fused.py), and drive
    the fused kernel's levpack ABI to the same values/masks as the
    default mask path — the host-codec -> kernel contract end to end."""
    from mi_fieldcalc_tpu.layout import pad_array
    from mi_fieldcalc_tpu.ops.fused import derived_fields_fused

    nlev, ny, nx = 3, 21, 70
    args = _inputs(nlev, ny, nx, seed=6)
    stager = HostStager(k=4, pad=True)
    fields = stager.stage(*args[:4])
    counts = list(stager.counts)
    lp_fields, packed = stager.stage_levpack(*args[:4])
    assert stager.counts == counts
    pk = np.asarray(packed)
    assert pk.dtype == np.uint32 and pk.shape == (4, 24, 128)
    sh = np.arange(nlev, dtype=np.uint32)[:, None, None]
    for k, (f, lf) in enumerate(zip(fields, lp_fields)):
        np.testing.assert_array_equal(np.asarray(f.values),
                                      np.asarray(lf.values))
        assert lf.mask is None
        want = ((np.asarray(f.mask).astype(np.uint32) << sh)
                .sum(0, dtype=np.uint32))
        np.testing.assert_array_equal(pk[k], want)

    from mi_fieldcalc_tpu.field import Field
    from mi_fieldcalc_tpu.native import decode_pad
    psv, psm, _ = decode_pad(args[4], 24, 128)
    psf = Field(jnp.asarray(psv), jnp.asarray(psm))
    al, bl = jnp.asarray(args[5]), jnp.asarray(args[6])
    xm, ym = pad_array(args[7]), pad_array(args[8])
    fc = jnp.asarray(args[9])
    ref = derived_fields_fused(*fields, psf, al, bl, xm, ym, fc,
                               interpret=True, stacked=True,
                               global_shape=(ny, nx))
    got = derived_fields_fused(*lp_fields, psf, al, bl, xm, ym, fc,
                               interpret=True, stacked=True,
                               levpack_masks=True,
                               packed_input_masks=packed,
                               global_shape=(ny, nx))
    from mi_fieldcalc_tpu.models.pipeline import DerivedFields
    np.testing.assert_array_equal(np.asarray(ref.values),
                                  np.asarray(got.values))
    for i in range(12):
        np.testing.assert_array_equal(np.asarray(ref.field(i).mask),
                                      np.asarray(got.field(i).mask),
                                      err_msg=DerivedFields._fields[i])


def test_run_derived_fields_np_levpack_param():
    """levpack=True is accepted everywhere (it only changes the device
    ABI on TPU; off-TPU results are identical by construction)."""
    args = _inputs(seed=8)
    ref = run_derived_fields_np(*args)
    got = run_derived_fields_np(*args, levpack=True)
    for name in ref:
        np.testing.assert_array_equal(got[name], ref[name])


def test_run_hlevel_suite_np_align():
    """align=True: the suite runs on the tile-aligned logical grid
    re-gridded at ingest — equals manually pre-resampling every input
    (the suite is pointwise: no map rescale involved)."""
    from mi_fieldcalc_tpu.ingest import aligned_target, resample_align
    from mi_fieldcalc_tpu.staging import run_hlevel_suite_np

    rng = np.random.default_rng(4)
    nlev, ny, nx = 2, 13, 21
    tk = rng.uniform(250, 300, (nlev, ny, nx)).astype(np.float32)
    q = rng.uniform(1e-4, 1e-2, (nlev, ny, nx)).astype(np.float32)
    tk[0, 3:6, 3:6] = UNDEF
    ps = rng.uniform(950, 1030, (ny, nx)).astype(np.float32)
    al = np.linspace(30.0, 0.0, nlev).astype(np.float32)
    bl = np.linspace(0.02, 1.0, nlev).astype(np.float32)
    tgt = aligned_target(ny, nx)

    got = run_hlevel_suite_np(tk, q, None, ps, al, bl,
                              temps=(3,), hums_q=(1,), align=True)
    for arr in got.values():
        assert arr.shape == (nlev,) + tgt

    # manual pre-resample through the SAME implementation the staging
    # path uses (native fused pass when available) -> bitwise equality
    # holds on any toolchain; native-vs-numpy tolerance lives in
    # tests/test_native.py
    from mi_fieldcalc_tpu import native

    def nat_sent(a):
        v_, m_, _ = native.decode_resample_batch(
            [np.ascontiguousarray(a, np.float32)], *tgt, UNDEF)
        return np.where(m_[0], v_[0], np.float32(UNDEF))

    man = run_hlevel_suite_np(nat_sent(tk), nat_sent(q),
                              None, nat_sent(ps), al, bl,
                              temps=(3,), hums_q=(1,), align=False)
    assert sorted(got) == sorted(man)
    for name in got:
        np.testing.assert_array_equal(got[name], man[name])


def test_run_vessel_icing_np_align():
    """align=True: the icing products run on the tile-aligned logical
    grid re-gridded at ingest — equals manually pre-resampling every
    input (pointwise suite, no map rescale), same contract as the
    hlevel align test above."""
    from mi_fieldcalc_tpu import native
    from mi_fieldcalc_tpu.ingest import aligned_target
    from mi_fieldcalc_tpu.staging import run_vessel_icing_np

    rng = np.random.default_rng(7)
    ny, nx = 13, 21
    f = lambda lo, hi: rng.uniform(lo, hi, (ny, nx)).astype(np.float32)
    sal, wave = f(30, 36), f(0.5, 6)
    xw, yw = f(-25, 25), f(-25, 25)
    at, rh = f(-25, -3), f(40, 95)
    sst, p = f(-1, 8), f(960, 1040)
    pw, aice, depth = f(6, 14), f(0, 0.3), f(25, 350)
    at[2, 2] = UNDEF
    scal = (5.0, 0.52, 2.0, 5.0)
    tgt = aligned_target(ny, nx)
    ins = (sal, wave, xw, yw, at, rh, sst, p, pw, aice, depth)

    got = run_vessel_icing_np(*ins, *scal, alt=1,
                              products=("overland", "modstall"),
                              align=True)
    for arr in got.values():
        assert arr.shape == tgt

    def nat_sent(a):
        v_, m_, _ = native.decode_resample_batch(
            [np.ascontiguousarray(a, np.float32)], *tgt, UNDEF)
        return np.where(m_[0], v_[0], np.float32(UNDEF))

    man = run_vessel_icing_np(*[nat_sent(a) for a in ins], *scal,
                              alt=1, products=("overland", "modstall"),
                              align=False)
    assert sorted(got) == sorted(man)
    for name in got:
        np.testing.assert_array_equal(got[name], man[name])
