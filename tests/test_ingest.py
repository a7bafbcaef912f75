"""Aligned ingest (mi_fieldcalc_tpu/ingest.py): mask-aware bilinear
re-grid onto the canonical tile-aligned layout, map-ratio rescaling,
and the staging pipeline's ``align=True`` opt-in."""

import numpy as np
import jax
import jax.numpy as jnp

from mi_fieldcalc_tpu import from_sentinel, ops
from mi_fieldcalc_tpu.field import UNDEF
from mi_fieldcalc_tpu.ingest import (aligned_target, resample_align,
                                     resample_maps)
from mi_fieldcalc_tpu.models import derived_fields
from mi_fieldcalc_tpu.staging import run_derived_fields_np


def test_aligned_target_is_canonical():
    assert aligned_target(719, 929) == (720, 1024)
    assert aligned_target(720, 1024) == (720, 1024)
    assert aligned_target(1, 1) == (8, 128)


def test_resample_passthrough_when_aligned():
    a = np.arange(8 * 128, dtype=np.float32).reshape(8, 128)
    out = resample_align(a)
    assert out is a                       # bitwise, zero-copy


def test_resample_exact_on_linear_fields():
    """Bilinear is exact on per-axis linear functions: the re-gridded
    field equals the linear function evaluated at the new physical
    coordinates."""
    ny, nx = 23, 37
    ny_t, nx_t = aligned_target(ny, nx)
    y = np.linspace(0.0, 1.0, ny)[:, None]
    x = np.linspace(0.0, 1.0, nx)[None, :]
    a = (3.0 + 2.0 * y + 5.0 * x).astype(np.float32)
    out = resample_align(a)
    yt = np.linspace(0.0, 1.0, ny_t)[:, None]
    xt = np.linspace(0.0, 1.0, nx_t)[None, :]
    want = (3.0 + 2.0 * yt + 5.0 * xt).astype(np.float32)
    np.testing.assert_allclose(out, want, rtol=2e-6, atol=2e-6)
    # 3-D stacks re-grid per plane
    st = np.stack([a, 2 * a])
    out3 = resample_align(st)
    np.testing.assert_allclose(out3[1], 2 * out, rtol=1e-6)


def test_resample_mask_semantics():
    """Constant field with scattered undefs: defined points stay
    constant (to f32 renormalization rounding); undef appears only
    where ALL contributing corners are undef; a NaN source point counts
    as undef, never leaks."""
    ny, nx = 20, 33
    a = np.full((ny, nx), 7.25, np.float32)
    a[5, 5] = UNDEF
    a[10, 20] = np.nan
    a[:, 30] = UNDEF                      # whole column undef
    out = resample_align(a, UNDEF)
    assert np.isfinite(out[out != np.float32(UNDEF)]).all()
    d = out != np.float32(UNDEF)
    np.testing.assert_allclose(out[d], np.float32(7.25), rtol=1e-6)
    # undef support cannot exceed the 1-cell interpolation footprint:
    # a target is undef only if every corner was, so the number of
    # undef targets is bounded by the blown-up source undef area
    ny_t, nx_t = out.shape
    sy, sx = ny_t / ny, nx_t / nx
    n_src_undef = (~(np.isfinite(a) & (a != np.float32(UNDEF)))).sum()
    assert (~d).sum() <= (n_src_undef + ny) * (sy + 1) * (sx + 1)
    # fully-undef input stays fully undef
    allu = np.full((9, 17), UNDEF, np.float32)
    np.testing.assert_array_equal(resample_align(allu, UNDEF),
                                  np.float32(UNDEF))


def test_resample_plain_weights_sum_to_one():
    out = resample_align(np.ones((13, 29), np.float32), mask_aware=False)
    np.testing.assert_allclose(out, 1.0, rtol=1e-6)


def test_resample_maps_preserve_physical_gradient():
    """gradient() on the re-gridded field with rescaled map ratios gives
    the same physical gradient as on the source grid (interior)."""
    ny, nx = 21, 37
    hx, hy = 2500.0, 2500.0               # source spacing, metres
    y = (np.arange(ny) * hy)[:, None]
    x = (np.arange(nx) * hx)[None, :]
    t = (280.0 + 1e-4 * x + 2e-4 * y).astype(np.float32)
    xmapr = np.full((ny, nx), 1.0 / (2 * hx), np.float32)
    ymapr = np.full((ny, nx), 1.0 / (2 * hy), np.float32)

    gx_src = np.asarray(ops.gradient(
        from_sentinel(t), jnp.asarray(xmapr), jnp.asarray(ymapr),
        compute=1).values)
    t_t = resample_align(t)
    xm_t, ym_t = resample_maps(xmapr, ymapr, ny, nx)
    g_t = ops.gradient(from_sentinel(t_t), jnp.asarray(xm_t),
                       jnp.asarray(ym_t), compute=1)
    gx_dst = np.asarray(g_t.values)
    # interior physical d/dx is the same constant on both grids
    gphys = float(np.median(gx_src[5:-5, 5:-5]))
    np.testing.assert_allclose(gx_src[5:-5, 5:-5], gphys, rtol=1e-3)
    np.testing.assert_allclose(gx_dst[5:-5, 5:-5], gphys, rtol=1e-3)
    gy_src = np.asarray(ops.gradient(
        from_sentinel(t), jnp.asarray(xmapr), jnp.asarray(ymapr),
        compute=2).values)
    gy_dst = np.asarray(ops.gradient(
        from_sentinel(t_t), jnp.asarray(xm_t), jnp.asarray(ym_t),
        compute=2).values)
    np.testing.assert_allclose(
        gy_dst[5:-5, 5:-5], float(np.median(gy_src[5:-5, 5:-5])),
        rtol=1e-3)


def _inputs(nlev=3, ny=21, nx=37, seed=5):
    rng = np.random.default_rng(seed)
    tk = rng.normal(275.0, 15.0, (nlev, ny, nx)).astype(np.float32)
    q = rng.uniform(1e-4, 1e-2, (nlev, ny, nx)).astype(np.float32)
    u = rng.normal(0.0, 12.0, (nlev, ny, nx)).astype(np.float32)
    v = rng.normal(0.0, 12.0, (nlev, ny, nx)).astype(np.float32)
    ps = rng.normal(1000.0, 15.0, (ny, nx)).astype(np.float32)
    tk[:, ny // 3, nx // 3] = UNDEF
    alevel = np.linspace(0.0, 50.0, nlev).astype(np.float32)
    blevel = np.linspace(1.0, 0.5, nlev).astype(np.float32)
    xmapr = np.full((ny, nx), 4.0e-7, np.float32)
    ymapr = np.full((ny, nx), 3.6e-7, np.float32)
    fcor = np.full((ny, nx), 1.2e-4, np.float32)
    return tk, q, u, v, ps, alevel, blevel, xmapr, ymapr, fcor


def test_run_derived_fields_np_align_matches_pre_resampled():
    """staging align=True == manually re-gridding every input (with map
    rescale) and running the pipeline on the aligned logical grid.

    The manual pre-resample uses the SAME implementation the staging
    path runs (the native fused pass when available), so the equality
    is bitwise by construction on any toolchain; native-vs-numpy value
    agreement is tested separately at FP-contraction tolerance
    (tests/test_native.py)."""
    from mi_fieldcalc_tpu import native

    args = _inputs()
    tk, q, u, v, ps, alevel, blevel, xmapr, ymapr, fcor = args
    ny, nx = tk.shape[-2:]
    tgt = aligned_target(ny, nx)

    got = run_derived_fields_np(*args, align=True)
    for name, arr in got.items():
        assert arr.shape[-2:] == tgt, name

    def nat_sent(a):
        v_, m_, _ = native.decode_resample_batch(
            [np.ascontiguousarray(a, np.float32)], *tgt, UNDEF)
        return np.where(m_[0], v_[0], np.float32(UNDEF))

    # manual pre-resample, then the plain (align=False) staging path
    xm_t, ym_t = resample_maps(xmapr, ymapr, ny, nx)
    man = run_derived_fields_np(
        nat_sent(tk), nat_sent(q), nat_sent(u), nat_sent(v),
        nat_sent(ps), alevel, blevel,
        xm_t, ym_t, resample_align(fcor, mask_aware=False),
        align=False)
    assert set(got) == set(man)
    for name in got:
        np.testing.assert_array_equal(got[name], man[name])


def test_run_derived_fields_np_align_values_sane():
    """align=True output agrees with the unaligned pipeline where both
    are smooth: compare a smooth field (hybrid pressure at mid-level)
    re-gridded AFTER the unaligned run vs computed on the aligned grid."""
    args = _inputs(seed=9)
    ref = run_derived_fields_np(*args, align=False)
    got = run_derived_fields_np(*args, align=True)
    p_ref_regrid = resample_align(ref["p"], UNDEF)
    p_got = got["p"]
    d = ((p_got != np.float32(UNDEF))
         & (p_ref_regrid != np.float32(UNDEF)))
    assert d.mean() > 0.98
    np.testing.assert_allclose(p_got[d], p_ref_regrid[d], rtol=5e-4,
                               atol=5e-2)
