"""Equivalence of the fused Pallas pipeline kernel with the jnp pipeline.

The fused kernel (mi_fieldcalc_tpu/ops/fused.py) must produce the same 12
outputs as :func:`mi_fieldcalc_tpu.models.derived_fields`: masks
bit-for-bit, values to f32 round-off (Mosaic reassociates differently than
XLA).  Runs in Pallas interpret mode on the CPU test backend; the same
kernel compiles natively on TPU (checked by bench.py / the driver).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mi_fieldcalc_tpu.field import UNDEF, from_sentinel
from mi_fieldcalc_tpu.models.pipeline import derived_fields
from mi_fieldcalc_tpu.ops.fused import derived_fields_fused, fused_supported


def _inputs(nlev, ny, nx, seed=0, undefs=True):
    rng = np.random.default_rng(seed)
    tk = rng.normal(275, 15, (nlev, ny, nx)).astype(np.float32)
    q = rng.uniform(1e-4, 1e-2, (nlev, ny, nx)).astype(np.float32)
    u = rng.normal(0, 12, (nlev, ny, nx)).astype(np.float32)
    v = rng.normal(0, 12, (nlev, ny, nx)).astype(np.float32)
    ps = rng.normal(1000, 15, (ny, nx)).astype(np.float32)
    if undefs:
        # scattered undefs incl. corners, edges, and extreme temps
        for arr in (tk, q, u, v):
            idx = rng.integers(0, arr.size, arr.size // 37)
            arr.reshape(-1)[idx] = UNDEF
        tk[0, 0, 0] = UNDEF
        tk[-1, -1, -1] = UNDEF
        tk[0, 1, 1] = 500.0        # beyond the e_sat table -> undef RH/Td
        ps[ny // 2, nx // 2] = UNDEF
    alevel = np.linspace(0, 50, nlev).astype(np.float32)
    blevel = np.linspace(1, 0.5, nlev).astype(np.float32)
    xm = rng.uniform(3e-7, 5e-7, (ny, nx)).astype(np.float32)
    ym = rng.uniform(3e-7, 5e-7, (ny, nx)).astype(np.float32)
    fc = np.full((ny, nx), 1.2e-4, np.float32)
    return (from_sentinel(tk), from_sentinel(q), from_sentinel(u),
            from_sentinel(v), from_sentinel(ps), jnp.asarray(alevel),
            jnp.asarray(blevel), jnp.asarray(xm), jnp.asarray(ym),
            jnp.asarray(fc))


@pytest.mark.parametrize("nlev,ny,nx", [
    (3, 37, 61),     # ragged everything, nx < one 128-lane chunk
    (2, 33, 135),    # nx just past one chunk (ragged gather tail)
    (1, 9, 9),       # minimal-ish grid (single padded tile)
    (1, 17, 140),    # (ny-1) divisible by every tile height <= ny
    (2, 64, 256),    # TY divides ny shapes
])
@pytest.mark.parametrize("undefs", [True, False])
def test_fused_matches_jnp(nlev, ny, nx, undefs):
    assert fused_supported(ny, nx)
    args = _inputs(nlev, ny, nx, seed=ny + nx, undefs=undefs)
    ref = jax.jit(derived_fields)(*args)
    got = derived_fields_fused(*args, interpret=True)
    for name in ref._fields:
        rv = np.asarray(getattr(ref, name).values)
        rm = np.asarray(getattr(ref, name).mask)
        gv = np.asarray(getattr(got, name).values)
        gm = np.asarray(getattr(got, name).mask)
        assert np.array_equal(rm, gm), f"{name}: mask mismatch"
        w = rm
        with np.errstate(all="ignore"):
            assert np.allclose(rv[w], gv[w], rtol=2e-5, atol=1e-30), \
                f"{name}: value mismatch"


@pytest.mark.parametrize("nlev,ny,nx", [
    (3, 37, 61),
    (2, 64, 256),
])
def test_fused_split_matches_monolith(nlev, ny, nx):
    """split=True (elementwise + stencil kernels) is bitwise-identical to
    the monolith: same formulas, same per-part unpacking in _kernel."""
    args = _inputs(nlev, ny, nx, seed=nx, undefs=True)
    ref = derived_fields_fused(*args, interpret=True)
    got = derived_fields_fused(*args, interpret=True, split=True)
    for name in ref._fields:
        ra, ga = getattr(ref, name), getattr(got, name)
        rm = np.asarray(ra.mask)
        assert np.array_equal(rm, np.asarray(ga.mask)), name
        assert np.array_equal(np.asarray(ra.values)[rm],
                              np.asarray(ga.values)[rm]), name


@pytest.mark.parametrize("nlev,ny,nx", [
    (3, 37, 61),      # pads to (40, 128)
    (2, 33, 135),     # pads to (40, 256)
    (2, 48, 256),     # already aligned (pad is a no-op)
])
def test_fused_padded_layout_matches(nlev, ny, nx):
    """Canonical padded layout (layout.py): tile-aligned inputs +
    logical global_shape give bitwise-identical logical outputs, with
    edge fills at the logical boundary, not the padded one."""
    from mi_fieldcalc_tpu.layout import pad_array, pad_field, trim_field

    args = _inputs(nlev, ny, nx, seed=3 * ny + nx, undefs=True)
    ref = derived_fields_fused(*args, interpret=True)
    pargs = tuple(
        pad_field(a) if hasattr(a, "mask") else
        (pad_array(a) if a.ndim == 2 else a)
        for a in args)
    got = derived_fields_fused(*pargs, interpret=True,
                               global_shape=(ny, nx))
    for name in ref._fields:
        ra = getattr(ref, name)
        ga = trim_field(getattr(got, name), ny, nx)
        rm = np.asarray(ra.mask)
        assert np.array_equal(rm, np.asarray(ga.mask)), name
        assert np.array_equal(np.asarray(ra.values)[rm],
                              np.asarray(ga.values)[rm]), name


def test_fused_supported_bounds():
    assert not fused_supported(2, 64)      # ny < 3
    assert not fused_supported(64, 2)      # nx < 3
    assert fused_supported(719, 929)


def test_fused_stacked_matches_per_field():
    """stacked=True writes the same values/masks into the (12, ...) SoA
    layout, and the lazy accessors recover each Field bitwise."""
    args = _inputs(2, 37, 61, seed=5, undefs=True)
    ref = derived_fields_fused(*args, interpret=True)
    for packed, dedup in ((True, False), (False, True), (False, False)):
        got = derived_fields_fused(*args, interpret=True, stacked=True,
                                   packed_masks=packed, dedup_masks=dedup)
        assert got.values.shape == (12, 2, 37, 61)
        if packed:
            # ONE int32 bit-plane (bit k = field k defined)
            assert got.masks.dtype == np.int32
            assert got.masks.shape == (2, 37, 61)
        else:
            # default: 9 deduplicated planes (td/duc/dv share rh/the/vo)
            assert got.masks.dtype == np.int8   # boundary dtype
            assert got.masks.shape == (9 if dedup else 12, 2, 37, 61)
        assert got.field(0).mask.dtype == np.bool_
        fields = got.as_fields()
        for i, name in enumerate(ref._fields):
            fa, fb, fc = ref[i], got.field(i), getattr(got, name)
            ma = np.asarray(fa.mask)
            assert np.array_equal(ma, np.asarray(fb.mask)), name
            assert np.array_equal(np.asarray(fa.values)[ma],
                                  np.asarray(fb.values)[ma]), name
            assert np.array_equal(np.asarray(fc.values)[ma],
                                  np.asarray(fields[i].values)[ma]), name


def test_fused_levpack_masks_match():
    """levpack_masks=True: input masks enter as lev-bit-packed 2-D int32
    planes, output masks come back as a (9, ny, nx) uint32 bit-plane
    stack (bit L = level L) — values and unpacked masks bitwise-equal to
    the per-field path, on plain AND padded layouts, with and without
    pre-packed input masks."""
    import jax.numpy as jnp
    from mi_fieldcalc_tpu.layout import pad_array, pad_field

    nlev, ny, nx = 3, 37, 61
    args = _inputs(nlev, ny, nx, seed=11, undefs=True)
    ref = derived_fields_fused(*args, interpret=True)
    got = derived_fields_fused(*args, interpret=True, stacked=True,
                               levpack_masks=True)
    assert got.masks.dtype == np.uint32
    assert got.masks.shape == (9, ny, nx)
    for i, name in enumerate(ref._fields):
        ra, ga = ref[i], got.field(i)
        rm = np.asarray(ra.mask)
        assert np.array_equal(rm, np.asarray(ga.mask)), name
        assert np.array_equal(np.asarray(ra.values)[rm],
                              np.asarray(ga.values)[rm]), name

    # padded layout + pre-packed input masks (the hot-path form)
    pargs = tuple(
        pad_field(a) if hasattr(a, "mask") else
        (pad_array(a) if a.ndim == 2 else a)
        for a in args)
    sh = jnp.arange(nlev, dtype=jnp.int32)[:, None, None]
    pm = tuple((pargs[i].mask.astype(jnp.int32) << sh).sum(0)
               for i in (0, 1, 2, 3))
    got2 = derived_fields_fused(*pargs, interpret=True, stacked=True,
                                levpack_masks=True, global_shape=(ny, nx),
                                packed_input_masks=pm)
    for i, name in enumerate(ref._fields):
        ra = ref[i]
        ga = got2.field(i)
        gm = np.asarray(ga.mask)
        rm = np.asarray(ra.mask)
        assert np.array_equal(rm, gm[:, :ny, :nx]), name
        assert not gm[:, ny:, :].any() and not gm[:, :, nx:].any(), name
        assert np.array_equal(np.asarray(ra.values)[rm],
                              np.asarray(ga.values)[:, :ny, :nx][rm]), name


def test_fused_levpack_rejects_bad_combos():
    args = _inputs(2, 16, 24, seed=1, undefs=True)
    with pytest.raises(ValueError):
        derived_fields_fused(*args, interpret=True, levpack_masks=True)
    with pytest.raises(ValueError):
        derived_fields_fused(*args, interpret=True, stacked=True,
                             levpack_masks=True, packed_masks=True)


@pytest.mark.parametrize("nlev,ny,nx", [
    (3, 37, 61),
    (2, 33, 135),
])
def test_fused_all_defined_fast_path(nlev, ny, nx):
    """all_defined=True (the reference's inAllDefined shortcut,
    FieldCalculations.cc:100) skips every mask plane except the 2
    data-dependent gates and is bitwise-identical to the default path on
    fully defined inputs — including an out-of-table temperature (the
    humidity gate) and a |grad T| == 0 plateau (the TFP gate), which stay
    data-dependent even with all inputs defined."""
    args = _inputs(nlev, ny, nx, seed=7 * ny + nx, undefs=False)
    tk = args[0]
    v = np.asarray(tk.values).copy()
    v[0, 2, 2] = 500.0            # beyond the e_sat table: rh/td gate
    v[-1, 5:10, 5:10] = 300.0     # constant-T plateau: |grad T| = 0
    args = (type(tk)(jnp.asarray(v), tk.mask),) + args[1:]

    ref = derived_fields_fused(*args, interpret=True)
    for kw in ({}, {"split": True}):
        got = derived_fields_fused(*args, interpret=True,
                                   all_defined=True, **kw)
        for name in ref._fields:
            ra, ga = getattr(ref, name), getattr(got, name)
            rm = np.asarray(ra.mask)
            assert np.array_equal(rm, np.asarray(ga.mask)), (kw, name)
            assert np.array_equal(np.asarray(ra.values)[rm],
                                  np.asarray(ga.values)[rm]), (kw, name)
    # the interesting gates actually fired
    assert not np.asarray(ref.rh.mask)[0, 2, 2]
    assert not np.asarray(ref.tfp.mask)[-1, 7, 7]

    # stacked: 2-plane mask stack + lazy accessors
    got = derived_fields_fused(*args, interpret=True, stacked=True,
                               all_defined=True)
    assert got.masks.shape == (2, nlev, ny, nx)
    for i, name in enumerate(ref._fields):
        ra, ga = getattr(ref, name), got.field(i)
        rm = np.asarray(ra.mask)
        assert np.array_equal(rm, np.asarray(ga.mask)), name
        assert np.array_equal(np.asarray(ra.values)[rm],
                              np.asarray(ga.values)[rm]), name


def test_fused_all_defined_padded_layout():
    """Fast path on the canonical padded layout: dead rows/lanes are
    allowed (they are not logically defined points) and the logical
    region is bitwise-identical after trimming."""
    from mi_fieldcalc_tpu.layout import pad_array, pad_field

    nlev, ny, nx = 2, 21, 150
    args = _inputs(nlev, ny, nx, seed=11, undefs=False)
    ref = derived_fields_fused(*args, interpret=True)
    pargs = tuple(
        pad_field(a) if hasattr(a, "mask") else
        (pad_array(a) if a.ndim == 2 else a)
        for a in args)
    got = derived_fields_fused(*pargs, interpret=True, stacked=True,
                               global_shape=(ny, nx), all_defined=True)
    for i, name in enumerate(ref._fields):
        ra = getattr(ref, name)
        gv = np.asarray(got.field(i).values)[..., :ny, :nx]
        gm = np.asarray(got.field(i).mask)[..., :ny, :nx]
        rm = np.asarray(ra.mask)
        assert np.array_equal(rm, gm), name
        assert np.array_equal(np.asarray(ra.values)[rm], gv[rm]), name
    # the 2 WRITTEN gate planes keep the canonical-layout invariant:
    # masks False on padded dead rows/lanes (in-kernel region gate)
    gates = np.asarray(got.masks)
    assert not gates[..., ny:, :].any() and not gates[..., :, nx:].any()

    # ... and so does EVERY stacked accessor path: the synthesized
    # constant-True masks are ANDed with the carried `region` plane, so
    # no caller-side trimming is needed on the 10 gate-free fields
    assert got.region is not None
    assert got.region.shape == (1,) + got.values.shape[-2:]
    for i in range(12):
        for gm in (np.asarray(got.field(i).mask),
                   np.asarray(got.as_fields()[i].mask)):
            assert not gm[..., ny:, :].any(), i
            assert not gm[..., :, nx:].any(), i

    # per-field (non-stacked) fast-path output preserves the invariant
    # for ALL 12 masks, including the synthesized constant-True ones
    got_pf = derived_fields_fused(*pargs, interpret=True,
                                  global_shape=(ny, nx), all_defined=True)
    for name in ref._fields:
        gm = np.asarray(getattr(got_pf, name).mask)
        assert not gm[..., ny:, :].any() and not gm[..., :, nx:].any(), name


def test_fused_all_defined_rejects_packed():
    args = _inputs(1, 9, 9, seed=1, undefs=False)
    with pytest.raises(ValueError):
        derived_fields_fused(*args, interpret=True, stacked=True,
                             all_defined=True, packed_masks=True)


def test_fused_all_defined_ty72():
    """The fast path auto-picks TY=72 on tall grids (fewer VMEM blocks
    admit the taller tile; 7% measured on chip) and stays bitwise equal
    to the default path — exercised in interpret mode at a 72-divisible
    tile split."""
    from mi_fieldcalc_tpu.ops.fused import _pick_ty

    assert _pick_ty(719, 1024, all_defined=True) == 72
    assert _pick_ty(719, 1024) == 48                  # masked unchanged
    assert _pick_ty(719, 1536, all_defined=True) == 48  # lane budget

    nlev, ny, nx = 1, 80, 140
    args = _inputs(nlev, ny, nx, seed=80, undefs=False)
    ref = derived_fields_fused(*args, interpret=True)
    got = derived_fields_fused(*args, interpret=True, all_defined=True,
                               ty=72)
    for name in ref._fields:
        ra, ga = getattr(ref, name), getattr(got, name)
        rm = np.asarray(ra.mask)
        assert np.array_equal(rm, np.asarray(ga.mask)), name
        assert np.array_equal(np.asarray(ra.values)[rm],
                              np.asarray(ga.values)[rm]), name
