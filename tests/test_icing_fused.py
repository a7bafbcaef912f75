"""Equivalence of the fused Pallas MINCOG kernel with the jnp path.

The fused kernel (mi_fieldcalc_tpu/ops/icing_fused.py) traces the SAME
``_mincog_core`` inside a VMEM tile, so values should agree to f32
round-off (the XLA prologue fuses differently across the pallas_call
boundary) and masks bit-for-bit.  Runs in Pallas interpret mode on the
CPU test backend; the same kernel compiles natively through Mosaic on
TPU (tools/perf_lab_mincog_fused.py checks agreement on the chip).
"""

import numpy as np
import pytest

from mi_fieldcalc_tpu.field import UNDEF, from_sentinel
from mi_fieldcalc_tpu.ops import icing
from mi_fieldcalc_tpu.ops.icing_fused import (vessel_icing_mincog_fused,
                                              vessel_icing_modstall_fused)


def _inputs(ny, nx, seed=0, undefs=True, adversarial=False):
    rng = np.random.default_rng(seed)

    def f(lo, hi):
        x = rng.uniform(lo, hi, (ny, nx)).astype(np.float32)
        if undefs:
            idx = rng.integers(0, x.size, max(1, x.size // 23))
            x.reshape(-1)[idx] = UNDEF
        return from_sentinel(x)

    sal = f(0.0, 35.0)
    wave = f(0.0 if adversarial else 0.1, 8.0)   # includes skip lanes
    xw = f(-25.0, 25.0)
    yw = f(-25.0, 25.0)
    at = f(-25.0, 2.0)
    rh = f(0.3, 1.0)
    sst = f(-1.0, 8.0)
    p = f(960.0, 1040.0)
    # adversarial: long periods + shallow depths drive the wave fixed
    # point near |slope|=1 (cap/projection paths)
    pw = f(6.0, 14.0) if adversarial else f(2.0, 12.0)
    aice = f(0.0, 0.5)                           # includes gated lanes
    depth = f(2.0, 40.0) if adversarial else f(5.0, 500.0)
    return (sal, wave, xw, yw, at, rh, sst, p, pw, aice, depth)


@pytest.mark.parametrize("ny,nx", [
    (37, 61),     # ragged, single x chunk after padding
    (9, 131),     # ragged, just past one lane tile
    (64, 256),    # tile-aligned
])
@pytest.mark.parametrize("alt", [1, 2])
def test_fused_matches_jnp(ny, nx, alt):
    args = _inputs(ny, nx, seed=ny + nx + alt)
    scal = (5.0, 0.52, 2.0, 11.0, alt)
    ref = icing.vessel_icing_mincog(*args, *scal)
    got = vessel_icing_mincog_fused(*args, *scal, interpret=True)
    mr = np.asarray(ref.mask)
    np.testing.assert_array_equal(mr, np.asarray(got.mask))
    vr = np.asarray(ref.values)[mr]
    vg = np.asarray(got.values)[mr]
    np.testing.assert_allclose(vg, vr, rtol=2e-4, atol=1e-5)


def test_fused_adversarial_wave_lanes():
    args = _inputs(48, 160, seed=7, adversarial=True)
    scal = (0.0, 0.0, 1.0, 4.0, 2)   # vs=0: vr=c, exercises tper/skip
    ref = icing.vessel_icing_mincog(*args, *scal)
    got = vessel_icing_mincog_fused(*args, *scal, interpret=True)
    mr = np.asarray(ref.mask)
    np.testing.assert_array_equal(mr, np.asarray(got.mask))
    vr = np.asarray(ref.values)[mr]
    vg = np.asarray(got.values)[mr]
    np.testing.assert_allclose(vg, vr, rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize("ny,nx", [(37, 61), (64, 256)])
@pytest.mark.parametrize("adversarial", [False, True])
def test_modstall_fused_matches_jnp(ny, nx, adversarial):
    """The SHIPPED default (KERNEL_WARM_FP=0: the jnp path's exact
    32-iteration warmup) must match the jnp path to kernel round-off —
    a drop-in surface has to hold the documented 2e-3 icing tolerance
    without knobs (round-2 verdict).  The opt-in early-armed projection
    (warm_fp=8, a further 2.4x step-time win) is allowed the documented
    bound (CONFORMANCE.md: rare points shift up to ~1e-2, the mass of
    points stays at round-off)."""
    args = _inputs(ny, nx, seed=3 * ny + nx, adversarial=adversarial)
    scal = (5.0, 0.52, 2.0, 11.0)
    ref = icing.vessel_icing_modstall(*args, *scal)
    mr = np.asarray(ref.mask)
    vr = np.asarray(ref.values)[mr]

    exact = vessel_icing_modstall_fused(*args, *scal, interpret=True)
    assert icing.KERNEL_WARM_FP == 0, "shipped default must be exact"
    np.testing.assert_array_equal(mr, np.asarray(exact.mask))
    np.testing.assert_allclose(np.asarray(exact.values)[mr], vr,
                               rtol=2e-4, atol=1e-5)

    warm = vessel_icing_modstall_fused(*args, *scal, interpret=True,
                                       warm_fp=8)
    np.testing.assert_array_equal(mr, np.asarray(warm.mask))
    vw = np.asarray(warm.values)[mr]
    d = np.abs(vw - vr)
    assert d.max() < 5e-2, f"warm projection out of bound: {d.max()}"
    assert (d > 2e-3).mean() < 1e-3, "too many points past conformance tol"


def test_modstall_stacked_heights_matches_jnp():
    """stack_heights solves the 19 heights as one stacked fixed point:
    same op sequence per lane as the jnp path's exact 32-warmup sweep
    (the sequential KERNEL path uses the early-armed projection, so the
    jnp path is the apples-to-apples baseline), results to FMA
    round-off, masks bit-for-bit.  Measured slower on the chip
    (PERF.md) — kept as a documented option."""
    args = _inputs(40, 140, seed=21)
    scal = (5.0, 0.52, 2.0, 11.0)
    ref = icing.vessel_icing_modstall(*args, *scal)
    got = vessel_icing_modstall_fused(*args, *scal, interpret=True,
                                      stack_heights=True)
    mr = np.asarray(ref.mask)
    np.testing.assert_array_equal(mr, np.asarray(got.mask))
    np.testing.assert_allclose(np.asarray(got.values)[mr],
                               np.asarray(ref.values)[mr],
                               rtol=2e-5, atol=1e-5)


def test_icing_sharded_matches_unsharded():
    """Icing ops are pointwise (radius 0): run_sharded on the CPU mesh
    must reproduce the unsharded result bit-for-bit, for both the jnp
    path and the fused kernel (interpret) inside shard_map."""
    from mi_fieldcalc_tpu.parallel import grid_mesh, run_sharded

    args = _inputs(48, 256, seed=11)
    scal = (5.0, 0.52, 2.0, 11.0, 2)
    mesh = grid_mesh((1, 4, 2))
    ref = icing.vessel_icing_mincog(*args, *scal)

    got = run_sharded(lambda *f: icing.vessel_icing_mincog(*f, *scal),
                      mesh, 0, *args)
    np.testing.assert_array_equal(np.asarray(ref.mask),
                                  np.asarray(got.mask))
    m = np.asarray(ref.mask)
    np.testing.assert_array_equal(np.asarray(ref.values)[m],
                                  np.asarray(got.values)[m])

    got_f = run_sharded(
        lambda *f: vessel_icing_mincog_fused(*f, *scal, interpret=True),
        mesh, 0, *args)
    np.testing.assert_array_equal(np.asarray(ref.mask),
                                  np.asarray(got_f.mask))
    np.testing.assert_allclose(np.asarray(got_f.values)[m],
                               np.asarray(ref.values)[m],
                               rtol=2e-4, atol=1e-5)


def test_fused_ty16_and_bad_ty():
    args = _inputs(32, 140, seed=3)
    scal = (5.0, 0.52, 2.0, 11.0, 1)
    ref = vessel_icing_mincog_fused(*args, *scal, interpret=True, ty=8)
    got = vessel_icing_mincog_fused(*args, *scal, interpret=True, ty=16)
    np.testing.assert_array_equal(np.asarray(ref.mask),
                                  np.asarray(got.mask))
    np.testing.assert_allclose(np.asarray(got.values)[np.asarray(ref.mask)],
                               np.asarray(ref.values)[np.asarray(ref.mask)],
                               rtol=2e-5)
    with pytest.raises(ValueError):
        vessel_icing_mincog_fused(*args, *scal, interpret=True, ty=32)
