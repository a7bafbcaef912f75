"""Window and stencil behaviour tests mirroring the reference gtest suite's
``Neighbour`` cross-validation (FieldCalculationsTest.cc:307-451) plus
direct finite-difference checks for the stencil family."""

import jax
import numpy as np
import pytest

from mi_fieldcalc_tpu import from_values, from_sentinel, UNDEF, ops


def _grid10(seed=7):
    rng = np.random.default_rng(seed)
    return rng.uniform(0.0, 10.0, (10, 10)).astype(np.float32)


# ---------------------------------------------------------------------------
# neighbour functions
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("compute", [5, 6])
def test_neighbour_cross_validates_against_sat(compute):
    """neighbourFunctions (windowed loop, step=1) must agree point-for-point
    with neighbourProbFunctions (summed-area-table fast path) — the
    reference pins this in FieldCalculationsTest.cc:392-396."""
    f = from_values(_grid10())
    rng_ = 2
    slow = ops.neighbour_functions(f, [5.0, float(rng_), 1.0], compute)
    fast = ops.neighbour_prob_functions(f, [5.0, float(rng_)], compute)
    sm, fm = np.asarray(slow.mask), np.asarray(fast.mask)
    inner = np.zeros((10, 10), bool)
    inner[rng_:-rng_, rng_:-rng_] = True
    # both undefined on the border ring
    assert not sm[~inner].any() and not fm[~inner].any()
    np.testing.assert_allclose(np.asarray(slow.values)[inner],
                               np.asarray(fast.values)[inner],
                               rtol=1e-6, atol=1e-6)


def test_neighbour_mean_hand_computed():
    v = _grid10()
    f = from_values(v)
    out = ops.neighbour_functions(f, [1.0, 1.0], 1)  # mean, range 1, step 1
    expect = np.mean(v[3 - 1:3 + 2, 4 - 1:4 + 2])
    assert abs(float(out.values[3, 4]) - expect) < 1e-5


def test_neighbour_minmax_and_percentile():
    v = _grid10()
    f = from_values(v)
    mx = ops.neighbour_functions(f, [2.0, 1.0], 2)
    mn = ops.neighbour_functions(f, [2.0, 1.0], 3)
    win = v[5 - 2:5 + 3, 5 - 2:5 + 3]
    assert float(mx.values[5, 5]) == win.max()
    assert float(mn.values[5, 5]) == win.min()
    # percentile 50: the reference sorts the 25-point window and takes
    # index round(0.5*(25-1)) = 12 (cc:3044-3046)
    pct = ops.neighbour_functions(f, [50.0, 2.0, 1.0], 4)
    # reference percentile index: int(ngridp*limit/100) (cc:3015)
    assert float(pct.values[5, 5]) == np.sort(win.ravel())[12]


def test_neighbour_step_block_fill():
    """step > 1: sample points advance by ``step`` and block-fill their
    step x step neighbourhood (cc:3014-3040)."""
    v = _grid10()
    f = from_values(v)
    out = ops.neighbour_functions(f, [2.0, 3.0], 1)  # mean, range 2, step 3
    ov, om = np.asarray(out.values), np.asarray(out.mask)
    # sample at (2+3k); the block around sample (5,5) shares its value
    s = ov[5, 5]
    for yy in range(5, 8):
        for xx in range(5, 8):
            if om[yy, xx]:
                assert ov[yy, xx] == s


# ---------------------------------------------------------------------------
# stencils vs direct finite differences
# ---------------------------------------------------------------------------

def _stencil_setup():
    rng = np.random.default_rng(11)
    ny, nx = 8, 9
    u = rng.normal(0, 10, (ny, nx)).astype(np.float32)
    v = rng.normal(0, 10, (ny, nx)).astype(np.float32)
    xm = np.full((ny, nx), 1e-5, np.float32)
    ym = np.full((ny, nx), 2e-5, np.float32)
    return u, v, xm, ym


def test_relvort_interior_value():
    u, v, xm, ym = _stencil_setup()
    out = ops.relvort(from_values(u), from_values(v), xm, ym)
    y, x = 3, 4
    expect = (0.5 * xm[y, x] * (v[y, x + 1] - v[y, x - 1])
              - 0.5 * ym[y, x] * (u[y + 1, x] - u[y - 1, x]))
    assert abs(float(out.values[y, x]) - expect) < 1e-7


def test_fill_edges_copies_interior_ring():
    u, v, xm, ym = _stencil_setup()
    out = np.asarray(ops.divergence(from_values(u), from_values(v),
                                    xm, ym).values)
    # fillEdges: col0 <- col1, row0 <- row1 (incl corners), etc (cc:59-74)
    np.testing.assert_array_equal(out[0, :], out[1, :])
    np.testing.assert_array_equal(out[-1, :], out[-2, :])
    np.testing.assert_array_equal(out[1:-1, 0], out[1:-1, 1])
    np.testing.assert_array_equal(out[1:-1, -1], out[1:-1, -2])


def test_gradient_undef_hole_blooms_radius1():
    u, v, xm, ym = _stencil_setup()
    u[4, 4] = UNDEF
    out = ops.gradient(from_sentinel(u), xm, ym, 3)
    m = np.asarray(out.mask)
    # the 4 cross neighbours read the hole -> undefined; diagonal unaffected
    assert not m[4, 3] and not m[4, 5] and not m[3, 4] and not m[5, 4]
    assert m[3, 3] and m[5, 5]
    assert m[4, 4]  # centre not read by |grad| stencil


def test_shapiro_preserves_boundary_and_smooths():
    rng = np.random.default_rng(5)
    v = rng.normal(0, 1, (8, 8)).astype(np.float32)
    out = ops.shapiro2_filter(from_values(v))
    ov = np.asarray(out.values)
    # 2nd-order Shapiro with +1/4 then -1/4 passes returns to the input
    # DC level; interior variance must not grow
    assert np.var(ov[1:-1, 1:-1]) <= np.var(v) * 1.5
    assert np.all(np.asarray(out.mask))


def test_momentum_coordinates_use_grid_indices():
    u, v, xm, ym = _stencil_setup()
    fcor = np.full(u.shape, 1e-4, np.float32)
    mx = ops.momentum_x_coordinate(from_values(v), xm, fcor, 1e-5)
    my = ops.momentum_y_coordinate(from_values(u), ym, fcor, 1e-5)
    y, x = 2, 6
    assert abs(float(mx.values[y, x]) - (x + v[y, x] * xm[y, x] / 1e-4)) < 1e-5
    assert abs(float(my.values[y, x]) - (y - u[y, x] * ym[y, x] / 1e-4)) < 1e-5


def test_shapiro_jittable_traced_cond():
    """all_defined=None picks the path with a traced lax.cond - the op
    must be jittable and agree with the static paths on both branches."""
    rng = np.random.default_rng(21)
    v = rng.normal(0, 1, (12, 14)).astype(np.float32)
    jitted = jax.jit(lambda f: ops.shapiro2_filter(f))

    fa = from_values(v)
    out = jitted(fa)
    ref = ops.shapiro2_filter(fa, all_defined=True)
    assert np.allclose(np.asarray(out.values), np.asarray(ref.values))

    vu = v.copy()
    vu[5, 6] = UNDEF
    fu = from_sentinel(vu)
    out_u = jitted(fu)
    ref_u = ops.shapiro2_filter(fu, all_defined=False)
    assert np.array_equal(np.asarray(out_u.values), np.asarray(ref_u.values),
                          equal_nan=True)


def test_window_mean_no_sat_cancellation():
    """The window mean must sum each window directly: reconstructing a
    ~1e2 window sum from ~1e6 SAT corners loses ~1e-3 relative in f32 on
    production-size grids (review finding, 2026-08-18)."""
    import numpy as np
    from mi_fieldcalc_tpu.field import from_sentinel
    from mi_fieldcalc_tpu.ops.window import neighbour_functions

    rng_np = np.random.default_rng(0)
    v = rng_np.uniform(4.0, 6.0, (400, 500)).astype(np.float32)
    out = neighbour_functions(from_sentinel(v), [2.0, 1.0], compute=1)
    m = np.asarray(out.mask)
    got = np.asarray(out.values)
    # float64 ground truth via direct window sums
    ref = np.zeros_like(v, np.float64)
    vv = v.astype(np.float64)
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            ref += np.roll(np.roll(vv, -dy, 0), -dx, 1)
    ref /= 25.0
    err = np.abs(got - ref.astype(np.float32))[m]
    assert err.max() < 5e-5, f"window mean error {err.max()} (SAT regression?)"


def test_window_percentile_validation_and_large_radius():
    import numpy as np
    from mi_fieldcalc_tpu.field import from_sentinel
    from mi_fieldcalc_tpu.ops.window import neighbour_functions
    import pytest as _pytest

    v = from_sentinel(np.arange(100, dtype=np.float32).reshape(10, 10))
    with _pytest.raises(ValueError):
        neighbour_functions(v, [100.0, 2.0], compute=4)
    with _pytest.raises(ValueError):
        neighbour_functions(v, [-10.0, 2.0], compute=4)
    # rng=3 exercises the fori_loop window stack (49 members)
    out = neighbour_functions(v, [50.0, 3.0], compute=4)
    # (4, 4) belongs to the block of sample point (3, 3) (step
    # defaults to 3): median of that sample's 7x7 window rows/cols 0..6
    m = np.asarray(out.mask)
    assert m[4, 4]
    win = np.sort(np.asarray(
        [v.values[y, x] for y in range(0, 7) for x in range(0, 7)]))
    assert np.asarray(out.values)[4, 4] == win[49 * 50 // 100]


def test_neighbour_prob_rejects_negative_range():
    import numpy as np
    import pytest as _pytest
    from mi_fieldcalc_tpu.field import from_sentinel
    from mi_fieldcalc_tpu.ops.window import neighbour_prob_functions

    v = from_sentinel(np.ones((8, 8), np.float32))
    with _pytest.raises(ValueError):
        neighbour_prob_functions(v, [5.0, -1.0], compute=5)
