"""Sharded-vs-unsharded equivalence for the domain-decomposition subsystem.

The reference has no distributed backend (SURVEY §2.7); these tests pin the
new framework's contract instead: running any stencil operator through
``run_sharded`` on a (gy, gx) device mesh produces bit-identical values and
masks to the single-device run, including fillEdges behaviour at physical
boundaries and undef propagation across shard seams.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mi_fieldcalc_tpu import Field, from_sentinel, UNDEF
from mi_fieldcalc_tpu.ops import (
    gradient, relvort, absvort, divergence, advection, jacobian,
    plevelgwind_xcomp, plevelgvort, plevelqvector, thermal_front_parameter,
    ilevelgwind, abshum,
)
from mi_fieldcalc_tpu.parallel import grid_mesh, run_sharded, partition_spec
from jax.sharding import NamedSharding


def _grids(ny=32, nx=48, batch=None, seed=0, holes=True):
    rng = np.random.default_rng(seed)
    shape = (ny, nx) if batch is None else (batch, ny, nx)
    z = rng.normal(5000, 100, shape).astype(np.float32)
    t = rng.normal(280, 5, shape).astype(np.float32)
    if holes:
        z[..., 3, 7] = UNDEF
        z[..., 0, 0] = UNDEF      # physical corner
        t[..., 15, 23] = UNDEF    # interior of a different shard
        t[..., 16, 0] = UNDEF     # physical left edge, shard seam row
    xm = np.full(shape, 1e-5, np.float32)
    ym = np.full(shape, 1.1e-5, np.float32)
    fc = np.full(shape, 1e-4, np.float32)
    return from_sentinel(z), from_sentinel(t), xm, ym, fc


def _assert_field_equal(ref: Field, shd: Field):
    ref_m, shd_m = np.asarray(ref.mask), np.asarray(shd.mask)
    np.testing.assert_array_equal(ref_m, shd_m)
    # compare values only where defined (masked-out lanes are unspecified)
    rv = np.asarray(ref.values) * ref_m
    sv = np.asarray(shd.values) * shd_m
    np.testing.assert_array_equal(rv, sv)


MESHES = [(1, 2, 4), (1, 4, 2), (1, 1, 8), (1, 8, 1)]

OPS = [
    ("gradient_dx", lambda f, x, y: gradient(f, x, y, 1), 1, "zt_xy"),
    ("gradient_abs", lambda f, x, y: gradient(f, x, y, 3), 1, "zt_xy"),
    ("gradient_lapl", lambda f, x, y: gradient(f, x, y, 4), 1, "zt_xy"),
    ("relvort", relvort, 1, "uv_xy"),
    ("divergence", divergence, 1, "uv_xy"),
    ("jacobian", jacobian, 1, "uv_xy"),
    ("gwind_x", plevelgwind_xcomp, 1, "z_xyf"),
    ("gvort", plevelgvort, 1, "z_xyf"),
    ("qvector", lambda z, t, x, y, f: plevelqvector(z, t, x, y, f, p=500.0,
                                                    compute=1), 2, "ztxyf"),
    ("tfp", thermal_front_parameter, 2, "t_xy"),
]


def _build_args(kind, z, t, xm, ym, fc):
    if kind == "zt_xy":
        return (z, xm, ym)
    if kind == "uv_xy":
        return (z, t, xm, ym)
    if kind == "z_xyf":
        return (z, xm, ym, fc)
    if kind == "ztxyf":
        return (z, t, xm, ym, fc)
    if kind == "t_xy":
        return (t, xm, ym)
    raise KeyError(kind)


@pytest.mark.parametrize("name,fn,radius,kind", OPS,
                         ids=[o[0] for o in OPS])
def test_sharded_equivalence(name, fn, radius, kind):
    z, t, xm, ym, fc = _grids()
    mesh = grid_mesh((1, 2, 4))
    args = _build_args(kind, z, t, xm, ym, fc)
    _assert_field_equal(fn(*args), run_sharded(fn, mesh, radius, *args))


@pytest.mark.parametrize("mesh_shape", MESHES)
def test_sharded_equivalence_mesh_shapes(mesh_shape):
    z, t, xm, ym, fc = _grids()
    mesh = grid_mesh(mesh_shape)
    ref = plevelqvector(z, t, xm, ym, fc, p=500.0, compute=3)
    shd = run_sharded(
        lambda *a: plevelqvector(*a, p=500.0, compute=3), mesh, 2,
        z, t, xm, ym, fc)
    _assert_field_equal(ref, shd)


def test_sharded_tuple_output():
    z, t, xm, ym, fc = _grids()
    mesh = grid_mesh((1, 2, 4))
    ref_u, ref_v = ilevelgwind(z, xm, ym, fc)
    shd_u, shd_v = run_sharded(ilevelgwind, mesh, 1, z, xm, ym, fc)
    _assert_field_equal(ref_u, shd_u)
    _assert_field_equal(ref_v, shd_v)


def test_sharded_batched():
    """Leading level axis sharded over 'lev', spatial over (gy, gx)."""
    z, t, xm, ym, fc = _grids(batch=4)
    mesh = grid_mesh((2, 2, 2))
    ref = relvort(z, t, xm, ym)
    shd = run_sharded(relvort, mesh, 1, z, t, xm, ym)
    _assert_field_equal(ref, shd)


def test_elementwise_gspmd():
    """Pointwise ops need no halo machinery: jit + NamedSharding inputs
    must match the single-device result exactly (XLA GSPMD partitioning)."""
    z, t, xm, ym, fc = _grids(holes=False)
    rng = np.random.default_rng(1)
    rh = from_sentinel(rng.uniform(10, 95, (32, 48)).astype(np.float32))
    mesh = grid_mesh((1, 2, 4))
    sh = NamedSharding(mesh, partition_spec(2, mesh))
    t_sh = Field(jax.device_put(t.values, sh), jax.device_put(t.mask, sh))
    rh_sh = Field(jax.device_put(rh.values, sh), jax.device_put(rh.mask, sh))
    # jitted-vs-jitted: eager and jit may fuse float math differently, but
    # GSPMD partitioning of a pointwise program must be bit-identical.
    ref = jax.jit(abshum)(t, rh)
    shd = jax.jit(abshum)(t_sh, rh_sh)
    _assert_field_equal(ref, shd)


@pytest.mark.parametrize("mesh_shape", [(1, 2, 4), (1, 8, 1), (1, 1, 8)])
def test_sharded_momentum_coordinates(mesh_shape):
    """m/n coordinates use the GLOBAL grid index (reference i%nx, i/nx):
    each shard must offset its local iota by the shard origin
    (ShardCtx; a local iota is wrong by the shard offset)."""
    from mi_fieldcalc_tpu.ops import (momentum_x_coordinate,
                                      momentum_y_coordinate)

    z, t, xm, ym, fc = _grids(holes=False)
    mesh = grid_mesh(mesh_shape)
    for fn, m in ((lambda v, mp, f: momentum_x_coordinate(v, mp, f, 1e-5),
                   xm),
                  (lambda v, mp, f: momentum_y_coordinate(v, mp, f, 1e-5),
                   ym)):
        _assert_field_equal(fn(z, m, fc),
                            run_sharded(fn, mesh, 0, z, m, fc))


@pytest.mark.parametrize("mesh_shape", [(1, 2, 4), (1, 8, 1)])
@pytest.mark.parametrize("holes", [False, True])
def test_sharded_shapiro(mesh_shape, holes):
    """shapiro2_filter under sharding: boundary copies fire at PHYSICAL
    edges (not padded-block edges smoothing against zero halos), and the
    all-defined branch is a global pmin decision, not per-shard."""
    from mi_fieldcalc_tpu.ops import shapiro2_filter

    z, t, xm, ym, fc = _grids(holes=holes)
    mesh = grid_mesh(mesh_shape)
    ref = shapiro2_filter(t)
    shd = run_sharded(shapiro2_filter, mesh, 2, t)
    _assert_field_equal(ref, shd)


@pytest.mark.parametrize("axis,mesh_shape", [(-2, (1, 4, 2)),
                                             (-1, (1, 2, 4))])
def test_packed_strip_exchange_matches_per_array(axis, mesh_shape):
    """The packed halo legs (one ppermute per direction x dtype —
    parallel/fused._exchange_all) deliver exactly the strips the
    per-array exchange does, on BOTH trailing axes, for mixed
    2-D/3-D f32 and bool arrays."""
    from functools import partial
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P
    from mi_fieldcalc_tpu.parallel.halo import (_exchange_1d,
                                                packed_exchange_cols,
                                                packed_exchange_rows)

    mesh = grid_mesh(mesh_shape)
    rng = np.random.default_rng(3)
    ny, nx = 32, 256
    arrs = [rng.normal(size=(3, ny, nx)).astype(np.float32),
            rng.normal(size=(ny, nx)).astype(np.float32),
            rng.random((3, ny, nx)) < 0.5,
            rng.random((ny, nx)) < 0.5]
    h = 2
    name, size = ("gy", mesh.shape["gy"]) if axis == -2 else \
                 ("gx", mesh.shape["gx"])
    packed = packed_exchange_rows if axis == -2 else packed_exchange_cols

    specs = tuple(partition_spec(a.ndim, mesh) for a in arrs)
    out_specs = specs

    @partial(shard_map, mesh=mesh, in_specs=specs, out_specs=out_specs,
             check_rep=False)
    def via_packed(*a):
        return tuple(packed(list(a), h, mesh))

    @partial(shard_map, mesh=mesh, in_specs=specs, out_specs=out_specs,
             check_rep=False)
    def via_per_array(*a):
        return tuple(_exchange_1d(x, h, x.ndim + axis, name, size)
                     for x in a)

    got = via_packed(*arrs)
    want = via_per_array(*arrs)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_packed_sendrecv_roundtrip():
    """packed_sendrecv delivers PRE-SLICED strips (the 2-D overlap
    path's corner-extended columns) to the right neighbours with dtypes
    restored and zeros at physical edges."""
    from functools import partial
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P
    from mi_fieldcalc_tpu.parallel.halo import packed_sendrecv

    import jax as _jax
    mesh = grid_mesh((1, 1, 4), devices=_jax.devices()[:4])
    gx = mesh.shape["gx"]
    rng = np.random.default_rng(9)
    nys, nyl = 20, 16      # strips taller than the local block (y-ext)
    f3 = rng.normal(size=(2, nys, 2)).astype(np.float32)
    f2 = rng.normal(size=(nys, 2)).astype(np.float32)
    b3 = rng.random((2, nys, 2)) < 0.5
    # strips are shard-LOCAL payloads: replicate in, index by shard
    import jax

    @partial(shard_map, mesh=mesh, in_specs=(P(), P(), P()),
             out_specs=(P("gx"), P("gx"), P("gx")),
             check_vma=False)
    def run(a3, a2, m3):
        ix = jax.lax.axis_index("gx").astype(np.float32)
        lo = [a3 + ix, a2 + ix, m3]
        hi = [a3 - ix, a2 - ix, ~m3]
        prev, nxt = packed_sendrecv(lo, hi, "gx", gx)
        # return something shard-indexed for inspection
        return (prev[0][None], nxt[1][None], prev[2][None])

    got_prev3, got_next2, got_prevb = run(f3, f2, b3)
    got_prev3 = np.asarray(got_prev3).reshape(gx, 2, nys, 2)
    got_next2 = np.asarray(got_next2).reshape(gx, nys, 2)
    got_prevb = np.asarray(got_prevb).reshape(gx, 2, nys, 2)
    for i in range(gx):
        if i == 0:      # physical edge: zeros
            assert not got_prev3[0].any()
            assert not got_prevb[0].any()
        else:           # neighbour i-1's hi strip: f3 - (i-1)
            np.testing.assert_allclose(got_prev3[i], f3 - (i - 1))
            np.testing.assert_array_equal(got_prevb[i], ~b3)
        if i == gx - 1:
            assert not got_next2[i].any()
        else:           # neighbour i+1's lo strip: f2 + (i+1)
            np.testing.assert_allclose(got_next2[i], f2 + (i + 1))
        assert got_prevb.dtype == np.bool_


def test_factor_devices_for_grid():
    """Grid-aware factorization picks the (gy, gx) split minimising the
    padded footprint: deep 1-D gy meshes round tiny local rows up to
    8-row tiles (721 rows over 128 shards -> 42% dead), while x splits
    pay 128-lane alignment — the best mesh balances both (PERF.md)."""
    from mi_fieldcalc_tpu.parallel import factor_devices_for_grid
    from mi_fieldcalc_tpu.layout import padded_shape_sharded

    # global 0.25-degree grid at 128 chips: 2-D beats 1-D decisively
    lev, gy, gx = factor_devices_for_grid(721, 1440, 128)
    assert (lev, gy * gx) == (1, 128)
    ny_p, nx_p = padded_shape_sharded(721, 1440, gy, gx)
    live = 721 * 1440 / (ny_p * nx_p)
    assert live > 0.85              # 1-D gy=128 gives 0.66
    assert gx in (2, 4)             # lane-friendly x splits only

    # exhaustively optimal: no divisor pair does better
    best = min(padded_shape_sharded(721, 1440, n // g, g)[0]
               * padded_shape_sharded(721, 1440, n // g, g)[1]
               for n in [128] for g in range(1, n + 1) if n % g == 0)
    assert ny_p * nx_p == best

    # tiny grid: (8, 1) and (4, 2) tie at 8192 padded points, but the
    # fused sharded pipeline needs ny >= 8*gy (32 < 64 rejects gy=8) —
    # the recommended default must build a mesh the flagship path runs on
    assert factor_devices_for_grid(32, 48, 8) == (1, 4, 2)
    # ...and the constraint is a filter, not just a tie-break: usable
    # pairs win even when an unusable pair pads strictly fewer points
    # (gy=8 carries 4 unpadded rows/shard, below the fused path's 8)
    assert factor_devices_for_grid(32, 257, 8) == (1, 4, 2)
    # ...but it keys on CARRIED rows: ny % gy != 0 forces padded
    # carriage, whose 8-row tiles always satisfy the constraint — the
    # padding-optimal (2, 1) must win here (16x384 < 16x512 points)
    assert factor_devices_for_grid(15, 257, 2) == (1, 2, 1)

    # impossible decomposition raises
    import pytest as _pytest
    with _pytest.raises(ValueError):
        factor_devices_for_grid(2, 2, 64)


def test_grid_mesh_grid_shape_kwarg():
    """grid_mesh(grid_shape=...) builds the padding-optimal mesh and
    rejects conflicting arguments."""
    from mi_fieldcalc_tpu.parallel import grid_mesh

    m = grid_mesh(grid_shape=(721, 1440))
    assert m.shape["lev"] == 1 and m.shape["gy"] * m.shape["gx"] == 8
    assert (m.shape["gy"], m.shape["gx"]) == (4, 2)
    with pytest.raises(ValueError):
        grid_mesh((1, 2, 4), grid_shape=(8, 8))


@pytest.mark.parametrize("mesh_shape", [(1, 2, 4), (1, 4, 1), (1, 1, 8)])
@pytest.mark.parametrize("compute,consts", [
    (1, (3.0, 3.0)),        # mean, rng=3 step=3
    (2, (2.0, 4.0)),        # max, rng=2 step=4
    (4, (30.0, 2.0, 3.0)),  # 30th percentile, rng=2 step=3
    (5, (280.0, 3.0, 2.0)),  # prob above, rng=3 step=2
    (1, (2.0, 1.0)),        # step=1: every point its own sample
])
def test_sharded_neighbour_functions(mesh_shape, compute, consts):
    """neighbour_functions under domain decomposition: the border-undef
    ring and the strided sample/block grid are GLOBAL-coordinate
    semantics — every shard must agree with the unsharded run bit for
    bit (composed halo radius = range + step - 1)."""
    from mi_fieldcalc_tpu.ops import neighbour_functions

    z, t, xm, ym, fc = _grids(ny=40, nx=64, holes=False)
    ndev = int(np.prod(mesh_shape))
    mesh = grid_mesh(mesh_shape, devices=jax.devices()[:ndev])
    rng = int(consts[0] if compute < 4 else consts[1])
    step = int(consts[-1]) if len(consts) >= (2 if compute < 4 else 3) else 3
    radius = rng + step - 1
    fn = lambda f: neighbour_functions(f, consts, compute)
    _assert_field_equal(fn(t), run_sharded(fn, mesh, radius, t))


@pytest.mark.parametrize("mesh_shape", [(1, 2, 4), (1, 8, 1)])
def test_sharded_neighbour_prob_functions(mesh_shape):
    from mi_fieldcalc_tpu.ops import neighbour_prob_functions

    z, t, xm, ym, fc = _grids(ny=40, nx=64, holes=False)
    mesh = grid_mesh(mesh_shape)
    fn = lambda f: neighbour_prob_functions(f, (280.0, 4.0), 5)
    _assert_field_equal(fn(t), run_sharded(fn, mesh, 4, t))


def test_sharded_cvtemp_autodetect_global_mean():
    """cvtemp modes 3/4 branch on the GLOBAL defined-value mean: a field
    whose top shards look like Celsius and bottom like Kelvin must make
    the same convert/skip decision on every shard (psum of the partial
    sums — SURVEY §7 hard part 4)."""
    from mi_fieldcalc_tpu.ops import cvtemp

    ny, nx = 32, 48
    v = np.zeros((ny, nx), np.float32)
    v[:16] = 10.0          # Celsius-looking half
    v[16:] = 290.0         # Kelvin-looking half; global mean = 150 > t0/2
    f = from_sentinel(v)
    mesh = grid_mesh((1, 4, 2))
    for compute in (3, 4):
        ref = cvtemp(f, compute)
        shd = run_sharded(lambda a: cvtemp(a, compute), mesh, 0, f)
        _assert_field_equal(ref, shd)


def test_sharded_probability_global_member_flags():
    """probability's whole-field member flag under run_sharded: member 1
    is defined only in the top-left corner — shards that see none of it
    must still count it in the denominator (pmax across shards)."""
    from mi_fieldcalc_tpu.ops import probability

    n_ens, ny, nx = 4, 32, 48
    vals = np.full((n_ens, ny, nx), 12.0, np.float32)
    vals[1] = UNDEF
    vals[1, :4, :4] = 9.0       # defined only in shard (0, 0)
    members = from_sentinel(vals)
    mesh = grid_mesh((1, 2, 4))
    ref = probability(1, members, [10.0])
    shd = run_sharded(lambda m: probability(1, m, [10.0]), mesh, 0, members)
    _assert_field_equal(ref, shd)
