"""Call-storm batching (mi_fieldcalc_tpu/batch.py): one device program
per storm, results equal to the eager call-by-call path."""

import numpy as np
import pytest

import mi_fieldcalc_tpu.api as fc
from mi_fieldcalc_tpu.batch import BatchError, Deferred

UNDEF = fc.UNDEF


def _grids(ny=24, nx=33, seed=0):
    rng = np.random.default_rng(seed)
    t = rng.uniform(250.0, 300.0, (ny, nx)).astype(np.float32)
    rh = rng.uniform(5.0, 95.0, (ny, nx)).astype(np.float32)
    q = rng.uniform(1e-4, 8e-3, (ny, nx)).astype(np.float32)
    t[0, 0] = UNDEF
    rh[1, 1] = UNDEF
    return t, rh, q


def test_batch_matches_eager():
    t, rh, q = _grids()
    e1 = fc.abshum(t, rh, UNDEF)
    e2 = fc.cvtemp(t, 2)
    e3 = fc.alevelhum(t, q, t * 0 + 900.0, "", 1)
    with fc.batch():
        b1 = fc.abshum(t, rh, UNDEF)
        b2 = fc.cvtemp(t, 2)
        b3 = fc.alevelhum(t, q, t * 0 + 900.0, "", 1)
        assert isinstance(b1, Deferred) and b1.shape == e1.shape
    assert np.array_equal(e1, np.asarray(b1))
    assert np.array_equal(e2, np.asarray(b2))
    assert np.array_equal(e3, np.asarray(b3))


def test_batch_chaining_stays_in_program():
    """A Deferred fed to a later call equals the eager composition."""
    t, rh, q = _grids(seed=1)
    ec = fc.cvtemp(t, 2)                     # K -> C
    eh = fc.abshum(fc.cvtemp(ec, 1), rh, UNDEF)   # back to K, then abshum
    with fc.batch():
        c = fc.cvtemp(t, 2)
        k = fc.cvtemp(c, 1)
        h = fc.abshum(k, rh, UNDEF)
    assert np.array_equal(np.asarray(ec), np.asarray(c))
    assert np.array_equal(np.asarray(eh), np.asarray(h))


def test_batch_invalid_returns_none_eagerly():
    t, rh, _ = _grids()
    with fc.batch():
        bad_shape = fc.abshum(t, rh[:-1], UNDEF)      # mismatched shapes
        bad_param = fc.cvtemp(t, 99)                  # invalid compute
        ok = fc.cvtemp(t, 2)
        assert bad_shape is None
        assert bad_param is None
    assert np.array_equal(np.asarray(ok), fc.cvtemp(t, 2))


def test_batch_early_touch_flushes_segment_and_continues():
    t, rh, _ = _grids(seed=2)
    with fc.batch():
        a = fc.cvtemp(t, 2)
        av = np.asarray(a)                   # early materialization
        assert np.array_equal(av, fc.cvtemp(t, 2))
        b = fc.cvtemp(a, 1)                  # flushed Deferred as input
    assert np.allclose(np.asarray(b), t, rtol=1e-6)


def test_batch_multi_output():
    ny, nx = 16, 20
    rng = np.random.default_rng(3)
    z = rng.uniform(100.0, 5000.0, (ny, nx)).astype(np.float32)
    xm = np.full((ny, nx), 1e-5, np.float32)
    ym = np.full((ny, nx), 1e-5, np.float32)
    fcor = np.full((ny, nx), 1e-4, np.float32)
    eg = fc.ilevelgwind(z, xm, ym, fcor)
    with fc.batch():
        bg = fc.ilevelgwind(z, xm, ym, fcor)
        assert isinstance(bg, tuple) and len(bg) == len(eg)
    for e, b in zip(eg, bg):
        assert np.array_equal(e, np.asarray(b))


def test_batch_undef_propagation():
    t, rh, _ = _grids(seed=4)
    with fc.batch():
        out = fc.abshum(t, rh, UNDEF)
    o = np.asarray(out)
    assert o[0, 0] == UNDEF and o[1, 1] == UNDEF


def test_batch_no_nesting():
    with fc.batch():
        with pytest.raises(BatchError):
            with fc.batch():
                pass


def test_deferred_operators_and_methods():
    """Plain-Python operations on a Deferred materialize and work
    (ADVICE r3: `d + 1`, `d[0, 0]`, `d.mean()` must not TypeError)."""
    t, rh, _ = _grids(seed=5)
    e = fc.cvtemp(t, 2)
    with fc.batch():
        d = fc.cvtemp(t, 2)
        plus = d + 1.0                       # operator inside the context
        elem = d[2, 3]
        mean = d.mean()
    assert np.allclose(plus, e + 1.0)
    assert elem == e[2, 3]
    assert mean == pytest.approx(e.mean())
    assert (2.0 * d).shape == e.shape        # reflected op after exit
    assert np.allclose(np.negative(d), -e)   # ufunc path


def test_batch_failure_marks_deferreds(monkeypatch):
    """A failing device program re-raises on every later data access
    instead of silently yielding None (ADVICE r3)."""
    import mi_fieldcalc_tpu.batch as B
    t, rh, _ = _grids(seed=6)

    def boom(sig, fetch_dtype=None):
        def run(*a):
            raise RuntimeError("injected device failure")
        return run

    with fc.batch():
        d = fc.cvtemp(t, 2)
        monkeypatch.setattr(B, "_compiled_batch", boom)
        with pytest.raises(RuntimeError):
            np.asarray(d)                    # flush fails
    with pytest.raises(BatchError):
        np.asarray(d)                        # stays failed
    with pytest.raises(BatchError):
        with fc.batch():
            fc.cvtemp(d, 1)                  # failed Deferred as input
    monkeypatch.undo()
    with fc.batch():                         # the API recovers after
        ok = fc.cvtemp(t, 2)
    assert np.array_equal(np.asarray(ok), fc.cvtemp(t, 2))


def test_batch_cross_context_device_chaining():
    """A materialized Deferred from a previous batch() feeds a later
    batch() on device (no host round trip) with eager-equal values."""
    t, rh, _ = _grids(seed=7)
    with fc.batch():
        c = fc.cvtemp(t, 2)
    with fc.batch():
        k = fc.cvtemp(c, 1)                  # device-resident input
        h = fc.abshum(k, rh, UNDEF)
    eh = fc.abshum(fc.cvtemp(fc.cvtemp(t, 2), 1), rh, UNDEF)
    assert np.array_equal(np.asarray(h), eh)


def test_batch_input_cache_ships_only_changed(monkeypatch):
    """cache_inputs=True: a repeated storm re-ships only the arrays
    whose objects changed; values stay eager-equal."""
    import jax
    import mi_fieldcalc_tpu.batch as B
    B.clear_input_cache()
    t, rh, q = _grids(seed=8)
    ps = (t * 0 + 900.0).astype(np.float32)

    puts = []
    real_put = jax.device_put
    monkeypatch.setattr(
        jax, "device_put",
        lambda x, *a, **k: (puts.append(np.asarray(x).shape),
                            real_put(x, *a, **k))[1])

    def storm(tt, rr):
        with fc.batch(cache_inputs=True):
            a = fc.abshum(tt, rr, UNDEF)
            b = fc.cvtemp(tt, 2)
            c = fc.alevelhum(tt, q, ps, "", 1)
        return [np.asarray(x) for x in (a, b, c)]

    r1 = storm(t, rh)
    n_first = len(puts)
    assert n_first >= 1                      # cold cycle ships stacks
    puts.clear()
    r2 = storm(t, rh)                        # identical cycle
    assert puts == []                        # nothing re-ships
    rh2 = np.ascontiguousarray(rh * 0.9)
    r3 = storm(t, rh2)                       # one changed input
    assert len(puts) == 1 and puts[0][0] == 1   # one 1-row stack
    for got, want in zip(
            r3, [fc.abshum(t, rh2, UNDEF), fc.cvtemp(t, 2),
                 fc.alevelhum(t, q, ps, "", 1)]):
        assert np.array_equal(got, want)
    assert np.array_equal(r1[0], r2[0])
    B.clear_input_cache()


def test_batch_member_ops_stack_in_program():
    """Ensemble reductions inside batch(): members record as individual
    2-D inputs (stacked in-program), Deferred members chain on device,
    results equal the eager path."""
    t, rh, _ = _grids(seed=10)
    t2 = np.ascontiguousarray(t * 0.99)
    t3 = np.ascontiguousarray(t * 1.01)
    e_sum = fc.sumFields([t, t2, t3])
    e_mean = fc.meanValue([t, t2, t3])
    with fc.batch():
        s = fc.sumFields([t, t2, t3])
        m = fc.meanValue([t, t2, t3])
        c = fc.cvtemp(t, 2)
        chained = fc.maxvalueFields(fc.cvtemp(c, 1), t2)  # Deferred member
        bad = fc.sumFields([t, t2[:-1]])                  # shape mismatch
        assert bad is None
        assert fc.sumFields([]) is None
    assert np.array_equal(np.asarray(s), e_sum)
    assert np.array_equal(np.asarray(m), e_mean)
    e_ch = fc.maxvalueFields(fc.cvtemp(fc.cvtemp(t, 2), 1), t2)
    assert np.array_equal(np.asarray(chained), e_ch)


def test_batch_bf16_fetch():
    """fetch_dtype='bfloat16': half the bytes cross the link, results
    come back float32 within bf16 precision, the sentinel is re-snapped
    EXACTLY, and chaining a bf16-fetched Deferred into a later
    (full-precision) batch re-snaps in-program."""
    t, rh, _ = _grids(seed=11)
    e = fc.abshum(t, rh, UNDEF)
    with fc.batch(fetch_dtype="bfloat16"):
        a = fc.abshum(t, rh, UNDEF)
        b = fc.cvtemp(t, 2)
    av = np.asarray(a)
    assert av.dtype == np.float32
    und = e == np.float32(UNDEF)
    assert np.array_equal(av == np.float32(UNDEF), und)
    assert np.allclose(av[~und], e[~und], rtol=1e-2)
    with fc.batch():
        c = fc.cvtemp(b, 1)                  # bf16 Deferred as input
    cv = np.asarray(c)
    t_und = t == np.float32(UNDEF)
    assert np.array_equal(cv == np.float32(UNDEF), t_und)
    assert np.allclose(cv[~t_und], t[~t_und], rtol=1e-2)
    with pytest.raises(ValueError):
        fc.batch(fetch_dtype="float16")


def test_batch_fetched_stack_is_readonly():
    """Materialized Deferreds view a per-shape-group host stack shared
    by every sibling; the view must be read-only so an in-place edit
    raises instead of corrupting sibling outputs (ADVICE r4)."""
    t, rh, _ = _grids(seed=12)
    with fc.batch():
        a = fc.abshum(t, rh, UNDEF)
        b = fc.cvtemp(t, 2)
    av = np.asarray(a)
    with pytest.raises(ValueError):
        av[0, 0] = 42.0
    # a writable copy is one .copy() away and detached from siblings
    aw = av.copy()
    aw[0, 0] = 42.0
    assert np.asarray(b)[0, 0] != 42.0


def test_batch_cache_stats_and_temporaries(monkeypatch):
    """cache_stats(): hit/miss/put/eviction telemetry; per-call
    conversion temporaries (float64 inputs) are neither cached nor
    counted as lookups (ADVICE r4)."""
    import mi_fieldcalc_tpu.batch as B
    B.clear_input_cache()
    B.cache_stats(reset=True)
    t, rh, _ = _grids(seed=13)
    t64 = t.astype(np.float64)               # converted per call

    def storm():
        with fc.batch(cache_inputs=True):
            a = fc.abshum(t, rh, UNDEF)      # t, rh owned -> cacheable
            b = fc.cvtemp(t64, 2)            # temporary -> never cached
        return np.asarray(a), np.asarray(b)

    r1 = storm()
    s = B.cache_stats()
    assert s["entries"] == 2 and s["puts"] == 2      # only t and rh
    assert s["misses"] == 2 and s["hits"] == 0
    assert s["resident_bytes"] > 0
    assert s["budget_bytes"] == B._cache_budget()
    r2 = storm()                             # warm cycle: both hit
    s = B.cache_stats()
    assert s["hits"] == 2 and s["misses"] == 2 and s["entries"] == 2
    assert np.array_equal(r1[0], r2[0]) and np.array_equal(r1[1], r2[1])

    # evictions: shrink the budget below one entry's stack bytes
    monkeypatch.setenv("MF_BATCH_CACHE_MB", "0")
    t2 = np.ascontiguousarray(t + 1.0)
    with fc.batch(cache_inputs=True):
        c = fc.cvtemp(t2, 2)
    np.asarray(c)
    s = B.cache_stats(reset=True)
    assert s["evictions"] >= 1
    assert B.cache_stats()["hits"] == 0      # reset zeroed counters
    B.clear_input_cache()


def test_fetch_subset_grouped(monkeypatch):
    """fc.fetch(): subset consumers cross the link once per dtype with
    only the requested rows; results equal np.asarray, later full
    fetches still work, and already-fetched rows are served from the
    row cache (no second transfer)."""
    import jax
    import mi_fieldcalc_tpu.batch as B

    t, rh, q = _grids(seed=20)
    with fc.batch():
        a = fc.abshum(t, rh, UNDEF)
        b = fc.cvtemp(t, 2)
        c = fc.alevelhum(t, q, t * 0 + 900.0, "", 1)
        d = fc.cvtemp(rh, 2)

    gets = []
    real_get = jax.device_get
    monkeypatch.setattr(jax, "device_get",
                        lambda x: (gets.append(np.asarray(x).nbytes),
                                   real_get(x))[1])
    got_a, got_c = fc.fetch(a, c)
    # one transfer, carrying exactly two planes
    assert len(gets) == 1
    assert gets[0] == 2 * t.size * 4
    assert np.array_equal(got_a, fc.abshum(t, rh, UNDEF))
    assert np.array_equal(got_c, fc.alevelhum(t, q, t * 0 + 900.0, "", 1))
    # cached row: no new transfer; read-only like stack fetches
    gets.clear()
    av = np.asarray(a)
    assert gets == [] and not av.flags.writeable
    # untouched sibling still fetches (whole stack now)
    bv = np.asarray(b)
    assert len(gets) == 1
    assert np.array_equal(bv, fc.cvtemp(t, 2))
    assert np.array_equal(np.asarray(d), fc.cvtemp(rh, 2))
    # passthrough of non-Deferred args
    (x,) = fc.fetch(t)
    assert np.array_equal(x, t)


def test_fetch_subset_bf16():
    """fc.fetch composes with fetch_dtype='bfloat16': half-width rows,
    exact sentinel re-snap."""
    t, rh, _ = _grids(seed=21)
    e = fc.abshum(t, rh, UNDEF)
    with fc.batch(fetch_dtype="bfloat16"):
        a = fc.abshum(t, rh, UNDEF)
        fc.cvtemp(t, 2)
    (av,) = fc.fetch(a)
    assert av.dtype == np.float32
    und = e == np.float32(UNDEF)
    assert np.array_equal(av == np.float32(UNDEF), und)
    assert np.allclose(av[~und], e[~und], rtol=1e-2)


def test_fetch_failure_surfaces_as_batcherror(monkeypatch):
    """fc.fetch keeps the module's error contract: an async device
    failure raises BatchError and is CACHED on the stack handle, so a
    retry re-raises instead of re-running the gather (review r5)."""
    import jax

    t, rh, _ = _grids(seed=30)
    with fc.batch():
        a = fc.abshum(t, rh, UNDEF)
        fc.cvtemp(t, 2)

    calls = []

    def boom(x):
        calls.append(1)
        raise RuntimeError("simulated async device failure")

    monkeypatch.setattr(jax, "device_get", boom)
    with pytest.raises(BatchError):
        fc.fetch(a)
    assert calls == [1]
    with pytest.raises(BatchError):          # cached: no second gather
        fc.fetch(a)
    assert calls == [1]
    with pytest.raises(BatchError):          # np.asarray agrees
        np.asarray(a)
