"""Call-storm batching for the drop-in API.

The reference's production caller (Diana-style) issues MANY small
per-field calculations back to back; each drop-in call pays this
backend's fixed per-program dispatch cost (~0.9-4 ms over the tunnel —
PERF.md "Structural light speed" item 5), which dwarfs the math on
small grids (BASELINE config 1: a 96x128 op is ~50 us of device work
behind ~1.3 ms of dispatch).  The reference amortizes nothing — every
C++ call walks the grid once — but it also pays no dispatch; a TPU
port that dispatches per call loses exactly where the reference's
callers are chattiest.

``batch()`` gives the storm one dispatch:

    import mi_fieldcalc_tpu.api as fc
    with fc.batch():
        a = fc.abshum(t, rh, -1)          # deferred — no device work yet
        b = fc.cvtemp(a, 2)               # chains on a: stays on device
        c = fc.kIndex(t5, t7, rh7, t8, rh8, 500., 700., 850., 1)
    print(np.asarray(b))                  # everything ran as ONE program

Inside the context every api call records itself and returns a
:class:`Deferred`; results chain (a Deferred passed as an input threads
the traced value through the SAME program — no host round trip).  The
whole recorded DAG compiles to one jitted program, cached by the call
sequence's static signature (op identities, scalar parameters, shapes),
so a repeating forecast-cycle storm compiles once and then costs one
dispatch per cycle.  Materialization happens lazily: context exit (or
an early data touch) RUNS the program, but result bytes cross the
tunnel only when a Deferred's data is actually read — one stacked
fetch per output-shape group, shared by every Deferred in the group.

Forecast cycles (repeated storms) get two more levers:

* **outputs stay on device** — a flushed Deferred passed into a later
  call (same batch or a later ``batch()`` context) is fed to the next
  program as its device-resident stack row; no host round trip, no
  re-upload;
* **device-resident input caching** (``batch(cache_inputs=True)``) —
  concrete inputs are cached on device keyed by the *identity* of the
  caller's float32 array (the cache pins the array, so the key cannot
  be recycled); a cycle that re-passes the same terrain/threshold
  arrays ships only the arrays that actually changed.  The cache is
  process-global with an LRU byte budget (``MF_BATCH_CACHE_MB``,
  default 256) and survives across ``batch()`` contexts; clear it with
  :func:`clear_input_cache`, inspect it with :func:`cache_stats`
  (hit/miss/eviction counters + pinned bytes).  Identity caching
  requires the caller to (a) pass the SAME ndarray object for
  unchanged fields — float64/list inputs are converted per call and
  are neither cached nor looked up (a fresh temporary can never hit;
  caching it would only pin bytes and churn the LRU) — and (b) not
  mutate a passed array in place; pass a fresh array for changed data.

Input capture semantics: recorded calls hold input arrays BY REFERENCE
and read them at flush time (context exit / first data touch).  The
eager path snapshots values at call time; mutating an input array in
place between a recorded call and the flush is therefore undefined —
flush first (touch any Deferred) or pass a copy.  This is the one
intentional semantic difference from the eager path; see
docs/MIGRATION.md.

Reference-binding semantics preserved:

* invalid shapes/parameters return ``None`` AT CALL TIME (validation
  runs eagerly via ``jax.eval_shape`` — no device work), exactly like
  the eager path (py_mi_fieldcalc.cc:72-96);
* each call carries its own ``undef`` sentinel; decode/encode happen
  in-program at the call boundaries, so chained calls re-enter through
  the same sentinel contract as the eager path (results equal the
  eager call-by-call composition);
* multi-output ops (ilevelgwind, neighbourFunctions) return a tuple of
  Deferreds.

If the device program fails (compile or runtime), the segment's
Deferreds are marked failed and every later data access re-raises the
stored error as a :class:`BatchError` — a failed storm can never be
mistaken for data.
"""

from __future__ import annotations

import collections
import functools
import os
import threading

import numpy as np

from .field import Field, from_sentinel

__all__ = ["batch", "Deferred", "BatchError", "clear_input_cache",
           "cache_stats", "fetch"]

_state = threading.local()


class BatchError(RuntimeError):
    pass


def active_batch():
    return getattr(_state, "batch", None)


class _StackHandle:
    """One device-resident output stack, fetched to host at most once
    (one stacked transfer shared by every Deferred in the group) — or
    row-by-row via :func:`fetch` for subset consumers."""

    __slots__ = ("dev", "host", "host_rows", "failed")

    def __init__(self, dev):
        self.dev = dev
        self.host = None
        self.host_rows = {}        # row -> host plane (subset fetches)
        self.failed = None

    def _freeze(self, a):
        # Every Deferred in the group views shared host buffers (and
        # they can persist across batch() contexts as the device-
        # chaining host cache): an in-place edit of one materialized
        # result would silently corrupt its siblings.  Freeze so such
        # edits raise; consumers that need a writable array get one via
        # .copy() / astype (ADVICE r4).
        a.flags.writeable = False
        return a

    def fetch(self):
        if self.failed is not None:
            raise BatchError(
                "batched program failed; no data") from self.failed
        if self.host is None:
            import jax
            try:
                self.host = self._freeze(
                    np.asarray(jax.device_get(self.dev)))
            except Exception as e:          # surface async device errors
                self.failed = e
                raise BatchError(
                    "batched program failed; no data") from e
        return self.host

    def row(self, r):
        """Host plane for stack row ``r`` (whole-stack copy if already
        fetched, else the subset cache, else one whole-stack fetch)."""
        if self.host is not None:
            return self.host[r]
        got = self.host_rows.get(r)
        return got if got is not None else self.fetch()[r]

    def put_rows(self, rows, planes):
        for r, p in zip(rows, planes):
            self.host_rows[r] = self._freeze(np.ascontiguousarray(p))

    def missing(self, rows):
        if self.host is not None:
            return []
        return [r for r in rows if r not in self.host_rows]


class Deferred(np.lib.mixins.NDArrayOperatorsMixin):
    """Lazy handle for one output of a batched call.

    Data access (``np.asarray``, any arithmetic operator, indexing, or
    a numpy method like ``.mean()``) flushes the pending batch segment
    if needed and fetches the output's stack from the device (once per
    stack).  The device copy is kept, so passing a materialized
    Deferred into a later batched call re-uses it on device.
    """

    def __init__(self, batch, aval, undef=None):
        self._batch = batch
        self.shape = tuple(aval.shape)
        self.dtype = aval.dtype
        self._undef = undef
        self._dev = None              # (_StackHandle, row) once executed
        self._failed = None

    @property
    def ndim(self):
        return len(self.shape)

    def __array__(self, dtype=None, copy=None):
        return np.asarray(self.value(), dtype=dtype)

    def __array_ufunc__(self, ufunc, method, *inputs, **kwargs):
        inputs = tuple(np.asarray(x) if isinstance(x, Deferred) else x
                       for x in inputs)
        return getattr(ufunc, method)(*inputs, **kwargs)

    def __getitem__(self, idx):
        return self.value()[idx]

    def __len__(self):
        if not self.shape:
            raise TypeError("len() of unsized Deferred")
        return self.shape[0]

    #: numpy conveniences that may materialize the Deferred.  A
    #: WHITELIST, not a catch-all: an open __getattr__ would let any
    #: duck-typing probe (``hasattr(x, "mask")``, ``getattr(x, "foo",
    #: None)``) silently flush the half-recorded storm and drag the
    #: whole output stack over the link (round-4 review finding).
    _NUMPY_ATTRS = frozenset((
        "mean", "sum", "min", "max", "std", "var", "prod", "any", "all",
        "argmin", "argmax", "round", "clip", "astype", "reshape",
        "ravel", "flatten", "copy", "tolist", "item", "T", "size",
        "nbytes", "real", "imag", "flat", "data", "itemsize",
    ))

    def __getattr__(self, name):
        if name in self._NUMPY_ATTRS:
            return getattr(np.asarray(self), name)
        raise AttributeError(name)

    def value(self):
        if self._failed is not None:
            raise BatchError(
                "batched program failed; no data") from self._failed
        if self._dev is None:
            self._batch.flush()
            if self._failed is not None:
                raise BatchError(
                    "batched program failed; no data") from self._failed
        handle, row = self._dev
        v = handle.row(row)
        if v.dtype != np.float32:
            # half-width fetch (fetch_dtype): widen back and re-snap
            # the rounded sentinel to the call's exact undef
            snap = _rounded_undef(self._undef, v.dtype)
            v = v.astype(np.float32)
            if snap != self._undef:
                v = np.where(v == np.float32(snap),
                             np.float32(self._undef), v)
        return v


def fetch(*outputs):
    """Materialize the given batch outputs with the FEWEST link
    transfers — the subset-consumer fetch (round 5, VERDICT r4 item 7).

    ``np.asarray(deferred)`` fetches the whole per-shape-group output
    stack (best for fetch-everything consumers: one transfer amortizes
    the link's 15-30 ms per-transfer latency over every sibling).  A
    consumer that reads only a few of a storm's outputs over-fetches
    there: this call instead gathers exactly the requested rows ON
    DEVICE (one gather per stack, concatenated across stacks per
    dtype) and crosses the link ONCE per dtype — for k planes out of a
    K-plane cycle that is one latency plus k/K of the bytes, instead
    of the full-stack payload.

    Arguments may be Deferreds (pending ones flush first) or plain
    arrays (passed through); returns a list of numpy arrays in call
    order.  Fetched rows are cached on their stack handles, so later
    ``np.asarray`` of the same Deferred is free, and a later
    whole-stack fetch still works.  Composes with
    ``fetch_dtype="bfloat16"`` (rows cross half-width; sentinels
    re-snap exactly as in :meth:`Deferred.value`).

    >>> with fc.batch(cache_inputs=True) as _:
    ...     outs = storm()                  # 22 recorded calls
    >>> td, ws = fc.fetch(outs[3], outs[7]) # 2 planes cross, not 22
    """
    import jax
    import jax.numpy as jnp

    ds = [o for o in outputs if isinstance(o, Deferred)]
    for d in ds:
        if d._dev is None and d._failed is None:
            d._batch.flush()
    by_handle = {}
    for d in ds:
        if d._failed is not None:
            continue                     # value() below re-raises
        handle, row = d._dev
        by_handle.setdefault(id(handle), (handle, set()))[1].add(row)
    plan = []
    for handle, rows in by_handle.values():
        if handle.failed is not None:
            continue
        need = handle.missing(sorted(rows))
        if need:
            plan.append((handle, need))
    if plan:
        groups = {}
        for handle, rows in plan:
            groups.setdefault(str(handle.dev.dtype), []).append(
                (handle, rows))
        for items in groups.values():
            try:
                flats = [h.dev[jnp.asarray(rows)].reshape(-1)
                         for h, rows in items]
                buf = (flats[0] if len(flats) == 1
                       else jnp.concatenate(flats))
                host = np.asarray(jax.device_get(buf))
            except Exception as e:
                # same contract as _StackHandle.fetch: an async device
                # failure surfaces as BatchError and is CACHED on every
                # involved handle, so retries raise instead of
                # re-running the doomed gather
                for h, _ in items:
                    h.failed = e
                raise BatchError(
                    "batched program failed; no data") from e
            off = 0
            for h, rows in items:
                plane = int(np.prod(h.dev.shape[1:]))
                k = len(rows)
                block = host[off:off + k * plane].reshape(
                    (k,) + tuple(h.dev.shape[1:]))
                h.put_rows(rows, block)
                off += k * plane
    return [o.value() if isinstance(o, Deferred) else np.asarray(o)
            for o in outputs]


# ---------------------------------------------------------------------------
# Device-resident input cache (identity-keyed, LRU byte budget).  The
# entry PINS the caller's ndarray, so its id() cannot be recycled while
# the entry lives; a hit therefore really is the same object.
# ---------------------------------------------------------------------------

class _CacheEntry:
    __slots__ = ("host_ref", "stack", "row")

    def __init__(self, host_ref, stack, row):
        self.host_ref = host_ref          # pins identity
        self.stack = stack                # jax device array (n, ...)
        self.row = row


def _rounded_undef(undef, dtype):
    """float32 value the sentinel lands on after a round trip through
    ``dtype`` (bfloat16 keeps f32's exponent range, so 1e35 survives —
    just rounded in its last mantissa bits)."""
    return float(np.asarray(undef, np.float32).astype(dtype)
                 .astype(np.float32))


_cache_lock = threading.Lock()
_dev_cache = collections.OrderedDict()    # id(arr) -> _CacheEntry
_cache_counters = {"hits": 0, "misses": 0, "puts": 0, "evictions": 0}


def _cache_budget():
    return int(os.environ.get("MF_BATCH_CACHE_MB", "256")) * (1 << 20)


def clear_input_cache():
    """Drop every device-resident cached input (frees HBM + host pins)."""
    with _cache_lock:
        _dev_cache.clear()


def cache_stats(reset=False):
    """Telemetry for the device-resident input cache: cumulative
    ``hits``/``misses`` (lookups by ``batch(cache_inputs=True)``),
    ``puts``/``evictions``, plus the current ``entries``,
    ``resident_bytes`` (device bytes pinned — whole stacks, the same
    accounting the LRU budget uses) and ``budget_bytes``.  Production
    tuning of ``MF_BATCH_CACHE_MB`` reads this; ``reset=True`` zeroes
    the cumulative counters (the cache itself is untouched)."""
    with _cache_lock:
        out = dict(_cache_counters)
        out["entries"] = len(_dev_cache)
        out["resident_bytes"] = _resident_bytes()
        out["budget_bytes"] = _cache_budget()
        if reset:
            for k in _cache_counters:
                _cache_counters[k] = 0
    return out


def _cache_get(arr):
    with _cache_lock:
        e = _dev_cache.get(id(arr))
        if e is not None and e.host_ref is arr:
            _dev_cache.move_to_end(id(arr))
            _cache_counters["hits"] += 1
            return e
        _cache_counters["misses"] += 1
    return None


def _resident_bytes():
    """Device bytes the cache actually pins: each entry references a
    whole shipped STACK, so the budget must charge every live stack
    once — per-row accounting undercounts by the evicted-row fraction
    of partially-hot stacks (round-4 review finding)."""
    seen, total = set(), 0
    for e in _dev_cache.values():
        if id(e.stack) not in seen:
            seen.add(id(e.stack))
            total += e.stack.nbytes
    return total


def _cache_put(arr, stack, row):
    with _cache_lock:
        _dev_cache[id(arr)] = _CacheEntry(arr, stack, row)
        _dev_cache.move_to_end(id(arr))
        _cache_counters["puts"] += 1
        budget = _cache_budget()
        while _resident_bytes() > budget and len(_dev_cache) > 1:
            _dev_cache.popitem(last=False)
            _cache_counters["evictions"] += 1


@functools.lru_cache(maxsize=256)
def _validate(op, undef, scalars, kwitems, lead, shapes):
    """Trace-time validation without device work: returns the output
    avals, or None when the op rejects the parameters (the reference
    binding's None-return contract)."""
    import jax

    def run(*arrs):
        fields = tuple(from_sentinel(a, undef) for a in arrs)
        out = op(*lead, *fields, *scalars, **dict(kwitems))
        if isinstance(out, Field):
            return out.to_sentinel(undef)
        return tuple(o.to_sentinel(undef) for o in out)

    try:
        return jax.eval_shape(
            run, *[jax.ShapeDtypeStruct(s, np.float32) for s in shapes])
    except ValueError:
        return None


@functools.lru_cache(maxsize=64)
def _compiled_batch(sig, fetch_dtype=None):
    """ONE jitted program for a recorded call sequence.  ``sig`` holds
    per call (op, undef, scalars, kwitems, lead, arg-sources); each arg
    source is ("a", pos, row) — row of the stacked array passed at
    position ``pos`` (a shipped host stack OR a device-resident stack:
    a cached input's or an earlier program's output stack) — or
    ("c", call, output), an earlier call's traced result in THIS
    program.  ``fetch_dtype`` ("bfloat16") casts the OUTPUT stacks on
    device so half the bytes cross the link — see :class:`batch`."""
    import jax

    def run(*flat):
        import jax.numpy as jnp

        results = {}
        outs = []
        for ci, (op, undef, scalars, kwitems, lead, srcs) in enumerate(sig):
            arrs = []
            for s in srcs:
                if s[0] == "a":
                    arrs.append(flat[s[1]][s[2]])
                elif s[0] == "b":
                    # half-width device-resident input (a previous
                    # fetch_dtype program's output): widen and re-snap
                    # its rounded sentinel before the decode
                    x = flat[s[1]][s[2]].astype(jnp.float32)
                    if s[3] != s[4]:
                        x = jnp.where(x == jnp.float32(s[3]),
                                      jnp.float32(s[4]), x)
                    arrs.append(x)
                else:
                    arrs.append(results[s[1:]])
            fields = tuple(from_sentinel(a, undef) for a in arrs)
            out = op(*lead, *fields, *scalars, **dict(kwitems))
            if isinstance(out, Field):
                out = (out,)
            for oi, o in enumerate(out):
                enc = o.to_sentinel(undef)
                results[(ci, oi)] = enc
                outs.append(enc)
        # group same-shape outputs into stacks: the tunneled backend
        # pays a per-ARRAY fetch latency, so the host side fetches one
        # stacked array per shape group instead of one per output.
        # The grouping is a pure function of the static output shapes —
        # flush() derives the identical (sorted-shape, declaration-
        # order) layout from the Deferred shapes to unpack.
        groups = {}
        for k, o in enumerate(outs):
            groups.setdefault(tuple(o.shape), []).append(k)
        stacks = tuple(jnp.stack([outs[k] for k in groups[s]])
                       for s in sorted(groups))
        if fetch_dtype is not None:
            stacks = tuple(s.astype(fetch_dtype) for s in stacks)
        return stacks

    return jax.jit(run)


class _Call:
    __slots__ = ("op", "undef", "scalars", "kwitems", "lead", "args",
                 "refs", "owned")

    def __init__(self, op, undef, scalars, kwitems, lead, args, refs,
                 owned):
        self.op, self.undef = op, undef
        self.scalars, self.kwitems, self.lead = scalars, kwitems, lead
        self.args = args          # list of np.ndarray | Deferred
        self.refs = refs          # tuple of Deferred, declared order
        self.owned = owned        # per arg: array IS the caller's object


class _Batch:
    def __init__(self, cache_inputs=False, fetch_dtype=None):
        self.calls = []           # current (unflushed) segment
        self.cache_inputs = cache_inputs
        self.fetch_dtype = fetch_dtype

    # -- recording ----------------------------------------------------
    def record(self, op, undef, arrays, scalars, kwitems, lead,
               ndim=2, same_shape=True):
        """Called by api._wrap (and _wrap_members with a stacked 3-D
        input, ndim=3) inside an active batch.  Returns a Deferred
        (tuple of them for multi-output ops), or None for invalid
        input — same contract as the eager binding."""
        shapes, args, owned = [], [], []
        for a in arrays:
            if isinstance(a, Deferred):
                if a._failed is not None:
                    raise BatchError(
                        "input Deferred comes from a failed program"
                    ) from a._failed
                if a._dev is None and a._batch is not self:
                    raise BatchError(
                        "Deferred belongs to another live batch")
                shapes.append(a.shape)
                args.append(a)
                owned.append(False)
            else:
                npa = np.asarray(a, dtype=np.float32)
                shapes.append(npa.shape)
                args.append(npa)
                # Identity caching only makes sense for the caller's own
                # ndarray (asarray was a no-copy passthrough): a per-call
                # conversion temporary has a fresh id every call, can
                # never hit, and would only pin bytes + churn the LRU
                # (ADVICE r4).
                owned.append(npa is a)
        if len(shapes[0]) != ndim or (
                same_shape and any(s != shapes[0] for s in shapes[1:])):
            return None
        avals = _validate(op, float(undef), scalars, kwitems, lead,
                          tuple(shapes))
        if avals is None:
            return None
        single = not isinstance(avals, tuple)
        avs = (avals,) if single else tuple(avals)
        refs = tuple(Deferred(self, av, float(undef)) for av in avs)
        self.calls.append(_Call(op, float(undef), scalars, kwitems,
                                lead, args, refs, owned))
        return refs[0] if single else refs

    # -- execution ----------------------------------------------------
    def flush(self):
        """Run every recorded-but-unflushed call as ONE device program.
        Outputs become device-resident stacks (fetched lazily, one
        transfer per shape group, on first data access).  Recording may
        continue after.  On failure the segment's Deferreds are marked
        failed and the error re-raises here AND on any later access."""
        calls, self.calls = self.calls, []
        if not calls:
            return
        try:
            self._run(calls)
        except Exception as e:
            for c in calls:
                for r in c.refs:
                    if r._dev is None:
                        r._failed = e
            raise

    def _run(self, calls):
        import jax

        seg_key = {}                  # Deferreds produced IN this segment
        for ci, c in enumerate(calls):
            for oi, r in enumerate(c.refs):
                seg_key[id(r)] = ("c", ci, oi)

        flat_args = []                # values passed to the jitted program
        arg_pos = {}                  # id(stack-like) -> position

        def pos_of(stack):
            p = arg_pos.get(id(stack))
            if p is None:
                p = arg_pos[id(stack)] = len(flat_args)
                flat_args.append(stack)
            return p

        # Partition concrete inputs: device-cached (ride their resident
        # stack) vs to-ship.  Shipped inputs dedup by buffer pointer —
        # not object id — so distinct views of one buffer ship once;
        # then group by shape so each group is ONE stacked transfer
        # (per-array H2D latency dominates storms on this backend).
        slot_of, uniq, uniq_owned, cached = {}, [], [], {}
        for c in calls:
            for a, own in zip(c.args, c.owned):
                if isinstance(a, Deferred):
                    continue
                pk = (a.__array_interface__["data"][0], a.shape,
                      a.strides, a.dtype.str)
                if pk in cached:
                    continue
                if pk in slot_of:
                    if own:          # same buffer also passed as-owned
                        uniq_owned[slot_of[pk]] = True
                    continue
                # only owned arrays can ever hit by identity — don't
                # even look up (or count) conversion temporaries
                e = _cache_get(a) if (self.cache_inputs and own) else None
                if e is not None:
                    cached[pk] = e
                else:
                    slot_of[pk] = len(uniq)
                    uniq.append(a)
                    uniq_owned.append(own)
        gidx = {}
        for k, a in enumerate(uniq):
            gidx.setdefault(a.shape, []).append(k)
        src_of = {}
        ship = []
        for s in sorted(gidx):
            stack = np.stack([uniq[k] for k in gidx[s]])
            if self.cache_inputs:
                stack = jax.device_put(stack)
                ship.append((s, stack))
            p = pos_of(stack)
            for row, k in enumerate(gidx[s]):
                src_of[k] = ("a", p, row)

        sig = []
        for c in calls:
            srcs = []
            for a in c.args:
                if isinstance(a, Deferred):
                    k = seg_key.get(id(a))
                    if k is not None:
                        srcs.append(k)
                    else:           # flushed earlier: device-resident
                        handle, row = a._dev
                        p = pos_of(handle.dev)
                        if str(handle.dev.dtype) == "float32":
                            srcs.append(("a", p, row))
                        else:       # half-width fetched stack: widen +
                            # re-snap its rounded sentinel in-program
                            snap = _rounded_undef(a._undef,
                                                  handle.dev.dtype)
                            srcs.append(("b", p, row, snap, a._undef))
                else:
                    pk = (a.__array_interface__["data"][0], a.shape,
                          a.strides, a.dtype.str)
                    e = cached.get(pk)
                    if e is not None:
                        srcs.append(("a", pos_of(e.stack), e.row))
                    else:
                        srcs.append(src_of[slot_of[pk]])
            sig.append((c.op, c.undef, c.scalars, c.kwitems, c.lead,
                        tuple(srcs)))

        stacks = _compiled_batch(tuple(sig),
                                 self.fetch_dtype)(*flat_args)

        # enter freshly shipped CALLER-OWNED inputs into the device
        # cache (rows ride the shipped stack — no per-row device work);
        # conversion temporaries are shipped but never cached
        if self.cache_inputs:
            for s, stack in ship:
                for row, k in enumerate(gidx[s]):
                    if uniq_owned[k]:
                        _cache_put(uniq[k], stack, row)

        # rebuild the same shape-grouped layout the program used
        refs = [r for c in calls for r in c.refs]
        groups = {}
        for k, r in enumerate(refs):
            groups.setdefault(tuple(r.shape), []).append(k)
        for s, stack in zip(sorted(groups), stacks):
            handle = _StackHandle(stack)
            for row, k in enumerate(groups[s]):
                refs[k]._dev = (handle, row)


class batch:
    """Context manager activating call batching for the drop-in API.

    ``cache_inputs=True`` additionally keeps concrete inputs resident
    on device across flushes and contexts (identity-keyed; see module
    docstring) so repeated forecast cycles ship only changed arrays.

    ``fetch_dtype="bfloat16"`` casts the OUTPUT stacks on device, so
    half the bytes cross the host link — the measured floor of a
    fetch-everything forecast cycle on a latency-bound link (PERF.md
    "Forecast cycles").  ``np.asarray`` still returns float32: values
    are widened on the host (~3 decimal digits of precision — a
    display/serving tier, not the conformance tier) and the sentinel
    is re-snapped exactly, so undef propagation is unaffected.
    Chaining a bfloat16-fetched Deferred into a later call widens and
    re-snaps in-program the same way.
    """

    def __init__(self, cache_inputs=False, fetch_dtype=None):
        if fetch_dtype not in (None, "bfloat16"):
            raise ValueError("batch: fetch_dtype must be None or "
                             "'bfloat16'")
        self._cache_inputs = cache_inputs
        self._fetch_dtype = fetch_dtype

    def __enter__(self):
        if active_batch() is not None:
            raise BatchError("batch() contexts do not nest")
        self._b = _Batch(cache_inputs=self._cache_inputs,
                         fetch_dtype=self._fetch_dtype)
        _state.batch = self._b
        return self._b

    def __exit__(self, et, ev, tb):
        _state.batch = None
        if et is None:
            self._b.flush()
        return False
