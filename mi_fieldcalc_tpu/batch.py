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
dispatch per cycle.  Materialization happens at context exit, or
earlier if any Deferred's data is touched (numpy protocol) — an early
touch flushes the calls recorded so far and recording continues in a
fresh segment.

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
"""

from __future__ import annotations

import functools
import threading

import numpy as np

from .field import Field, from_sentinel

__all__ = ["batch", "Deferred", "BatchError"]

_state = threading.local()


class BatchError(RuntimeError):
    pass


def active_batch():
    return getattr(_state, "batch", None)


class Deferred:
    """Lazy handle for one output of a batched call.  Materializes the
    pending batch segment on first data access (``np.asarray`` or any
    numpy ufunc via ``__array__``)."""

    __slots__ = ("_batch", "shape", "dtype", "_value")

    def __init__(self, batch, aval):
        self._batch = batch
        self.shape = tuple(aval.shape)
        self.dtype = aval.dtype
        self._value = None

    @property
    def ndim(self):
        return len(self.shape)

    def __array__(self, dtype=None, copy=None):
        return np.asarray(self.value(), dtype=dtype)

    def value(self):
        if self._value is None:
            self._batch.flush()
        return self._value


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
def _compiled_batch(sig):
    """ONE jitted program for a recorded call sequence.  ``sig`` holds
    per call (op, undef, scalars, kwitems, lead, arg-sources); each arg
    source is an input slot index (int) or an (call, output) tuple
    referencing an earlier call's traced result."""
    import jax

    def run(*flat):
        import jax.numpy as jnp

        results = {}
        outs = []
        for ci, (op, undef, scalars, kwitems, lead, srcs) in enumerate(sig):
            # src forms: ("i", group, row) = row of a stacked input
            # group (same-shape inputs ship as ONE transfer each —
            # per-array H2D latency dominates storms on this backend);
            # (call, output) = an earlier call's traced result
            arrs = [flat[s[1]][s[2]] if s[0] == "i" else results[s]
                    for s in srcs]
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
        return tuple(jnp.stack([outs[k] for k in groups[s]])
                     for s in sorted(groups))

    return jax.jit(run)


class _Call:
    __slots__ = ("op", "undef", "scalars", "kwitems", "lead", "args",
                 "refs")

    def __init__(self, op, undef, scalars, kwitems, lead, args, refs):
        self.op, self.undef = op, undef
        self.scalars, self.kwitems, self.lead = scalars, kwitems, lead
        self.args = args          # list of np.ndarray | Deferred
        self.refs = refs          # tuple of Deferred, declared order


class _Batch:
    def __init__(self):
        self.calls = []           # current (unflushed) segment

    # -- recording ----------------------------------------------------
    def record(self, op, undef, arrays, scalars, kwitems, lead,
               ndim=2, same_shape=True):
        """Called by api._wrap (and _wrap_members with a stacked 3-D
        input, ndim=3) inside an active batch.  Returns a Deferred
        (tuple of them for multi-output ops), or None for invalid
        input — same contract as the eager binding."""
        shapes, args = [], []
        for a in arrays:
            if isinstance(a, Deferred):
                if a._value is not None:
                    a = a._value            # flushed: concrete numpy
                elif a._batch is not self:
                    raise BatchError(
                        "Deferred belongs to another live batch")
            if isinstance(a, Deferred):
                shapes.append(a.shape)
                args.append(a)
            else:
                npa = np.asarray(a, dtype=np.float32)
                shapes.append(npa.shape)
                args.append(npa)
        if len(shapes[0]) != ndim or (
                same_shape and any(s != shapes[0] for s in shapes[1:])):
            return None
        avals = _validate(op, float(undef), scalars, kwitems, lead,
                          tuple(shapes))
        if avals is None:
            return None
        single = not isinstance(avals, tuple)
        avs = (avals,) if single else tuple(avals)
        refs = tuple(Deferred(self, av) for av in avs)
        self.calls.append(_Call(op, float(undef), scalars, kwitems,
                                lead, args, refs))
        return refs[0] if single else refs

    # -- execution ----------------------------------------------------
    def flush(self):
        """Run every recorded-but-unflushed call as ONE device program
        and materialize their Deferreds.  Recording may continue after."""
        calls, self.calls = self.calls, []
        if not calls:
            return
        import jax

        ref_key = {}
        for ci, c in enumerate(calls):
            for oi, r in enumerate(c.refs):
                ref_key[id(r)] = (ci, oi)
        # dedup concrete inputs by identity, then group by shape so
        # each group ships as ONE stacked transfer (per-array H2D
        # latency dominates storms on this tunneled backend)
        slot_of, uniq = {}, []
        for c in calls:
            for a in c.args:
                if not isinstance(a, Deferred) and id(a) not in slot_of:
                    slot_of[id(a)] = len(uniq)
                    uniq.append(a)
        gidx, order = {}, []
        for k, a in enumerate(uniq):
            gidx.setdefault(a.shape, []).append(k)
        order = sorted(gidx)
        src_of = {}
        for gi, s in enumerate(order):
            for row, k in enumerate(gidx[s]):
                src_of[k] = ("i", gi, row)
        inputs = [np.stack([uniq[k] for k in gidx[s]]) for s in order]
        sig = []
        for c in calls:
            srcs = []
            for a in c.args:
                if isinstance(a, Deferred):
                    srcs.append(ref_key[id(a)])
                else:
                    srcs.append(src_of[slot_of[id(a)]])
            sig.append((c.op, c.undef, c.scalars, c.kwitems, c.lead,
                        tuple(srcs)))
        stacks = jax.device_get(_compiled_batch(tuple(sig))(*inputs))
        # rebuild the same shape-grouped layout the program used
        refs = [r for c in calls for r in c.refs]
        groups = {}
        for k, r in enumerate(refs):
            groups.setdefault(tuple(r.shape), []).append(k)
        for s, stack in zip(sorted(groups), stacks):
            arr = np.asarray(stack)
            for row, k in enumerate(groups[s]):
                refs[k]._value = arr[row]


class batch:
    """Context manager activating call batching for the drop-in API."""

    def __enter__(self):
        if active_batch() is not None:
            raise BatchError("batch() contexts do not nest")
        self._b = _Batch()
        _state.batch = self._b
        return self._b

    def __exit__(self, et, ev, tb):
        _state.batch = None
        if et is None:
            self._b.flush()
        return False
