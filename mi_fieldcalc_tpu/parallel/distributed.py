"""Multi-host runtime: initialization and mesh construction across hosts.

The reference is a single-process library (OpenMP threads only — SURVEY
§2.7); its TPU-native equivalent spans hosts with the JAX distributed
runtime: every host runs the same program, ``jax.distributed.initialize``
wires the processes into one global device set, and the ``(lev, gy, gx)``
mesh from :func:`..parallel.mesh.grid_mesh` then covers all chips in the
slice — ``shard_map`` collectives ride ICI within the slice and DCN
across slices with no further code changes (the halo ``ppermute`` rings
and definedness ``psum`` reductions are laid out by XLA).

Typical multi-host entry::

    from mi_fieldcalc_tpu.parallel import distributed, grid_mesh
    distributed.initialize()              # no-op on a single host
    mesh = grid_mesh(grid_shape=(ny, nx))  # all chips; padding-optimal split
    out = derived_fields_fused_sharded(mesh, *fields)

Per-host I/O: each host feeds only its local shard via
``jax.make_array_from_process_local_data`` (helpers below), so a global
0.25-degree x 137-level grid never has to fit in one host's memory.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

__all__ = ["initialize", "is_initialized", "local_shard_array"]

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join the multi-host JAX runtime; safe no-op on a single host.

    With no arguments, relies on the TPU environment's auto-detection
    (the standard path on Cloud TPU slices); arguments are passed through
    to ``jax.distributed.initialize`` for manual clusters.
    """
    global _initialized
    import jax

    if _initialized:
        return
    # Do NOT consult jax.process_count() here: it initializes the XLA
    # backend, after which jax.distributed.initialize() unconditionally
    # raises — and on a multi-host slice the pre-init count reads 1, so
    # the old guard marked the runtime initialized without ever joining
    # and every host silently built a local-only mesh.  Call through and
    # let the runtime auto-detect: on single-process environments (no
    # cluster env, no coordinator) detection fails and we record the
    # single-host no-op; a backend-already-initialized error in THAT
    # case is also benign single-host use (e.g. tests that touched jax
    # first).
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except Exception:
        if (coordinator_address is not None or num_processes is not None
                or process_id is not None):
            raise        # explicit cluster arguments: failure is real
        import os
        if os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") > 0:
            # the environment says this IS a multi-host slice: swallowing
            # the failure would leave every host on a local-only mesh
            raise
        # no-arg single-host path (CPU tests, one-host TPU): nothing to
        # join — auto-detection raising is the expected outcome
    _initialized = True


def is_initialized() -> bool:
    return _initialized


def local_shard_array(global_shape: Sequence[int], local_data: np.ndarray,
                      mesh, pspec=None):
    """Assemble a global sharded array from this host's local block.

    ``local_data`` must be exactly this process's shard(s) of the global
    array under ``pspec`` (default: the framework layout from
    :func:`..parallel.mesh.partition_spec`).  Wraps
    ``jax.make_array_from_process_local_data``.
    """
    import jax
    from .mesh import partition_spec

    if pspec is None:
        pspec = partition_spec(len(global_shape), mesh)
    sharding = jax.sharding.NamedSharding(mesh, pspec)
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(local_data), tuple(global_shape))
