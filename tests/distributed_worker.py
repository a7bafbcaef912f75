"""Multi-process worker for tests/test_distributed.py (NOT a pytest
module — launched as ``python distributed_worker.py <port> <pid> <nproc>``).

Each process owns 4 virtual CPU devices; ``distributed.initialize`` wires
them into one 8-device global set, and the full jnp sharded pipeline
(``run_sharded(derived_fields, ...)`` — halo ppermutes cross the process
boundary over gloo) runs on arrays assembled per-host with
``local_shard_array``.  Every process then checks its addressable output
shards bitwise against a locally computed unsharded reference — the
single-host dress rehearsal for the reference's multi-host story
(SURVEY §2.7; the reference itself is single-process OpenMP)."""

import os
import sys


def main():
    port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    from mi_fieldcalc_tpu.parallel import distributed

    distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)
    assert distributed.is_initialized()
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc
    assert len(jax.local_devices()) == 4

    import numpy as np

    from mi_fieldcalc_tpu.field import UNDEF, Field, from_sentinel
    from mi_fieldcalc_tpu.models import derived_fields
    from mi_fieldcalc_tpu.models.pipeline import RADIUS
    from mi_fieldcalc_tpu.parallel import grid_mesh, run_sharded
    from mi_fieldcalc_tpu.parallel.distributed import local_shard_array
    from mi_fieldcalc_tpu.parallel.mesh import partition_spec

    nlev, ny, nx = 2, 32, 64
    rng = np.random.default_rng(7)       # identical on every process

    def sent(lo, hi):
        a = rng.uniform(lo, hi, (nlev, ny, nx)).astype(np.float32)
        a[rng.random(a.shape) < 0.02] = UNDEF
        return a

    tk_np, q_np = sent(250, 300), sent(1e-4, 1e-2)
    u_np, v_np = sent(-30, 30), sent(-30, 30)
    ps_np = rng.uniform(950, 1030, (ny, nx)).astype(np.float32)
    al = np.linspace(30.0, 0.0, nlev).astype(np.float32)
    bl = np.linspace(0.02, 1.0, nlev).astype(np.float32)
    xm = np.full((ny, nx), 1.2e-5, np.float32)
    ym = np.full((ny, nx), 1.0e-5, np.float32)
    fc = np.full((ny, nx), 1.2e-4, np.float32)

    mesh = grid_mesh((1, 2, 4))          # gy x gx = 2 x 4, lev = 1

    def dist(a):
        """Global sharded array from this process's local block: slice
        the (deterministically regenerated) global array by the union
        bounding box of this process's addressable shard indices, then
        hand ONLY that block to local_shard_array."""
        a = np.asarray(a)
        sh = jax.sharding.NamedSharding(mesh, partition_spec(a.ndim, mesh))
        imap = sh.devices_indices_map(a.shape)
        mine = [idx for d, idx in imap.items()
                if d.process_index == jax.process_index()]
        assert mine, "process owns no shard"
        box = tuple(
            slice(min(s[i].start or 0 for s in mine),
                  max(a.shape[i] if s[i].stop is None else s[i].stop
                      for s in mine))
            for i in range(a.ndim))
        return local_shard_array(a.shape, a[box], mesh)

    def dist_field(sentinel_np):
        f = from_sentinel(sentinel_np)
        return Field(dist(np.asarray(f.values)), dist(np.asarray(f.mask)))

    args = (dist_field(tk_np), dist_field(q_np), dist_field(u_np),
            dist_field(v_np), dist_field(ps_np),
            dist(al), dist(bl), dist(xm), dist(ym), dist(fc))
    out = run_sharded(derived_fields, mesh, RADIUS, *args)

    # local unsharded reference on the full (small) global grid
    ref = derived_fields(from_sentinel(tk_np), from_sentinel(q_np),
                         from_sentinel(u_np), from_sentinel(v_np),
                         from_sentinel(ps_np), al, bl, xm, ym, fc)

    checked = 0
    for name in ref._fields:
        rf, gf = getattr(ref, name), getattr(out, name)
        rv, rm = np.asarray(rf.values), np.asarray(rf.mask)
        for shard in gf.values.addressable_shards:
            gv = np.asarray(shard.data)
            m = rm[shard.index]
            assert np.array_equal(rv[shard.index][m], gv[m]), name
            checked += 1
        for shard in gf.mask.addressable_shards:
            assert np.array_equal(rm[shard.index],
                                  np.asarray(shard.data)), name
    assert checked == 12 * 4             # 12 fields x 4 local shards
    print(f"distributed worker {pid}/{nproc}: OK ({checked} shards)")


if __name__ == "__main__":
    main()
