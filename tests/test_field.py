"""Field pytree, sentinel codecs, and tri-state semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mi_fieldcalc_tpu import (
    UNDEF, Field, ValuesDefined, combine_defined, defined_state,
    from_sentinel, from_values, full_undef,
)

ALL = ValuesDefined.ALL_DEFINED
NONE = ValuesDefined.NONE_DEFINED
SOME = ValuesDefined.SOME_DEFINED


def test_from_sentinel_roundtrip():
    a = np.array([[1.0, UNDEF], [np.nan, 4.0]], np.float32)
    f = from_sentinel(a)
    assert f.mask.tolist() == [[True, False], [False, True]]
    out = f.to_numpy()
    assert out[0, 0] == 1.0 and out[1, 1] == 4.0
    assert out[0, 1] == np.float32(UNDEF) and out[1, 0] == np.float32(UNDEF)


def test_custom_undef_value():
    a = np.array([5.0, 7.0, 5.0], np.float32)
    f = from_sentinel(a, undef=5.0)
    assert f.mask.tolist() == [False, True, False]


def test_defined_state_tristate():
    assert from_values(np.ones((2, 2))).defined_state() == ALL
    assert full_undef((2, 2)).defined_state() == NONE
    m = np.array([[True, False], [True, True]])
    assert from_values(np.ones((2, 2)), m).defined_state() == SOME


def test_combine_defined_matches_reference_table():
    # FieldDefined.cc:72-83
    assert combine_defined(ALL, SOME) == SOME
    assert combine_defined(ALL, ALL) == ALL
    assert combine_defined(NONE, ALL) == NONE
    assert combine_defined(SOME, ALL) == SOME
    assert combine_defined(SOME, NONE) == NONE
    assert combine_defined(SOME, SOME) == SOME


def test_field_is_pytree():
    f = from_values(np.ones((2, 3), np.float32))
    leaves = jax.tree_util.tree_leaves(f)
    assert len(leaves) == 2

    @jax.jit
    def double(field: Field) -> Field:
        return Field(field.values * 2, field.mask)

    out = double(f)
    assert float(out.values[0, 0]) == 2.0


def test_defined_counts_jit_safe():
    import jax
    import jax.numpy as jnp
    from mi_fieldcalc_tpu import defined_counts

    mask = jnp.asarray([[True, False], [True, True]])

    @jax.jit
    def f(m):
        n_def, n_tot = defined_counts(m)
        return n_def, n_tot

    n_def, n_tot = f(mask)
    assert int(n_def) == 3 and int(n_tot) == 4

    # sharded: per-shard counts combine with psum
    import numpy as np
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map
    from mi_fieldcalc_tpu.parallel import grid_mesh
    if len(jax.devices()) >= 4:
        mesh = grid_mesh((1, 2, 2), devices=jax.devices()[:4])
        big = jnp.asarray(np.arange(64).reshape(8, 8) % 5 != 0)

        def body(m):
            n_def, _ = defined_counts(m)
            return jax.lax.psum(jax.lax.psum(n_def, "gy"), "gx")

        total = shard_map(body, mesh=mesh, in_specs=P("gy", "gx"),
                          out_specs=P(), check_vma=False)(big)
        assert int(total) == int(np.sum(np.arange(64) % 5 != 0))
