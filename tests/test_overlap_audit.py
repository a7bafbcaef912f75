"""The overlap-mode sharded pipeline must keep its interior kernel free
of any data dependence on the seam ppermutes — that independence is what
lets the XLA latency-hiding scheduler run the ICI halo exchange
concurrently with interior compute (tools/overlap_audit.py verifies the
actual v5e schedule; this test pins the structural invariant on CPU)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def test_interior_kernel_independent_of_collectives():
    from overlap_audit import check_jaxpr_independence

    res = check_jaxpr_independence()
    assert res["interior_kernels"] >= 1
    assert res["interior_reads_collective"] is False
    assert res["strip_kernels"] >= 1
    assert res["ok"] is True


def test_interior_kernel_independent_on_2d_mesh():
    """Same invariant on a (gy, gx) = (2, 2) mesh: the y-seam, x-seam
    and corner exchange all stay off the interior kernel's input cone."""
    from overlap_audit import check_jaxpr_independence

    res = check_jaxpr_independence(ny=64, nx=768, gy=2, gx=2)
    assert res["interior_kernels"] >= 1
    assert res["interior_reads_collective"] is False
    assert res["strip_kernels"] >= 2     # y-strips + x-strips
    assert res["ok"] is True
