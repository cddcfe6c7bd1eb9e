"""Differential tests for the Pallas TPU kernels (ops/pallas_p2.py).

These only run when the default JAX backend is a real TPU (Mosaic kernels
have no CPU lowering here); the CPU suite covers the jnp fallbacks.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from zkmips_tpu.ops import field as f, poseidon2 as p2

try:
    from zkmips_tpu.ops import pallas_p2 as pp

    _tpu = pp.available()
except Exception:
    _tpu = False

pytestmark = pytest.mark.skipif(not _tpu, reason="needs a TPU backend")


@pytest.mark.parametrize("w", [1, 8, 13, 64, 88])
def test_hash_rows_matches_numpy(w):
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    m = rng.integers(0, f.P, (1024, w), dtype=np.uint32)
    want = p2.hash_matrix_rows(m)
    got = np.asarray(pp.hash_matrix_rows(jnp.asarray(m)))
    assert np.array_equal(want, got)


def test_compress_matches_numpy():
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    l = rng.integers(0, f.P, (2048, 8), dtype=np.uint32)
    r = rng.integers(0, f.P, (2048, 8), dtype=np.uint32)
    want = p2.compress(l, r)
    got = np.asarray(pp.compress(jnp.asarray(l), jnp.asarray(r)))
    assert np.array_equal(want, got)


@pytest.mark.parametrize("n", [64, 4096])
def test_tree_levels_match_sequential(n):
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    digs = rng.integers(0, f.P, (n, 8), dtype=np.uint32)
    levels = [np.asarray(x) for x in pp.tree_levels(jnp.asarray(digs))]
    cur = digs
    for lv in levels:
        cur = p2.compress(cur[0::2], cur[1::2])
        assert np.array_equal(cur, lv)
    assert cur.shape[0] == 1


def test_dispatch_path_used_in_poseidon2():
    """ops.poseidon2.hash_matrix_rows must route big device mats to Pallas
    and still bit-match the host sponge."""
    import jax.numpy as jnp

    rng = np.random.default_rng(4)
    m = rng.integers(0, f.P, (512, 24), dtype=np.uint32)
    want = p2.hash_matrix_rows(m)
    got = np.asarray(p2.hash_matrix_rows(jnp.asarray(m)))
    assert np.array_equal(want, got)
