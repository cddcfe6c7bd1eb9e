"""Tests for the MMCS Merkle commitment and the duplex challenger."""

import numpy as np

from zkmips_tpu.ops import field as f, merkle
from zkmips_tpu.stark.challenger import DuplexChallenger


def _rand_matrix(rng, h, w):
    return rng.integers(0, f.P, size=(h, w), dtype=np.uint64).astype(np.uint32)


def test_merkle_single_matrix_roundtrip():
    rng = np.random.default_rng(0)
    m = _rand_matrix(rng, 16, 5)
    tree = merkle.MerkleTree([m])
    for index in [0, 7, 15]:
        rows, sibs = tree.open(index)
        assert np.array_equal(rows[0], m[index])
        assert merkle.verify_opening(tree.root, index, [(16, 5)], rows, sibs)
    # tampered row fails
    rows, sibs = tree.open(3)
    bad = [rows[0].copy()]
    bad[0][0] ^= 1
    assert not merkle.verify_opening(tree.root, 3, [(16, 5)], bad, sibs)


def test_merkle_mixed_heights():
    rng = np.random.default_rng(1)
    mats = [_rand_matrix(rng, 32, 3), _rand_matrix(rng, 8, 4), _rand_matrix(rng, 32, 2), _rand_matrix(rng, 1, 6)]
    dims = [(m.shape[0], m.shape[1]) for m in mats]
    tree = merkle.MerkleTree(mats)
    for index in [0, 13, 31]:
        rows, sibs = tree.open(index)
        assert np.array_equal(rows[1], mats[1][index >> 2])
        assert merkle.verify_opening(tree.root, index, dims, rows, sibs)
    # wrong index fails
    rows, sibs = tree.open(5)
    assert not merkle.verify_opening(tree.root, 6, dims, rows, sibs)


def test_merkle_root_deterministic():
    rng = np.random.default_rng(2)
    m = _rand_matrix(rng, 4, 9)
    assert np.array_equal(merkle.MerkleTree([m]).root, merkle.MerkleTree([m.copy()]).root)


def test_challenger_determinism_and_sensitivity():
    a, b = DuplexChallenger(), DuplexChallenger()
    for v in [1, 2, 3]:
        a.observe(v)
        b.observe(v)
    assert a.sample() == b.sample()
    c = DuplexChallenger()
    for v in [1, 2, 4]:
        c.observe(v)
    assert a.clone().sample() != c.sample() or a.clone().sample() != c.sample()


def test_challenger_sample_order_changes_after_observe():
    a = DuplexChallenger()
    a.observe(7)
    s1 = a.sample()
    a.observe(9)  # clears output buffer
    s2 = a.sample()
    assert s1 != s2


def test_challenger_many_observes():
    a = DuplexChallenger()
    a.observe_slice(np.arange(100, dtype=np.uint64))
    vals = [a.sample() for _ in range(20)]
    assert len(set(vals)) > 15  # effectively random
    assert all(0 <= v < f.P for v in vals)


def test_grind_and_check():
    a = DuplexChallenger()
    a.observe_slice([5, 6, 7])
    w = a.clone().grind(8)
    assert a.clone().check_witness(8, w)
    assert not a.clone().check_witness(20, 1 + w)  # overwhelmingly likely


def test_sample_ext_is_montgomery_quadruple():
    a = DuplexChallenger()
    a.observe(42)
    e = a.sample_ext()
    assert e.shape == (4,) and e.dtype == np.uint32
    assert all(int(x) < f.P for x in f.from_monty(e))
