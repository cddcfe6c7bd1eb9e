"""Roundtrip + soundness tests for the two-adic FRI PCS."""

import numpy as np
import pytest

from zkmips_tpu.ops import ext4, field as f
from zkmips_tpu.stark import pcs
from zkmips_tpu.stark.challenger import DuplexChallenger
from zkmips_tpu.stark.domain import Domain

CFG = pcs.FriConfig.test()


def _rand_evals(rng, n, w):
    return rng.integers(0, f.P, size=(n, w), dtype=np.uint64).astype(np.uint32)


def _naive_eval(coeffs, dom, z):
    """Reference evaluation via python-int Horner on one column."""
    zs = ext4.mul_base(z, np.uint32(f.to_monty_int(f.inv_int(dom.shift))))
    acc = ext4.ZERO.astype(np.uint32)
    for c in coeffs[::-1]:
        acc = ext4.add(ext4.mul(acc, zs), ext4.from_base(np.uint32(c)))
    return acc


def test_eval_at_ext_point_matches_naive():
    rng = np.random.default_rng(0)
    dom = Domain(3, 1)
    evals = f.to_monty(_rand_evals(rng, 8, 2) % np.uint32(f.P))
    pdata = pcs.commit(CFG, [(dom, evals)])
    z = DuplexChallenger().sample_ext()
    got = pcs.eval_at_ext_point(pdata.coeffs[0], dom, z)
    for j in range(2):
        want = _naive_eval(pdata.coeffs[0][:, j], dom, z)
        assert np.array_equal(got[j], want)


def _roundtrip(rounds_spec, seed=0, tamper=None):
    """rounds_spec: list of [(log_n, shift, width), ...] per round."""
    rng = np.random.default_rng(seed)
    prover_ch = DuplexChallenger()
    verifier_ch = DuplexChallenger()

    rounds, rounds_domains = [], []
    for mats_spec in rounds_spec:
        doms_mats = []
        for log_n, shift, w in mats_spec:
            dom = Domain(log_n, shift)
            doms_mats.append((dom, f.to_monty(_rand_evals(rng, dom.size, w) % np.uint32(f.P))))
        pdata = pcs.commit(CFG, doms_mats)
        prover_ch.observe_digest(pdata.root)
        verifier_ch.observe_digest(pdata.root)
        rounds.append(pdata)
        rounds_domains.append([d for d, _ in doms_mats])

    zeta = prover_ch.sample_ext()
    assert np.array_equal(zeta, verifier_ch.sample_ext())

    points = [[[zeta, d.next_point_ext(zeta)] for d in doms] for doms in rounds_domains]
    opened, proof = pcs.open_batches(CFG, list(zip(rounds, points)), prover_ch)

    rounds_info = []
    for pdata, doms, pts_per_mat, vals_per_mat in zip(rounds, rounds_domains, points, opened):
        mats = []
        for dom, pts, vals in zip(doms, pts_per_mat, vals_per_mat):
            mats.append((dom, list(zip(pts, vals))))
        rounds_info.append((pdata.root, mats))

    if tamper:
        tamper(rounds_info, proof)
    pcs.verify_batches(CFG, rounds_info, proof, verifier_ch)
    return opened, proof


def test_single_matrix_roundtrip():
    _roundtrip([[(4, 1, 3)]])


def test_multi_matrix_mixed_heights_roundtrip():
    _roundtrip([[(5, 1, 4), (3, 1, 2), (5, 1, 1)]])


def test_multi_round_with_coset_shifts():
    # simulates trace batch + quotient-chunk batch on split cosets
    big = Domain(5, f.GENERATOR)
    chunks = big.split_domains(4)
    spec_q = [(c.log_n, c.shift, 4) for c in chunks]
    _roundtrip([[(4, 1, 3)], spec_q])


def test_tampered_value_rejected():
    def tamper(rounds_info, proof):
        _root, mats = rounds_info[0]
        _dom, pts = mats[0]
        pts[0][1][0][0] ^= 1

    with pytest.raises(pcs.PcsError):
        _roundtrip([[(4, 1, 3)]], tamper=tamper)


def test_tampered_final_poly_rejected():
    def tamper(rounds_info, proof):
        proof.final_poly = proof.final_poly.copy()
        proof.final_poly[0] ^= 1

    with pytest.raises(pcs.PcsError):
        _roundtrip([[(4, 1, 3)]], tamper=tamper)


def test_bad_pow_rejected():
    def tamper(rounds_info, proof):
        proof.pow_witness += 1

    with pytest.raises(pcs.PcsError):
        _roundtrip([[(4, 1, 2)]], tamper=tamper)


def test_tampered_commit_root_rejected():
    def tamper(rounds_info, proof):
        root, mats = rounds_info[0]
        root = root.copy()
        root[0] ^= 1
        rounds_info[0] = (root, mats)

    with pytest.raises(pcs.PcsError):
        _roundtrip([[(4, 1, 2)]], tamper=tamper)
