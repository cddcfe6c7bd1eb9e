"""PLONK (KZG / BN254) backend: R1CS->gate conversion, prove/verify
roundtrip, transcript binding, and the byte-level verifier API.

Reference analog: gnark plonk.{Setup,Prove,Verify} used by wrap_plonk_bn254
(crates/prover/src/lib.rs:1062, crates/recursion/gnark-ffi/go/main.go).
"""

import dataclasses

import pytest

from zkmips_tpu.snark import plonk
from zkmips_tpu.snark.r1cs import ConstraintSystem, R


def _circuit(x_pub=3, y=5):
    """(x * y + 7 == out) with a few gadget shapes: bits, inverse, select.

    The gate structure is witness-independent (the expected result is a
    second public input), so one setup serves every instance."""
    cs = ConstraintSystem()
    x = cs.public(x_pub)
    out = cs.public(x_pub * y + 7)
    yv = cs.witness(y)
    z = cs.mul(x, yv)
    w = cs.add(z, 7)
    cs.assert_eq(w, out)
    cs.to_bits(w, 8)
    cs.inverse(yv)
    cs.select(cs.is_zero(cs.sub(x, x)), w, z)
    return cs


def test_gate_conversion_satisfied():
    g = plonk.gates_from_r1cs(_circuit())
    assert g.is_satisfied()
    assert g.num_public == 2
    # tampering any witness value breaks satisfaction
    g.values[2] = (g.values[2] + 1) % R
    assert not g.is_satisfied()


def test_prove_verify_roundtrip():
    g = plonk.gates_from_r1cs(_circuit())
    pk, vk = plonk.setup(g)
    proof = plonk.prove(pk, g)
    assert plonk.verify(vk, proof, [3, 22])
    # wrong public input
    assert not plonk.verify(vk, proof, [4, 22])
    assert not plonk.verify(vk, proof, [])


def test_proof_tampering_rejected():
    g = plonk.gates_from_r1cs(_circuit())
    pk, vk = plonk.setup(g)
    proof = plonk.prove(pk, g)
    for field_name in ("a_bar", "b_bar", "c_bar", "s1_bar", "s2_bar", "zw_bar"):
        bad = dataclasses.replace(proof, **{field_name: (getattr(proof, field_name) + 1) % R})
        assert not plonk.verify(vk, bad, [3, 22]), f"tampered {field_name} accepted"
    # swapped commitments
    bad = dataclasses.replace(proof, a_c=proof.b_c, b_c=proof.a_c)
    assert not plonk.verify(vk, bad, [3, 22])


def test_proofs_for_different_witnesses():
    """Same circuit shape, same setup, different witness values."""
    g1 = plonk.gates_from_r1cs(_circuit(3, 5))
    pk, vk = plonk.setup(g1)
    p1 = plonk.prove(pk, g1)
    assert plonk.verify(vk, p1, [3, 22])
    g2 = plonk.gates_from_r1cs(_circuit(4, 6))
    # same gate structure -> same preprocessed polynomials
    assert (g2.ql, g2.qr, g2.qo, g2.qm, g2.qc) == (g1.ql, g1.qr, g1.qo, g1.qm, g1.qc)
    assert (g2.wa, g2.wb, g2.wc) == (g1.wa, g1.wb, g1.wc)
    p2 = plonk.prove(pk, g2)
    assert plonk.verify(vk, p2, [4, 31])
    assert not plonk.verify(vk, p2, [3, 22])


def test_byte_api_roundtrip():
    from zkmips_tpu import verifier as vf

    g = plonk.gates_from_r1cs(_circuit())
    pk, vk = plonk.setup(g)
    proof = plonk.prove(pk, g)
    pb = vf.encode_plonk_proof(proof)
    kb = vf.encode_plonk_vk(vk)
    ib = vf.encode_public_inputs([3, 22])
    assert vf.PlonkVerifier.verify(pb, kb, ib)
    assert not vf.PlonkVerifier.verify(pb, kb, vf.encode_public_inputs([5, 22]))
    with pytest.raises(vf.VerificationFailure):
        vf.PlonkVerifier.verify(pb[:-1], kb, ib)
    with pytest.raises(vf.VerificationFailure):
        vf.PlonkVerifier.verify(pb, kb, ib + b"\x01")
    # corrupt a proof point -> off-curve rejection
    bad = bytearray(pb)
    bad[5] ^= 0x40
    with pytest.raises(vf.VerificationFailure):
        vf.PlonkVerifier.verify(bytes(bad), kb, ib)


def test_pure_python_path_matches(monkeypatch):
    """The int-list implementation (the semantic reference) still proves and
    cross-verifies with the shared verifier."""
    from zkmips_tpu.snark import native

    monkeypatch.setattr(native, "available", lambda: False)
    g = plonk.gates_from_r1cs(_circuit())
    pk, vk = plonk.setup(g)
    assert isinstance(pk.ql, list)
    proof = plonk.prove(pk, g)
    assert plonk.verify(vk, proof, [3, 22])
    assert not plonk.verify(vk, proof, [4, 22])
