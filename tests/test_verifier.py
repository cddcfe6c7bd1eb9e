"""Standalone verifier byte-API (zkmips_tpu/verifier, zkm-verifier analog)."""

import pytest

from zkmips_tpu.snark import groth16, r1cs
from zkmips_tpu.verifier import (
    Groth16Verifier,
    VerificationFailure,
    decode_groth16_proof,
    decode_groth16_vk,
    encode_groth16_proof,
    encode_groth16_vk,
    encode_public_inputs,
)


@pytest.fixture(scope="module")
def small_proof():
    cs = r1cs.ConstraintSystem()
    x = cs.public(35)
    a = cs.witness(5)
    b = cs.witness(7)
    cs.assert_eq(cs.mul(a, b), x)
    pk, vk = groth16.setup(cs)
    return groth16.prove(pk, cs), vk


def test_byte_roundtrip_and_verify(small_proof):
    proof, vk = small_proof
    pb = encode_groth16_proof(proof)
    vb = encode_groth16_vk(vk)
    assert len(pb) == 256
    p2 = decode_groth16_proof(pb)
    assert p2.a == proof.a and p2.b == proof.b and p2.c == proof.c
    v2 = decode_groth16_vk(vb)
    assert v2.ic == vk.ic
    assert Groth16Verifier.verify(pb, vb, encode_public_inputs([35]))
    assert not Groth16Verifier.verify(pb, vb, encode_public_inputs([36]))


def test_malformed_inputs_rejected(small_proof):
    proof, vk = small_proof
    pb = encode_groth16_proof(proof)
    vb = encode_groth16_vk(vk)
    with pytest.raises(VerificationFailure):
        Groth16Verifier.verify(pb[:-1], vb, encode_public_inputs([35]))
    # corrupt a coordinate -> not on curve
    bad = bytearray(pb)
    bad[5] ^= 1
    with pytest.raises(VerificationFailure):
        Groth16Verifier.verify(bytes(bad), vb, encode_public_inputs([35]))
    with pytest.raises(VerificationFailure):
        Groth16Verifier.verify(pb, vb, encode_public_inputs([35, 36]))
    # out-of-range public input
    with pytest.raises(VerificationFailure):
        Groth16Verifier.verify(pb, vb, (groth16.R).to_bytes(32, "big"))
