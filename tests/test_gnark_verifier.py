"""Golden cross-check: verify the reference repo's shipped gnark Groth16
artifacts (crates/prover/scripts/artifacts/) with our from-scratch BN254
stack.  These bytes were produced by gnark itself, so a pass pins down the
whole chain: gnark wire decoding (compressed + uncompressed points, Fp2
square roots, lexicographic y selection), Fp/Fp2 arithmetic, the optimal ate
pairing, and the Groth16 equation."""

import json
import os

import pytest

from zkmips_tpu.verifier import gnark

ART = "/root/reference/crates/prover/scripts/artifacts"

pytestmark = pytest.mark.skipif(not os.path.isdir(ART), reason="artifacts not present")


def _load():
    vk_bytes = open(f"{ART}/example_vk_groth16.bin", "rb").read()
    pj = json.load(open(f"{ART}/example_proof.json"))
    return vk_bytes, bytes.fromhex(pj["encoded_proof"]), [int(x) for x in pj["public_inputs"]]


def test_gnark_groth16_golden():
    vk_bytes, proof_bytes, inputs = _load()
    vk = gnark.load_groth16_vk(vk_bytes)
    proof = gnark.load_groth16_proof(proof_bytes)
    assert gnark.verify_gnark_groth16_algebraic(vk, proof, inputs)


def test_gnark_groth16_tamper_rejected():
    vk_bytes, proof_bytes, inputs = _load()
    vk = gnark.load_groth16_vk(vk_bytes)
    # flip a bit in ar's y coordinate: either decode fails (off curve) or the
    # pairing check fails
    bad = bytearray(proof_bytes)
    bad[70] ^= 1
    try:
        proof = gnark.load_groth16_proof(bytes(bad))
    except gnark.GnarkDecodeError:
        return
    assert not gnark.verify_gnark_groth16_algebraic(vk, proof, inputs)


def test_gnark_groth16_wrong_point_rejected():
    """The example vk's input commitments k[1]/k[2] are the point at infinity
    (dummy circuit), so inputs cannot be tampered — shift krs instead."""
    vk_bytes, proof_bytes, inputs = _load()
    vk = gnark.load_groth16_vk(vk_bytes)
    proof = gnark.load_groth16_proof(proof_bytes)
    from zkmips_tpu.snark import bn254_curve as ec

    bad = gnark.GnarkGroth16Proof(proof.ar, proof.bs, ec.g1_add(proof.krs, ec.G1_GEN))
    assert not gnark.verify_gnark_groth16_algebraic(vk, bad, inputs)


def test_bn254_vk_artifacts_decode():
    """The release Groth16 vk (crates/verifier/bn254-vk/groth16_vk.bin)
    decodes to valid curve points."""
    path = "/root/reference/crates/verifier/bn254-vk/groth16_vk.bin"
    if not os.path.exists(path):
        pytest.skip("release vk not present")
    vk = gnark.load_groth16_vk(open(path, "rb").read())
    from zkmips_tpu.snark import bn254_curve as ec

    assert ec.g1_is_on_curve(vk.alpha)
    assert ec.g2_is_on_curve(vk.beta)
    assert ec.g2_is_on_curve(vk.gamma)
    assert ec.g2_is_on_curve(vk.delta)
    assert len(vk.k) == 3 and all(ec.g1_is_on_curve(p) for p in vk.k)
