"""Outer Groth16 circuit over a small outer-config STARK proof.

Drives the full final link of the proof ladder — STARK proof under the BN254
outer config, verified inside an R1CS, proven and verified with Groth16 —
on a 3-chip toy machine (fast), mirroring what wrap_groth16 does to the real
wrap proof (reference: prover/src/lib.rs:1062-1130 wrap_groth16_bn254 +
gnark-ffi/go/main.go ProveGroth16Bn254)."""

import numpy as np
import pytest

from zkmips_tpu.snark import groth16
from zkmips_tpu.snark.outer_circuit import OuterVerifierCircuit, pack_public_values
from zkmips_tpu.stark.chip import Chip
from zkmips_tpu.stark.machine import StarkConfig, StarkMachine
from zkmips_tpu.stark.pcs import FriConfig

from test_machine import RECORD, FibonacciAir, RangeAir, SenderAir, _fib_pv


@pytest.fixture(scope="module")
def outer_proof():
    chips = [Chip(FibonacciAir(), num_public_values=1), Chip(SenderAir(), 1), Chip(RangeAir(), 1)]
    m = StarkMachine(StarkConfig(FriConfig.outer_test()), chips, num_public_values=1)
    pk = m.setup(None)
    pv = np.array([_fib_pv(16)], dtype=np.uint32)
    proof = m.prove_shard(pk, RECORD, pv)
    assert m.verify_shard(pk.vk, proof)
    return m, pk, proof


def test_outer_circuit_satisfied(outer_proof):
    m, pk, proof = outer_proof
    circ = OuterVerifierCircuit(m, pk.vk, proof)
    assert circ.cs.is_satisfied()
    assert circ.packed_pv == pack_public_values(list(proof.public_values))


def test_outer_circuit_rejects_tampered_proof(outer_proof):
    m, pk, proof = outer_proof
    import copy

    bad = copy.deepcopy(proof)
    bad.opened[0].main_local = bad.opened[0].main_local.copy()
    bad.opened[0].main_local[0, 0] ^= 1
    # the eager builder evaluates the verifier on the tampered proof: some
    # assertion must fail during the build (values diverge)
    with pytest.raises(AssertionError):
        OuterVerifierCircuit(m, pk.vk, bad)


def test_outer_circuit_groth16_roundtrip(outer_proof):
    m, pk, proof = outer_proof
    circ = OuterVerifierCircuit(m, pk.vk, proof)
    g16_pk, g16_vk = groth16.setup(circ.cs)
    g16 = groth16.prove(g16_pk, circ.cs)
    assert groth16.verify(g16_vk, g16, circ.packed_pv)
    # wrong public input -> pairing check fails
    bad = [(circ.packed_pv[0] + 1) % groth16.R] + circ.packed_pv[1:]
    assert not groth16.verify(g16_vk, g16, bad)
