"""Full MIPS -> Groth16 ladder (heavy; set ZKM_HEAVY_TESTS=1).

The reference's e2e test (crates/prover/src/lib.rs:1269 test_e2e_prover:
core -> compress -> shrink -> wrap -> groth16 on fibonacci).  ~15 min: the
outer circuit has ~2M constraints and the Groth16 setup/prove run through
the native MSM backend.
"""

import os

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("ZKM_HEAVY_TESTS"),
    reason="full MIPS->groth16 ladder (~15 min); set ZKM_HEAVY_TESTS=1",
)


def test_groth16_mode_end_to_end():
    from zkmips_tpu.executor import Opcode, Register, asm
    from zkmips_tpu.sdk.client import ProverClient, ZKMStdin
    from zkmips_tpu.stark.machine import StarkConfig

    R, O = Register, Opcode
    body = [
        asm.addi(R.A0, 0, 9), asm.addi(R.T0, 0, 0), asm.addi(R.T1, 0, 1),
        asm.alu(O.ADD, R.T2, R.T0, R.T1),
        asm.alu(O.ADD, R.T0, R.T1, R.ZERO),
        asm.alu(O.ADD, R.T1, R.T2, R.ZERO),
        asm.addi(R.A0, R.A0, -1),
        asm.branch(O.BNE, R.A0, R.ZERO, -5 * 4),
        asm.nop(),
    ]
    p = asm.prog(body + asm.halt_sequence())
    client = ProverClient(config=StarkConfig.test())
    pk, vk = client.setup(p)
    proof = client.prove(pk, p, ZKMStdin(), shard_size=128, mode="groth16")
    assert proof.mode == "groth16"
    assert client.verify(vk, proof, p)

    # tampered public values must fail the digest-tree check
    import copy

    from zkmips_tpu.stark.machine import VerificationError

    bad = copy.deepcopy(proof)
    bad.proofs[0].wrap_public_values[0] = (bad.proofs[0].wrap_public_values[0] + 1) % 0x7F000001
    with pytest.raises(VerificationError):
        client.verify(vk, bad, p)


def test_plonk_mode_end_to_end():
    """Same ladder, PLONK/KZG wrap (reference .plonk() action)."""
    from zkmips_tpu.executor import Opcode, Register, asm
    from zkmips_tpu.sdk.client import ProverClient, ZKMStdin
    from zkmips_tpu.stark.machine import StarkConfig

    R, O = Register, Opcode
    body = [
        asm.addi(R.A0, 0, 9), asm.addi(R.T0, 0, 0), asm.addi(R.T1, 0, 1),
        asm.alu(O.ADD, R.T2, R.T0, R.T1),
        asm.alu(O.ADD, R.T0, R.T1, R.ZERO),
        asm.alu(O.ADD, R.T1, R.T2, R.ZERO),
        asm.addi(R.A0, R.A0, -1),
        asm.branch(O.BNE, R.A0, R.ZERO, -5 * 4),
        asm.nop(),
    ]
    p = asm.prog(body + asm.halt_sequence())
    client = ProverClient(config=StarkConfig.test())
    pk, vk = client.setup(p)
    proof = client.prove(pk, p, ZKMStdin(), shard_size=128, mode="plonk")
    assert proof.mode == "plonk"
    assert client.verify(vk, proof, p)
