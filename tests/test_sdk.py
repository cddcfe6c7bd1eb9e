"""SDK surface tests: ProverClient execute/prove/verify + proof persistence."""

import numpy as np

from zkmips_tpu.executor import Opcode, Register
from zkmips_tpu.executor import asm
from zkmips_tpu.sdk import ProverClient, ZKMStdin
from zkmips_tpu.stark.machine import StarkConfig

R, O = Register, Opcode


def _commit_program():
    # read a hinted word, add 1, commit it (digest word 0)
    return asm.prog(
        [
            *asm.li(R.V0, 0xF0), asm.syscall(),  # hint len
            *asm.li(R.V0, 0xF1), *asm.li(R.A0, 0x3000), *asm.li(R.A1, 4), asm.syscall(),
            *asm.li(R.T1, 0x3000), asm.lw(R.T2, R.T1),
            asm.addi(R.T2, R.T2, 1),
            *asm.li(R.V0, 0x10), *asm.li(R.A0, 0),
            asm.alu(O.ADD, R.A1, R.T2, 0, imm_c=True), asm.syscall(),  # commit
        ]
        + asm.halt_sequence()
    )


def test_execute_and_mock():
    client = ProverClient.mock()
    stdin = ZKMStdin()
    stdin.write_u32(41)
    program = _commit_program()
    report = client.execute(program, stdin)
    assert report.exit_code == 0
    assert report.total_instruction_count > 10
    pk, vk = client.setup(program)
    proof = client.prove(pk, program, stdin)
    assert proof.mode == "mock"
    assert client.verify(vk, proof, program)


def test_prove_verify_and_save(tmp_path):
    client = ProverClient.new(config=StarkConfig.test())
    stdin = ZKMStdin()
    stdin.write_u32(41)
    program = _commit_program()
    pk, vk = client.setup(program)
    proof = client.prove(pk, program, stdin)
    assert proof.committed_value_digest[0] == 42
    assert client.verify(vk, proof, program)
    path = tmp_path / "proof.bin"
    proof.save(str(path))
    from zkmips_tpu.sdk import ProofWithPublicValues

    loaded = ProofWithPublicValues.load(str(path))
    assert client.verify(vk, loaded, program)
    assert loaded.size_bytes() > 0
