"""Guest tooling: MIPS word encoder (decoder inverse), ELF writer round
trips, and an on-the-fly fixture corpus proven end to end."""

import numpy as np
import pytest

from zkmips_tpu.executor import Executor, Instruction, Opcode, Register, asm
from zkmips_tpu.executor.instruction import decode_instruction
from zkmips_tpu.guest import EncodeError, encode_instruction, roundtrip, write_elf
from zkmips_tpu.machine.machine import mips_machine
from zkmips_tpu.stark.machine import StarkConfig

R, O = Register, Opcode


def _fib(iters):
    body = [
        *asm.li(R.T0, 0), *asm.li(R.T1, 1), *asm.li(R.T2, iters),
        asm.alu(O.ADD, R.T3, R.T0, R.T1),
        Instruction(O.ADD, R.T0, R.T1, 0, False, True),
        Instruction(O.ADD, R.T1, R.T3, 0, False, True),
        asm.addi(R.T2, R.T2, -1 & 0xFFFFFFFF),
        asm.branch(O.BGTZ, R.T2, 0, -20),
        asm.nop(),
    ]
    return asm.prog(body + asm.halt_sequence())


def _memory(n):
    body = [*asm.li(R.T0, 0x2000), *asm.li(R.T1, 0)]
    for i in range(n):
        body += [
            *asm.li(R.T2, i * 3 + 1),
            asm.sw(R.T2, R.T0, 4 * i),
            asm.lw(R.T3, R.T0, 4 * i),
            asm.alu(O.ADD, R.T1, R.T1, R.T3),
        ]
    return asm.prog(body + asm.halt_sequence())


def _bitops():
    body = [
        *asm.li(R.T0, 0xDEADBEEF), *asm.li(R.T1, 0x12345678),
        asm.alu(O.AND, R.T2, R.T0, R.T1),
        asm.alu(O.OR, R.T3, R.T0, R.T1),
        asm.alu(O.XOR, R.T4, R.T0, R.T1),
        asm.alu(O.NOR, R.T5, R.T0, R.T1),
        asm.alu(O.SLL, R.T6, R.T0, 7, imm_c=True),
        asm.alu(O.SRL, R.T7, R.T0, 5, imm_c=True),
        asm.alu(O.SRA, R.S0, R.T0, 3, imm_c=True),
        asm.alu(O.SLT, R.S1, R.T0, R.T1),
        asm.alu(O.SLTU, R.S2, R.T0, R.T1),
    ]
    return asm.prog(body + asm.halt_sequence())


CORPUS = [("fib", lambda: _fib(40)), ("memory", lambda: _memory(6)), ("bitops", _bitops)]


def _regs(ex):
    # skip $sp (29): the ELF loader initializes the stack, asm.prog does not
    return [ex.register(r) for r in range(32) if r != 29]


@pytest.mark.parametrize("name,builder", CORPUS)
def test_elf_roundtrip_execution(name, builder):
    p = builder()
    p2 = roundtrip(p)
    ex1, ex2 = Executor(p), Executor(p2)
    ex1.run()
    ex2.run()
    assert ex1.global_clk == ex2.global_clk
    assert _regs(ex1) == _regs(ex2)


def test_encoder_is_decoder_inverse():
    """Every encodable instruction in the corpus decodes back to an
    execution-identical form (structural equality except the $zero-register
    immediate canonicalization)."""
    total = 0
    for _name, builder in CORPUS:
        for ins in builder().instructions:
            word = encode_instruction(ins)
            back = decode_instruction(word)
            if ins.imm_b and ins.opcode == O.ADD and (ins.op_a, ins.op_b, ins.op_c) != (0, 0, 0):
                # ADD rd, imm0, imm canonicalizes to ADDIU rd, $zero, imm
                assert back.opcode == O.ADD and back.op_a == ins.op_a
                assert back.op_c == ins.op_c and back.imm_c
            elif ins.opcode == O.SLL and ins.imm_b and ins.op_c == 16:
                # LUI decodes its immediate sign-extended; the extension is
                # shifted out, so compare the low 16 bits
                assert back.opcode == O.SLL and back.op_a == ins.op_a
                assert back.op_b & 0xFFFF == ins.op_b & 0xFFFF and back.op_c == 16
            else:
                assert (back.opcode, back.op_a, back.op_b, back.op_c,
                        back.imm_b, back.imm_c) == (
                    ins.opcode, ins.op_a, ins.op_b, ins.op_c, ins.imm_b, ins.imm_c
                ), f"{ins!r} -> {word:#010x} -> {back!r}"
            total += 1
    assert total > 50


def test_elf_fixture_proves(tmp_path):
    """An ELF written by the guest tooling goes through the real loader and
    the full prove/verify pipeline."""
    p = _fib(30)
    path = tmp_path / "fib.elf"
    path.write_bytes(write_elf(p))
    from zkmips_tpu.executor.program import Program

    loaded = Program.from_elf(path.read_bytes())
    ex = Executor(loaded)
    records = ex.run()
    m = mips_machine(StarkConfig.test(), minimal=True)
    pk = m.setup(loaded)
    proofs = m.prove(pk, records)
    assert m.verify(pk.vk, proofs, loaded)


def test_unencodable_raises():
    with pytest.raises(EncodeError):
        encode_instruction(Instruction(O.NOR, 1, 2, 3, False, True))
