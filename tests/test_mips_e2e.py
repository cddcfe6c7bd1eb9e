"""End-to-end MIPS machine tests: execute -> prove -> verify.

Uses the minimal chip set + the (unsound, fast) test FRI config; the chips
and wiring are identical to the full configuration.
"""

import numpy as np
import pytest

from zkmips_tpu.executor import Executor, Opcode, Register
from zkmips_tpu.executor import asm
from zkmips_tpu.machine.machine import mips_machine
from zkmips_tpu.stark import debug
from zkmips_tpu.stark.chip import pad_to_power_of_two
from zkmips_tpu.stark.machine import StarkConfig, VerificationError

R, O = Register, Opcode


def _run(body, shard_size=1 << 20):
    p = asm.prog(list(body) + asm.halt_sequence())
    ex = Executor(p, shard_size=shard_size)
    return p, ex.run(), ex


def _debug_machine(m, program, records):
    """Constraint + lookup-balance oracle over all shards."""
    chips = {c.name: c for c in m.machine.chips}
    for rec in records:
        m.generate_dependencies(rec)
        pv = m.shard_public_values(rec)
        traces, preps = {}, {}
        for a in m.airs:
            traces[a.name] = a.generate_trace(rec, None)
            preps[a.name] = a.generate_preprocessed(program)
        for a in m.airs:
            pp = pad_to_power_of_two(preps[a.name]) if preps[a.name] is not None else None
            t = pad_to_power_of_two(traces[a.name], fixed_rows=None if pp is None else pp.shape[0])
            hook = getattr(a, "pad_rows", None)
            if hook is not None:
                t = hook(traces[a.name], t.shape[0])
            gs = t[-1, -14:].astype(np.uint32) if a.name == "Global" else None
            debug.debug_constraints(chips[a.name], t, pp, publics=pv, global_sum=gs)
        problems = debug.debug_lookups(
            [(chips[a.name], traces[a.name], preps[a.name]) for a in m.airs]
        )
        assert problems == {}, f"unbalanced lookups: {problems}"


def test_minimal_machine_debug_oracles():
    p, records, ex = _run(
        [asm.addi(R.T0, 0, 5), asm.addi(R.T1, R.T0, 7), asm.alu(O.ADD, R.T2, R.T0, R.T1)]
    )
    m = mips_machine(StarkConfig.test(), minimal=True)
    _debug_machine(m, p, records)


def test_minimal_machine_prove_verify():
    p, records, ex = _run([asm.addi(R.T0, 0, 5), asm.alu(O.SUB, R.T1, R.T0, R.T0)])
    m = mips_machine(StarkConfig.test(), minimal=True)
    pk = m.setup(p)
    proofs = m.prove(pk, records)
    assert m.verify(pk.vk, proofs, p)


def test_wrong_exit_pc_rejected():
    p, records, ex = _run([asm.addi(R.T0, 0, 1)])
    m = mips_machine(StarkConfig.test(), minimal=True)
    pk = m.setup(p)
    proofs = m.prove(pk, records)
    proofs[-1].public_values = proofs[-1].public_values.copy()
    proofs[-1].public_values[2] = 1234  # claim non-halting next_pc
    with pytest.raises(VerificationError):
        m.verify(pk.vk, proofs, p)


def test_tampered_global_digest_rejected():
    p, records, ex = _run([asm.addi(R.T0, 0, 1)])
    m = mips_machine(StarkConfig.test(), minimal=True)
    pk = m.setup(p)
    proofs = m.prove(pk, records)
    for name, ov in zip(proofs[0].chip_names, proofs[0].opened):
        if name == "Global":
            ov.global_sum = ov.global_sum.copy()
            ov.global_sum[0] ^= 1
    with pytest.raises(VerificationError):
        m.verify(pk.vk, proofs, p)


ALL_OPS_BODY = None


def _all_ops_body():
    from zkmips_tpu.executor import Instruction

    def I(*a, **k):
        return Instruction(*a, **k)

    return [
        *asm.li(R.T0, 0x12345678), *asm.li(R.T1, 0xFFFF0000), *asm.li(R.S0, 0x2000),
        asm.alu(O.ADD, R.T2, R.T0, R.T1), asm.alu(O.SUB, R.T3, R.T0, R.T1),
        asm.alu(O.AND, R.T4, R.T0, R.T1), asm.alu(O.OR, R.T5, R.T0, R.T1),
        asm.alu(O.XOR, R.T6, R.T0, R.T1), asm.alu(O.NOR, R.T7, R.T0, R.T1),
        asm.alu(O.SLT, R.T2, R.T0, R.T1), asm.alu(O.SLTU, R.T2, R.T1, R.T0),
        asm.alu(O.SLL, R.T3, R.T0, 7, imm_c=True), asm.alu(O.SRL, R.T3, R.T0, 9, imm_c=True),
        asm.alu(O.SRA, R.T3, R.T1, 5, imm_c=True), asm.alu(O.ROR, R.T3, R.T0, 13, imm_c=True),
        asm.alu(O.MUL, R.T5, R.T0, R.T1),
        asm.alu(O.MULT, 32, R.T0, R.T1), asm.alu(O.MULTU, 32, R.T0, R.T1),
        *asm.li(R.T4, 0xFFFFFFF9), *asm.li(R.T5, 7),
        asm.alu(O.DIV, 32, R.T4, R.T5), asm.alu(O.DIVU, 32, R.T0, R.T5),
        asm.alu(O.MOD, R.T6, R.T4, R.T5), asm.alu(O.MODU, R.T6, R.T0, R.T5),
        asm.alu(O.CLZ, R.T7, R.T0, 0, imm_c=True), asm.alu(O.CLO, R.T7, R.T1, 0, imm_c=True),
        asm.sw(R.T0, R.S0, 0), asm.lw(R.T2, R.S0, 0),
        asm.mem_op(O.LB, R.T3, R.S0, 1), asm.mem_op(O.LBU, R.T3, R.S0, 3),
        asm.mem_op(O.LH, R.T3, R.S0, 0), asm.mem_op(O.LHU, R.T3, R.S0, 2),
        asm.mem_op(O.SB, R.T1, R.S0, 2), asm.mem_op(O.SH, R.T1, R.S0, 4),
        asm.mem_op(O.LWL, R.T3, R.S0, 1), asm.mem_op(O.LWR, R.T3, R.S0, 2),
        asm.mem_op(O.SWL, R.T0, R.S0, 5), asm.mem_op(O.SWR, R.T0, R.S0, 6),
        asm.mem_op(O.LL, R.T3, R.S0, 0), asm.mem_op(O.SC, R.T3, R.S0, 0),
        I(O.WSBH, R.T3, R.T0, 0, False, True),
        I(O.SEXT, R.T3, R.T0, 0, False, True), I(O.SEXT, R.T3, R.T0, 1, False, True),
        I(O.EXT, R.T3, R.T0, (7 << 5) | 4, False, True),
        *asm.li(R.T4, 0xCD), I(O.INS, R.T3, R.T4, (15 << 5) | 8, False, True),
        I(O.TEQ, R.T0, R.T1, 0, False, True),
        I(O.MADDU, 32, R.T0, R.T5, False, False), I(O.MADD, 32, R.T0, R.T5, False, False),
        I(O.MSUBU, 32, R.T0, R.T5, False, False), I(O.MSUB, 32, R.T0, R.T5, False, False),
        *asm.li(R.T4, 0), I(O.MEQ, R.T3, R.T0, R.T4, False, False),
        I(O.MNE, R.T3, R.T0, R.T5, False, False),
        asm.branch(O.BEQ, R.T0, R.T0, 8), asm.nop(), asm.nop(),
        asm.branch(O.BLTZ, R.T1, 0, 8), asm.nop(), asm.nop(),
        I(O.JumpDirect, R.RA, 8, 0, True, True), asm.nop(), asm.nop(),
    ]


def test_full_machine_all_opcodes_debug_oracles():
    p, records, ex = _run(_all_ops_body())
    m = mips_machine(StarkConfig.test())
    _debug_machine(m, p, records)


def test_full_machine_all_opcodes_prove_verify():
    p, records, ex = _run(_all_ops_body())
    m = mips_machine(StarkConfig.test())
    pk = m.setup(p)
    proofs = m.prove(pk, records)
    assert m.verify(pk.vk, proofs, p)


def _sha_extend_body():
    body = []
    for i in range(16):
        body += [*asm.li(R.T0, (i * 0x01010101 + 0xDEAD) & 0xFFFFFFFF),
                 *asm.li(R.T1, 0x2000 + 4 * i), asm.sw(R.T0, R.T1)]
    body += [*asm.li(R.V0, 0x30010005), *asm.li(R.A0, 0x2000), *asm.li(R.A1, 0), asm.syscall()]
    body += [*asm.li(R.T1, 0x2000 + 63 * 4), asm.lw(R.T2, R.T1)]
    return body


def test_sha_extend_precompile_oracles_and_prove():
    p, records, ex = _run(_sha_extend_body())
    m = mips_machine(StarkConfig.test())
    _debug_machine(m, p, records)
    p2, records2, ex2 = _run(_sha_extend_body())
    pk = m.setup(p2)
    proofs = m.prove(pk, records2)
    assert m.verify(pk.vk, proofs, p2)


def test_sha256_full_hash_oracles_and_prove():
    import hashlib
    import struct

    msg = b"abc"
    padded = msg + b"\x80" + b"\x00" * (55 - len(msg)) + struct.pack(">Q", len(msg) * 8)
    w_words = [int.from_bytes(padded[i:i + 4], "big") for i in range(0, 64, 4)]
    H0 = [0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A, 0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19]
    body = []
    for i, w in enumerate(w_words):
        body += [*asm.li(R.T0, w), *asm.li(R.T1, 0x2000 + 4 * i), asm.sw(R.T0, R.T1)]
    for i, h in enumerate(H0):
        body += [*asm.li(R.T0, h), *asm.li(R.T1, 0x3000 + 4 * i), asm.sw(R.T0, R.T1)]
    body += [*asm.li(R.V0, 0x30010005), *asm.li(R.A0, 0x2000), *asm.li(R.A1, 0), asm.syscall()]
    body += [*asm.li(R.V0, 0x01010006), *asm.li(R.A0, 0x2000), *asm.li(R.A1, 0x3000), asm.syscall()]

    p, records, ex = _run(body)
    digest = b"".join(struct.pack(">I", ex.word(0x3000 + 4 * i)) for i in range(8))
    assert digest == hashlib.sha256(msg).digest()

    m = mips_machine(StarkConfig.test())
    _debug_machine(m, p, records)
    p2, records2, ex2 = _run(body)
    pk = m.setup(p2)
    proofs = m.prove(pk, records2)
    assert m.verify(pk.vk, proofs, p2)


def test_multi_shard_pipelined_prove():
    body = [asm.addi(R.T0, R.T0, 1) for _ in range(40)]
    p, records, ex = _run(body, shard_size=16)
    assert len(records) >= 3
    m = mips_machine(StarkConfig.test(), minimal=True)
    pk = m.setup(p)
    proofs = m.prove(pk, records, workers=2)
    assert m.verify(pk.vk, proofs, p)


def test_fixed_shapes_prove_verify():
    from zkmips_tpu.machine.machine import MipsMachine

    p, records, ex = _run([asm.addi(R.T0, 0, 5), asm.alu(O.SUB, R.T1, R.T0, R.T0)])
    m = MipsMachine(StarkConfig.test(), use_shapes=True)
    pk = m.setup(p)
    proofs = m.prove(pk, records)
    # shaped padding: every chip height snaps to the shape lattice
    from zkmips_tpu.machine.shapes import LATTICE

    names = dict(zip(proofs[0].chip_names, proofs[0].opened))
    assert names["Cpu"].log_degree in LATTICE
    assert m.verify(pk.vk, proofs, p)


def test_poseidon2_precompile_oracles_and_prove():
    from zkmips_tpu.ops import field as ff

    vals = [(i * 37 + 5) % ff.P for i in range(16)]
    body = []
    for i, v in enumerate(vals):
        body += [*asm.li(R.T0, v), *asm.li(R.T1, 0x2000 + 4 * i), asm.sw(R.T0, R.T1)]
    body += [*asm.li(R.V0, 0x00010030), *asm.li(R.A0, 0x2000), *asm.li(R.A1, 0), asm.syscall()]
    p, records, ex = _run(body)
    import numpy as np

    from zkmips_tpu.ops import poseidon2 as p2

    got = [ex.word(0x2000 + 4 * i) for i in range(16)]
    want = [int(x) for x in ff.from_monty(p2.permute(np.array([ff.to_monty_int(v) for v in vals], dtype=np.uint32)))]
    assert got == want

    m = mips_machine(StarkConfig.test())
    _debug_machine(m, p, records)
    p2_, records2, ex2 = _run(body)
    pk = m.setup(p2_)
    proofs = m.prove(pk, records2)
    assert m.verify(pk.vk, proofs, p2_)


def _keccak_body(data: bytes):
    padded = bytearray(data) + bytearray(136 - len(data) % 136)
    padded[len(data)] = 0x01
    padded[-1] |= 0x80
    words = []
    for blk in range(0, len(padded), 136):
        words += [int.from_bytes(padded[blk + i:blk + i + 4], "little")
                  for i in range(0, 136, 4)] + [0, 0]
    body = []
    for i, w in enumerate(words):
        body += [*asm.li(R.T0, w), *asm.li(R.T1, 0x2000 + 4 * i), asm.sw(R.T0, R.T1)]
    body += [*asm.li(R.T0, len(words)), *asm.li(R.T1, 0x3000 + 64), asm.sw(R.T0, R.T1)]
    body += [*asm.li(R.V0, 0x01010009), *asm.li(R.A0, 0x2000), *asm.li(R.A1, 0x3000),
             asm.syscall()]
    return body


def test_keccak_sponge_two_block_oracles():
    p, records, ex = _run(_keccak_body(bytes(range(200))))  # 2 blocks: chaining + ptr advance
    m = mips_machine(StarkConfig.test())
    _debug_machine(m, p, records)


def test_keccak_sponge_prove_verify():
    p, records, ex = _run(_keccak_body(b"prove me"))
    m = mips_machine(StarkConfig.test())
    pk = m.setup(p)
    proofs = m.prove(pk, records)
    assert m.verify(pk.vk, proofs, p)
