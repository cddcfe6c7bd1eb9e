"""Per-opcode executor tests (modeled on the reference's executor test suite)."""

import numpy as np
import pytest

from zkmips_tpu.executor import (
    ExecutionError,
    Executor,
    Instruction,
    Opcode,
    Program,
    Register,
    decode_instruction,
)
from zkmips_tpu.executor import asm
from zkmips_tpu.executor.asm import O, alu, branch, halt_sequence, li, mem_op, nop, prog

R = Register


def run_prog(instructions, image=None, stdin=(), shard_size=1 << 20):
    p = asm.prog(list(instructions) + halt_sequence(), image=image)
    ex = Executor(p, shard_size=shard_size)
    for d in stdin:
        ex.write_stdin(d)
    ex.run()
    return ex


def reg(ex, r):
    return ex.register(r)


# --------------------------------------------------------------------- ALU


@pytest.mark.parametrize(
    "op,b,c,expected",
    [
        (O.ADD, 5, 7, 12),
        (O.ADD, 0xFFFFFFFF, 1, 0),
        (O.SUB, 5, 7, 0xFFFFFFFE),
        (O.AND, 0b1100, 0b1010, 0b1000),
        (O.OR, 0b1100, 0b1010, 0b1110),
        (O.XOR, 0b1100, 0b1010, 0b0110),
        (O.NOR, 0, 0, 0xFFFFFFFF),
        (O.NOR, 0xF0F0F0F0, 0x0F0F0F0F, 0),
        (O.SLT, 0xFFFFFFFF, 1, 1),  # -1 < 1
        (O.SLT, 1, 0xFFFFFFFF, 0),
        (O.SLTU, 0xFFFFFFFF, 1, 0),
        (O.SLTU, 1, 2, 1),
        (O.SLL, 1, 31, 0x80000000),
        (O.SRL, 0x80000000, 31, 1),
        (O.SRA, 0x80000000, 31, 0xFFFFFFFF),
        (O.ROR, 0x00000001, 1, 0x80000000),
        (O.MUL, 7, 6, 42),
        (O.MUL, 0x80000000, 2, 0),
        (O.MOD, 0xFFFFFFF9, 2, 0xFFFFFFFF),  # -7 % 2 = -1
        (O.MODU, 7, 2, 1),
        (O.CLZ, 0x00080000, 0, 12),
        (O.CLZ, 0, 0, 32),
        (O.CLO, 0xFFFFFFFF, 0, 32),
        (O.CLO, 0xF0000000, 0, 4),
    ],
)
def test_alu_ops(op, b, c, expected):
    ex = run_prog([*li(R.T0, b), *li(R.T1, c), alu(op, R.T2, R.T0, R.T1)])
    assert reg(ex, R.T2) == expected


@pytest.mark.parametrize(
    "op,b,c,lo,hi",
    [
        (O.MULT, 0xFFFFFFFF, 0xFFFFFFFF, 1, 0),  # (-1)*(-1)
        (O.MULT, 0x80000000, 2, 0, 0xFFFFFFFF),
        (O.MULTU, 0xFFFFFFFF, 2, 0xFFFFFFFE, 1),
        (O.DIV, 0xFFFFFFF9, 2, 0xFFFFFFFD, 0xFFFFFFFF),  # -7/2 = -3 rem -1
        (O.DIVU, 7, 2, 3, 1),
    ],
)
def test_mult_div_lo_hi(op, b, c, lo, hi):
    # op_b/op_c are register indices: op semantics compute on (b=rt, c=rs)
    ex = run_prog([*li(R.T0, b), *li(R.T1, c), alu(op, 32, R.T0, R.T1)])
    assert reg(ex, R.LO) == lo
    assert reg(ex, R.HI) == hi


def test_div_by_zero_traps():
    with pytest.raises(ExecutionError):
        run_prog([*li(R.T0, 5), *li(R.T1, 0), alu(O.DIV, 32, R.T0, R.T1)])


def test_mfhi_mflo_roundtrip():
    ex = run_prog(
        [
            *li(R.T0, 0xFFFFFFFF),
            *li(R.T1, 2),
            alu(O.MULTU, 32, R.T0, R.T1),
            Instruction(O.ADD, R.T2, 32, 0, False, True),  # MFLO
            Instruction(O.ADD, R.T3, 33, 0, False, True),  # MFHI
        ]
    )
    assert reg(ex, R.T2) == 0xFFFFFFFE
    assert reg(ex, R.T3) == 1


# ------------------------------------------------------------------ memory


def test_lw_sw_roundtrip():
    ex = run_prog([*li(R.T0, 0x12345678), *li(R.T1, 0x2000), asm.sw(R.T0, R.T1), asm.lw(R.T2, R.T1)])
    assert reg(ex, R.T2) == 0x12345678


@pytest.mark.parametrize(
    "op,offset,expected",
    [
        (O.LB, 0, 0x78),
        (O.LB, 1, 0x56),
        (O.LB, 3, 0x12),
        (O.LBU, 3, 0x12),
        (O.LH, 0, 0x5678),
        (O.LH, 2, 0x1234),
        (O.LHU, 2, 0x1234),
    ],
)
def test_load_subword(op, offset, expected):
    image = {0x2000: 0x12345678}
    ex = run_prog([*li(R.T1, 0x2000), mem_op(op, R.T2, R.T1, offset)], image=image)
    assert reg(ex, R.T2) == expected


def test_lb_sign_extension():
    image = {0x2000: 0x000000F0}
    ex = run_prog([*li(R.T1, 0x2000), mem_op(O.LB, R.T2, R.T1, 0)], image=image)
    assert reg(ex, R.T2) == 0xFFFFFFF0


@pytest.mark.parametrize(
    "op,offset,rt,expected",
    [
        # little-endian LWL/LWR semantics (executor.rs:1964-2010)
        (O.LWL, 0, 0xAAAAAAAA, 0xAA555555 & 0xFF555555 | 0xAA000000),
        (O.LWR, 3, 0xAAAAAAAA, 0xAAAAAA11),
    ],
)
def test_lwl_lwr(op, offset, rt, expected):
    # mem = 0x44332211
    image = {0x2000: 0x44332211}
    ex = run_prog(
        [*li(R.T2, rt), *li(R.T1, 0x2000), mem_op(op, R.T2, R.T1, offset)], image=image
    )
    if op == O.LWL:
        # i=0: val = mem << 24 = 0x11000000; mask = 0xFF000000; rt&~mask=0x00AAAAAA
        assert reg(ex, R.T2) == 0x11AAAAAA
    else:
        # i=3: val = mem >> 24 = 0x44; mask = 0xFF
        assert reg(ex, R.T2) == 0xAAAAAA44


def test_sb_sh():
    image = {0x2000: 0x44332211}
    ex = run_prog(
        [*li(R.T0, 0xEE), *li(R.T1, 0x2000), mem_op(O.SB, R.T0, R.T1, 2), asm.lw(R.T2, R.T1)],
        image=image,
    )
    assert reg(ex, R.T2) == 0x44EE2211
    ex = run_prog(
        [*li(R.T0, 0xBEEF), *li(R.T1, 0x2000), mem_op(O.SH, R.T0, R.T1, 2), asm.lw(R.T2, R.T1)],
        image=image,
    )
    assert reg(ex, R.T2) == 0xBEEF2211


def test_swl_swr():
    image = {0x2000: 0x44332211}
    ex = run_prog(
        [*li(R.T0, 0xAABBCCDD), *li(R.T1, 0x2000), mem_op(O.SWL, R.T0, R.T1, 1), asm.lw(R.T2, R.T1)],
        image=image,
    )
    # i=1: val = rt >> 16 = 0xAABB; mask = 0xFFFF; mem&~mask | val
    assert reg(ex, R.T2) == 0x4433AABB
    ex = run_prog(
        [*li(R.T0, 0xAABBCCDD), *li(R.T1, 0x2000), mem_op(O.SWR, R.T0, R.T1, 2), asm.lw(R.T2, R.T1)],
        image=image,
    )
    # i=2: val = rt << 16 = 0xCCDD0000; mask = 0xFFFF0000
    assert reg(ex, R.T2) == 0xCCDD2211


# ------------------------------------------------------- branches & jumps


def test_branch_taken_with_delay_slot():
    # beq $0,$0,+8 ; delay: t0=1 ; (skipped: t1=1) ; target: t2=1
    ex = run_prog(
        [
            branch(O.BEQ, 0, 0, 8),
            asm.addi(R.T0, 0, 1),  # delay slot: executes
            asm.addi(R.T1, 0, 1),  # skipped
            asm.addi(R.T2, 0, 1),  # branch target
        ]
    )
    assert reg(ex, R.T0) == 1
    assert reg(ex, R.T1) == 0
    assert reg(ex, R.T2) == 1


def test_branch_not_taken():
    ex = run_prog(
        [
            *li(R.T3, 5),
            branch(O.BNE, R.T3, R.T3, 8),
            asm.addi(R.T0, 0, 1),  # delay slot: executes
            asm.addi(R.T1, 0, 1),  # falls through: executes
        ]
    )
    assert reg(ex, R.T0) == 1
    assert reg(ex, R.T1) == 1


@pytest.mark.parametrize(
    "op,val,taken",
    [
        (O.BGEZ, 0, True),
        (O.BGEZ, 0xFFFFFFFF, False),
        (O.BGTZ, 1, True),
        (O.BGTZ, 0, False),
        (O.BLEZ, 0, True),
        (O.BLEZ, 1, False),
        (O.BLTZ, 0xFFFFFFFF, True),
        (O.BLTZ, 0, False),
    ],
)
def test_single_operand_branches(op, val, taken):
    ex = run_prog(
        [
            *li(R.T3, val),
            branch(op, R.T3, 0, 8),
            nop(),
            asm.addi(R.T1, 0, 1),  # skipped if taken
            asm.addi(R.T2, 0, 1),  # target
        ]
    )
    assert reg(ex, R.T2) == 1
    assert reg(ex, R.T1) == (0 if taken else 1)


def test_jump_register_and_link():
    # JALR: link in rd, jump to rs
    start = 0x1000
    ex = run_prog(
        [
            *li(R.T0, start + 20),  # target = instruction index 5
            Instruction(O.Jump, R.T9, R.T0, 0, False, True),  # JALR t9, t0
            asm.addi(R.T1, 0, 1),  # delay slot: executes
            asm.addi(R.T2, 0, 1),  # skipped
            asm.addi(R.T3, 0, 1),  # target (0x1000 + 20)
        ]
    )
    assert reg(ex, R.T1) == 1
    assert reg(ex, R.T2) == 0
    assert reg(ex, R.T3) == 1
    # link = pc_of_jump + 8 = (0x1000 + 8) + 8
    assert reg(ex, R.T9) == start + 16


def test_jumpi_jal_links_ra():
    start = 0x1000
    ex = run_prog(
        [
            Instruction(O.Jumpi, 31, start + 12, 0, True, True),  # JAL target
            asm.addi(R.T1, 0, 1),  # delay slot
            asm.addi(R.T2, 0, 1),  # skipped
            asm.addi(R.T3, 0, 1),  # target
            nop(),
        ]
    )
    assert reg(ex, R.T1) == 1
    assert reg(ex, R.T2) == 0
    assert reg(ex, R.T3) == 1
    assert reg(ex, R.RA) == start + 8


# ------------------------------------------------------------------- misc


def test_movz_movn():
    ex = run_prog(
        [*li(R.T0, 42), *li(R.T1, 0), Instruction(O.MEQ, R.T2, R.T0, R.T1, False, False)]
    )
    assert reg(ex, R.T2) == 42  # MOVZ moves since t1 == 0
    ex = run_prog(
        [*li(R.T0, 42), *li(R.T1, 1), Instruction(O.MNE, R.T2, R.T0, R.T1, False, False)]
    )
    assert reg(ex, R.T2) == 42


def test_wsbh_ext_ins_seb():
    ex = run_prog([*li(R.T0, 0x12345678), Instruction(O.WSBH, R.T1, R.T0, 0, False, True)])
    assert reg(ex, R.T1) == 0x34127856
    # EXT t1, t0, lsb=4, msbd=7 (8 bits from bit 4)
    ex = run_prog([*li(R.T0, 0x12345678), Instruction(O.EXT, R.T1, R.T0, (7 << 5) | 4, False, True)])
    assert reg(ex, R.T1) == 0x67
    # INS t1, t0, lsb=8, msb=15
    ex = run_prog(
        [*li(R.T1, 0xAAAAAAAA), *li(R.T0, 0xCD), Instruction(O.INS, R.T1, R.T0, (15 << 5) | 8, False, True)]
    )
    assert reg(ex, R.T1) == 0xAAAACDAA
    # SEB
    ex = run_prog([*li(R.T0, 0x80), Instruction(O.SEXT, R.T1, R.T0, 0, False, True)])
    assert reg(ex, R.T1) == 0xFFFFFF80


def test_maddu():
    ex = run_prog(
        [
            *li(R.T0, 3), *li(R.T1, 4),
            alu(O.MULTU, 32, R.T0, R.T1),  # lo=12
            Instruction(O.MADDU, 32, R.T0, R.T1, False, False),  # lo=24
        ]
    )
    assert reg(ex, R.LO) == 24


# ---------------------------------------------------------------- syscalls


def test_halt_exit_code_zero():
    ex = run_prog([])
    assert ex.exited


def test_write_stdout():
    image = {0x2000: int.from_bytes(b"hi!\x00", "little")}
    ex = run_prog(
        [
            *li(R.V0, 2),  # WRITE
            *li(R.A0, 1),  # stdout
            *li(R.A1, 0x2000),
            *li(R.A2, 3),
            asm.syscall(),
        ],
        image=image,
    )
    assert bytes(ex.stdout) == b"hi!"


def test_commit_syscall():
    ex = run_prog([*li(R.V0, 0x10), *li(R.A0, 2), *li(R.A1, 0xDEAD), asm.syscall()])
    assert ex.committed_value_digest[2] == 0xDEAD


def test_hint_read():
    data = (1234567).to_bytes(4, "little")
    ex = run_prog(
        [
            *li(R.V0, 0xF0), asm.syscall(),  # hint_len -> v0
            Instruction(O.ADD, R.T5, R.V0, 0, False, True),  # save len
            *li(R.V0, 0xF1), *li(R.A0, 0x3000), *li(R.A1, 4), asm.syscall(),  # hint_read
            *li(R.T1, 0x3000), asm.lw(R.T2, R.T1),
        ],
        stdin=[data],
    )
    assert reg(ex, R.T5) == 4
    assert reg(ex, R.T2) == 1234567


# -------------------------------------------------------------- structural


def test_registers_init_from_image():
    ex = run_prog([Instruction(O.ADD, R.T0, R.SP, 0, False, True)])
    from zkmips_tpu.executor.program import INIT_SP

    p = asm.prog(halt_sequence())
    # image-based SP init only happens via ELF loading; direct programs start at 0
    assert reg(ex, R.T0) == 0


def test_sharding_splits_records():
    body = [asm.addi(R.T0, R.T0, 1) for _ in range(20)]
    ex = run_prog(body, shard_size=8)
    assert len(ex.records) >= 3
    assert sum(len(r.cpu_events) for r in ex.records) == 20 + 3  # + halt sequence
    assert reg(ex, R.T0) == 20


def test_memory_local_events_and_global_init():
    ex = run_prog([*li(R.T0, 7), *li(R.T1, 0x2000), asm.sw(R.T0, R.T1)])
    rec = ex.records[-1]
    assert 0x2000 in [e.addr for e in rec.global_memory_finalize_events]
    final = [e for e in rec.global_memory_finalize_events if e.addr == 0x2000][0]
    assert final.value == 7


def test_decoder_roundtrip_known_words():
    cases = {
        0x01094020: Instruction(O.ADD, 8, 8, 9, False, False),  # add $t0,$t0,$t1
        0x25080001: Instruction(O.ADD, 8, 8, 1, False, True),  # addiu $t0,$t0,1
        0x3C081234: Instruction(O.SLL, 8, 0x1234, 16, True, True),  # lui $t0,0x1234
        0x8D090004: Instruction(O.LW, 9, 8, 4, False, True),  # lw $t1,4($t0)
        0xAD090004: Instruction(O.SW, 9, 8, 4, False, True),  # sw $t1,4($t0)
        0x11090003: Instruction(O.BEQ, 8, 9, 12, False, True),  # beq $t0,$t1,+3
        0x0000000C: Instruction(O.SYSCALL, 2, 4, 5, False, False),
        0x00084040: Instruction(O.SLL, 8, 8, 1, False, True),  # sll $t0,$t0,1
        0x0008000D: None,  # break -> UNIMPL
    }
    for word, want in cases.items():
        got = decode_instruction(word)
        if want is None:
            assert got.opcode == O.UNIMPL
        else:
            assert (got.opcode, got.op_a, got.op_b, got.op_c, got.imm_b, got.imm_c) == (
                want.opcode, want.op_a, want.op_b, want.op_c, want.imm_b, want.imm_c,
            ), f"word {word:#010x}"


def test_fibonacci_program():
    """fib(10) computed with a loop: the canonical guest, assembled by hand."""
    n = 10
    body = [
        *li(R.T0, 0),      # a = 0
        *li(R.T1, 1),      # b = 1
        *li(R.T2, n),      # i = n
        # loop:
        alu(O.ADD, R.T3, R.T0, R.T1),          # t3 = a+b
        Instruction(O.ADD, R.T0, R.T1, 0, False, True),  # a = b
        Instruction(O.ADD, R.T1, R.T3, 0, False, True),  # b = t3
        asm.addi(R.T2, R.T2, -1 & 0xFFFFFFFF),  # i -= 1
        branch(O.BGTZ, R.T2, 0, -20),           # loop while i > 0 (target rel. to delay slot)
        nop(),                                   # delay slot
    ]
    ex = run_prog(body)
    fibs = [0, 1]
    for _ in range(n):
        fibs.append(fibs[-1] + fibs[-2])
    assert reg(ex, R.T1) == fibs[n + 1]


def test_checkpoint_resume():
    body = [asm.addi(R.T0, R.T0, 1) for _ in range(10)]
    p = asm.prog(body + halt_sequence())
    ex = Executor(p)
    for _ in range(5):
        ex.execute_cycle()
    snap = ex.checkpoint()
    t0_at_snap = ex.register(R.T0)
    ex.run()
    final = ex.register(R.T0)
    ex2 = Executor(p)
    ex2.restore(snap)
    assert ex2.register(R.T0) == t0_at_snap
    ex2.run()
    assert ex2.register(R.T0) == final


def test_unconstrained_rollback():
    p = asm.prog([asm.addi(R.T0, 0, 1)] + halt_sequence())
    ex = Executor(p)
    ex.execute_cycle()
    before = ex.register(R.T0)
    ex.enter_unconstrained()
    ex.rw_cpu(R.T0, 999, 3)
    ex.mw_cpu(0x2000, 123)
    assert ex.register(R.T0) == 999
    ex.exit_unconstrained()
    assert ex.register(R.T0) == before
    assert ex.word(0x2000) == 0


def test_keccak_sponge_precompile():
    """keccak256("abc") via the KECCAK_SPONGE syscall (reference
    crates/zkvm/lib/src/keccak256.rs padding: rate block + 2 zero u32s)."""
    data = b"abc"
    padded = bytearray(data) + bytearray(136 - len(data))
    padded[len(data)] = 0x01
    padded[135] |= 0x80
    words = [int.from_bytes(padded[i:i + 4], "little") for i in range(0, 136, 4)]
    words += [0, 0]  # capacity filler -> 36-u32 general block
    body = []
    for i, w in enumerate(words):
        body += [*asm.li(R.T0, w), *asm.li(R.T1, 0x2000 + 4 * i), asm.sw(R.T0, R.T1)]
    body += [*asm.li(R.T0, len(words)), *asm.li(R.T1, 0x3000 + 64), asm.sw(R.T0, R.T1)]
    body += [*asm.li(R.V0, 0x01010009), *asm.li(R.A0, 0x2000), *asm.li(R.A1, 0x3000),
             asm.syscall()]
    p = asm.prog(body + asm.halt_sequence())
    ex = Executor(p)
    records = ex.run()
    out = b"".join(ex.word(0x3000 + 4 * i).to_bytes(4, "little")
                   for i in range(8))
    assert out.hex() == "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    evs = [e for r in records for e in r.precompile_events.get("keccak_sponge", [])]
    assert len(evs) == 1 and evs[0]["input_len"] == 36


def test_lde_size_probe_bumps_shards():
    """Cost-model shape probe (executor/cost.py): a low LDE budget splits
    execution into extra shards before the cycle limit is reached."""
    body = [
        *asm.li(R.T0, 0), *asm.li(R.T1, 1), *asm.li(R.T2, 5000),
        asm.alu(Opcode.ADD, R.T3, R.T0, R.T1),
        asm.alu(Opcode.ADD, R.T0, R.T1, 0, imm_c=True),
        asm.alu(Opcode.ADD, R.T1, R.T3, 0, imm_c=True),
        asm.addi(R.T2, R.T2, -1 & 0xFFFFFFFF),
        asm.branch(Opcode.BGTZ, R.T2, 0, -20),
        asm.nop(),
    ]
    p = asm.prog(body + asm.halt_sequence())
    ex = Executor(p, max_lde_size=12_000_000)
    records = ex.run()
    assert len(records) > 1
    # shard chain remains contiguous
    assert [r.shard for r in records] == list(range(1, len(records) + 1))
    ex2 = asm_run = Executor(p)
    assert len(ex2.run()) == 1


def test_checkpoint_bytes_roundtrip_and_resume():
    """Serialized checkpoint (the work-distribution unit, executor.rs:2330):
    run half the guest, snapshot to bytes, restore into a FRESH executor,
    finish there — final architectural state matches an uninterrupted run."""
    from zkmips_tpu.executor import asm, Instruction, Opcode, Register
    from zkmips_tpu.executor.executor import Executor

    R, O = Register, Opcode
    body = [
        *asm.li(R.T0, 0), *asm.li(R.T1, 1), *asm.li(R.T2, 60),
        asm.alu(O.ADD, R.T3, R.T0, R.T1),
        Instruction(O.ADD, R.T0, R.T1, 0, False, True),
        Instruction(O.ADD, R.T1, R.T3, 0, False, True),
        asm.addi(R.T2, R.T2, -1 & 0xFFFFFFFF),
        asm.branch(O.BGTZ, R.T2, 0, -20),
        asm.nop(),
    ]
    p = asm.prog(body + asm.halt_sequence())

    full = Executor(p)
    full.run()

    first = Executor(p)
    for _ in range(150):
        first.execute_cycle()
    blob = first.checkpoint_bytes()
    assert isinstance(blob, bytes) and blob[:4] == b"ZKCK"

    second = Executor(p)
    second.restore_bytes(blob)
    assert second.global_clk == first.global_clk
    second.run()
    assert second.exited == full.exited
    assert second.exit_code == full.exit_code
    assert second.global_clk == full.global_clk
    for reg in (R.T0, R.T1, R.T2, R.T3):
        assert second.register(reg) == full.register(reg)

    # tampered blobs are rejected, not silently misparsed
    import pytest as _pytest

    with _pytest.raises(ValueError):
        Executor(p).restore_bytes(b"XXXX" + blob[4:])
    with _pytest.raises(ValueError):
        Executor(p).restore_bytes(blob + b"\x00")
