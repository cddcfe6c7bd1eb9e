"""Differential tests: native C executor vs the Python reference."""

import numpy as np
import pytest

from zkmips_tpu.executor import Executor, Register
from zkmips_tpu.executor import asm
from zkmips_tpu.executor.native import run_native
from tests.test_mips_e2e import _all_ops_body

R = Register


def _both(body, stdin=()):
    p = asm.prog(list(body) + asm.halt_sequence())
    ex = Executor(p)
    for d in stdin:
        ex.write_stdin(d)
    ex.run()
    p2 = asm.prog(list(body) + asm.halt_sequence())
    native = run_native(p2, stdin=stdin)
    return ex, native


def test_all_opcodes_differential():
    ex, native = _both(_all_ops_body())
    for r in range(36):
        assert ex.register(r) == int(native["regs"][r]), f"reg {r}"
    assert ex.global_clk == native["global_clk"]


def test_sha_and_commit_differential():
    import struct

    body = []
    for i in range(16):
        body += [*asm.li(R.T0, i * 7 + 3), *asm.li(R.T1, 0x2000 + 4 * i), asm.sw(R.T0, R.T1)]
    body += [*asm.li(R.V0, 0x30010005), *asm.li(R.A0, 0x2000), *asm.li(R.A1, 0), asm.syscall()]
    body += [*asm.li(R.V0, 0x10), *asm.li(R.A0, 1), *asm.li(R.A1, 0xBEEF), asm.syscall()]
    ex, native = _both(body)
    assert native["digest"][1] == 0xBEEF
    for i in range(64):
        assert ex.word(0x2000 + 4 * i) != 0 or i < 16
    for r in range(32):
        assert ex.register(r) == int(native["regs"][r])


def test_native_speed():
    import time

    from zkmips_tpu.executor import Instruction, Opcode
    O = Opcode
    n = 200_000
    body = [
        *asm.li(R.T0, 0), *asm.li(R.T1, 1), *asm.li(R.T2, n),
        asm.alu(O.ADD, R.T3, R.T0, R.T1),
        Instruction(O.ADD, R.T0, R.T1, 0, False, True),
        Instruction(O.ADD, R.T1, R.T3, 0, False, True),
        asm.addi(R.T2, R.T2, -1 & 0xFFFFFFFF),
        asm.branch(O.BGTZ, R.T2, 0, -20),
        asm.nop(),
    ]
    p = asm.prog(body + asm.halt_sequence())
    t0 = time.time()
    out = run_native(p)
    dt = time.time() - t0
    assert out["global_clk"] > n * 6
    assert out["global_clk"] / dt > 2_000_000, f"native too slow: {out['global_clk']/dt:,.0f} instr/s"


def test_keccak_sponge_differential():
    data = b"zkmips-tpu keccak differential test vector!"
    padded = bytearray(data) + bytearray(136 - len(data) % 136)
    padded[len(data)] = 0x01
    padded[-1] |= 0x80
    words = []
    for blk in range(0, len(padded), 136):
        words += [int.from_bytes(padded[blk + i:blk + i + 4], "little") for i in range(0, 136, 4)]
        words += [0, 0]
    body = []
    for i, w in enumerate(words):
        body += [*asm.li(R.T0, w), *asm.li(R.T1, 0x2000 + 4 * i), asm.sw(R.T0, R.T1)]
    body += [*asm.li(R.T0, len(words)), *asm.li(R.T1, 0x3000 + 64), asm.sw(R.T0, R.T1)]
    body += [*asm.li(R.V0, 0x01010009), *asm.li(R.A0, 0x2000), *asm.li(R.A1, 0x3000),
             asm.syscall()]
    body += [*asm.li(R.T5, 0x3000), *[ins for i in range(8)
             for ins in [asm.lw(16 + i, R.T5), asm.addi(R.T5, R.T5, 4)]]]
    ex, native = _both(body)
    for r in range(36):
        assert ex.register(r) == int(native["regs"][r]), f"reg {r}"
    assert ex.global_clk == native["global_clk"]
