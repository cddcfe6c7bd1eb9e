"""Soundness regression tests for the round-1 advisor findings (ADVICE.md).

Each test mounts the described malicious-prover tampering on a real trace and
asserts the constraint system now rejects it:

1. exit_group halt suppression: is_linux_sc=1, is_extgroup_sc=0 on an
   exit_group row must violate the biconditional inverse-witness constraint
   (reference analog: eval_is_halt_syscall IsZeroOperation,
   crates/core/machine/src/syscall/instructions/air.rs:339-376).
2. SysLinux fake padding row: is_real=0, is_mmap=1 (a free HEAP
   read-modify-write) must violate the unconditional flag one-hot.
3. SyscallInstrs fake padding row: is_real=0, is_linux_sc=1 (a free linux
   bridge send) must violate the unconditional flag sum.
"""

import numpy as np
import pytest

from zkmips_tpu.executor import Executor, Register, asm
from zkmips_tpu.machine.machine import mips_machine
from zkmips_tpu.stark import debug
from zkmips_tpu.stark.chip import pad_to_power_of_two
from zkmips_tpu.stark.machine import StarkConfig

R = Register


def _exit_group_record():
    body = [*asm.li(R.V0, 4246), *asm.li(R.A0, 7), asm.syscall(), asm.nop()]
    p = asm.prog(body)
    ex = Executor(p)
    records = ex.run()
    m = mips_machine(StarkConfig.test())
    rec = records[0]
    m.generate_dependencies(rec)
    return m, p, rec


def _chip_and_trace(m, rec, name):
    chip = {c.name: c for c in m.machine.chips}[name]
    t = pad_to_power_of_two(chip.air.generate_trace(rec, None).astype(np.uint32))
    return chip, t


def _expect_constraint_failure(m, rec, chip, trace):
    pv = m.shard_public_values(rec)
    with pytest.raises(AssertionError):
        debug.debug_constraints(chip, trace, None, publics=pv)


def test_exit_group_halt_suppression_rejected():
    m, p, rec = _exit_group_record()
    chip, t = _chip_and_trace(m, rec, "SyscallInstrs")
    s = chip.air.schema
    rows = np.nonzero(t[:, s.idx("is_extgroup_sc")])[0]
    assert rows.size, "guest must produce an exit_group row"
    r = rows[0]
    # malicious prover: drop the halt flag, keep the row a linux syscall
    t[r, s.idx("is_extgroup_sc")] = 0
    t[r, s.idx("is_halt_sc")] = 0
    _expect_constraint_failure(m, rec, chip, t)


def test_exit_group_halt_suppression_rejected_with_inverse():
    # even an adversarially-chosen inverse witness cannot satisfy the
    # biconditional when pa.lo == SYS_EXT_GROUP
    m, p, rec = _exit_group_record()
    chip, t = _chip_and_trace(m, rec, "SyscallInstrs")
    s = chip.air.schema
    r = np.nonzero(t[:, s.idx("is_extgroup_sc")])[0][0]
    t[r, s.idx("is_extgroup_sc")] = 0
    for witness in (0, 1, 0x12345, 0x7EFFFFFF):
        t[r, s.idx("extgroup_inv")] = witness
        _expect_constraint_failure(m, rec, chip, t)


def test_sys_linux_fake_padding_row_rejected():
    m, p, rec = _exit_group_record()
    chip, t = _chip_and_trace(m, rec, "SysLinux")
    s = chip.air.schema
    pad = np.nonzero(t[:, s.idx("is_real")] == 0)[0]
    assert pad.size, "trace must have padding rows"
    r = pad[0]
    # fake mmap row on padding: would bump HEAP with no incoming message
    t[r, s.idx("is_mmap")] = 1
    t[r, s.idx("immap_a00")] = 1
    t[r, s.idx("ia00")] = 1
    t[r, s.idx("a0hi_z")] = 1
    t[r, s.idx("a0l0_z")] = 1
    t[r, s.idx("po_z")] = 1
    _expect_constraint_failure(m, rec, chip, t)


def test_syscall_instr_fake_linux_padding_row_rejected():
    m, p, rec = _exit_group_record()
    chip, t = _chip_and_trace(m, rec, "SyscallInstrs")
    s = chip.air.schema
    pad = np.nonzero(t[:, s.idx("is_real")] == 0)[0]
    assert pad.size, "trace must have padding rows"
    r = pad[0]
    # fake linux bridge send on padding: prover-chosen shard/clk/args
    t[r, s.idx("is_linux_sc")] = 1
    _expect_constraint_failure(m, rec, chip, t)


def test_syscall_instr_fake_precompile_padding_row_rejected():
    m, p, rec = _exit_group_record()
    chip, t = _chip_and_trace(m, rec, "SyscallInstrs")
    s = chip.air.schema
    r = np.nonzero(t[:, s.idx("is_real")] == 0)[0][0]
    # fake sha-extend send on padding (pre_mult exposure, ADVICE item 3)
    t[r, s.idx("is_shaext_sc")] = 1
    t[r, s.idx("pa_lo")] = 0x30 & 0xFFFF
    _expect_constraint_failure(m, rec, chip, t)
