"""Deferred precompile shards: record.split + the SyscallCore/SyscallPrecompile
global bridge (reference record.rs:110-146, syscall/chip.rs:28-218).

The precompile events of a shard are carved into standalone records; the
syscall message and the syscall's memory chains cross shards through the
septic-curve Global argument.  Verification covers the full machine check:
per-shard proofs, pc chaining (deferred shards ride behind the halt shard),
and the cross-shard global digest sum.
"""

import numpy as np

from zkmips_tpu.executor import Executor, Opcode, Register
from zkmips_tpu.executor import asm
from zkmips_tpu.machine.machine import mips_machine
from zkmips_tpu.stark.machine import StarkConfig, VerificationError

R, O = Register, Opcode


def _sha_extend_program(n_calls=2):
    body = []
    for i in range(16):
        body += [*asm.li(R.T0, (i * 0x01010101 + 0xBEEF) & 0xFFFFFFFF),
                 *asm.li(R.T1, 0x2000 + 4 * i), asm.sw(R.T0, R.T1)]
    for _ in range(n_calls):
        body += [*asm.li(R.V0, 0x30010005), *asm.li(R.A0, 0x2000), *asm.li(R.A1, 0), asm.syscall()]
    body += [*asm.li(R.T1, 0x2000 + 63 * 4), asm.lw(R.T2, R.T1)]
    return asm.prog(body + asm.halt_sequence())


def _run(p):
    ex = Executor(p)
    return ex.run(), ex


def test_split_moves_precompile_events():
    p = _sha_extend_program()
    records, ex = _run(p)
    assert len(records) == 1
    n_events = len(records[0].precompile_events["sha_extend"])
    assert n_events == 2
    assert len(records[0].precompile_syscall_events["sha_extend"]) == 2
    assert len(records[0].precompile_local_mem["sha_extend"]) == 2
    # the syscall's own memory chains are not merged into the CPU-side map
    for evs in records[0].precompile_local_mem["sha_extend"]:
        assert evs, "syscall recorded no local memory chains"

    m = mips_machine(StarkConfig.test())
    shards = m.split_deferred(list(records), split_threshold=48)
    assert len(shards) == 3  # core + one deferred shard per event (48 rows >= threshold)
    core, d1, d2 = shards
    assert "sha_extend" not in core.precompile_events
    assert len(d1.precompile_events["sha_extend"]) == 1
    assert d1.shard == 2 and d2.shard == 3
    assert not d1.cpu_events
    # deferred shard carries the syscall's memory chains
    assert d1.all_local_memory_events()


def test_deferred_shards_prove_verify():
    p = _sha_extend_program()
    records, ex = _run(p)
    m = mips_machine(StarkConfig.test())
    pk = m.setup(p)
    import zkmips_tpu.utils.opts as opts_mod
    import os

    os.environ["SPLIT_THRESHOLD"] = "48"
    try:
        proofs = m.prove(pk, records)
    finally:
        del os.environ["SPLIT_THRESHOLD"]
    assert len(proofs) == 3
    assert m.verify(pk.vk, proofs, p)


def test_deferred_shard_tamper_detected():
    p = _sha_extend_program()
    records, ex = _run(p)
    m = mips_machine(StarkConfig.test())
    pk = m.setup(p)
    shards = m.split_deferred(list(records), split_threshold=48)
    # drop one deferred shard: the global septic digest sum must not balance
    proofs = [m.prove_record(pk, r) for r in shards[:-1]]
    try:
        ok = m.verify(pk.vk, proofs, p)
    except VerificationError:
        ok = False
    assert not ok


def test_unsplit_precompile_still_proves():
    """Small families stay in the core shard; the bridge chips cancel locally."""
    p = _sha_extend_program(n_calls=1)
    records, ex = _run(p)
    m = mips_machine(StarkConfig.test())
    pk = m.setup(p)
    proofs = m.prove(pk, records)  # default threshold keeps events in-shard
    assert len(proofs) == 1
    assert m.verify(pk.vk, proofs, p)
