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
