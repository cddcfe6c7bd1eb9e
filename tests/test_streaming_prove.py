"""Streaming prove pipeline: records flow from the executor into a bounded
prove pool (prove.rs:157-520 checkpoint-channel analog) — proofs must be
bit-identical to the batch path and verify unchanged."""

import numpy as np

from zkmips_tpu.executor import Executor, Instruction, Opcode, Register, asm, stream_for_proving
from zkmips_tpu.machine.machine import mips_machine
from zkmips_tpu.stark.machine import StarkConfig

R, O = Register, Opcode


def _prog(iters=400):
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


def test_stream_matches_batch_records():
    p = _prog()
    ex = Executor(p, shard_size=512)
    batch = ex.run()
    streamed = list(stream_for_proving(p, shard_size=512))
    assert len(streamed) == len(batch) >= 3
    for a, b in zip(streamed, batch):
        assert a.shard == b.shard
        assert len(a.cpu_events) == len(b.cpu_events)
        assert len(a.global_memory_initialize_events) == len(b.global_memory_initialize_events)


def test_prove_streaming_verifies_and_matches_batch():
    p = _prog()
    m = mips_machine(StarkConfig.test(), minimal=True)
    pk = m.setup(p)

    ex = Executor(p, shard_size=512)
    batch_proofs = m.prove(pk, ex.run())

    stream_proofs = m.prove_streaming(pk, stream_for_proving(p, shard_size=512),
                                      workers=2, max_inflight=2)
    assert m.verify(pk.vk, stream_proofs, p)
    assert len(stream_proofs) == len(batch_proofs)
    for a, b in zip(stream_proofs, batch_proofs):
        assert np.array_equal(a.main_root, b.main_root)
        assert np.array_equal(a.quotient_root, b.quotient_root)
        assert np.array_equal(a.public_values, b.public_values)
