"""Differential tests: native trace executor vs the Python interpreter.

The Python Executor is the semantic reference; the native machine
(csrc/trace_executor.c) must reproduce its event stream column-for-column,
its per-shard local memory chains, and the init/finalize sets.
"""

import numpy as np
import pytest

from zkmips_tpu.executor import Executor, Instruction, Opcode, Register, asm
from zkmips_tpu.executor import native_trace
from zkmips_tpu.executor.columnar import CPU_DTYPE, cpu_struct
from zkmips_tpu.executor.native import NativeUnsupported

R, O = Register, Opcode
I = Instruction

pytestmark = pytest.mark.skipif(not native_trace.available(), reason="no C toolchain")


def _fib_body(n=50):
    return [
        *asm.li(R.T0, 0), *asm.li(R.T1, 1), *asm.li(R.T2, n),
        asm.alu(O.ADD, R.T3, R.T0, R.T1),
        I(O.ADD, R.T0, R.T1, 0, False, True),
        I(O.ADD, R.T1, R.T3, 0, False, True),
        asm.addi(R.T2, R.T2, -1 & 0xFFFFFFFF),
        asm.branch(O.BGTZ, R.T2, 0, -20),
        asm.nop(),
    ]


def _all_ops_body():
    from tests.test_mips_e2e import _all_ops_body as body

    return body()


def _compare(program, stdin=(), shard_size=1 << 20):
    ex = Executor(program, shard_size=shard_size)
    for d in stdin:
        ex.write_stdin(d)
    py_records = ex.run()
    nat_records, info = native_trace.run_trace(program, stdin=stdin, shard_size=shard_size)

    assert len(nat_records) == len(py_records), (len(nat_records), len(py_records))
    assert info["global_clk"] == ex.global_clk
    assert info["digest"] == ex.committed_value_digest
    assert info["public_values"] == bytes(ex.public_values_stream)
    assert info["stdout"] == bytes(ex.stdout)

    for py_rec, nat_rec in zip(py_records, nat_records):
        assert nat_rec.shard == py_rec.shard
        ps = cpu_struct(py_rec)
        ns = nat_rec._cpu_struct
        assert len(ns["clk"]) == len(py_rec.cpu_events)
        for name in CPU_DTYPE.names:
            assert np.array_equal(ps[name], ns[name]), f"column {name} differs (shard {py_rec.shard})"
        # local memory chains
        pl = {a: (e.initial, e.final) for a, e in py_rec.local_memory_access.items()}
        nl = {a: (e.initial, e.final) for a, e in nat_rec.local_memory_access.items()}
        assert pl == nl, f"local chains differ (shard {py_rec.shard})"
        assert py_rec.public_values.committed_value_digest == nat_rec.public_values.committed_value_digest
        # init/finalize
        assert py_rec.global_memory_initialize_events == nat_rec.global_memory_initialize_events
        assert py_rec.global_memory_finalize_events == nat_rec.global_memory_finalize_events
    return py_records, nat_records


def test_fib_single_shard():
    p = asm.prog(_fib_body() + asm.halt_sequence())
    _compare(p)


def test_all_opcodes():
    p = asm.prog(_all_ops_body() + asm.halt_sequence())
    _compare(p)


def test_multi_shard():
    p = asm.prog(_fib_body(200) + asm.halt_sequence())
    _compare(p, shard_size=128)


def test_shard_boundary_delay_slot():
    """Branch straddling the shard boundary: the delay slot stays with it."""
    p = asm.prog(_fib_body(64) + asm.halt_sequence())
    for size in (6, 7, 8, 9):
        _compare(p, shard_size=size)


def test_hints_and_commit():
    data = bytes(range(32))
    body = [
        # hint length -> T0; read into 0x4000
        *asm.li(R.V0, 0xF0), asm.syscall(),
        asm.alu(O.ADD, R.T0, R.V0, 0, imm_c=True),
        *asm.li(R.V0, 0xF1), *asm.li(R.A0, 0x4000), *asm.li(R.A1, len(data)), asm.syscall(),
        asm.mem_op(O.LW, R.T1, R.A0, 0),
        # commit a word
        *asm.li(R.V0, 0x10), *asm.li(R.A0, 1), *asm.li(R.A1, 0xABCD1234), asm.syscall(),
    ]
    p = asm.prog(body + asm.halt_sequence())
    _compare(p, stdin=[data])


def test_unsupported_falls_back():
    body = [*asm.li(R.V0, 0x00000101), *asm.li(R.A0, 0), *asm.li(R.A1, 0), asm.syscall()]
    p = asm.prog(body + asm.halt_sequence())
    with pytest.raises((NativeUnsupported, Exception)):
        native_trace.run_trace(p)


def test_native_record_proves():
    """Array-backed records drive the full machine prove/verify."""
    from zkmips_tpu.machine.machine import mips_machine
    from zkmips_tpu.stark.machine import StarkConfig

    p = asm.prog(_fib_body(30) + asm.halt_sequence())
    records, info = native_trace.run_trace(p)
    m = mips_machine(StarkConfig.test())
    pk = m.setup(p)
    proofs = m.prove(pk, records)
    assert m.verify(pk.vk, proofs, p)
