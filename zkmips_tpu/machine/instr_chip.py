"""Base class for instruction chips: the receive side of the CPU dispatch.

Every opcode-class chip (AddSub, Bitwise, Branch, MemoryInstructions, ...)
shares the same front matter: one row per event, opcode selector flags,
the 22-field Instruction message received against its own columns, and
control-flag constants per opcode (which the CPU is thereby forced to set
correctly — see machine/cpu.py).
"""

from __future__ import annotations

import numpy as np

from ..executor.opcodes import Opcode
from ..stark.air import AirBuilder, LookupKind
from ..stark.chip import BaseAir
from .cpu import IMMUTABLE_A, NON_SEQUENTIAL, PA_IS_PREV_A, WRITES_HI
from .gadgets import ByteSink, ColView, Schema
from .lookups import instr_msg
from .words import split_u32

COMMON = [
    "shard", "clk", "pc", "next_pc", "next_next_pc",
    "a_lo", "a_hi", "b_lo", "b_hi", "c_lo", "c_hi",
    "pa_lo", "pa_hi", "hiw_lo", "hiw_hi", "hp_lo", "hp_hi", "is_real",
]


class InstrAir(BaseAir):
    """Subclasses set OPCODES + EXTRA_COLS and implement eval_op / fill_op."""

    OPCODES: list[Opcode] = []
    EXTRA_COLS: list[str] = []
    IS_HALT = 0  # overridden only by the syscall chip

    def __init__(self):
        self.sel_names = [f"is_{op.name.lower()}" for op in self.OPCODES]
        self.schema = Schema(COMMON + self.sel_names + self.EXTRA_COLS + self._access_names())
        self.main_width = self.schema.width

    def _access_names(self) -> list[str]:
        return []

    # ------------------------------------------------------------------ AIR

    def eval(self, b: AirBuilder):
        col = ColView(b, self.schema)
        sels = [col(n) for n in self.sel_names]
        is_real = col("is_real")
        b.assert_bool(is_real)
        total = sels[0]
        for s_ in sels[1:]:
            total = total + s_
        b.assert_eq(total, is_real)
        for s_ in sels:
            b.assert_bool(s_)

        def flag(table) -> object:
            e = 0
            for op, s_ in zip(self.OPCODES, sels):
                if op in table:
                    e = e + s_
            return e

        opcode = 0
        for op, s_ in zip(self.OPCODES, sels):
            opcode = opcode + s_ * int(op)

        is_halt, is_seq = self.control_flags(col, is_real, flag)
        msg = instr_msg(
            opcode,
            col("shard"), col("clk"), col("pc"), col("next_pc"), col("next_next_pc"),
            col.word("a"), col.word("b"), col.word("c"), col.word("pa"), col.word("hiw"),
            col.word("hp"),
            self.num_extra_expr(col),
            flag(WRITES_HI), flag(PA_IS_PREV_A), is_halt, is_seq, flag(IMMUTABLE_A),
        )
        b.receive(LookupKind.Instruction, msg, is_real)

        self.eval_op(b, col, sels)

    def num_extra_expr(self, col):
        return 0

    def control_flags(self, col, is_real, flag):
        """(is_halt, is_sequential) exprs; overridden by the syscall chip."""
        return 0, is_real - flag(NON_SEQUENTIAL)

    def eval_op(self, b: AirBuilder, col: ColView, sels):
        raise NotImplementedError

    # ------------------------------------------------------------ trace gen

    def events_of(self, record) -> list:
        """(event, is_nested) pairs; default: cpu events matching OPCODES."""
        ops = set(self.OPCODES)
        return [e for e in record.cpu_events if e.instruction.opcode in ops]

    def included(self, record) -> bool:
        """Event-driven shard membership (reference MachineAir::included):
        an instruction chip with no events receives no lookup messages, so
        excluding it keeps the shard's lookup multiset balanced while
        dropping its commit/opening/transcript cost."""
        return bool(self.events_of(record))

    def generate_trace(self, record, output):
        events = self.events_of(record)
        n = len(events)
        s = self.schema
        t = np.zeros((n, s.width), dtype=np.uint32)
        if n == 0:
            return t
        sink = ByteSink(record)
        shard = record.shard

        def field(fn_cpu, fn_nested):
            return np.fromiter(
                (fn_cpu(e) if hasattr(e, "instruction") else fn_nested(e) for e in events),
                dtype=np.uint64, count=n,
            )

        t[:, s.idx("shard")] = field(lambda e: shard, lambda e: 0)
        t[:, s.idx("clk")] = field(lambda e: e.clk, lambda e: 0)
        t[:, s.idx("pc")] = field(lambda e: e.pc, lambda e: 0)
        t[:, s.idx("next_pc")] = field(lambda e: e.next_pc, lambda e: 0)
        t[:, s.idx("next_next_pc")] = field(lambda e: e.next_next_pc, lambda e: 0)
        vals = {
            "a": field(lambda e: e.a, lambda e: e.a),
            "b": field(lambda e: e.b, lambda e: e.b),
            "c": field(lambda e: e.c, lambda e: e.c),
            "pa": field(lambda e: e.hi_or_prev_a or 0, lambda e: e.pa),
            "hiw": field(lambda e: e.access.hi.value if e.access.hi is not None else 0, lambda e: e.hiw),
            "hp": field(lambda e: e.access.hi.prev_value if e.access.hi is not None else 0, lambda e: e.hp),
        }
        for k, v in vals.items():
            v = v.astype(np.uint32)
            t[:, s.idx(f"{k}_lo")] = v & 0xFFFF
            t[:, s.idx(f"{k}_hi")] = v >> 16
        t[:, s.idx("is_real")] = 1
        ops = [e.instruction.opcode if hasattr(e, "instruction") else e.opcode for e in events]
        for i, op in enumerate(ops):
            t[i, s.idx(f"is_{op.name.lower()}")] = 1
        if self.fill_vec(t, events, ops, sink):
            return t
        for i, e in enumerate(events):
            self.fill_op(t, i, e, ops[i], sink)
        return t

    def fill_vec(self, t, events, ops, sink) -> bool:
        """Subclasses may implement a vectorized fill; return True if done."""
        return False

    def fill_op(self, t, i, event, op, sink: ByteSink):
        raise NotImplementedError


from dataclasses import dataclass


@dataclass(frozen=True, slots=True)
class NestedAluEvent:
    """Helper-ALU request emitted by another chip (zero control fields)."""

    opcode: Opcode
    a: int
    b: int
    c: int
    pa: int = 0
    hiw: int = 0
    hp: int = 0
