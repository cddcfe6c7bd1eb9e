"""Columnar view of a shard's CPU events.

Chip trace generation is numpy-vectorized, but each chip re-extracting the
fields it needs from 100k+ CpuEvent objects costs dozens of Python attribute
passes per shard.  This module builds ONE structured array per record (one
pass over the events) that every chip slices with C-speed fancy indexing —
the analog of the reference's C++ event->row encoders operating on packed
event buffers (core/machine/cpp/extern.cpp).

The native trace-mode executor can fill the same structure directly in C,
making this the hand-off format between the emulator and trace generation.
"""

from __future__ import annotations

import numpy as np

# one row per CPU cycle; all fields u4 (canonical u32 values)
CPU_DTYPE = np.dtype(
    [
        ("clk", "u4"), ("pc", "u4"), ("next_pc", "u4"), ("nnpc", "u4"),
        ("opcode", "u4"), ("op_a", "u4"), ("op_b", "u4"), ("op_c", "u4"),
        ("imm_b", "u4"), ("imm_c", "u4"),
        ("a", "u4"), ("b", "u4"), ("c", "u4"), ("pa", "u4"), ("syscall", "u4"),
        # register-access previous records (position A/B/C/HI)
        ("a_ps", "u4"), ("a_pt", "u4"), ("a_pv", "u4"),
        ("b_ps", "u4"), ("b_pt", "u4"), ("b_pv", "u4"),
        ("c_ps", "u4"), ("c_pt", "u4"), ("c_pv", "u4"),
        ("hi_has", "u4"), ("hi_ps", "u4"), ("hi_pt", "u4"), ("hi_pv", "u4"),
        ("hiw", "u4"), ("hp", "u4"),
        # memory access (loads/stores)
        ("mem_has", "u4"), ("mem_addr", "u4"), ("mem_val", "u4"),
        ("mem_ps", "u4"), ("mem_pt", "u4"), ("mem_pv", "u4"),
    ]
)


def _acc_prev(rec):
    if rec is None:
        return 0, 0, 0
    return rec.prev_shard, rec.prev_timestamp, rec.prev_value


def cpu_struct(record) -> np.ndarray:
    """The record's CPU events as a CPU_DTYPE array (cached on the record)."""
    arr = getattr(record, "_cpu_struct", None)
    if arr is not None:
        return arr
    events = record.cpu_events

    def gen():
        for e in events:
            acc = e.access
            ins = e.instruction
            hi = acc.hi
            mem = acc.memory
            yield (
                e.clk, e.pc, e.next_pc, e.next_next_pc,
                int(ins.opcode), ins.op_a, ins.op_b, ins.op_c,
                ins.imm_b, ins.imm_c,
                e.a, e.b, e.c, e.hi_or_prev_a or 0, e.syscall_code,
                *_acc_prev(acc.a), *_acc_prev(acc.b), *_acc_prev(acc.c),
                0 if hi is None else 1, *_acc_prev(hi),
                0 if hi is None else hi.value,
                0 if hi is None else hi.prev_value,
                0 if mem is None else 1,
                0 if mem is None else acc.memory_addr,
                0 if mem is None else mem.value,
                *_acc_prev(mem),
            )

    packed = np.fromiter(gen(), dtype=CPU_DTYPE, count=len(events))
    # structured-field views are strided (row stride = record size), which
    # slows every downstream vector op; hand out contiguous per-field arrays
    arr = Columns({name: np.ascontiguousarray(packed[name]) for name in CPU_DTYPE.names})
    record._cpu_struct = arr
    return arr


class Columns(dict):
    """Dict of per-field contiguous arrays, sliceable like a struct array."""

    def __getitem__(self, key):
        if isinstance(key, str):
            return dict.__getitem__(self, key)
        return Columns({k: v[key] for k, v in self.items()})


def indices_of(record, opcodes) -> np.ndarray:
    """Row indices of the record's CPU events matching the opcode list."""
    ops = cpu_struct(record)["opcode"]
    vals = np.array([int(o) for o in opcodes], dtype=np.uint32)
    return np.flatnonzero(np.isin(ops, vals))
