"""Execution events + per-shard record container.

Mirrors the reference's event model (crates/core/executor/src/events/ and
record.rs:30-75): memory accesses carry (value, shard, timestamp) triples and
their previous values, the CPU event carries the full per-cycle context, and
the record buckets events per chip family.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .opcodes import Opcode


@dataclass(frozen=True, slots=True)
class MemoryRecord:
    value: int
    shard: int
    timestamp: int


@dataclass(frozen=True, slots=True)
class MemoryReadRecord:
    value: int
    shard: int
    timestamp: int
    prev_shard: int
    prev_timestamp: int

    @property
    def prev_value(self) -> int:
        return self.value


@dataclass(frozen=True, slots=True)
class MemoryWriteRecord:
    value: int
    shard: int
    timestamp: int
    prev_value: int
    prev_shard: int
    prev_timestamp: int


@dataclass(slots=True)
class MemoryAccessRecord:
    a: object = None  # read or write record
    b: object = None
    c: object = None
    hi: object = None
    memory: object = None
    memory_addr: int | None = None


@dataclass(frozen=True, slots=True)
class CpuEvent:
    clk: int
    pc: int
    next_pc: int
    next_next_pc: int
    instruction: object  # Instruction
    a: int
    b: int
    c: int
    hi_or_prev_a: int | None
    access: MemoryAccessRecord
    exit_code: int
    syscall_code: int
    is_delay_slot: bool


@dataclass(frozen=True, slots=True)
class AluEvent:
    opcode: Opcode
    a: int
    b: int
    c: int
    hi: int = 0


@dataclass(frozen=True, slots=True)
class SyscallEvent:
    shard: int
    clk: int
    syscall_id: int
    arg1: int
    arg2: int


@dataclass(frozen=True, slots=True)
class MemoryLocalEvent:
    addr: int
    initial: MemoryRecord  # record BEFORE first access in this shard
    final: MemoryRecord  # record AFTER last access in this shard


@dataclass(frozen=True, slots=True)
class MemoryInitFinalEvent:
    addr: int
    value: int
    shard: int
    timestamp: int
    used: int


@dataclass(slots=True)
class PublicValues:
    """Shard public values (subset of air/public_values.rs:11-56 for now)."""

    committed_value_digest: list = field(default_factory=lambda: [0] * 8)
    shard: int = 1
    start_pc: int = 0
    next_pc: int = 0
    exit_code: int = 0


@dataclass
class ExecutionRecord:
    shard: int = 1
    program: object = None
    cpu_events: list = field(default_factory=list)
    alu_events: list = field(default_factory=list)  # AluEvent (all ALU groups)
    memory_instr_events: list = field(default_factory=list)  # CpuEvent refs
    branch_events: list = field(default_factory=list)
    jump_events: list = field(default_factory=list)
    misc_events: list = field(default_factory=list)
    syscall_events: list = field(default_factory=list)
    local_memory_access: dict = field(default_factory=dict)  # addr -> MemoryLocalEvent
    global_memory_initialize_events: list = field(default_factory=list)
    global_memory_finalize_events: list = field(default_factory=list)
    byte_lookups: dict = field(default_factory=dict)  # "arrays" -> [(op, a, b, c) arrays]
    deferred_proof_digests: list = field(default_factory=list)  # (vkey[8], pv_digest[8])
    global_lookup_events: list = field(default_factory=list)
    nested_alu_events: list = field(default_factory=list)
    precompile_events: dict = field(default_factory=dict)  # name -> [events]
    public_values: PublicValues = field(default_factory=PublicValues)

    def add_alu_event(self, e: AluEvent):
        self.alu_events.append(e)


@dataclass(frozen=True, slots=True)
class ShaExtendEvent:
    """48 message-schedule iterations (reference sha256/extend.rs)."""

    shard: int
    clk: int  # clk of the syscall row; iteration i uses clk + (i - 16)
    w_ptr: int
    arg2: int
    reads_15: tuple  # 48 x MemoryReadRecord
    reads_2: tuple
    reads_16: tuple
    reads_7: tuple
    writes: tuple  # 48 x MemoryWriteRecord


@dataclass(frozen=True, slots=True)
class ShaCompressEvent:
    """SHA-256 compression (reference sha256/compress.rs): 8 h reads + 64 w
    reads at clk, 8 h writes at clk + 1."""

    shard: int
    clk: int
    w_ptr: int
    h_ptr: int
    h_reads: tuple
    w_reads: tuple
    h_writes: tuple
