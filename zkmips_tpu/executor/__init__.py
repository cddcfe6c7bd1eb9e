"""MIPS32r2 executor: ELF loading, emulation, event recording, sharding.

The host-side counterpart of the reference's crates/core/executor.  Pure
Python reference implementation first (per-opcode tested); a native C++ fast
path drives the same event schema for production speed.
"""

from .events import ExecutionRecord, MemoryAccessRecord, MemoryRecord
from .executor import ExecutionError, Executor, ExecutorMode
from .instruction import Instruction, decode_instruction
from .opcodes import Opcode, Register, SyscallCode
from .program import Program

__all__ = [
    "ExecutionError",
    "ExecutionRecord",
    "Executor",
    "ExecutorMode",
    "Instruction",
    "MemoryAccessRecord",
    "MemoryRecord",
    "Opcode",
    "Program",
    "Register",
    "SyscallCode",
    "decode_instruction",
]
