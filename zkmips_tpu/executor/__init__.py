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


def execute_for_proving(program, stdin_bufs=(), proof_stream=(), shard_size: int = 1 << 20,
                        max_cycles: int | None = None):
    """Execute a program for the proving pipeline: (records, info).

    Fast path: the native trace-mode executor (csrc/trace_executor.c) emits
    array-backed records; guests it cannot run (precompile syscalls, hooks,
    unconstrained mode, deferred proofs) fall back to the Python
    interpreter.  ``info`` carries global_clk, exit_code, public_values,
    stdout, and the committed digest.
    """
    if not proof_stream:
        try:
            from . import native_trace

            if native_trace.available():
                records, info = native_trace.run_trace(
                    program, stdin=stdin_bufs, shard_size=shard_size,
                    max_cycles=max_cycles if max_cycles is not None else 1 << 40,
                )
                if info["hit_max_cycles"]:
                    raise ExecutionError(f"exceeded max_cycles {max_cycles}")
                info["digest"] = list(info["digest"])
                return records, info
        except ExecutionError:
            raise
        except Exception:
            pass  # NativeUnsupported / missing toolchain: Python path below

    ex = Executor(program, shard_size=shard_size)
    for buf in stdin_bufs:
        ex.write_stdin(buf)
    ex.proof_stream.extend(proof_stream)
    records = ex.run(max_cycles)
    info = {
        "global_clk": ex.global_clk,
        "exit_code": ex.exit_code,
        "public_values": bytes(ex.public_values_stream),
        "stdout": bytes(ex.stdout),
        "digest": list(ex.committed_value_digest),
        "hit_max_cycles": False,
    }
    return records, info


def stream_for_proving(program, stdin_bufs=(), shard_size: int = 1 << 20,
                       max_cycles: int | None = None):
    """Streaming twin of :func:`execute_for_proving`: returns an iterator of
    records for ``MipsMachine.prove_streaming`` (each yielded the moment its
    shard boundary is crossed; the native C executor when the guest allows).
    """
    def python_stream(skip: int = 0):
        ex = Executor(program, shard_size=shard_size)
        for buf in stdin_bufs:
            ex.write_stdin(buf)
        for i, r in enumerate(ex.run_stream(max_cycles)):
            if i >= skip:
                yield r

    native_ok = False
    try:
        from . import native_trace

        native_ok = native_trace.available()
    except Exception:
        pass
    if not native_ok:
        return python_stream()

    def hybrid():
        from .native import NativeUnsupported

        yielded = 0
        try:
            stream = native_trace.run_trace_stream(
                program, stdin=stdin_bufs, shard_size=shard_size,
                max_cycles=max_cycles if max_cycles is not None else 1 << 40,
            )
            for r in stream:
                yielded += 1
                yield r
            if stream.info["hit_max_cycles"]:
                raise ExecutionError(f"exceeded max_cycles {max_cycles}")
        except NativeUnsupported:
            # the guest needs the Python interpreter: re-execute and skip the
            # records already yielded (both executors are differentially
            # equal up to the unsupported syscall)
            yield from python_stream(skip=yielded)

    return hybrid()
