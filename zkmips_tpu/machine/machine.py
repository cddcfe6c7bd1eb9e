"""MIPS core machine assembly: chip set, shard orchestration, verification.

The analog of MipsAir::machine() + prove/verify plumbing (reference:
crates/core/machine/src/mips/mod.rs:77-206, utils/prove.rs:128,
crates/prover/src/verify.rs:56): execute -> records -> per-shard proofs,
then shard-chain public-value checks and the cross-shard septic digest sum.
"""

from __future__ import annotations

import numpy as np

from ..executor import Executor
from ..executor.events import ExecutionRecord
from ..ops import field as ff, septic
from ..stark import air
from ..stark.chip import Chip
from ..stark.machine import StarkConfig, StarkMachine, VerificationError
from .alu import AddSubAir, BitwiseAir, LtAir
from .branch import BranchAir
from .jump import JumpAir
from .shift import ShiftLeftAir, ShiftRightAir
from .byte import ByteAir
from .cpu import CpuAir
from .global_chip import START, GlobalAir
from .memory_bridge import MemoryGlobalFinalizeAir, MemoryGlobalInitAir, MemoryLocalAir
from .program import ProgramAir
from .pv import NUM_PV, PV_EXIT_CODE, PV_NEXT_PC, PV_SHARD, PV_START_PC, PV_DIGEST
from .syscall_instr import SyscallInstrAir


def core_chip_airs() -> list:
    """Chip list; byte-lookup producers must precede the Byte chip."""
    from .branch import BranchAir
    from .jump import JumpAir
    from .shift import ShiftLeftAir, ShiftRightAir
    from .mul import MulAir
    from .divrem import DivRemAir
    from .cloclz import CloClzAir
    from .memory_instr import MemoryInstrAir
    from .misc import MiscInstrAir, MovCondAir
    from .sha_extend import ShaExtendAir
    from .sha_compress import ShaCompressAir
    from .poseidon2_chip import Poseidon2ChipAir
    from .keccak_chip import KeccakSpongeAir
    from .precompiles_ec import ec_precompile_airs
    from .syscall_chip import SyscallCoreAir, SyscallPrecompileAir
    from .sys_linux import SysLinuxAir

    return [
        CpuAir(),
        AddSubAir(),
        BitwiseAir(),
        LtAir(),
        ShiftLeftAir(),
        ShiftRightAir(),
        MulAir(),
        DivRemAir(),
        CloClzAir(),
        BranchAir(),
        JumpAir(),
        MemoryInstrAir(),
        MiscInstrAir(),
        MovCondAir(),
        SyscallInstrAir(),
        SyscallCoreAir(),
        SyscallPrecompileAir(),
        ShaExtendAir(),
        ShaCompressAir(),
        Poseidon2ChipAir(),
        KeccakSpongeAir(),
        SysLinuxAir(),
        *ec_precompile_airs(),
        MemoryLocalAir(),
        MemoryGlobalInitAir(),
        MemoryGlobalFinalizeAir(),
        GlobalAir(),
        ProgramAir(),
        ByteAir(),
    ]


class MipsMachine:
    def __init__(self, config: StarkConfig | None = None, chip_airs=None, use_shapes: bool = False):
        airs = chip_airs if chip_airs is not None else core_chip_airs()
        self.airs = airs
        chips = [Chip(a, num_public_values=NUM_PV) for a in airs]
        shape_config = None
        if use_shapes:
            from .shapes import ShapeConfig

            shape_config = ShapeConfig()
        self.machine = StarkMachine(
            config or StarkConfig.core(), chips, num_public_values=NUM_PV, shape_config=shape_config
        )

    def setup(self, program):
        return self.machine.setup(program)

    # ------------------------------------------------------------------ prove

    def generate_dependencies(self, record: ExecutionRecord):
        """Append derived events (nested ALU, global lookups) exactly once:
        repeated proves of the same record must not inflate trace heights."""
        if getattr(record, "_deps_done", False):
            return
        for a in self.airs:
            a.generate_dependencies(record, None)
        record._deps_done = True

    def shard_public_values(self, record: ExecutionRecord, executor: Executor | None = None) -> np.ndarray:
        pv = np.zeros(NUM_PV, dtype=np.uint32)
        events = record.cpu_events
        pv[PV_SHARD] = record.shard
        pv[PV_START_PC] = events[0].pc if events else 0
        pv[PV_NEXT_PC] = events[-1].next_pc if events else 0
        pv[PV_EXIT_CODE] = record.public_values.exit_code
        for i, word in enumerate(record.public_values.committed_value_digest[:8]):
            pv[PV_DIGEST + 2 * i] = word & 0xFFFF
            pv[PV_DIGEST + 2 * i + 1] = (word >> 16) & 0xFFFF
        return pv

    def prove_record(self, pk, record: ExecutionRecord, xp=np):
        self.generate_dependencies(record)
        # trace generation repopulates the byte-lookup arrays; reset so a
        # re-prove of the same record sees identical multiplicities
        record.byte_lookups.pop("arrays", None)
        pv = self.shard_public_values(record)
        return self.machine.prove_shard(pk, record, pv, xp=xp)

    def split_deferred(self, records: list, split_threshold: int | None = None) -> list:
        """Carve large precompile event families into standalone deferred
        shards (reference record.rs:130 split + prove.rs deferred handling):
        deferred records are appended after the final execution shard with
        continuing shard numbers; cross-shard syscall/memory consistency rides
        the Global septic-curve argument (see machine/syscall_chip.py)."""
        if split_threshold is None:
            from ..utils.opts import ZKMCoreOpts

            split_threshold = ZKMCoreOpts.default().split_threshold
        deferred = []
        for r in records:
            deferred.extend(r.split(False, split_threshold))
        for j, d in enumerate(deferred):
            d.shard = len(records) + 1 + j
            d.public_values.shard = d.shard
        return records + deferred

    def prove(self, pk, records: list, device: bool = False, workers: int | None = None) -> list:
        """Prove all shards; ``workers`` > 1 pipelines shards across threads
        (the analog of the reference's trace-gen/prove worker pool,
        crates/core/machine/src/utils/prove.rs:157-520 — numpy/XLA release
        the GIL, so host trace generation overlaps device proving)."""
        records = self.split_deferred(records)
        xp = np
        if device:
            import jax.numpy as jnp

            xp = jnp
        if workers is None:
            from ..utils.opts import ZKMCoreOpts

            workers = ZKMCoreOpts.default().trace_gen_workers if len(records) > 1 else 1
        if workers <= 1 or len(records) <= 1:
            return [self.prove_record(pk, r, xp=xp) for r in records]
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=workers) as pool:
            futs = [pool.submit(self.prove_record, pk, r, xp) for r in records]
            return [f.result() for f in futs]

    # ----------------------------------------------------------------- verify

    def verify(self, vk, proofs: list, program) -> bool:
        """Shard proofs + cross-shard chain + global septic digest sum."""
        if not proofs:
            raise VerificationError("no shard proofs")
        for proof in proofs:
            self.machine.verify_shard(vk, proof)

        # shard chaining (reference verify.rs:62-290 subset); shards without
        # a Cpu chip (deferred precompile shards) must pass the pc through
        # unchanged (verify.rs: contains_cpu => start_pc == next_pc rule)
        prev_next_pc = None
        for i, proof in enumerate(proofs):
            pv = proof.public_values
            has_cpu = "Cpu" in proof.chip_names
            if i == 0 and not has_cpu:
                raise VerificationError("first shard has no Cpu chip")
            if int(pv[PV_SHARD]) != i + 1:
                raise VerificationError(f"shard index mismatch at proof {i}")
            if i == 0 and int(pv[PV_START_PC]) != program.pc_start:
                raise VerificationError("first shard does not start at pc_start")
            if prev_next_pc is not None and int(pv[PV_START_PC]) != prev_next_pc:
                raise VerificationError(f"pc chain broken at shard {i + 1}")
            if not has_cpu and int(pv[PV_START_PC]) != int(pv[PV_NEXT_PC]):
                raise VerificationError(f"cpu-less shard {i + 1} changes pc")
            prev_next_pc = int(pv[PV_NEXT_PC])
        if prev_next_pc != 0:
            raise VerificationError("final shard does not halt (next_pc != 0)")

        # global septic digest sum: sum over shards of (digest - START) == identity
        total = None  # None = point at infinity
        for proof in proofs:
            digest = self._proof_global_digest(proof)
            total = _complete_add(total, digest)
            total = _complete_add(total, _neg_point(_start_point()))
        if total is not None:
            raise VerificationError("global memory digest does not sum to zero")
        return True

    def _proof_global_digest(self, proof):
        for name, ov in zip(proof.chip_names, proof.opened):
            if name == "Global":
                gs = [int(v) for v in ov.global_sum]
                return (gs[:7], gs[7:])
        raise VerificationError("proof missing Global chip")


def _start_point():
    return ([int(c) for c in START[0]], [int(c) for c in START[1]])


def _neg_point(p):
    x, y = p
    return (list(x), [(ff.P - c) % ff.P for c in y])


def _complete_add(p1, p2):
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2:
        if y1 == y2:
            raise VerificationError("unexpected septic point doubling in digest sum")
        return None
    return septic.curve_add_int(p1, p2)


def mips_machine(config: StarkConfig | None = None, minimal: bool = False) -> MipsMachine:
    if minimal:
        # every opcode the mini-assembler's li/branch helpers emit must have a
        # receiving chip: Cpu dispatches unconditionally
        airs = [
            CpuAir(), AddSubAir(), BitwiseAir(), LtAir(), ShiftLeftAir(),
            ShiftRightAir(), BranchAir(), JumpAir(), SyscallInstrAir(),
            MemoryLocalAir(), MemoryGlobalInitAir(), MemoryGlobalFinalizeAir(),
            GlobalAir(), ProgramAir(), ByteAir(),
        ]
        return MipsMachine(config, chip_airs=airs)
    return MipsMachine(config)


def prove_program(program, stdin=(), config: StarkConfig | None = None, machine: MipsMachine | None = None, shard_size: int = 1 << 20):
    m = machine or MipsMachine(config)
    ex = Executor(program, shard_size=shard_size)
    for d in stdin:
        ex.write_stdin(d)
    records = ex.run()
    pk = m.setup(program)
    proofs = m.prove(pk, records)
    return m, pk, proofs, ex


def verify_program(m: MipsMachine, vk, proofs, program) -> bool:
    return m.verify(vk, proofs, program)
