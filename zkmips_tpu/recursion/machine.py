"""Recursion STARK machine: prove/verify recursion VM executions.

Analog of RecursionAir machines (crates/recursion/core/src/machine.rs:39-153)
assembled over the generic stark layer; each recursion program gets its own
preprocessed commitment (pk/vk), like the reference's per-shape program
caches (crates/prover/src/lib.rs:366-438).
"""

from __future__ import annotations

import numpy as np

from ..stark.chip import Chip
from ..stark.machine import StarkConfig, StarkMachine
from .chips import (
    RecBaseAluAir,
    RecExtAluAir,
    RecMemConstAir,
    RecMemVarAir,
    RecPoseidon2Air,
    RecBatchFRIAir,
    RecExpReverseBitsAir,
    RecFriFoldAir,
    RecPublicValuesAir,
    RecSelectAir,
)
from .runtime import RecursionRuntime

NUM_PV = 8


class RecursionMachine:
    def __init__(self, config: StarkConfig | None = None, num_pv: int = NUM_PV):
        self.num_pv = num_pv
        self.airs = [
            RecMemConstAir(), RecMemVarAir(), RecBaseAluAir(), RecExtAluAir(),
            RecPoseidon2Air(), RecSelectAir(), RecFriFoldAir(), RecBatchFRIAir(),
            RecExpReverseBitsAir(), RecPublicValuesAir(num_pv),
        ]
        chips = [Chip(a, num_public_values=num_pv) for a in self.airs]
        self.machine = StarkMachine(config or StarkConfig.core(), chips, num_public_values=num_pv)

    def setup(self, program):
        return self.machine.setup(program)

    def execute(self, program, witness=()):
        """Run the recursion program: native C interpreter when available
        (csrc/recursion_runtime.c, ~50x the Python loop — Poseidon2 permutes
        dominate), Python fallback otherwise."""
        try:
            from . import native_runtime

            if native_runtime.available():
                return native_runtime.run(program, witness)
        except AssertionError:
            raise  # circuit assert failures are real errors, not fallbacks
        except Exception:
            pass
        return RecursionRuntime(program, witness).run()

    def prove(self, pk, record, xp=np):
        pvs = list(record.public_values)
        pvs += [0] * (self.num_pv - len(pvs))
        pv = np.array(pvs[: self.num_pv], dtype=np.uint32)
        return self.machine.prove_shard(pk, record, pv, xp=xp)

    def verify(self, vk, proof) -> bool:
        return self.machine.verify_shard(vk, proof)
