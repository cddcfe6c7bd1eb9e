"""Recursion stack: the second, purpose-built VM that verifies shard proofs.

Round-1 scope (analog of crates/recursion/core + compiler): the straight-line
recursion VM (field/extension ALU, Poseidon2, select, exp-reverse-bits,
hints, public values), the DSL builder that compiles variable programs to
flat-memory instructions with read-multiplicity accounting, and a recursion
STARK machine over the generic stark layer.  The in-DSL shard verifier
programs (core/compress/root/wrap) land next round.
"""

from .builder import Builder
from .machine import RecursionMachine
from .program import RecursionProgram
from .runtime import RecursionRuntime

__all__ = ["Builder", "RecursionMachine", "RecursionProgram", "RecursionRuntime"]
