"""Public values layout for the MIPS core machine.

Round-1 subset of the reference's PublicValues (crates/stark/src/air/
public_values.rs:11-56): shard id, pc chaining endpoints, exit code, and the
committed-value digest as 8 u32 words in 16-bit limbs.
"""

PV_SHARD = 0
PV_START_PC = 1
PV_NEXT_PC = 2
PV_EXIT_CODE = 3
PV_DIGEST = 4  # 16 limbs: word i -> limbs (4 + 2i, 4 + 2i + 1)
NUM_PV = 20
