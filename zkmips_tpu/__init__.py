"""zkmips_tpu — a TPU-native zero-knowledge VM proving framework.

A from-scratch JAX/XLA/Pallas re-design of the Ziren/zkMIPS stack
(reference mounted at /root/reference): a MIPS32r2 zkVM proven with a
Plonky3-style small-field STARK (KoalaBear base field, quartic-extension
challenges, Poseidon2 Merkle/FRI, LogUp lookups, septic-curve global memory
consistency), with shard-parallel proving over TPU device meshes.

Layers (bottom-up, mirroring SURVEY.md §1):
  ops/       field + hash + NTT + Merkle + FRI kernels (jnp/Pallas)
  stark/     generic STARK machine: AIR builders, LogUp, prover, verifier
  executor/  MIPS32r2 emulator, ELF loader, syscalls, events
  models/    AIR chip machines (models/mips = the 49-chip core machine)
  parallel/  device-mesh sharding and host pipeline
  prover/    end-to-end orchestration (core -> compress -> shrink -> wrap)
  sdk/       ProverClient-style user API
"""

__version__ = "0.1.0"
