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


def _tune_allocator():
    """Keep large allocations on the reusable brk heap.

    glibc mmap()s every allocation above 128 KiB and munmap()s it on free,
    so every big numpy temp (trace matrices, LDE buffers, event columns)
    pays fresh page faults — measured at ~40 us/page inside the Firecracker
    VMs this runs on (5x end-to-end on allocation-heavy prover stages).
    Raising M_MMAP_THRESHOLD makes the heap arena absorb and reuse them.
    Opt out with ZKMIPS_NO_MALLOPT=1.
    """
    import os

    if os.environ.get("ZKMIPS_NO_MALLOPT"):
        return
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_MMAP_THRESHOLD, M_MMAP_MAX = -3, -4
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 30)
        libc.mallopt(M_MMAP_MAX, 0)
    except Exception:
        pass  # non-glibc platforms: default allocator behavior


_tune_allocator()
