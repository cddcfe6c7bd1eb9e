"""Low-level TPU compute kernels: field arithmetic, hashes, NTT, Merkle, FRI."""
