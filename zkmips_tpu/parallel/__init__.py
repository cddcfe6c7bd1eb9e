"""Device-mesh parallel kernels: sharded commit/NTT/Merkle steps (jnp/pjit)."""
