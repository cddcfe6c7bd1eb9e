"""JIT-compiled device kernels for the hot prover stages.

The prover's device-side work per shard is: coset LDE (NTT stages — pure
elementwise butterflies, XLA-fused), Poseidon2 leaf hashing (490 fused VPU
modmuls over all rows at once), and the Merkle tree reduction (log H
compress layers).  Everything here is shape-static and jit-safe; the same
code paths run under numpy for host-side tests (ops are backend-agnostic).

Multi-chip: shards ride a data-parallel mesh axis ("shard"); trace columns
ride a tensor-parallel axis ("col") — the NTT is column-independent so the
LDE needs no communication, and only the row hash gathers columns (one
all_gather over the ICI ring per commit).
"""

from __future__ import annotations

import numpy as np

from ..ops import bits, field as f, ntt, poseidon2 as p2


def commit_root(trace):
    """(H, W) Montgomery trace -> (8,) Merkle root of the blowup-2 LDE."""
    lde = bits.bitrev_rows(ntt.coset_lde(trace, log_blowup=1))
    layer = p2.hash_matrix_rows(lde)
    n = layer.shape[0]
    while n > 1:
        layer = p2.compress(layer[0::2], layer[1::2])
        n //= 2
    return layer[0]


def multi_shard_commit_step(traces):
    """(S, H, W) -> (S, 8) per-shard commit roots + (8,) checksum.

    The body of the sharded proving step: used under shard_map with S on the
    'shard' (dp) mesh axis and W on the 'col' (tp) mesh axis.
    """
    import jax
    import jax.numpy as jnp

    def one(trace):
        # columns are sharded: LDE locally, gather columns for row hashing
        lde = bits.bitrev_rows(ntt.coset_lde(trace, log_blowup=1))
        full = jax.lax.all_gather(lde, "col", axis=1, tiled=True)
        layer = p2.hash_matrix_rows(full)
        n = layer.shape[0]
        while n > 1:
            layer = p2.compress(layer[0::2], layer[1::2])
            n //= 2
        return layer[0]

    roots = jax.vmap(one)(traces)
    # cross-shard checksum collective (rides both mesh axes so the result is
    # provably replicated; the col-axis copies are identical post-gather)
    local = bits.sum_mod(roots, axis=0)
    # u32 wraparound checksum (deterministic; a real digest sum would ride
    # the septic-curve accumulation instead)
    total = jax.lax.psum(local, ("shard", "col"))
    return roots, total


def make_multichip_step(mesh):
    """shard_map(multi_shard_commit_step) over a Mesh with (shard, col) axes."""
    import jax
    from jax.sharding import PartitionSpec as P

    return jax.jit(
        jax.shard_map(
            multi_shard_commit_step,
            mesh=mesh,
            in_specs=P("shard", None, "col"),
            out_specs=(P("shard", None), P()),
            # roots are replicated across 'col' after the all_gather, but the
            # static varying-axes analysis can't see that
            check_vma=False,
        )
    )
