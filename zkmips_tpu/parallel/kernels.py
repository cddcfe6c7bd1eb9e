"""Multi-chip mesh kernels for the prover's shard-parallel stages.

The proving workload is shard-parallel (each execution shard's STARK is
independent until the host-side transcript chain), so the natural TPU
mapping is a ('shard', 'col') device mesh:

* 'shard' — data-parallel over execution shards (reference analog: the
  worker pool in crates/core/machine/src/utils/prove.rs:157-520);
* 'col'  — tensor-parallel over trace columns inside one shard's commit:
  the LDE's NTT runs along rows independently per column, so column shards
  need no communication; only Poseidon2 row hashing gathers columns (one
  all_gather over the ICI ring per commit).

``make_multichip_step`` builds the real per-shard proving stage over real
chip traces: LogUp permutation trace + local cumulative sum (the same
``permutation.generate_permutation_trace`` the single-chip prover uses),
coset-LDE Merkle commits of the main and permutation matrices, and the
cross-shard septic-curve digest identity (machine/machine.py verify's
global-sum check) evaluated on-mesh with real curve arithmetic.

Full shard proofs on a mesh go through ``MipsMachine.prove(devices=...)``,
which pins each shard's stage kernels to a device (tests/test_multichip.py
proves a real multi-shard program on the virtual 8-device CPU mesh and
verifies with the unchanged verifier).
"""

from __future__ import annotations

import numpy as np

from ..ops import bits, field as f, ntt, poseidon2 as p2, septic


def commit_root(trace):
    """(H, W) Montgomery trace -> (8,) Merkle root of the blowup-2 LDE."""
    lde = bits.bitrev_rows(ntt.coset_lde(trace, log_blowup=1))
    layer = p2.hash_matrix_rows(lde)
    n = layer.shape[0]
    while n > 1:
        layer = p2.compress(layer[0::2], layer[1::2])
        n //= 2
    return layer[0]


def septic_identity_host(all_digests) -> bool:
    """Cross-shard septic digest identity on the gathered digests:
    T = sum of per-shard digests must equal U = n_shards * START
    (equivalent to the verifier's sum(digest_i - START) == infinity,
    machine/machine.py verify).  The chain is O(n_shards) sequential
    14-word curve adds — host control-plane work by design: putting a
    serial EC ladder on the device would serialize the mesh for microseconds
    of scalar math (the collective that gathers the digests is the device
    part)."""
    d = np.asarray(all_digests)
    n = d.shape[0]
    xs, ys = d[:, :7], d[:, 7:]
    ax, ay = xs[0].copy(), ys[0].copy()
    for i in range(1, n):
        ax, ay = septic.curve_add(ax, ay, xs[i], ys[i])
    sx, sy = septic.START_X, septic.START_Y
    if n == 1:
        return bool(np.array_equal(ax, sx) and np.array_equal(ay, sy))
    ux, uy = septic.curve_double(sx, sy)  # 2*START (the only equal-point add)
    for _ in range(n - 2):
        ux, uy = septic.curve_add(ux, uy, sx, sy)
    return bool(np.array_equal(ax, ux) and np.array_equal(ay, uy))


def make_multichip_step(mesh, chip=None, prep=None, batch_size: int = 2,
                        alpha=None, beta=None):
    """shard_map'd real proving stage over a ('shard', 'col') mesh.

    step(traces, digests) with
      traces  (S, H, W) Montgomery main traces, sharded (shard, -, col)
      digests (S, 14)   per-shard septic global digests (Montgomery),
                        sharded (shard, -)
      alpha, beta: (4,) LogUp challenges baked into the compiled stage as
      constants (transcript challenges are sampled before the perm stage, so
      the stage kernel is built after they are known; constant challenges
      also let XLA fold the per-lookup fingerprint algebra)
    returns (main_roots (S, 8), cum_sums (S, 4), all_digests (S, 14))
      main_roots:  per-shard Merkle roots of the blowup-2 LDE commit
      cum_sums:    per-shard LogUp local cumulative sums (real permutation
                   trace generation when ``chip`` is given, else zeros)
      all_digests: the septic digests gathered over the 'shard' axis (the
                   cross-shard collective); feed to ``septic_identity_host``
                   for the verifier's EC identity
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    def commit_step(traces, digests):
        def commit_one(trace):
            # columns are sharded: LDE locally, gather columns for row hashing
            lde = bits.bitrev_rows(ntt.coset_lde(trace, log_blowup=1))
            full = jax.lax.all_gather(lde, "col", axis=1, tiled=True)
            layer = p2.hash_matrix_rows(full)
            n = layer.shape[0]
            while n > 1:
                layer = p2.compress(layer[0::2], layer[1::2])
                n //= 2
            return layer[0]

        main_roots = jax.vmap(commit_one)(traces)
        # cross-shard collective: gather every shard's septic digest over the
        # 'shard' axis (the EC identity itself is host control-plane work —
        # see septic_identity_host)
        all_digests = jax.lax.all_gather(digests, "shard", axis=0, tiled=True)
        return main_roots, all_digests

    commit_fn = jax.jit(
        jax.shard_map(
            commit_step,
            mesh=mesh,
            in_specs=(P("shard", None, "col"), P("shard", None)),
            out_specs=(P("shard", None), P(None, None)),
            # roots and the gathered digests are replicated across 'col' /
            # 'shard' after the gathers, but the static varying-axes analysis
            # can't see that
            check_vma=False,
        )
    )

    perm_fn = None
    if chip is not None:
        from ..stark import permutation

        assert alpha is not None and beta is not None
        a_const = np.asarray(alpha, dtype=np.uint32)
        b_const = np.asarray(beta, dtype=np.uint32)
        # per-shard LogUp trace generation partitions over 'shard' with no
        # communication: express it as shardings on a vmapped kernel and let
        # the GSPMD partitioner place it (manual shard_map is unnecessary —
        # there are no collectives to schedule)
        sh_in = NamedSharding(mesh, P("shard", None, None))
        sh_out = NamedSharding(mesh, P("shard", None))

        def perm_one(t):
            _flat, cum = permutation.generate_permutation_trace(
                chip, prep, t, a_const, b_const, batch_size, xp=jnp
            )
            return cum

        perm_fn = jax.jit(
            jax.vmap(perm_one), in_shardings=sh_in, out_shardings=sh_out
        )
        sh_in_sharding = sh_in

    def step(traces, digests):
        roots, all_digests = commit_fn(traces, digests)
        if perm_fn is not None:
            cums = perm_fn(jax.device_put(traces, sh_in_sharding))
        else:
            cums = jnp.zeros((traces.shape[0], 4), dtype=jnp.uint32)
        return roots, cums, all_digests

    return step
