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

from ..ops import bits, ext4, field as f, ntt, poseidon2 as p2, septic


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




def transcript_prefix_state(pv_canonical) -> np.ndarray:
    """Host transcript prefix for one shard: a fresh duplex challenger that
    has observed the shard's canonical public values, duplex-aligned (any
    pending absorbs are flushed with one permutation) so the in-kernel
    transcript can use pure absorb-overwrite steps.  Returns the (16,)
    Montgomery sponge state."""
    from ..stark.challenger import DuplexChallenger

    ch = DuplexChallenger()
    ch.observe_slice(np.asarray(pv_canonical, dtype=np.uint32))
    if ch.input_buffer:
        ch._duplexing()
    return ch.state.copy()


# sample_ext pops from the end of the refreshed output buffer, so the first
# ext4 challenge after a duplex is lanes [7,6,5,4], the second [3,2,1,0]
# (see stark/pcs._fold_chain_device, which uses the same identity).
_HI = np.array([7, 6, 5, 4])
_LO = np.array([3, 2, 1, 0])


def _local_commit_root(mat, xp):
    """Blowup-2 coset-LDE Merkle root of one matrix, column-replicated
    (the stage dispatch partitions over 'shard' only)."""
    lde = bits.bitrev_rows(ntt.coset_lde(mat, log_blowup=1))
    layer = p2.hash_matrix_rows(lde)
    n = layer.shape[0]
    while n > 1:
        layer = p2.compress(layer[0::2], layer[1::2])
        n //= 2
    return layer[0]


def make_multichip_step(mesh, chip=None, prep=None, batch_size: int = 2):
    """Real per-shard proving stage over a ('shard', 'col') mesh, with the
    Fiat-Shamir transcript running *inside* the kernel.

    Two dispatches:

    1. ``commit`` (shard_map over shard x col): per-shard blowup-2 coset-LDE
       Merkle commit -- column-local NTT, one all_gather over 'col' for row
       hashing -- plus the cross-shard septic-digest all_gather over 'shard'.
    2. ``stage`` (GSPMD over 'shard', vmapped per shard): a device-resident
       per-shard duplex challenger picks up from the host transcript prefix
       (vk/public-values observes) and drives the whole stage:
       observe(main root) -> sample (alpha, beta); LogUp permutation trace +
       local cumulative sum; perm commit; observe(perm root, cum) -> sample
       the constraint-folding challenge; full AIR quotient on the quotient
       domain (stark/quotient.quotient_chunks); quotient commit;
       observe(quotient root) -> sample (zeta, fri_alpha); claimed evals of
       the main trace at zeta + the reduced FRI input vector; and the FRI
       fold chain with one observe/sample per layer.  NO challenge is a
       compile-time constant -- every one is sampled from the in-kernel
       sponge, bit-identical to the host DuplexChallenger (cross-checked in
       tests/test_multichip.py against a host replay of the same protocol).

    Reference analog: the per-shard prover stages of
    crates/core/machine/src/utils/prove.rs:128-595 distributed over the
    worker pool; here the pool is the 'shard' mesh axis and the transcript
    itself is device-resident.

    step(traces, digests, pvs, states0) with
      traces  (S, H, W)  Montgomery main traces, sharded (shard, -, col)
      digests (S, 14)    per-shard septic global digests (Montgomery)
      pvs     (S, NPV)   per-shard canonical public values
      states0 (S, 16)    per-shard transcript prefix states
                         (``transcript_prefix_state``)
    returns a dict with per-shard main/perm/quotient roots, FRI fold-layer
    roots, final polys, LogUp cumulative sums, final sponge states, and the
    gathered septic digests (feed to ``septic_identity_host``).
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
        # 'shard' axis (the EC identity itself is host control-plane work --
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

    stage_fn = None
    sh_tr = NamedSharding(mesh, P("shard", None, None))
    sh_row = NamedSharding(mesh, P("shard", None))
    if chip is not None:
        from ..ops import merkle
        from ..stark import pcs, permutation, quotient
        from ..stark.domain import Domain

        prep_arr = None if prep is None else jnp.asarray(prep)

        def absorb8(state, digest):
            # observe an 8-felt digest: exactly one duplex with overwrite
            return p2.permute(jnp.concatenate([digest, state[8:]]))

        def stage_a(trace, root, pv_monty, state0):
            """perm trace + perm commit + quotient + quotient commit, with
            the in-kernel challenger from the main-root observe onward."""
            state = absorb8(state0, root)
            alpha, beta = state[_HI], state[_LO]
            flat, cum = permutation.generate_permutation_trace(
                chip, prep_arr, trace, alpha, beta, batch_size, xp=jnp
            )
            perm_root = _local_commit_root(flat, jnp)
            state = absorb8(state, perm_root)
            # observe the canonical cum (4 pending felts); the next sample
            # duplexes with those felts overwriting rate lanes 0..3
            state = p2.permute(jnp.concatenate([cum, state[4:]]))
            alpha_q = state[_HI]
            _doms, chunks = quotient.quotient_chunks(
                chip, trace, prep_arr, flat, pv_monty, [alpha, beta],
                cum, None, alpha_q, xp=jnp,
            )
            q_root = _local_commit_root(jnp.concatenate(chunks, axis=1), jnp)
            state = absorb8(state, q_root)
            return perm_root, q_root, cum, state

        def stage_b(trace, state):
            """open phase: claimed evals at zeta, the reduced FRI input, and
            the fold chain with one observe/sample per layer."""
            h, w = trace.shape
            log_h = h.bit_length() - 1
            log_max = log_h + 1  # blowup-2 LDE height
            zeta, fri_alpha = state[_HI], state[_LO]
            coeffs = ntt.ntt(trace, inverse=True)
            ys = pcs._eval_at_ext_point_body(coeffs, Domain(log_h, 1), zeta, jnp)
            apows = pcs._ext_powers(fri_alpha, w, jnp)
            lde = bits.bitrev_rows(ntt.coset_lde(trace, log_blowup=1))
            reduced = pcs._reduce_contrib_body(log_max, jnp)(lde, zeta, ys, apows)
            cur, fold_roots = reduced, []
            for lh in range(log_max, 1, -1):
                layer_mat = jnp.concatenate([cur[0::2], cur[1::2]], axis=1)
                layers = merkle.build_layers([layer_mat], jnp)
                r = layers[-1][0]
                fold_roots.append(r)
                state = absorb8(state, r)
                cur = pcs._fold_step_body(lh, False, jnp)(
                    cur, state[_HI], jnp.zeros((0, 4), jnp.uint32)
                )
            return jnp.stack(fold_roots), cur[0], state

        # two shard_mapped dispatches, NOT one fused GSPMD-sharded jit: the
        # sharding propagation / global optimization over the fused
        # perm+quotient+fold graph costs XLA CPU tens of minutes, while the
        # split bodies compile in about the sum of their parts.  shard_map
        # (manual partitioning) skips GSPMD propagation entirely; the
        # transcript state rides between the dispatches as a device array.
        def smap(fn, n_in):
            return jax.jit(
                jax.shard_map(
                    jax.vmap(fn),
                    mesh=mesh,
                    in_specs=tuple([P("shard", None, None)] + [P("shard", None)] * (n_in - 1)),
                    out_specs=P("shard", None),
                    check_vma=False,
                )
            )

        stage_a_fn = smap(stage_a, 4)
        stage_b_fn = smap(stage_b, 2)

        def stage_fn(traces, roots, pv_monty, states0):
            perm_roots, q_roots, cums, states = stage_a_fn(
                traces, roots, pv_monty, states0
            )
            fold_roots, finals, states = stage_b_fn(traces, states)
            return perm_roots, q_roots, fold_roots, finals, cums, states

    def step(traces, digests, pvs=None, states0=None):
        roots, all_digests = commit_fn(traces, digests)
        out = {"main_roots": roots, "all_digests": all_digests}
        if stage_fn is not None:
            s = traces.shape[0]
            if states0 is None:
                states0 = np.stack(
                    [transcript_prefix_state(np.zeros(1, dtype=np.uint32))] * s
                )
            if pvs is None:
                pvs = np.zeros((s, 1), dtype=np.uint32)
            pv_monty = f.to_monty(np.asarray(pvs, dtype=np.uint32))
            perm_roots, q_roots, fold_roots, finals, cums, states = stage_fn(
                jax.device_put(traces, sh_tr),
                jax.device_put(roots, sh_row),
                jax.device_put(jnp.asarray(pv_monty), sh_row),
                jax.device_put(jnp.asarray(np.asarray(states0)), sh_row),
            )
            out.update(
                perm_roots=perm_roots, quotient_roots=q_roots,
                fold_roots=fold_roots, final_polys=finals,
                cum_sums=cums, states=states,
            )
        return out

    return step


def host_stage_reference(chip, trace, pv, prep=None, batch_size: int = 2):
    """Host replay of ``make_multichip_step``'s per-shard protocol with the
    real DuplexChallenger and the numpy kernels; used to cross-check the
    in-kernel transcript bit-for-bit."""
    from ..ops import merkle
    from ..stark import pcs, permutation, quotient
    from ..stark.challenger import DuplexChallenger
    from ..stark.domain import Domain

    trace = np.asarray(trace, dtype=np.uint32)
    h, w = trace.shape
    log_h = h.bit_length() - 1
    log_max = log_h + 1

    ch = DuplexChallenger()
    ch.observe_slice(np.asarray(pv, dtype=np.uint32))
    if ch.input_buffer:
        ch._duplexing()

    root = np.asarray(commit_root(trace))
    ch.observe_digest(root)
    alpha, beta = ch.sample_ext(), ch.sample_ext()
    flat, cum = permutation.generate_permutation_trace(
        chip, prep, trace, alpha, beta, batch_size, xp=np
    )
    cum = np.asarray(cum)
    perm_root = np.asarray(_local_commit_root(np.asarray(flat), np))
    ch.observe_digest(perm_root)
    ch.observe_slice(ext4.to_canonical(cum))
    alpha_q = ch.sample_ext()
    pv_monty = f.to_monty(np.asarray(pv, dtype=np.uint32))
    _doms, chunks = quotient.quotient_chunks(
        chip, trace, prep, flat, pv_monty, [alpha, beta], cum, None, alpha_q,
        xp=np,
    )
    q_root = np.asarray(_local_commit_root(np.concatenate(chunks, axis=1), np))
    ch.observe_digest(q_root)
    zeta, fri_alpha = ch.sample_ext(), ch.sample_ext()

    coeffs = ntt.ntt(trace, inverse=True)
    ys = pcs._eval_at_ext_point_body(coeffs, Domain(log_h, 1), zeta, np)
    apows = pcs._ext_powers(fri_alpha, w, np)
    lde = bits.bitrev_rows(ntt.coset_lde(trace, log_blowup=1))
    reduced = pcs._reduce_contrib_body(log_max, np)(lde, zeta, np.asarray(ys), apows)

    cur, fold_roots = reduced, []
    for lh in range(log_max, 1, -1):
        layer_mat = np.concatenate([cur[0::2], cur[1::2]], axis=1)
        layers = merkle.build_layers([layer_mat], np)
        r = layers[-1][0]
        fold_roots.append(np.asarray(r))
        ch.observe_digest(r)
        b = ch.sample_ext()
        cur = pcs._fold_step_body(lh, False, np)(cur, b, np.zeros((0, 4), np.uint32))
    return {
        "main_root": root, "perm_root": perm_root, "quotient_root": q_root,
        "fold_roots": np.stack(fold_roots), "final_poly": np.asarray(cur[0]),
        "cum_sum": cum,
        "challenges": {"alpha": alpha, "beta": beta, "alpha_q": alpha_q,
                       "zeta": zeta, "fri_alpha": fri_alpha},
    }
