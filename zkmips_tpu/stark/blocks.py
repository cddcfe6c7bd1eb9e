"""Block-stationary device kernels for the per-chip DAG stages.

The constraint-DAG stages (LogUp permutation trace, quotient evaluation)
compile to large XLA programs — O(100s) of compile time per chip.  Jitting
them over full-height arrays keys every compile on the trace height, so a
workload with shards at several heights pays the DAG compile once *per
height* (and once more per height for every program shape).

Instead, the DAG kernels here take fixed-size row blocks (B = 2^16 rows):
the expensive compile happens once per chip EVER (persisted by the XLA
compilation cache), and any trace height dispatches the same executable
H/B times.  Height-dependent work is confined to trivially-compiled
split/assemble kernels (static slices, concats, a log-depth prefix scan).

The reference has no analog (rayon threads re-run scalar Rust row loops);
this is the TPU-native answer to its "trace areas change per shard" problem
(reference shapes system: crates/core/machine/src/shape/mod.rs).
"""

from __future__ import annotations

import os

import numpy as np

from ..ops import ext4, field as f
from . import air
from .air import EvalContext, Selector, fold_constraints
from .domain import Domain
from .jit_util import cached_jit

BLOCK_ROWS = int(os.environ.get("ZKMIPS_BLOCK_ROWS", str(1 << 16)))


def _block_size(h: int) -> int:
    return BLOCK_ROWS


# ---------------------------------------------------------------------------
# split / assemble helpers (trivial compiles, keyed per height)
# ---------------------------------------------------------------------------


def split_rows(arr, b: int, roll_step: int, xp, tag: str):
    """(H, w) -> tuple of (B, w) blocks; roll_step > 0 additionally returns
    the blocks of roll(arr, -roll_step) (for next-row constraint access).

    Heights below the block size are zero-padded up to it (after the roll),
    so every height shares one stationary block kernel; assemble truncates.
    Padding rows produce zero lookup fractions (zero multiplicities) and
    truncated-away quotient rows."""
    h, w = arr.shape
    nb = max(h // b, 1)

    def make():
        def fn(x):
            if h < b:
                pad = xp.zeros((b - h, w), dtype=np.uint32)
                outs = [xp.concatenate([x, pad], axis=0)]
                if roll_step:
                    r = xp.roll(x, -roll_step, axis=0)
                    outs.append(xp.concatenate([r, pad], axis=0))
                return outs
            outs = [x[i * b : (i + 1) * b] for i in range(nb)]
            if roll_step:
                r = xp.roll(x, -roll_step, axis=0)
                outs += [r[i * b : (i + 1) * b] for i in range(nb)]
            return outs

        return fn

    fn = cached_jit(f"blk_split_{tag}", (h, w, b, roll_step), make)
    outs = fn(arr)
    if roll_step:
        return outs[:nb], outs[nb:]
    return outs, None


def _assemble_perm(cols_blocks, sum_blocks, real_h: int, xp):
    """Blocks of batch columns + row sums -> (perm_flat (H, 4W), cumsum (4,))."""
    nb = len(cols_blocks)
    b, wc = cols_blocks[0].shape

    def make():
        def fn(cols, sums):
            flat_cols = xp.concatenate(cols, axis=0)[:real_h]  # (H, wc)
            row_sum = xp.concatenate(sums, axis=0)[:real_h]  # (H, 4)
            phi = row_sum
            shift = 1
            while shift < real_h:
                shifted = xp.concatenate(
                    [xp.zeros((shift, 4), dtype=np.uint32), phi[:-shift]], axis=0
                )
                phi = f.add(phi, shifted)
                shift *= 2
            return xp.concatenate([flat_cols, phi], axis=1), phi[-1]

        return fn

    fn = cached_jit("blk_perm_asm", (nb, b, wc, real_h), make)
    return fn(list(cols_blocks), list(sum_blocks))


def _assemble_quotient(q_blocks, step: int, real_h: int, xp):
    """Blocks of (B, 4) qvals -> ``step`` stride-interleaved chunk matrices."""
    nb = len(q_blocks)
    b = q_blocks[0].shape[0]

    def make():
        def fn(blocks):
            qv = xp.concatenate(blocks, axis=0)[:real_h]
            return [qv[i::step] for i in range(step)]

        return fn

    fn = cached_jit("blk_q_asm", (nb, b, step, real_h), make)
    return fn(list(q_blocks))


# ---------------------------------------------------------------------------
# permutation trace, blocked
# ---------------------------------------------------------------------------


def perm_trace_blocked(chip, prep, main, alpha, beta, batch_size, xp, prep_key=None):
    """Device analog of permutation.generate_permutation_trace with the
    row-local fraction DAG compiled once per (chip, block) — see module doc."""
    from . import permutation

    sends, receives = permutation.local_lookups(chip)
    n = len(sends) + len(receives)
    h = main.shape[0]
    if n == 0:
        return xp.zeros((h, 0), dtype=np.uint32), ext4.ZERO.astype(np.uint32)
    b = _block_size(h)

    main_blocks, _ = split_rows(main, b, 0, xp, "main")
    prep_blocks = [None] * len(main_blocks)
    if prep is not None:
        prep_blocks, _ = split_rows(xp.asarray(prep), b, 0, xp, "prep")

    def make():
        def fn(main_blk, prep_blk, a, bt):
            cols_sum = permutation.generate_permutation_trace(
                chip, prep_blk, main_blk, a, bt, batch_size, xp=xp, _row_local=True
            )
            return cols_sum

        return fn

    has_prep = prep is not None
    fn = cached_jit("blk_perm", (chip.name, b, batch_size, has_prep, prep_key), make)
    cols_blocks, sum_blocks = [], []
    for mb, pb in zip(main_blocks, prep_blocks):
        cols, rsum = fn(mb, pb if has_prep else xp.zeros((b, 0), np.uint32), alpha, beta)
        cols_blocks.append(cols)
        sum_blocks.append(rsum)
    return _assemble_perm(cols_blocks, sum_blocks, h, xp)


# ---------------------------------------------------------------------------
# quotient, blocked
# ---------------------------------------------------------------------------


def quotient_chunks_blocked(
    chip, main_monty, prep_monty, perm_flat, publics_monty, challenges,
    cum_sum, global_sum, alpha, xp,
    main_coeffs=None, perm_coeffs=None, prep_coeffs=None,
):
    """Device analog of quotient.quotient_chunks; the constraint fold runs on
    row blocks of the quotient coset with selectors sliced per block.

    ``*_coeffs``: iNTT coefficient matrices already computed by the commit
    stage (ProverData.coeffs) — passing them halves the quotient-LDE NTT
    work (the inverse transforms are skipped)."""
    from . import quotient as qmod

    h, _w = main_monty.shape
    log_h = h.bit_length() - 1
    lqd = chip.log_quotient_degree
    step = 1 << lqd
    big_h = h << lqd
    b = _block_size(big_h)

    main_q = _lde_dev(main_monty, log_h, lqd, xp, "main", coeffs=main_coeffs)
    prep_q = (
        _lde_dev(xp.asarray(prep_monty), log_h, lqd, xp, "prep", coeffs=prep_coeffs)
        if prep_monty is not None else None
    )
    perm_q = (
        _lde_dev(perm_flat, log_h, lqd, xp, "perm", coeffs=perm_coeffs)
        if perm_flat.shape[1] else None
    )

    sels = _selectors_dev(log_h, lqd, xp)
    sel_blocks, _ = split_rows(sels, b, 0, xp, "sel")

    # next-row access: instead of materializing a full rolled copy of every
    # quotient-coset LDE (split_rows roll_step doubles the footprint — two
    # big chips' worth peaked ~5.6 GB per 2^20-cycle shard), each block
    # kernel receives the NEXT block's first ``step`` rows and assembles the
    # shifted view in-kernel (a fused slice+concat).  The roll is circular
    # over the full height, so block i's successor head is block (i+1) % nb.
    mb, _ = split_rows(main_q, b, 0, xp, "mainq")
    main_q = None  # blocks carry the data; free the contiguous copy
    pb = None
    if prep_q is not None:
        pb, _ = split_rows(prep_q, b, 0, xp, "prepq")
        prep_q = None
    eb = None
    if perm_q is not None:
        eb, _ = split_rows(perm_q, b, 0, xp, "permq")
        perm_q = None

    has_prep, has_perm, has_g = pb is not None, eb is not None, global_sum is not None

    def _head(blocks, i):
        """First ``step`` rows of block i's circular successor."""
        fn = cached_jit(
            "blk_head", (blocks[0].shape, step),
            lambda: lambda x: x[:step],
        )
        return fn(blocks[(i + 1) % len(blocks)])

    # rows of real (non-padding) data per block: split_rows zero-pads a
    # below-block-size height up to b, so the circular shift must wrap at
    # real_h (T(g·x) wraps with the coset's order big_h, not the pad size)
    real_h = min(big_h, b)
    pad_tail = b - real_h

    def make():
        def shifted(x, xh):
            parts = [x[step:real_h], xh]
            if pad_tail:
                parts.append(xp.zeros((pad_tail, x.shape[1]), dtype=np.uint32))
            return xp.concatenate(parts, axis=0)

        def fn(m, mh, p, ph, e, eh, sel, pubs, ch0, ch1, cum, g, al):
            mr = shifted(m, mh)
            pr = shifted(p, ph) if has_prep else p
            er = shifted(e, eh) if has_perm else e

            def var_fn(segment, col, offset):
                if segment == air.MAIN:
                    return (m if offset == 0 else mr)[:, col]
                if segment == air.PREPROCESSED:
                    return (p if offset == 0 else pr)[:, col]
                if segment == air.PERM:
                    return (e if offset == 0 else er)[:, 4 * col : 4 * col + 4]
                raise ValueError(segment)

            ctx = EvalContext(
                var_fn,
                selectors={
                    Selector.FIRST: sel[:, 0],
                    Selector.LAST: sel[:, 1],
                    Selector.TRANSITION: sel[:, 2],
                },
                publics=pubs,
                challenges=[ch0, ch1],
                cum_sum=cum,
                global_sum=g if has_g else None,
                xp=xp,
            )
            folded = fold_constraints(chip.constraints, al, ctx)
            return f.mul(folded, sel[:, 3][:, None])

        return fn

    fn = cached_jit(
        "blk_quot", (chip.name, b, real_h, step, has_prep, has_perm, has_g), make
    )
    z = xp.zeros((b, 0), np.uint32)
    zh = xp.zeros((step, 0), np.uint32)
    g_in = global_sum if has_g else np.zeros(14, dtype=np.uint32)
    q_blocks = []
    for i in range(max(big_h // b, 1)):
        q_blocks.append(
            fn(
                mb[i], _head(mb, i),
                pb[i] if has_prep else z, _head(pb, i) if has_prep else zh,
                eb[i] if has_perm else z, _head(eb, i) if has_perm else zh,
                sel_blocks[i], publics_monty, challenges[0], challenges[1],
                cum_sum, g_in, alpha,
            )
        )
    chunks = _assemble_quotient(q_blocks, step, big_h, xp)
    tdom = Domain(log_h, 1)
    doms = tdom.create_disjoint_domain(big_h).split_domains(step)
    return doms, chunks


# ---------------------------------------------------------------------------
# staged batch commit (per-matrix LDE + blocked row hash + per-size levels)
# ---------------------------------------------------------------------------


def commit_staged(config, domains_and_matrices, xp):
    """Device MMCS commit decomposed into reusable kernels.

    The monolithic commit kernel keyed on the whole batch signature
    recompiled for every new (shard shape, stage); staging it as per-matrix
    LDE kernels (keyed (log_n, w)), block-stationary row hashing (keyed
    (B, w)) and per-size Merkle level kernels (keyed by level size — a
    universal set of powers of two) makes every piece shared across batch
    compositions, stages, shards and programs.  Layout identical to
    ops/merkle.build_layers."""
    from ..ops import bits as bops, ntt, poseidon2 as p2

    log_blowup = config.log_blowup
    coeffs, ldes = [], []
    for dom, m in domains_and_matrices:
        log_n, shift, w = dom.log_n, dom.shift, m.shape[1]

        # the coset shift enters as a traced scalar (in-kernel power ladder),
        # so all domains of one size share a kernel — quotient-chunk domains
        # have per-chunk shifts that would otherwise each key a compile
        def make(log_n=log_n, w=w):
            def fn(evals, rel_shift_m):
                c = ntt.ntt(evals, inverse=True)
                scaled = f.mul(c, powers_traced(rel_shift_m, 1 << log_n, xp)[:, None])
                big_n = (1 << log_n) << log_blowup
                padded = xp.zeros((big_n, w), dtype=np.uint32).at[: 1 << log_n].set(scaled)
                return c, bops.bitrev_rows(ntt.ntt(padded))

            return fn

        fn = cached_jit("pcs_lde_mat", (log_n, w, log_blowup), make)
        rel = np.uint32(f.to_monty_int(f.GENERATOR * f.inv_int(shift) % f.P))
        c, l = fn(xp.asarray(m), rel)
        coeffs.append(c)
        ldes.append(l)

    by_height: dict[int, list] = {}
    for l in ldes:
        by_height.setdefault(l.shape[0], []).append(l)
    size = max(by_height)
    cur = _hash_rows_blocked(by_height[size], xp)
    layers = [cur]
    while size > 1:
        size //= 2
        inj = _hash_rows_blocked(by_height[size], xp) if size in by_height else None
        cur = _mk_level(cur, inj, xp)
        layers.append(cur)
    return coeffs, ldes, layers


def powers_traced(base_m, n: int, xp):
    """[1, b, b^2, ...] (monty) for a TRACED scalar base via log-doubling."""
    out = xp.full((1,), np.uint32(f.MONTY_ONE), dtype=np.uint32)
    cur = base_m
    while out.shape[0] < n:
        out = xp.concatenate([out, f.mul(out, cur)])
        cur = f.mul(cur, cur)
    return out[:n]


def _hash_rows_blocked(mats_same_h, xp):
    """Poseidon2 row digests of same-height matrices (widths concatenated)."""
    from ..ops import poseidon2 as p2

    h = mats_same_h[0].shape[0]
    widths = tuple(m.shape[1] for m in mats_same_h)
    if len(mats_same_h) > 1:
        cat_fn = cached_jit(
            "blk_cat", (h, widths), lambda: lambda ms: xp.concatenate(ms, axis=1)
        )
        cat = cat_fn(list(mats_same_h))
    else:
        cat = mats_same_h[0]
    w = sum(widths)
    b = BLOCK_ROWS
    if h <= b:
        fn = cached_jit("blk_rowhash", (h, w), lambda: p2.hash_matrix_rows)
        return fn(cat)
    blks, _ = split_rows(cat, b, 0, xp, "hash")
    fn = cached_jit("blk_rowhash", (b, w), lambda: p2.hash_matrix_rows)
    digs = [fn(blk) for blk in blks]
    cat_fn = cached_jit(
        "blk_digcat", (len(digs), b), lambda: lambda ds: xp.concatenate(ds, axis=0)
    )
    return cat_fn(digs)


def _mk_level(cur, inj, xp):
    """One Merkle level: compress adjacent pairs, then fold in any injected
    row digests whose matrix height equals the new level size."""
    from ..ops import poseidon2 as p2

    size = cur.shape[0] // 2
    has_inj = inj is not None

    def make():
        def fn(c, i):
            nxt = p2.compress(c[0::2], c[1::2])
            if has_inj:
                nxt = p2.compress(nxt, i)
            return nxt

        return fn

    fn = cached_jit("blk_mklevel", (size, has_inj), make)
    return fn(cur, inj if has_inj else xp.zeros((size, 8), np.uint32))


def _lde_dev(mat, log_h: int, lqd: int, xp, tag: str, coeffs=None):
    """Jitted LDE onto the quotient coset (regular structure, fast compile)."""
    from . import quotient as qmod

    if coeffs is not None:
        def make_c():
            return lambda c: qmod.lde_onto_quotient_domain(None, log_h, lqd, xp, coeffs=c)

        fn = cached_jit(f"blk_ldec_{tag}", (mat.shape, lqd), make_c)
        return fn(coeffs)

    def make():
        return lambda x: qmod.lde_onto_quotient_domain(x, log_h, lqd, xp)

    fn = cached_jit(f"blk_lde_{tag}", (mat.shape, lqd), make)
    return fn(mat)


def _selectors_dev(log_h: int, lqd: int, xp):
    """Selector arrays stacked (N, 4): first, last, transition, 1/Z_H."""
    from . import quotient as qmod

    def make():
        def fn():
            s = qmod.coset_selectors_dev(log_h, lqd, xp)
            return xp.stack(
                [s[Selector.FIRST], s[Selector.LAST], s[Selector.TRANSITION], s["inv_zeroifier"]],
                axis=1,
            )

        return fn

    fn = cached_jit("blk_sels", (log_h, lqd), make)
    return fn()
