"""LogUp permutation argument: trace generation + constraint generation.

Faithful to the reference's batched-fraction LogUp
(crates/stark/src/permutation.rs):

  * fingerprint D = alpha + kind + sum_i beta^{i+1} * value_i   (:40-55)
  * perm column j = sum over batch j of (+-) mult / D            (:46-68)
  * last column = inclusive prefix sum of the batch-column row sums (:175-190)
  * constraints: entry * prod(D) = sum m_i * prod_{j!=i} D_j;
    phi_first = row_sum; phi_next - phi_local = row_sum_next;
    phi_last = claimed local cumulative sum                       (:267-333)
  * global-scope chips bind their last-row trailing 14 main columns to the
    claimed global septic digest                                  (:338-348)

Trace generation is fully vectorized (ext4 arrays over all rows at once);
the prefix sum is a log-depth Hillis–Steele scan, TPU/XLA friendly.
"""

from __future__ import annotations

import numpy as np

from ..ops import ext4, field as f
from . import air
from .air import AirBuilder, Challenge, Const, CumSumLocal, EvalContext, GlobalSumCoord, Scope, Var, eval_expr

BATCH_SIZE = 2


def perm_width(n_lookups: int, batch_size: int = BATCH_SIZE) -> int:
    """Width in ext elements (permutation.rs:18-23)."""
    if n_lookups == 0:
        return 0
    return -(-n_lookups // batch_size) + 1


def local_lookups(chip) -> tuple[list, list]:
    sends = [l for l in chip.sends if l.scope == Scope.Local]
    receives = [l for l in chip.receives if l.scope == Scope.Local]
    return sends, receives


def _lookup_chunks(sends, receives, batch_size):
    items = [(l, True) for l in sends] + [(l, False) for l in receives]
    return [items[i : i + batch_size] for i in range(0, len(items), batch_size)]


def _row_ctx(prep, main, xp=np) -> EvalContext:
    """Context binding local-row vars to full trace columns (monty arrays)."""

    def var_fn(segment, col, offset):
        assert offset == 0, "lookup exprs may only reference the local row"
        if segment == air.MAIN:
            return main[:, col]
        if segment == air.PREPROCESSED:
            return prep[:, col]
        raise ValueError("lookups cannot reference the permutation trace")

    return EvalContext(var_fn, selectors=None, xp=xp)


def generate_permutation_trace(
    chip,
    prep,  # (H, wp) monty or None
    main,  # (H, w) monty
    alpha: np.ndarray,  # (4,) ext monty
    beta: np.ndarray,
    batch_size: int = BATCH_SIZE,
    xp=np,
    _row_local: bool = False,
):
    """Returns (perm_flat (H, 4*width) base monty, local_cumulative_sum (4,)).

    With ``_row_local=True`` the prefix sum is skipped and the return is
    (batch columns (H, 4*(width-1)), row_sum (H, 4)) — the block-stationary
    kernel form (stark/blocks.py) where rows may be any block of the trace."""
    sends, receives = local_lookups(chip)
    n = len(sends) + len(receives)
    h = main.shape[0]
    if n == 0:
        return xp.zeros((h, 0), dtype=np.uint32), ext4.ZERO.astype(np.uint32)

    ctx = _row_ctx(prep, main, xp)
    chunks = _lookup_chunks(sends, receives, batch_size)
    width = len(chunks) + 1

    # log-doubling, NOT a serial beta*beta*... chain: XLA:CPU compile time
    # goes exponential in the length of a chained (4,)-ext-mul sequence
    # (~2x per 2 extra links; 26 links never finished compiling — the
    # round-4 multichip hang), while the doubled form is 2*log2(n) batched
    # ext muls.  Same field values either way.
    n_pows = 2 + max(len(l.values) for l in sends + receives)
    _bp = ext4.ONE.astype(np.uint32)[None, :]
    _cur = beta[None, :]
    concat = xp.concatenate
    while _bp.shape[0] < n_pows:
        _bp = concat([_bp, ext4.mul(_bp, _cur)], axis=0)
        _cur = ext4.mul(_cur, _cur)
    beta_pows = [_bp[i] for i in range(n_pows)]

    # compute every lookup's denominator, invert them all in ONE batched call
    # (ext4.inv is ~1.6k array ops; batching keeps the jit graph small).
    #
    # The fingerprint sum_i beta^{i+1} * value_i is built as ONE stacked
    # (H, nv, 4) product + a tree mod-p reduction, NOT a serial
    # add(mul(...)) chain over the values: XLA:CPU's simplifier goes
    # super-linear on the chained broadcast form (a 24-value lookup's chain
    # compiled for minutes and its executable effectively never finished —
    # the round-4 multichip dryrun hang), while the reduction form compiles
    # and runs in seconds.  Mod-p addition is associative, so the tree
    # reduction is bit-identical to the serial chain.
    from ..ops import bits as _bits

    flat = [lk for chunk in chunks for lk in chunk]
    denoms, mults = [], []
    bc = xp.broadcast_to

    def _as_col(v):
        if getattr(v, "ndim", 0) == 0:
            return bc(xp.asarray(v)[None], (h,))
        return v

    for lookup, is_send in flat:
        d0 = ext4.add(alpha, ext4.scalar(lookup.argument_index))  # (4,)
        if lookup.values:
            nv = len(lookup.values)
            vmat = xp.stack(
                [_as_col(eval_expr(v, ctx).arr) for v in lookup.values], axis=1
            )  # (H, nv) base
            bp = xp.stack(beta_pows[1 : nv + 1], axis=0)  # (nv, 4)
            prod = f.mul(vmat[:, :, None], bp[None, :, :])  # (H, nv, 4)
            d = ext4.add(d0[None, :], _bits.sum_mod(prod, axis=1))
        else:
            d = bc(d0[None, :], (h, 4))
        denoms.append(d)
        mult = eval_expr(lookup.multiplicity, ctx).arr  # (H,)
        if not is_send:
            mult = f.neg(mult)
        if getattr(mult, "ndim", 0) == 0:
            mult = bc(mult[None] if hasattr(mult, "__getitem__") else xp.asarray(mult)[None], (h,))
        mults.append(mult)
    stack = xp.stack
    # Montgomery batch inversion over the lookup axis: one ext4 inverse
    # (≈95 base modmuls) for all L lookups instead of one each — 3L ext
    # muls replace L norms+Fermat chains (~1.8x fewer modmuls for the Cpu
    # chip's lookup count).  Field inverses are unique, so the resulting
    # trace is bit-identical to the per-lookup path.  A zero denominator
    # (probability ~L·H/p^4 over the Fiat-Shamir challenges) would poison
    # the whole chain where the old path zeroed one entry; either way the
    # proof is invalid, so no special-casing.
    L = len(denoms)
    if L > 2:
        prefix = [denoms[0]]
        for d in denoms[1:]:
            prefix.append(ext4.mul(prefix[-1], d))
        inv_p = ext4.inv(prefix[-1])
        inv_list = [None] * L
        for i in range(L - 1, 0, -1):
            inv_list[i] = ext4.mul(inv_p, prefix[i - 1])
            inv_p = ext4.mul(inv_p, denoms[i])
        inv_list[0] = inv_p
        inv_all = stack(inv_list, axis=0)  # (L, H, 4)
    else:
        inv_all = ext4.inv(stack(denoms, axis=0))
    fracs = f.mul(inv_all, stack(mults, axis=0)[:, :, None])
    cols = []
    li = 0
    for chunk in chunks:
        col = None
        for _ in chunk:
            frac = fracs[li]
            li += 1
            col = frac if col is None else ext4.add(col, frac)
        cols.append(col)

    row_sum = cols[0]
    for c in cols[1:]:
        row_sum = ext4.add(row_sum, c)
    concat = xp.concatenate
    if _row_local:
        return concat([c.reshape(h, 4) for c in cols], axis=1), row_sum.reshape(h, 4)
    phi = _prefix_sum(row_sum, xp)
    local_cumulative_sum = phi[-1]

    flat = concat([c.reshape(h, 4) for c in cols] + [phi.reshape(h, 4)], axis=1)
    return flat, local_cumulative_sum


def _b(arr):
    """base (H,) or scalar -> broadcastable against ext (H, 4)."""
    if getattr(arr, "ndim", 0) == 0:
        return arr  # scalar broadcasts as-is
    return arr[:, None]


def _prefix_sum(x, xp=np):
    """Inclusive mod-p prefix sum over axis 0 of ext (H, 4): log-depth scan."""
    h = x.shape[0]
    shift = 1
    concat = xp.concatenate
    while shift < h:
        shifted = concat([xp.zeros((shift, 4), dtype=np.uint32), x[:-shift]], axis=0)
        x = f.add(x, shifted)
        shift *= 2
    return x


def eval_permutation_constraints(chip, builder: AirBuilder, batch_size: int = BATCH_SIZE):
    """Append LogUp constraints to the chip's builder (permutation.rs:267-348)."""
    sends, receives = local_lookups(chip)
    n = len(sends) + len(receives)
    if n > 0:
        chunks = _lookup_chunks(sends, receives, batch_size)
        width = len(chunks) + 1
        alpha, beta = Challenge(0), Challenge(1)

        # beta^k as a balanced tree of SHARED Mul nodes, not a serial
        # bpow = bpow*beta chain: every backend that walks this DAG
        # (device quotient kernels, host verifier, recursion/snark circuit
        # emitters) then sees O(log k)-deep shared products — XLA:CPU's
        # compile time is exponential in the length of a chained
        # (4,)-ext-mul sequence (the round-4 multichip hang).
        _bpow_cache = {1: beta}

        def bpow(k: int):
            node = _bpow_cache.get(k)
            if node is None:
                half = k // 2
                node = bpow(half) * bpow(k - half)
                _bpow_cache[k] = node
            return node

        def perm(col, offset=0):
            return Var(air.PERM, col, offset)

        for j, chunk in enumerate(chunks):
            rlcs, mults = [], []
            for lookup, is_send in chunk:
                rlc = alpha + Const(lookup.argument_index)
                for vi, v in enumerate(lookup.values):
                    rlc = rlc + bpow(vi + 1) * v
                rlcs.append(rlc)
                mults.append(lookup.multiplicity if is_send else -lookup.multiplicity)
            product = rlcs[0]
            for r in rlcs[1:]:
                product = product * r
            numerator = None
            for i, m in enumerate(mults):
                others = None
                for k, r in enumerate(rlcs):
                    if k != i:
                        others = r if others is None else others * r
                term = m if others is None else m * others
                numerator = term if numerator is None else numerator + term
            builder.assert_zero(perm(j) * product - numerator)

        sum_local = perm(0)
        sum_next = perm(0, 1)
        for j in range(1, width - 1):
            sum_local = sum_local + perm(j)
            sum_next = sum_next + perm(j, 1)
        phi_local = perm(width - 1)
        phi_next = perm(width - 1, 1)
        builder.when_first_row().assert_zero(phi_local - sum_local)
        builder.when_transition().assert_zero(phi_next - phi_local - sum_next)
        builder.when_last_row().assert_zero(phi_local - CumSumLocal())

    if chip.commit_scope == Scope.Global:
        w = chip.main_width
        for i in range(14):
            builder.when_last_row().assert_zero(builder.main(w - 14 + i) - GlobalSumCoord(i))
