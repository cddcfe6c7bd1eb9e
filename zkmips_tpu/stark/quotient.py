"""Quotient polynomial evaluation over the disjoint coset.

The prover LDEs every trace segment onto the chip's quotient domain
(trace_domain.create_disjoint_domain(H << log_quotient_degree), shift g),
evaluates the alpha-folded constraint sum pointwise, divides by the
vanishing polynomial, and splits the result into 2^lqd stride-interleaved
chunks committed as width-4 base matrices (reference:
crates/stark/src/quotient.rs:19, prover.rs open()).

All per-point work is vectorized over the whole quotient domain — on TPU
this is one fused elementwise XLA graph per chip.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from ..ops import bits, ext4, field as f, ntt
from . import air
from .air import EvalContext, Selector, fold_constraints
from .domain import Domain


@lru_cache(maxsize=128)
def coset_selectors(log_h: int, lqd: int):
    """Selector + 1/Z_H arrays over the quotient domain (host, cached).

    Trace domain: size H = 2^log_h, shift 1.  Quotient domain: size H<<lqd,
    shift g (GENERATOR).  Returns dict of (N,) canonical->monty uint32 arrays.
    """
    h = 1 << log_h
    qdom = Domain(log_h + lqd, f.GENERATOR)
    pts = qdom.points_natural().astype(np.uint64)  # canonical
    zh = (pow_mod_vec(pts, h) + f.P - 1) % f.P  # x^H - 1
    g_h = f.two_adic_generator_int(log_h)
    last = f.inv_int(g_h)  # g_H^{H-1}
    x_min_1 = (pts + f.P - 1) % f.P
    x_min_last = (pts + f.P - last) % f.P
    zh_m = f.to_monty(zh.astype(np.uint32))
    inv_x1 = f.inv(f.to_monty(x_min_1.astype(np.uint32)))
    inv_xl = f.inv(f.to_monty(x_min_last.astype(np.uint32)))
    return {
        Selector.FIRST: f.mul(zh_m, inv_x1),
        Selector.LAST: f.mul(zh_m, inv_xl),
        Selector.TRANSITION: f.to_monty(x_min_last.astype(np.uint32)),
        "inv_zeroifier": f.inv(zh_m),
    }


def coset_selectors_dev(log_h: int, lqd: int, xp):
    """coset_selectors computed with device ops (traced kernels would embed
    the host tables as multi-MB HLO literals otherwise)."""
    h = 1 << log_h
    wpow = bits.powers_monty(f.two_adic_generator_int(log_h + lqd), 1 << (log_h + lqd), xp)
    g_m = np.uint32(f.to_monty_int(f.GENERATOR))
    pts = f.mul(wpow, g_m)  # monty, shift-g coset, natural order
    one_m = np.uint32(f.MONTY_ONE)
    zh = f.sub(f.pow_const(pts, h), one_m)  # g^H w^{iH} - 1 (monty)
    g_h = f.two_adic_generator_int(log_h)
    last = f.inv_int(g_h)
    last_m = np.uint32(f.to_monty_int(last))
    x_min_1 = f.sub(pts, one_m)
    x_min_last = f.sub(pts, last_m)
    return {
        Selector.FIRST: f.mul(zh, f.inv(x_min_1)),
        Selector.LAST: f.mul(zh, f.inv(x_min_last)),
        Selector.TRANSITION: x_min_last,
        "inv_zeroifier": f.inv(zh),
    }


def pow_mod_vec(x: np.ndarray, e: int) -> np.ndarray:
    """x**e mod P for uint64 canonical arrays (square-and-multiply)."""
    r = np.ones_like(x)
    b = x % f.P
    while e:
        if e & 1:
            r = r * b % f.P
        b = b * b % f.P
        e >>= 1
    return r


def lde_onto_quotient_domain(trace_monty, log_h: int, lqd: int, xp=np, coeffs=None):
    """(H, w) evals on <w_H> -> (H<<lqd, w) evals on g*<w_N>, natural order.

    ``coeffs``: optional precomputed iNTT of the trace (the commit stage
    already has it in ProverData.coeffs) — skips the inverse transform."""
    if coeffs is None:
        coeffs = ntt.ntt(trace_monty, inverse=True)
    scaled = f.mul(coeffs, bits.powers_monty(f.GENERATOR, coeffs.shape[0], xp)[:, None])
    big_n = coeffs.shape[0] << lqd
    if xp is np:
        padded = np.zeros((big_n, scaled.shape[1]), dtype=np.uint32)
        padded[: coeffs.shape[0]] = scaled
    else:
        padded = xp.zeros((big_n, scaled.shape[1]), dtype=np.uint32).at[: coeffs.shape[0]].set(scaled)
    return ntt.ntt(padded)


def quotient_chunks(
    chip,
    main_monty,  # (H, w)
    prep_monty,  # (H, wp) or None
    perm_flat,  # (H, 4*W) base monty
    publics_monty,  # (num_pv,) monty
    challenges,  # [alpha_perm, beta_perm] ext (4,)
    cum_sum,  # (4,) ext monty
    global_sum,  # (14,) base monty or None
    alpha,  # (4,) constraint-folding challenge
    xp=np,
):
    """Returns (chunk_domains, chunk_matrices (H,4) base monty each)."""
    h, _w = main_monty.shape
    log_h = h.bit_length() - 1
    lqd = chip.log_quotient_degree
    step = 1 << lqd

    main_q = lde_onto_quotient_domain(main_monty, log_h, lqd, xp)
    prep_q = lde_onto_quotient_domain(prep_monty, log_h, lqd, xp) if prep_monty is not None else None
    perm_q = lde_onto_quotient_domain(perm_flat, log_h, lqd, xp) if perm_flat.shape[1] else None

    roll = np.roll if xp is np else xp.roll

    rolled: dict[int, object] = {}

    def rolled_seg(seg_arr, key):
        r = rolled.get(key)
        if r is None:
            r = roll(seg_arr, -step, axis=0)
            rolled[key] = r
        return r

    def var_fn(segment, col, offset):
        if segment == air.MAIN:
            arr = main_q if offset == 0 else rolled_seg(main_q, air.MAIN)
            return arr[:, col]
        if segment == air.PREPROCESSED:
            arr = prep_q if offset == 0 else rolled_seg(prep_q, air.PREPROCESSED)
            return arr[:, col]
        if segment == air.PERM:
            arr = perm_q if offset == 0 else rolled_seg(perm_q, air.PERM)
            return arr[:, 4 * col : 4 * col + 4]
        raise ValueError(segment)

    sels = coset_selectors(log_h, lqd) if xp is np else coset_selectors_dev(log_h, lqd, xp)
    ctx = EvalContext(
        var_fn,
        selectors=sels,
        publics=publics_monty,
        challenges=challenges,
        cum_sum=cum_sum,
        global_sum=global_sum,
        xp=xp,
    )
    folded = fold_constraints(chip.constraints, alpha, ctx)  # (N, 4)
    qvals = f.mul(folded, sels["inv_zeroifier"][:, None])

    tdom = Domain(log_h, 1)
    qdom = tdom.create_disjoint_domain(h << lqd)
    doms = qdom.split_domains(step)
    chunks = [qvals[i::step] for i in range(step)]
    return doms, chunks
