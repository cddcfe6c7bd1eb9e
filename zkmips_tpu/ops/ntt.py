"""Radix-2 NTT / inverse NTT / coset LDE over KoalaBear.

TPU-first design: the transform operates on (n, w) matrices — n rows = the
polynomial axis, w columns = trace columns riding the VPU lane dimension.
Each butterfly stage is a reshape + elementwise modmul/add, which XLA lowers
to fused VPU code; there are log2(n) passes over the array.  Twiddle tables
are host-precomputed per stage (Montgomery form) and cached.

Replaces the reference's Radix2DitParallel CPU DFT
(crates/stark/src/kb31_poseidon2.rs:34) and its rayon row-parallelism with
whole-array vectorization.  The LDE coset shift is the field generator 3,
matching Plonky3's coset_lde_batch default used by TwoAdicFriPcs.
"""

from __future__ import annotations

import numpy as np

from . import bits, field as f

# (log_n, inverse) -> list of per-stage twiddle arrays (monty uint32)
_TWIDDLE_CACHE: dict[tuple[int, bool], list[np.ndarray]] = {}
_SHIFT_CACHE: dict[tuple[int, int], np.ndarray] = {}


def _stage_twiddles(log_n: int, inverse: bool) -> list[np.ndarray]:
    key = (log_n, inverse)
    if key not in _TWIDDLE_CACHE:
        stages = []
        for s in range(1, log_n + 1):
            m = 1 << s
            w_m = f.two_adic_generator_int(s)
            if inverse:
                w_m = f.inv_int(w_m)
            stages.append(bits.powers_monty_np(w_m, m // 2))
        _TWIDDLE_CACHE[key] = stages
    return _TWIDDLE_CACHE[key]


def ntt(x, inverse: bool = False):
    """In-order DIT NTT over axis 0 of (n,) or (n, w) uint32 Montgomery array.

    Forward: coefficients -> evaluations over the order-n subgroup, in natural
    (power-of-root) order.  Inverse: the exact inverse (including the 1/n
    scale).
    """
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    n, w = x.shape
    log_n = n.bit_length() - 1
    assert 1 << log_n == n, "NTT size must be a power of two"
    if n == 1:
        return x[:, 0] if squeeze else x
    xp = f.xp_of(x)
    x = bits.bitrev_rows(x)
    if xp is np:
        twiddles = _stage_twiddles(log_n, inverse)
        for s, tw in enumerate(twiddles, start=1):
            m = 1 << s
            half = m // 2
            y = x.reshape(n // m, m, w)
            even = y[:, :half]
            odd = y[:, half:]
            t = f.mul(odd, tw[None, :, None])
            x = _concat_axis1(f.add(even, t), f.sub(even, t)).reshape(n, w)
    else:
        twiddles = []
        for s_ in range(1, log_n + 1):
            w_m = f.two_adic_generator_int(s_)
            if inverse:
                w_m = f.inv_int(w_m)
            twiddles.append(bits.powers_monty(w_m, 1 << (s_ - 1), xp))
        # XLA:TPU miscompiles the fused butterfly network for some
        # non-multiple-of-8 widths at large n (observed: (2^20, w) for
        # w in {10, 12} — radix-2 was fine, radix-8 silently wrong).  The
        # transform is column-independent, so pad with zero columns to a
        # lane-friendly multiple of 8 and slice after.
        pad_w = (-w) % 8 if w > 8 else 0
        if pad_w:
            x = xp.concatenate([x, xp.zeros((n, pad_w), dtype=np.uint32)], axis=1)
        x = _ntt_stages_fused(x, twiddles, xp)
        if pad_w:
            x = x[:, :w]
    if inverse:
        n_inv = np.uint32(f.to_monty_int(f.inv_int(n)))
        x = f.mul(x, n_inv)
    return x[:, 0] if squeeze else x


import os as _os

_RADIX_LOG = int(_os.environ.get("ZKMIPS_NTT_RADIX_LOG", "3"))


def _ntt_stages_fused(x, twiddles, xp, radix_log: int = _RADIX_LOG):
    """Device butterfly network with ``radix_log`` stages fused per pass.

    Every HBM pass over the array costs the same regardless of how much VPU
    work rides it (measured: a 20-op fused chain == one add), so the radix-2
    loop's log2(n) passes are the whole cost.  Fusing g stages into one
    reshape/stack round-trip cuts passes to ceil(log2(n)/g); all per-stage
    arithmetic between the reshape and the stack is elementwise and fuses.

    Stage group starting at stage s (1-based, pair distance h1 = 2^(s-1)),
    g stages: view positions p in blocks of M = 2^(s+g-1) as p = q*h1 + j
    with q in [0, 2^g).  Stage s+i pairs q's differing in bit i and uses
    twiddle tw_{s+i}[(q & (2^i - 1))*h1 + j].
    """
    n, w = x.shape
    log_n = len(twiddles)
    s = 1
    while s <= log_n:
        g = min(radix_log, log_n - s + 1)
        h1 = 1 << (s - 1)
        big_m = h1 << g
        nq = 1 << g
        y = x.reshape(n // big_m, nq, h1, w)
        slots = [y[:, q] for q in range(nq)]  # (n//M, h1, w) each
        for i in range(g):
            tw = twiddles[s + i - 1]  # (2^(s+i-1),)
            bit = 1 << i
            mask = bit - 1
            for q in range(nq):
                if q & bit:
                    continue
                qh = q | bit
                tw_slice = tw[(q & mask) * h1 : (q & mask) * h1 + h1]
                u = slots[q]
                v = f.mul(slots[qh], tw_slice[None, :, None])
                slots[q] = f.add(u, v)
                slots[qh] = f.sub(u, v)
        x = xp.stack(slots, axis=1).reshape(n, w)
        s += g
    return x


def _concat_axis1(a, b):
    return f.xp_of(a).concatenate([a, b], axis=1)


def _shift_powers(shift: int, n: int) -> np.ndarray:
    key = (shift, n)
    if key not in _SHIFT_CACHE:
        _SHIFT_CACHE[key] = bits.powers_monty_np(shift, n)
    return _SHIFT_CACHE[key]


def coset_lde(x, log_blowup: int = 1, shift: int = f.GENERATOR):
    """Low-degree extend evals on the size-n subgroup to the coset shift*K.

    x: (n, w) evaluations in natural order.  Returns (n << log_blowup, w)
    evaluations over {shift * g^i} in natural order.
    """
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    n, w = x.shape
    coeffs = ntt(x, inverse=True)
    xp = f.xp_of(x)
    sp = _shift_powers(shift, n) if xp is np else bits.powers_monty(shift, n, xp)
    coeffs = f.mul(coeffs, sp[:, None])
    big_n = n << log_blowup
    xp = f.xp_of(x)
    if xp is np:
        padded = np.zeros((big_n, w), dtype=np.uint32)
        padded[:n] = coeffs
    else:
        padded = xp.zeros((big_n, w), dtype=np.uint32).at[:n].set(coeffs)
    out = ntt(padded)
    return out[:, 0] if squeeze else out


def coset_lde_bitrev(x, log_blowup: int = 1, shift: int = f.GENERATOR):
    """coset_lde + bit-reversed row order (the committed-matrix layout)."""
    return bits.bitrev_rows(coset_lde(x, log_blowup, shift))


def domain_points_np(log_n: int, shift: int = 1) -> np.ndarray:
    """Canonical-u32 numpy array of the domain points shift * g^i (natural)."""
    g = f.two_adic_generator_int(log_n)
    pts = bits.powers_canonical_np(g, 1 << log_n)
    if shift != 1:
        pts = (pts * (shift % f.P)) % f.P
    return pts.astype(np.uint32)
