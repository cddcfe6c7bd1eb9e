"""Bit manipulation helpers: bit-reversal permutations, modular reductions.

Committed LDE matrices are stored in bit-reversed row order (like the
reference's Plonky3 backend) so FRI folding pairs f(x), f(-x) are adjacent
rows — on TPU this turns the fold into a stride-2 reshape instead of a gather.
"""

from __future__ import annotations

import numpy as np

from . import field as f

_BITREV_CACHE: dict[int, np.ndarray] = {}


def bitrev_indices(log_n: int) -> np.ndarray:
    """numpy int32 permutation: i -> reverse of i's low log_n bits."""
    if log_n not in _BITREV_CACHE:
        n = 1 << log_n
        idx = np.arange(n, dtype=np.uint32)
        rev = np.zeros(n, dtype=np.uint32)
        for b in range(log_n):
            rev |= ((idx >> b) & 1) << (log_n - 1 - b)
        _BITREV_CACHE[log_n] = rev.astype(np.int32)
    return _BITREV_CACHE[log_n]


def bitrev_rows(x):
    """Permute rows of (n, ...) array into bit-reversed order (involution)."""
    n = x.shape[0]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n, "bitrev needs power-of-two height"
    idx = bitrev_indices(log_n)
    xp = f.xp_of(x)
    if xp is np:
        return x[idx]
    return xp.take(x, xp.asarray(idx), axis=0)


def sum_mod(x, axis: int = 0):
    """Tree-sum of field elements along ``axis`` (keeps values < p).

    log2(n) vectorized halving steps; works for numpy and jax.numpy.
    """
    xp = f.xp_of(x)
    x = xp.moveaxis(x, axis, 0)
    n = x.shape[0]
    while n > 1:
        half = n // 2
        lo = x[:half]
        hi = x[half : 2 * half]
        rest = x[2 * half :]
        x = f.add(lo, hi)
        if rest.shape[0]:
            x = xp.concatenate([x, rest], axis=0)
        n = x.shape[0]
    return x[0]


def _jnp():
    import jax.numpy as jnp

    return jnp


def powers_canonical_np(base: int, n: int) -> np.ndarray:
    """[1, b, ..., b^(n-1)] canonical, vectorized host precompute (uint64)."""
    out = np.ones(1, dtype=np.uint64)
    cur = base % f.P
    while out.shape[0] < n:
        out = np.concatenate([out, (out * cur) % f.P])
        cur = cur * cur % f.P
    return out[:n]


def powers_monty_np(base: int, n: int) -> np.ndarray:
    """[1, b, ..., b^(n-1)] in Montgomery form (uint32 numpy)."""
    can = powers_canonical_np(base, n)
    return (((can.astype(np.uint64)) << 32) % f.P).astype(np.uint32)
