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
    """Permute rows of (n, ...) array into bit-reversed order (involution).

    Device path: reshape the row axis into log_n bit axes and reverse them —
    a pure transpose, so no 8-byte-per-row index literal lands in the HLO
    (the remote-compile transport rejects multi-MB constant payloads)."""
    n = x.shape[0]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n, "bitrev needs power-of-two height"
    xp = f.xp_of(x)
    if xp is np:
        return x[bitrev_indices(log_n)]
    if log_n == 0:
        return x
    tail = x.shape[1:]
    y = x.reshape((2,) * log_n + tail)
    perm = tuple(reversed(range(log_n))) + tuple(range(log_n, log_n + len(tail)))
    return y.transpose(perm).reshape(x.shape)


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


def powers_monty(base: int, n: int, xp) -> "np.ndarray":
    """[1, b, ..., b^(n-1)] Montgomery.  Device path builds the table by
    log-doubling with scalar step constants (b^(2^j) precomputed as Python
    ints), so traced kernels carry O(log n) scalars instead of an n-element
    literal."""
    if xp is np:
        return powers_monty_np(base, n)
    out = xp.full((1,), np.uint32(f.MONTY_ONE), dtype=np.uint32)
    cur = base % f.P
    while out.shape[0] < n:
        step = np.uint32(f.to_monty_int(cur))
        out = xp.concatenate([out, f.mul(out, step)])
        cur = cur * cur % f.P
    return out[:n]
