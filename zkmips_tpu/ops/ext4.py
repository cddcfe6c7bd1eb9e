"""Quartic extension field F_{p^4} = F_p[X]/(X^4 - 3) — the STARK challenge field.

Matches the reference's ``BinomialExtensionField<KoalaBear, 4>`` (reference:
crates/stark/src/kb31_poseidon2.rs:19; the binomial constant W = 3 is visible
in the gnark circuit's extension mul, crates/recursion/gnark-ffi/go/zkm/
koalabear/koalabear.go ``MulE`` which folds ``i+j >= 4`` terms with ``*3``).

Representation: uint32 arrays with a trailing axis of length 4 (coefficients
c0 + c1 X + c2 X^2 + c3 X^3), each coefficient in Montgomery form.  All ops
are backend-agnostic (numpy / jax.numpy) like :mod:`zkmips_tpu.ops.field`.
"""

from __future__ import annotations

import numpy as np

from . import field as f

W = 3  # binomial: X^4 = 3
D = 4

# Frobenius: (c_i X^i)^p = c_i * W^{i (p-1)/4} X^i  (since X^p = W^{(p-1)/4} X).
_U1 = pow(W, (f.P - 1) // 4, f.P)
# canonical Frobenius scale factors u^(i*k) for frob^k, i in 0..3
_FROB = [
    np.array([pow(_U1, i * k, f.P) for i in range(4)], dtype=np.uint64)
    for k in range(4)
]
_FROB_M = [np.array([f.to_monty_int(int(v)) for v in row], dtype=np.uint32) for row in _FROB]


def zeros_like(a):
    return a * np.uint32(0)


def from_base(x):
    """Embed base-field array (...,) -> ext array (..., 4)."""
    xp_stack = f.xp_of(x)
    z = x * np.uint32(0)
    return xp_stack.stack([x, z, z, z], axis=-1)


def _jnp():
    import jax.numpy as jnp

    return jnp


def scalar(c0: int, c1: int = 0, c2: int = 0, c3: int = 0) -> np.ndarray:
    """Ext element from canonical ints (host constant)."""
    return np.array(
        [f.to_monty_int(c0), f.to_monty_int(c1), f.to_monty_int(c2), f.to_monty_int(c3)],
        dtype=np.uint32,
    )


ONE = scalar(1)
ZERO = scalar(0)


def add(a, b):
    return f.add(a, b)


def sub(a, b):
    return f.sub(a, b)


def neg(a):
    return f.neg(a)


def _triple(x):
    return f.add(f.add(x, x), x)


def mul(a, b):
    """Schoolbook ext4 mul with X^4 = 3 reduction (16 base muls)."""
    a0, a1, a2, a3 = (a[..., i] for i in range(4))
    b0, b1, b2, b3 = (b[..., i] for i in range(4))
    m = f.mul
    c0 = f.add(m(a0, b0), _triple(f.add(f.add(m(a1, b3), m(a2, b2)), m(a3, b1))))
    c1 = f.add(f.add(m(a0, b1), m(a1, b0)), _triple(f.add(m(a2, b3), m(a3, b2))))
    c2 = f.add(f.add(m(a0, b2), f.add(m(a1, b1), m(a2, b0))), _triple(m(a3, b3)))
    c3 = f.add(f.add(m(a0, b3), m(a1, b2)), f.add(m(a2, b1), m(a3, b0)))
    return _stack4(a, c0, c1, c2, c3)


def _stack4(proto, c0, c1, c2, c3):
    xp = f.xp_of(c0)
    return xp.stack([c0, c1, c2, c3], axis=-1)


def mul_base(a, b):
    """ext (...,4) * base (...,) -> ext."""
    return f.mul(a, b[..., None])


def square(a):
    return mul(a, a)


def pow_const(a, e: int):
    if e == 0:
        return zeros_like(a) + ONE.astype(np.uint32)
    acc = None
    base = a
    while e:
        if e & 1:
            acc = base if acc is None else mul(acc, base)
        e >>= 1
        if e:
            base = square(base)
    return acc


def frobenius(a, k: int = 1):
    """a^(p^k), linear: coefficient-wise scale by precomputed constants."""
    return f.mul(a, _FROB_M[k % 4])


def inv(a):
    """Inverse via norm: a^{-1} = (prod of conjugates) / N(a), N(a) in F_p."""
    b = mul(mul(frobenius(a, 1), frobenius(a, 2)), frobenius(a, 3))
    # norm = (a * b)[0] — the product is in the base field.
    a0, a1, a2, a3 = (a[..., i] for i in range(4))
    b0, b1, b2, b3 = (b[..., i] for i in range(4))
    norm = f.add(
        f.mul(a0, b0),
        _triple(f.add(f.add(f.mul(a1, b3), f.mul(a2, b2)), f.mul(a3, b1))),
    )
    return mul_base(b, f.inv(norm))


def to_canonical(a):
    return f.from_monty(a)


def powers(base: np.ndarray, n: int) -> np.ndarray:
    """(n, 4): [1, base, ..., base^(n-1)] by log-doubling (numpy or jnp).

    2*log2(n) batched ext muls instead of a length-n serial chain — a
    chained (4,)-ext-mul sequence makes XLA:CPU's compile time exponential
    in the chain length (observed: ~2x per 2 extra links; 26 links never
    finished).  Values are identical to the serial product either way.
    """
    xp = f.xp_of(base)
    out = ONE.astype(np.uint32)[None, :]
    cur = base[None, :]
    while out.shape[0] < n:
        out = xp.concatenate([out, mul(out, cur)], axis=0)
        cur = mul(cur, cur)
    return out[:n]


def powers_host(base: np.ndarray, n: int) -> np.ndarray:
    """numpy (n, 4): [1, base, base^2, ...] (host-side, base is ext monty)."""
    out = np.empty((n, 4), dtype=np.uint32)
    acc = ONE.copy()
    for i in range(n):
        out[i] = acc
        acc = mul(acc, base)
    return out
