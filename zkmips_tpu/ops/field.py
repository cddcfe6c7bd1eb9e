"""KoalaBear base-field arithmetic, vectorized for TPU (and numpy on host).

The field is F_p with p = 2^31 - 2^24 + 1 = 0x7f000001 (the "KoalaBear" prime),
matching the reference zkVM's base field (reference:
crates/core/machine/include/kb31_t.hpp:27, MONTY_MU at :33, RR at :32).

Design notes (TPU-first):
  * Elements are stored as ``uint32`` arrays in **Montgomery form** with
    R = 2^32, exactly like the reference's C++/Rust kernels.  All heavy math
    (NTT butterflies, Poseidon2, quotient evaluation, FRI folds) stays in the
    Montgomery domain; conversion happens only at (de)serialization and event
    ingestion boundaries.
  * Every function below is written against plain operator overloading +
    ``.astype`` so the *same* code runs under ``numpy`` (host: challenger,
    tests) and ``jax.numpy`` (TPU: everything hot).  uint32 ops wrap mod 2^32
    in both backends, which Montgomery reduction exploits.
  * There is no 64-bit integer path: TPU VPUs are 32-bit lanes.  Wide products
    are decomposed into 16-bit limbs (6-7 32-bit multiplies per modmul); the
    Montgomery constant MU = 2^31 + 2^24 + 1 and the prime p = 2^31 - 2^24 + 1
    are *sparse*, so `lo * MU mod 2^32` is shift-add only.

Scalar helpers (python ints) live alongside for host-side protocol logic.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Protocol constants (kb31_t.hpp:27-34)
# ---------------------------------------------------------------------------

P = 0x7F000001  # 2_130_706_433 = 2^31 - 2^24 + 1
MONTY_BITS = 32
MONTY_MU = 0x81000001  # P^{-1} mod 2^32  (note: +P^{-1}, not -P^{-1})
R2 = 0x17F7EFE4  # (2^32)^2 mod P, for to-Montgomery conversion
MONTY_ONE = 0x01FFFFFE  # 2^32 mod P == Montgomery form of 1
GENERATOR = 3  # canonical multiplicative generator of F_p^*
TWO_ADICITY = 24  # p - 1 = 2^24 * 127

# uint32 wrap-around is load-bearing (Montgomery reduction); numpy warns on
# 0-d scalar overflow, which is noise here.
np.seterr(over="ignore")

_U = np.uint32
_P32 = _U(P)
_M16 = _U(0xFFFF)
_P_HI16 = _U(0x7F00)  # high 16-bit limb of p (low limb is 1)




def xp_of(*arrays):
    """Pick the array backend: numpy unless some input is a JAX array.

    numpy scalars (``np.uint32`` etc.) count as numpy — ``isinstance(x,
    np.ndarray)`` alone misclassifies them and silently dispatches tiny ops
    through JAX, which is catastrophically slow on host paths.
    """
    for a in arrays:
        if a is None or isinstance(a, (np.ndarray, np.generic, int, float)):
            continue
        import jax.numpy as jnp

        return jnp
    return np

# ---------------------------------------------------------------------------
# Scalar (python int) reference arithmetic — used for constants, tests,
# and host-side protocol logic where vectorization is pointless.
# ---------------------------------------------------------------------------

def to_monty_int(x: int) -> int:
    """Canonical int -> Montgomery u32."""
    return (x << 32) % P


def from_monty_int(m: int) -> int:
    """Montgomery u32 -> canonical int."""
    return (m * pow(1 << 32, P - 2, P)) % P


def exp_int(base: int, e: int) -> int:
    return pow(base, e, P)


def inv_int(x: int) -> int:
    return pow(x, P - 2, P)


def two_adic_generator_int(bits: int) -> int:
    """Canonical 2^bits-th primitive root of unity: g^((p-1) >> bits), g = 3.

    Matches Plonky3's construction of two-adic generators from the field
    generator (the reference's NTT domains are powers of this root).
    """
    assert 0 <= bits <= TWO_ADICITY
    return pow(GENERATOR, (P - 1) >> bits, P)


# ---------------------------------------------------------------------------
# Vectorized Montgomery arithmetic (uint32 arrays; numpy or jax.numpy)
# ---------------------------------------------------------------------------

def _mul_62(a, b):
    """(hi, lo) 32+32-bit of the 62-bit product a*b.

    Requires a < 2^31 and b < 2^31 (true for reduced field elements), so the
    16-bit-limb cross terms cannot overflow uint32.
    """
    a0 = a & _M16
    a1 = a >> _U(16)
    b0 = b & _M16
    b1 = b >> _U(16)
    t00 = a0 * b0
    mid = a0 * b1 + a1 * b0 + (t00 >> _U(16))  # < 2^32 since a1,b1 < 2^15
    hi = a1 * b1 + (mid >> _U(16))
    lo = a * b  # uint32 wrap-around gives the low 32 bits directly
    return hi, lo


def _mulhi_p(t):
    """High 32 bits of t * p for arbitrary uint32 t (p's limbs are (0x7f00, 1))."""
    t0 = t & _M16
    t1 = t >> _U(16)
    mid = t0 * _P_HI16 + t1  # a0*b1 + a1*b0 with b0=1: < 2^31 + 2^16
    return t1 * _P_HI16 + (mid >> _U(16))


def mul(a, b):
    """Montgomery product: returns a*b*R^{-1} mod p, inputs/outputs in [0, p)."""
    hi, lo = _mul_62(a, b)
    # m = lo * MU mod 2^32 with MU = 2^31 + 2^24 + 1 (shift-add only)
    m = lo + (lo << _U(24)) + (lo << _U(31))
    u_hi = _mulhi_p(m)
    r = hi - u_hi
    return r + (hi < u_hi).astype(np.uint32) * _P32


def add(a, b):
    r = a + b  # < 2p < 2^32: no wrap
    return r - (r >= _P32).astype(np.uint32) * _P32


def sub(a, b):
    return a - b + (a < b).astype(np.uint32) * _P32


def neg(a):
    return (_P32 - a) * (a != 0).astype(np.uint32)


def double(a):
    return add(a, a)


def square(a):
    return mul(a, a)


def from_monty(m):
    """Montgomery u32 array -> canonical u32 array (monty_reduce with hi=0)."""
    t = m + (m << _U(24)) + (m << _U(31))
    u_hi = _mulhi_p(t)
    return (_P32 - u_hi) * (u_hi != 0).astype(np.uint32)


def to_monty(x):
    """Canonical u32 array (< p) -> Montgomery form."""
    return mul(x, _like(x, R2))


def _like(a, c: int):
    """A uint32 scalar constant usable with either backend."""
    return _U(c)


def pow_const(a, e: int):
    """a ** e for a fixed python-int exponent (unrolled square-and-multiply)."""
    if e == 0:
        return a * np.uint32(0) + _U(MONTY_ONE)
    acc = None
    base = a
    while e:
        if e & 1:
            acc = base if acc is None else mul(acc, base)
        e >>= 1
        if e:
            base = square(base)
    return acc


def inv(a):
    """Pointwise field inverse via Fermat (a^(p-2)); a must be nonzero.

    TPU-friendly: ~37 modmuls, fully parallel (no Montgomery batch-inv chain
    with its serial prefix product).
    """
    return pow_const(a, P - 2)


def monty_const(x: int) -> np.uint32:
    """Montgomery-form uint32 scalar for a canonical python int constant."""
    return _U(to_monty_int(x % P))


ONE = _U(MONTY_ONE)
ZERO = _U(0)
TWO = _U(to_monty_int(2))
NEG_ONE = _U(to_monty_int(P - 1))
HALF = _U(to_monty_int((P + 1) // 2))  # 1/2


def from_u32(x):
    """Ingest raw u32 machine words (e.g. event data) as field elements.

    Values must already be < p; use :func:`split_u32` for full 32-bit words.
    """
    return to_monty(x)


def batch_powers(base_int: int, n: int) -> np.ndarray:
    """numpy array [1, b, b^2, ..., b^(n-1)] in Montgomery form (host precompute)."""
    out = np.empty(n, dtype=np.uint32)
    acc = 1
    for i in range(n):
        out[i] = to_monty_int(acc)
        acc = acc * base_int % P
    return out
