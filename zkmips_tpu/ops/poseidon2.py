"""Poseidon2 permutation over KoalaBear, width 16, s-box x^3.

Matches the reference's permutation exactly (reference:
crates/primitives/src/lib.rs:1107-1121 — 8 external + 13 internal rounds with
the RC_16_30 constants; crates/recursion/core/include/poseidon2.hpp — external
M4 "MDS-light" layer and the internal diagonal matrix
POSEIDON2_INTERNAL_MATRIX_DIAG_16_KOALABEAR_MONTY, poseidon2_constants.hpp:1064;
the s-box degree 3 is visible in poseidon2_wide.hpp:40-44).

Round structure (Plonky3 Poseidon2):
  state <- external_linear(state)                     # initial layer
  4 x  [ state += rc_r; sbox each; external_linear ]  # first half
  13 x [ s0 += rc; s0 = sbox(s0); internal_linear ]   # partial rounds
  4 x  [ state += rc_r; sbox each; external_linear ]  # second half

All functions operate on uint32 Montgomery-form arrays shaped (..., 16) and
are numpy / jax.numpy agnostic — the same code is the host challenger and the
TPU Merkle kernel.  On TPU the batch axis maps to VPU sublanes; the full
permutation is ~490 modmuls of straight-line code that XLA fuses aggressively.
"""

from __future__ import annotations

import numpy as np

from . import field as f
from ._poseidon2_rc import RC_16_30

WIDTH = 16
RATE = 8
OUT = 8
ROUNDS_F = 8
ROUNDS_P = 13

# --- round constants (crates/primitives/src/lib.rs:1107-1121) ---------------
# rows 0..4 -> first external half; rows 4..17 col 0 -> internal; rows 17..21
# -> second external half.
_RC = np.array([[f.to_monty_int(c) for c in row] for row in RC_16_30], dtype=np.uint32)
RC_EXT_FIRST = _RC[0:4]  # (4, 16)
RC_INTERNAL = _RC[4:17, 0].copy()  # (13,)
RC_EXT_SECOND = _RC[17:21]  # (4, 16)

# --- internal diagonal (poseidon2_constants.hpp:1083) -----------------------
_p = f.P
_DIAG_CANON = [
    _p - 2, 1, 2, (_p + 1) >> 1, 3, 4, (_p - 1) >> 1, _p - 3, _p - 4,
    _p - ((_p - 1) >> 8), _p - ((_p - 1) >> 3), _p - 127,
    (_p - 1) >> 8, (_p - 1) >> 3, (_p - 1) >> 4, 127,
]
DIAG = np.array([f.to_monty_int(c) for c in _DIAG_CANON], dtype=np.uint32)


def _sbox(x):
    return f.mul(f.square(x), x)


def _external_linear(cols: list):
    """MDS-light layer on a list of 16 (...,)-arrays (poseidon2.hpp:21-50)."""
    out = list(cols)
    for i in range(0, 16, 4):
        s0, s1, s2, s3 = out[i], out[i + 1], out[i + 2], out[i + 3]
        t01 = f.add(s0, s1)
        t23 = f.add(s2, s3)
        t0123 = f.add(t01, t23)
        t01123 = f.add(t0123, s1)
        t01233 = f.add(t0123, s3)
        out[i + 3] = f.add(t01233, f.double(s0))
        out[i + 1] = f.add(t01123, f.double(s2))
        out[i] = f.add(t01123, t01)
        out[i + 2] = f.add(t01233, t23)
    sums = []
    for k in range(4):
        s = out[k]
        for j in range(4, 16, 4):
            s = f.add(s, out[j + k])
        sums.append(s)
    return [f.add(out[j], sums[j % 4]) for j in range(16)]


def permute(state):
    """Poseidon2 permutation on (..., 16) uint32 Montgomery arrays."""
    xp = f.xp_of(state)
    cols = [state[..., i] for i in range(WIDTH)]
    cols = _external_linear(cols)
    for r in range(4):
        cols = [_sbox(f.add(c, np.uint32(RC_EXT_FIRST[r, i]))) for i, c in enumerate(cols)]
        cols = _external_linear(cols)
    for r in range(ROUNDS_P):
        s0 = _sbox(f.add(cols[0], np.uint32(RC_INTERNAL[r])))
        cols = [s0] + cols[1:]
        total = cols[0]
        for c in cols[1:]:
            total = f.add(total, c)
        cols = [f.add(f.mul(c, np.uint32(DIAG[i])), total) for i, c in enumerate(cols)]
    for r in range(4):
        cols = [_sbox(f.add(c, np.uint32(RC_EXT_SECOND[r, i]))) for i, c in enumerate(cols)]
        cols = _external_linear(cols)
    return xp.stack(cols, axis=-1)


def _jnp():
    import jax.numpy as jnp

    return jnp


def compress(left, right):
    """2-to-1 compression: TruncatedPermutation<Perm, 2, 8, 16>.

    left/right: (..., 8) -> (..., 8).  (kb31_poseidon2.rs:24 InnerCompress.)
    """
    xp = f.xp_of(left)
    state = xp.concatenate([left, right], axis=-1)
    return permute(state)[..., :OUT]


def hash_matrix_rows(mat):
    """PaddingFreeSponge<Perm, 16, 8, 8> over each row of ``mat`` (n, w).

    Absorbs w columns in chunks of 8 (overwrite semantics, permute per chunk —
    the last partial chunk only overwrites its prefix), then returns the first
    8 state elements.  Matches kb31_poseidon2.rs:21 InnerHash / p3
    PaddingFreeSponge.  Returns (n, 8).
    """
    xp = f.xp_of(mat)
    n, w = mat.shape
    z = xp.zeros((n,), dtype=np.uint32)
    cols = [z] * WIDTH
    for start in range(0, w, RATE):
        chunk = min(RATE, w - start)
        for i in range(chunk):
            cols[i] = mat[:, start + i]
        state = xp.stack(cols, axis=-1)
        state = permute(state)
        cols = [state[..., i] for i in range(WIDTH)]
    return xp.stack(cols[:OUT], axis=-1)


def hash_flat(values):
    """Sponge-hash a flat 1-D array of field elements -> (8,) digest.

    Equivalent to the reference's poseidon2_hash(Vec<KoalaBear>)
    (crates/primitives/src/lib.rs:1125).
    """
    xp = f.xp_of(values)
    return hash_matrix_rows(values.reshape(1, -1))[0]
