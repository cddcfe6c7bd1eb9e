"""Poseidon2 permutation over KoalaBear, width 16, s-box x^3.

Matches the reference's permutation exactly (reference:
crates/primitives/src/lib.rs:1107-1121 — 8 external + 13 internal rounds with
the RC_16_30 constants; crates/recursion/core/include/poseidon2.hpp — external
M4 "MDS-light" layer and the internal diagonal matrix; s-box degree 3).

Lane-vectorized implementation: the state rides a trailing 16-axis, the
external linear layer runs in uint64 with a single mod-p reduction (the
MDS-light coefficients are tiny), and under JAX the external/internal round
loops are lax.scan'd so a full permutation compiles to a few hundred XLA ops
(critical for the Merkle tree kernels, which instantiate many permutations).
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

_RC = np.array([[f.to_monty_int(c) for c in row] for row in RC_16_30], dtype=np.uint32)
RC_EXT_FIRST = _RC[0:4]  # (4, 16)
RC_INTERNAL = _RC[4:17, 0].copy()  # (13,)
RC_EXT_SECOND = _RC[17:21]  # (4, 16)

_p = f.P
_DIAG_CANON = [
    _p - 2, 1, 2, (_p + 1) >> 1, 3, 4, (_p - 1) >> 1, _p - 3, _p - 4,
    _p - ((_p - 1) >> 8), _p - ((_p - 1) >> 3), _p - 127,
    (_p - 1) >> 8, (_p - 1) >> 3, (_p - 1) >> 4, 127,
]
DIAG = np.array([f.to_monty_int(c) for c in _DIAG_CANON], dtype=np.uint32)

# M4 rows (from the reference's add-chain external layer):
#   out = M4 @ s per 4-lane group, then out += per-position sums across groups
_M4 = np.array(
    [[2, 3, 1, 1], [1, 2, 3, 1], [1, 1, 2, 3], [3, 1, 1, 2]], dtype=np.uint64
)
_P64 = np.uint64(f.P)


_P2B = None  # native batched-permute lib (csrc/p2_batch.c); False = unavailable


def _p2b():
    """Fused C kernel for host batches: ~14x the numpy lane-vectorized path
    (SoA blocks in L1, one pass instead of ~40).  Differentially tested in
    tests/test_field.py::test_native_batch_permute_matches_numpy."""
    global _P2B
    if _P2B is None:
        try:
            import ctypes

            from ..utils.cbuild import build

            lib = ctypes.CDLL(build(
                __file__.rsplit("zkmips_tpu", 1)[0] + "csrc/p2_batch.c",
                extra_flags=("-march=native", "-funroll-loops"),
            ))
            rc = np.ascontiguousarray(_RC)
            dg = np.ascontiguousarray(DIAG)
            lib.zkm_p2b_set_constants(
                rc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                dg.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            )
            lib._rc_keepalive = (rc, dg)
            _P2B = lib
        except Exception:
            _P2B = False
    return _P2B


def _sbox(x):
    return f.mul(f.square(x), x)


def _external_linear(state, xp):
    """MDS-light layer on (..., 16): the reference's add-chain, group-vectorized."""
    sh = state.shape[:-1] + (4, 4)
    s = state.reshape(sh)
    s0, s1, s2, s3 = s[..., 0], s[..., 1], s[..., 2], s[..., 3]
    t01 = f.add(s0, s1)
    t23 = f.add(s2, s3)
    t0123 = f.add(t01, t23)
    t01123 = f.add(t0123, s1)
    t01233 = f.add(t0123, s3)
    o3 = f.add(t01233, f.double(s0))
    o1 = f.add(t01123, f.double(s2))
    o0 = f.add(t01123, t01)
    o2 = f.add(t01233, t23)
    o = xp.stack([o0, o1, o2, o3], axis=-1)  # (..., group, lane-in-group)
    u = f.add(o[..., 0, :], o[..., 1, :])
    v = f.add(o[..., 2, :], o[..., 3, :])
    sums = f.add(u, v)  # (..., 4) per-position sums across groups
    out = f.add(o, sums[..., None, :])
    return out.reshape(state.shape)


def _sum_lanes(state, xp):
    """mod-p sum over the trailing 16-lane axis (tree halving, u32)."""
    x = state
    while x.shape[-1] > 1:
        h = x.shape[-1] // 2
        x = f.add(x[..., :h], x[..., h:])
    return x


def permute(state):
    """Poseidon2 permutation on (..., 16) uint32 Montgomery arrays."""
    xp = f.xp_of(state)
    if getattr(state, "ndim", 1) == 1:
        out = _permute_np(state[None]) if xp is np else _permute_jax(state[None])
        return out[0]
    if xp is np:
        return _permute_np(state)
    return _permute_jax(state)


def _ext_round(state, rc, xp):
    return _external_linear(_sbox(f.add(state, rc)), xp)


def _int_round(state, rc, xp):
    concat = xp.concatenate
    lane0 = _sbox(f.add(state[..., 0:1], rc))
    state = concat([lane0, state[..., 1:]], axis=-1)
    total = _sum_lanes(state, xp)
    return f.add(f.mul(state, DIAG), total)


def _external_linear_lanes(cols):
    """Per-lane add-chain (fastest on numpy: contiguous column ops)."""
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
        acc = out[k]
        for j in range(4, 16, 4):
            acc = f.add(acc, out[j + k])
        sums.append(acc)
    return [f.add(out[j], sums[j % 4]) for j in range(16)]


def _permute_np(state):
    if state.ndim == 2 and state.shape[0] >= 32:
        lib = _p2b()
        if lib:
            import ctypes

            out = np.array(state, dtype=np.uint32, order="C", copy=True)
            lib.zkm_p2b_permute_rows(
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                ctypes.c_uint64(out.shape[0]),
            )
            return out
    cols = [np.ascontiguousarray(state[..., i]) for i in range(WIDTH)]
    cols = _external_linear_lanes(cols)
    for r in range(4):
        cols = [_sbox(f.add(c, np.uint32(RC_EXT_FIRST[r, i]))) for i, c in enumerate(cols)]
        cols = _external_linear_lanes(cols)
    for r in range(ROUNDS_P):
        s0 = _sbox(f.add(cols[0], np.uint32(RC_INTERNAL[r])))
        cols = [s0] + cols[1:]
        total = cols[0]
        for c in cols[1:]:
            total = f.add(total, c)
        cols = [f.add(f.mul(c, np.uint32(DIAG[i])), total) for i, c in enumerate(cols)]
    for r in range(4):
        cols = [_sbox(f.add(c, np.uint32(RC_EXT_SECOND[r, i]))) for i, c in enumerate(cols)]
        cols = _external_linear_lanes(cols)
    return np.stack(cols, axis=-1)


def _permute_jax(state):
    import jax
    import jax.numpy as jnp

    state = _external_linear(state, jnp)

    def ext_body(s, rc):
        return _ext_round(s, rc, jnp), None

    def int_body(s, rc):
        return _int_round(s, rc, jnp), None

    state, _ = jax.lax.scan(ext_body, state, jnp.asarray(RC_EXT_FIRST))
    state, _ = jax.lax.scan(int_body, state, jnp.asarray(RC_INTERNAL))
    state, _ = jax.lax.scan(ext_body, state, jnp.asarray(RC_EXT_SECOND))
    return state


def compress(left, right):
    """2-to-1 compression: TruncatedPermutation<Perm, 2, 8, 16>.

    left/right: (..., 8) -> (..., 8).  (kb31_poseidon2.rs:24 InnerCompress.)
    """
    xp = f.xp_of(left)
    if xp is not np and getattr(left, "ndim", 1) == 2 and left.shape[0] >= 512:
        from . import pallas_p2

        if pallas_p2.available() and left.shape[0] % pallas_p2.BLOCK == 0:
            return pallas_p2.compress(left, right)
    state = xp.concatenate([left, right], axis=-1)
    return permute(state)[..., :OUT]


def hash_matrix_rows(mat):
    """PaddingFreeSponge<Perm, 16, 8, 8> over each row of ``mat`` (n, w).

    Absorbs w columns in rate-8 chunks (overwrite semantics, permute per
    chunk; a trailing partial chunk overwrites only its prefix), then returns
    the first 8 state lanes.  Matches kb31_poseidon2.rs:21 InnerHash.
    """
    xp = f.xp_of(mat)
    n, w = mat.shape
    full = (w // RATE) * RATE
    if xp is not np and w > 0 and n >= 512 and n % 512 == 0:
        from . import pallas_p2

        if pallas_p2.available():
            return pallas_p2.hash_matrix_rows(mat)
    if xp is not np and full >= RATE:
        return _hash_rows_jax(mat, full)
    if xp is np and n >= 32:
        lib = _p2b()
        if lib:
            import ctypes

            m = np.ascontiguousarray(mat, dtype=np.uint32)
            out = np.empty((n, OUT), dtype=np.uint32)
            lib.zkm_p2b_hash_rows(
                m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                ctypes.c_uint64(n), ctypes.c_uint64(w),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            )
            return out
    state = xp.zeros((n, WIDTH), dtype=np.uint32)
    for start in range(0, w, RATE):
        chunk = min(RATE, w - start)
        block = mat[:, start : start + chunk]
        if chunk < RATE:
            pad = state[:, chunk:RATE]
            block = xp.concatenate([block, pad], axis=1)
        state = xp.concatenate([block, state[:, RATE:]], axis=1)
        state = permute(state)
    return state[:, :OUT]


def _hash_rows_jax(mat, full):
    import jax
    import jax.numpy as jnp

    n, w = mat.shape
    chunks = mat[:, :full].reshape(n, full // RATE, RATE).transpose(1, 0, 2)

    def body(state, block):
        state = jnp.concatenate([block, state[:, RATE:]], axis=1)
        return permute(state), None

    # derive the zero state from the input so its sharding/varying axes match
    # the scanned blocks (required under shard_map)
    z = (mat[:, 0] * np.uint32(0))[:, None]
    state = jnp.concatenate([z] * WIDTH, axis=1)
    state, _ = jax.lax.scan(body, state, chunks)
    if full < w:
        chunk = w - full
        block = jnp.concatenate([mat[:, full:], state[:, chunk:RATE]], axis=1)
        state = permute(jnp.concatenate([block, state[:, RATE:]], axis=1))
    return state[:, :OUT]


def hash_flat(values):
    """Sponge-hash a flat 1-D array of field elements -> (8,) digest."""
    return hash_matrix_rows(values.reshape(1, -1))[0]
