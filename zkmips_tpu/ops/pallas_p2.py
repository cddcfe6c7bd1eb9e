"""Pallas TPU kernels for Poseidon2-KoalaBear hashing (width 16, rate 8).

Why these exist: the jnp Poseidon2 path materializes the (n, 16) sponge
state in HBM between rounds/chunks (lax.scan carries), and its trailing
16-lane axis occupies 16 of the VPU's 128 lanes.  On the measured deployment
every HBM pass costs ~33 µs/MB while fused VPU compute is effectively free,
so hashing ran ~20x off the memory roofline.  These kernels keep the state
in VMEM for the whole sponge (HBM traffic = one read of the matrix + one
digest write) and hold it TRANSPOSED as (16, B) so the row-block axis rides
the 128-lane dimension.

Protocol semantics are identical to ops/poseidon2.py (PaddingFreeSponge /
TruncatedPermutation of kb31_poseidon2.rs:21-24); differential tests:
tests/test_pallas_kernels.py.
"""

from __future__ import annotations

import functools

import numpy as np

from . import field as f
from .poseidon2 import DIAG, OUT, RATE, RC_EXT_FIRST, RC_EXT_SECOND, RC_INTERNAL, WIDTH

# row-block size: 512 lanes x 16 sublanes x 4 B = 32 KB state in VMEM;
# matrix tiles add B x w x 4 (w <= ~256) <= 512 KB
BLOCK = 512

_AVAILABLE: bool | None = None


def available() -> bool:
    """True when the default JAX backend can run Mosaic TPU kernels."""
    global _AVAILABLE
    if _AVAILABLE is None:
        import os

        if os.environ.get("ZKMIPS_NO_PALLAS"):
            _AVAILABLE = False
            return False
        try:
            import jax

            _AVAILABLE = jax.default_backend() == "tpu"
        except Exception:
            _AVAILABLE = False
    return _AVAILABLE


def _sbox(x):
    return f.mul(f.mul(x, x), x)


def _ext_linear_T(s, jnp):
    """MDS-light layer on (16, B): M4 per 4-row group + cross-group sums."""
    g = s.reshape(4, 4, -1)  # (group, pos, B)
    s0, s1, s2, s3 = g[:, 0], g[:, 1], g[:, 2], g[:, 3]  # each (4, B)
    t01 = f.add(s0, s1)
    t23 = f.add(s2, s3)
    t0123 = f.add(t01, t23)
    t01123 = f.add(t0123, s1)
    t01233 = f.add(t0123, s3)
    o3 = f.add(t01233, f.add(s0, s0))
    o1 = f.add(t01123, f.add(s2, s2))
    o0 = f.add(t01123, t01)
    o2 = f.add(t01233, t23)
    o = jnp.stack([o0, o1, o2, o3], axis=1)  # (group, pos, B)
    sums_pairs = f.add(o[0], o[1])
    sums = f.add(sums_pairs, f.add(o[2], o[3]))  # (4, B) per-position sums
    return f.add(o, sums[None]).reshape(16, -1)


# (21, 16) full round-constant table: 4 ext, 13 internal (lane 0 only,
# rest zero -- adding 0 to untouched lanes is harmless since only lane 0's
# sbox uses the constant), 4 ext
_RC_ALL = np.zeros((21, 16), dtype=np.uint32)
_RC_ALL[0:4] = RC_EXT_FIRST
_RC_ALL[4:17, 0] = RC_INTERNAL
_RC_ALL[17:21] = RC_EXT_SECOND
_DIAG_COL = np.ascontiguousarray(DIAG[:, None])


def permute_T(state, jnp, rc, diag_col):
    """Full Poseidon2 permutation on a (16, B) Montgomery u32 array (value
    semantics — usable inside Pallas kernels; fully unrolled rounds).

    ``rc``: (21, 16) round-constant value (_RC_ALL), ``diag_col``: (16, 1) —
    passed as kernel inputs because Pallas forbids captured array constants.
    """
    state = _ext_linear_T(state, jnp)
    for r in range(4):
        state = _ext_linear_T(_sbox(f.add(state, rc[r][:, None])), jnp)
    for r in range(4, 17):
        lane0 = _sbox(f.add(state[0:1], rc[r : r + 1, 0:1]))
        state = jnp.concatenate([lane0, state[1:]], axis=0)
        g = state.reshape(4, 4, -1)
        tp = f.add(f.add(g[0], g[1]), f.add(g[2], g[3]))  # (4, B)
        total = f.add(f.add(tp[0:1], tp[1:2]), f.add(tp[2:3], tp[3:4]))  # (1, B)
        state = f.add(f.mul(state, diag_col), total)
    for r in range(17, 21):
        state = _ext_linear_T(_sbox(f.add(state, rc[r][:, None])), jnp)
    return state


@functools.lru_cache(maxsize=None)
def _hash_rows_call(n: int, w: int, block: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_chunks = (w + RATE - 1) // RATE
    full = (w // RATE) * RATE

    def kernel(rc_ref, diag_ref, mat_ref, out_ref):
        rc, diag = rc_ref[:], diag_ref[:]
        matT = mat_ref[:].T  # (w, B) — one in-VMEM transpose
        b = matT.shape[1]
        state = jnp.zeros((WIDTH, b), dtype=jnp.uint32)
        for c in range(n_chunks):
            start = c * RATE
            chunk = min(RATE, w - start)
            blk = matT[start : start + chunk]
            if chunk < RATE:
                blk = jnp.concatenate([blk, state[chunk:RATE]], axis=0)
            state = jnp.concatenate([blk, state[RATE:]], axis=0)
            state = permute_T(state, jnp, rc, diag)
        out_ref[:] = state[:OUT].T

    grid = n // block
    const_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    def call(mat):
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[const_spec, const_spec,
                      pl.BlockSpec((block, w), lambda i: (i, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((block, OUT), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, OUT), jnp.uint32),
        )(jnp.asarray(_RC_ALL), jnp.asarray(_DIAG_COL), mat)

    return call


# rows per pallas_call: fixed so the Mosaic kernel compiles once per WIDTH
# (trace heights vary per shard/stage; widths are structural)
CHUNK = 1 << 16


def hash_matrix_rows(mat):
    """PaddingFreeSponge row hashes of a device (n, w) matrix -> (n, 8).

    Calls a fixed-row-count kernel per 2^16-row chunk (one compile per
    width); falls back to the jnp path for shapes the kernel doesn't cover
    (tiny n or n not a multiple of the block)."""
    import jax.numpy as jnp

    n, w = mat.shape
    block = BLOCK
    if n % block or w == 0:
        from . import poseidon2 as p2

        return p2.hash_matrix_rows(mat)
    if n <= CHUNK:
        return _hash_rows_call(n, w, block)(mat)
    fn = _hash_rows_call(CHUNK, w, block)
    outs = [fn(mat[i : i + CHUNK]) for i in range(0, n, CHUNK)]
    return jnp.concatenate(outs, axis=0)


@functools.lru_cache(maxsize=None)
def _compress_call(n: int, block: int):
    """Pairwise compress (n, 16) -> (n/2, 8): one Merkle level."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(rc_ref, diag_ref, pairs_ref, out_ref):
        st = pairs_ref[:].T  # (16, B)
        out_ref[:] = permute_T(st, jnp, rc_ref[:], diag_ref[:])[:OUT].T

    grid = n // block
    const_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    def call(pairs):
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[const_spec, const_spec,
                      pl.BlockSpec((block, 16), lambda i: (i, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((block, OUT), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, OUT), jnp.uint32),
        )(jnp.asarray(_RC_ALL), jnp.asarray(_DIAG_COL), pairs)

    return call


def compress(left, right):
    """2-to-1 digest compression on device arrays (n, 8) x 2 -> (n, 8)."""
    import jax.numpy as jnp

    n = left.shape[0]
    if n % BLOCK:
        from . import poseidon2 as p2

        return p2.compress(left, right)
    pairs = jnp.concatenate([left, right], axis=1)
    if n <= CHUNK:
        return _compress_call(n, BLOCK)(pairs)
    fn = _compress_call(CHUNK, BLOCK)
    outs = [fn(pairs[i : i + CHUNK]) for i in range(0, n, CHUNK)]
    return jnp.concatenate(outs, axis=0)


def tree_levels(digests, max_k: int = 9):
    """All Merkle levels above ``digests`` (n, 8) -> [(n/2, 8), ..., (1, 8)].

    Each level's 2-to-1 compression runs in the Pallas kernel (pair rows
    interleaved by XLA outside it — Mosaic cannot reshape across the lane
    dim); levels below the kernel block fall back to the jnp path.  Tree
    traffic is ~3 digest rows per leaf, small next to leaf hashing."""
    import jax.numpy as jnp

    from . import poseidon2 as p2

    levels = []
    cur = digests
    while cur.shape[0] > 1:
        n_pairs = cur.shape[0] // 2
        if n_pairs % BLOCK == 0:
            pairs = jnp.concatenate([cur[0::2], cur[1::2]], axis=1)
            cur = _compress_call(n_pairs, BLOCK)(pairs)
        else:
            cur = p2.compress(cur[0::2], cur[1::2])
        levels.append(cur)
    return levels
