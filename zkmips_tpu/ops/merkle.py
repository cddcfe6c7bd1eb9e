"""Mixed-matrix Merkle commitment (MMCS) over Poseidon2-KoalaBear digests.

Commits to a batch of row-major matrices with (possibly different)
power-of-two heights in a single Merkle tree, mirroring the reference's
Plonky3 ``MerkleTreeMmcs`` usage in its FRI PCS (reference:
crates/stark/src/kb31_poseidon2.rs:18-44 — InnerHash is a width-16 rate-8
PaddingFreeSponge, InnerCompress a 2-to-1 truncated permutation, DIGEST_SIZE
8).

Layout rules (must match between prover and verifier):
  * Matrices are hashed in the order given; matrices of equal height have
    their rows concatenated before row-hashing.
  * The leaf layer corresponds to the tallest height.  Going up, after each
    2-to-1 compression, if matrices exist whose height equals the new layer
    size, their row-hashes are folded in with one extra compression.

The layer build is backend-agnostic and jit-safe (static shapes); digest
layers stay on-device until queried — ``open_many`` gathers all query rows
and sibling paths in one batched indexing pass per level.
"""

from __future__ import annotations

import numpy as np

from . import field as f, poseidon2 as p2

DIGEST_SIZE = 8


def build_layers(matrices, xp=np):
    """Digest layers bottom-up for the mixed-height batch (jit-safe)."""
    heights = [m.shape[0] for m in matrices]
    for h in heights:
        assert h & (h - 1) == 0, "matrix heights must be powers of two"
    max_height = max(heights)
    by_height: dict[int, list] = {}
    for m in matrices:
        by_height.setdefault(m.shape[0], []).append(m)
    layers = []
    size = max_height
    cur = _hash_layer(by_height[size], xp)
    layers.append(cur)
    while size > 1:
        size //= 2
        cur = p2.compress(cur[0::2], cur[1::2])
        if size in by_height:
            cur = p2.compress(cur, _hash_layer(by_height[size], xp))
        layers.append(cur)
    return layers


def _hash_layer(mats, xp):
    mat = mats[0] if len(mats) == 1 else xp.concatenate(mats, axis=1)
    return p2.hash_matrix_rows(mat)


class MerkleTree:
    """Prover-side tree: all digest layers retained for opening proofs."""

    def __init__(self, matrices, xp=np, layers=None):
        assert matrices, "cannot commit to zero matrices"
        self.matrices = list(matrices)
        self.max_height = max(m.shape[0] for m in self.matrices)
        self.digest_layers = layers if layers is not None else build_layers(self.matrices, xp)

    @property
    def root(self) -> np.ndarray:
        return np.asarray(self.digest_layers[-1][0])

    def open(self, index: int):
        """Open row ``index``: (opened_rows per matrix, siblings (L, 8))."""
        rows, sibs = self.open_many([index])
        return [r[0] for r in rows], sibs[0]

    def open_many(self, indices):
        """Batched openings: ([per-matrix (Q, w)], (Q, L, 8)) as numpy.

        On the device path every gather runs in one jitted call and the
        results travel in a single flat transfer — per-op dispatch latency
        over the chip tunnel dominates otherwise."""
        idx = np.asarray(indices, dtype=np.int64)
        q = len(idx)
        log_max = self.max_height.bit_length() - 1
        if not isinstance(self.matrices[0], np.ndarray):
            flat = np.asarray(self._open_flat(idx, log_max))
            rows, sibs, _off = self._unpack_flat(flat, q, log_max)
            return rows, sibs
        rows = []
        for m in self.matrices:
            log_h = m.shape[0].bit_length() - 1
            rows.append(m[idx >> (log_max - log_h)])
        if log_max == 0:
            return rows, np.zeros((q, 0, DIGEST_SIZE), dtype=np.uint32)
        sibs = [self.digest_layers[k][(idx >> k) ^ 1] for k in range(log_max)]
        return rows, np.stack(sibs, axis=1)

    def _unpack_flat(self, flat: np.ndarray, q: int, log_max: int, off: int = 0):
        rows = []
        for m in self.matrices:
            w = m.shape[1]
            rows.append(flat[off:off + q * w].reshape(q, w))
            off += q * w
        n_sib = log_max * q * DIGEST_SIZE
        sibs = flat[off:off + n_sib].reshape(log_max, q, DIGEST_SIZE).transpose(1, 0, 2) \
            if log_max else np.zeros((q, 0, DIGEST_SIZE), dtype=np.uint32)
        return rows, sibs, off + n_sib

    def _open_flat(self, idx: np.ndarray, log_max: int):
        from ..stark.jit_util import cached_jit

        log_hs = tuple(m.shape[0].bit_length() - 1 for m in self.matrices)
        widths = tuple(m.shape[1] for m in self.matrices)
        key = (log_max, log_hs, widths, len(idx), len(self.digest_layers))

        def make():
            import jax.numpy as jnp

            def body(i, mats, layers):
                parts = [
                    m[i >> (log_max - lh)].reshape(-1)
                    for m, lh in zip(mats, log_hs)
                ]
                parts += [
                    layers[k][(i >> k) ^ 1].reshape(-1) for k in range(log_max)
                ]
                return jnp.concatenate(parts) if parts else jnp.zeros(0, jnp.uint32)

            return body

        fn = cached_jit("mmcs_open", key, make)
        return fn(idx, tuple(self.matrices), tuple(self.digest_layers))


def open_many_multi(trees: list, indices_list: list):
    """Open several trees (each with its own index vector) in ONE device
    dispatch + ONE flat transfer.

    The per-round `tree.open_many` calls in pcs.open_batches each cost a
    tunnel roundtrip (~4 per shard: prep/main/perm/quotient); this fuses
    them.  Host trees fall back to per-tree opens.  Returns
    [(rows_per_matrix, sibs)] in tree order, numpy."""
    if not trees:
        return []
    if isinstance(trees[0].matrices[0], np.ndarray):
        return [t.open_many(i) for t, i in zip(trees, indices_list)]
    from ..stark.jit_util import cached_jit

    qs = tuple(len(i) for i in indices_list)
    log_maxes = tuple(t.max_height.bit_length() - 1 for t in trees)
    specs = tuple(
        (lm, tuple(m.shape[0].bit_length() - 1 for m in t.matrices),
         tuple(m.shape[1] for m in t.matrices), q)
        for t, lm, q in zip(trees, log_maxes, qs)
    )

    def make():
        import jax.numpy as jnp

        def body(idxs, mats_per_tree, layers_per_tree):
            parts = []
            for (log_max, log_hs, _ws, _q), i, mats, layers in zip(
                specs, idxs, mats_per_tree, layers_per_tree
            ):
                parts += [
                    m[i >> (log_max - lh)].reshape(-1)
                    for m, lh in zip(mats, log_hs)
                ]
                parts += [layers[k][(i >> k) ^ 1].reshape(-1) for k in range(log_max)]
            return jnp.concatenate(parts) if parts else jnp.zeros(0, jnp.uint32)

        return body

    fn = cached_jit("mmcs_open_multi", specs, make)
    flat = np.asarray(fn(
        tuple(np.asarray(i, dtype=np.int64) for i in indices_list),
        tuple(tuple(t.matrices) for t in trees),
        tuple(tuple(t.digest_layers[:lm]) for t, lm in zip(trees, log_maxes)),
    ))
    out, off = [], 0
    for t, lm, q in zip(trees, log_maxes, qs):
        rows, sibs, off = t._unpack_flat(flat, q, lm, off)
        out.append((rows, sibs))
    return out


def _take(arr, idx):
    if isinstance(arr, np.ndarray):
        return arr[idx]
    import jax.numpy as jnp

    return jnp.take(arr, jnp.asarray(idx), axis=0)


def verify_opening(
    root: np.ndarray,
    index: int,
    dims: list,
    opened_rows: list,
    siblings: np.ndarray,
) -> bool:
    """Verify a single-row opening against ``root``.

    dims: (height, width) of each committed matrix, in commitment order.
    """
    heights = [h for h, _ in dims]
    max_height = max(heights)
    log_max = max_height.bit_length() - 1

    by_height: dict[int, list[np.ndarray]] = {}
    for (h, _w), row in zip(dims, opened_rows):
        by_height.setdefault(h, []).append(np.asarray(row, dtype=np.uint32))

    def layer_hash(h: int) -> np.ndarray:
        rows = by_height[h]
        flat = rows[0] if len(rows) == 1 else np.concatenate(rows)
        return p2.hash_flat(flat)

    digest = layer_hash(max_height)
    idx = index
    size = max_height
    for k in range(log_max):
        sib = siblings[k]
        if idx & 1:
            digest = p2.compress(sib, digest)
        else:
            digest = p2.compress(digest, sib)
        idx >>= 1
        size //= 2
        if size in by_height:
            digest = p2.compress(digest, layer_hash(size))
    return bool(np.array_equal(digest, np.asarray(root)))


def verify_openings(root, indices, dims, rows_per_matrix, siblings) -> np.ndarray:
    """Batched verify_opening over Q queries (numpy-vectorized per layer).

    indices (Q,), rows_per_matrix[m] (Q, w_m), siblings (Q, L, 8);
    returns a (Q,) bool array.
    """
    idx = np.asarray(indices, dtype=np.int64)
    heights = [h for h, _ in dims]
    max_height = max(heights)
    log_max = max_height.bit_length() - 1

    by_height: dict[int, list[np.ndarray]] = {}
    for (h, _w), rows in zip(dims, rows_per_matrix):
        by_height.setdefault(h, []).append(np.asarray(rows, dtype=np.uint32))

    def layer_hash(h: int) -> np.ndarray:
        rows = by_height[h]
        flat = rows[0] if len(rows) == 1 else np.concatenate(rows, axis=1)
        return p2.hash_matrix_rows(flat)

    digest = layer_hash(max_height)                      # (Q, 8)
    size = max_height
    for k in range(log_max):
        sib = np.asarray(siblings[:, k], dtype=np.uint32)
        bit = ((idx >> k) & 1)[:, None].astype(bool)
        left = np.where(bit, sib, digest)
        right = np.where(bit, digest, sib)
        digest = p2.compress(left, right)
        size //= 2
        if size in by_height:
            digest = p2.compress(digest, layer_hash(size))
    return np.all(digest == np.asarray(root)[None, :], axis=1)
