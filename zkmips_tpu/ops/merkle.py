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

TPU-first: every layer is a whole-array Poseidon2 call over all rows at once
(the sponge is ~490 fused VPU modmuls per 16-lane state); host verification
of a single path uses the same code on numpy.
"""

from __future__ import annotations

import numpy as np

from . import poseidon2 as p2

DIGEST_SIZE = 8


class MerkleTree:
    """Prover-side tree: all digest layers retained for opening proofs."""

    def __init__(self, matrices, xp=np):
        assert matrices, "cannot commit to zero matrices"
        self.matrices = list(matrices)
        heights = [m.shape[0] for m in self.matrices]
        for h in heights:
            assert h & (h - 1) == 0, "matrix heights must be powers of two"
        self.max_height = max(heights)

        # group matrices by height, preserving order
        by_height: dict[int, list] = {}
        for m in self.matrices:
            by_height.setdefault(m.shape[0], []).append(m)

        digest_layers = []
        size = self.max_height
        cur = _hash_layer(by_height[size], xp)
        digest_layers.append(cur)
        while size > 1:
            size //= 2
            cur = p2.compress(cur[0::2], cur[1::2])
            if size in by_height:
                injected = _hash_layer(by_height[size], xp)
                cur = p2.compress(cur, injected)
            digest_layers.append(cur)
        self.digest_layers = [np.asarray(layer) for layer in digest_layers]

    @property
    def root(self) -> np.ndarray:
        return self.digest_layers[-1][0]

    def open(self, index: int):
        """Open row ``index`` (of the tallest height): (opened_rows, siblings).

        opened_rows: one (w,) row per matrix (taller matrices indexed by the
        high bits of ``index``).  siblings: (log_max_height, 8) digest path.
        """
        rows = []
        log_max = self.max_height.bit_length() - 1
        for m in self.matrices:
            log_h = m.shape[0].bit_length() - 1
            rows.append(np.asarray(m[index >> (log_max - log_h)]))
        siblings = np.stack(
            [self.digest_layers[k][(index >> k) ^ 1] for k in range(log_max)]
        ) if log_max else np.zeros((0, DIGEST_SIZE), dtype=np.uint32)
        return rows, siblings


def _hash_layer(mats, xp):
    if len(mats) == 1:
        mat = mats[0]
    elif xp is np:
        mat = np.concatenate(mats, axis=1)
    else:
        mat = xp.concatenate(mats, axis=1)
    return p2.hash_matrix_rows(mat)


def verify_opening(
    root: np.ndarray,
    index: int,
    dims: list[tuple[int, int]],
    opened_rows: list[np.ndarray],
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
