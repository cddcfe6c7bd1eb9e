"""Mixed-matrix Merkle commitment over Poseidon2-BN254 digests (outer config).

Same layout rules as ``ops/merkle.py`` (equal-height rows concatenated,
taller-first, per-layer injection folds), but each digest is a single BN254
scalar produced by the multi-field sponge over the row's *canonical*
KoalaBear values (reference: crates/recursion/core/src/stark/config.rs:30-32
``OuterValMmcs = MerkleTreeMmcs<KoalaBear, Bn254Fr, OuterHash, OuterCompress, 1>``;
packing fixed by the in-circuit hasher, recursion/circuit/src/hash.rs:172-198).

Digests are numpy object arrays of shape (..., 1) holding Python ints, so the
surrounding PCS/machine code (np.asarray, fancy indexing, stacking) works
unchanged.  Host-side only: the wrap machine is proven once per program.
"""

from __future__ import annotations

import numpy as np

from . import bn254, field as f

DIGEST_SIZE = 1


def _digest_arr(vals: list[int]) -> np.ndarray:
    out = np.empty((len(vals), 1), dtype=object)
    for i, v in enumerate(vals):
        out[i, 0] = int(v)
    return out


def _hash_rows(mat_monty: np.ndarray) -> np.ndarray:
    """(H, w) monty uint32 -> (H, 1) object digests (native batch)."""
    canon = f.from_monty(np.ascontiguousarray(mat_monty, dtype=np.uint32))
    return _digest_arr(bn254.hash_felts_rows(canon))


def _compress_rows(left: np.ndarray, right: np.ndarray) -> np.ndarray:
    return _digest_arr(
        bn254.compress_rows([int(a[0]) for a in left], [int(b[0]) for b in right])
    )


def build_layers(matrices, xp=np):
    heights = [m.shape[0] for m in matrices]
    for h in heights:
        assert h & (h - 1) == 0, "matrix heights must be powers of two"
    max_height = max(heights)
    by_height: dict[int, list] = {}
    for m in matrices:
        by_height.setdefault(m.shape[0], []).append(np.asarray(m))
    layers = []
    size = max_height
    cur = _hash_layer(by_height[size])
    layers.append(cur)
    while size > 1:
        size //= 2
        cur = _compress_rows(cur[0::2], cur[1::2])
        if size in by_height:
            cur = _compress_rows(cur, _hash_layer(by_height[size]))
        layers.append(cur)
    return layers


def _hash_layer(mats):
    mat = mats[0] if len(mats) == 1 else np.concatenate(mats, axis=1)
    return _hash_rows(mat)


class MerkleTree:
    def __init__(self, matrices, xp=np, layers=None):
        assert matrices, "cannot commit to zero matrices"
        self.matrices = [np.asarray(m) for m in matrices]
        self.max_height = max(m.shape[0] for m in self.matrices)
        self.digest_layers = layers if layers is not None else build_layers(self.matrices)

    @property
    def root(self) -> np.ndarray:
        return np.asarray(self.digest_layers[-1][0])

    def open(self, index: int):
        rows, sibs = self.open_many([index])
        return [r[0] for r in rows], sibs[0]

    def open_many(self, indices):
        idx = np.asarray(indices, dtype=np.int64)
        q = len(idx)
        log_max = self.max_height.bit_length() - 1
        rows = []
        for m in self.matrices:
            log_h = m.shape[0].bit_length() - 1
            rows.append(m[idx >> (log_max - log_h)])
        if log_max == 0:
            return rows, np.zeros((q, 0, DIGEST_SIZE), dtype=object)
        sibs = [self.digest_layers[k][(idx >> k) ^ 1] for k in range(log_max)]
        return rows, np.stack(sibs, axis=1)


def verify_openings(root, indices, dims, rows_per_matrix, siblings) -> np.ndarray:
    """Batched opening verification; returns (Q,) bool array."""
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
        return _hash_rows(flat)

    digest = layer_hash(max_height)  # (Q, 1) object
    size = max_height
    for k in range(log_max):
        sib = siblings[:, k]
        bit = (idx >> k) & 1
        digest = _digest_arr(
            [
                bn254.compress(int(s[0]), int(d[0])) if b else bn254.compress(int(d[0]), int(s[0]))
                for d, s, b in zip(digest, sib, bit)
            ]
        )
        size //= 2
        if size in by_height:
            inj = layer_hash(size)
            digest = _compress_rows(digest, inj)
    target = int(np.asarray(root).reshape(-1)[0])
    return np.array([int(d[0]) == target for d in digest], dtype=bool)
