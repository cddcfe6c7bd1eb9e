"""Two-adic multiplicative coset domains (host-side protocol objects).

Mirrors Plonky3's ``TwoAdicMultiplicativeCoset`` as used by the reference's
PCS (reference: crates/recursion/circuit/src/fri.rs:131-151 — committed LDE
domains have shift = GENERATOR, x = g * w^rev(idx); quotient-chunk domain
splitting per crates/stark/src/quotient.rs usage).

Shifts are canonical python ints; evaluation-point math for the verifier is
quartic-extension (Montgomery uint32 (4,)) via :mod:`zkmips_tpu.ops.ext4`.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import numpy as np

from ..ops import bits, ext4, field as f


@dataclass(frozen=True)
class Domain:
    """Coset shift * <w> of size 2^log_n, w = two_adic_generator(log_n)."""

    log_n: int
    shift: int = 1

    @property
    def size(self) -> int:
        return 1 << self.log_n

    @property
    def gen(self) -> int:
        return f.two_adic_generator_int(self.log_n)

    def first_point_ext(self) -> np.ndarray:
        return ext4.scalar(self.shift)

    def next_point_ext(self, z: np.ndarray) -> np.ndarray:
        """z * w — the 'next row' opening point."""
        return ext4.mul_base(z, np.uint32(f.to_monty_int(self.gen)))

    def zp_at_point_ext(self, z: np.ndarray) -> np.ndarray:
        """Vanishing polynomial Z(z) = (z/shift)^n - 1 at an ext point."""
        zs = ext4.mul_base(z, np.uint32(f.to_monty_int(f.inv_int(self.shift))))
        return ext4.sub(ext4.pow_const(zs, self.size), ext4.ONE)

    def zp_at_point_int(self, x: int) -> int:
        return (pow(x * f.inv_int(self.shift) % f.P, self.size, f.P) - 1) % f.P

    # -- selectors at an out-of-domain ext point (verifier side) ------------

    def selectors_at_point_ext(self, z: np.ndarray) -> dict:
        """is_first_row, is_last_row, is_transition, inv_zeroifier at z."""
        unshifted = ext4.mul_base(z, np.uint32(f.to_monty_int(f.inv_int(self.shift))))
        z_h = ext4.sub(ext4.pow_const(unshifted, self.size), ext4.ONE)
        one = ext4.ONE.astype(np.uint32)
        first = ext4.sub(unshifted, one)
        g_inv = f.inv_int(self.gen)
        last = ext4.sub(unshifted, ext4.scalar(g_inv))
        return {
            "is_first_row": ext4.mul(z_h, ext4.inv(first)),
            "is_last_row": ext4.mul(z_h, ext4.inv(last)),
            "is_transition": last,
            "inv_zeroifier": ext4.inv(z_h),
        }

    def create_disjoint_domain(self, min_size: int) -> "Domain":
        """Disjoint coset of at least min_size: shift multiplied by GENERATOR."""
        return Domain(max(self.log_n, (min_size - 1).bit_length()), self.shift * f.GENERATOR % f.P)

    def split_domains(self, num_chunks: int) -> list["Domain"]:
        """Split into ``num_chunks`` stride-interleaved sub-cosets."""
        log_chunks = num_chunks.bit_length() - 1
        assert 1 << log_chunks == num_chunks and log_chunks <= self.log_n
        w = self.gen
        return [
            Domain(self.log_n - log_chunks, self.shift * pow(w, i, f.P) % f.P)
            for i in range(num_chunks)
        ]

    def points_natural(self) -> np.ndarray:
        """Canonical u32 points shift*w^i in natural order (host precompute)."""
        pts = bits.powers_canonical_np(self.gen, self.size)
        return ((pts * (self.shift % f.P)) % f.P).astype(np.uint32)


@lru_cache(maxsize=64)
def lde_points_bitrev_monty(log_n: int) -> np.ndarray:
    """Montgomery points of the standard LDE coset g*<w_n> in bitrev order.

    These are the x's of committed matrices (fri.rs:139-151: x = g * w^rev(i)).
    """
    pts = Domain(log_n, f.GENERATOR).points_natural()
    return f.to_monty(pts[bits.bitrev_indices(log_n)])


@lru_cache(maxsize=64)
def fold_inv_2x_monty(log_n: int) -> np.ndarray:
    """1 / (2 * w_n^{rev_{n/2}(t)}) for the FRI fold at layer size 2^log_n.

    The fold runs over the *plain* subgroup (no coset shift): the reduced
    vectors are reinterpreted as evaluations over <w_n> (fri.rs:258-266).
    """
    n = 1 << log_n
    w = f.two_adic_generator_int(log_n)
    # x[t] = w^{rev_{n/2}(t)}: powers in natural order, then bitrev permute
    nat = bits.powers_canonical_np(w, max(n // 2, 1))
    xs = nat[bits.bitrev_indices(log_n - 1)] if log_n > 1 else nat
    two_x = (2 * xs) % f.P
    return f.inv(f.to_monty(two_x.astype(np.uint32)))
