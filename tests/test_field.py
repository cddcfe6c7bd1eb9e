"""Field arithmetic golden tests: numpy & jax backends vs python-int reference."""

import numpy as np
import pytest

from zkmips_tpu.ops import ext4, field as f, septic

RNG = np.random.default_rng(0)


def rand_fp(shape):
    return (RNG.integers(0, f.P, size=shape, dtype=np.int64)).astype(np.uint32)


def as_jax(x):
    import jax.numpy as jnp

    return jnp.asarray(x)


@pytest.fixture(params=["numpy", "jax"])
def backend(request):
    return request.param


def conv(x, backend):
    return as_jax(x) if backend == "jax" else x


def test_monty_roundtrip(backend):
    x = rand_fp((1000,))
    m = f.to_monty(conv(x, backend))
    back = np.asarray(f.from_monty(m))
    np.testing.assert_array_equal(back, x)


def test_mul_matches_int(backend):
    a, b = rand_fp((500,)), rand_fp((500,))
    am, bm = f.to_monty(conv(a, backend)), f.to_monty(conv(b, backend))
    got = np.asarray(f.from_monty(f.mul(am, bm)))
    want = (a.astype(np.uint64) * b.astype(np.uint64) % f.P).astype(np.uint32)
    np.testing.assert_array_equal(got, want)


def test_add_sub_neg(backend):
    a, b = rand_fp((500,)), rand_fp((500,))
    am, bm = f.to_monty(conv(a, backend)), f.to_monty(conv(b, backend))
    a64, b64 = a.astype(np.uint64), b.astype(np.uint64)
    np.testing.assert_array_equal(
        np.asarray(f.from_monty(f.add(am, bm))), ((a64 + b64) % f.P).astype(np.uint32)
    )
    np.testing.assert_array_equal(
        np.asarray(f.from_monty(f.sub(am, bm))), ((a64 + f.P - b64) % f.P).astype(np.uint32)
    )
    np.testing.assert_array_equal(
        np.asarray(f.from_monty(f.neg(am))), ((f.P - a64) % f.P).astype(np.uint32)
    )


def test_inv(backend):
    a = rand_fp((200,)) | np.uint32(1)  # nonzero
    am = f.to_monty(conv(a, backend))
    prod = np.asarray(f.from_monty(f.mul(am, f.inv(am))))
    np.testing.assert_array_equal(prod, np.ones_like(a))


def test_monty_constants():
    assert f.to_monty_int(1) == f.MONTY_ONE
    assert (f.MONTY_MU * f.P) % (1 << 32) == 1
    assert f.R2 == pow(1 << 32, 2, f.P)
    # generator sanity: 3 has full order
    assert pow(3, (f.P - 1) // 2, f.P) != 1
    assert pow(3, (f.P - 1) // 127, f.P) != 1
    g24 = f.two_adic_generator_int(24)
    assert pow(g24, 1 << 23, f.P) == f.P - 1  # order exactly 2^24


def test_ext4_irreducible():
    # gcd(X^4 - 3, X^(p^2) - X) == 1 over F_p => no factor of degree <= 2.
    p = f.P

    def polymul(a, b):
        c = [0] * (len(a) + len(b) - 1)
        for i, ai in enumerate(a):
            for j, bj in enumerate(b):
                c[i + j] = (c[i + j] + ai * bj) % p
        # reduce mod X^4 - 3
        while len(c) > 4:
            k = len(c) - 1
            c[k - 4] = (c[k - 4] + 3 * c[k]) % p
            c.pop()
        return c

    # X^(p^2) mod (X^4 - 3)
    e = p * p
    result = [1]
    base = [0, 1]
    while e:
        if e & 1:
            result = polymul(result, base)
        e >>= 1
        base = polymul(base, base)
    # result should NOT equal X (else a root in F_{p^2} exists)
    result = result + [0] * (4 - len(result))
    assert result != [0, 1, 0, 0]


def test_ext4_mul_inv(backend):
    a = f.to_monty(conv(rand_fp((50, 4)), backend))
    b = f.to_monty(conv(rand_fp((50, 4)), backend))
    # associativity + commutativity spot checks
    ab = ext4.mul(a, b)
    ba = ext4.mul(b, a)
    np.testing.assert_array_equal(np.asarray(ab), np.asarray(ba))
    inv_a = ext4.inv(a)
    one = np.asarray(ext4.to_canonical(ext4.mul(a, inv_a)))
    np.testing.assert_array_equal(one[:, 0], np.ones(50, dtype=np.uint32))
    np.testing.assert_array_equal(one[:, 1:], np.zeros((50, 3), dtype=np.uint32))


def test_ext4_frobenius():
    # frob(a) == a^p, checked against pow_const for a random element
    a = f.to_monty(rand_fp((1, 4)))
    frob = np.asarray(ext4.frobenius(a, 1))
    apow = np.asarray(ext4.pow_const(a, f.P))
    np.testing.assert_array_equal(frob, apow)


def test_septic_mul_inv(backend):
    a = f.to_monty(conv(rand_fp((20, 7)), backend))
    inv_a = septic.inv(a)
    one = np.asarray(f.from_monty(septic.mul(a, inv_a)))
    np.testing.assert_array_equal(one[:, 0], np.ones(20, dtype=np.uint32))
    np.testing.assert_array_equal(one[:, 1:], np.zeros((20, 6), dtype=np.uint32))


def test_septic_start_points_on_curve():
    for x, y in [
        (septic.START_X, septic.START_Y),
        (septic.DUMMY_X, septic.DUMMY_Y),
        (septic.DIGEST_START_X, septic.DIGEST_START_Y),
    ]:
        lhs, rhs = septic.is_on_curve(x, y)
        np.testing.assert_array_equal(np.asarray(lhs), np.asarray(rhs))


def test_septic_curve_add_doubles_consistently():
    # (P + P) via add with distinct points: (START + DUMMY) + START == START + (DUMMY + START)
    x1, y1 = septic.START_X, septic.START_Y
    x2, y2 = septic.DUMMY_X, septic.DUMMY_Y
    a = septic.curve_add(*septic.curve_add(x1, y1, x2, y2), x1, y1)
    b = septic.curve_add(x1, y1, *septic.curve_add(x2, y2, x1, y1))
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    # result stays on curve
    lhs, rhs = septic.is_on_curve(a[0], a[1])
    np.testing.assert_array_equal(np.asarray(lhs), np.asarray(rhs))


def test_native_batch_permute_matches_numpy():
    """csrc/p2_batch.c must agree with the numpy lane-vectorized permute and
    the fused row-sponge with the chunked sponge, bit for bit."""
    import numpy as np

    from zkmips_tpu.ops import field as f
    from zkmips_tpu.ops import poseidon2 as p2

    if not p2._p2b():
        import pytest

        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(7)
    x = (rng.integers(0, 2**31, size=(257, 16)) % f.P).astype(np.uint32)
    lib = p2._P2B
    try:
        # force the pure-numpy path for the reference values
        p2._P2B = False
        ref_perm = p2._permute_np(x)
        mat = (rng.integers(0, 2**31, size=(123, 37)) % f.P).astype(np.uint32)
        ref_hash = p2.hash_matrix_rows(mat)
    finally:
        p2._P2B = lib
    assert np.array_equal(p2._permute_np(x), ref_perm)
    assert np.array_equal(p2.hash_matrix_rows(mat), ref_hash)
