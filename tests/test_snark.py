"""BN254 pairing + Groth16 SNARK layer (the gnark-analog wrap backend)."""

import pytest

from zkmips_tpu.snark import bn254_curve as ec
from zkmips_tpu.snark import groth16
from zkmips_tpu.snark.r1cs import ConstraintSystem


def test_curve_membership_and_order():
    assert ec.g1_is_on_curve(ec.G1_GEN)
    assert ec.g2_is_on_curve(ec.G2_GEN)
    assert ec.g1_add(ec.g1_mul(ec.G1_GEN, ec.R - 1), ec.G1_GEN) is None
    assert ec.g2_add(ec.g2_mul(ec.G2_GEN, ec.R - 1), ec.G2_GEN) is None


def test_pairing_bilinearity():
    e = ec.pairing(ec.G1_GEN, ec.G2_GEN)
    assert e != ec.F12_ONE
    assert ec.pairing(ec.g1_mul(ec.G1_GEN, 6), ec.g2_mul(ec.G2_GEN, 7)) == ec.f12_pow(e, 42)
    assert ec.pairing_product_is_one(
        [(ec.G1_GEN, ec.G2_GEN), (ec.g1_neg(ec.G1_GEN), ec.G2_GEN)]
    )


def test_msm_matches_naive():
    pts = [ec.g1_mul(ec.G1_GEN, k) for k in (1, 5, 11, 255, 12345)]
    scalars = [3, 0, 7, 2**200 + 9, ec.R - 2]
    expect = None
    for p, s in zip(pts, scalars):
        expect = ec.g1_add(expect, ec.g1_mul(p, s))
    assert ec.g1_msm(pts, scalars) == expect


def _cubic_cs(x_val):
    cs = ConstraintSystem()
    y = cs.public(x_val**3 + x_val + 5)
    x = cs.witness(x_val)
    t = cs.add(cs.add(cs.mul(cs.mul(x, x), x), x), 5)
    cs.assert_eq(t, y)
    return cs


def test_groth16_roundtrip():
    cs = _cubic_cs(3)
    assert cs.is_satisfied()
    pk, vk = groth16.setup(cs)
    proof = groth16.prove(pk, cs)
    assert groth16.verify(vk, proof, [35])
    assert not groth16.verify(vk, proof, [36])


def test_groth16_bad_witness_rejected():
    cs = _cubic_cs(3)
    cs.values[2] = 4  # corrupt the private witness for x
    assert not cs.is_satisfied()
    with pytest.raises(AssertionError):
        pk, _ = groth16.setup(cs)
        groth16.prove(pk, cs)


def test_r1cs_gadgets():
    cs = ConstraintSystem()
    p = cs.public(11)
    a, b = cs.witness(7), cs.witness(4)
    cond = cs.is_zero(cs.sub(a, 7))
    s = cs.select(cond, cs.add(a, b), 0)
    cs.assert_eq(s, p)
    bits = cs.to_bits(s, 4)
    assert [cs.value(v) for v in bits] == [1, 1, 0, 1]
    assert cs.value(cs.from_bits(bits)) == 11
    assert cs.value(cs.inverse(cs.witness(2))) == pow(2, ec.R - 2, ec.R)
    assert cs.is_satisfied()
    pk, vk = groth16.setup(cs)
    assert groth16.verify(vk, groth16.prove(pk, cs), [11])
