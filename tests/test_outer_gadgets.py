"""KoalaBear-in-Fr gadget layer vs host implementations (snark/gadgets.py).

Every gadget must agree with its host-side counterpart (ops/bn254.py,
stark/challenger_bn254.py) AND leave the R1CS satisfied — the gadgets are
the constraint-level mirror of the outer transcript/hashing, the way the
reference's gnark circuit mirrors Plonky3's outer config
(crates/recursion/gnark-ffi/go/zkm/poseidon2, challenger.rs:236-326).
"""

import random

import numpy as np
import pytest

from zkmips_tpu.ops import bn254, field as ff
from zkmips_tpu.snark import gadgets as g
from zkmips_tpu.snark.r1cs import ConstraintSystem
from zkmips_tpu.stark.challenger_bn254 import MultiField32Challenger


@pytest.fixture(autouse=True)
def _seed():
    random.seed(1234)


def _builder():
    cs = ConstraintSystem()
    return cs, g.OuterBuilder(cs)


def test_permute3_gadget_matches_host():
    cs, b = _builder()
    vals = [random.randrange(g.R) for _ in range(3)]
    state = [b.fr.witness(v, g.R - 1) for v in vals]
    out = g.permute3_gadget(b.fr, state)
    assert [o.value % g.R for o in out] == bn254.permute3(vals)
    assert cs.is_satisfied()


def test_split_32_gadget_matches_host():
    cs, b = _builder()
    for v in [0, 1, g.R - 1, random.randrange(g.R)]:
        fr = b.fr.witness(v, g.R - 1)
        felts = g.split_32_gadget(b, fr, 3)
        assert [f.canonical for f in felts] == bn254.split_32(v, 3)
    assert cs.is_satisfied()


def test_kb_arithmetic_fuzz():
    cs, b = _builder()
    P = ff.P
    xs = [b.hint_felt(random.randrange(P)) for _ in range(8)]
    acc = xs[0]
    want = xs[0].canonical
    for i in range(1, 8):
        acc = b.mul(b.add(acc, xs[i]), b.sub(acc, xs[i]))
        w = xs[i].canonical
        want = (want + w) * (want - w) % P
    assert acc.canonical == want % P
    d = b.div(xs[1], xs[2])
    assert d.canonical * xs[2].canonical % P == xs[1].canonical
    assert cs.is_satisfied()


def test_kb_ext_mul_div_roundtrip():
    cs, b = _builder()
    P = ff.P
    e1 = b.hint_ext([random.randrange(P) for _ in range(4)])
    e2 = b.hint_ext([random.randrange(P) for _ in range(4)])
    em = b.mul(e1, e2)
    ed = b.div(em, e2)
    b.assert_eq(ed, e1)
    assert cs.is_satisfied()


def test_exp_reverse_bits_matches_builder_semantics():
    """bits[0] carries the highest weight (recursion builder semantics)."""
    cs, b = _builder()
    base_v = 12345
    bits_v = [1, 0, 1, 1]
    base = b.hint_felt(base_v)
    bits = [b.num2bits(b.hint_felt(v), 1)[0] for v in bits_v]
    out = b.exp_reverse_bits(base, bits)
    exp = 0
    for bit in bits_v:
        exp = exp * 2 + bit
    assert out.canonical == pow(base_v, exp, ff.P)
    assert cs.is_satisfied()


def test_challenger_gadget_matches_host():
    cs, b = _builder()
    ch_c = g.OuterCircuitChallenger(b)
    ch_h = MultiField32Challenger()
    seq = [random.randrange(ff.P) for _ in range(17)]
    ch_c.observe_slice([b.hint_felt(v) for v in seq])
    ch_h.observe_slice(seq)
    for _ in range(5):
        assert ch_c.sample().canonical == ch_h.sample()
    dig = random.randrange(g.R)
    ch_c.observe_digest(b.fr.witness(dig, g.R - 1))
    ch_h.observe_digest(np.array([dig], dtype=object))
    sc = ch_c.sample_bits(18)
    assert sum(int(bit.fr.value) << i for i, bit in enumerate(sc)) == ch_h.sample_bits(18)
    w = ch_h.clone().grind(4)
    ch_c.check_witness(4, b.hint_felt(w))
    ch_h.check_witness(4, w)
    assert cs.is_satisfied()


def test_hash_and_compress_gadgets_match_host():
    cs, b = _builder()
    row = [random.randrange(ff.P) for _ in range(24)]
    hg = g.hash_felts_gadget(b, [b.hint_felt(v) for v in row])
    assert hg.value % g.R == bn254.hash_felts(row)
    cg = g.compress_gadget(b, b.fr.const(5), b.fr.const(7))
    assert cg.value % g.R == bn254.compress(5, 7)
    assert cs.is_satisfied()


def test_hint_rejects_out_of_range_witness():
    """A tampered (non-canonical) hinted felt must break satisfaction."""
    cs, b = _builder()
    x = b.hint_felt(5)
    # tamper: overwrite the hinted wire with a value >= P
    cs.values[x.fr.lc and max(x.fr.lc)] = ff.P + 5
    assert not cs.is_satisfied()


def test_canonical_fr_bits_check():
    cs, b = _builder()
    v = g.R - 1
    fr = b.fr.witness(v, g.R - 1)
    bits = b.fr.bits_of(g.FrVal(fr.lc, v, g.R - 1), 254)
    b.fr.assert_bits_canonical_fr(bits)
    assert cs.is_satisfied()
    with pytest.raises(AssertionError):
        # R itself (= 0 mod R) hinted as the 254-bit pattern of R would need
        # value R; the eager builder refuses because 0 != R as integers
        fr2 = b.fr.witness(0, g.R - 1)
        bad_bits = []
        for i in range(254):
            bit = (g.R >> i) & 1
            bv = cs.witness(bit)
            cs.enforce(bv, {bv.idx: 1, 0: g.R - 1}, 0)
            bad_bits.append(g.FrVal({bv.idx: 1}, bit, 1))
        recomp = b.fr.linear([(1 << i, bb) for i, bb in enumerate(bad_bits)])
        b.fr.assert_eq(recomp, fr2)  # holds mod R...
        b.fr.assert_bits_canonical_fr(bad_bits)  # ...but canonicity must fail
