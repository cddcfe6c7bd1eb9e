"""Recursion VM + machine roundtrip tests."""

import numpy as np
import pytest

from zkmips_tpu.ops import field as ff
from zkmips_tpu.recursion import Builder, RecursionMachine
from zkmips_tpu.stark.machine import StarkConfig, VerificationError


def _demo_program():
    b = Builder()
    x = b.felt(7)
    y = b.hint_felt()
    z = b.mul(b.add(x, y), b.felt(3))  # (7 + w) * 3
    e1 = b.ext(1, 2, 3, 4)
    e2 = b.ext(5, 6, 7, 8)
    e3 = b.div(b.mul(e1, e2), e2)  # == e1
    bit = b.felt(1)
    s1, s2 = b.select(bit, x, z)
    hashed = b.poseidon2([x] * 4 + [z] * 4 + [s1] * 4 + [s2] * 4)
    b.commit_public_values(hashed[:6] + [z, s1])
    return b.compile()


def test_runtime_semantics():
    prog = _demo_program()
    m = RecursionMachine(StarkConfig.test())
    rec = m.execute(prog, witness=[(35, 0, 0, 0)])
    assert rec.public_values[6] == (7 + 35) * 3
    assert rec.public_values[7] == (7 + 35) * 3  # select(bit=1) swaps z first
    # ext div roundtrip happened without trapping
    assert len(rec.ext_alu_events) == 2


def test_prove_verify_roundtrip():
    prog = _demo_program()
    m = RecursionMachine(StarkConfig.test())
    pk = m.setup(prog)
    rec = m.execute(prog, witness=[(35, 0, 0, 0)])
    proof = m.prove(pk, rec)
    assert m.verify(pk.vk, proof)


def test_tampered_public_value_rejected():
    prog = _demo_program()
    m = RecursionMachine(StarkConfig.test())
    pk = m.setup(prog)
    rec = m.execute(prog, witness=[(35, 0, 0, 0)])
    proof = m.prove(pk, rec)
    proof.public_values = proof.public_values.copy()
    proof.public_values[6] ^= 1
    with pytest.raises(VerificationError):
        m.verify(pk.vk, proof)
