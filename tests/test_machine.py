"""End-to-end StarkMachine tests on toy chips: constraints, LogUp, preprocessed."""

import numpy as np
import pytest

from zkmips_tpu.ops import field as f
from zkmips_tpu.stark import air, machine as machine_mod
from zkmips_tpu.stark.air import AirBuilder, LookupKind
from zkmips_tpu.stark.chip import BaseAir, Chip
from zkmips_tpu.stark.machine import StarkConfig, StarkMachine, VerificationError


class FibonacciAir(BaseAir):
    name = "Fibonacci"
    main_width = 2

    def eval(self, b: AirBuilder):
        a0, b0 = b.main(0), b.main(1)
        a1, b1 = b.main(0, 1), b.main(1, 1)
        first = b.when_first_row()
        first.assert_zero(a0)
        first.assert_eq(b0, 1)
        t = b.when_transition()
        t.assert_eq(a1, b0)
        t.assert_eq(b1, a0 + b0)
        b.when_last_row().assert_eq(b0, b.public_value(0))

    def generate_trace(self, record, output):
        n = record["fib_rows"]
        t = np.zeros((n, 2), dtype=np.uint32)
        a, bb = 0, 1
        for i in range(n):
            t[i] = (a, bb)
            a, bb = bb, (a + bb) % f.P
        return t


class SenderAir(BaseAir):
    name = "Sender"
    main_width = 2  # [val, is_real]

    def eval(self, b: AirBuilder):
        b.assert_bool(b.main(1))
        b.send(LookupKind.Range, [b.main(0)], b.main(1))

    def generate_trace(self, record, output):
        vals = record["sent_values"]
        t = np.zeros((max(16, len(vals)), 2), dtype=np.uint32)
        for i, v in enumerate(vals):
            t[i] = (v, 1)
        return t


class RangeAir(BaseAir):
    """Preprocessed table 0..63; receives (value) with a multiplicity column."""

    name = "Range"
    main_width = 1
    preprocessed_width = 1

    def eval(self, b: AirBuilder):
        b.receive(LookupKind.Range, [b.preprocessed(0)], b.main(0))

    def generate_preprocessed(self, program):
        return np.arange(64, dtype=np.uint32)[:, None]

    def generate_trace(self, record, output):
        mult = np.zeros((64, 1), dtype=np.uint32)
        for v in record["sent_values"]:
            mult[v, 0] += 1
        return mult


RECORD = {"fib_rows": 16, "sent_values": [3, 5, 5, 60, 0, 0, 0, 7]}


def _fib_pv(n):
    a, bb = 0, 1
    for _ in range(n - 1):
        a, bb = bb, (a + bb) % f.P
    return bb


def _machine():
    chips = [Chip(FibonacciAir(), num_public_values=1), Chip(SenderAir(), 1), Chip(RangeAir(), 1)]
    return StarkMachine(StarkConfig.test(), chips, num_public_values=1)


def test_prove_verify_roundtrip():
    m = _machine()
    pk = m.setup(None)
    pv = np.array([_fib_pv(16)], dtype=np.uint32)
    proof = m.prove_shard(pk, RECORD, pv)
    assert m.verify_shard(pk.vk, proof)


def test_wrong_public_value_rejected():
    m = _machine()
    pk = m.setup(None)
    pv = np.array([12345], dtype=np.uint32)
    with pytest.raises(Exception):
        proof = m.prove_shard(pk, RECORD, pv)  # prover builds it anyway
        m.verify_shard(pk.vk, proof)


def test_unbalanced_lookup_rejected():
    class BadRange(RangeAir):
        def generate_trace(self, record, output):
            mult = super().generate_trace(record, output)
            mult[3, 0] += 1  # receive one extra '3'
            return mult

    chips = [Chip(FibonacciAir(), 1), Chip(SenderAir(), 1), Chip(BadRange(), 1)]
    m = StarkMachine(StarkConfig.test(), chips, num_public_values=1)
    pk = m.setup(None)
    pv = np.array([_fib_pv(16)], dtype=np.uint32)
    proof = m.prove_shard(pk, RECORD, pv)
    with pytest.raises(VerificationError):
        m.verify_shard(pk.vk, proof)


def test_tampered_opened_value_rejected():
    m = _machine()
    pk = m.setup(None)
    pv = np.array([_fib_pv(16)], dtype=np.uint32)
    proof = m.prove_shard(pk, RECORD, pv)
    proof.opened[0].main_local = proof.opened[0].main_local.copy()
    proof.opened[0].main_local[0][0] ^= 1
    with pytest.raises(VerificationError):
        m.verify_shard(pk.vk, proof)


def test_debug_oracles():
    from zkmips_tpu.stark import debug

    fib = Chip(FibonacciAir(), 1)
    t = FibonacciAir().generate_trace(RECORD, None)
    pv = np.array([_fib_pv(16)], dtype=np.uint32)
    debug.debug_constraints(fib, t, publics=pv)

    bad = t.copy()
    bad[7, 0] ^= 1
    with pytest.raises(AssertionError):
        debug.debug_constraints(fib, bad, publics=pv)

    sender, rng_chip = Chip(SenderAir(), 1), Chip(RangeAir(), 1)
    st = SenderAir().generate_trace(RECORD, None)
    rt = RangeAir().generate_trace(RECORD, None)
    rp = RangeAir().generate_preprocessed(None)
    assert debug.debug_lookups([(sender, st, None), (rng_chip, rt, rp)]) == {}
    rt2 = rt.copy()
    rt2[5, 0] += 1
    problems = debug.debug_lookups([(sender, st, None), (rng_chip, rt2, rp)])
    assert air.LookupKind.Range in problems
