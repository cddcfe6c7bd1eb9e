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


def test_fri_fold_roundtrip():
    """FriFold instruction + chip: compare against direct ext math and prove."""
    from zkmips_tpu.ops import ext4
    from zkmips_tpu.ops import field as ff
    import numpy as np

    b = Builder()
    x = b.felt(7)
    z = b.ext(3, 1, 4, 1)
    alpha = b.ext(2, 7, 1, 8)
    mat = [b.ext(10 + i, i, 0, 5) for i in range(3)]
    psz = [b.ext(20 + i, 0, i, 6) for i in range(3)]
    apow = b.ext(1)
    ro = b.ext(0)
    apow2, ro2 = b.fri_fold(x, z, alpha, mat, psz, apow, ro)
    # extract the base coordinates through a BaseAlu (public values are felts)
    from zkmips_tpu.recursion.builder import Felt
    ro_f = b.add(Felt(ro2.addr), b.felt(0))
    ap_f = b.add(Felt(apow2.addr), b.felt(0))
    pv = [ro_f, ap_f] + [b.felt(0) for _ in range(6)]
    b.commit_public_values(pv)
    prog = b.compile()

    m = RecursionMachine(StarkConfig.test())
    rec = m.execute(prog, witness=[])

    # independent expected value
    def mont(t):
        return np.array([ff.to_monty_int(v) for v in t], dtype=np.uint32)

    zv, av = mont((3, 1, 4, 1)), mont((2, 7, 1, 8))
    xz = ext4.sub(mont((7, 0, 0, 0)), zv)
    acc_ro, acc_ap = mont((0, 0, 0, 0)), mont((1, 0, 0, 0))
    for i in range(3):
        px, pz = mont((10 + i, i, 0, 5)), mont((20 + i, 0, i, 6))
        q = ext4.mul(ext4.sub(px, pz), ext4.inv(xz))
        acc_ro = ext4.add(acc_ro, ext4.mul(acc_ap, q))
        acc_ap = ext4.mul(acc_ap, av)
    assert tuple(int(v) for v in ff.from_monty(acc_ro))[0] == rec.public_values[0]

    pk = m.setup(prog)
    proof = m.prove(pk, rec)
    assert m.verify(pk.vk, proof)


def test_hint_bits_and_ext2felts():
    """HintBits + HintExt2Felts + ExpReverseBitsLen interplay: recover
    x = g^rev(idx) from hinted bits, and split an ext into felts."""
    b = Builder()
    v = b.felt(0b1011)
    bits = b.hint_bits(v, 4)
    # recomposition constraint: sum 2^k b_k == v (also forces each write real)
    acc = bits[0]
    for k in range(1, 4):
        acc = b.add(acc, b.mul(bits[k], b.felt(1 << k)))
    e = b.ext(9, 8, 7, 6)
    felts = b.ext2felts(e)
    pv = [acc] + felts + [bits[1], bits[2], bits[3]]
    b.commit_public_values(pv)
    prog = b.compile()
    m = RecursionMachine(StarkConfig.test())
    rec = m.execute(prog, witness=[])
    assert rec.public_values[0] == 0b1011
    assert rec.public_values[1:5] == [9, 8, 7, 6]
    assert rec.public_values[5:] == [1, 0, 1]
    pk = m.setup(prog)
    proof = m.prove(pk, rec)
    assert m.verify(pk.vk, proof)


def test_batch_fri_roundtrip():
    b = Builder()
    from zkmips_tpu.recursion.builder import Felt
    pxs = [b.felt(3 + i) for i in range(4)]
    pzs = [b.ext(7 + i, i, 2 * i, 1) for i in range(4)]
    apows = [b.ext(1, i, 0, 3) for i in range(4)]
    acc = b.batch_fri(pxs, pzs, apows)
    acc_f = b.add(Felt(acc.addr), b.felt(0))
    b.commit_public_values([acc_f] + [b.felt(0)] * 7)
    prog = b.compile()
    m = RecursionMachine(StarkConfig.test())
    rec = m.execute(prog, witness=[])
    # independent expected value
    from zkmips_tpu.ops import ext4
    import numpy as np

    def mont(t):
        return np.array([ff.to_monty_int(v) for v in t], dtype=np.uint32)

    acc_v = mont((0, 0, 0, 0))
    for i in range(4):
        term = ext4.mul(mont((1, i, 0, 3)),
                        ext4.sub(mont((7 + i, i, 2 * i, 1)), mont((3 + i, 0, 0, 0))))
        acc_v = ext4.add(acc_v, term)
    assert int(ff.from_monty(acc_v)[0]) == rec.public_values[0]
    pk = m.setup(prog)
    proof = m.prove(pk, rec)
    assert m.verify(pk.vk, proof)


# ---------------------------------------------------------------------------
# In-DSL shard verifier (recursion/verifier.py)
# ---------------------------------------------------------------------------


def test_circuit_challenger_matches_host():
    from zkmips_tpu.ops import ext4
    from zkmips_tpu.recursion.runtime import RecursionRuntime
    from zkmips_tpu.recursion.verifier import CircuitChallenger
    from zkmips_tpu.stark.challenger import DuplexChallenger

    b = Builder()
    cch = CircuitChallenger(b)
    host = DuplexChallenger()
    rng = np.random.default_rng(7)
    pairs = []
    for i, v in enumerate(int(x) for x in rng.integers(0, ff.P, size=23)):
        cch.observe(b.const_felt(v))
        host.observe(v)
        if i % 5 == 4:
            pairs.append((cch.sample(), host.sample()))
    bits_c, bits_h = cch.sample_bits(10), host.sample_bits(10)
    ec, eh = cch.sample_ext(), host.sample_ext()
    rt = RecursionRuntime(b.compile(), [])
    rt.run()
    for fc, fh in pairs:
        assert rt.memory[fc.addr][0] == fh
    assert sum(rt.memory[v.addr][0] << k for k, v in enumerate(bits_c)) == bits_h
    assert rt.memory[ec.addr] == tuple(int(x) for x in ext4.to_canonical(eh))


def test_assert_eq_op():
    from zkmips_tpu.recursion.runtime import RecursionRuntime

    b = Builder()
    x = b.felt(4)
    y = b.mul(x, x)
    b.assert_eq(y, b.felt(16))
    prog = b.compile()
    RecursionRuntime(prog, []).run()
    m = RecursionMachine(StarkConfig.test())
    pk = m.setup(prog)
    proof = m.prove(pk, m.execute(prog))
    assert m.verify(pk.vk, proof)

    b2 = Builder()
    b2.assert_eq(b2.felt(1), b2.felt(2))
    with pytest.raises(AssertionError):
        RecursionRuntime(b2.compile(), []).run()


def _inner_proof():
    b0 = Builder()
    z = b0.mul(b0.felt(7), b0.felt(35))
    ps = b0.poseidon2([z] + [b0.const_felt(i) for i in range(15)])
    b0.commit_public_values(ps[8:16])
    p0 = b0.compile()
    m = RecursionMachine(StarkConfig.test())
    pk = m.setup(p0)
    proof = m.prove(pk, m.execute(p0))
    return m, pk, proof


def test_shard_verifier_circuit_accepts_and_rejects():
    import copy

    from zkmips_tpu.recursion.runtime import RecursionRuntime
    from zkmips_tpu.recursion.verifier import DigestShardVerifierCircuit

    m, pk, proof = _inner_proof()
    circ = DigestShardVerifierCircuit(m.machine, pk.vk, proof)
    rec = RecursionRuntime(circ.program, circ.witness(proof)).run()
    assert rec.public_values == circ.expected_public_values(proof)

    bad = copy.deepcopy(proof)
    bad.public_values = bad.public_values.copy()
    bad.public_values[0] = (int(bad.public_values[0]) + 1) % ff.P
    with pytest.raises(AssertionError):
        RecursionRuntime(circ.program, circ.witness(bad)).run()

    bad2 = copy.deepcopy(proof)
    bad2.main_root = bad2.main_root.copy()
    bad2.main_root[0] ^= 1
    with pytest.raises(AssertionError):
        RecursionRuntime(circ.program, circ.witness(bad2)).run()

    bad3 = copy.deepcopy(proof)
    ov = bad3.opened[0]
    ov.main_local = ov.main_local.copy()
    ov.main_local[0] = (ov.main_local[0] + 1) % ff.P
    with pytest.raises(AssertionError):
        RecursionRuntime(circ.program, circ.witness(bad3)).run()


@pytest.mark.slow
def test_recursion_of_recursion_proves():
    from zkmips_tpu.recursion.verifier import DigestShardVerifierCircuit

    m, pk, proof = _inner_proof()
    circ = DigestShardVerifierCircuit(m.machine, pk.vk, proof)
    rec = m.execute(circ.program, circ.witness(proof))
    pk1 = m.setup(circ.program)
    proof1 = m.prove(pk1, rec)
    assert m.verify(pk1.vk, proof1)
    assert list(proof1.public_values) == circ.expected_public_values(proof)


def _fake_record(shard: int, start_pc: int, next_pc: int, digest_seed: int):
    """A chain-rule-consistent rec_pv record with a real curve digest."""
    from zkmips_tpu.machine.global_chip import START
    from zkmips_tpu.ops import septic
    from zkmips_tpu.recursion import rec_pv

    rec = [0] * rec_pv.NUM_REC_PV
    x, y, _off = septic.lift_x_int([digest_seed, 1, 2, 3, 4, 5, 6])
    start = ([int(c) for c in START[0]], [int(c) for c in START[1]])
    d = septic.curve_add_int(start, (list(x), list(y)))
    rec[rec_pv.GLOBAL_SUM[0] : rec_pv.GLOBAL_SUM[1]] = list(d[0]) + list(d[1])
    rec[rec_pv.START_PC[0]] = start_pc
    rec[rec_pv.NEXT_PC[0]] = next_pc
    rec[rec_pv.START_SHARD[0]] = shard
    rec[rec_pv.NEXT_SHARD[0]] = shard + 1
    rec[rec_pv.START_EXECUTION_SHARD[0]] = shard
    rec[rec_pv.NEXT_EXECUTION_SHARD[0]] = shard + 1
    rec[rec_pv.CONTAINS_EXECUTION_SHARD[0]] = 1
    rec[rec_pv.CORE_VK_DIGEST[0]] = 77  # same in both children
    return rec


def test_compress_pair_circuit():
    """Two record-structured recursion proofs joined by a
    CompressVerifierCircuit: the fold runs in-circuit (chain rules +
    septic digest sum) and rejects chain-rule violations."""
    import copy

    from zkmips_tpu.recursion import rec_pv
    from zkmips_tpu.recursion.runtime import RecursionRuntime
    from zkmips_tpu.recursion.verifier import CompressVerifierCircuit

    b0 = Builder()
    hints = [b0.hint_felt() for _ in range(rec_pv.NUM_REC_PV)]
    # burn one poseidon2 so the program has hash rows (machine shape)
    b0.poseidon2([hints[0]] + [b0.const_felt(i) for i in range(15)])
    b0.commit_public_values(hints)
    p0 = b0.compile()
    m = RecursionMachine(StarkConfig.test(), num_pv=rec_pv.NUM_REC_PV)
    pk = m.setup(p0)
    rec_l = _fake_record(1, 0x1000, 0x2000, 9)
    rec_r = _fake_record(2, 0x2000, 0, 10)

    def prove_rec(vals):
        wit = [(v, 0, 0, 0) for v in vals]
        return m.prove(pk, m.execute(p0, wit))

    pl = prove_rec(rec_l)
    pr_ = prove_rec(rec_r)

    circ = CompressVerifierCircuit(m.machine, pk.vk, pk.vk, pl, pr_)
    rec = RecursionRuntime(circ.program, circ.witness((pl, pr_))).run()
    assert rec.public_values == rec_pv.fold_records(rec_l, rec_r)
    assert rec.public_values == circ.expected_public_values((pl, pr_))
    folded = rec.public_values
    assert rec_pv.get(folded, rec_pv.START_SHARD) == [1]
    assert rec_pv.get(folded, rec_pv.NEXT_SHARD) == [3]
    assert rec_pv.get(folded, rec_pv.NEXT_PC) == [0]

    # broken pc chain: right child starting at the wrong pc
    rec_bad = _fake_record(2, 0x3000, 0, 10)
    p_bad = prove_rec(rec_bad)
    with pytest.raises(AssertionError):
        RecursionRuntime(circ.program, circ.witness((pl, p_bad))).run()

    # broken shard chain
    rec_bad2 = _fake_record(3, 0x2000, 0, 10)
    p_bad2 = prove_rec(rec_bad2)
    with pytest.raises(AssertionError):
        RecursionRuntime(circ.program, circ.witness((pl, p_bad2))).run()


@pytest.mark.slow
def test_lift_core_shard_circuit():
    """The lift circuit accepts a real MIPS core-machine shard proof."""
    from zkmips_tpu.executor import Executor, Opcode, Register, asm
    from zkmips_tpu.machine.machine import mips_machine
    from zkmips_tpu.recursion.runtime import RecursionRuntime
    from zkmips_tpu.recursion.verifier import ShardVerifierCircuit

    R, O = Register, Opcode
    body = [
        asm.addi(R.A0, 0, 9), asm.addi(R.T0, 0, 0), asm.addi(R.T1, 0, 1),
        asm.alu(O.ADD, R.T2, R.T0, R.T1),
        asm.alu(O.ADD, R.T0, R.T1, R.ZERO),
        asm.alu(O.ADD, R.T1, R.T2, R.ZERO),
        asm.addi(R.A0, R.A0, -1),
        asm.branch(O.BNE, R.A0, R.ZERO, -5 * 4),
        asm.nop(),
    ]
    p = asm.prog(body + asm.halt_sequence())
    records = Executor(p, shard_size=1 << 20).run()
    m = mips_machine(StarkConfig.test(), minimal=True)
    pk = m.setup(p)
    proofs = m.prove(pk, records)
    assert m.verify(pk.vk, proofs, p)

    circ = ShardVerifierCircuit(m.machine, pk.vk, proofs[0])
    rec = RecursionRuntime(circ.program, circ.witness(proofs[0])).run()
    from zkmips_tpu.recursion import rec_pv

    gs = []
    for ov in proofs[0].opened:
        if ov.global_sum is not None:
            gs.extend(int(x) for x in ov.global_sum)
    assert rec.public_values == rec_pv.lift_record(
        pk.vk, proofs[0].public_values, gs, has_cpu=True
    )


@pytest.mark.skipif(
    not __import__("os").environ.get("ZKM_HEAVY_TESTS"),
    reason="full core->compress->shrink->wrap ladder (~6 min); set ZKM_HEAVY_TESTS=1",
)
def test_compress_shrink_wrap_ladder():
    from zkmips_tpu.executor import Executor, Opcode, Register, asm
    from zkmips_tpu.machine.machine import mips_machine
    from zkmips_tpu.recursion.compress import RecursionProver

    R, O = Register, Opcode
    body = [
        asm.addi(R.A0, 0, 9), asm.addi(R.T0, 0, 0), asm.addi(R.T1, 0, 1),
        asm.alu(O.ADD, R.T2, R.T0, R.T1),
        asm.alu(O.ADD, R.T0, R.T1, R.ZERO),
        asm.alu(O.ADD, R.T1, R.T2, R.ZERO),
        asm.addi(R.A0, R.A0, -1),
        asm.branch(O.BNE, R.A0, R.ZERO, -5 * 4),
        asm.nop(),
    ]
    p = asm.prog(body + asm.halt_sequence())
    records = Executor(p, shard_size=128).run()
    m = mips_machine(StarkConfig.test(), minimal=True)
    pk = m.setup(p)
    proofs = m.prove(pk, records)
    rp = RecursionProver(m)
    cp = rp.compress(pk.vk, proofs)
    sp = rp.shrink(cp)
    wp = rp.wrap(sp)
    for stage_proof in (cp, sp, wp):
        assert rp.verify_compressed(pk.vk, p, stage_proof)


def test_vk_map_export_load_roundtrip():
    """vk-map serialization mechanics (prover/src/shapes.rs vk_map analog):
    a fresh prover with only the exported map can resolve final vks."""
    import numpy as np

    from zkmips_tpu.machine.machine import mips_machine
    from zkmips_tpu.recursion.compress import CompressedProof, RecursionProver
    from zkmips_tpu.stark.machine import VerifyingKey

    m = mips_machine(StarkConfig.test(), minimal=True)
    rp = RecursionProver(m)
    inner_root = np.arange(8, dtype=np.uint32)
    fake_vk = VerifyingKey(prep_root=inner_root, prep_heights=[("RecMemConst", 4)])
    outer_root = np.empty(1, dtype=object)
    outer_root[0] = 123456789012345678901234567890
    fake_outer = VerifyingKey(prep_root=outer_root, prep_heights=[("RecPoseidon2", 6)])

    class _PK:
        def __init__(self, vk):
            self.vk = vk

    rp._lift_cache["a"] = (None, _PK(fake_vk))
    rp._shrink_cache["b"] = (None, _PK(fake_outer))
    exported = rp.export_vk_map()

    rp2 = RecursionProver(m)
    rp2.load_vk_map(exported)
    cp = CompressedProof(None, tuple(int(x) for x in inner_root), 1)
    vk = rp2._find_final_vk(cp)
    assert vk.prep_heights == [("RecMemConst", 4)]
    cp_o = CompressedProof(None, (int(outer_root[0]),), 1, stage="wrap")
    vko = rp2._find_final_vk(cp_o)
    assert int(np.asarray(vko.prep_root).reshape(-1)[0]) == int(outer_root[0])
    # JSON file round-trip
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "vk_map.json")
        rp.export_vk_map(path)
        rp3 = RecursionProver(m)
        rp3.load_vk_map(path)
        assert rp3._find_final_vk(cp).prep_heights == [("RecMemConst", 4)]


def test_vk_map_merkle_root_authentication():
    """The exported vk map carries a Merkle root over canonical entry
    encodings; loading verifies it, so a verifier that pins the root rejects
    tampered/extended maps (vkey_proof.rs trust model, host side)."""
    import copy

    import numpy as np
    import pytest

    from zkmips_tpu.machine.machine import mips_machine
    from zkmips_tpu.recursion.compress import RecursionProver
    from zkmips_tpu.recursion.vk_tree import map_entries_root
    from zkmips_tpu.stark.machine import VerificationError, VerifyingKey

    m = mips_machine(StarkConfig.test(), minimal=True)
    rp = RecursionProver(m)

    class _PK:
        def __init__(self, vk):
            self.vk = vk

    rp._lift_cache["a"] = (None, _PK(VerifyingKey(
        prep_root=np.arange(8, dtype=np.uint32), prep_heights=[("RecMemConst", 4)]
    )))
    rp._compress_cache["b"] = (None, _PK(VerifyingKey(
        prep_root=np.arange(8, 16, dtype=np.uint32), prep_heights=[("RecPoseidon2", 6)]
    )))
    exported = rp.export_vk_map()
    root = tuple(int(x) for x in exported["merkle_root"])
    assert root == map_entries_root(exported["vks"])

    # clean load with the pinned root
    rp2 = RecursionProver(m)
    rp2.load_vk_map(exported, expected_root=root)

    # tampered entry -> embedded-root mismatch
    bad = copy.deepcopy(exported)
    bad["vks"][0]["heights"][0][1] = 9
    with pytest.raises(VerificationError, match="merkle root"):
        RecursionProver(m).load_vk_map(bad)

    # extended map with a forged program vk: embedded root updated by the
    # attacker, but the PINNED root rejects it
    forged = copy.deepcopy(exported)
    forged["vks"].append({"root": [str(i) for i in range(100, 108)], "heights": []})
    forged["merkle_root"] = [str(x) for x in map_entries_root(forged["vks"])]
    with pytest.raises(VerificationError, match="pinned"):
        RecursionProver(m).load_vk_map(forged, expected_root=root)


def test_native_runtime_matches_python():
    """Differential: the C recursion interpreter's record must match the
    Python interpreter's field-for-field on a full lift program."""
    import numpy as np
    import pytest

    from zkmips_tpu.executor import Executor, asm
    from zkmips_tpu.executor.opcodes import Register as R
    from zkmips_tpu.machine.machine import mips_machine
    from zkmips_tpu.recursion import native_runtime
    from zkmips_tpu.recursion.compress import RecursionProver
    from zkmips_tpu.recursion.runtime import RecursionRuntime

    if not native_runtime.available():
        pytest.skip("native toolchain unavailable")
    p = asm.prog([*asm.li(R.T0, 5)] + asm.halt_sequence())
    m = mips_machine(StarkConfig.test(), minimal=True)
    ex = Executor(p)
    records = ex.run()
    pk = m.setup(p)
    proofs = m.prove(pk, records)
    rp = RecursionProver(m)
    circ, _rpk = rp._lift_entry(pk.vk, proofs[0])
    wit = circ.witness(proofs[0])
    py = RecursionRuntime(circ.program, wit).run()
    nat = native_runtime.run(circ.program, wit)
    assert nat.public_values == py.public_values
    for name in ("mem_const_events", "base_alu_events", "ext_alu_events",
                 "poseidon2_events", "select_events", "exp_bits_events",
                 "fri_fold_events", "batch_fri_events", "hint_events"):
        a, b = getattr(nat, name), getattr(py, name)
        assert len(a) == len(b), name
        for x, y in zip(a, b):
            assert x == y, (name, x, y)
