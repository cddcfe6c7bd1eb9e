"""Deferred-proof aggregation end to end (machine/deferred.rs:43,113 analog):
guest A's proof is compressed, then guest B *verifies A's proof inside the
zkVM* (VERIFY_ZKM_PROOF + COMMIT_DEFERRED_PROOFS), and the recursion layer
proves the deferred chain with DeferredVerifierCircuit — the chain tail must
match the deferred_proofs_digest guest B committed into its public values."""

import numpy as np
import pytest

from zkmips_tpu.executor import Executor, asm
from zkmips_tpu.executor.opcodes import Opcode, Register
from zkmips_tpu.machine.machine import MipsMachine, mips_machine
from zkmips_tpu.ops import field as ff
from zkmips_tpu.stark.machine import StarkConfig, VerificationError

R, O = Register, Opcode


def _sys(code, a0=0, a1=0):
    return [*asm.li(R.V0, int(code)), *asm.li(R.A0, a0), *asm.li(R.A1, a1), asm.syscall()]


def _store_words(addr, words):
    out = []
    for i, w in enumerate(words):
        out += [*asm.li(R.T0, int(w)), *asm.li(R.T1, addr + 4 * i), asm.sw(R.T0, R.T1)]
    return out


@pytest.mark.slow
def test_deferred_proof_aggregation():
    from zkmips_tpu.machine.alu import AddSubAir, BitwiseAir, LtAir
    from zkmips_tpu.machine.branch import BranchAir
    from zkmips_tpu.machine.byte import ByteAir
    from zkmips_tpu.machine.cpu import CpuAir
    from zkmips_tpu.machine.global_chip import GlobalAir
    from zkmips_tpu.machine.jump import JumpAir
    from zkmips_tpu.machine.memory_bridge import (
        MemoryGlobalFinalizeAir,
        MemoryGlobalInitAir,
        MemoryLocalAir,
    )
    from zkmips_tpu.machine.memory_instr import MemoryInstrAir
    from zkmips_tpu.machine.program import ProgramAir
    from zkmips_tpu.machine.shift import ShiftLeftAir, ShiftRightAir
    from zkmips_tpu.machine.syscall_instr import SyscallInstrAir
    from zkmips_tpu.recursion.compress import RecursionProver
    from zkmips_tpu.recursion.verifier import rolling_deferred_digest

    airs = [
        CpuAir(), AddSubAir(), BitwiseAir(), LtAir(), ShiftLeftAir(),
        ShiftRightAir(), BranchAir(), JumpAir(), MemoryInstrAir(),
        SyscallInstrAir(), MemoryLocalAir(), MemoryGlobalInitAir(),
        MemoryGlobalFinalizeAir(), GlobalAir(), ProgramAir(), ByteAir(),
    ]

    def machine():
        return MipsMachine(StarkConfig.test(), chip_airs=[type(a)() for a in airs])

    # ---- guest A: commits nothing, just runs and halts --------------------
    mA = machine()
    progA = asm.prog([*asm.li(R.T0, 5)] + asm.halt_sequence())
    exA = Executor(progA)
    recordsA = exA.run()
    pkA = mA.setup(progA)
    proofsA = mA.prove(pkA, recordsA)
    rp = RecursionProver(mA)
    cpA = rp.compress(pkA.vk, proofsA)
    assert rp.verify_compressed(pkA.vk, progA, cpA)

    child_vk = rp._find_final_vk(cpA)
    vk_root = [int(x) for x in ff.from_monty(np.asarray(child_vk.prep_root))]
    child_pv = [int(x) for x in cpA.proof.public_values]
    from zkmips_tpu.recursion.verifier import record_digest

    child_pvd = record_digest(child_pv)
    chain1 = rolling_deferred_digest([0] * 8, vk_root, child_pv)

    # ---- guest B: verifies A's proof in-VM and commits the chain ----------
    VKEY_PTR, PVD_PTR = 0x2000, 0x2100
    body = _store_words(VKEY_PTR, vk_root) + _store_words(PVD_PTR, child_pvd)
    body += _sys(0x1B, VKEY_PTR, PVD_PTR)  # VERIFY_ZKM_PROOF
    for i, w in enumerate(chain1):
        body += _sys(0x1A, i, w)  # COMMIT_DEFERRED_PROOFS
    progB = asm.prog(body + asm.halt_sequence())
    exB = Executor(progB)
    checked = {}

    def subproof_verifier(proof, proof_vk, vkey, pv_digest):
        assert vkey == vk_root and pv_digest == child_pvd
        rp.rec.verify(proof_vk, proof)
        checked["ok"] = True

    exB.subproof_verifier = subproof_verifier
    exB.proof_stream.append((cpA.proof, child_vk))
    recordsB = exB.run()
    assert checked.get("ok"), "subproof verifier did not run"
    assert exB.deferred_proofs_digest == chain1

    mB = machine()
    pkB = mB.setup(progB)
    proofsB = mB.prove(pkB, recordsB)
    assert mB.verify(pkB.vk, proofsB, progB)
    from zkmips_tpu.machine.pv import PV_DEFERRED_DIGEST

    pv = [int(x) for x in proofsB[-1].public_values]
    assert pv[PV_DEFERRED_DIGEST : PV_DEFERRED_DIGEST + 8] == chain1

    # ---- recursion: prove the deferred chain + compress guest B -----------
    rpB = RecursionProver(mB)
    dp, new_digest = rp.prove_deferred(cpA, [0] * 8)
    assert new_digest == chain1
    cpB = rpB.compress(pkB.vk, proofsB)
    assert rpB.verify_compressed(pkB.vk, progB, cpB)

    # the chain verifier walks the deferred proofs against B's commitment
    # (proof lookup rides rp's caches; vk map export/load also carries them)
    rp.verify_deferred([dp], cpB)

    # tampered chain values rejected (the proof's pv binds (prev, new))
    import copy

    bad = copy.deepcopy(dp)
    bad.new_digest = list(bad.new_digest)
    bad.new_digest[0] = (bad.new_digest[0] + 1) % ff.P
    with pytest.raises(VerificationError):
        rp.verify_deferred([bad], cpB)
