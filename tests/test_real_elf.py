"""End-to-end proving of the reference's shipped compiled guest ELF.

This is the real-guest gate (reference crates/prover/elf/mipsel-zkm-zkvm-elf,
a Rust guest compiled for mipsel-zkm-zkvm): it exercises the full entrypoint
syscall surface — WRITE to stdout + public-values fd, COMMIT, and
COMMIT_DEFERRED_PROOFS (syscall 0x1A) — through execute, prove, and the full
shard-chain verifier.
"""

import os

import pytest

from zkmips_tpu.executor import Executor
from zkmips_tpu.executor.program import Program
from zkmips_tpu.machine.machine import MipsMachine
from zkmips_tpu.machine.pv import (
    PV_DEFERRED_DIGEST,
    PV_DIGEST,
    PV_EXECUTION_SHARD,
    PV_EXIT_CODE,
)
from zkmips_tpu.stark.machine import StarkConfig, VerificationError

ELF = "/root/reference/crates/prover/elf/mipsel-zkm-zkvm-elf"

pytestmark = pytest.mark.skipif(not os.path.exists(ELF), reason="reference ELF not present")


@pytest.fixture(scope="module")
def proven():
    p = Program.from_elf(open(ELF, "rb").read())
    ex = Executor(p)
    ex.write_stdin((10).to_bytes(4, "little"))
    records = ex.run()
    m = MipsMachine(StarkConfig.test())
    pk = m.setup(p)
    proofs = m.prove(pk, records)
    return p, ex, m, pk, proofs


def test_real_elf_executes(proven):
    p, ex, m, pk, proofs = proven
    assert ex.exit_code == 0
    assert bytes(ex.public_values_stream).endswith(b"hello world")
    # syscall surface: HALT, WRITE, COMMIT, COMMIT_DEFERRED_PROOFS
    assert any(c == 0x1A for c in ex.report_syscall_counts)


def test_real_elf_prove_verify(proven):
    p, ex, m, pk, proofs = proven
    assert m.verify(pk.vk, proofs, p)
    pv = [int(x) for x in proofs[-1].public_values]
    assert pv[PV_EXIT_CODE] == 0
    assert pv[PV_EXECUTION_SHARD] == 1
    # the guest committed a sha256 digest of its public values stream
    words = [
        pv[PV_DIGEST + 2 * i] | (pv[PV_DIGEST + 2 * i + 1] << 16) for i in range(8)
    ]
    assert words == ex.committed_value_digest
    deferred = pv[PV_DEFERRED_DIGEST : PV_DEFERRED_DIGEST + 8]
    assert deferred == [x % 0x7F000001 for x in ex.deferred_proofs_digest]


def test_real_elf_pv_tamper_rejected(proven):
    p, ex, m, pk, proofs = proven
    import copy

    bad = copy.deepcopy(proofs)
    pv = bad[-1].public_values
    pv[PV_DIGEST] = (int(pv[PV_DIGEST]) + 1) % 0x7F000001
    with pytest.raises(VerificationError):
        m.verify(pk.vk, bad, p)
