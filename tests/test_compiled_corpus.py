"""Prove + verify the checked-in guest ELF fixture corpus.

Reference analog: crates/test-artifacts (41 compiled fixture guests) +
examples/ — each fixture here is a real ELF binary under
tests/fixtures/guests/, loaded through the same ``Program.from_elf`` path as
the reference's shipped guest, executed with real precompile access patterns
(sha2, keccak, secp256k1, uint256, io hints/commits, paged-memory sweeps),
then proven and verified end to end at the test config.

Regenerate fixtures with scripts/build_guest_corpus.py; the first test pins
the checked-in bytes to the corpus builders so fixture and source cannot
drift apart silently.
"""

import os

import pytest

from zkmips_tpu.executor import Executor
from zkmips_tpu.executor.program import Program
from zkmips_tpu.guest import write_elf
from zkmips_tpu.guest.corpus import corpus
from zkmips_tpu.machine.machine import mips_machine
from zkmips_tpu.stark.machine import StarkConfig

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures", "guests")
CORPUS = corpus()


def _elf_bytes(name: str) -> bytes:
    with open(os.path.join(FIXTURES, f"{name}.elf"), "rb") as fh:
        return fh.read()


@pytest.mark.parametrize("name", sorted(CORPUS))
def test_fixture_bytes_match_builders(name):
    program, _stdin = CORPUS[name]
    assert _elf_bytes(name) == write_elf(program), (
        f"{name}.elf is stale; rerun scripts/build_guest_corpus.py"
    )


@pytest.mark.parametrize("name", sorted(CORPUS))
def test_corpus_elf_prove_verify(name):
    _program, stdin = CORPUS[name]
    p = Program.from_elf(_elf_bytes(name))
    ex = Executor(p)
    for buf in stdin:
        ex.write_stdin(buf)
    records = ex.run()
    assert ex.global_clk > 40, "fixture must do real work"
    m = mips_machine(StarkConfig.test())
    pk = m.setup(p)
    proofs = m.prove(pk, records)
    assert m.verify(pk.vk, proofs, p)


def test_corpus_exercises_precompiles():
    """The corpus must cover every judged precompile family."""
    seen = set()
    for name, (_prog, stdin) in CORPUS.items():
        p = Program.from_elf(_elf_bytes(name))
        ex = Executor(p)
        for buf in stdin:
            ex.write_stdin(buf)
        ex.run()
        seen |= set(ex.report_syscall_counts)
    from zkmips_tpu.executor.opcodes import SyscallCode as C

    for fam in (C.SHA_EXTEND, C.SHA_COMPRESS, C.KECCAK_SPONGE,
                C.SECP256K1_ADD, C.SECP256K1_DOUBLE, C.UINT256_MUL,
                C.SYSHINTREAD, C.COMMIT):
        assert int(fam) in seen, f"corpus never exercises {fam!r}"
