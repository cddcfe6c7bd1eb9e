"""SysLinux chip tests: constraint/lookup oracles + prove/verify roundtrip.

Mirrors the reference's sys_linux precompile coverage
(crates/core/machine/src/syscall/precompiles/sys_linux/): a guest issues the
emulated Linux o32 syscalls (brk/mmap/clone/read/write/fcntl/nops and
exit_group) and every row is checked by the constraint and lookup-balance
oracles, then a full prove/verify roundtrip runs with the test FRI config.
"""

from zkmips_tpu.executor import Register, asm
from zkmips_tpu.machine.machine import mips_machine
from zkmips_tpu.stark.machine import StarkConfig

from test_mips_e2e import _debug_machine, _run

R = Register


def _sys(code, a0=0, a1=0):
    return [*asm.li(R.V0, int(code)), *asm.li(R.A0, a0), *asm.li(R.A1, a1), asm.syscall()]


def _linux_body():
    return [
        *_sys(4045, 0),                 # brk(0) -> current brk
        *_sys(4045, 0x20000),           # brk(big) -> a0 (a0 > brk path)
        *_sys(4090, 0, 0x1234),         # mmap2 anonymous (round up to 0x2000)
        *_sys(4210, 0, 0x1000),         # mmap, page-aligned size
        *_sys(4210, 0x7000, 0x800),     # mmap at hint -> returns hint
        *_sys(4120),                    # clone -> 1
        *_sys(4003, 0),                 # read(stdin) -> 0
        *_sys(4003, 5),                 # read(bad fd) -> -1, EBADF
        *asm.li(R.A2, 0), *_sys(4004, 1, 0x2000),  # write(stdout, ptr, 0) -> 0
        *_sys(4055, 1, 3),              # fcntl(stdout, F_GETFL) -> O_WRONLY
        *_sys(4055, 0, 3),              # fcntl(stdin, F_GETFL) -> O_RDONLY
        *_sys(4055, 5, 3),              # fcntl(bad fd) -> -1, EBADF
        *_sys(4055, 2, 1),              # fcntl(stderr, F_GETFD) -> 2
        *_sys(4055, 1, 7),              # fcntl(bad cmd) -> -1, EBADF
        *_sys(4222),                    # gettid -> nop
        *_sys(4263),                    # clock_gettime -> nop
    ]


def test_sys_linux_chip_oracles():
    p, records, ex = _run(_linux_body())
    m = mips_machine(StarkConfig.test())
    _debug_machine(m, p, records)


def test_sys_linux_prove_verify():
    p, records, ex = _run(_linux_body())
    m = mips_machine(StarkConfig.test())
    pk = m.setup(p)
    proofs = m.prove(pk, records)
    assert m.verify(pk.vk, proofs, p)


def test_exit_group_prove_verify():
    body = [*_sys(4246, 0), asm.nop()]
    p = asm.prog(body)
    from zkmips_tpu.executor import Executor

    ex = Executor(p)
    records = ex.run()
    assert ex.exit_code == 0
    m = mips_machine(StarkConfig.test())
    _debug_machine(m, p, records)
    pk = m.setup(p)
    proofs = m.prove(pk, records)
    assert m.verify(pk.vk, proofs, p)


def test_exit_group_nonzero_rejected():
    """A nonzero exit code proves but fails verification (reference
    verify.rs:171-180: exit_code must be zero in every shard)."""
    import pytest

    from zkmips_tpu.stark.machine import VerificationError

    body = [*_sys(4246, 7), asm.nop()]
    p = asm.prog(body)
    from zkmips_tpu.executor import Executor

    ex = Executor(p)
    records = ex.run()
    assert ex.exit_code == 7
    m = mips_machine(StarkConfig.test())
    pk = m.setup(p)
    proofs = m.prove(pk, records)
    from zkmips_tpu.machine.pv import PV_EXIT_CODE

    assert int(proofs[-1].public_values[PV_EXIT_CODE]) == 7
    with pytest.raises(VerificationError, match="exit code"):
        m.verify(pk.vk, proofs, p)
