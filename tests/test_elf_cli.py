"""ELF loader + CLI tests over a synthesized MIPS32 ELF.

Builds a real little-endian EM_MIPS ET_EXEC image in-memory (genuine MIPS
encodings, not the mini-assembler) and drives it through Program.from_elf
and the ``zkmips_tpu.cli`` surface (reference: program.rs:52-140 +
cargo-ziren).
"""

import struct
import sys

from zkmips_tpu.cli import main as cli_main
from zkmips_tpu.executor.program import Program

# genuine MIPS32 encodings
CODE = [
    0x24080005,  # addiu $t0, $zero, 5
    0x25090007,  # addiu $t1, $t0, 7
    0x01285021,  # addu  $t2, $t1, $t0
    0x34020000,  # ori   $v0, $zero, 0   (HALT syscall id)
    0x34040000,  # ori   $a0, $zero, 0   (exit code)
    0x0000000C,  # syscall
    0x00000000,  # nop (delay/fill)
    0x00000000,
]


def build_elf(code_words, entry=0x1000):
    code = b"".join(struct.pack("<I", w) for w in code_words)
    e_phoff = 52
    p_offset = 0x1000
    ehdr = b"\x7fELF" + bytes([1, 1, 1, 0]) + bytes(8)
    ehdr += struct.pack(
        "<HHIIIIIHHHHHH",
        2,        # ET_EXEC
        8,        # EM_MIPS
        1,        # version
        entry,
        e_phoff,
        0,        # shoff
        0,        # flags
        52,       # ehsize
        32,       # phentsize
        1,        # phnum
        0, 0, 0,  # shentsize, shnum, shstrndx
    )
    phdr = struct.pack(
        "<IIIIIIII",
        1,          # PT_LOAD
        p_offset,
        entry,      # vaddr
        entry,      # paddr
        len(code),  # filesz
        len(code),  # memsz
        0x1 | 0x4,  # PF_X | PF_R
        4,
    )
    blob = ehdr + phdr
    blob += bytes(p_offset - len(blob))
    blob += code
    return blob


def test_from_elf_and_execute():
    p = Program.from_elf(build_elf(CODE))
    assert p.pc_start == 0x1000
    from zkmips_tpu.executor import Executor, Register

    ex = Executor(p)
    ex.run()
    assert ex.register(Register.T0) == 5
    assert ex.register(Register.T1) == 12
    assert ex.register(10) == 17  # $t2
    assert ex.exit_code == 0


def test_from_elf_rejects_garbage():
    import pytest

    with pytest.raises(ValueError, match="not an ELF"):
        Program.from_elf(b"\x00\x01\x02\x03" + bytes(60))
    bad = bytearray(build_elf(CODE))
    bad[18] = 0x3E  # e_machine -> amd64
    with pytest.raises(ValueError, match="not a MIPS ELF"):
        Program.from_elf(bytes(bad))


def test_cli_execute_prove_verify(tmp_path, capsys):
    elf_path = tmp_path / "guest.elf"
    elf_path.write_bytes(build_elf(CODE))
    assert cli_main(["execute", str(elf_path)]) == 0
    out = capsys.readouterr().out
    assert "cycles=" in out and "exit=0" in out

    proof_path = tmp_path / "proof.bin"
    assert cli_main(["prove", str(elf_path), "-o", str(proof_path), "--config", "test"]) == 0
    assert proof_path.exists()
    assert cli_main(["verify", str(elf_path), str(proof_path), "--config", "test"]) == 0
