"""Guest build tooling: assemble a guest, emit a real mipsel ELF, load it
back through the ELF loader, prove and verify (the cargo-ziren build +
fixture flow, with our asm DSL in place of rustc)."""

import tempfile

from _common import client_from_args, timed

from zkmips_tpu.executor import Executor, Instruction, Opcode, Register, asm
from zkmips_tpu.executor.program import Program
from zkmips_tpu.guest import write_elf

R, O = Register, Opcode


def main():
    client, _ = client_from_args(__doc__)
    body = [
        *asm.li(R.T0, 0), *asm.li(R.T1, 1), *asm.li(R.T2, 64),
        asm.alu(O.ADD, R.T3, R.T0, R.T1),
        Instruction(O.ADD, R.T0, R.T1, 0, False, True),
        Instruction(O.ADD, R.T1, R.T3, 0, False, True),
        asm.addi(R.T2, R.T2, -1 & 0xFFFFFFFF),
        asm.branch(O.BGTZ, R.T2, 0, -20),
        asm.nop(),
    ]
    program = asm.prog(body + asm.halt_sequence())
    elf = write_elf(program)
    with tempfile.NamedTemporaryFile(suffix=".elf", delete=False) as fh:
        fh.write(elf)
        path = fh.name
    print(f"wrote {len(elf)} byte ELF to {path}")

    loaded = Program.from_elf(open(path, "rb").read())
    ex = Executor(loaded)
    records = ex.run()
    print(f"executed {ex.global_clk} cycles from the ELF")
    m = client.machine
    pk = m.setup(loaded)
    proofs = timed("prove", m.prove, pk, records)
    assert m.verify(pk.vk, proofs, loaded)
    print("ELF-built guest proven + verified")


if __name__ == "__main__":
    main()
