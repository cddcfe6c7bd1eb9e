"""Prove the reference's shipped compiled guest ELF
(crates/prover/elf/mipsel-zkm-zkvm-elf — a Rust guest built with the
reference's own toolchain) end to end: execute, prove every shard, run the
full shard-chain verifier, and print the committed public values."""

import os

from _common import client_from_args, timed

from zkmips_tpu.executor import Executor
from zkmips_tpu.executor.program import Program

ELF = "/root/reference/crates/prover/elf/mipsel-zkm-zkvm-elf"


def main():
    client, _ = client_from_args(__doc__)
    if not os.path.exists(ELF):
        print("reference ELF not present; nothing to do")
        return
    program = Program.from_elf(open(ELF, "rb").read())
    ex = Executor(program)
    records = ex.run()
    print(f"executed {ex.global_clk} cycles, exit {ex.exit_code}")
    print(f"public values stream: {bytes(ex.public_values_stream)!r}")
    m = client.machine
    pk = m.setup(program)
    proofs = timed("prove", m.prove, pk, records)
    assert m.verify(pk.vk, proofs, program)
    print(f"verified {len(proofs)} shard(s); committed digest:",
          [hex(w) for w in ex.committed_value_digest])


if __name__ == "__main__":
    main()
