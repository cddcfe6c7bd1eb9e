"""Shape-menu generation from observed trace heights over a guest corpus.

Analog of the reference's shape-finder scripts
(crates/prover/scripts/find_maximal_shapes.rs) + maximal_shapes.json
(crates/core/machine/src/shape/mod.rs:40): run representative guests, record
every shard's per-chip trace heights, and derive one maximal shape per CPU
log-height bucket.  The menu is written to shapes_data.json next to this
module and loaded by ShapeConfig at prover start.

On TPU the menu is the XLA kernel-cache key: a new program whose shards all
land on menu shapes triggers zero new stage compiles.

Run:  python -m zkmips_tpu.machine.shape_gen
"""

from __future__ import annotations

import json
import os

from .shapes import DATA_PATH, lattice_log


def observe_heights(machine, records) -> list[dict]:
    """Per-record {chip_name: rows} using the machine's real trace builders
    (exactly what prove_shard pads, stark/machine.py:234-238)."""
    out = []
    for record in records:
        machine.generate_dependencies(record)
        record.byte_lookups.pop("arrays", None)
        heights = {}
        for chip in machine.machine.chips:
            if not chip.air.included(record):
                continue
            t = chip.air.generate_trace(record, None)
            heights[chip.name] = int(t.shape[0])
        record.byte_lookups.pop("arrays", None)
        out.append(heights)
    return out


def corpus_programs() -> list:
    """Representative guests: ALU-heavy (fib at several scales crossing shard
    boundaries), memory-heavy, each precompile family, and the reference's
    shipped compiled ELF when present."""
    from ..executor import Instruction, Opcode, Register, asm

    R, O = Register, Opcode
    progs = []

    def fib(n):
        body = [
            *asm.li(R.T0, 0), *asm.li(R.T1, 1), *asm.li(R.T2, n),
            asm.alu(O.ADD, R.T3, R.T0, R.T1),
            Instruction(O.ADD, R.T0, R.T1, 0, False, True),
            Instruction(O.ADD, R.T1, R.T3, 0, False, True),
            asm.addi(R.T2, R.T2, -1 & 0xFFFFFFFF),
            asm.branch(O.BGTZ, R.T2, 0, -20),
            asm.nop(),
        ]
        return asm.prog(body + asm.halt_sequence())

    for n in (100, 3_000, 40_000, 200_000):
        progs.append(("fib%d" % n, fib(n)))

    def memory_sweep(words):
        body = [*asm.li(R.T0, 0x2000), *asm.li(R.T1, words)]
        body += [
            asm.sw(R.T1, R.T0),
            asm.lw(R.T2, R.T0),
            asm.addi(R.T0, R.T0, 4),
            asm.addi(R.T1, R.T1, -1 & 0xFFFFFFFF),
            asm.branch(O.BGTZ, R.T1, 0, -20),
            asm.nop(),
        ]
        return asm.prog(body + asm.halt_sequence())

    progs.append(("mem20k", memory_sweep(20_000)))

    def mixed(n):
        body = [*asm.li(R.T0, 1), *asm.li(R.T1, 3), *asm.li(R.T2, n)]
        body += [
            asm.alu(O.MUL, R.T3, R.T0, R.T1),
            asm.alu(O.XOR, R.T4, R.T3, R.T2),
            asm.alu(O.SLT, R.T5, R.T4, R.T1),
            asm.alu(O.SLL, R.T6, R.T4, R.T1),
            asm.alu(O.DIVU, R.T7, R.T4, R.T1),
            asm.addi(R.T2, R.T2, -1 & 0xFFFFFFFF),
            asm.branch(O.BGTZ, R.T2, 0, -24),
            asm.nop(),
        ]
        return asm.prog(body + asm.halt_sequence())

    progs.append(("mixed30k", mixed(30_000)))

    # precompile guests (reuse the examples' builders)
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(DATA_PATH), "..", "..", "examples"))
    try:
        from keccak_precompile import keccak_guest

        progs.append(("keccak", keccak_guest(b"shape corpus " * 64)))
    except Exception:
        pass
    try:
        from sha256_precompile import sha256_guest

        progs.append(("sha256", sha256_guest(b"shape corpus guest")))
    except Exception:
        pass
    try:
        from poseidon2_precompile import poseidon2_guest

        progs.append(("poseidon2", poseidon2_guest(list(range(16)))))
    except Exception:
        pass

    # keccak-chain (the bench's second headline guest) at two scales
    def keccak_chain(n_iters):
        KECCAK_SPONGE = 0x01010009
        IN, OUT = 0x2000, 0x3000
        body = []
        for i in range(36):
            w = 0x01 if i == 8 else (0x80000000 if i == 33 else 0)
            body += [*asm.li(R.T0, w), *asm.li(R.T1, IN + 4 * i), asm.sw(R.T0, R.T1)]
        body += [*asm.li(R.T0, 36), *asm.li(R.T1, OUT + 64), asm.sw(R.T0, R.T1)]
        body += [*asm.li(R.S0, n_iters)]
        loop = [*asm.li(R.V0, KECCAK_SPONGE), *asm.li(R.A0, IN), *asm.li(R.A1, OUT),
                asm.syscall()]
        for i in range(8):
            loop += [*asm.li(R.T1, OUT + 4 * i), asm.lw(R.T0, R.T1),
                     *asm.li(R.T2, IN + 4 * i), asm.sw(R.T0, R.T2)]
        loop += [asm.addi(R.S0, R.S0, -1 & 0xFFFFFFFF)]
        nloop = len(loop)
        loop += [asm.branch(O.BGTZ, R.S0, 0, -4 * (nloop + 1)), asm.nop()]
        return asm.prog(body + loop + asm.halt_sequence())

    for n in (600, 12_000):
        progs.append(("keccak_chain%d" % n, keccak_chain(n)))

    ref_elf = "/root/reference/crates/prover/elf/mipsel-zkm-zkvm-elf"
    if os.path.exists(ref_elf):
        from ..executor.program import Program

        progs.append(("ref_elf", Program.from_elf(open(ref_elf, "rb").read())))
    return progs


def generate_menu(shard_size: int = 1 << 20, margin: int = 0) -> list[dict]:
    """Execute the corpus, bucket shard height-vectors by CPU log height,
    and emit one maximal shape per bucket (+ per deferred-shard family)."""
    from ..executor import execute_for_proving
    from ..stark.machine import StarkConfig
    from .machine import MipsMachine

    m = MipsMachine(StarkConfig.core(), use_shapes=False)
    buckets: dict[str, dict[str, int]] = {}
    # chips whose presence at scale defines a shape family (the reference's
    # distinct precompile shape clusters, shape/mod.rs): keying on them keeps
    # e.g. keccak-heavy guests from inflating the plain-ALU buckets
    FAMILY_CHIPS = (
        "KeccakSponge", "ShaCompress", "ShaExtend", "Poseidon2Permute",
        "Uint256Mul", "U256x2048Mul",
    )
    for name, prog in corpus_programs():
        records, _info = execute_for_proving(prog, shard_size=shard_size)
        for heights in observe_heights(m, records):
            fams = "".join(
                "+%s" % c for c in FAMILY_CHIPS
                if heights.get(c, 0) > (1 << 10)
            )
            if "Cpu" in heights:
                key = "cpu%d%s" % (lattice_log(heights["Cpu"]), fams)
            else:
                fam = max(heights, key=lambda n: heights[n])
                key = "deferred-%s-%d" % (fam, lattice_log(heights[fam]))
            b = buckets.setdefault(key, {})
            for n, h in heights.items():
                b[n] = max(b.get(n, 0), lattice_log(h) + margin)
    menu = [
        {"key": k, "log_heights": dict(sorted(v.items()))}
        for k, v in sorted(buckets.items())
    ]
    return menu


def main(additive: bool = True):
    """Regenerate the menu.  ``additive`` (default): existing entries are
    kept VERBATIM and only new keys are appended — existing guests keep
    their exact shapes, so the persistent XLA kernel cache stays warm."""
    menu = generate_menu()
    if additive and os.path.exists(DATA_PATH):
        old = json.load(open(DATA_PATH)).get("shapes", [])
        old_keys = {s["key"] for s in old}
        menu = old + [s for s in menu if s["key"] not in old_keys]
    with open(DATA_PATH, "w") as fh:
        json.dump({"version": 1, "shapes": menu}, fh, indent=1, sort_keys=True)
    print("wrote %d shapes -> %s" % (len(menu), DATA_PATH))
    for s in menu:
        print(" ", s["key"], s["log_heights"])


if __name__ == "__main__":
    main()
