"""Command-line tool: the analog of cargo-ziren (crates/cli).

  python -m zkmips_tpu.cli execute  <guest.elf> [--stdin-hex ...]
  python -m zkmips_tpu.cli prove    <guest.elf> -o proof.bin [--config test]
  python -m zkmips_tpu.cli verify   <guest.elf> proof.bin
  python -m zkmips_tpu.cli vkey     <guest.elf>
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="zkmips")
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name in ("execute", "prove", "verify", "vkey"):
        c = sub.add_parser(name)
        c.add_argument("elf")
        if name == "prove":
            c.add_argument("-o", "--output", default="proof.bin")
        if name == "verify":
            c.add_argument("proof")
        c.add_argument("--stdin-hex", action="append", default=[], help="hint buffer (hex)")
        c.add_argument("--config", default="core", choices=["core", "test"])
        c.add_argument("--device", action="store_true", help="prove on the TPU path")
        c.add_argument("--shapes", action="store_true", help="fixed-shape padding")
    args = ap.parse_args(argv)

    from .sdk import ProverClient, ZKMStdin
    from .sdk.client import ProofWithPublicValues, load_elf
    from .stark.machine import StarkConfig

    program = load_elf(args.elf)
    stdin = ZKMStdin()
    for h in args.stdin_hex:
        stdin.write_bytes(bytes.fromhex(h))
    config = StarkConfig.test() if args.config == "test" else StarkConfig.core()
    client = ProverClient.new(config=config, device=args.device)

    if args.cmd == "execute":
        rep = client.execute(program, stdin)
        print(f"cycles={rep.total_instruction_count} exit={rep.exit_code}")
        if rep.public_values:
            print("public_values:", rep.public_values.hex())
        return 0
    if args.cmd == "vkey":
        _pk, vk = client.setup(program)
        root = vk.prep_root
        print("vk:", "-".join(f"{int(x):08x}" for x in root) if root is not None else "(no preprocessed)")
        return 0
    if args.cmd == "prove":
        pk, vk = client.setup(program)
        proof = client.prove(pk, program, stdin)
        proof.save(args.output)
        print(f"proof written to {args.output} ({proof.size_bytes():,} bytes)")
        return 0
    if args.cmd == "verify":
        pk, vk = client.setup(program)
        proof = ProofWithPublicValues.load(args.proof)
        ok = client.verify(vk, proof, program)
        print("verification:", "OK" if ok else "FAILED")
        return 0 if ok else 1
    return 1


if __name__ == "__main__":
    sys.exit(main())
