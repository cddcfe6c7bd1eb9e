"""Command-line tool: the analog of cargo-ziren (crates/cli) plus the remote
prover service entrypoint.

  python -m zkmips_tpu.cli execute  <guest.elf> [--stdin-hex ...]
  python -m zkmips_tpu.cli prove    <guest.elf> -o proof.bin [--config test]
                                    [--mode core|compressed|groth16]
                                    [--endpoint http://host:port]
  python -m zkmips_tpu.cli verify   <guest.elf> proof.bin
  python -m zkmips_tpu.cli vkey     <guest.elf>
  python -m zkmips_tpu.cli serve    [--port 9090] [--config core] [--device]
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="zkmips")
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name in ("execute", "prove", "verify", "vkey", "serve"):
        c = sub.add_parser(name)
        if name != "serve":
            c.add_argument("elf")
        if name == "prove":
            c.add_argument("-o", "--output", default="proof.bin")
            c.add_argument("--mode", default="core", choices=["core", "compressed", "groth16"])
            c.add_argument("--endpoint", default=None, help="remote prover service URL")
        if name == "verify":
            c.add_argument("proof")
        if name == "serve":
            c.add_argument("--port", type=int, default=9090)
            c.add_argument("--host", default="127.0.0.1")
        c.add_argument("--stdin-hex", action="append", default=[], help="hint buffer (hex)")
        c.add_argument("--config", default="core", choices=["core", "test"])
        c.add_argument("--device", action="store_true", help="prove on the TPU path")
        c.add_argument("--shapes", action="store_true", help="fixed-shape padding")
    args = ap.parse_args(argv)

    from .sdk import ProverClient, ZKMStdin
    from .sdk.client import ProofWithPublicValues, load_elf
    from .stark.machine import StarkConfig

    config = StarkConfig.test() if args.config == "test" else StarkConfig.core()

    if args.cmd == "serve":
        from .sdk.network import ProverServer

        server = ProverServer(
            client=ProverClient.new(config=config, device=args.device),
            host=args.host, port=args.port,
        )
        print(f"prover service listening on http://{args.host}:{server.port}")
        try:
            server.httpd.serve_forever()
        except KeyboardInterrupt:
            pass
        return 0

    program = load_elf(args.elf)
    stdin = ZKMStdin()
    for h in args.stdin_hex:
        stdin.write_bytes(bytes.fromhex(h))
    backend_kw = {}
    if args.cmd == "prove" and args.endpoint:
        backend_kw = {"backend": "network", "endpoint": args.endpoint}
    client = ProverClient.new(config=config, device=args.device, **backend_kw)

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
        proof = client.prove(pk, program, stdin, mode=args.mode)
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
