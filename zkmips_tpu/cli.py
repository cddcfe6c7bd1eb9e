"""Command-line tool: the analog of cargo-ziren (crates/cli) plus the remote
prover service entrypoint.

  python -m zkmips_tpu.cli execute  <guest.elf> [--stdin-hex ...]
  python -m zkmips_tpu.cli prove    <guest.elf> -o proof.bin [--config test]
                                    [--mode core|compressed|groth16]
                                    [--endpoint http://host:port]
  python -m zkmips_tpu.cli verify   <guest.elf> proof.bin
  python -m zkmips_tpu.cli vkey     <guest.elf>
  python -m zkmips_tpu.cli serve    [--port 9090] [--config core] [--device]
  python -m zkmips_tpu.cli warmup   [--quick]   precompile the shape-menu
                                    stage kernels into the persistent cache
  python -m zkmips_tpu.cli solidity-verifier <groth16_vk.bin> [-o out.sol]
                                    render the on-chain Groth16 verifier
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(prog="zkmips")
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name in ("execute", "prove", "verify", "vkey", "serve", "warmup",
                 "solidity-verifier"):
        c = sub.add_parser(name)
        if name not in ("serve", "warmup", "solidity-verifier"):
            c.add_argument("elf")
        if name == "solidity-verifier":
            c.add_argument("vk_bin", help="gnark-format Groth16 vk bytes")
            c.add_argument("-o", "--output", default="ZKMVerifier.sol")
        if name == "prove":
            c.add_argument("-o", "--output", default="proof.bin")
            c.add_argument("--mode", default="core", choices=["core", "compressed", "groth16"])
            c.add_argument("--endpoint", default=None, help="remote prover service URL")
        if name == "verify":
            c.add_argument("proof")
        if name == "serve":
            c.add_argument("--port", type=int, default=9090)
            c.add_argument("--host", default="127.0.0.1")
        if name == "warmup":
            c.add_argument("--quick", action="store_true",
                           help="small workloads only (skip full-shard shapes)")
        c.add_argument("--stdin-hex", action="append", default=[], help="hint buffer (hex)")
        c.add_argument("--config", default="core", choices=["core", "test"])
        c.add_argument("--device", action="store_true", help="prove on the TPU path")
        c.add_argument("--shapes", action="store_true", help="fixed-shape padding")
    args = ap.parse_args(argv)

    from .sdk import ProverClient, ZKMStdin
    from .sdk.client import ProofWithPublicValues, load_elf
    from .stark.machine import StarkConfig

    config = StarkConfig.test() if args.config == "test" else StarkConfig.core()

    if args.cmd == "warmup":
        return _warmup(config, quick=args.quick)

    if args.cmd == "solidity-verifier":
        from .verifier.solidity import render_groth16_verifier

        src = render_groth16_verifier(open(args.vk_bin, "rb").read())
        with open(args.output, "w") as fh:
            fh.write(src)
        print(f"wrote {args.output} ({len(src):,} bytes)")
        return 0

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


def _warmup(config, quick: bool = False) -> int:
    """Prove one guest per shape-menu family on the device path so every
    stage kernel lands in the persistent XLA compilation cache (first
    proofs of new deployments then skip minutes of compiles).

    Covers: fib at small/large scale (the plain-ALU cpu* buckets), the
    keccak-chain guest (the +KeccakSponge family), and the reference's
    shipped compiled ELF with DEVICE_MIN_ROWS=0 (the small-guest path).
    """
    import os
    import time

    from .executor import execute_for_proving
    from .machine.machine import MipsMachine
    from .machine import shape_gen
    from .stark import machine as sm

    progs = [(n, p) for n, p in shape_gen.corpus_programs()
             if quick is False or "200" not in n and "12_000" not in n and "12000" not in n]
    m = MipsMachine(config)
    for name, prog in progs:
        t0 = time.time()
        try:
            records, _ = execute_for_proving(prog, shard_size=1 << 20)
            pk = m.setup(prog)
            prev = sm.DEVICE_MIN_ROWS
            if name == "ref_elf":
                sm.DEVICE_MIN_ROWS = 0
            try:
                proofs = m.prove(pk, records, device=True)
            finally:
                sm.DEVICE_MIN_ROWS = prev
            assert m.verify(pk.vk, proofs, prog)
            print(f"warm {name}: {time.time()-t0:.1f}s ({len(proofs)} shards)", flush=True)
        except Exception as e:  # keep warming the rest
            print(f"warm {name}: FAILED ({e})", flush=True)
    return 0
