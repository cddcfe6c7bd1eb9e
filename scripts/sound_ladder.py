"""Run the FULL sound ladder once and record wall times + artifact sizes.

core(84q/16bit) -> compress(84q) -> shrink(blowup2/42q) -> wrap(outer 4/21)
-> Groth16 (and optionally PLONK) on a real compiled guest — the reference's
test_e2e_prover (crates/prover/src/lib.rs:1269) at production parameters.

Host-pinned (JAX on CPU): the recursion + SNARK stages are host/numpy/C and
must not touch the tunneled TPU while a bench may be running.

Usage: python scripts/sound_ladder.py [--plonk] [--elf PATH]
Prints one JSON line per stage and a final summary JSON.
"""

import argparse
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

REF_ELF = "/root/reference/crates/prover/elf/mipsel-zkm-zkvm-elf"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--plonk", action="store_true")
    ap.add_argument("--elf", default=REF_ELF)
    args = ap.parse_args()

    from zkmips_tpu.executor import execute_for_proving
    from zkmips_tpu.executor.program import Program
    from zkmips_tpu.machine.machine import MipsMachine
    from zkmips_tpu.recursion.compress import RecursionProver
    from zkmips_tpu.snark.outer_circuit import wrap_groth16, wrap_plonk
    from zkmips_tpu.stark.machine import StarkConfig

    stages = {}

    def timed(name, fn, *a, **kw):
        t0 = time.time()
        out = fn(*a, **kw)
        stages[name] = round(time.time() - t0, 2)
        print(json.dumps({"stage": name, "wall_s": stages[name]}), flush=True)
        return out

    program = Program.from_elf(open(args.elf, "rb").read())
    records, info = execute_for_proving(program)
    cycles = info["global_clk"]
    print(json.dumps({"stage": "execute", "cycles": cycles}), flush=True)

    m = MipsMachine(StarkConfig.core())
    pk = timed("setup", m.setup, program)
    core_proofs = timed("prove_core", m.prove, pk, records)
    assert timed("verify_core", m.verify, pk.vk, core_proofs, program)
    sizes = {"core": len(pickle.dumps(core_proofs))}

    rp = RecursionProver(m)
    cp = timed("compress", rp.compress, pk.vk, core_proofs)
    assert rp.verify_compressed(pk.vk, program, cp)
    sizes["compressed"] = len(pickle.dumps(cp))

    sp = timed("shrink", rp.shrink, cp)
    wp = timed("wrap", rp.wrap, sp)
    sizes["wrapped"] = len(pickle.dumps(wp))

    wg = timed("groth16", wrap_groth16, rp, wp)
    from zkmips_tpu.verifier import encode_groth16_proof

    sizes["groth16_proof_bytes"] = len(encode_groth16_proof(wg.proof))
    from zkmips_tpu.snark.outer_circuit import verify_groth16

    assert timed("verify_groth16", verify_groth16, pk.vk, program, wg)

    if args.plonk:
        wpl = timed("plonk", wrap_plonk, rp, wp)
        from zkmips_tpu.snark.outer_circuit import verify_plonk

        assert timed("verify_plonk", verify_plonk, pk.vk, program, wpl)

    print(json.dumps({
        "summary": "sound_ladder",
        "elf": os.path.basename(args.elf),
        "cycles": cycles,
        "stages_s": stages,
        "artifact_bytes": sizes,
        "total_s": round(sum(stages.values()), 2),
    }), flush=True)


if __name__ == "__main__":
    main()
