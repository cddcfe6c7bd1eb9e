"""Headline benchmark: MIPS cycles proved per second (fibonacci guest).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline derivation (BASELINE.md): the reference proves fibonacci n=58218 in
14.985 s on an r6a.8xlarge (32 vCPU).  That guest executes ~2M MIPS cycles
(≈35 cycles/iteration incl. loads + runtime overhead), giving a baseline of
~133,000 cycles proved per second per host.  vs_baseline = ours / 133000.

Default run proves fib200000 (1.2M MIPS cycles, two shards at the 2^20
cycle budget) on the attached accelerator when present: the first pass
compiles/loads the persistent kernel cache (minutes when cold), the measured
pass is steady-state — ~60k cycles/s on one tunneled v5e chip (vs ~440 c/s
for the numpy prover, BENCH_DEVICE=0).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_CYCLES_PER_SEC = 133_000.0


def _device_available() -> bool:
    if os.environ.get("BENCH_DEVICE") in ("0", "false"):
        return False
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        if os.environ.get("BENCH_DEVICE") == "1":
            return True
        # default: use the device path whenever an accelerator is attached;
        # stage-kernel compiles land in the persistent cache (first run pays
        # them, reruns are warm).  BENCH_DEVICE=0 forces the numpy prover.
        return any(d.platform != "cpu" for d in jax.devices())
    except Exception:
        return False


def main():
    n_iters = int(os.environ.get("BENCH_FIB_ITERS", "200000"))
    from zkmips_tpu.executor import Executor, Instruction, Opcode, Register
    from zkmips_tpu.executor import asm
    from zkmips_tpu.machine.machine import MipsMachine
    from zkmips_tpu.stark.machine import StarkConfig

    R, O = Register, Opcode
    body = [
        *asm.li(R.T0, 0), *asm.li(R.T1, 1), *asm.li(R.T2, n_iters),
        asm.alu(O.ADD, R.T3, R.T0, R.T1),
        Instruction(O.ADD, R.T0, R.T1, 0, False, True),
        Instruction(O.ADD, R.T1, R.T3, 0, False, True),
        asm.addi(R.T2, R.T2, -1 & 0xFFFFFFFF),
        asm.branch(O.BGTZ, R.T2, 0, -20),
        asm.nop(),
    ]
    program = asm.prog(body + asm.halt_sequence())
    from zkmips_tpu.executor import execute_for_proving

    shard_size = int(os.environ.get("SHARD_SIZE", 1 << 20))
    records, info = execute_for_proving(program, shard_size=shard_size)
    cycles = info["global_clk"]

    config = StarkConfig.core() if os.environ.get("BENCH_CONFIG", "core") == "core" else StarkConfig.test()
    m = MipsMachine(config)
    pk = m.setup(program)
    device = _device_available()
    if device:
        # first pass compiles the stage kernels (persistently cached); the
        # measured pass reflects steady-state proving
        m.prove(pk, records, device=True)
        records, info = execute_for_proving(program, shard_size=shard_size)
    t0 = time.time()
    proofs = m.prove(pk, records, device=device)
    dt = time.time() - t0
    assert m.verify(pk.vk, proofs, program)

    cps = cycles / dt
    print(json.dumps({
        "metric": "mips_cycles_proved_per_sec",
        "value": round(cps, 2),
        "unit": "cycles/s",
        "vs_baseline": round(cps / BASELINE_CYCLES_PER_SEC, 5),
    }))


if __name__ == "__main__":
    main()
