"""Headline benchmark: MIPS cycles proved per second.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...notes}.

Baseline derivation (BASELINE.md): the reference proves fibonacci n=58218 in
14.985 s on an r6a.8xlarge (32 vCPU).  That guest executes ~2M MIPS cycles
(≈35 cycles/iteration incl. loads + runtime overhead), giving a baseline of
~133,000 cycles proved per second per host.  vs_baseline = ours / 133000.

Primary metric: fib guest (BENCH_FIB_ITERS, default 200k iters = 1.2M
cycles) proved at the sound core config.  The first device pass compiles /
loads the persistent kernel cache (minutes when cold) and is reported as
first_proof_s; the measured pass is steady-state.  Extra keys:

  real_guest_cycles_per_sec — the reference's shipped compiled guest ELF
      (crates/prover/elf/mipsel-zkm-zkvm-elf) proved end-to-end + verified
  stage_breakdown_s — host-visible wall per prover stage (device stages
      dispatch asynchronously; their cost surfaces at sync points)
  first_proof_s / steady_proof_s — cold(ish) vs warm wall for the fib guest
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_CYCLES_PER_SEC = 133_000.0
REF_ELF = "/root/reference/crates/prover/elf/mipsel-zkm-zkvm-elf"

# The driver runs bench.py under an external timeout; a run killed before
# printing its JSON line records nothing (round 4 regression).  Guard: track
# a wall deadline, print the headline JSON as soon as the primary metric is
# measured, deadline-gate each optional section, and re-print the enriched
# JSON as the final line (the driver parses the last JSON-looking line).
_T_START = time.time()
DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", "1400"))


def _remaining() -> float:
    return DEADLINE_S - (time.time() - _T_START)


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


def _fib_program(n_iters: int):
    from zkmips_tpu.executor import Instruction, Opcode, Register
    from zkmips_tpu.executor import asm

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
    return asm.prog(body + asm.halt_sequence())


def _keccak_chain_program(n_iters: int):
    """Chain keccak256 over a 32-byte message (the reference's
    sha3-chain-precompile benchmark shape, examples/keccak-precompile):
    digest = keccak(digest), n_iters times, one KECCAK_SPONGE syscall per
    iteration (24 KeccakSponge rows each)."""
    from zkmips_tpu.executor import Instruction, Opcode, Register
    from zkmips_tpu.executor import asm

    R, O = Register, Opcode
    KECCAK_SPONGE = 0x01010009
    IN, OUT = 0x2000, 0x3000
    body = []
    # one 136-byte rate block + 2 state words = 36 words; message = 32 zero
    # bytes; padding: byte32 = 0x01, byte135 = 0x80
    for i in range(36):
        w = 0x01 if i == 8 else (0x80000000 if i == 33 else 0)
        body += [*asm.li(R.T0, w), *asm.li(R.T1, IN + 4 * i), asm.sw(R.T0, R.T1)]
    body += [*asm.li(R.T0, 36), *asm.li(R.T1, OUT + 64), asm.sw(R.T0, R.T1)]
    body += [*asm.li(R.S0, n_iters)]
    loop = [
        *asm.li(R.V0, KECCAK_SPONGE), *asm.li(R.A0, IN), *asm.li(R.A1, OUT),
        asm.syscall(),
    ]
    for i in range(8):
        loop += [*asm.li(R.T1, OUT + 4 * i), asm.lw(R.T0, R.T1),
                 *asm.li(R.T2, IN + 4 * i), asm.sw(R.T0, R.T2)]
    loop += [asm.addi(R.S0, R.S0, -1 & 0xFFFFFFFF)]
    nloop = len(loop)
    loop += [asm.branch(O.BGTZ, R.S0, 0, -4 * (nloop + 1)), asm.nop()]
    return asm.prog(body + loop + asm.halt_sequence())


def _bench_keccak(device: bool) -> dict:
    """Prove the keccak-chain guest (BASELINE.json: 'fibonacci + keccak')."""
    if os.environ.get("BENCH_KECCAK") in ("0", "false"):
        return {}
    from zkmips_tpu.machine.machine import MipsMachine
    from zkmips_tpu.stark.machine import StarkConfig
    from zkmips_tpu.executor import execute_for_proving

    n_iters = int(os.environ.get("BENCH_KECCAK_ITERS", "12000"))
    program = _keccak_chain_program(n_iters)
    shard_size = int(os.environ.get("SHARD_SIZE", 1 << 20))
    records, info = execute_for_proving(program, shard_size=shard_size)
    cycles = info["global_clk"]
    config = StarkConfig.core() if os.environ.get("BENCH_CONFIG", "core") == "core" else StarkConfig.test()
    m = MipsMachine(config)
    pk = m.setup(program)
    if device:
        m.prove(pk, records, device=True)  # warm the keccak-shape kernels
        records, info = execute_for_proving(program, shard_size=shard_size)
    t0 = time.time()
    proofs = m.prove(pk, records, device=device)
    dt = time.time() - t0
    assert m.verify(pk.vk, proofs, program)
    return {
        "keccak_cycles_per_sec": round(cycles / dt, 2),
        "keccak_prove_s": round(dt, 2),
        "keccak_cycles": cycles,
        "keccak_iters": n_iters,
        "keccak_shards": len(proofs),
    }


def _kernel_roofline() -> dict:
    """Measured primitive-kernel rates vs speed-of-light estimates.

    Roofline model for the v5e chip behind the tunnel: VPU ~3.8e12 u32
    op/s (8x128 lanes x 4 ALUs x ~0.94 GHz); Poseidon2-16 costs ~10k
    lane-ops per permutation (282 modmuls at ~26 ops plus the linear
    layers), so SoL ~= 380M perm/s.  The NTT is HBM-pass-bound; the
    measured fused-elementwise copy floor (~30 GB/s effective on this
    deployment) with ceil(log2 n / 3) passes sets its SoL.
    """
    try:
        import time as _t

        import jax
        import jax.numpy as jnp

        from zkmips_tpu.ops import field as ff, ntt as ntt_mod, poseidon2 as p2

        rng = __import__("numpy").random.default_rng(0)
        import numpy as np

        def sync(x):
            np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])

        def timeit(fn, *a, n=3):
            sync(fn(*a))
            t0 = _t.perf_counter()
            for _ in range(n):
                sync(fn(*a))
            return (_t.perf_counter() - t0) / n

        h, w = 1 << 20, 64
        mat = jnp.asarray(rng.integers(0, ff.P, (h, w), dtype=np.uint32))
        dt_h = timeit(jax.jit(p2.hash_matrix_rows), mat)
        mperm = h * (w // 8) / dt_h / 1e6
        m2 = jnp.asarray(rng.integers(0, ff.P, (1 << 20, 32), dtype=np.uint32))
        dt_n = timeit(jax.jit(ntt_mod.ntt), m2)
        gbfly = (1 << 20) * 32 * 20 / dt_n / 1e9
        passes = -(-20 // 3)
        ntt_sol_gbfly = 30e9 / ((1 << 20) * 32 * 4 * 2 * passes) * ((1 << 20) * 32 * 20) / 1e9
        return {
            "kernel_roofline": {
                "poseidon2_mperm_per_s": round(mperm, 1),
                "poseidon2_pct_of_vpu_sol": round(100 * mperm / 380.0, 1),
                "ntt_gbutterfly_per_s": round(gbfly, 1),
                "ntt_pct_of_hbm_pass_sol": round(100 * gbfly / ntt_sol_gbfly, 1),
            }
        }
    except Exception:
        return {}


def _bench_real_guest(config, device: bool) -> dict:
    """Prove + verify the reference's shipped compiled guest ELF."""
    if not os.path.exists(REF_ELF):
        return {}
    from zkmips_tpu.executor import Executor
    from zkmips_tpu.executor.program import Program
    from zkmips_tpu.machine.machine import MipsMachine

    p = Program.from_elf(open(REF_ELF, "rb").read())
    ex = Executor(p)
    records = ex.run()
    cycles = ex.global_clk
    m = MipsMachine(config)
    pk = m.setup(p)
    if device:
        # small-guest device path: every chip (even tiny ones) runs the
        # block-stationary device kernels — ~50 small-shape kernels compile
        # once ever (persistent cache); steady-state is ~7x the host path
        from zkmips_tpu.stark import machine as sm

        prev_min = sm.DEVICE_MIN_ROWS
        sm.DEVICE_MIN_ROWS = 0
        try:
            m.prove(pk, records, device=True)  # warm pass
            ex = Executor(p)
            records = ex.run()
            t0 = time.time()
            proofs = m.prove(pk, records, device=True)
            dt = time.time() - t0
        finally:
            sm.DEVICE_MIN_ROWS = prev_min
    else:
        t0 = time.time()
        proofs = m.prove(pk, records, device=False)
        dt = time.time() - t0
    assert m.verify(pk.vk, proofs, p)
    return {
        "real_guest_cycles_per_sec": round(cycles / dt, 2),
        "real_guest_prove_s": round(dt, 2),
        "real_guest_cycles": cycles,
    }


def main():
    # 1M iters = six 2^20-cycle shards: enough to fill the shard pipeline
    # (workers overlap host trace gen + tunnel upload with device proving;
    # the heavy-phase semaphore + LDE drop/regen keep the overlapped
    # footprint inside one v5e's HBM)
    n_iters = int(os.environ.get("BENCH_FIB_ITERS", "1000000"))
    from zkmips_tpu.machine.machine import MipsMachine
    from zkmips_tpu.stark.machine import StarkConfig
    from zkmips_tpu.executor import execute_for_proving
    from zkmips_tpu.utils import logger

    program = _fib_program(n_iters)
    shard_size = int(os.environ.get("SHARD_SIZE", 1 << 20))
    records, info = execute_for_proving(program, shard_size=shard_size)
    cycles = info["global_clk"]

    config = StarkConfig.core() if os.environ.get("BENCH_CONFIG", "core") == "core" else StarkConfig.test()
    m = MipsMachine(config)
    pk = m.setup(program)
    device = _device_available()
    first_proof_s = None
    if device:
        # first pass compiles the stage kernels (persistently cached); the
        # measured pass reflects steady-state proving
        t0 = time.time()
        m.prove(pk, records, device=True)
        first_proof_s = time.time() - t0
        # provisional headline: if the driver's timeout kills the steady pass,
        # the cold-pass number still gets recorded (final line re-prints)
        print(json.dumps({
            "metric": "mips_cycles_proved_per_sec",
            "value": round(cycles / first_proof_s, 2),
            "unit": "cycles/s",
            "vs_baseline": round(cycles / first_proof_s / BASELINE_CYCLES_PER_SEC, 5),
            "cycles": cycles,
            "note": "cold-pass provisional; steady pass follows",
        }), flush=True)
        records, info = execute_for_proving(program, shard_size=shard_size)

    logger._ENABLED = True
    logger.spans_reset()
    t0 = time.time()
    proofs = m.prove(pk, records, device=device)
    dt = time.time() - t0
    logger._ENABLED = False
    assert m.verify(pk.vk, proofs, program)
    # collapse nested span paths (threaded shards interleave the stack)
    agg: dict = {}
    for k, (v, _c) in logger.spans_report().items():
        agg[k.split("/")[-1]] = round(agg.get(k.split("/")[-1], 0.0) + v, 3)

    cps = cycles / dt
    out = {
        "metric": "mips_cycles_proved_per_sec",
        "value": round(cps, 2),
        "unit": "cycles/s",
        "vs_baseline": round(cps / BASELINE_CYCLES_PER_SEC, 5),
        "steady_proof_s": round(dt, 2),
        "cycles": cycles,
        "shards": len(proofs),
        "stage_breakdown_s": agg,
    }
    if first_proof_s is not None:
        out["first_proof_s"] = round(first_proof_s, 2)
    sc = getattr(m.machine, "shape_config", None)
    if sc is not None:
        out["shape_menu_hits"] = getattr(sc, "menu_hits", 0)
        out["shape_menu_misses"] = getattr(sc, "menu_misses", 0)
    # headline line NOW (the extras below may not fit the driver's timeout)
    print(json.dumps(out), flush=True)

    # optional sections: each deadline-gated and failure-isolated
    for label, budget_s, fn in (
        ("keccak", 240.0, lambda: _bench_keccak(device)),
        ("real_guest", 120.0, lambda: _bench_real_guest(config, device)),
        ("roofline", 60.0, lambda: _kernel_roofline() if device else {}),
    ):
        if _remaining() < budget_s:
            out[f"skipped_{label}"] = "deadline"
            continue
        try:
            out.update(fn())
        except Exception as e:  # a broken extra must not lose the headline
            out[f"error_{label}"] = repr(e)[:200]
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
