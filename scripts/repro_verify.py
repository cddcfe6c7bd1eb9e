"""Small-scale TPU repro of the bench verify flow (for bisecting)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from bench import _fib_program
from zkmips_tpu.executor import execute_for_proving
from zkmips_tpu.machine.machine import MipsMachine
from zkmips_tpu.stark.machine import StarkConfig

n = int(os.environ.get("REPRO_ITERS", "30000"))
program = _fib_program(n)
records, info = execute_for_proving(program, shard_size=1 << 20)
print("cycles", info["global_clk"], "shards", len(records), flush=True)
m = MipsMachine(StarkConfig.core())
pk = m.setup(program)
t0 = time.time()
proofs = m.prove(pk, records, device=True)
print(f"proved in {time.time()-t0:.1f}s", flush=True)
try:
    m.verify(pk.vk, proofs, program)
    print("VERIFY OK")
except Exception as e:
    print("VERIFY FAIL:", e)
