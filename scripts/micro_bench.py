"""Microbenchmark primitive TPU kernels: where does device time go?

Run on the real chip:  python scripts/micro_bench.py
Reports permutes/s, NTT el/s, and a roofline estimate vs v5e VPU/HBM.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

from zkmips_tpu.ops import field as f, merkle, ntt, poseidon2 as p2
from zkmips_tpu.ops import bits


def _sync(out):
    """Force completion: on the axon tunnel block_until_ready can return
    before compute finishes; transferring one element is the reliable sync."""
    leaves = jax.tree_util.tree_leaves(out)
    np.asarray(leaves[0].ravel()[:1])


def timeit(fn, *args, n=5, warmup=2):
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        _sync(fn(*args))
    return (time.perf_counter() - t0) / n


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    # 1. raw field mul throughput
    n = 1 << 24
    a = jnp.asarray(rng.integers(0, f.P, n, dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, f.P, n, dtype=np.uint32))
    mul = jax.jit(f.mul)
    dt = timeit(mul, a, b)
    print(f"f.mul     n=2^24: {dt*1e3:7.2f} ms  -> {n/dt/1e9:8.2f} G modmul/s", flush=True)

    # 2. poseidon2 permute batch
    for logb in (18, 20):
        nb = 1 << logb
        st = jnp.asarray(rng.integers(0, f.P, (nb, 16), dtype=np.uint32))
        perm = jax.jit(p2.permute)
        dt = timeit(perm, st)
        print(f"p2.permute b=2^{logb}: {dt*1e3:7.2f} ms  -> {nb/dt/1e6:8.2f} M perm/s", flush=True)

    # 3. hash_matrix_rows on a typical main trace block
    for (h, w) in ((1 << 16, 88), (1 << 20, 88)):
        m = jnp.asarray(rng.integers(0, f.P, (h, w), dtype=np.uint32))
        hsh = jax.jit(p2.hash_matrix_rows)
        dt = timeit(hsh, m)
        nperm = h * ((w + 7) // 8)
        print(f"hash_rows ({h},{w}): {dt*1e3:7.2f} ms  -> {nperm/dt/1e6:8.2f} M perm/s, "
              f"{h*w*4/dt/1e9:6.1f} GB/s read", flush=True)

    # 4. merkle levels: 2^21 digests -> root
    nleaf = 1 << 21
    digs = jnp.asarray(rng.integers(0, f.P, (nleaf, 8), dtype=np.uint32))

    def levels(d):
        cur = d
        while cur.shape[0] > 1:
            cur = p2.compress(cur[0::2], cur[1::2])
        return cur

    lv = jax.jit(levels)
    dt = timeit(lv, digs)
    print(f"merkle levels 2^21: {dt*1e3:7.2f} ms  -> {nleaf/dt/1e6:8.2f} M compress/s", flush=True)

    # 5. NTT
    for (logn, w) in ((20, 32), (21, 8)):
        m = jnp.asarray(rng.integers(0, f.P, (1 << logn, w), dtype=np.uint32))
        fnt = jax.jit(ntt.ntt)
        dt = timeit(fnt, m)
        nel = (1 << logn) * w
        print(f"ntt (2^{logn},{w}): {dt*1e3:7.2f} ms  -> {nel/dt/1e6:8.2f} M el/s "
              f"({nel*logn/dt/1e9:6.1f} G butterfly/s)", flush=True)

    # 6. fold chain analog: per-layer fold+commit from 2^21 down
    from zkmips_tpu.stark import pcs as pcs_mod
    from zkmips_tpu.stark.challenger import DuplexChallenger
    log_max = 21
    red = {log_max: jnp.asarray(rng.integers(0, f.P, (1 << log_max, 4), dtype=np.uint32))}
    cfg = pcs_mod.FriConfig.core()

    def run_fold():
        ch = DuplexChallenger()
        roots, fp, trees = pcs_mod._fold_chain_device(cfg, red, log_max, ch, jnp, merkle)
        return fp

    t0 = time.perf_counter()
    run_fold()
    print(f"fold chain 2^21 first: {time.perf_counter()-t0:7.2f} s", flush=True)
    t0 = time.perf_counter()
    for _ in range(3):
        run_fold()
    print(f"fold chain 2^21 steady: {(time.perf_counter()-t0)/3*1e3:7.2f} ms", flush=True)

    # 7. grind
    ch = DuplexChallenger()
    ch.observe(np.uint32(7))
    t0 = time.perf_counter()
    w = pcs_mod._grind_device(ch, 16, jnp)
    print(f"grind 16b first+steady: {time.perf_counter()-t0:7.2f} s (witness {w})", flush=True)


if __name__ == "__main__":
    main()
