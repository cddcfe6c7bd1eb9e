"""Shape-keyed jit cache for prover stage kernels.

The prover's Fiat-Shamir structure forces host synchronization between
stages (each commitment root is observed before the next challenge), so the
device work is organized as a handful of jitted stage functions — one
compile per (stage, static-shape signature), reused across shards and
programs.  The single-chip tunnel deployment makes per-op dispatch costly;
one fused XLA computation per stage keeps the roundtrip count proportional
to the number of Fiat-Shamir interactions, not the number of array ops.
"""

from __future__ import annotations

_CACHE: dict = {}


def cached_jit(tag: str, static_key, make_fn):
    """Return a jitted callable cached by (tag, static_key)."""
    key = (tag, static_key)
    fn = _CACHE.get(key)
    if fn is None:
        import os
        import time

        import jax

        fn = jax.jit(make_fn())
        if os.environ.get("ZKMIPS_JIT_LOG"):
            inner = fn

            def timed(*args, __inner=inner, __key=key):
                t0 = time.time()
                out = __inner(*args)
                jax.block_until_ready(out)
                print(f"[jit] first call {__key[0]} {str(__key[1])[:60]}: {time.time() - t0:.1f}s", flush=True)
                _CACHE[__key] = __inner
                return out

            fn = timed
        _CACHE[key] = fn
    return fn


def clear():
    _CACHE.clear()
