"""Shape-keyed jit cache for prover stage kernels, with AOT export caching.

The prover's Fiat-Shamir structure forces host synchronization between
stages (each commitment root is observed before the next challenge), so the
device work is organized as a handful of jitted stage functions — one
compile per (stage, static-shape signature), reused across shards and
programs.  The single-chip tunnel deployment makes per-op dispatch costly;
one fused XLA computation per stage keeps the roundtrip count proportional
to the number of Fiat-Shamir interactions, not the number of array ops.

Two persistent layers make fresh processes fast:
  * XLA's compilation cache (set up by the caller) skips recompiles.
  * This module's jax.export cache (opt-in: ZKMIPS_AOT_CACHE=1) can skip
    *tracing* by deserializing StableHLO, but measured end-to-end on the
    tunnel deployment the exported-call path recompiles without hitting the
    persistent XLA cache and loses more than tracing costs; it stays off by
    default pending an XLA-cache-integrated path.
"""

from __future__ import annotations

import hashlib
import os

_CACHE: dict = {}

_EXPORT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_export_cache",
)


def _export_path(tag: str, static_key, args) -> str | None:
    try:
        import jax
        from jax import tree_util

        leaves, treedef = tree_util.tree_flatten(args)
        sig = [(tuple(getattr(l, "shape", ())), str(getattr(l, "dtype", type(l)))) for l in leaves]
        payload = repr((tag, static_key, sig, str(treedef), jax.__version__,
                        jax.default_backend()))
        return os.path.join(_EXPORT_DIR, hashlib.sha256(payload.encode()).hexdigest())
    except Exception:
        return None


def _aot_wrap(tag: str, static_key, make_fn):
    """A callable that, on first call, loads or creates a serialized export."""
    import jax

    state: dict = {}

    def call(*args):
        impl = state.get("impl")
        if impl is not None:
            return impl(*args)
        path = _export_path(tag, static_key, args)
        if path is not None and os.path.exists(path):
            try:
                from jax import export as jexport

                with open(path, "rb") as fh:
                    exp = jexport.deserialize(bytearray(fh.read()))
                impl = exp.call
                state["impl"] = impl
                return impl(*args)
            except Exception:
                pass  # fall through to fresh trace
        jitted = jax.jit(make_fn())
        out = jitted(*args)  # trace + compile now (fills the XLA cache)
        state["impl"] = jitted
        if path is not None:
            try:
                from jax import export as jexport

                abstract = jax.tree_util.tree_map(
                    lambda l: jax.ShapeDtypeStruct(l.shape, l.dtype)
                    if hasattr(l, "shape") else l,
                    args,
                )
                exp = jexport.export(jitted)(*abstract)
                os.makedirs(_EXPORT_DIR, exist_ok=True)
                tmp = path + ".tmp"
                with open(tmp, "wb") as fh:
                    fh.write(exp.serialize())
                os.replace(tmp, path)
            except Exception:
                pass  # export unsupported for this fn: jit cache still works
        return out

    return call


def cached_jit(tag: str, static_key, make_fn):
    """Return a jitted callable cached by (tag, static_key)."""
    key = (tag, static_key)
    fn = _CACHE.get(key)
    if fn is None:
        import time

        import jax

        if os.environ.get("ZKMIPS_AOT_CACHE"):
            fn = _aot_wrap(tag, static_key, make_fn)
        else:
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
