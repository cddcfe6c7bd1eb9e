"""Lightweight tracing spans (analog of the reference's tracing setup,
crates/core/machine/src/utils/logger.rs): nested wall-clock spans gated by
the RUST_LOGGER / ZKMIPS_LOG env vars, aggregated for report printing."""

from __future__ import annotations

import os
import time
from collections import defaultdict
from contextlib import contextmanager

_ENABLED = bool(os.environ.get("ZKMIPS_LOG") or os.environ.get("RUST_LOGGER"))
# ZKM_SYNC_SPANS=1: block on all live device arrays at each span end, so the
# reported wall is the true stage cost instead of async dispatch latency
# landing at the next sync point (profiling only — syncs serialize the device
# pipeline and slow the end-to-end wall).
_SYNC = bool(os.environ.get("ZKM_SYNC_SPANS"))
_TOTALS: dict[str, float] = defaultdict(float)
_COUNTS: dict[str, int] = defaultdict(int)
_STACK: list[str] = []


def _sync_device():
    """Fence all queued device work.

    On the tunneled deployment ``block_until_ready`` can return before the
    remote compute finishes; the only reliable fence is a host transfer.
    Device execution is in-order, so transferring the result of one fresh
    trivial dispatch waits for everything enqueued before it.
    """
    try:
        import numpy as _np

        import jax
        import jax.numpy as jnp

        jax.effects_barrier()
        for dev in jax.devices():
            if dev.platform == "cpu":
                continue
            with jax.default_device(dev):
                _np.asarray(jnp.arange(1, dtype=jnp.uint32) + _np.uint32(1))
    except Exception:
        pass


@contextmanager
def span(name: str):
    if not _ENABLED:
        yield
        return
    if _SYNC:
        _sync_device()
    _STACK.append(name)
    path = "/".join(_STACK)
    t0 = time.time()
    try:
        yield
    finally:
        if _SYNC:
            _sync_device()
        dt = time.time() - t0
        _TOTALS[path] += dt
        _COUNTS[path] += 1
        _STACK.pop()
        import sys

        print(f"[span] {path}: {dt:.3f}s", file=sys.stderr, flush=True)


def spans_report() -> dict:
    return {k: (_TOTALS[k], _COUNTS[k]) for k in sorted(_TOTALS)}


def spans_reset():
    """Clear aggregated span totals (e.g. between warm-up and measurement)."""
    _TOTALS.clear()
    _COUNTS.clear()
