"""Thread-pool helper: numpy errstate is thread-local, so worker threads
must re-apply the intentional uint32-wraparound setting from ops/field.py
(otherwise every Montgomery mul in a pool worker emits RuntimeWarnings)."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import numpy as np


def _init_worker():
    # Montgomery arithmetic relies on uint32 wraparound (ops/field.py:43);
    # overflow warnings in workers are noise, not bugs.
    np.seterr(over="ignore")


def make_pool(max_workers: int) -> ThreadPoolExecutor:
    return ThreadPoolExecutor(max_workers=max_workers, initializer=_init_worker)
