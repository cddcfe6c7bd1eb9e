"""Debug oracles: row-level constraint checker + lookup multiset balance.

The development sanitizers for chip authoring (reference:
crates/stark/src/debug.rs:30,128 ``debug_constraints`` and
crates/stark/src/lookup/debug.rs:62,134 ``debug_lookups``).  They operate on
raw (canonical) traces *before* proving, and pinpoint the failing constraint
index / row or the unbalanced lookup values — indispensable when wiring a
multi-chip machine.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from ..ops import ext4, field as f
from . import air
from .air import EvalContext, Selector, eval_expr


def debug_constraints(
    chip,
    main_canonical: np.ndarray,
    prep_canonical: np.ndarray | None = None,
    publics: np.ndarray | None = None,
    perm_flat=None,  # monty (H, 4W) — pass to also check LogUp constraints
    perm_challenges=None,
    cum_sum=None,
    global_sum=None,
):
    """Evaluate every constraint on every row; raise with (constraint, row) on failure."""
    h = main_canonical.shape[0]
    main = f.to_monty(main_canonical.astype(np.uint32))
    prep = f.to_monty(prep_canonical.astype(np.uint32)) if prep_canonical is not None else None

    def roll1(a):
        return np.roll(a, -1, axis=0)

    def var_fn(segment, col, offset):
        if segment == air.MAIN:
            arr = main if offset == 0 else roll1(main)
            return arr[:, col]
        if segment == air.PREPROCESSED:
            arr = prep if offset == 0 else roll1(prep)
            return arr[:, col]
        if segment == air.PERM:
            if perm_flat is None:
                raise ValueError("perm trace not supplied")
            arr = perm_flat if offset == 0 else roll1(perm_flat)
            return arr[:, 4 * col : 4 * col + 4]
        raise ValueError(segment)

    first = np.zeros(h, dtype=np.uint32)
    first[0] = f.MONTY_ONE
    last = np.zeros(h, dtype=np.uint32)
    last[-1] = f.MONTY_ONE
    transition = np.full(h, f.MONTY_ONE, dtype=np.uint32)
    transition[-1] = 0

    ctx = EvalContext(
        var_fn,
        selectors={Selector.FIRST: first, Selector.LAST: last, Selector.TRANSITION: transition},
        publics=f.to_monty(publics.astype(np.uint32)) if publics is not None else None,
        challenges=perm_challenges,
        cum_sum=cum_sum,
        global_sum=f.to_monty(global_sum.astype(np.uint32)) if global_sum is not None else None,
    )
    constraints = chip.constraints if perm_flat is not None else [
        c for c in chip.constraints if not _mentions_perm(c)
    ]
    for ci, c in enumerate(constraints):
        v = eval_expr(c, ctx)
        arr = np.asarray(v.arr)
        if arr.ndim == 0:
            arr = np.broadcast_to(arr, (h,))
        bad = np.nonzero(arr.reshape(h, -1).any(axis=-1))[0]
        if bad.size:
            row = int(bad[0])
            raise AssertionError(
                f"chip {chip.name}: constraint #{ci} fails at row {row} "
                f"(first of {bad.size} failing rows); local row = "
                f"{main_canonical[row].tolist()}"
            )
    return True


def _mentions_perm(e, cache=None):
    if cache is None:
        cache = {}
    k = id(e)
    if k in cache:
        return cache[k]
    if isinstance(e, air.Var):
        r = e.segment == air.PERM
    elif isinstance(e, (air.CumSumLocal, air.Challenge)):
        r = True
    elif isinstance(e, (air.Add, air.Sub, air.Mul)):
        r = _mentions_perm(e.a, cache) or _mentions_perm(e.b, cache)
    elif isinstance(e, air.Neg):
        r = _mentions_perm(e.a, cache)
    else:
        r = False
    cache[k] = r
    return r


def debug_lookups(chips_traces, scope=air.Scope.Local, max_report: int = 10):
    """Check global multiset balance of all lookups across chips.

    chips_traces: list of (chip, main_canonical, prep_canonical_or_None).
    Returns {} if balanced, else {kind: [(values, net_mult), ...]}.
    """
    balance: dict = defaultdict(lambda: defaultdict(int))
    for chip, main_c, prep_c in chips_traces:
        h = main_c.shape[0]
        main = f.to_monty(main_c.astype(np.uint32))
        prep = f.to_monty(prep_c.astype(np.uint32)) if prep_c is not None else None

        def var_fn(segment, col, offset, main=main, prep=prep):
            assert offset == 0
            return (main if segment == air.MAIN else prep)[:, col]

        ctx = EvalContext(var_fn, selectors=None)
        for lookup, sign in [(l, 1) for l in chip.sends] + [(l, -1) for l in chip.receives]:
            if lookup.scope != scope:
                continue
            vals = [np.asarray(f.from_monty(np.asarray(eval_expr(v, ctx).arr))) for v in lookup.values]
            vals = [np.broadcast_to(v, (h,)) for v in vals]
            mult = np.asarray(f.from_monty(np.asarray(eval_expr(lookup.multiplicity, ctx).arr)))
            mult = np.broadcast_to(mult, (h,))
            nz = np.nonzero(mult)[0]
            for r in nz:
                key = tuple(int(v[r]) for v in vals)
                balance[lookup.kind][key] = (balance[lookup.kind][key] + sign * int(mult[r])) % f.P
    problems = {}
    for kind, table in balance.items():
        bad = [(k, v) for k, v in table.items() if v != 0]
        if bad:
            problems[kind] = bad[:max_report]
    return problems
