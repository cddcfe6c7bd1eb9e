"""Two-adic FRI polynomial commitment scheme over KoalaBear / quartic ext.

Reimplements (TPU-first, self-contained) the protocol of the reference's
``TwoAdicFriPcs`` as fixed by its in-circuit verifier (reference:
crates/recursion/circuit/src/fri.rs):

  * commit: each matrix of evaluations over a coset (n, shift s) is LDE'd
    onto the standard coset (n * 2^log_blowup, shift = GENERATOR) and the
    batch committed in one mixed-matrix Merkle tree (fri.rs:139-151 fixes
    x = g * w^rev(i) as the committed point layout, bit-reversed rows).
  * open: alpha sampled first (fri.rs:78); per-height reduced vectors
    ro_H(x) = sum over (matrix, point z, column j) of
    alpha^{k_H++} * (p_j(z) - p_j(x)) / (z - x)   (fri.rs:155-201),
    with one alpha-power counter PER log-height.
  * FRI: the reduced vector of the max height is folded in halves over the
    *plain* subgroup (x = w^rev(i), no coset shift — fri.rs:258-266), one
    Merkle commit + beta challenge per layer, lower-height reduced vectors
    injected with beta^2 scaling (fri.rs:345-351), constant final poly,
    proof-of-work grind, then query-index sampling
    (verify_shape_and_sample_challenges, fri.rs:34-70).

Heavy array math (LDE, Merkle layers, reductions, folds) is backend-agnostic
numpy/jax.numpy; transcript logic is host-side.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from functools import lru_cache

import numpy as np

from ..ops import bits, ext4, field as f, merkle, ntt
from .challenger import DuplexChallenger
from .domain import Domain, fold_inv_2x_monty, lde_points_bitrev_monty


@dataclass(frozen=True)
class FriConfig:
    """FRI parameters; reference values kb31_poseidon2.rs:54-63,203-240."""

    log_blowup: int = 1
    num_queries: int = 84
    proof_of_work_bits: int = 16
    hash_family: str = "kb"  # "kb" (Poseidon2-KoalaBear) | "bn254" (outer)

    @staticmethod
    def core() -> "FriConfig":
        return FriConfig(1, 84, 16)

    @staticmethod
    def compressed() -> "FriConfig":
        return FriConfig(2, 42, 16)

    @staticmethod
    def ultra_compressed() -> "FriConfig":
        return FriConfig(3, 28, 16)

    @staticmethod
    def outer() -> "FriConfig":
        """BN254 outer config: Poseidon2-BN254 Merkle/transcript
        (recursion/core/src/stark/config.rs:71-85: blowup 4, 21 queries)."""
        return FriConfig(4, 21, 16, hash_family="bn254")

    @staticmethod
    def outer_test() -> "FriConfig":
        """Small outer config for unit tests (NOT sound)."""
        return FriConfig(2, 4, 4, hash_family="bn254")

    @staticmethod
    def test() -> "FriConfig":
        """Small config for fast unit tests (NOT sound)."""
        return FriConfig(1, 8, 4)


def _mk(config: "FriConfig"):
    """Merkle/MMCS module for the config's hash family."""
    if config.hash_family == "bn254":
        from ..ops import merkle_bn254

        return merkle_bn254
    return merkle


# ---------------------------------------------------------------------------
# Prover data
# ---------------------------------------------------------------------------


@dataclass
class ProverData:
    """Result of a batch commit: committed LDEs + coefficients + tree."""

    domains: list[Domain]
    coeffs: list  # per matrix: (n, w) coefficient matrix wrt its own domain
    ldes: list  # per matrix: (n << log_blowup, w) bitrev-row LDE on shift-g coset
    tree: merkle.MerkleTree
    log_blowup: int = 1

    @property
    def root(self) -> np.ndarray:
        return self.tree.root

    def drop_ldes(self):
        """Release the LDE matrices (the dominant HBM footprint, 2x the
        trace) while only the coefficients are needed — the quotient stage
        consumes coeffs, not LDEs.  The Merkle digest layers stay; call
        :meth:`ensure_ldes` before the open phase's reduce/query steps.

        Purpose: shrink the heavy-phase footprint so a third/fourth shard
        worker fits in one chip's HBM (stark/machine._HEAVY_PHASE_SEM)."""
        self.ldes = None
        self.tree.matrices = None

    def ensure_ldes(self, xp):
        """Regenerate dropped LDEs from the coefficient matrices (one
        forward NTT each — ~100x cheaper than their HBM cost is worth
        during the heavy phase) and reattach them to the query tree."""
        if self.ldes is not None:
            return
        assert self.coeffs is not None, "coeffs already freed; cannot regen LDEs"
        from .jit_util import cached_jit

        ldes = []
        for dom, c in zip(self.domains, self.coeffs):
            log_n, w = dom.log_n, c.shape[1]
            rel = np.uint32(f.to_monty_int(f.GENERATOR * f.inv_int(dom.shift) % f.P))

            def make(log_n=log_n, w=w, lb=self.log_blowup):
                def fn(cc, rel_m):
                    from ..stark.blocks import powers_traced

                    scaled = f.mul(cc, powers_traced(rel_m, 1 << log_n, xp)[:, None])
                    big_n = (1 << log_n) << lb
                    padded = xp.zeros((big_n, w), dtype=np.uint32).at[: 1 << log_n].set(scaled)
                    return bits.bitrev_rows(ntt.ntt(padded))

                return fn

            fn = cached_jit("pcs_lde_regen", (log_n, w, self.log_blowup), make)
            ldes.append(fn(c, rel))
        self.ldes = ldes
        self.tree.matrices = ldes


def _commit_body(config: FriConfig, shapes, xp):
    """(coeffs, ldes, layers) for a static batch signature (jit-safe)."""

    def fn(mats):
        coeffs, ldes = [], []
        for (log_n, shift, _w), evals in zip(shapes, mats):
            c = ntt.ntt(evals, inverse=True)
            rel_shift = f.GENERATOR * f.inv_int(shift) % f.P
            scaled = f.mul(c, bits.powers_monty(rel_shift, 1 << log_n, xp)[:, None])
            big_n = (1 << log_n) << config.log_blowup
            if xp is np:
                padded = np.zeros((big_n, scaled.shape[1]), dtype=np.uint32)
                padded[: 1 << log_n] = scaled
            else:
                padded = xp.zeros((big_n, scaled.shape[1]), dtype=np.uint32).at[: 1 << log_n].set(scaled)
            lde = bits.bitrev_rows(ntt.ntt(padded))
            coeffs.append(c)
            ldes.append(lde)
        return coeffs, ldes, _mk(config).build_layers(ldes, xp)

    return fn


def commit(config: FriConfig, domains_and_matrices, xp=np) -> ProverData:
    """Commit to [(Domain, evals (n, w) monty uint32 natural order)] pairs."""
    domains = [d for d, _ in domains_and_matrices]
    mats = [m for _, m in domains_and_matrices]
    for dom, evals in domains_and_matrices:
        assert evals.shape[0] == dom.size, "evals height must match domain size"
    shapes = tuple((d.log_n, d.shift, m.shape[1]) for d, m in domains_and_matrices)
    if xp is np:
        coeffs, ldes, layers = _commit_body(config, shapes, np)(mats)
    elif config.hash_family == "kb":
        # staged kernels reusable across batch signatures (stark/blocks.py)
        from . import blocks

        coeffs, ldes, layers = blocks.commit_staged(config, domains_and_matrices, xp)
    else:
        from .jit_util import cached_jit

        fn = cached_jit("pcs_commit", (config.log_blowup, shapes), lambda: _commit_body(config, shapes, xp))
        coeffs, ldes, layers = fn([xp.asarray(m) for m in mats])
    tree = _mk(config).MerkleTree(ldes, xp=xp, layers=layers)
    return ProverData(domains, coeffs, ldes, tree, config.log_blowup)


def eval_at_ext_point(coeffs, dom: Domain, z: np.ndarray, xp=np) -> np.ndarray:
    """Evaluate every column poly at ext point z: returns (w, 4)."""
    if xp is not np:
        from .jit_util import cached_jit

        fn = cached_jit(
            "pcs_eval", (coeffs.shape, dom.log_n, dom.shift),
            lambda: (lambda cf, zz: _eval_at_ext_point_body(cf, dom, zz, xp)),
        )
        return fn(coeffs, z)
    return _eval_at_ext_point_body(coeffs, dom, z, np)


def eval_at_ext_points(coeffs, dom: Domain, pts, xp=np) -> list:
    """Evaluate every column poly at several ext points with one kernel
    (returns a list of (w, 4) arrays, one per point)."""
    if xp is np:
        return [_eval_at_ext_point_body(coeffs, dom, z, np) for z in pts]
    from .jit_util import cached_jit

    npts = len(pts)
    fn = cached_jit(
        "pcs_eval_batch", (coeffs.shape, dom.log_n, dom.shift, npts),
        lambda: (
            lambda cf, zz: [
                _eval_at_ext_point_body(cf, dom, zz[i], xp) for i in range(npts)
            ]
        ),
    )
    return fn(coeffs, xp.stack([xp.asarray(z) for z in pts]))


# (log_n, shift, point_kind) -> device (n,) monty table of (m / shift)^j,
# m = 1 (zeta itself) or the domain generator (the 'next row' point).
# z-independent, so cached for the life of the process.
_EVAL_TABLES: dict = {}


def _eval_pt_table(log_n: int, shift: int, k: int, xp):
    """Base-power table turning z^j into ((z * m_k)/shift)^j, or None if 1."""
    m = 1 if k == 0 else f.two_adic_generator_int(log_n)
    base = m * f.inv_int(shift) % f.P
    if base == 1:
        return None
    key = (log_n, shift, k)
    t = _EVAL_TABLES.get(key)
    if t is None:
        t = xp.asarray(bits.powers_monty_np(base, 1 << log_n))
        _EVAL_TABLES[key] = t
    return t


def _eval_rounds_fused(rounds, xp):
    """All claimed evaluations of every round in ONE device dispatch.

    The per-group eval kernels are dispatch-latency-bound (~20 ms each on
    the tunneled deployment; a shard has ~18 groups).  This builds one
    jitted computation: a single z-power doubling chain (z^j, shared by all
    domains via prefixes) plus, per (domain, point), an elementwise rescale
    by a cached z-independent base table — then every contraction, and one
    host transfer for all opened values.

    Falls back to per-group kernels when a point list doesn't match the
    prover's [zeta, zeta*g] structure.
    """
    jobs = []  # (ri, idxs, widths, log_n, shift, npts)
    sig = []
    mats_args = []
    tables = []
    table_keys = {}
    for ri, (pdata, points_per_mat) in enumerate(rounds):
        groups: dict = {}
        for mi, (dom, pts) in enumerate(zip(pdata.domains, points_per_mat)):
            groups.setdefault((dom.log_n, dom.shift, len(pts)), []).append(mi)
        for (log_n, shift, npts), idxs in groups.items():
            dom = pdata.domains[idxs[0]]
            pts = points_per_mat[idxs[0]]
            if npts > 2 or (npts == 2 and not np.array_equal(
                np.asarray(pts[1]), dom.next_point_ext(np.asarray(pts[0])))):
                return None  # caller falls back
            for mi in idxs[1:]:
                assert all(
                    np.array_equal(a, b) for a, b in zip(points_per_mat[mi], pts)
                ), "grouped matrices must share opening points"
            widths = [pdata.coeffs[mi].shape[1] for mi in idxs]
            arg_pos = []
            for mi in idxs:
                arg_pos.append(len(mats_args))
                mats_args.append(pdata.coeffs[mi])
            tbl_pos = []
            for k in range(npts):
                t = _eval_pt_table(log_n, shift, k, xp)
                if t is None:
                    tbl_pos.append(None)
                else:
                    tk = (log_n, shift, k)
                    if tk not in table_keys:
                        table_keys[tk] = len(tables)
                        tables.append(t)
                    tbl_pos.append(table_keys[tk])
            jobs.append((ri, tuple(arg_pos), tuple(widths), log_n, npts, tuple(tbl_pos)))
            sig.append((ri, tuple(widths), log_n, shift, npts, tuple(tbl_pos)))
    z = np.asarray(rounds[0][1][0][0], dtype=np.uint32)  # zeta (first point)
    max_n = max(1 << j[3] for j in jobs)

    def make():
        def fn(mats, tbls, zz):
            zbase = _ext_powers(zz, max_n, xp)  # (max_n, 4)
            outs = []
            for _ri, arg_pos, widths, log_n, npts, tbl_pos in jobs:
                n = 1 << log_n
                cat = (mats[arg_pos[0]] if len(arg_pos) == 1
                       else xp.concatenate([mats[p] for p in arg_pos], axis=1))
                for k in range(npts):
                    zp = zbase[:n]
                    if tbl_pos[k] is not None:
                        zp = ext4.mul(zp, ext4.from_base(tbls[tbl_pos[k]]))
                    vals = []
                    for c in range(4):
                        prod = f.mul(cat, zp[:, c : c + 1])
                        vals.append(bits.sum_mod(prod, axis=0))
                    outs.append(xp.stack(vals, axis=-1))  # (W, 4)
            return outs

        return fn

    from .jit_util import cached_jit

    fn = cached_jit("pcs_eval_all", tuple(sig), make)
    import jax

    flat = jax.device_get(fn(list(mats_args), list(tables), xp.asarray(z)))
    # split back per round/matrix
    opened_values = [
        [None] * len(pdata.coeffs) for pdata, _ in rounds
    ]
    oi = 0
    for ri, arg_pos, widths, _log_n, npts, _tp in jobs:
        group_vals = flat[oi : oi + npts]
        oi += npts
        offs = np.cumsum([0] + list(widths))
        for j, w in enumerate(widths):
            vals_m = [v[offs[j] : offs[j] + w] for v in group_vals]
            opened_values[ri][_job_matrix_index(rounds[ri], arg_pos[j], mats_args)] = vals_m
    return opened_values


def _job_matrix_index(round_entry, arg_pos, mats_args):
    pdata, _ = round_entry
    target = mats_args[arg_pos]
    for mi, c in enumerate(pdata.coeffs):
        if c is target:
            return mi
    raise AssertionError("matrix not found in round")


# log_h -> device (2^log_h,) bitrev LDE x-point table (z-independent)
_XPT_TABLES: dict = {}


def _x_points_dev(log_h: int, xp):
    t = _XPT_TABLES.get(log_h)
    if t is None:
        t = xp.asarray(lde_points_bitrev_monty(log_h))
        _XPT_TABLES[log_h] = t
    return t


def _reduce_all_fused(by_height: dict, xp):
    """Every height's reduced-opening vector in ONE device dispatch.

    The per-height kernels each paid dispatch latency plus an in-kernel
    x-point doubling chain; here the x tables are cached device constants
    and the whole step is a single jitted call whose outputs stay on device
    (they feed the fold chain directly).
    """
    heights = tuple(sorted(by_height, reverse=True))
    # static plan + flat args
    lde_args, z_list, ys_list, ap_list = [], [], [], []
    plan = []  # per height: list of slots; slot = (z_idx, [(lde_idx, ys_idx, ap_idx)])
    sig = []
    for log_h in heights:
        slots: dict[bytes, list] = {}
        z_of_slot: dict[bytes, int] = {}
        for lde, z, ys, apows in by_height[log_h]:
            zb = np.asarray(z).tobytes()
            if zb not in z_of_slot:
                z_of_slot[zb] = len(z_list)
                z_list.append(np.asarray(z, dtype=np.uint32))
                slots[zb] = []
            li, yi, ai = len(lde_args), len(ys_list), len(ap_list)
            lde_args.append(lde)
            ys_list.append(np.asarray(ys, dtype=np.uint32))
            ap_list.append(np.asarray(apows, dtype=np.uint32))
            slots[zb].append((li, yi, ai))
        plan.append([(z_of_slot[zb], entries) for zb, entries in slots.items()])
        sig.append((log_h, tuple(
            (len(entries), tuple(lde_args[li].shape[1] for li, _yi, _ai in entries))
            for _zi, entries in plan[-1]
        )))
    xpts = [_x_points_dev(h, xp) for h in heights]

    def make():
        def fn(ldes, zs, yss, aps, xps):
            out = []
            for hi, log_h in enumerate(heights):
                acc = None
                x_ext = ext4.from_base(xps[hi])
                for z_idx, entries in plan[hi]:
                    num = None
                    for li, yi, ai in entries:
                        s_val = _ext_dot_ext(aps[ai], yss[yi])
                        t_vec = _ext_dot_base(aps[ai], ldes[li], xp)
                        pn = ext4.sub(s_val[None, :], t_vec)
                        num = pn if num is None else ext4.add(num, pn)
                    denom = ext4.sub(zs[z_idx][None, :], x_ext)
                    contrib = ext4.mul(num, ext4.inv(denom))
                    acc = contrib if acc is None else ext4.add(acc, contrib)
                out.append(acc)
            return out

        return fn

    from .jit_util import cached_jit

    fn = cached_jit("pcs_reduce_all", tuple(sig), make)
    outs = fn(list(lde_args), [xp.asarray(z) for z in z_list], ys_list, ap_list, xpts)
    return {h: o for h, o in zip(heights, outs)}


def _reduce_contrib_batch(parts, log_h: int, xp):
    """Sum of reduced-opening contributions at one height, one kernel.

    parts: [(lde, z, ys, apows)] — grouped by distinct z value so each
    denominator inverse is computed once; matrix dots stay per-lde (no
    concatenated copies of the big LDE buffers)."""
    slots: dict[bytes, list] = {}
    for lde, z, ys, apows in parts:
        slots.setdefault(np.asarray(z).tobytes(), []).append((lde, z, ys, apows))
    slot_lists = list(slots.values())
    zs = np.stack([np.asarray(sl[0][1]) for sl in slot_lists])

    def make():
        def x_points():
            if xp is np:
                return lde_points_bitrev_monty(log_h)
            pts = f.mul(bits.powers_monty(f.two_adic_generator_int(log_h), 1 << log_h, xp),
                        np.uint32(f.to_monty_int(f.GENERATOR)))
            return bits.bitrev_rows(pts)

        def fn(zz, slot_args):
            x_vec = x_points()
            acc = None
            for si, plist in enumerate(slot_args):
                num = None
                for lde, ys, apows in plist:
                    s_val = _ext_dot_ext(apows, ys)
                    t_vec = _ext_dot_base(apows, lde, xp)
                    pn = ext4.sub(s_val[None, :], t_vec)
                    num = pn if num is None else ext4.add(num, pn)
                denom = ext4.sub(zz[si][None, :], ext4.from_base(x_vec))
                contrib = ext4.mul(num, ext4.inv(denom))
                acc = contrib if acc is None else ext4.add(acc, contrib)
            return acc

        return fn

    slot_args = [
        [(lde, np.asarray(ys), apows) for lde, _z, ys, apows in sl] for sl in slot_lists
    ]
    if xp is np:
        return make()(zs, slot_args)
    from .jit_util import cached_jit

    key = (log_h, tuple(tuple(p[0].shape[1] for p in sl) for sl in slot_args))
    fn = cached_jit("pcs_reduce_batch", key, make)
    return fn(zs, slot_args)


def _eval_at_ext_point_body(coeffs, dom: Domain, z, xp):
    """p(z) = sum_i c_i (z/s)^i where c are coefficients over the coset s*<w>."""
    n, w = coeffs.shape
    zs = ext4.mul_base(z, np.uint32(f.to_monty_int(f.inv_int(dom.shift))))
    zpows = _ext_powers(zs, n, xp)  # (n, 4)
    out = []
    for c in range(4):
        prod = f.mul(coeffs, zpows[:, c : c + 1])  # (n, w)
        out.append(bits.sum_mod(prod, axis=0))  # (w,)
    stack = xp.stack
    return stack(out, axis=-1)


def _ext_powers(z: np.ndarray, n: int, xp=np) -> np.ndarray:
    """[1, z, ..., z^(n-1)] as (n, 4) via log-doubling (O(log n) array ops)."""
    concat = xp.concatenate
    out = ext4.ONE.astype(np.uint32)[None, :]
    cur = z[None, :]
    while out.shape[0] < n:
        out = concat([out, ext4.mul(out, cur)], axis=0)
        cur = ext4.mul(cur, cur)
    return out[:n]


# ---------------------------------------------------------------------------
# Proof structures
# ---------------------------------------------------------------------------


@dataclass
class CommitPhaseOpening:
    sibling_value: np.ndarray  # (4,) ext monty
    siblings: np.ndarray  # (log, 8) merkle path


@dataclass
class QueryProof:
    input_openings: list  # per round: (rows list, siblings (log, 8))
    commit_openings: list[CommitPhaseOpening]


@dataclass
class FriProof:
    commit_roots: list  # (8,) monty digests, one per fold layer
    final_poly: np.ndarray  # (4,) ext monty
    pow_witness: int
    query_proofs: list[QueryProof]


# ---------------------------------------------------------------------------
# Open
# ---------------------------------------------------------------------------


def open_batches(
    config: FriConfig,
    rounds: list,  # [(ProverData, points_per_matrix: list[list[(4,) ext]])]
    challenger: DuplexChallenger,
    xp=np,
):
    """Open every committed matrix at its points. Returns (opened_values, FriProof).

    opened_values[round][matrix][point] = (w, 4) claimed evaluations.
    """
    from ..utils.logger import span

    alpha = challenger.sample_ext()

    # 1. claimed evaluations — batched: matrices sharing (domain, point list)
    #    are evaluated by ONE kernel over their concatenated columns (the
    #    per-matrix version compiled 57 kernels for the fib bench); on the
    #    device path the WHOLE step is one dispatch (_eval_rounds_fused)
    opened_values = []
    with span("open.eval"):
      if xp is not np:
        opened_values = _eval_rounds_fused(rounds, xp)
      if xp is np or opened_values is None:
        opened_values = []
        for pdata, points_per_mat in rounds:
            mats_vals = [None] * len(pdata.coeffs)
            groups: dict = {}
            for mi, (coeffs, dom, pts) in enumerate(
                zip(pdata.coeffs, pdata.domains, points_per_mat)
            ):
                groups.setdefault((dom.log_n, dom.shift, len(pts)), []).append(mi)
            for (log_n, shift, npts), idxs in groups.items():
                dom = pdata.domains[idxs[0]]
                pts = points_per_mat[idxs[0]]
                for mi in idxs[1:]:
                    assert all(
                        np.array_equal(a, b) for a, b in zip(points_per_mat[mi], pts)
                    ), "grouped matrices must share opening points"
                widths = [pdata.coeffs[mi].shape[1] for mi in idxs]
                cat = (
                    pdata.coeffs[idxs[0]]
                    if len(idxs) == 1
                    else xp.concatenate([pdata.coeffs[mi] for mi in idxs], axis=1)
                )
                vals = eval_at_ext_points(cat, dom, pts, xp)  # list of (W, 4)
                off = 0
                for mi, w in zip(idxs, widths):
                    mats_vals[mi] = [v[off : off + w] for v in vals]
                    off += w
            opened_values.append(mats_vals)
        if xp is not np:
            # one bulk transfer instead of a sync per (matrix, point)
            import jax

            opened_values = jax.device_get(opened_values)

    # regenerate any LDEs dropped during the heavy phase (drop_ldes), then
    # free the coefficient matrices — their last consumer is the eval step
    # above (except program-lifetime prep data).  Net: the residual
    # open-phase footprint holds LDEs but not coeffs; the heavy phase held
    # coeffs but not LDEs — overlapped shard workers rely on both
    # (stark/machine._HEAVY_PHASE_SEM).
    for pdata, _pts in rounds:
        if xp is not np:
            pdata.ensure_ldes(xp)
        if not getattr(pdata, "persistent", False):
            pdata.coeffs = None

    # 2. per-height reduced vectors (bitrev layout, ext (H, 4)) — batched:
    #    ONE kernel per height covering every (matrix, point) pair at that
    #    height (widths concatenated, points unrolled inside the kernel)
    _sp = span("open.reduce"); _sp.__enter__()
    reduced: dict[int, np.ndarray] = {}
    alpha_pow_count: dict[int, int] = {}
    by_height: dict[int, list] = {}  # log_h -> [(lde, z, ys, apows)]
    for (pdata, points_per_mat), mats_vals in zip(rounds, opened_values):
        for lde, dom, pts, vals in zip(pdata.ldes, pdata.domains, points_per_mat, mats_vals):
            log_h = dom.log_n + config.log_blowup
            h, w = lde.shape
            for z, ys in zip(pts, vals):
                k0 = alpha_pow_count.get(log_h, 0)
                apows = _alpha_powers(alpha, k0, w)  # (w, 4)
                alpha_pow_count[log_h] = k0 + w
                by_height.setdefault(log_h, []).append((lde, z, ys, apows))
    if xp is not np:
        reduced = _reduce_all_fused(by_height, xp)
    else:
        for log_h, parts in by_height.items():
            reduced[log_h] = _reduce_contrib_batch(parts, log_h, xp)
    _sp.__exit__(None, None, None)
    log_max = max(reduced)
    assert min(reduced) > config.log_blowup, "matrices at the minimum height are unsupported"

    # 3. FRI commit phase
    _sp = span("open.fold"); _sp.__enter__()
    mk = _mk(config)
    if xp is not np and config.hash_family == "kb":
        # device-resident transcript: every fold layer's commit, the duplex
        # challenger absorb/sample, and the next fold run inside ONE jitted
        # dispatch — the per-layer host roundtrip (~19 layers x tunnel RTT at
        # 2^20-cycle shards) collapses to a single transfer of the roots
        commit_roots, final_poly, layer_trees = _fold_chain_device(
            config, reduced, log_max, challenger, xp, mk
        )
    else:
        cur = reduced[log_max]
        commit_roots, layer_trees = [], []
        layer_mat, layers = _fold_commit(cur, log_max, xp, mk)
        for log_h in range(log_max, config.log_blowup, -1):
            tree = mk.MerkleTree([layer_mat], xp=xp, layers=layers)
            layer_trees.append(tree)
            root = tree.root
            commit_roots.append(root)
            challenger.observe_digest(root)
            beta = challenger.sample_ext()
            nxt = reduced.get(log_h - 1)
            use_next = nxt is not None and log_h - 1 > config.log_blowup
            if log_h - 1 > config.log_blowup:
                cur, layer_mat, layers = _fold_step_commit(
                    cur, beta, nxt if use_next else None, log_h, xp, mk
                )
            else:
                cur = _fold_step(cur, beta, nxt if use_next else None, log_h, xp)
        final_poly = np.asarray(cur[0])

    _sp.__exit__(None, None, None)
    challenger.observe_slice(ext4.to_canonical(final_poly))
    with span("open.grind"):
        if xp is not np and config.hash_family == "kb":
            pow_witness = _grind_device(challenger, config.proof_of_work_bits, xp)
        else:
            pow_witness = challenger.grind(config.proof_of_work_bits)
    assert challenger.check_witness(config.proof_of_work_bits, pow_witness)

    indices = [challenger.sample_bits(log_max) for _ in range(config.num_queries)]

    # 4. query proofs (batched gathers: one pass per tree for all queries)
    _sp = span("open.queries"); _sp.__enter__()
    idx_arr = np.asarray(indices, dtype=np.int64)
    round_idxs = [
        idx_arr >> (log_max - (max(d.log_n for d in pdata.domains) + config.log_blowup))
        for pdata, _pts in rounds
    ]
    multi = getattr(mk_mod, "open_many_multi", None) if (mk_mod := _mk(config)) else None
    if multi is not None:
        # all rounds' trees in one dispatch + one flat transfer
        with span("open.queries.rounds"):
            opened = multi([pdata.tree for pdata, _ in rounds], round_idxs)
            per_round = [([np.asarray(r) for r in rows], np.asarray(sibs))
                         for rows, sibs in opened]
    else:
        per_round = []
        for (pdata, _pts), ridx in zip(rounds, round_idxs):
            rows, sibs = pdata.tree.open_many(ridx)
            per_round.append(([np.asarray(r) for r in rows], np.asarray(sibs)))
    with span("open.queries.layers"):
        per_layer = _open_fold_layers(layer_trees, idx_arr, xp)

    query_proofs = []
    for qi, idx in enumerate(indices):
        input_openings = [
            ([m[qi] for m in rows], sibs[qi]) for rows, sibs in per_round
        ]
        commit_openings = []
        for k, (rows, sibs) in enumerate(per_layer):
            row = rows[qi]  # (8,) = [even ext, odd ext]
            bit = (idx >> k) & 1
            sibling = row[4:8] if bit == 0 else row[0:4]
            commit_openings.append(CommitPhaseOpening(np.asarray(sibling), sibs[qi]))
        query_proofs.append(QueryProof(input_openings, commit_openings))

    _sp.__exit__(None, None, None)
    return opened_values, FriProof(commit_roots, np.asarray(final_poly), pow_witness, query_proofs)


def _open_fold_layers(layer_trees, idx_arr: np.ndarray, xp):
    """Query-open every FRI fold layer in one device dispatch.

    Per-layer open_many costs a tunnel roundtrip each (~17 layers at 2^20
    shards); this gathers all layers' rows + sibling paths in a single
    jitted call and one flat transfer."""
    q = len(idx_arr)
    if not layer_trees:
        return []
    if isinstance(layer_trees[0].matrices[0], np.ndarray):
        out = []
        for k, tree in enumerate(layer_trees):
            rows, sibs = tree.open_many((idx_arr >> k) >> 1)
            out.append((np.asarray(rows[0]), np.asarray(sibs)))
        return out
    from .jit_util import cached_jit

    log_hs = tuple(t.matrices[0].shape[0].bit_length() - 1 for t in layer_trees)

    def make():
        import jax.numpy as jnp

        def body(idx, mats, layer_digests):
            parts = []
            for k, (mat, digests, log_h) in enumerate(zip(mats, layer_digests, log_hs)):
                pair_idx = (idx >> k) >> 1
                parts.append(mat[pair_idx].reshape(-1))
                for lvl in range(log_h):
                    parts.append(digests[lvl][(pair_idx >> lvl) ^ 1].reshape(-1))
            return jnp.concatenate(parts) if parts else jnp.zeros(0, jnp.uint32)

        return body

    fn = cached_jit("pcs_fold_open", (log_hs, q), make)
    flat = np.asarray(fn(
        idx_arr,
        tuple(t.matrices[0] for t in layer_trees),
        tuple(tuple(t.digest_layers[:log_h]) for t, log_h in zip(layer_trees, log_hs)),
    ))
    out, off = [], 0
    for t, log_h in zip(layer_trees, log_hs):
        w = t.matrices[0].shape[1]
        rows = flat[off : off + q * w].reshape(q, w)
        off += q * w
        sibs = (flat[off : off + log_h * q * merkle.DIGEST_SIZE]
                .reshape(log_h, q, merkle.DIGEST_SIZE).transpose(1, 0, 2)
                if log_h else np.zeros((q, 0, merkle.DIGEST_SIZE), dtype=np.uint32))
        off += log_h * q * merkle.DIGEST_SIZE
        out.append((rows, sibs))
    return out


def _alpha_powers(alpha: np.ndarray, start: int, count: int) -> np.ndarray:
    """(count, 4) array [alpha^start, ..., alpha^(start+count-1)] (host, cached)."""
    pows = _alpha_powers_table(_key(alpha), count + start)
    return pows[start : start + count]


_ALPHA_CACHE: dict = {}


def _key(alpha: np.ndarray):
    return tuple(int(v) for v in alpha)


def _alpha_powers_table(key, n: int) -> np.ndarray:
    tbl = _ALPHA_CACHE.get(key)
    if tbl is None:
        alpha = np.array(key, dtype=np.uint32)
        tbl = ext4.powers_host(alpha, max(n, 64))
        _ALPHA_CACHE[key] = tbl
    elif tbl.shape[0] < n:
        # grow geometrically, extending from the last entry (amortized O(n))
        alpha = np.array(key, dtype=np.uint32)
        size = max(n, 2 * tbl.shape[0])
        ext = np.empty((size, 4), dtype=np.uint32)
        ext[: tbl.shape[0]] = tbl
        acc = tbl[-1]
        for i in range(tbl.shape[0], size):
            acc = ext4.mul(acc, alpha)
            ext[i] = acc
        tbl = ext
        _ALPHA_CACHE[key] = tbl
    return tbl


def _ext_dot_ext(apows: np.ndarray, ys) -> np.ndarray:
    """sum_j apows[j] * ys[j], both (w, 4) ext arrays -> (4,)."""
    prod = ext4.mul(apows, ys)
    return bits.sum_mod(prod, axis=0)


def _ext_dot_base(apows: np.ndarray, mat, xp=np) -> np.ndarray:
    """sum_j apows[j] * mat[:, j] for base matrix (H, w) -> ext (H, 4)."""
    out = []
    for c in range(4):
        prod = f.mul(mat, apows[None, :, c])
        out.append(bits.sum_mod(prod, axis=1))
    stack = xp.stack
    return stack(out, axis=-1)


# ---------------------------------------------------------------------------
# Verify
# ---------------------------------------------------------------------------


class PcsError(Exception):
    pass


def verify_batches(
    config: FriConfig,
    rounds_info: list,  # [(root, [(Domain, [(z, ys (w,4))...]) per matrix])]
    proof: FriProof,
    challenger: DuplexChallenger,
):
    """Verify openings; raises PcsError on failure."""
    alpha = challenger.sample_ext()

    betas = []
    for root in proof.commit_roots:
        challenger.observe_digest(root)
        betas.append(challenger.sample_ext())
    challenger.observe_slice(ext4.to_canonical(proof.final_poly))
    if not challenger.check_witness(config.proof_of_work_bits, proof.pow_witness):
        raise PcsError("invalid proof-of-work witness")
    log_max = len(proof.commit_roots) + config.log_blowup
    if len(proof.query_proofs) != config.num_queries:
        raise PcsError("wrong number of query proofs")
    indices = [challenger.sample_bits(log_max) for _ in range(config.num_queries)]

    # All queries are verified together: merkle layers, reduced openings and
    # the fold chain are numpy-vectorized over the Q query axis (a per-query
    # Python loop costs ~30k scalar Poseidon2 permutes at 84 queries).
    q = config.num_queries
    idx_arr = np.asarray(indices, dtype=np.int64)
    for qp in proof.query_proofs:
        if len(qp.input_openings) != len(rounds_info):
            raise PcsError("wrong number of input openings")

    ro: dict[int, np.ndarray] = {}  # log_h -> (Q, 4)
    apow_count: dict[int, int] = {}
    for ri, (root, mats) in enumerate(rounds_info):
        rows_per_mat = [
            np.stack([np.asarray(qp.input_openings[ri][0][m], dtype=np.uint32)
                      for qp in proof.query_proofs])
            for m in range(len(mats))
        ]
        sibs = np.stack([np.asarray(qp.input_openings[ri][1]) for qp in proof.query_proofs])
        dims = [(dom.size << config.log_blowup, r.shape[1]) for (dom, _pts), r in zip(mats, rows_per_mat)]
        batch_log_max = max(d.log_n for d, _ in mats) + config.log_blowup
        reduced_idx = idx_arr >> (log_max - batch_log_max)
        if not _mk(config).verify_openings(root, reduced_idx, dims, rows_per_mat, sibs).all():
            raise PcsError("merkle verification failed for input batch")
        for (dom, pts), rows in zip(mats, rows_per_mat):
            log_h = dom.log_n + config.log_blowup
            mat_idx = idx_arr >> (log_max - log_h)
            # x = g * w^{rev(mat_idx)} (fri.rs:139-151)
            x = lde_points_bitrev_monty(log_h)[mat_idx]          # (Q,)
            w = rows.shape[1]
            rows_ext = ext4.from_base(rows)                      # (Q, w, 4)
            for z, ys in pts:
                k0 = apow_count.get(log_h, 0)
                apows = _alpha_powers(alpha, k0, w)
                apow_count[log_h] = k0 + w
                diff = ext4.sub(np.asarray(ys)[None], rows_ext)  # (Q, w, 4)
                acc = bits.sum_mod(ext4.mul(apows[None], diff), axis=1)
                denom = ext4.sub(z[None], ext4.from_base(x))
                contrib = ext4.mul(acc, ext4.inv(denom))
                ro[log_h] = contrib if log_h not in ro else ext4.add(ro[log_h], contrib)

    if config.log_blowup in ro:
        raise PcsError("matrix at minimum height not allowed")
    folded = ro.get(log_max)
    if folded is None:
        raise PcsError("no reduced opening at max height")

    # fold chain over the plain subgroup, all queries at once
    gen = f.two_adic_generator_int(log_max)
    x = np.array([pow(gen, _bitrev_int(int(i), log_max), f.P) for i in idx_arr],
                 dtype=np.int64)
    for k, beta in enumerate(betas):
        log_folded = log_max - k - 1
        layer_idx = idx_arr >> k
        bit = (layer_idx & 1).astype(bool)
        pair_idx = layer_idx >> 1
        sib_vals = np.stack([np.asarray(qp.commit_openings[k].sibling_value, dtype=np.uint32)
                             for qp in proof.query_proofs])         # (Q, 4)
        layer_sibs = np.stack([np.asarray(qp.commit_openings[k].siblings)
                               for qp in proof.query_proofs])       # (Q, L, 8)
        row = np.where(bit[:, None],
                       np.concatenate([sib_vals, folded.astype(np.uint32)], axis=1),
                       np.concatenate([folded.astype(np.uint32), sib_vals], axis=1))
        if not _mk(config).verify_openings(
            proof.commit_roots[k], pair_idx, [(1 << log_folded, 8)], [row], layer_sibs
        ).all():
            raise PcsError(f"merkle verification failed at fold layer {k}")
        e0, e1 = row[:, 0:4], row[:, 4:8]
        x_even = np.where(bit, (f.P - x) % f.P, x)
        # folded = e0 + (beta - x_even) * (e1 - e0) / (-2 * x_even)
        diff = ext4.sub(e1, e0)
        neg2x = ((f.P - 2 * x_even % f.P) % f.P).astype(np.uint32)
        slope = ext4.mul_base(diff, f.inv(f.to_monty(neg2x)))
        bm = ext4.sub(beta[None], ext4.from_base(f.to_monty(x_even.astype(np.uint32))))
        folded = ext4.add(e0, ext4.mul(bm, slope))
        nxt = ro.get(log_folded)
        if nxt is not None and log_folded > config.log_blowup:
            beta2 = ext4.mul(beta, beta)
            folded = ext4.add(folded, ext4.mul(beta2[None], nxt))
        x = x * x % f.P
    if not np.all(folded == np.asarray(proof.final_poly)[None]):
        raise PcsError("final poly mismatch")
    return True


def _bitrev_int(i: int, nbits: int) -> int:
    r = 0
    for b in range(nbits):
        r |= ((i >> b) & 1) << (nbits - 1 - b)
    return r


# ---------------------------------------------------------------------------
# Device-stage helpers (jitted per static shape on the jnp path)
# ---------------------------------------------------------------------------


def _reduce_contrib_body(log_h: int, xp):
    def x_points():
        if xp is np:
            return lde_points_bitrev_monty(log_h)
        pts = f.mul(bits.powers_monty(f.two_adic_generator_int(log_h), 1 << log_h, xp),
                    np.uint32(f.to_monty_int(f.GENERATOR)))
        return bits.bitrev_rows(pts)

    def fn(lde, z, ys, apows):
        x_vec = x_points()
        s_val = _ext_dot_ext(apows, ys)
        t_vec = _ext_dot_base(apows, lde, xp)
        num = ext4.sub(s_val[None, :], t_vec)
        denom = ext4.sub(z[None, :], ext4.from_base(x_vec))
        return ext4.mul(num, ext4.inv(denom))

    return fn


def _reduce_contrib(lde, z, ys, apows, log_h: int, xp):
    if xp is np:
        return _reduce_contrib_body(log_h, np)(lde, z, np.asarray(ys), apows)
    ys = xp.asarray(ys)
    from .jit_util import cached_jit

    fn = cached_jit("pcs_reduce", (log_h, lde.shape[1]), lambda: _reduce_contrib_body(log_h, xp))
    return fn(lde, z, ys, apows)


def _fold_commit_body(xp, mk=merkle):
    def fn(cur):
        evens, odds = cur[0::2], cur[1::2]
        layer_mat = xp.concatenate([evens, odds], axis=1).reshape(evens.shape[0], 8)
        return layer_mat, mk.build_layers([layer_mat], xp)

    return fn


def _fold_commit(cur, log_h: int, xp, mk=merkle):
    if xp is np:
        return _fold_commit_body(np, mk)(cur)
    from .jit_util import cached_jit

    fn = cached_jit("pcs_fold_commit", (log_h,), lambda: _fold_commit_body(xp))
    return fn(cur)


def _fold_step_body(log_h: int, has_next: bool, xp):
    def inv2x_dev():
        if xp is np:
            return fold_inv_2x_monty(log_h)
        nat = bits.powers_monty(f.two_adic_generator_int(log_h), max(1 << (log_h - 1), 1), xp)
        xs = bits.bitrev_rows(nat) if log_h > 1 else nat
        return f.inv(f.mul(xs, np.uint32(f.to_monty_int(2))))

    def fn(cur, beta, nxt):
        inv2x = inv2x_dev()
        evens, odds = cur[0::2], cur[1::2]
        half_sum = ext4.mul_base(ext4.add(evens, odds), np.uint32(f.HALF))
        half_diff = ext4.mul_base(ext4.sub(evens, odds), inv2x)
        folded = ext4.add(half_sum, ext4.mul(beta[None, :], half_diff))
        if has_next:
            beta2 = ext4.mul(beta, beta)
            folded = ext4.add(folded, ext4.mul(beta2[None, :], nxt))
        return folded

    return fn


def _fold_step(cur, beta, nxt, log_h: int, xp):
    if xp is np:
        return _fold_step_body(log_h, nxt is not None, np)(cur, beta, nxt)
    from .jit_util import cached_jit

    fn = cached_jit("pcs_fold", (log_h, nxt is not None), lambda: _fold_step_body(log_h, nxt is not None, xp))
    if nxt is None:
        return fn(cur, beta, xp.zeros((0, 4), dtype=np.uint32))
    return fn(cur, beta, nxt)


def _fold_chain_device(config: FriConfig, reduced: dict, log_max: int, challenger, xp, mk):
    """Run the whole FRI commit phase in one dispatch with an in-kernel
    duplex challenger.

    The transcript at this point is a fixed pattern per layer: observe one
    8-felt digest (exactly one duplex, since RATE == 8) then sample one ext4
    challenge (4 pops).  Absorb overwrite semantics put the Montgomery-form
    root directly into the rate lanes, and ``sample() -> ext4.scalar`` is the
    identity on Montgomery lanes, so beta == state[[7,6,5,4]].  The host
    challenger is resynchronized from the returned sponge state.

    Returns (commit_roots: list[(8,) np], final_poly: (4,) np, layer_trees).
    """
    assert not challenger.input_buffer, "fold chain entered with pending absorbs"
    heights = tuple(sorted(reduced.keys(), reverse=True))
    log_blowup = config.log_blowup

    def make():
        import jax.numpy as jnp

        from ..ops import poseidon2 as p2

        def body(reds, state):
            by_h = dict(zip(heights, reds))
            cur = by_h[log_max]
            mats, digs, roots = [], [], []
            for log_h in range(log_max, log_blowup, -1):
                evens, odds = cur[0::2], cur[1::2]
                layer_mat = jnp.concatenate([evens, odds], axis=1)
                layers = mk.build_layers([layer_mat], jnp)
                root = layers[-1][0]
                mats.append(layer_mat)
                digs.append(layers)
                roots.append(root)
                state = p2.permute(jnp.concatenate([root, state[8:]]))
                beta = state[jnp.array([7, 6, 5, 4])]
                nxt = by_h.get(log_h - 1) if log_h - 1 > log_blowup else None
                step = _fold_step_body(log_h, nxt is not None, jnp)
                cur = step(cur, beta, nxt if nxt is not None else jnp.zeros((0, 4), jnp.uint32))
            return mats, digs, jnp.stack(roots), cur[0], state

        return body

    from .jit_util import cached_jit

    fn = cached_jit("pcs_fold_chain", (log_max, log_blowup, heights), make)
    mats, digs, roots_dev, final_dev, state_dev = fn(
        [reduced[h] for h in heights], xp.asarray(challenger.state)
    )
    # one transfer for everything the host transcript needs
    roots, final_poly, state = (np.asarray(roots_dev), np.asarray(final_dev), np.asarray(state_dev))
    challenger.state = state.copy()  # np.asarray of a device array is read-only
    challenger.input_buffer = []
    # after the final sample_ext, 4 unread outputs remain (pops come from the
    # end): [out0..out3] where out = from_monty(state[:RATE])
    challenger.output_buffer = [int(v) for v in f.from_monty(state[:4])]
    layer_trees = [mk.MerkleTree([m], xp=xp, layers=l) for m, l in zip(mats, digs)]
    return [roots[i] for i in range(roots.shape[0])], final_poly, layer_trees


def _grind_device(challenger, bits: int, xp) -> int:
    """FRI proof-of-work search on the device (one dispatch per window).

    Mirrors DuplexChallenger.grind: clone the sponge, absorb the pending
    inputs plus a candidate witness (overwrite semantics keep the remaining
    rate lanes), permute, and require sample() & mask == 0.  The search is
    embarrassingly parallel; the host only re-runs the winning witness
    through the real transcript (challenger.check_witness).
    """
    if bits == 0:
        return 0
    from .challenger import RATE, WIDTH

    pending = [int(v) for v in challenger.input_buffer]
    assert len(pending) < RATE
    npend = len(pending)
    batch = 1 << 19

    def make():
        import jax.numpy as jnp

        from ..ops import poseidon2 as p2

        def body(state, pending_monty, start):
            states = jnp.broadcast_to(state, (batch, WIDTH))
            if npend:
                states = jnp.concatenate(
                    [jnp.broadcast_to(pending_monty, (batch, npend)), states[:, npend:]], axis=1
                )
            wit = (start + jnp.arange(batch, dtype=jnp.uint32))
            col = f.to_monty(wit)[:, None]
            states = jnp.concatenate([states[:, :npend], col, states[:, npend + 1 :]], axis=1)
            out = p2.permute(states)
            sampled = f.from_monty(out[:, RATE - 1])
            hits = (sampled & np.uint32((1 << bits) - 1)) == 0
            i = jnp.argmax(hits)
            return i, hits[i]

        return body

    from .jit_util import cached_jit

    fn = cached_jit("pcs_grind", (bits, npend, batch), make)
    pending_monty = f.to_monty(np.asarray(pending, dtype=np.uint32))
    start = 0
    while True:
        i, found = fn(xp.asarray(challenger.state), xp.asarray(pending_monty), np.uint32(start))
        if bool(found):
            return start + int(i)
        start += batch


def _fold_step_commit(cur, beta, nxt, log_h: int, xp, mk=merkle):
    """Fused fold + next-layer commit: one device dispatch per FRI layer
    instead of two (the root of each layer must still sync to the host for
    the Fiat-Shamir transcript, so per-layer sequencing is irreducible)."""
    def make():
        step = _fold_step_body(log_h, nxt is not None, xp)
        commit = _fold_commit_body(xp, mk)

        def fn(cur_, beta_, nxt_):
            folded = step(cur_, beta_, nxt_)
            layer_mat, layers = commit(folded)
            return folded, layer_mat, layers

        return fn

    if xp is np:
        return make()(cur, beta, nxt)
    from .jit_util import cached_jit

    fn = cached_jit("pcs_fold_commit_fused", (log_h, nxt is not None), make)
    return fn(cur, beta, nxt if nxt is not None else xp.zeros((0, 4), dtype=np.uint32))
