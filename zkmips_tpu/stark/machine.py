"""StarkMachine: multi-chip shard prover + verifier.

The analog of the reference's ``StarkMachine`` + ``CpuProver`` + shard
verifier (crates/stark/src/machine.rs:37, prover.rs:30-202, verifier.rs:30).

Shard transcript order (must match between prove and verify; mirrors
crates/recursion/circuit/src/stark.rs:294-325 and machine.rs:79):

  observe(vk: preprocessed root, prep heights)
  observe(public_values)
  observe(main root); sample perm challenges alpha_p, beta_p
  observe(perm root); per chip: observe local cumsum (4 felts),
    and for global-scope chips the 14 septic digest felts
  sample alpha; observe(quotient root); sample zeta
  PCS open/verify (rounds: preprocessed, main, permutation, quotient)
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..ops import ext4, field as f
from . import air, pcs, permutation, quotient as quotient_mod
from .challenger import DuplexChallenger
from .chip import Chip, pad_to_power_of_two
from .domain import Domain
from .pcs import FriConfig


@dataclass
class StarkConfig:
    fri: FriConfig

    @staticmethod
    def core() -> "StarkConfig":
        return StarkConfig(FriConfig.core())

    @staticmethod
    def outer() -> "StarkConfig":
        """BN254 outer config (wrap stage): Poseidon2-BN254 Merkle digests and
        a MultiField32 transcript (recursion/core/src/stark/config.rs:23-103)."""
        return StarkConfig(FriConfig.outer())

    @staticmethod
    def test() -> "StarkConfig":
        return StarkConfig(FriConfig.test())

    def challenger(self):
        if self.fri.hash_family == "bn254":
            from .challenger_bn254 import MultiField32Challenger

            return MultiField32Challenger()
        return DuplexChallenger()

    def zero_digest(self) -> np.ndarray:
        if self.fri.hash_family == "bn254":
            z = np.empty(1, dtype=object)
            z[0] = 0
            return z
        return np.zeros(8, dtype=np.uint32)


@dataclass
class ProvingKey:
    prep_data: pcs.ProverData | None
    prep_traces: dict  # name -> (H, wp) monty padded
    prep_order: list  # chip names in committed (height-desc) order
    vk: "VerifyingKey"


@dataclass
class VerifyingKey:
    prep_root: np.ndarray | None
    prep_heights: list  # [(name, log_h)] in committed order

    def observe_into(self, ch: DuplexChallenger):
        if self.prep_root is not None:
            ch.observe_digest(self.prep_root)
        for _name, log_h in self.prep_heights:
            ch.observe(log_h)


@dataclass
class ChipOpenedValues:
    preprocessed_local: np.ndarray | None  # (wp, 4) ext
    preprocessed_next: np.ndarray | None
    main_local: np.ndarray  # (w, 4)
    main_next: np.ndarray
    perm_local: np.ndarray  # (4*W, 4)
    perm_next: np.ndarray
    quotient: list  # per chunk: (4, 4) ext values of the 4 base columns
    local_cumulative_sum: np.ndarray  # (4,) ext monty
    global_sum: np.ndarray | None  # (14,) canonical or None
    log_degree: int


@dataclass
class ShardProof:
    main_root: np.ndarray
    perm_root: np.ndarray
    quotient_root: np.ndarray
    chip_names: list  # included chips, height-desc order
    opened: list  # ChipOpenedValues, same order
    fri_proof: pcs.FriProof
    public_values: np.ndarray  # (num_pv,) canonical


class VerificationError(Exception):
    pass


# Chips at or below this height run their permutation/quotient stages on the
# host even in device mode: tiny padded chips cost seconds-to-minutes of XLA
# compile for microseconds of work (ZKMIPS_DEVICE_MIN_ROWS to override).
import os as _os

DEVICE_MIN_ROWS = int(_os.environ.get("ZKMIPS_DEVICE_MIN_ROWS", "4096"))

# Pipelined shard proving serializes the HBM-peak phase (commit..quotient:
# both coset LDEs of every committed matrix are resident at once, ~7 GB for
# a 2^20-cycle shard) so overlapped workers stagger: one shard in its heavy
# phase while others upload traces or run their open phase (~4 GB residual).
# Without this, two full shards at the quotient stage exhaust one v5e's HBM.
import threading as _threading

_HEAVY_PHASE_SEM = _threading.Semaphore(
    int(_os.environ.get("ZKMIPS_HEAVY_PHASES", "1"))
)

_PREP_KEYS: dict = {}


def _prep_key(prep):
    """Cache key component for a preprocessed trace: the jitted stage kernels
    close over it as a constant, so kernels compiled for one program must not
    be reused for another with a same-shaped table (bug: Program constraint
    failure when proving two programs with one machine)."""
    if prep is None:
        return None
    key = _PREP_KEYS.get(id(prep))
    if key is None:
        import zlib

        key = (prep.shape, zlib.crc32(np.asarray(prep).tobytes()))
        _PREP_KEYS[id(prep)] = key
        _PREP_KEYS.setdefault("_refs", []).append(prep)  # pin ids
    return key


# per-(chip, width) upload partitions: promotion-only, so the narrowing
# signature — and therefore the upload kernel — stabilizes after the first
# shard instead of re-keying on every program's data (a column observed
# needing u16 once stays u16 even if a later shard's values happen to fit u8)
_UPLOAD_PARTITIONS: dict = {}


_UPLOAD_CHUNK = 1 << 16


def _upload_trace_monty(t: np.ndarray, xp, tag: str = "", target: int | None = None):
    """Upload a canonical u32 trace narrowed per column; device widens,
    restores column order with a static gather, converts to Montgomery and
    zero-pads to ``target`` rows.

    ``t`` may be the UNPADDED real-height trace: only real rows travel over
    the tunnel (padding is zeros appended on device, identical to host
    padding since to_monty(0) == 0).  Rows upload in fixed 2^16 chunks so
    the transfer/widen kernels key on (width, column classes) instead of on
    every trace height; binary selector columns pack 8 rows/byte."""
    from .jit_util import cached_jit

    h, w = t.shape
    target = target or h
    assert target >= h
    if target * w < (1 << 16) or w == 0 or h == 0:
        if target > h:
            t = np.concatenate([t, np.zeros((target - h, w), dtype=t.dtype)])
        fn = cached_jit("to_monty", t.shape, lambda: f.to_monty)
        return fn(xp.asarray(t))
    mx = t.max(axis=0) if h else np.zeros(w, dtype=np.uint32)
    cls = np.where(mx <= 1, 0,
                   np.where(mx <= 0xFF, 1, np.where(mx <= 0xFFFF, 2, 3))).astype(np.int8)
    key = (tag, w)
    prev = _UPLOAD_PARTITIONS.get(key)
    if prev is not None:
        cls = np.maximum(cls, prev)
    _UPLOAD_PARTITIONS[key] = cls
    colsb = tuple(int(c) for c in np.nonzero(cls == 0)[0])
    cols8 = tuple(int(c) for c in np.nonzero(cls == 1)[0])
    cols16 = tuple(int(c) for c in np.nonzero(cls == 2)[0])
    cols32 = tuple(int(c) for c in np.nonzero(cls == 3)[0])
    order = list(colsb) + list(cols8) + list(cols16) + list(cols32)
    inv = np.empty(w, dtype=np.int32)
    inv[order] = np.arange(w, dtype=np.int32)
    inv_t = tuple(int(i) for i in inv)
    # slice column groups through the transpose: traces are built F-order, so
    # tT row-gathers are contiguous copies
    tT = t.T

    def chunk_parts(lo: int, hi: int, rows: int):
        """Host column-group arrays for rows [lo, hi), zero-padded to rows."""
        def pad(a, fill_rows):
            if a.shape[1] == fill_rows:
                return a
            out = np.zeros((a.shape[0], fill_rows), dtype=a.dtype)
            out[:, : a.shape[1]] = a
            return out

        seg = tT[:, lo:hi]
        bits_ = pad(seg[list(colsb)].astype(np.uint8), rows)
        packed = np.packbits(bits_, axis=1) if colsb else np.zeros((0, rows // 8), np.uint8)
        return (
            xp.asarray(packed),
            xp.asarray(pad(seg[list(cols8)].astype(np.uint8), rows)),
            xp.asarray(pad(seg[list(cols16)].astype(np.uint16), rows)),
            xp.asarray(pad(np.ascontiguousarray(seg[list(cols32)]), rows)),
        )

    def make(rows):
        import jax.numpy as jnp

        def fn(bb, b8, b16, b32):
            if colsb:
                # unpack bits: (nb, rows//8) u8 -> (nb, rows) 0/1
                shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
                un = ((bb[:, :, None] >> shifts[None, None, :]) & jnp.uint8(1))
                bit_rows = un.reshape(bb.shape[0], rows).astype(jnp.uint32)
            else:
                bit_rows = jnp.zeros((0, rows), jnp.uint32)
            cat = jnp.concatenate(
                [bit_rows, b8.astype(jnp.uint32), b16.astype(jnp.uint32), b32], axis=0
            )
            return f.to_monty(cat[jnp.array(inv_t, dtype=jnp.int32)].T)

        return fn

    chunks = []
    lo = 0
    while lo < h:
        hi = min(lo + _UPLOAD_CHUNK, h)
        n = hi - lo
        rows = n if n == _UPLOAD_CHUNK else max(8, 1 << (n - 1).bit_length())
        fn = cached_jit("trace_pack_monty_t2", (rows, w, colsb, cols8, cols16),
                        lambda rows=rows: make(rows))
        chunks.append((fn(*chunk_parts(lo, hi, rows)), n))
        lo = hi

    def asm_make():
        import jax.numpy as jnp

        def fn(parts):
            segs = [p[:n] for p, n in zip(parts, keep)]
            total = sum(keep)
            if target > total:
                segs.append(jnp.zeros((target - total, w), jnp.uint32))
            return jnp.concatenate(segs, axis=0) if len(segs) > 1 else segs[0]

        return fn

    keep = tuple(n for _p, n in chunks)
    shapes = tuple(p.shape[0] for p, _n in chunks)
    asm = cached_jit("trace_asm", (shapes, keep, w, target), asm_make)
    return asm([p for p, _n in chunks])


class StarkMachine:
    def __init__(self, config: StarkConfig, chips: list[Chip], num_public_values: int = 0, shape_config=None):
        self.config = config
        self.chips = chips
        self.num_public_values = num_public_values
        self.chip_map = {c.name: c for c in chips}
        self.shape_config = shape_config  # optional fixed-shape menu

    # ------------------------------------------------------------------ setup

    def setup(self, program) -> ProvingKey:
        preps = []
        for chip in self.chips:
            t = chip.air.generate_preprocessed(program)
            if t is not None:
                if self.shape_config is not None:
                    t = pad_to_power_of_two(
                        t, fixed_rows=self.shape_config.fix_preprocessed_rows(t.shape[0])
                    )
                else:
                    t = pad_to_power_of_two(t)
                preps.append((chip.name, f.to_monty(t.astype(np.uint32))))
        preps.sort(key=lambda nt: (-nt[1].shape[0],))
        if preps:
            doms_mats = [(Domain(m.shape[0].bit_length() - 1, 1), m) for _n, m in preps]
            prep_data = pcs.commit(self.config.fri, doms_mats)
            # program-lifetime commitment: open_batches must not free its
            # coefficient matrices between shards
            prep_data.persistent = True
            vk = VerifyingKey(
                np.asarray(prep_data.root),
                [(n, m.shape[0].bit_length() - 1) for n, m in preps],
            )
        else:
            prep_data, vk = None, VerifyingKey(None, [])
        return ProvingKey(prep_data, {n: m for n, m in preps}, [n for n, _ in preps], vk)

    # ------------------------------------------------------------------ prove

    def prove_shard(self, pk: ProvingKey, record, public_values: np.ndarray, xp=np) -> ShardProof:
        """Prove one shard. ``record`` is passed opaquely to the chips."""
        from ..utils.logger import span

        chips = [c for c in self.chips if c.air.included(record)]
        for name in pk.prep_traces:
            assert self.chip_map[name] in chips, f"preprocessed chip {name} must be included"

        # 1. generate + pad main traces (optionally to a fixed shape).
        #    Fills run in a thread pool (numpy/C release the GIL); chips that
        #    consume other fills' side outputs (ByteAir reads the byte-lookup
        #    arrays every ALU fill appends) run after the producers.  The
        #    byte-lookup list order is thread-dependent but its multiset --
        #    all the Byte chip reads -- is not.
        with span("prove.trace_gen"):
            producers = [c for c in chips if not getattr(c.air, "trace_consumes_fills", False)]
            consumers = [c for c in chips if getattr(c.air, "trace_consumes_fills", False)]
            if len(producers) > 3:
                from ..utils.pool import make_pool

                with make_pool(min(8, len(producers))) as tp:
                    raw = dict(tp.map(
                        lambda c: (c.name, c.air.generate_trace(record, None).astype(np.uint32)),
                        producers,
                    ))
            else:
                raw = {c.name: c.air.generate_trace(record, None).astype(np.uint32) for c in producers}
            for c in consumers:
                raw[c.name] = c.air.generate_trace(record, None).astype(np.uint32)
        _pad_span = span("prove.pad_upload"); _pad_span.__enter__()
        shape = None
        if self.shape_config is not None:
            shape = self.shape_config.fix_shape(
                {n: t.shape[0] for n, t in raw.items()},
                widths={n: t.shape[1] for n, t in raw.items()},
            )
        traces = {}
        for chip in chips:
            t = raw[chip.name]
            fixed = pk.prep_traces.get(chip.name)
            target = None
            if fixed is not None:
                target = fixed.shape[0]
            elif shape is not None and shape.log_h(chip.name) is not None:
                target = 1 << shape.log_h(chip.name)
            else:
                target = max(16, 1 << max(t.shape[0] - 1, 1).bit_length())
            pad_hook = getattr(chip.air, "pad_rows", None)
            if pad_hook is not None:
                t = pad_hook(t, target)
            if xp is np:
                t = pad_to_power_of_two(t, fixed_rows=target)
                traces[chip.name] = f.to_monty(t)
            else:
                # upload CANONICAL values packed to the narrowest per-column
                # dtype (binary selectors bit-packed, flags/bytes as u8,
                # 16-bit limbs as u16) and widen + convert to Montgomery +
                # zero-pad on device: the tunnel transfer is the bottleneck
                traces[chip.name] = _upload_trace_monty(
                    t, xp, tag=chip.name, target=target
                )
        _pad_span.__exit__(None, None, None)
        chips = sorted(chips, key=lambda c: -traces[c.name].shape[0])
        names = [c.name for c in chips]
        log_degrees = {n: traces[n].shape[0].bit_length() - 1 for n in names}

        ch = self.config.challenger()
        pk.vk.observe_into(ch)
        ch.observe_slice(public_values)

        released = [xp is np]  # host path: no semaphore held
        if xp is not np:
            _HEAVY_PHASE_SEM.acquire()

        def release_heavy():
            if not released[0]:
                released[0] = True
                _HEAVY_PHASE_SEM.release()

        try:
            return self._prove_shard_body(
                pk, chips, names, traces, log_degrees, ch, public_values, xp,
                release_heavy,
            )
        finally:
            release_heavy()

    def _prove_shard_body(self, pk, chips, names, traces, log_degrees, ch,
                          public_values, xp, release_heavy):
        from ..utils.logger import span

        # 2. commit main
        with span("prove.main_commit"):
            main_data = pcs.commit(
                self.config.fri, [(Domain(log_degrees[n], 1), traces[n]) for n in names], xp=xp
            )
        ch.observe_digest(main_data.root)
        if xp is not np:
            # LDEs are dead until the open phase (quotient reuses coeffs);
            # drop them so more shard workers fit in HBM (regenerated by
            # open_batches via ProverData.ensure_ldes)
            main_data.drop_ldes()
        perm_challenges = [ch.sample_ext(), ch.sample_ext()]

        # 3. permutation traces
        perm_flats, cum_sums = {}, {}
        _perm_span = span("prove.perm_traces"); _perm_span.__enter__()
        for chip in chips:
            prep = pk.prep_traces.get(chip.name)
            if xp is np or traces[chip.name].shape[0] <= DEVICE_MIN_ROWS:
                # tiny (mostly-padding) chips stay on the host: their XLA
                # kernels cost tens of seconds of compile for microseconds of
                # work (the fib bench showed 135 s compiling a height-16
                # ShaCompress quotient kernel)
                flat, cum = permutation.generate_permutation_trace(
                    chip, prep, np.asarray(traces[chip.name]), perm_challenges[0],
                    perm_challenges[1], chip.batch_size, xp=np,
                )
            else:
                # block-stationary kernel: the fraction DAG compiles once per
                # chip (any height); see stark/blocks.py
                from . import blocks

                flat, cum = blocks.perm_trace_blocked(
                    chip, prep, traces[chip.name], perm_challenges[0],
                    perm_challenges[1], chip.batch_size, xp,
                )
            perm_flats[chip.name] = flat
            cum_sums[chip.name] = cum
        if xp is not np:
            # one bulk transfer: a per-chip np.asarray(cum) would round-trip
            # the chip tunnel per chip AND serialize the perm-trace dispatches
            import jax

            cum_sums = {n: v for n, v in zip(
                cum_sums, jax.device_get(list(cum_sums.values()))
            )}
        else:
            cum_sums = {n: np.asarray(v) for n, v in cum_sums.items()}
        _perm_span.__exit__(None, None, None)
        perm_names = [c.name for c in chips if c.perm_width_ext > 0]
        perm_data = None
        if perm_names:
          with span("prove.perm_commit"):
            perm_data = pcs.commit(
                self.config.fri,
                [(Domain(log_degrees[n], 1), perm_flats[n]) for n in perm_names],
                xp=xp,
            )
            ch.observe_digest(perm_data.root)
            if xp is not np:
                perm_data.drop_ldes()
        global_sums = {}
        for chip in chips:
            ch.observe_slice(ext4.to_canonical(cum_sums[chip.name]))
            if chip.commit_scope == air.Scope.Global:
                gsum = self._chip_global_sum(chip, traces[chip.name])
                global_sums[chip.name] = gsum
                ch.observe_slice(gsum)
        alpha = ch.sample_ext()

        # 4. quotient
        publics_monty = f.to_monty(public_values.astype(np.uint32))
        q_doms, q_mats = [], []
        _q_span = span("prove.quotient"); _q_span.__enter__()
        for chip in chips:
            gs = global_sums.get(chip.name)
            gsm = f.to_monty(gs.astype(np.uint32)) if gs is not None else None
            args = (
                traces[chip.name], pk.prep_traces.get(chip.name), perm_flats[chip.name],
                publics_monty, perm_challenges, cum_sums[chip.name], gsm, alpha,
            )
            if xp is np or traces[chip.name].shape[0] <= DEVICE_MIN_ROWS:
                host_args = (
                    np.asarray(traces[chip.name]), pk.prep_traces.get(chip.name),
                    np.asarray(perm_flats[chip.name]), publics_monty, perm_challenges,
                    cum_sums[chip.name], gsm, alpha,
                )
                doms, chunks = quotient_mod.quotient_chunks(chip, *host_args, xp=np)
            else:
                from . import blocks

                import os as _os

                no_reuse = bool(_os.environ.get("ZKMIPS_NO_COEFF_REUSE"))
                ci = names.index(chip.name)
                pi = perm_names.index(chip.name) if chip.name in perm_names else None
                if no_reuse:
                    ci = pi = None
                doms, chunks = blocks.quotient_chunks_blocked(
                    chip, traces[chip.name], pk.prep_traces.get(chip.name),
                    perm_flats[chip.name], publics_monty, perm_challenges,
                    cum_sums[chip.name], gsm, alpha, xp,
                    main_coeffs=None if ci is None else main_data.coeffs[ci],
                    perm_coeffs=None if pi is None or perm_data is None
                    else perm_data.coeffs[pi],
                    prep_coeffs=None if no_reuse or pk.prep_data is None
                    or chip.name not in pk.prep_order
                    else pk.prep_data.coeffs[pk.prep_order.index(chip.name)],
                )
            for d, c in zip(doms, chunks):
                q_doms.append(d)
                q_mats.append(c.reshape(c.shape[0], 4))
        _q_span.__exit__(None, None, None)
        with span("prove.quotient_commit"):
            quotient_data = pcs.commit(self.config.fri, list(zip(q_doms, q_mats)), xp=xp)
        ch.observe_digest(quotient_data.root)
        zeta = ch.sample_ext()

        # the main traces and permutation flats are dead past this point
        # (opened values come from the committed coefficient/LDE matrices);
        # dropping them frees ~1.4 GB per 2^20-cycle shard before the open
        # phase, letting the next shard's heavy phase overlap this one's open
        traces = None
        perm_flats = None
        q_mats = len(q_mats)  # only the count is needed below
        release_heavy()

        # 5. open
        _open_prep = span("prove.open_prep"); _open_prep.__enter__()
        rounds = []
        if pk.prep_data is not None:
            prep_points = [
                [zeta, Domain(pk.prep_traces[n].shape[0].bit_length() - 1, 1).next_point_ext(zeta)]
                for n in pk.prep_order
            ]
            rounds.append((pk.prep_data, prep_points))
        trace_points = [[zeta, Domain(log_degrees[n], 1).next_point_ext(zeta)] for n in names]
        rounds.append((main_data, trace_points))
        if perm_data is not None:
            perm_points = [[zeta, Domain(log_degrees[n], 1).next_point_ext(zeta)] for n in perm_names]
            rounds.append((perm_data, perm_points))
        rounds.append((quotient_data, [[zeta]] * q_mats))
        _open_prep.__exit__(None, None, None)
        opened_vals, fri_proof = pcs.open_batches(self.config.fri, rounds, ch, xp=xp)

        # 6. assemble per-chip opened values
        ri = 0
        prep_opened = {}
        if pk.prep_data is not None:
            for n, vals in zip(pk.prep_order, opened_vals[ri]):
                prep_opened[n] = vals
            ri += 1
        main_opened = opened_vals[ri]
        if perm_data is not None:
            perm_opened = {n: v for n, v in zip(perm_names, opened_vals[ri + 1])}
            q_opened = opened_vals[ri + 2]
        else:
            perm_opened = {}
            q_opened = opened_vals[ri + 1]

        opened = []
        qi = 0
        empty = np.zeros((0, 4), dtype=np.uint32)
        for i, chip in enumerate(chips):
            nchunks = chip.quotient_chunks
            qvals = [np.asarray(q_opened[qi + k][0]) for k in range(nchunks)]
            qi += nchunks
            po = prep_opened.get(chip.name)
            pe = perm_opened.get(chip.name)
            opened.append(
                ChipOpenedValues(
                    preprocessed_local=None if po is None else np.asarray(po[0]),
                    preprocessed_next=None if po is None else np.asarray(po[1]),
                    main_local=np.asarray(main_opened[i][0]),
                    main_next=np.asarray(main_opened[i][1]),
                    perm_local=empty if pe is None else np.asarray(pe[0]),
                    perm_next=empty if pe is None else np.asarray(pe[1]),
                    quotient=qvals,
                    local_cumulative_sum=cum_sums[chip.name],
                    global_sum=global_sums.get(chip.name),
                    log_degree=log_degrees[chip.name],
                )
            )

        return ShardProof(
            main_root=np.asarray(main_data.root),
            perm_root=self.config.zero_digest() if perm_data is None else np.asarray(perm_data.root),
            quotient_root=np.asarray(quotient_data.root),
            chip_names=names,
            opened=opened,
            fri_proof=fri_proof,
            public_values=public_values.astype(np.uint32),
        )

    def _chip_global_sum(self, chip, trace_monty) -> np.ndarray:
        """Read the claimed global septic digest from the last row (canonical)."""
        last = f.from_monty(np.asarray(trace_monty[-1, -14:]))
        return np.asarray(last, dtype=np.uint32)

    # ----------------------------------------------------------------- verify

    def verify_shard(self, vk: VerifyingKey, proof: ShardProof):
        ch = self.config.challenger()
        vk.observe_into(ch)
        if proof.public_values.shape[0] != self.num_public_values:
            raise VerificationError("wrong number of public values")
        ch.observe_slice(proof.public_values)

        chips = []
        for n in proof.chip_names:
            c = self.chip_map.get(n)
            if c is None:
                raise VerificationError(f"unknown chip {n}")
            chips.append(c)
        prep_names = [n for n, _ in vk.prep_heights]
        for n in prep_names:
            if n not in proof.chip_names:
                raise VerificationError(f"preprocessed chip {n} missing from shard")

        ch.observe_digest(proof.main_root)
        perm_challenges = [ch.sample_ext(), ch.sample_ext()]
        perm_chip_names = [c.name for c in chips if c.perm_width_ext > 0]
        if perm_chip_names:
            ch.observe_digest(proof.perm_root)
        for chip, ov in zip(chips, proof.opened):
            if chip.perm_width_ext == 0 and not np.array_equal(
                ov.local_cumulative_sum, ext4.ZERO.astype(np.uint32)
            ):
                raise VerificationError(f"{chip.name}: nonzero cumsum without lookups")
            ch.observe_slice(ext4.to_canonical(ov.local_cumulative_sum))
            if chip.commit_scope == air.Scope.Global:
                if ov.global_sum is None:
                    raise VerificationError("missing global sum")
                ch.observe_slice(ov.global_sum)
        alpha = ch.sample_ext()
        ch.observe_digest(proof.quotient_root)
        zeta = ch.sample_ext()

        # shape checks
        for chip, ov in zip(chips, proof.opened):
            if ov.main_local.shape != (chip.main_width, 4):
                raise VerificationError(f"{chip.name}: bad main opening width")
            if ov.perm_local.shape != (4 * chip.perm_width_ext, 4):
                raise VerificationError(f"{chip.name}: bad perm opening width")
            if len(ov.quotient) != chip.quotient_chunks:
                raise VerificationError(f"{chip.name}: bad quotient chunk count")

        # PCS rounds info
        rounds_info = []
        if vk.prep_root is not None:
            prep_mats = []
            for (n, log_h) in vk.prep_heights:
                ov = proof.opened[proof.chip_names.index(n)]
                d = Domain(log_h, 1)
                prep_mats.append(
                    (d, [(zeta, ov.preprocessed_local), (d.next_point_ext(zeta), ov.preprocessed_next)])
                )
            rounds_info.append((vk.prep_root, prep_mats))
        main_mats, perm_mats, q_mats = [], [], []
        for chip, ov in zip(chips, proof.opened):
            d = Domain(ov.log_degree, 1)
            zg = d.next_point_ext(zeta)
            main_mats.append((d, [(zeta, ov.main_local), (zg, ov.main_next)]))
            if chip.perm_width_ext > 0:
                perm_mats.append((d, [(zeta, ov.perm_local), (zg, ov.perm_next)]))
            qdom = d.create_disjoint_domain(d.size << chip.log_quotient_degree)
            for k, qd in enumerate(qdom.split_domains(chip.quotient_chunks)):
                q_mats.append((qd, [(zeta, ov.quotient[k])]))
        rounds_info.append((proof.main_root, main_mats))
        if perm_mats:
            rounds_info.append((proof.perm_root, perm_mats))
        rounds_info.append((proof.quotient_root, q_mats))

        try:
            pcs.verify_batches(self.config.fri, rounds_info, proof.fri_proof, ch)
        except pcs.PcsError as e:
            raise VerificationError(f"pcs: {e}") from e

        # constraint identity per chip
        publics_monty = f.to_monty(proof.public_values)
        for chip, ov in zip(chips, proof.opened):
            self._verify_chip_constraints(chip, ov, zeta, alpha, perm_challenges, publics_monty)

        # local lookup balance across the shard
        total = ext4.ZERO.astype(np.uint32)
        for ov in proof.opened:
            total = ext4.add(total, ov.local_cumulative_sum)
        if not np.array_equal(total, ext4.ZERO.astype(np.uint32)):
            raise VerificationError("local cumulative sums do not balance")
        return True

    def _verify_chip_constraints(self, chip, ov: ChipOpenedValues, zeta, alpha, perm_challenges, publics_monty):
        d = Domain(ov.log_degree, 1)
        sels = d.selectors_at_point_ext(zeta)

        def var_fn(segment, col, offset):
            if segment == air.MAIN:
                return (ov.main_local if offset == 0 else ov.main_next)[col]
            if segment == air.PREPROCESSED:
                return (ov.preprocessed_local if offset == 0 else ov.preprocessed_next)[col]
            if segment == air.PERM:
                flat = ov.perm_local if offset == 0 else ov.perm_next
                return _ext_from_flat(flat[4 * col : 4 * col + 4])
            raise ValueError(segment)

        gs = ov.global_sum
        ctx = air.EvalContext(
            var_fn,
            selectors={
                air.Selector.FIRST: sels["is_first_row"],
                air.Selector.LAST: sels["is_last_row"],
                air.Selector.TRANSITION: sels["is_transition"],
            },
            publics=publics_monty,
            challenges=perm_challenges,
            cum_sum=ov.local_cumulative_sum,
            global_sum=f.to_monty(gs.astype(np.uint32)) if gs is not None else None,
            ext_mode=True,
        )
        folded = air.fold_constraints(chip.constraints, alpha, ctx)  # (4,)

        # recombine quotient chunks (p3 uni-stark verifier recombination)
        qdom = d.create_disjoint_domain(d.size << chip.log_quotient_degree)
        chunk_doms = qdom.split_domains(chip.quotient_chunks)
        qz = None
        for i, (cd, vals) in enumerate(zip(chunk_doms, ov.quotient)):
            zp = ext4.ONE.astype(np.uint32)
            for j, od in enumerate(chunk_doms):
                if j == i:
                    continue
                num = od.zp_at_point_ext(zeta)
                den = od.zp_at_point_int(cd.shift)
                zp = ext4.mul(zp, ext4.mul_base(num, np.uint32(f.to_monty_int(f.inv_int(den)))))
            chunk_val = None
            for c in range(4):
                mono = np.zeros(4, dtype=np.uint32)
                mono[c] = f.MONTY_ONE
                term = ext4.mul(np.asarray(vals[c]), mono)
                chunk_val = term if chunk_val is None else ext4.add(chunk_val, term)
            term = ext4.mul(zp, chunk_val)
            qz = term if qz is None else ext4.add(qz, term)

        z_h = d.zp_at_point_ext(zeta)
        lhs = folded
        rhs = ext4.mul(qz, z_h)
        if not np.array_equal(np.asarray(lhs), np.asarray(rhs)):
            raise VerificationError(f"{chip.name}: constraint identity failed at zeta")


def _ext_from_flat(rows4):
    """4 opened ext values of the 4 base limbs -> one ext value.

    The flattened permutation matrix stores ext element e = sum_c e_c X^c as 4
    base columns; opening each base column at zeta gives ext values v_c, and
    e(zeta) = sum_c v_c * X^c.
    """
    out = None
    for c in range(4):
        mono = np.zeros(4, dtype=np.uint32)
        mono[c] = f.MONTY_ONE
        term = ext4.mul(np.asarray(rows4[c]), mono)
        out = term if out is None else ext4.add(out, term)
    return out
