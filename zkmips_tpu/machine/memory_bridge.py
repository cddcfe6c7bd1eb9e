"""Memory bridge chips: MemoryLocal + MemoryGlobalInit/Finalize.

MemoryLocal (analog of crates/core/machine/src/memory/local.rs) anchors each
shard's per-address access chain: it *sends* the initial record into the
shard-local Memory multiset (consumed by the address's first access) and
*receives* the final record (produced by the last access); both endpoint
records are exported to the cross-shard argument as Global-kind lookups
consumed by the Global chip.

MemoryGlobalInit/Finalize (memory/global.rs) are the shard-0 endpoints:
initialization sends (0, 0, addr, image value), finalization receives the
final state; both keep their address columns strictly increasing (duplicate
init/finalize of an address would break memory soundness).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..stark.air import AirBuilder, LookupKind
from ..stark.chip import BaseAir
from .gadgets import ByteSink, ColView, Schema, send_u16_check, send_u8_pair
from .lookups import global_msg, memory_msg
from .words import split_u32


@dataclass(frozen=True, slots=True)
class GlobalLookupEvent:
    message: tuple  # 7 canonical ints
    is_receive: bool
    kind: int


def _mem_global_message(shard, clk, addr, v_lo, v_hi):
    return (shard, clk, addr, v_lo, v_hi, 0, 0)


class MemoryLocalAir(BaseAir):
    name = "MemoryLocal"

    _COLS = [
        "addr", "i_shard", "i_clk", "i_lo", "i_hi",
        "f_shard", "f_clk", "f_lo", "f_hi", "is_real",
    ]

    def __init__(self):
        self.schema = Schema(self._COLS)
        self.main_width = self.schema.width

    def included(self, record) -> bool:
        return bool(record.all_local_memory_events())

    def eval(self, b: AirBuilder):
        col = ColView(b, self.schema)
        is_real = col("is_real")
        b.assert_bool(is_real)
        addr = col("addr")
        init = col.word("i")
        fin = col.word("f")
        # open/close the shard-local chain
        b.send(LookupKind.Memory, memory_msg(col("i_shard"), col("i_clk"), addr, init), is_real)
        b.receive(LookupKind.Memory, memory_msg(col("f_shard"), col("f_clk"), addr, fin), is_real)
        # export both endpoints to the global argument
        b.send(
            LookupKind.Global,
            global_msg([col("i_shard"), col("i_clk"), addr, init.lo, init.hi, 0, 0], 0, is_real, int(LookupKind.Memory)),
            is_real,
        )
        b.send(
            LookupKind.Global,
            global_msg([col("f_shard"), col("f_clk"), addr, fin.lo, fin.hi, 0, 0], is_real, 0, int(LookupKind.Memory)),
            is_real,
        )

    def generate_dependencies(self, record, output):
        for ev in record.all_local_memory_events():
            i_lo, i_hi = split_u32(ev.initial.value)
            f_lo, f_hi = split_u32(ev.final.value)
            record.global_lookup_events.append(
                GlobalLookupEvent(
                    _mem_global_message(ev.initial.shard, ev.initial.timestamp, ev.addr, i_lo, i_hi),
                    True, int(LookupKind.Memory),
                )
            )
            record.global_lookup_events.append(
                GlobalLookupEvent(
                    _mem_global_message(ev.final.shard, ev.final.timestamp, ev.addr, f_lo, f_hi),
                    False, int(LookupKind.Memory),
                )
            )

    def generate_trace(self, record, output):
        events = sorted(record.all_local_memory_events(), key=lambda e: e.addr)
        s = self.schema
        t = np.zeros((len(events), s.width), dtype=np.uint32, order="F")
        for i, ev in enumerate(events):
            i_lo, i_hi = split_u32(ev.initial.value)
            f_lo, f_hi = split_u32(ev.final.value)
            t[i] = (
                ev.addr, ev.initial.shard, ev.initial.timestamp, i_lo, i_hi,
                ev.final.shard, ev.final.timestamp, f_lo, f_hi, 1,
            )
        return t


class _MemoryEndpointAir(BaseAir):
    """Shared structure for init/finalize: sorted addresses + global export."""

    _COLS = [
        "addr", "a16", "a15", "v_lo", "v_hi", "shard", "clk",
        "cmp_hi", "d", "has_next", "is_real",
    ]
    IS_INIT = True

    def __init__(self):
        self.schema = Schema(self._COLS)
        self.main_width = self.schema.width

    def eval(self, b: AirBuilder):
        col = ColView(b, self.schema)
        is_real = col("is_real")
        b.assert_bool(is_real)
        addr = col("addr")
        v = col.word("v")
        shard, clk = col("shard"), col("clk")
        if self.IS_INIT:
            b.when(is_real).assert_zero(shard)
            b.when(is_real).assert_zero(clk)
            # initial values enter the system here: range check the limbs
            send_u16_check(b, v.lo, is_real)
            send_u16_check(b, v.hi, is_real)
        b.send(
            LookupKind.Global,
            global_msg(
                [shard, clk, addr, v.lo, v.hi, 0, 0],
                is_real if self.IS_INIT else 0,
                0 if self.IS_INIT else is_real,
                int(LookupKind.Memory),
            ),
            is_real,
        )
        # addr = a16 + a15 * 2^16, a15 < 2^15  (addr < 2^31)
        b.when(is_real).assert_eq(addr, col("a16") + col("a15") * 65536)
        send_u16_check(b, col("a16"), is_real)
        send_u16_check(b, col("a15") * 2, is_real)
        # strictly increasing addresses among real rows
        nxt_real = col("is_real", 1)
        b.when_transition().when(nxt_real).assert_one(is_real)  # real-rows prefix
        has_next = col("has_next")
        b.when_transition().assert_eq(has_next, is_real * nxt_real)
        b.when_last_row().assert_zero(has_next)
        cmp_hi = col("cmp_hi")
        b.assert_bool(cmp_hi)
        t = b.when_transition().when(nxt_real)
        t.when(cmp_hi).assert_eq(col("d"), col("a15", 1) - col("a15") - 1)
        t.when_not(cmp_hi).assert_eq(col("a15", 1), col("a15"))
        t.when_not(cmp_hi).assert_eq(col("d"), col("a16", 1) - col("a16") - 1)
        send_u16_check(b, col("d"), col("has_next"))

    def _events(self, record):
        evs = record.global_memory_initialize_events if self.IS_INIT else record.global_memory_finalize_events
        return sorted(evs, key=lambda e: e.addr)

    def included(self, record) -> bool:
        return bool(self._events(record))

    def generate_dependencies(self, record, output):
        for ev in self._events(record):
            lo, hi = split_u32(ev.value)
            record.global_lookup_events.append(
                GlobalLookupEvent(
                    _mem_global_message(ev.shard, ev.timestamp, ev.addr, lo, hi),
                    not self.IS_INIT, int(LookupKind.Memory),
                )
            )

    def generate_trace(self, record, output):
        events = self._events(record)
        s = self.schema
        t = np.zeros((len(events), s.width), dtype=np.uint32, order="F")
        sink = ByteSink(record)
        for i, ev in enumerate(events):
            lo, hi = split_u32(ev.value)
            a16, a15 = ev.addr & 0xFFFF, ev.addr >> 16
            t[i, s.idx("addr")] = ev.addr
            t[i, s.idx("a16")] = a16
            t[i, s.idx("a15")] = a15
            t[i, s.idx("v_lo")] = lo
            t[i, s.idx("v_hi")] = hi
            t[i, s.idx("shard")] = ev.shard
            t[i, s.idx("clk")] = ev.timestamp
            t[i, s.idx("is_real")] = 1
            sink.u16(np.array([a16], dtype=np.uint32))
            sink.u16(np.array([a15 * 2], dtype=np.uint32))
            if self.IS_INIT:
                sink.u16(np.array([lo], dtype=np.uint32))
                sink.u16(np.array([hi], dtype=np.uint32))
            if i + 1 < len(events):
                nxt = events[i + 1]
                n16, n15 = nxt.addr & 0xFFFF, nxt.addr >> 16
                if n15 > a15:
                    t[i, s.idx("cmp_hi")] = 1
                    d = n15 - a15 - 1
                else:
                    assert n15 == a15 and n16 > a16, "addresses not strictly increasing"
                    d = n16 - a16 - 1
                t[i, s.idx("d")] = d
                t[i, s.idx("has_next")] = 1
                sink.u16(np.array([d], dtype=np.uint32))
        return t


class MemoryGlobalInitAir(_MemoryEndpointAir):
    name = "MemoryGlobalInit"
    IS_INIT = True


class MemoryGlobalFinalizeAir(_MemoryEndpointAir):
    name = "MemoryGlobalFinalize"
    IS_INIT = False
