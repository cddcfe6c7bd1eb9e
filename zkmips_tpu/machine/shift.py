"""Shift chips: ShiftLeft (SLL) and ShiftRight (SRL/SRA/ROR).

Byte-granular shift verification (the analog of crates/core/machine/src/alu/
sll + sr, redesigned for 16-bit limb words): a shift by s splits into a
multiply by 2^(s mod 8) — verified byte-by-byte against the POW2 byte-table
entry with byte product decompositions — and a byte rotation by s div 8
selected by the two high bits of s.  Right shifts and rotations verify the
inverse relation in = q*2^s + r with r < 2^s, the range proof being a second
wrap-free shift gadget (r * 2^(32-s) < 2^32).  SRA flips input and output by
the sign (x >>a s == ~(~x >>l s)).
"""

from __future__ import annotations

import numpy as np

from ..executor.opcodes import Opcode
from ..stark.air import AirBuilder
from .gadgets import ByteSink, ColView, send_byte_op, send_u16_check, send_u8_pair
from .instr_chip import InstrAir
from .lookups import ByteOpcode

O = Opcode


class ShiftGadget:
    """out = in_bytes << s (mod 2^32), plus the discarded-high-bytes sum."""

    def __init__(self, prefix: str):
        self.p = prefix

    def cols(self) -> list[str]:
        p = self.p
        return [f"{p}_m"] + [f"{p}_lo{i}" for i in range(4)] + [f"{p}_hi{i}" for i in range(4)]

    def constrain(self, b: AirBuilder, col: ColView, in_bytes, sbits, mult):
        """Returns (out_bytes[4], wrap_sum_expr).  sbits = [s0..s4] exprs."""
        p = self.p
        m = col(f"{p}_m")
        s_low3 = sbits[0] + sbits[1] * 2 + sbits[2] * 4
        send_byte_op(b, ByteOpcode.POW2, m, s_low3, 0, mult)
        lo = [col(f"{p}_lo{i}") for i in range(4)]
        hi = [col(f"{p}_hi{i}") for i in range(4)]
        for i in range(4):
            b.when(mult).assert_eq(in_bytes[i] * m, hi[i] * 256 + lo[i])
            send_u8_pair(b, lo[i], hi[i], mult)
        # r_j = true byte j of (in * 2^(s mod 8)); k = byte rotation
        r = [lo[0], lo[1] + hi[0], lo[2] + hi[1], lo[3] + hi[2], hi[3], 0, 0, 0]
        s3, s4 = sbits[3], sbits[4]
        ksel = [(1 - s3) * (1 - s4), s3 * (1 - s4), (1 - s3) * s4, s3 * s4]
        out = []
        for j in range(4):
            e = 0
            for k in range(4):
                if j - k >= 0:
                    e = e + ksel[k] * r[j - k]
            out.append(e)
        wrap = 0
        for t in range(4, 8):
            for k in range(4):
                if 0 <= t - k <= 4 and not (isinstance(r[t - k], int) and r[t - k] == 0):
                    wrap = wrap + ksel[k] * r[t - k]
        return out, wrap

    def fill(self, t, schema, i, value: int, s: int, sink: ByteSink):
        p = self.p
        m = 1 << (s & 7)
        t[i, schema.idx(f"{p}_m")] = m
        sink.pow2(np.array([m], dtype=np.uint32), np.array([s & 7], dtype=np.uint32))
        for j in range(4):
            byte = (value >> (8 * j)) & 0xFF
            prod = byte * m
            lo, hi = prod & 0xFF, prod >> 8
            t[i, schema.idx(f"{p}_lo{j}")] = lo
            t[i, schema.idx(f"{p}_hi{j}")] = hi
            sink.u8pair(np.array([lo], dtype=np.uint32), np.array([hi], dtype=np.uint32))


def _sbit_cols(prefix):
    return [f"{prefix}{i}" for i in range(5)]


def _decompose_shift(b, col, sels_prefix: str, c_lo, mult, suffix=""):
    """s = c mod 32 via bits; c_lo = s + 32 * rest, rest < 2^11."""
    sbits = [col(f"s{suffix}{i}") for i in range(5)]
    for s_ in sbits:
        b.assert_bool(s_)
    s = sbits[0] + sbits[1] * 2 + sbits[2] * 4 + sbits[3] * 8 + sbits[4] * 16
    rest = col(f"c_rest{suffix}")
    b.when(mult).assert_eq(c_lo, s + rest * 32)
    send_u16_check(b, rest * 32, mult)
    return sbits, s


class ShiftLeftAir(InstrAir):
    name = "ShiftLeft"
    OPCODES = [O.SLL]
    EXTRA_COLS = (
        _sbit_cols("s") + ["c_rest"] + [f"bb{i}" for i in range(4)] + ShiftGadget("g").cols()
    )

    def __init__(self):
        super().__init__()
        self.gadget = ShiftGadget("g")

    def eval_op(self, b: AirBuilder, col: ColView, sels):
        is_real = col("is_real")
        a, bw, cw = col.word("a"), col.word("b"), col.word("c")
        sbits, _s = _decompose_shift(b, col, "s", cw.lo, is_real)
        bb = [col(f"bb{i}") for i in range(4)]
        b.when(is_real).assert_eq(bw.lo, bb[0] + bb[1] * 256)
        b.when(is_real).assert_eq(bw.hi, bb[2] + bb[3] * 256)
        send_u8_pair(b, bb[0], bb[1], is_real)
        send_u8_pair(b, bb[2], bb[3], is_real)
        out, _wrap = self.gadget.constrain(b, col, bb, sbits, is_real)
        b.when(is_real).assert_eq(a.lo, out[0] + out[1] * 256)
        b.when(is_real).assert_eq(a.hi, out[2] + out[3] * 256)

    def fill_op(self, t, i, e, op, sink: ByteSink):
        s = self.schema
        bb, c = int(e.b), int(e.c)
        sh = c & 31
        for j in range(5):
            t[i, s.idx(f"s{j}")] = (sh >> j) & 1
        rest = (c & 0xFFFF) >> 5
        t[i, s.idx("c_rest")] = rest
        sink.u16(np.array([rest * 32], dtype=np.uint32))
        for j in range(4):
            t[i, s.idx(f"bb{j}")] = (bb >> (8 * j)) & 0xFF
        sink.u8pair(np.array([bb & 0xFF], dtype=np.uint32), np.array([(bb >> 8) & 0xFF], dtype=np.uint32))
        sink.u8pair(np.array([(bb >> 16) & 0xFF], dtype=np.uint32), np.array([(bb >> 24) & 0xFF], dtype=np.uint32))
        self.gadget.fill(t, s, i, bb, sh, sink)

    def nested_of(self, record):
        ops = set(self.OPCODES)
        return [e for e in record.nested_alu_events if e.opcode in ops]


class ShiftRightAir(InstrAir):
    name = "ShiftRight"
    OPCODES = [O.SRL, O.SRA, O.ROR]
    EXTRA_COLS = (
        _sbit_cols("s") + ["c_rest", "s_zero", "s_inv", "b_h0", "b_h1", "msb_b", "f"]
        + [f"q{x}" for x in ("_lo", "_hi")] + [f"qb{i}" for i in range(4)]
        + [f"r{x}" for x in ("_lo", "_hi")] + [f"rb{i}" for i in range(4)]
        + _sbit_cols("t") + ["carry"]
        + ShiftGadget("gq").cols() + ShiftGadget("gr").cols()
    )

    def __init__(self):
        super().__init__()
        self.gq = ShiftGadget("gq")
        self.gr = ShiftGadget("gr")

    def eval_op(self, b: AirBuilder, col: ColView, sels):
        is_srl, is_sra, is_ror = sels
        is_real = col("is_real")
        a, bw, cw = col.word("a"), col.word("b"), col.word("c")
        sbits, s = _decompose_shift(b, col, "s", cw.lo, is_real)
        # s == 0 flag
        sz, sinv = col("s_zero"), col("s_inv")
        b.assert_bool(sz)
        b.assert_zero(sz * s)
        b.when(is_real).assert_zero(sz + s * sinv - 1)
        # SRA sign: f = is_sra * msb(b)
        b.when(is_real).assert_eq(bw.hi, col("b_h0") + col("b_h1") * 256)
        send_u8_pair(b, col("b_h0"), col("b_h1"), is_real)
        send_byte_op(b, ByteOpcode.MSB, col("msb_b"), col("b_h1"), 0, is_real)
        f = col("f")
        b.assert_eq(f, is_sra * col("msb_b"))
        # flipped input / output (identity unless SRA with sign set)
        in_lo = bw.lo + f * (65535 - 2 * bw.lo)
        in_hi = bw.hi + f * (65535 - 2 * bw.hi)
        out_lo = a.lo + f * (65535 - 2 * a.lo)
        out_hi = a.hi + f * (65535 - 2 * a.hi)

        q, r = col.word("q"), col.word("r")
        qb = [col(f"qb{i}") for i in range(4)]
        rb = [col(f"rb{i}") for i in range(4)]
        for w_, bs in ((q, qb), (r, rb)):
            b.when(is_real).assert_eq(w_.lo, bs[0] + bs[1] * 256)
            b.when(is_real).assert_eq(w_.hi, bs[2] + bs[3] * 256)
            send_u8_pair(b, bs[0], bs[1], is_real)
            send_u8_pair(b, bs[2], bs[3], is_real)

        # gadget A: q << s (wrap-free) + r == in
        outq, wrapq = self.gq.constrain(b, col, qb, sbits, is_real)
        b.when(is_real).assert_zero(wrapq)
        v1_lo = outq[0] + outq[1] * 256
        v1_hi = outq[2] + outq[3] * 256
        carry = col("carry")
        b.assert_bool(carry)
        b.when(is_real).assert_eq(v1_lo + r.lo, in_lo + carry * 65536)
        b.when(is_real).assert_eq(v1_hi + r.hi + carry, in_hi)

        # gadget B: r << (32 - s) wrap-free  (=> r < 2^s); t bits witness 32-s
        tbits = [col(f"t{i}") for i in range(5)]
        for t_ in tbits:
            b.assert_bool(t_)
        t_val = tbits[0] + tbits[1] * 2 + tbits[2] * 4 + tbits[3] * 8 + tbits[4] * 16
        nz = is_real * (1 - sz)
        b.when(nz).assert_eq(t_val + s, 32)
        outr, wrapr = self.gr.constrain(b, col, rb, tbits, nz)
        b.when(nz).assert_zero(wrapr)
        # s == 0: r must be 0 and out == in
        b.when(is_real).when(sz).assert_zero(r.lo + r.hi)

        # result: srl/sra: out' == q ; ror: out == q + (r << 32-s)
        rs_lo = outr[0] + outr[1] * 256
        rs_hi = outr[2] + outr[3] * 256
        w = b.when(is_real)
        w.when(is_srl + is_sra).assert_eq(out_lo, q.lo)
        w.when(is_srl + is_sra).assert_eq(out_hi, q.hi)
        w.when(is_ror).assert_eq(a.lo, q.lo + rs_lo)
        w.when(is_ror).assert_eq(a.hi, q.hi + rs_hi)

    def nested_of(self, record):
        ops = set(self.OPCODES)
        return [e for e in record.nested_alu_events if e.opcode in ops]

    def fill_op(self, t, i, e, op, sink: ByteSink):
        s = self.schema
        a, bb, c = int(e.a), int(e.b), int(e.c)
        sh = c & 31
        for j in range(5):
            t[i, s.idx(f"s{j}")] = (sh >> j) & 1
        rest = (c & 0xFFFF) >> 5
        t[i, s.idx("c_rest")] = rest
        sink.u16(np.array([rest * 32], dtype=np.uint32))
        from ..ops import field as ff

        if sh == 0:
            t[i, s.idx("s_zero")] = 1
        else:
            t[i, s.idx("s_inv")] = ff.inv_int(sh)
        b_hi = bb >> 16
        t[i, s.idx("b_h0")], t[i, s.idx("b_h1")] = b_hi & 0xFF, b_hi >> 8
        sink.u8pair(np.array([b_hi & 0xFF], dtype=np.uint32), np.array([b_hi >> 8], dtype=np.uint32))
        msb = bb >> 31
        t[i, s.idx("msb_b")] = msb
        sink.msb(np.array([msb], dtype=np.uint32), np.array([b_hi >> 8], dtype=np.uint32))
        flip = op == O.SRA and msb == 1
        t[i, s.idx("f")] = int(flip)
        inv = (~bb) & 0xFFFFFFFF
        in_v = inv if flip else bb
        out_v = ((~a) & 0xFFFFFFFF) if flip else a
        if op == O.ROR:
            q_v = bb >> sh
            r_v = bb & ((1 << sh) - 1)
        else:
            q_v = out_v
            r_v = in_v - ((q_v << sh) & 0xFFFFFFFF)
        t[i, s.idx("q_lo")], t[i, s.idx("q_hi")] = q_v & 0xFFFF, q_v >> 16
        t[i, s.idx("r_lo")], t[i, s.idx("r_hi")] = r_v & 0xFFFF, r_v >> 16
        for j in range(4):
            t[i, s.idx(f"qb{j}")] = (q_v >> (8 * j)) & 0xFF
            t[i, s.idx(f"rb{j}")] = (r_v >> (8 * j)) & 0xFF
        sink.u8pair(np.array([q_v & 0xFF], dtype=np.uint32), np.array([(q_v >> 8) & 0xFF], dtype=np.uint32))
        sink.u8pair(np.array([(q_v >> 16) & 0xFF], dtype=np.uint32), np.array([(q_v >> 24) & 0xFF], dtype=np.uint32))
        sink.u8pair(np.array([r_v & 0xFF], dtype=np.uint32), np.array([(r_v >> 8) & 0xFF], dtype=np.uint32))
        sink.u8pair(np.array([(r_v >> 16) & 0xFF], dtype=np.uint32), np.array([(r_v >> 24) & 0xFF], dtype=np.uint32))
        self.gq.fill(t, s, i, q_v, sh, sink)
        v1 = (q_v << sh) & 0xFFFFFFFF
        carry = 1 if ((v1 & 0xFFFF) + (r_v & 0xFFFF)) >= 65536 else 0
        t[i, s.idx("carry")] = carry
        if sh != 0:
            tv = 32 - sh
            for j in range(5):
                t[i, s.idx(f"t{j}")] = (tv >> j) & 1
            self.gr.fill(t, s, i, r_v, tv, sink)
