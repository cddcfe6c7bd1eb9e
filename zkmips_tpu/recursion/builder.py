"""DSL builder: variable programs compiled to flat-memory instructions.

Single-pass analog of crates/recursion/compiler (Builder + AsmCompiler):
``Felt``/``Ext`` handles wrap static addresses; arithmetic emits ALU
instructions; read multiplicities are counted after the fact and patched
into the emitted instructions (the reference's multiplicity counting,
circuit/compiler.rs:28-210).
"""

from __future__ import annotations

from dataclasses import dataclass, replace

from ..ops import field as ff
from . import program as pr


@dataclass(frozen=True)
class Felt:
    addr: int


@dataclass(frozen=True)
class Ext:
    addr: int


class Builder:
    def __init__(self):
        self.instructions: list = []
        self._next_addr = 0
        self._reads: dict[int, int] = {}

    # ------------------------------------------------------------ allocation

    def _alloc(self, cells: int) -> int:
        a = self._next_addr
        self._next_addr += cells
        return a

    def _read(self, addr: int):
        self._reads[addr] = self._reads.get(addr, 0) + 1

    # ------------------------------------------------------------- constants

    def felt(self, value: int) -> Felt:
        a = self._alloc(4)
        self.instructions.append(pr.MemConst(a, (value % ff.P, 0, 0, 0), 0))
        return Felt(a)

    def ext(self, c0: int, c1: int = 0, c2: int = 0, c3: int = 0) -> Ext:
        a = self._alloc(4)
        self.instructions.append(pr.MemConst(a, (c0 % ff.P, c1 % ff.P, c2 % ff.P, c3 % ff.P), 0))
        return Ext(a)

    def hint_felt(self) -> Felt:
        a = self._alloc(4)
        self.instructions.append(pr.Hint(a, 0))
        return Felt(a)

    def hint_ext(self) -> Ext:
        a = self._alloc(4)
        self.instructions.append(pr.Hint(a, 0))
        return Ext(a)

    # ------------------------------------------------------------ arithmetic

    def _alu(self, cls, op, x, y):
        out = self._alloc(4)
        self._read(x.addr)
        self._read(y.addr)
        self.instructions.append(cls(op, out, x.addr, y.addr, 0))
        return type(x)(out)

    def add(self, x, y):
        return self._alu(self._cls(x), pr.BaseOp.ADD, x, y)

    def sub(self, x, y):
        return self._alu(self._cls(x), pr.BaseOp.SUB, x, y)

    def mul(self, x, y):
        return self._alu(self._cls(x), pr.BaseOp.MUL, x, y)

    def div(self, x, y):
        return self._alu(self._cls(x), pr.BaseOp.DIV, x, y)

    @staticmethod
    def _cls(x):
        return pr.BaseAlu if isinstance(x, Felt) else pr.ExtAlu

    # ------------------------------------------------------------ primitives

    def poseidon2(self, inputs: list[Felt]) -> list[Felt]:
        assert len(inputs) == 16
        outs = [self._alloc(4) for _ in range(16)]
        for x in inputs:
            self._read(x.addr)
        self.instructions.append(
            pr.Poseidon2(tuple(outs), tuple(x.addr for x in inputs), (0,) * 16)
        )
        return [Felt(a) for a in outs]

    def select(self, bit: Felt, x: Felt, y: Felt) -> tuple[Felt, Felt]:
        """(bit ? y : x, bit ? x : y)."""
        o1, o2 = self._alloc(4), self._alloc(4)
        for v in (bit, x, y):
            self._read(v.addr)
        self.instructions.append(pr.Select(bit.addr, o1, o2, x.addr, y.addr, 0, 0))
        return Felt(o1), Felt(o2)

    def exp_reverse_bits(self, base: Felt, bits: list[Felt]) -> Felt:
        out = self._alloc(4)
        self._read(base.addr)
        for b in bits:
            self._read(b.addr)
        self.instructions.append(
            pr.ExpReverseBitsLen(out, base.addr, tuple(b.addr for b in bits), 0)
        )
        return Felt(out)

    def commit_public_values(self, felts: list[Felt]):
        assert len(felts) == 8
        for x in felts:
            self._read(x.addr)
        self.instructions.append(pr.CommitPublicValues(tuple(x.addr for x in felts)))

    # -------------------------------------------------------------- compile

    def hint_bits(self, value: Felt, num_bits: int) -> list:
        """Bit-decompose a felt (LSB first).  The decomposition itself is
        UNCONSTRAINED (a hint): the caller must bind it with booleanity +
        recomposition constraints against ``value``."""
        addrs = tuple(self._alloc(4) for _ in range(num_bits))
        self.instructions.append(pr.HintBits(addrs, value.addr, (0,) * num_bits))
        return [Felt(a) for a in addrs]

    def ext2felts(self, value: Ext) -> list:
        """Split an ext into 4 felts; unconstrained hint like hint_bits."""
        addrs = tuple(self._alloc(4) for _ in range(4))
        self.instructions.append(pr.HintExt2Felts(addrs, value.addr, (0, 0, 0, 0)))
        return [Felt(a) for a in addrs]

    def print_(self, v, label: str = ""):
        self.instructions.append(pr.Print(v.addr, label))

    def batch_fri(self, p_at_x: list, p_at_z: list, alpha_pow: list) -> Ext:
        """acc = sum alpha_pow[m] * (p_at_z[m] - p_at_x[m]); p_at_x are felts."""
        n = len(p_at_z)
        assert len(p_at_x) == n and len(alpha_pow) == n
        for m in range(n):
            self._read(p_at_x[m].addr)
            self._read(p_at_z[m].addr)
            self._read(alpha_pow[m].addr)
        acc = self._alloc(4)
        self.instructions.append(pr.BatchFRI(
            acc, tuple(v.addr for v in p_at_x), tuple(v.addr for v in p_at_z),
            tuple(v.addr for v in alpha_pow), 0,
        ))
        return Ext(acc)

    def fri_fold(self, x: Felt, z: Ext, alpha: Ext, mat_opening: list,
                 ps_at_z: list, alpha_pow: Ext, ro: Ext):
        """Chained FRI fold over all matrices; returns the final
        (alpha_pow, ro) handles (reference builder ExtFromBaseSlice + FriFold
        emission)."""
        n = len(ps_at_z)
        assert len(mat_opening) == n
        self._read(x.addr)
        self._read(z.addr)
        self._read(alpha.addr)
        api = [alpha_pow.addr]
        roi = [ro.addr]
        apo, roo = [], []
        for m in range(n):
            self._read(mat_opening[m].addr)
            self._read(ps_at_z[m].addr)
            self._read(api[-1])
            self._read(roi[-1])
            ao, ro_ = self._alloc(4), self._alloc(4)
            apo.append(ao)
            roo.append(ro_)
            if m + 1 < n:
                api.append(ao)
                roi.append(ro_)
        # x/z/alpha are read once per matrix row
        for _ in range(n - 1):
            self._read(x.addr)
            self._read(z.addr)
            self._read(alpha.addr)
        self.instructions.append(pr.FriFold(
            x.addr, z.addr, alpha.addr,
            tuple(v.addr for v in mat_opening), tuple(v.addr for v in ps_at_z),
            tuple(api), tuple(roi), tuple(apo), tuple(roo),
            (0,) * n, (0,) * n,
        ))
        return Ext(apo[-1]), Ext(roo[-1])

    def compile(self) -> pr.RecursionProgram:
        """Patch read multiplicities into the write instructions."""
        out = []
        for ins in self.instructions:
            if isinstance(ins, (pr.MemConst, pr.Hint)):
                out.append(replace(ins, mult=self._reads.get(ins.addr, 0)))
            elif isinstance(ins, (pr.BaseAlu, pr.ExtAlu)):
                out.append(replace(ins, mult=self._reads.get(ins.out, 0)))
            elif isinstance(ins, pr.Poseidon2):
                out.append(replace(ins, mults=tuple(self._reads.get(a, 0) for a in ins.out)))
            elif isinstance(ins, pr.Select):
                out.append(
                    replace(ins, mult1=self._reads.get(ins.out1, 0), mult2=self._reads.get(ins.out2, 0))
                )
            elif isinstance(ins, pr.ExpReverseBitsLen):
                out.append(replace(ins, mult=self._reads.get(ins.out, 0)))
            elif isinstance(ins, (pr.HintBits, pr.HintExt2Felts)):
                out.append(replace(
                    ins, mults=tuple(self._reads.get(a, 0) for a in ins.output_addrs)
                ))
            elif isinstance(ins, pr.BatchFRI):
                out.append(replace(ins, acc_mult=self._reads.get(ins.acc, 0)))
            elif isinstance(ins, pr.FriFold):
                out.append(replace(
                    ins,
                    alpha_pow_mults=tuple(self._reads.get(a, 0) for a in ins.alpha_pow_output),
                    ro_mults=tuple(self._reads.get(a, 0) for a in ins.ro_output),
                ))
            else:
                out.append(ins)
        return pr.RecursionProgram(out, self._next_addr)
