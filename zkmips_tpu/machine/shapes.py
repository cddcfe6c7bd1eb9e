"""Fixed proof shapes: pad chip heights to a menu of known shapes.

Analog of the reference's CoreShapeConfig (crates/core/machine/src/shape/
mod.rs:40-718 + maximal_shapes.json): every shard's chip heights are rounded
up to a preset "shape" so that proofs have one of finitely many layouts.
On TPU this is doubly valuable: static shapes mean every stage kernel is
compiled once per shape and reused across programs and shards.

A shape maps chip name -> log2 height; chips absent from the shape use plain
next-power-of-two padding.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class Shape:
    log_heights: tuple  # sorted tuple of (chip_name, log_h)

    def log_h(self, name: str):
        for n, lh in self.log_heights:
            if n == name:
                return lh
        return None

    def fits(self, heights: dict) -> bool:
        for name, h in heights.items():
            lh = self.log_h(name)
            if lh is not None and h > (1 << lh):
                return False
        return True


def _shape(**kw) -> Shape:
    return Shape(tuple(sorted(kw.items())))


# A small default menu: tiny / small / medium / large shards.  The Byte chip
# is always 2^16; preprocessed chips follow their programs.
DEFAULT_MENU = [
    _shape(Cpu=10, AddSub=10, Bitwise=8, Lt=8, ShiftLeft=8, ShiftRight=8, Mul=7,
           DivRem=6, CloClz=6, Branch=8, Jump=7, MemoryInstrs=9, MiscInstrs=7,
           MovCond=6, SyscallInstrs=6, ShaExtend=7, ShaCompress=8, MemoryLocal=9,
           MemoryGlobalInit=9, MemoryGlobalFinalize=9, Global=11),
    _shape(Cpu=13, AddSub=13, Bitwise=11, Lt=11, ShiftLeft=11, ShiftRight=11, Mul=10,
           DivRem=9, CloClz=9, Branch=11, Jump=10, MemoryInstrs=12, MiscInstrs=10,
           MovCond=9, SyscallInstrs=9, ShaExtend=10, ShaCompress=11, MemoryLocal=12,
           MemoryGlobalInit=12, MemoryGlobalFinalize=12, Global=14),
    _shape(Cpu=16, AddSub=16, Bitwise=14, Lt=14, ShiftLeft=14, ShiftRight=14, Mul=13,
           DivRem=12, CloClz=12, Branch=14, Jump=13, MemoryInstrs=15, MiscInstrs=13,
           MovCond=12, SyscallInstrs=12, ShaExtend=13, ShaCompress=14, MemoryLocal=15,
           MemoryGlobalInit=15, MemoryGlobalFinalize=15, Global=17),
    _shape(Cpu=19, AddSub=19, Bitwise=17, Lt=17, ShiftLeft=17, ShiftRight=17, Mul=16,
           DivRem=15, CloClz=15, Branch=17, Jump=16, MemoryInstrs=18, MiscInstrs=16,
           MovCond=15, SyscallInstrs=15, ShaExtend=16, ShaCompress=17, MemoryLocal=18,
           MemoryGlobalInit=18, MemoryGlobalFinalize=18, Global=20),
]


class ShapeConfig:
    def __init__(self, menu: list[Shape] | None = None):
        self.menu = menu if menu is not None else DEFAULT_MENU

    def fix_shape(self, heights: dict) -> Shape | None:
        """Smallest menu shape that fits the observed heights (fix_shape,
        shape/mod.rs:71); None -> fall back to power-of-two padding."""
        for shape in self.menu:
            if shape.fits(heights):
                return shape
        return None
