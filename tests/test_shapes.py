"""Shape system: lattice quantization, menu fitting, and the kernel-reuse
guarantee (two different programs land on identical padded layouts)."""

import numpy as np

from zkmips_tpu.executor import Executor, Instruction, Opcode, Register, asm
from zkmips_tpu.machine.machine import MipsMachine
from zkmips_tpu.machine.shapes import (
    LATTICE,
    Shape,
    ShapeConfig,
    lattice_log,
    lattice_shape,
    load_menu,
)
from zkmips_tpu.stark.machine import StarkConfig

R, O = Register, Opcode


def test_lattice_log():
    assert lattice_log(1) == 4
    assert lattice_log(16) == 4
    assert lattice_log(17) == 6
    assert lattice_log(1 << 16) == 16
    assert lattice_log((1 << 16) + 1) == 17
    assert lattice_log(1 << 20) == 20
    assert lattice_log((1 << 22) + 1) == 23  # beyond-lattice fallback
    for lg in LATTICE:
        assert lattice_log(1 << lg) == lg


def test_fix_shape_prefers_cheapest():
    menu = [Shape((("A", 12), ("B", 12)))]
    cfg = ShapeConfig(menu=menu)
    # lattice shape (A:8, B:8) is cheaper than the menu's (A:12, B:12)
    s = cfg.fix_shape({"A": 200, "B": 200})
    assert s.log_h("A") == 8 and s.log_h("B") == 8
    # but a menu shape that matches the observed sizes is used as-is
    s = cfg.fix_shape({"A": 4000, "B": 3000})
    assert s.log_h("A") == 12 and s.log_h("B") == 12


def test_fix_shape_requires_full_cover():
    menu = [Shape((("A", 12),))]
    cfg = ShapeConfig(menu=menu)
    # menu shape doesn't pin B -> lattice fallback
    s = cfg.fix_shape({"A": 10, "B": 10})
    assert s.log_h("B") == 4


def test_menu_data_loads():
    menu = load_menu()
    assert menu, "shapes_data.json missing or empty"
    for s in menu:
        assert s.log_h("Byte") == 16


def _prog_a(n):
    body = [
        *asm.li(R.T0, 0), *asm.li(R.T1, 1), *asm.li(R.T2, n),
        asm.alu(O.ADD, R.T3, R.T0, R.T1),
        Instruction(O.ADD, R.T0, R.T1, 0, False, True),
        Instruction(O.ADD, R.T1, R.T3, 0, False, True),
        asm.addi(R.T2, R.T2, -1 & 0xFFFFFFFF),
        asm.branch(O.BGTZ, R.T2, 0, -20),
        asm.nop(),
    ]
    return asm.prog(body + asm.halt_sequence())


def _prog_b(n):
    # different instruction mix + program length than _prog_a
    body = [*asm.li(R.T0, 3), *asm.li(R.T1, 5), *asm.li(R.T2, n), asm.nop()]
    body += [
        asm.alu(O.ADD, R.T3, R.T0, R.T1),
        asm.alu(O.SUB, R.T4, R.T3, R.T1),
        asm.addi(R.T2, R.T2, -1 & 0xFFFFFFFF),
        asm.branch(O.BGTZ, R.T2, 0, -16),
        asm.nop(),
    ]
    return asm.prog(body + asm.halt_sequence())


def test_new_program_reuses_shape():
    """Two different guests at the same scale must pad to the SAME per-chip
    layout (the XLA kernel-cache key) once shapes are on."""
    from zkmips_tpu.machine.shape_gen import observe_heights

    m = MipsMachine(StarkConfig.core())  # sound config -> shapes default ON
    assert m.machine.shape_config is not None
    layouts = []
    for prog in (_prog_a(150), _prog_b(200)):
        ex = Executor(prog)
        records = ex.run()
        heights = observe_heights(m, records)[0]
        widths = {n: 1 for n in heights}
        shape = m.machine.shape_config.fix_shape(heights, widths)
        layouts.append(tuple(sorted((n, shape.log_h(n)) for n in heights)))
    assert layouts[0] == layouts[1]


def test_prove_verify_with_shapes_on():
    """End-to-end prove/verify with the lattice+menu shapes active (test
    config machine, shapes forced on)."""
    m = MipsMachine(StarkConfig.test(), use_shapes=True)
    prog = _prog_b(40)
    ex = Executor(prog)
    records = ex.run()
    pk = m.setup(prog)
    proofs = m.prove(pk, records)
    assert m.verify(pk.vk, proofs, prog)
    # every proven chip height is on the lattice
    prep = dict(pk.vk.prep_heights)
    for proof in proofs:
        for name, ov in zip(proof.chip_names, proof.opened):
            if name in prep:
                continue
            assert ov.log_degree in LATTICE, (name, ov.log_degree)


def test_preprocessed_rows_snap_to_lattice():
    m = MipsMachine(StarkConfig.test(), use_shapes=True)
    prog = _prog_a(10)
    pk = m.setup(prog)
    for name, lh in pk.vk.prep_heights:
        assert lh in LATTICE or lh == 16, (name, lh)
