"""ctypes bridge to the native recursion-VM interpreter
(csrc/recursion_runtime.c — the reference's C++ runtime kernels analog,
crates/recursion/core/src/sys.rs).

The program encodes once into a flat u32 opcode stream (cached on the
RecursionProgram), the C side executes it over write-once block memory
(canonical KoalaBear arithmetic incl. Poseidon2-16), and the chip event
record is reconstructed from the final memory image — every event value is
a memory read, except BatchFRI's running accumulators which the C exports.
Differentially tested against the Python interpreter
(tests/test_recursion.py::test_native_runtime_matches_python).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

from ..ops import field as ff
from ..ops.poseidon2 import RC_16_30, _DIAG_CANON
from . import program as pr
from .runtime import RecursionRecord

_LIB = None
_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "csrc",
    "recursion_runtime.c",
)


def available() -> bool:
    try:
        return _lib() is not None
    except Exception:
        return False


def _lib():
    global _LIB
    if _LIB is None:
        from ..utils.cbuild import build

        lib = ctypes.CDLL(build(_SRC))
        lib.zkm_rec_run.restype = ctypes.c_int
        rc = np.array(RC_16_30, dtype=np.uint32)
        lib.zkm_rec_set_constants(
            np.ascontiguousarray(rc[0:4]).ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            np.ascontiguousarray(rc[4:17, 0]).ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            np.ascontiguousarray(rc[17:21]).ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            np.array(_DIAG_CANON, dtype=np.uint32).ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        )
        _LIB = lib
    return _LIB


def _u32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def encode(program: pr.RecursionProgram):
    """(code u32[], batch_total); cached on the program object."""
    cached = getattr(program, "_native_code", None)
    if cached is not None:
        return cached
    words: list[int] = []
    batch_total = 0
    for ins in program.instructions:
        if isinstance(ins, pr.MemConst):
            words += [0, ins.addr, *ins.value]
        elif isinstance(ins, pr.Hint):
            words += [1, ins.addr]
        elif isinstance(ins, pr.BaseAlu):
            words += [2, int(ins.op), ins.out, ins.in1, ins.in2]
        elif isinstance(ins, pr.ExtAlu):
            words += [3, int(ins.op), ins.out, ins.in1, ins.in2]
        elif isinstance(ins, pr.Poseidon2):
            words += [4, *ins.inp, *ins.out]
        elif isinstance(ins, pr.Select):
            words += [5, ins.bit, ins.in1, ins.in2, ins.out1, ins.out2]
        elif isinstance(ins, pr.ExpReverseBitsLen):
            words += [6, ins.out, ins.base, len(ins.bit_addrs), *ins.bit_addrs]
        elif isinstance(ins, pr.HintBits):
            words += [7, ins.value_addr, len(ins.output_addrs), *ins.output_addrs]
        elif isinstance(ins, pr.HintExt2Felts):
            words += [8, ins.value_addr, *ins.output_addrs]
        elif isinstance(ins, pr.FriFold):
            n = len(ins.ps_at_z)
            words += [9, ins.x, ins.z, ins.alpha, n]
            for m in range(n):
                words += [
                    ins.mat_opening[m], ins.ps_at_z[m], ins.alpha_pow_input[m],
                    ins.ro_input[m], ins.alpha_pow_output[m], ins.ro_output[m],
                ]
        elif isinstance(ins, pr.BatchFRI):
            n = len(ins.p_at_z)
            batch_total += n
            words += [10, ins.acc, n]
            for m in range(n):
                words += [ins.p_at_x[m], ins.p_at_z[m], ins.alpha_pow[m]]
        elif isinstance(ins, pr.CommitPublicValues):
            words += [11, len(ins.addrs), *ins.addrs]
        elif isinstance(ins, pr.Print):
            pass  # host-side debug only
        else:
            raise TypeError(ins)
    code = np.asarray(words, dtype=np.uint32)
    program._native_code = (code, batch_total)
    return program._native_code


def run(program: pr.RecursionProgram, witness_stream=()) -> RecursionRecord:
    lib = _lib()
    code, batch_total = encode(program)
    wit = np.zeros((max(len(witness_stream), 1), 4), dtype=np.uint32)
    for i, w in enumerate(witness_stream):
        wit[i] = w
    mem = np.zeros((program.memory_size + 1, 4), dtype=np.uint32)
    bacc = np.zeros((max(batch_total, 1), 4), dtype=np.uint32)
    err = np.zeros(1, dtype=np.uint64)
    rc = lib.zkm_rec_run(
        _u32p(code), ctypes.c_uint64(len(code)), ctypes.c_uint64(mem.shape[0]),
        _u32p(wit), ctypes.c_uint64(len(witness_stream)),
        _u32p(mem), _u32p(bacc), err.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
    )
    if rc != 0:
        kinds = {1: "circuit assert failed", 2: "bad opcode", 3: "witness underrun"}
        raise AssertionError(
            f"native recursion runtime: {kinds.get(rc, rc)} at instruction {int(err[0])}"
        )

    # reconstruct the chip event record from the final memory image
    rec = RecursionRecord(program=program)
    mv = mem

    def blk(addr):
        r = mv[addr]
        return (int(r[0]), int(r[1]), int(r[2]), int(r[3]))

    def base(addr):
        return int(mv[addr][0])

    bacc_i = 0
    for ins in program.instructions:
        if isinstance(ins, pr.MemConst):
            rec.mem_const_events.append((ins.addr, ins.value, ins.mult))
        elif isinstance(ins, pr.Hint):
            v = blk(ins.addr)
            rec.mem_const_events.append((ins.addr, v, ins.mult))
            rec.hint_events.append((ins.addr, v))
        elif isinstance(ins, pr.BaseAlu):
            a, b = blk(ins.in1), blk(ins.in2)
            o = (0, 0, 0, 0) if ins.op == pr.BaseOp.ASSERT_EQ else blk(ins.out)
            rec.base_alu_events.append((ins.op, ins.out, ins.in1, ins.in2, a, b, o, ins.mult))
        elif isinstance(ins, pr.ExtAlu):
            a, b = blk(ins.in1), blk(ins.in2)
            o = (0, 0, 0, 0) if ins.op == pr.BaseOp.ASSERT_EQ else blk(ins.out)
            rec.ext_alu_events.append((ins.op, ins.out, ins.in1, ins.in2, a, b, o, ins.mult))
        elif isinstance(ins, pr.Poseidon2):
            rec.poseidon2_events.append(
                (ins.inp, [base(a) for a in ins.inp], ins.out,
                 [base(a) for a in ins.out], ins.mults)
            )
        elif isinstance(ins, pr.Select):
            bit = base(ins.bit)
            rec.select_events.append(
                (ins, bit, blk(ins.in1), blk(ins.in2), blk(ins.out1), blk(ins.out2))
            )
        elif isinstance(ins, pr.ExpReverseBitsLen):
            rec.exp_bits_events.append(
                (ins, base(ins.base), [base(a) for a in ins.bit_addrs], base(ins.out))
            )
        elif isinstance(ins, pr.HintBits):
            for addr in ins.output_addrs:
                rec.hint_events.append((addr, blk(addr)))
        elif isinstance(ins, pr.HintExt2Felts):
            for addr in ins.output_addrs:
                rec.hint_events.append((addr, blk(addr)))
        elif isinstance(ins, pr.FriFold):
            x, z, alpha = base(ins.x), blk(ins.z), blk(ins.alpha)
            for m in range(len(ins.ps_at_z)):
                rec.fri_fold_events.append(
                    (x, z, alpha, blk(ins.mat_opening[m]), blk(ins.ps_at_z[m]),
                     blk(ins.alpha_pow_input[m]), blk(ins.ro_input[m]),
                     blk(ins.alpha_pow_output[m]), blk(ins.ro_output[m]), ins, m)
                )
        elif isinstance(ins, pr.BatchFRI):
            for m in range(len(ins.p_at_z)):
                acc = tuple(int(x) for x in bacc[bacc_i])
                bacc_i += 1
                rec.batch_fri_events.append(
                    (base(ins.p_at_x[m]), blk(ins.p_at_z[m]), blk(ins.alpha_pow[m]),
                     acc, ins, m)
                )
        elif isinstance(ins, pr.CommitPublicValues):
            rec.public_values = [base(a) for a in ins.addrs]
    return rec
