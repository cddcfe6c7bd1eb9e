"""Machine-level tests for the EC / fptower / uint256 precompile chips.

Mirrors the reference's per-chip prove/verify roundtrips
(crates/core/machine/src/syscall/precompiles/*/mod.rs tests): a guest body
invokes the precompile syscalls, then the full chip set runs through the
constraint + lookup-balance oracles and a prove/verify roundtrip.
"""

import pytest

from zkmips_tpu.executor import Register, asm
from zkmips_tpu.executor import curves as cv
from zkmips_tpu.executor.opcodes import SyscallCode as C
from zkmips_tpu.machine.machine import mips_machine
from zkmips_tpu.stark.machine import StarkConfig

from test_mips_e2e import _debug_machine, _run

R = Register

K1_GX = 0x79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798
K1_GY = 0x483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8
R1_GX = 0x6B17D1F2E12C4247F8BCE6E563A440F277037D812DEB33A0F4A13945D898C296
R1_GY = 0x4FE342E2FE1A7F9B8EE7EB4A7C0F9E162BCE33576B315ECECBB6406837BF51F5
BLS_GX = 0x17F1D3A73197D7942695638C4FA9AC0FC3688C4F9774B905A14E3A3F171BAC586C55E83FF97A1AEFFB3AF00ADB22C6BB
BLS_GY = 0x08B3F481E3AAA0F1A09E30ED741D8AE4FCF5E095D5D00AF600DB18CB2C04B3EDD03CC744A2888AE40CAA232946C5E7E1
ED_BX = 15112221349535400772501151409588531511454012693041857206046113283949847762202
ED_BY = 46316835694926478169428394003475163141307993866256225615783033603165251855960


def _store(ptr, words):
    body = []
    for i, w in enumerate(words):
        body += [*asm.li(R.T0, int(w)), *asm.li(R.T1, ptr + 4 * i), asm.sw(R.T0, R.T1)]
    return body


def _sys(code, a0, a1):
    return [*asm.li(R.V0, int(code)), *asm.li(R.A0, a0), *asm.li(R.A1, a1), asm.syscall()]


def _point_words(x, y, nw):
    return cv.int_to_words(x, nw) + cv.int_to_words(y, nw)


def _wei_body(curve, add_code, dbl_code, dec_code, gx, gy):
    nw = curve.nwords
    body = _store(0x2000, _point_words(gx, gy, nw))
    body += _store(0x2100, _point_words(gx, gy, nw))
    body += _sys(dbl_code, 0x2100, 0)
    body += _sys(add_code, 0x2000, 0x2100)
    if dec_code is not None:
        body += _store(0x2300 + 4 * nw, cv.int_to_words(gx, nw))
        body += _sys(dec_code, 0x2300, gy & 1)
    return body


@pytest.mark.parametrize("curve,codes,gx,gy", [
    (cv.SECP256K1, (C.SECP256K1_ADD, C.SECP256K1_DOUBLE, C.SECP256K1_DECOMPRESS), K1_GX, K1_GY),
    (cv.SECP256R1, (C.SECP256R1_ADD, C.SECP256R1_DOUBLE, C.SECP256R1_DECOMPRESS), R1_GX, R1_GY),
    (cv.BN254, (C.BN254_ADD, C.BN254_DOUBLE, None), 1, 2),
    (cv.BLS12381, (C.BLS12381_ADD, C.BLS12381_DOUBLE, C.BLS12381_DECOMPRESS), BLS_GX, BLS_GY),
], ids=["secp256k1", "secp256r1", "bn254", "bls12381"])
def test_weierstrass_chip_oracles(curve, codes, gx, gy):
    p, records, ex = _run(_wei_body(curve, *codes, gx, gy))
    m = mips_machine(StarkConfig.test())
    _debug_machine(m, p, records)


def _ed_fp_u256_body():
    body = _store(0x2000, _point_words(ED_BX, ED_BY, 8))
    body += _store(0x2100, _point_words(ED_BX, ED_BY, 8))
    body += _sys(C.ED_ADD, 0x2000, 0x2100)
    body += _store(0x2200 + 32, cv.int_to_words(ED_BY, 8))
    body += _sys(C.ED_DECOMPRESS, 0x2200, ED_BX & 1)
    # bn254 fp add/sub/mul (chained in place at 0x3000)
    mod, nw = cv.FP_MOD["bn254"]
    a, b = 0x1234567890ABCDEF << 180, 0xFEDCBA0987654321 << 177
    body += _store(0x3000, cv.int_to_words(a, nw))
    body += _store(0x3100, cv.int_to_words(b, nw))
    body += _sys(C.BN254_FP_ADD, 0x3000, 0x3100)
    body += _sys(C.BN254_FP_SUB, 0x3000, 0x3100)
    body += _sys(C.BN254_FP_MUL, 0x3000, 0x3100)
    # bn254 fp2 add/sub/mul
    body += _store(0x3200, cv.int_to_words(a % mod, nw) + cv.int_to_words(b % mod, nw))
    body += _store(0x3300, cv.int_to_words(a * 3 % mod, nw) + cv.int_to_words(b * 7 % mod, nw))
    body += _sys(C.BN254_FP2_ADD, 0x3200, 0x3300)
    body += _sys(C.BN254_FP2_SUB, 0x3200, 0x3300)
    body += _sys(C.BN254_FP2_MUL, 0x3200, 0x3300)
    # uint256 mul: with modulus and with m=0 (2^256)
    x, y, m256 = (1 << 255) - 19, 0xDEADBEEF << 200, (1 << 251) - 9
    body += _store(0x4000, cv.int_to_words(x, 8))
    body += _store(0x4100, cv.int_to_words(y, 8) + cv.int_to_words(m256, 8))
    body += _sys(C.UINT256_MUL, 0x4000, 0x4100)
    body += _store(0x4200, cv.int_to_words(x, 8))
    body += _store(0x4300, cv.int_to_words(y, 8) + [0] * 8)
    body += _sys(C.UINT256_MUL, 0x4200, 0x4300)
    return body


def test_ed_fptower_uint256_chip_oracles():
    p, records, ex = _run(_ed_fp_u256_body())
    m = mips_machine(StarkConfig.test())
    _debug_machine(m, p, records)


def test_bls_fptower_chip_oracles():
    mod, nw = cv.FP_MOD["bls12381"]
    a = BLS_GX * 7 % mod
    b = BLS_GY * 11 % mod
    body = _store(0x3000, cv.int_to_words(a, nw))
    body += _store(0x3100, cv.int_to_words(b, nw))
    body += _sys(C.BLS12381_FP_ADD, 0x3000, 0x3100)
    body += _sys(C.BLS12381_FP_SUB, 0x3000, 0x3100)
    body += _sys(C.BLS12381_FP_MUL, 0x3000, 0x3100)
    body += _store(0x3200, cv.int_to_words(a, nw) + cv.int_to_words(b, nw))
    body += _store(0x3400, cv.int_to_words(b, nw) + cv.int_to_words(a, nw))
    body += _sys(C.BLS12381_FP2_ADD, 0x3200, 0x3400)
    body += _sys(C.BLS12381_FP2_SUB, 0x3200, 0x3400)
    body += _sys(C.BLS12381_FP2_MUL, 0x3200, 0x3400)
    p, records, ex = _run(body)
    m = mips_machine(StarkConfig.test())
    _debug_machine(m, p, records)


def test_u256x2048_chip_oracles():
    a = (1 << 256) - 0x12345
    bv = ((1 << 2048) - 0xABCDE) // 3
    body = _store(0x2000, cv.int_to_words(a, 8))
    body += _store(0x3000, cv.int_to_words(bv, 64))
    body += [*asm.li(R.A2, 0x5000), *asm.li(R.A3, 0x6000)]
    body += [*asm.li(R.V0, int(C.U256XU2048_MUL)), *asm.li(R.A0, 0x2000),
             *asm.li(R.A1, 0x3000), asm.syscall()]
    p, records, ex = _run(body)
    lo = cv.words_to_int([ex.word(0x5000 + 4 * i) for i in range(64)])
    hi = cv.words_to_int([ex.word(0x6000 + 4 * i) for i in range(8)])
    assert (hi << 2048) | lo == a * bv
    m = mips_machine(StarkConfig.test())
    _debug_machine(m, p, records)


def test_ec_precompiles_prove_verify():
    body = _wei_body(cv.SECP256K1, C.SECP256K1_ADD, C.SECP256K1_DOUBLE,
                     C.SECP256K1_DECOMPRESS, K1_GX, K1_GY)
    body += _store(0x5000, _point_words(ED_BX, ED_BY, 8))
    body += _store(0x5100, _point_words(ED_BX, ED_BY, 8))
    body += _sys(C.ED_ADD, 0x5000, 0x5100)
    p, records, ex = _run(body)
    m = mips_machine(StarkConfig.test())
    pk = m.setup(p)
    proofs = m.prove(pk, records)
    assert m.verify(pk.vk, proofs, p)
