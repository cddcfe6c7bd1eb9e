"""Executor-level tests for the EC / bigint / Linux precompile syscalls.

Curve results are checked against the defining equations (on-curve +
collinearity), not by re-running the implementation's formulas; bigint ops
against Python int arithmetic; ed25519 against RFC 8032 base-point constants.
"""

import pytest

from zkmips_tpu.executor import Executor, Register, asm
from zkmips_tpu.executor import curves as cv
from zkmips_tpu.executor.opcodes import SyscallCode as C
from zkmips_tpu.executor.syscalls import dispatch

R = Register

# secp256k1 generator (SEC2 standard constants)
K1_GX = 0x79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798
K1_GY = 0x483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8
# RFC 8032 ed25519 base point
ED_BX = 15112221349535400772501151409588531511454012693041857206046113283949847762202
ED_BY = 46316835694926478169428394003475163141307993866256225615783033603165251855960


def _ex():
    p = asm.prog([asm.nop()] + asm.halt_sequence())
    ex = Executor(p)
    ex.shard = 1
    ex.clk = 100
    return ex


def _write_words(ex, ptr, words):
    for i, w in enumerate(words):
        ex._mw(ptr + 4 * i, int(w) & 0xFFFFFFFF, 1)


def _read_words(ex, ptr, n):
    return [ex.word(ptr + 4 * i) for i in range(n)]


def _write_point(ex, ptr, x, y, nw):
    _write_words(ex, ptr, cv.int_to_words(x, nw) + cv.int_to_words(y, nw))


def _read_point(ex, ptr, nw):
    w = _read_words(ex, ptr, 2 * nw)
    return cv.words_to_int(w[:nw]), cv.words_to_int(w[nw:])


def _on_curve(c, pt):
    x, y = pt
    return (y * y - (x * x * x + c.a * x + c.b)) % c.p == 0


@pytest.mark.parametrize("curve,add_code,dbl_code,x0,y0", [
    (cv.SECP256K1, C.SECP256K1_ADD, C.SECP256K1_DOUBLE, K1_GX, K1_GY),
    (cv.SECP256R1, C.SECP256R1_ADD, C.SECP256R1_DOUBLE,
     0x6B17D1F2E12C4247F8BCE6E563A440F277037D812DEB33A0F4A13945D898C296,
     0x4FE342E2FE1A7F9B8EE7EB4A7C0F9E162BCE33576B315ECECBB6406837BF51F5),
    (cv.BN254, C.BN254_ADD, C.BN254_DOUBLE, 1, 2),
    (cv.BLS12381, C.BLS12381_ADD, C.BLS12381_DOUBLE,
     0x17F1D3A73197D7942695638C4FA9AC0FC3688C4F9774B905A14E3A3F171BAC586C55E83FF97A1AEFFB3AF00ADB22C6BB,
     0x08B3F481E3AAA0F1A09E30ED741D8AE4FCF5E095D5D00AF600DB18CB2C04B3EDD03CC744A2888AE40CAA232946C5E7E1),
])
def test_weierstrass_add_double(curve, add_code, dbl_code, x0, y0):
    nw = curve.nwords
    assert _on_curve(curve, (x0, y0))
    # double G in place at 0x2000
    ex = _ex()
    _write_point(ex, 0x2000, x0, y0, nw)
    dispatch(ex, dbl_code, 0x2000, 0)
    g2 = _read_point(ex, 0x2000, nw)
    assert _on_curve(curve, g2)
    # tangent-line relation: (-y2 - y0) == lam * (x2 - x0) with 2*y0*lam = 3*x0^2 + a
    lx, ly = g2
    lhs = (-ly - y0) * 2 * y0 % curve.p
    rhs = (3 * x0 * x0 + curve.a) * (lx - x0) % curve.p
    assert lhs == rhs
    # add G + 2G at distinct pointers; check collinearity of G, 2G, -(G+2G)
    ex = _ex()
    _write_point(ex, 0x2000, x0, y0, nw)
    _write_point(ex, 0x3000, *g2, nw)
    dispatch(ex, add_code, 0x2000, 0x3000)
    g3 = _read_point(ex, 0x2000, nw)
    assert _on_curve(curve, g3)
    assert ((-g3[1] - y0) * (g2[0] - x0) - (g2[1] - y0) * (g3[0] - x0)) % curve.p == 0
    # q operand untouched
    assert _read_point(ex, 0x3000, nw) == g2


@pytest.mark.parametrize("curve,code,x0,y0", [
    (cv.SECP256K1, C.SECP256K1_DECOMPRESS, K1_GX, K1_GY),
    (cv.SECP256R1, C.SECP256R1_DECOMPRESS,
     0x6B17D1F2E12C4247F8BCE6E563A440F277037D812DEB33A0F4A13945D898C296,
     0x4FE342E2FE1A7F9B8EE7EB4A7C0F9E162BCE33576B315ECECBB6406837BF51F5),
    (cv.BLS12381, C.BLS12381_DECOMPRESS,
     0x17F1D3A73197D7942695638C4FA9AC0FC3688C4F9774B905A14E3A3F171BAC586C55E83FF97A1AEFFB3AF00ADB22C6BB,
     0x08B3F481E3AAA0F1A09E30ED741D8AE4FCF5E095D5D00AF600DB18CB2C04B3EDD03CC744A2888AE40CAA232946C5E7E1),
])
def test_weierstrass_decompress(curve, code, x0, y0):
    nw = curve.nwords
    ex = _ex()
    # x in the upper half of the slice; y is written to the lower half
    _write_words(ex, 0x2000 + 4 * nw, cv.int_to_words(x0, nw))
    dispatch(ex, code, 0x2000, y0 & 1)
    y = cv.words_to_int(_read_words(ex, 0x2000, nw))
    assert y == y0


def test_ed25519_add_and_decompress():
    ex = _ex()
    _write_point(ex, 0x2000, ED_BX, ED_BY, 8)
    _write_point(ex, 0x3000, ED_BX, ED_BY, 8)
    dispatch(ex, C.ED_ADD, 0x2000, 0x3000)
    x2, y2 = _read_point(ex, 0x2000, 8)
    p, d = cv.ED_P, cv.ED_D
    assert (-x2 * x2 + y2 * y2 - 1 - d * x2 * x2 % p * y2 * y2) % p == 0
    # decompress 2B from (y, sign(x)) and compare against the ED_ADD result
    ex = _ex()
    _write_words(ex, 0x2000 + 32, cv.int_to_words(y2, 8))
    dispatch(ex, C.ED_DECOMPRESS, 0x2000, x2 & 1)
    assert cv.words_to_int(_read_words(ex, 0x2000, 8)) == x2


def test_fp_and_fp2_ops():
    mod, nw = cv.FP_MOD["bn254"]
    a, b = 0x1234567890ABCDEF << 180, 0xFEDCBA0987654321 << 177
    for code, expect in [
        (C.BN254_FP_ADD, (a + b) % mod),
        (C.BN254_FP_SUB, (a - b) % mod),
        (C.BN254_FP_MUL, a * b % mod),
    ]:
        ex = _ex()
        _write_words(ex, 0x2000, cv.int_to_words(a, nw))
        _write_words(ex, 0x3000, cv.int_to_words(b, nw))
        dispatch(ex, code, 0x2000, 0x3000)
        assert cv.words_to_int(_read_words(ex, 0x2000, nw)) == expect
    # fp2: (a0 + a1 u)(b0 + b1 u), u^2 = -1
    a0, a1, b0, b1 = a % mod, b % mod, (a * 3) % mod, (b * 7) % mod
    ex = _ex()
    _write_words(ex, 0x2000, cv.int_to_words(a0, nw) + cv.int_to_words(a1, nw))
    _write_words(ex, 0x3000, cv.int_to_words(b0, nw) + cv.int_to_words(b1, nw))
    dispatch(ex, C.BN254_FP2_MUL, 0x2000, 0x3000)
    out = _read_words(ex, 0x2000, 2 * nw)
    assert cv.words_to_int(out[:nw]) == (a0 * b0 - a1 * b1) % mod
    assert cv.words_to_int(out[nw:]) == (a0 * b1 + a1 * b0) % mod


def test_uint256_mul_with_and_without_modulus():
    x, y, m = (1 << 255) - 19, 0xDEADBEEF << 200, (1 << 251) - 9
    ex = _ex()
    _write_words(ex, 0x2000, cv.int_to_words(x, 8))
    _write_words(ex, 0x3000, cv.int_to_words(y, 8) + cv.int_to_words(m, 8))
    dispatch(ex, C.UINT256_MUL, 0x2000, 0x3000)
    assert cv.words_to_int(_read_words(ex, 0x2000, 8)) == x * y % m
    ex = _ex()
    _write_words(ex, 0x2000, cv.int_to_words(x, 8))
    _write_words(ex, 0x3000, cv.int_to_words(y, 8) + [0] * 8)  # m=0 -> 2^256
    dispatch(ex, C.UINT256_MUL, 0x2000, 0x3000)
    assert cv.words_to_int(_read_words(ex, 0x2000, 8)) == x * y % (1 << 256)


def test_u256x2048_mul():
    a = (1 << 256) - 0x12345
    b = ((1 << 2048) - 0xABCDE) // 3
    ex = _ex()
    _write_words(ex, 0x2000, cv.int_to_words(a, 8))
    _write_words(ex, 0x3000, cv.int_to_words(b, 64))
    ex._mw(int(R.A2), 0x5000, 1)  # lo_ptr
    ex._mw(int(R.A3), 0x6000, 1)  # hi_ptr
    dispatch(ex, C.U256XU2048_MUL, 0x2000, 0x3000)
    lo = cv.words_to_int(_read_words(ex, 0x5000, 64))
    hi = cv.words_to_int(_read_words(ex, 0x6000, 8))
    assert (hi << 2048) | lo == a * b


def test_linux_syscalls():
    body = [
        *asm.li(R.V0, 4045), *asm.li(R.A0, 0), asm.syscall(),        # brk -> heap base
        asm.addi(R.S0, R.V0, 0),
        *asm.li(R.V0, 4090), *asm.li(R.A0, 0), *asm.li(R.A1, 0x1234),
        asm.syscall(),                                               # mmap2 anonymous
        asm.addi(R.S1, R.V0, 0),
        *asm.li(R.V0, 4090), *asm.li(R.A0, 0), *asm.li(R.A1, 0x1000),
        asm.syscall(),                                               # mmap2 again
        asm.addi(R.S2, R.V0, 0),
        *asm.li(R.V0, 4120), asm.syscall(),                          # clone -> 1
        asm.addi(R.S3, R.V0, 0),
        *asm.li(R.V0, 4055), *asm.li(R.A0, 1), *asm.li(R.A1, 3),
        asm.syscall(),                                               # fcntl(stdout, F_GETFL)
        asm.addi(R.S4, R.V0, 0),
        *asm.li(R.V0, 4222), asm.syscall(),                          # gettid -> nop 0
        asm.addi(R.S5, R.V0, 0),
    ]
    p = asm.prog(body + asm.halt_sequence())
    ex = Executor(p)
    ex.run()
    heap0 = ex.register(R.S1)
    # mmap page-aligns 0x1234 -> 0x2000, so the second mmap starts 0x2000 later
    assert ex.register(R.S2) == (heap0 + 0x2000) & 0xFFFFFFFF
    assert ex.register(R.S3) == 1
    assert ex.register(R.S4) == 1  # O_WRONLY for stdout
    assert ex.register(R.S5) == 0
    assert ex.register(R.A3) == 0


def test_sys_exit_group_halts():
    body = [*asm.li(R.V0, 4246), *asm.li(R.A0, 7), asm.syscall(), asm.nop()]
    p = asm.prog(body + asm.halt_sequence())
    ex = Executor(p)
    records = ex.run()
    assert ex.exit_code == 7


def test_ecrecover_hook_roundtrip():
    """Guest writes a 65-byte ecrecover request to fd 5 and hint-reads the
    response (write.rs hook routing + hook.rs:118)."""
    r = K1_GX
    p = cv.SECP256K1.p
    alpha = (r * r * r + 7) % p
    req = bytes([1 | 0x80]) + r.to_bytes(32, "big") + alpha.to_bytes(32, "big")
    req_padded = req + bytes(3)  # word-align the store loop
    body = []
    for i in range(0, len(req_padded), 4):
        w = int.from_bytes(req_padded[i:i + 4], "little")
        body += [*asm.li(R.T0, w), *asm.li(R.T1, 0x2000 + i), asm.sw(R.T0, R.T1)]
    body += [*asm.li(R.V0, 2), *asm.li(R.A0, 5), *asm.li(R.A1, 0x2000),
             *asm.li(R.A2, 65), asm.syscall()]
    # read back: hint 1 (status), hint 2 (y), hint 3 (r_inv)
    body += [*asm.li(R.V0, 0xF0), asm.syscall(), asm.addi(R.S0, R.V0, 0)]
    body += [*asm.li(R.V0, 0xF1), *asm.li(R.A0, 0x3000), *asm.li(R.A1, 1), asm.syscall()]
    body += [*asm.li(R.V0, 0xF1), *asm.li(R.A0, 0x3100), *asm.li(R.A1, 32), asm.syscall()]
    body += [*asm.li(R.V0, 0xF1), *asm.li(R.A0, 0x3200), *asm.li(R.A1, 32), asm.syscall()]
    p_prog = asm.prog(body + asm.halt_sequence())
    ex = Executor(p_prog)
    ex.run()
    assert ex.register(R.S0) == 1  # status hint is 1 byte
    assert ex.word(0x3000) & 0xFF == 1
    y = int.from_bytes(
        b"".join(ex.word(0x3100 + 4 * i).to_bytes(4, "little") for i in range(8)), "big")
    assert y * y % p == alpha and (y & 1) == 1
    n = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141
    r_inv = int.from_bytes(
        b"".join(ex.word(0x3200 + 4 * i).to_bytes(4, "little") for i in range(8)), "big")
    assert r_inv * r % n == 1


def test_fp_sqrt_and_inverse_hooks():
    from zkmips_tpu.executor.hooks import hook_fp_inverse, hook_fp_sqrt
    p = cv.BN254.p
    x = 0x1234567890ABCDEF
    buf = (32).to_bytes(4, "big") + (x * x % p).to_bytes(32, "big") + p.to_bytes(32, "big") \
        + (5).to_bytes(32, "big")
    status, root = hook_fp_sqrt(None, buf)
    assert status == b"\x01"
    rt = int.from_bytes(root, "big")
    assert rt * rt % p == x * x % p
    buf = (32).to_bytes(4, "big") + x.to_bytes(32, "big") + p.to_bytes(32, "big")
    (inv,) = hook_fp_inverse(None, buf)
    assert int.from_bytes(inv, "big") * x % p == 1


def test_bls_hooks():
    from zkmips_tpu.executor.hooks import hook_bls12_381_inverse, hook_bls12_381_sqrt
    p = cv.BLS12381.p
    x = 0xABCDEF0123456789
    status, root = hook_bls12_381_sqrt(None, (x * x % p).to_bytes(48, "big"))
    assert status == b"\x01" and pow(int.from_bytes(root, "big"), 2, p) == x * x % p
    # a non-residue: status 0, root of 2*fe
    nr = 2 * x * x % p  # 2*(square) is a non-residue since 2 is one
    status, root = hook_bls12_381_sqrt(None, nr.to_bytes(48, "big"))
    assert status == b"\x00" and pow(int.from_bytes(root, "big"), 2, p) == 2 * nr % p
    (inv,) = hook_bls12_381_inverse(None, x.to_bytes(48, "big"))
    assert int.from_bytes(inv, "big") * x % p == 1


def test_deferred_proof_syscalls():
    """VERIFY_ZKM_PROOF pops from the proof stream; COMMIT_DEFERRED_PROOFS
    records digest words (reference syscalls/{verify,deferred}.rs)."""
    body = []
    for i in range(8):
        body += [*asm.li(R.T0, 0x1111 * (i + 1)), *asm.li(R.T1, 0x2000 + 4 * i),
                 asm.sw(R.T0, R.T1)]
        body += [*asm.li(R.T0, 0x2222 * (i + 1)), *asm.li(R.T1, 0x2100 + 4 * i),
                 asm.sw(R.T0, R.T1)]
    body += [*asm.li(R.V0, 0x1B), *asm.li(R.A0, 0x2000), *asm.li(R.A1, 0x2100),
             asm.syscall()]
    body += [*asm.li(R.V0, 0x1A), *asm.li(R.A0, 3), *asm.li(R.A1, 0xABCD), asm.syscall()]
    p = asm.prog(body + asm.halt_sequence())
    ex = Executor(p)
    seen = []
    ex.proof_stream.append(("proofobj", "vkobj"))
    ex.subproof_verifier = lambda proof, vk, vkey, pvd: seen.append((proof, vk, vkey, pvd))
    records = ex.run()
    assert seen[0][2] == [0x1111 * (i + 1) for i in range(8)]
    assert seen[0][3] == [0x2222 * (i + 1) for i in range(8)]
    assert ex.deferred_proofs_digest[3] == 0xABCD
    assert records[-1].deferred_proof_digests
    # without a queued proof the syscall must fail
    ex2 = Executor(p)
    with pytest.raises(Exception, match="proof stream"):
        ex2.run()
