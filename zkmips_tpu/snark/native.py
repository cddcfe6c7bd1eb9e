"""ctypes bridge to the native BN254 MSM backend (csrc/bn254.c).

Builds the shared object on first use (same pattern as executor/native.py).
The Groth16 layer (groth16.py) routes its MSMs and fixed-base key-generation
batches here when available and falls back to the pure-Python curve ops
(bn254_curve.py), which stay the semantic reference.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

from .bn254_curve import P as _FP, R as _FR

_LIB = None
_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "csrc",
    "bn254.c",
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

        _LIB = ctypes.CDLL(build(_SRC, ("-fopenmp",)))
    return _LIB


def _limbs(x: int, n: int = 4) -> list[int]:
    return [(x >> (64 * i)) & 0xFFFFFFFFFFFFFFFF for i in range(n)]


def _from_limbs(arr) -> int:
    acc = 0
    for i, v in enumerate(arr):
        acc |= int(v) << (64 * i)
    return acc


def _pack_g1(points) -> tuple[np.ndarray, np.ndarray]:
    pts = np.zeros((len(points), 8), dtype=np.uint64)
    infs = np.zeros(len(points), dtype=np.int32)
    for i, pt in enumerate(points):
        if pt is None:
            infs[i] = 1
        else:
            pts[i, :4] = _limbs(pt[0])
            pts[i, 4:] = _limbs(pt[1])
    return pts, infs


def _pack_g2(points) -> tuple[np.ndarray, np.ndarray]:
    pts = np.zeros((len(points), 16), dtype=np.uint64)
    infs = np.zeros(len(points), dtype=np.int32)
    for i, pt in enumerate(points):
        if pt is None:
            infs[i] = 1
        else:
            (x0, x1), (y0, y1) = pt
            pts[i, 0:4] = _limbs(x0)
            pts[i, 4:8] = _limbs(x1)
            pts[i, 8:12] = _limbs(y0)
            pts[i, 12:16] = _limbs(y1)
    return pts, infs


def _pack_scalars(scalars) -> np.ndarray:
    out = np.zeros((len(scalars), 32), dtype=np.uint8)
    for i, s in enumerate(scalars):
        out[i] = np.frombuffer(int(s % _FR).to_bytes(32, "little"), dtype=np.uint8)
    return out


def _unpack_g1(limbs, inf):
    if inf:
        return None
    return (_from_limbs(limbs[:4]), _from_limbs(limbs[4:8]))


def _unpack_g2(limbs, inf):
    if inf:
        return None
    return (
        (_from_limbs(limbs[0:4]), _from_limbs(limbs[4:8])),
        (_from_limbs(limbs[8:12]), _from_limbs(limbs[12:16])),
    )


def _cptr(arr, typ):
    return arr.ctypes.data_as(ctypes.POINTER(typ))


def pack_scalars(scalars) -> np.ndarray:
    """(n, 32) u8 little-endian scalar array (the MSM/batch ABI)."""
    return _pack_scalars(scalars)


def g1_msm_packed(pts: np.ndarray, infs, sc: np.ndarray):
    """MSM over pre-packed (n,8) u64 points + (n,32) u8 scalars."""
    lib = _lib()
    out = np.zeros(8, dtype=np.uint64)
    out_inf = np.zeros(1, dtype=np.int32)
    infs_p = _cptr(infs, ctypes.c_int32) if infs is not None else None
    lib.zkm_bn254_g1_msm(
        _cptr(pts, ctypes.c_uint64), infs_p,
        _cptr(sc, ctypes.c_uint8), ctypes.c_int64(len(pts)),
        _cptr(out, ctypes.c_uint64), _cptr(out_inf, ctypes.c_int32),
    )
    return _unpack_g1(out, out_inf[0])


def g2_msm_packed(pts: np.ndarray, infs, sc: np.ndarray):
    lib = _lib()
    out = np.zeros(16, dtype=np.uint64)
    out_inf = np.zeros(1, dtype=np.int32)
    infs_p = _cptr(infs, ctypes.c_int32) if infs is not None else None
    lib.zkm_bn254_g2_msm(
        _cptr(pts, ctypes.c_uint64), infs_p,
        _cptr(sc, ctypes.c_uint8), ctypes.c_int64(len(pts)),
        _cptr(out, ctypes.c_uint64), _cptr(out_inf, ctypes.c_int32),
    )
    return _unpack_g2(out, out_inf[0])


def g1_mul_batch_packed(base, scalars_packed: np.ndarray):
    """Fixed-base batch returning packed ((n,8) u64, (n,) i32) arrays."""
    lib = _lib()
    pts, infs = _pack_g1([base])
    n = len(scalars_packed)
    out = np.zeros((n, 8), dtype=np.uint64)
    out_inf = np.zeros(n, dtype=np.int32)
    lib.zkm_bn254_g1_mul_batch(
        _cptr(pts, ctypes.c_uint64), ctypes.c_int32(int(infs[0])),
        _cptr(scalars_packed, ctypes.c_uint8), ctypes.c_int64(n),
        _cptr(out, ctypes.c_uint64), _cptr(out_inf, ctypes.c_int32),
    )
    return out, out_inf


def g2_mul_batch_packed(base, scalars_packed: np.ndarray):
    lib = _lib()
    pts, infs = _pack_g2([base])
    n = len(scalars_packed)
    out = np.zeros((n, 16), dtype=np.uint64)
    out_inf = np.zeros(n, dtype=np.int32)
    lib.zkm_bn254_g2_mul_batch(
        _cptr(pts, ctypes.c_uint64), ctypes.c_int32(int(infs[0])),
        _cptr(scalars_packed, ctypes.c_uint8), ctypes.c_int64(n),
        _cptr(out, ctypes.c_uint64), _cptr(out_inf, ctypes.c_int32),
    )
    return out, out_inf


def pack_fr(vals) -> np.ndarray:
    """(n, 4) u64 canonical little-endian Fr array."""
    buf = b"".join(int(v % _FR).to_bytes(32, "little") for v in vals)
    return np.frombuffer(buf, dtype=np.uint64).reshape(-1, 4).copy()


def unpack_fr(arr: np.ndarray) -> list[int]:
    return [int.from_bytes(row.tobytes(), "little") for row in np.ascontiguousarray(arr)]


def fr_fft(vals: np.ndarray, root: int, inverse: bool = False) -> np.ndarray:
    """In-place radix-2 FFT over Fr on a packed (n,4) u64 canonical array."""
    lib = _lib()
    n = len(vals)
    rt = np.array(_limbs(root), dtype=np.uint64)
    lib.zkm_bn254_fr_fft(
        _cptr(vals, ctypes.c_uint64), ctypes.c_int64(n),
        _cptr(rt, ctypes.c_uint64), ctypes.c_int32(1 if inverse else 0),
    )
    return vals


def fr_scale_pows(vals: np.ndarray, g: int) -> np.ndarray:
    """vals[i] *= g^i in place (packed canonical array)."""
    lib = _lib()
    gt = np.array(_limbs(g), dtype=np.uint64)
    lib.zkm_bn254_fr_scale_pows(
        _cptr(vals, ctypes.c_uint64), ctypes.c_int64(len(vals)), _cptr(gt, ctypes.c_uint64)
    )
    return vals


def fr_mul_sub_scale(a: np.ndarray, b: np.ndarray, c: np.ndarray, k: int) -> np.ndarray:
    """(a*b - c) * k elementwise over packed canonical arrays."""
    lib = _lib()
    kt = np.array(_limbs(k), dtype=np.uint64)
    out = np.zeros_like(a)
    lib.zkm_bn254_fr_mul_sub_scale(
        _cptr(a, ctypes.c_uint64), _cptr(b, ctypes.c_uint64), _cptr(c, ctypes.c_uint64),
        ctypes.c_int64(len(a)), _cptr(kt, ctypes.c_uint64), _cptr(out, ctypes.c_uint64),
    )
    return out


def g1_msm(points, scalars):
    lib = _lib()
    pts, infs = _pack_g1(points)
    sc = _pack_scalars(scalars)
    out = np.zeros(8, dtype=np.uint64)
    out_inf = np.zeros(1, dtype=np.int32)
    lib.zkm_bn254_g1_msm(
        _cptr(pts, ctypes.c_uint64), _cptr(infs, ctypes.c_int32),
        _cptr(sc, ctypes.c_uint8), ctypes.c_int64(len(points)),
        _cptr(out, ctypes.c_uint64), _cptr(out_inf, ctypes.c_int32),
    )
    return _unpack_g1(out, out_inf[0])


def g2_msm(points, scalars):
    lib = _lib()
    pts, infs = _pack_g2(points)
    sc = _pack_scalars(scalars)
    out = np.zeros(16, dtype=np.uint64)
    out_inf = np.zeros(1, dtype=np.int32)
    lib.zkm_bn254_g2_msm(
        _cptr(pts, ctypes.c_uint64), _cptr(infs, ctypes.c_int32),
        _cptr(sc, ctypes.c_uint8), ctypes.c_int64(len(points)),
        _cptr(out, ctypes.c_uint64), _cptr(out_inf, ctypes.c_int32),
    )
    return _unpack_g2(out, out_inf[0])


def g1_mul_batch(base, scalars) -> list:
    """[scalar_i * base for i] — fixed-base window table in C (key setup)."""
    lib = _lib()
    pts, infs = _pack_g1([base])
    sc = _pack_scalars(scalars)
    out = np.zeros((len(scalars), 8), dtype=np.uint64)
    out_inf = np.zeros(len(scalars), dtype=np.int32)
    lib.zkm_bn254_g1_mul_batch(
        _cptr(pts, ctypes.c_uint64), ctypes.c_int32(int(infs[0])),
        _cptr(sc, ctypes.c_uint8), ctypes.c_int64(len(scalars)),
        _cptr(out, ctypes.c_uint64), _cptr(out_inf, ctypes.c_int32),
    )
    return [_unpack_g1(out[i], out_inf[i]) for i in range(len(scalars))]


def g2_mul_batch(base, scalars) -> list:
    lib = _lib()
    pts, infs = _pack_g2([base])
    sc = _pack_scalars(scalars)
    out = np.zeros((len(scalars), 16), dtype=np.uint64)
    out_inf = np.zeros(len(scalars), dtype=np.int32)
    lib.zkm_bn254_g2_mul_batch(
        _cptr(pts, ctypes.c_uint64), ctypes.c_int32(int(infs[0])),
        _cptr(sc, ctypes.c_uint8), ctypes.c_int64(len(scalars)),
        _cptr(out, ctypes.c_uint64), _cptr(out_inf, ctypes.c_int32),
    )
    return [_unpack_g2(out[i], out_inf[i]) for i in range(len(scalars))]


# ---- vectorized Fr ops (Montgomery-domain packed (n,4) u64 arrays) ---------


def fr_vec_mont(arr: np.ndarray, to: bool = True) -> np.ndarray:
    """In-place Montgomery domain conversion of a packed Fr array."""
    lib = _lib()
    lib.zkm_bn254_fr_vec_mont(
        _cptr(arr, ctypes.c_uint64), ctypes.c_int64(len(arr)), ctypes.c_int32(1 if to else 0)
    )
    return arr


def _vec_addsub(a, b, sub):
    lib = _lib()
    out = np.empty_like(a)
    lib.zkm_bn254_fr_vec_addsub(
        _cptr(a, ctypes.c_uint64), _cptr(b, ctypes.c_uint64), _cptr(out, ctypes.c_uint64),
        ctypes.c_int64(len(a)), ctypes.c_int32(sub),
    )
    return out


def fr_vec_add(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return _vec_addsub(a, b, 0)


def fr_vec_sub(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return _vec_addsub(a, b, 1)


def fr_vec_mul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pointwise product; inputs/outputs Montgomery."""
    lib = _lib()
    out = np.empty_like(a)
    lib.zkm_bn254_fr_vec_mul(
        _cptr(a, ctypes.c_uint64), _cptr(b, ctypes.c_uint64), _cptr(out, ctypes.c_uint64),
        ctypes.c_int64(len(a)),
    )
    return out


def fr_vec_scale_add(a: np.ndarray, k_m: np.ndarray, d_m: np.ndarray) -> np.ndarray:
    """a * k + d with Montgomery scalars k_m/d_m ((4,) u64)."""
    lib = _lib()
    out = np.empty_like(a)
    lib.zkm_bn254_fr_vec_scale_add(
        _cptr(a, ctypes.c_uint64), _cptr(k_m, ctypes.c_uint64), _cptr(d_m, ctypes.c_uint64),
        _cptr(out, ctypes.c_uint64), ctypes.c_int64(len(a)),
    )
    return out


def fr_vec_inv(a: np.ndarray) -> np.ndarray:
    """Pointwise batch inverse (Montgomery); zeros map to zero."""
    lib = _lib()
    out = np.empty_like(a)
    lib.zkm_bn254_fr_vec_inv(
        _cptr(a, ctypes.c_uint64), _cptr(out, ctypes.c_uint64), ctypes.c_int64(len(a))
    )
    return out


def fr_vec_powers(x_m: np.ndarray, s_m: np.ndarray, n: int) -> np.ndarray:
    """[s, s*x, s*x^2, ...] (Montgomery scalars in, packed array out)."""
    lib = _lib()
    out = np.empty((n, 4), dtype=np.uint64)
    lib.zkm_bn254_fr_vec_powers(
        _cptr(x_m, ctypes.c_uint64), _cptr(s_m, ctypes.c_uint64),
        _cptr(out, ctypes.c_uint64), ctypes.c_int64(n),
    )
    return out


def fr_vec_div_linear(a: np.ndarray, z_m: np.ndarray) -> np.ndarray:
    """a(X) / (X - z) in Montgomery; raises if the remainder is nonzero."""
    lib = _lib()
    out = np.empty((len(a) - 1, 4), dtype=np.uint64)
    rem = lib.zkm_bn254_fr_vec_div_linear(
        _cptr(a, ctypes.c_uint64), _cptr(z_m, ctypes.c_uint64),
        _cptr(out, ctypes.c_uint64), ctypes.c_int64(len(a)),
    )
    if rem:
        raise AssertionError("division by (X - z) leaves a remainder")
    return out


def fr_fft_mont(vals: np.ndarray, root: int, inverse: bool = False) -> np.ndarray:
    """In-place FFT on a Montgomery-domain packed array (no domain flips)."""
    lib = _lib()
    rt = np.array(_limbs(root), dtype=np.uint64)
    lib.zkm_bn254_fr_fft2(
        _cptr(vals, ctypes.c_uint64), ctypes.c_int64(len(vals)),
        _cptr(rt, ctypes.c_uint64), ctypes.c_int32(1 if inverse else 0), ctypes.c_int32(1),
    )
    return vals
