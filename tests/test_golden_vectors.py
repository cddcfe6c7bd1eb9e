"""Golden cross-checks of shared protocol constants against the Rust/C++
reference sources themselves (not our own transcriptions).

A transposed or mistyped constant would pass every self-consistency test in
this repo; these tests parse the reference tree at runtime and compare
numerically:

- Poseidon2-KB16 round constants:    /root/reference/crates/primitives/src/lib.rs:19
- Poseidon2-KB16 internal diagonal:  /root/reference/crates/recursion/core/include/poseidon2_constants.hpp:1083
- Septic curve start/dummy points:   /root/reference/crates/stark/src/septic_digest.rs:9-23,
                                     /root/reference/crates/stark/src/septic_curve.rs (dummy point)
- lift_x on the reference's own unit-test inputs (septic_curve.rs:248,264)
"""

import os
import re

import numpy as np
import pytest

from zkmips_tpu.ops import field as f
from zkmips_tpu.ops import septic
from zkmips_tpu.ops._poseidon2_rc import RC_16_30
from zkmips_tpu.ops.poseidon2 import _DIAG_CANON

REF = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree absent")


def test_rc_16_30_matches_rust_reference():
    src = open(f"{REF}/crates/primitives/src/lib.rs").read()
    # RC_16_30 is the first table; RC_16_30_U32 (same values, raw) follows.
    block = src.split("RC_16_30:")[1].split("= [", 1)[1].split("];")[0]
    vals = [int(m) for m in re.findall(r"from_wrapped_u32\((\d+)\)", block)]
    assert len(vals) == 30 * 16
    got = np.array(vals, dtype=np.uint64).reshape(30, 16) % f.P
    ours = np.array(RC_16_30, dtype=np.uint64)
    assert np.array_equal(got, ours)


def test_poseidon2_internal_diag_matches_cpp_reference():
    src = open(
        f"{REF}/crates/recursion/core/include/poseidon2_constants.hpp"
    ).read()
    block = src.split("POSEIDON2_INTERNAL_MATRIX_DIAG_16_KOALABEAR_MONTY")[-1]
    exprs = re.findall(r"to_monty\((.+)\)\),", block)
    assert len(exprs) >= 16
    p = f.P
    diag = [
        eval(e.replace("0x7f000001u", str(p)).replace("u", "")) % p
        for e in exprs[:16]
    ]
    assert diag == list(_DIAG_CANON)


def test_septic_start_points_match_rust_reference():
    src = open(f"{REF}/crates/stark/src/septic_digest.rs").read()

    def arr(name):
        block = src.split(name)[1].split("=", 1)[1].split("];")[0]
        return [int(m) for m in re.findall(r"(\d+)", block.split("[")[1])][:7]

    ref_start_x = arr("CURVE_CUMULATIVE_SUM_START_X")
    ref_start_y = arr("CURVE_CUMULATIVE_SUM_START_Y")
    ref_dig_x = arr("DIGEST_SUM_START_X")
    ref_dig_y = arr("DIGEST_SUM_START_Y")
    assert septic.scalar(ref_start_x).tolist() == septic.START_X.tolist()
    assert septic.scalar(ref_start_y).tolist() == septic.START_Y.tolist()
    assert septic.scalar(ref_dig_x).tolist() == septic.DIGEST_START_X.tolist()
    assert septic.scalar(ref_dig_y).tolist() == septic.DIGEST_START_Y.tolist()
    # and all of them satisfy our curve equation (cross-checks CURVE_A/B and
    # the septic multiplication tower against the reference's constants)
    for x, y in [
        (septic.START_X, septic.START_Y),
        (septic.DIGEST_START_X, septic.DIGEST_START_Y),
        (septic.DUMMY_X, septic.DUMMY_Y),
    ]:
        assert np.array_equal(*septic.is_on_curve(x, y))


def test_septic_dummy_point_matches_rust_reference():
    src = open(f"{REF}/crates/stark/src/septic_curve.rs").read()

    def arr(name):
        block = src.split(name)[1].split("=", 1)[1]
        # drop commented-out rows (one holds a stray "];=") before locating
        # the closing bracket of the decimal literal
        block = "\n".join(
            ln for ln in block.splitlines() if not ln.strip().startswith("//")
        ).split("];")[0]
        return [int(m) for m in re.findall(r"(\d+)", block.split("[")[1])][:7]

    ref_dummy_x = arr("CURVE_WITNESS_DUMMY_POINT_X")
    ref_dummy_y = arr("CURVE_WITNESS_DUMMY_POINT_Y")
    assert septic.scalar(ref_dummy_x).tolist() == septic.DUMMY_X.tolist()
    assert septic.scalar(ref_dummy_y).tolist() == septic.DUMMY_Y.tolist()


def test_lift_x_reference_unit_test_inputs():
    # septic_curve.rs:248 test_lift_x1 and :264 test_lift_x
    for m in (
        [1511106837, 0, 0, 0, 0, 0, 0],
        [0x2013, 0x2015, 0x2016, 0x2023, 0x2024, 0x2016, 0x2017],
    ):
        x, y, _off = septic.lift_x_int(m)
        xm = septic.scalar(x)
        ym = septic.scalar(y)
        assert np.array_equal(*septic.is_on_curve(xm, ym))
        # double stays on curve (septic_curve.rs:279 test_double)
        dx, dy = septic.curve_double(xm, ym)
        assert np.array_equal(*septic.is_on_curve(dx, dy))


def test_hash_public_inputs_golden():
    # crates/primitives/src/io.rs:94-105 test_hash_public_values
    from zkmips_tpu.verifier import bn254_public_values, hash_public_inputs

    data = bytes.fromhex(
        "1234567890abcdef1234567890abcdef1234567890abcdef1234567890abcdef"
        "1234567890abcdef1234567890abcdef1234567890abcdef1234567890abcdef"
    )
    assert (
        hash_public_inputs(data).hex()
        == "1ce987d0a7fcc2636fe87e69295ba12b1cc46c256b369ae7401c51b805ee91bd"
    )
    vkh = bytes(range(32))
    vals = bn254_public_values(vkh, data)
    assert vals[0] == int.from_bytes(vkh[1:], "big")
    assert vals[1] == int.from_bytes(hash_public_inputs(data), "big")
