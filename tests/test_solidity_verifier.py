"""On-chain verifier artifact generator: the rendered Solidity contract must
embed exactly the vk the byte-level Python verifier uses (no solc in this
environment, so the source is pinned by re-parsing its constants)."""

import hashlib
import os
import re

import pytest

from zkmips_tpu.verifier import gnark
from zkmips_tpu.verifier.solidity import render_groth16_verifier

REF_VK = "/root/reference/crates/verifier/bn254-vk/groth16_vk.bin"


def _consts(src: str) -> dict:
    return {
        m.group(1): int(m.group(2))
        for m in re.finditer(r"constant (\w+) = (\d+);", src)
    }


@pytest.mark.skipif(not os.path.exists(REF_VK), reason="release vk not present")
def test_rendered_constants_match_vk():
    vk_bytes = open(REF_VK, "rb").read()
    src = render_groth16_verifier(vk_bytes)
    vk = gnark.load_groth16_vk(vk_bytes)
    c = _consts(src)
    assert (c["ALPHA_X"], c["ALPHA_Y"]) == vk.alpha
    for name, pt in (("BETA", vk.beta), ("GAMMA", vk.gamma), ("DELTA", vk.delta)):
        (x0, x1), (y0, y1) = pt
        assert (c[f"{name}_X0"], c[f"{name}_X1"]) == (x0, x1)
        assert (c[f"{name}_Y0"], c[f"{name}_Y1"]) == (y0, y1)
    for i, (kx, ky) in enumerate(vk.k):
        assert (c[f"K{i}_X"], c[f"K{i}_Y"]) == (kx, ky)
    # the 4-byte proof prefix the contract enforces == the Python verifier's
    assert hashlib.sha256(vk_bytes).digest()[:4].hex() in src
    # EIP-197 pairing input order: imaginary limb first
    assert src.index("BETA_X1 =") < src.index("BETA_X0 =")


@pytest.mark.skipif(not os.path.exists(REF_VK), reason="release vk not present")
def test_render_rejects_wrong_input_count():
    vk_bytes = bytearray(open(REF_VK, "rb").read())
    vk_bytes[288:292] = (2).to_bytes(4, "big")  # claim 2 K points
    with pytest.raises(Exception):
        render_groth16_verifier(bytes(vk_bytes[: 292 + 64]))
