"""Byte-API STARK verifier: stable proof/vk wire format + verify_core
(the crates/verifier/src/stark/verify.rs analog)."""

import numpy as np
import pytest

from zkmips_tpu.executor import Executor, asm
from zkmips_tpu.executor.opcodes import Opcode, Register
from zkmips_tpu.machine.machine import mips_machine
from zkmips_tpu.stark.machine import StarkConfig, VerificationError
from zkmips_tpu.verifier import stark_codec as codec

R, O = Register, Opcode


def _sys(code, a0=0, a1=0):
    return [*asm.li(R.V0, int(code)), *asm.li(R.A0, a0), *asm.li(R.A1, a1), asm.syscall()]


@pytest.fixture(scope="module")
def proven():
    """Guest that writes "hi!!" to the public-values fd and commits its
    sha256 digest — the zkvm entrypoint's commit flow in miniature."""
    import hashlib

    pv_stream = b"hi!!"
    word = int.from_bytes(pv_stream, "little")
    digest = hashlib.sha256(pv_stream).digest()
    words = [int.from_bytes(digest[4 * i : 4 * i + 4], "little") for i in range(8)]
    body = [
        *asm.li(R.T0, word),
        *asm.li(R.T1, 0x2000),
        asm.sw(R.T0, R.T1),
        *asm.li(R.A2, 4),
        *_sys(2, 3, 0x2000),  # WRITE(fd=3, ptr, len=a2)
    ]
    for i, w in enumerate(words):
        body += _sys(0x10, i, w)  # COMMIT(word index, value)
    p = asm.prog(body + asm.halt_sequence())
    ex = Executor(p, shard_size=256)
    records = ex.run()
    assert bytes(ex.public_values_stream) == pv_stream
    assert ex.committed_value_digest == words
    # full machine: the guest's store needs MemoryInstrs, and verify_core
    # rebuilds the full machine anyway
    m = mips_machine(StarkConfig.test())
    pk = m.setup(p)
    proofs = m.prove(pk, records)
    assert m.verify(pk.vk, proofs, p)
    return p, ex, m, pk, proofs


def test_roundtrip_deterministic(proven):
    p, ex, m, pk, proofs = proven
    b = codec.encode_core_proof(proofs, config="test")
    assert isinstance(b, bytes) and len(b) > 1000
    decoded, cfg = codec.decode_core_proof(b)
    assert cfg == "test"
    assert codec.encode_core_proof(decoded, config=cfg) == b
    vkb = codec.encode_vk(pk.vk, p.pc_start)
    vk2, pc = codec.decode_vk(vkb)
    assert pc == p.pc_start
    assert codec.encode_vk(vk2, pc) == vkb


def test_byte_api_verify(proven):
    p, ex, m, pk, proofs = proven
    b = codec.encode_core_proof(proofs, config="test")
    vkb = codec.encode_vk(pk.vk, p.pc_start)
    assert codec.verify_core(b, vkb, expected_pv_stream=bytes(ex.public_values_stream),
                             allowed_configs=("core", "test"))


def test_byte_api_rejects_bitflip(proven):
    p, ex, m, pk, proofs = proven
    b = bytearray(codec.encode_core_proof(proofs, config="test"))
    vkb = codec.encode_vk(pk.vk, p.pc_start)
    # flip a byte inside the proof body (past the header)
    b[len(b) // 2] ^= 1
    with pytest.raises((VerificationError, codec.CodecError)):
        codec.verify_core(bytes(b), vkb, allowed_configs=("core", "test"))


def test_byte_api_rejects_wrong_pv_stream(proven):
    p, ex, m, pk, proofs = proven
    b = codec.encode_core_proof(proofs, config="test")
    vkb = codec.encode_vk(pk.vk, p.pc_start)
    with pytest.raises(VerificationError, match="digest"):
        codec.verify_core(b, vkb, expected_pv_stream=b"not the committed stream",
                          allowed_configs=("core", "test"))


def test_byte_api_pins_config(proven):
    """The unsound test config must be rejected unless explicitly allowed:
    the config id rides the attacker-controlled proof bytes."""
    p, ex, m, pk, proofs = proven
    b = codec.encode_core_proof(proofs, config="test")
    vkb = codec.encode_vk(pk.vk, p.pc_start)
    with pytest.raises(VerificationError):
        codec.verify_core(b, vkb)


def test_truncated_bytes_raise_codec_error(proven):
    p, ex, m, pk, proofs = proven
    b = codec.encode_core_proof(proofs, config="test")
    for cut in (1, 5, 17, len(b) // 3):
        with pytest.raises((codec.CodecError, VerificationError)):
            codec.verify_core(b[:cut], codec.encode_vk(pk.vk, p.pc_start),
                              allowed_configs=("core", "test"))


def test_compressed_and_deferred_codec_roundtrip(proven):
    """Recursion-ladder proofs serialize to stable bytes (no pickle)."""
    from zkmips_tpu.recursion.compress import RecursionProver

    p, ex, m, pk, proofs = proven
    rp = RecursionProver(m)
    cp = rp.compress(pk.vk, proofs)
    b = codec.encode_compressed_proof(cp, config="test")
    cp2, cfg = codec.decode_compressed_proof(b)
    assert cfg == "test"
    assert codec.encode_compressed_proof(cp2, config=cfg) == b
    assert cp2.final_vk_root == cp.final_vk_root
    assert cp2.num_shards == cp.num_shards
    assert cp2.record == cp.record
    # the decoded proof still verifies
    assert rp.verify_compressed(pk.vk, p, cp2)
    with pytest.raises(codec.CodecError):
        codec.decode_compressed_proof(b[: len(b) // 2])


def test_sdk_container_roundtrip(proven):
    from zkmips_tpu.sdk.client import ProofWithPublicValues

    p, ex, m, pk, proofs = proven
    pwp = ProofWithPublicValues(
        proofs, bytes(ex.public_values_stream), ex.committed_value_digest,
        mode="core", config="test",
    )
    b = pwp.to_bytes()
    back = ProofWithPublicValues.from_bytes(b)
    assert back.mode == "core" and back.config == "test"
    assert back.public_values == bytes(ex.public_values_stream)
    assert back.to_bytes() == b
    assert m.verify(pk.vk, back.proofs, p)
    assert not b.startswith(b"\x80")  # definitely not a pickle stream
