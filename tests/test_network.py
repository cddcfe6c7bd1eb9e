"""Remote prover service round-trip (sdk/network.py; cuda + network-prover
RPC analog) — server in a background thread, client over real HTTP."""

import numpy as np

from zkmips_tpu.executor import Opcode, Register, asm
from zkmips_tpu.sdk import ProverClient, ZKMStdin
from zkmips_tpu.sdk.network import ProverServer
from zkmips_tpu.stark.machine import StarkConfig

R, O = Register, Opcode


def _program():
    return asm.prog(
        [
            *asm.li(R.T0, 5), *asm.li(R.T1, 6),
            asm.alu(O.ADD, R.T2, R.T0, R.T1),
            *asm.li(R.V0, 0x10), *asm.li(R.A0, 0),
            asm.alu(O.ADD, R.A1, R.T2, 0, imm_c=True), asm.syscall(),
        ]
        + asm.halt_sequence()
    )


def test_network_prover_roundtrip():
    server = ProverServer(client=ProverClient(config=StarkConfig.test()))
    server.serve_background()
    try:
        client = ProverClient.new(backend="network", endpoint=f"http://127.0.0.1:{server.port}")
        assert client.remote.ready()
        program = _program()
        pk, vk = client.setup(program)
        proof = client.prove(pk, program, ZKMStdin())
        assert proof.committed_value_digest[0] == 11
        assert client.verify(vk, proof, program)
    finally:
        server.shutdown()


def test_network_prover_failure_surfaces():
    import pytest

    server = ProverServer(client=ProverClient(config=StarkConfig.test()))
    server.serve_background()
    try:
        client = ProverClient.new(backend="network", endpoint=f"http://127.0.0.1:{server.port}")
        with pytest.raises(RuntimeError, match="remote job failed"):
            client.prove(None, _program(), ZKMStdin())
    finally:
        server.shutdown()


def test_network_stage_granular_ladder():
    """ProveCore/Compress/Shrink RPCs, each a separate remote stage
    (cuda proto/api.proto:6-14 analog); proofs travel as stable bytes."""
    server = ProverServer(client=ProverClient(config=StarkConfig.test()))
    server.serve_background()
    try:
        client = ProverClient.new(backend="network", endpoint=f"http://127.0.0.1:{server.port}")
        program = _program()
        pk, vk = client.setup(program)
        shard_proofs = client.remote.prove_core(pk, program, ZKMStdin())
        assert isinstance(shard_proofs, list) and shard_proofs
        cp = client.remote.compress(vk, shard_proofs)
        assert cp.stage == "compress"
        sh = client.remote.shrink(cp)
        assert sh.stage == "shrink"
    finally:
        server.shutdown()


def test_network_hmac_rejects_unauthenticated(monkeypatch):
    monkeypatch.setenv("ZKM_NETWORK_KEY", "sekrit")
    server = ProverServer(client=ProverClient(config=StarkConfig.test()))
    server.serve_background()
    try:
        import http.client
        import pickle
        import pytest

        # a request without the MAC header must be rejected
        conn = http.client.HTTPConnection(f"127.0.0.1:{server.port}", timeout=30)
        conn.request("POST", "/setup", body=pickle.dumps({"program": _program()}))
        resp = conn.getresponse()
        assert resp.status == 403
        conn.close()
        # the keyed client goes through
        client = ProverClient.new(backend="network", endpoint=f"http://127.0.0.1:{server.port}")
        assert client.remote.ready()
        pk, vk = client.setup(_program())
        assert vk is not None
    finally:
        server.shutdown()
