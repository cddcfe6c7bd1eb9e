"""Remote prover service: offload proving to another host/process.

The reference has two remote backends — a twirp/bincode RPC to a GPU
container (crates/cuda/src/lib.rs:38-80, proto/api.proto: Ready/Setup/
ProveCore/Compress/Shrink/Wrap) and a gRPC prover network
(sdk/src/network/prover.rs, stage.proto GenerateProof/GetStatus) whose
requests are signed.  The TPU-native equivalent keeps the same shape:

* ``ProverServer``: a stdlib HTTP server wrapping a local ProverClient
  (run it on the TPU host).  STAGE-GRANULAR endpoints mirror api.proto:
  ``/setup``, ``/prove`` (whole ladder), ``/prove_core``, ``/compress``,
  ``/shrink``, ``/wrap``, ``/verify`` — so a coordinator can fan shards out
  to one pool and recursion to another, exactly like the reference's cuda
  stage service.
* ``NetworkProver``: the client; serializes requests, polls ``/status``.

Transport codecs: proof objects travel as the STABLE BYTE FORMATS
(verifier/stark_codec — core shard lists and compressed/shrink/wrap
proofs); programs, stdin and proving keys use pickle (a trusted-channel
object codec, like the reference's bincode between its own processes).
The whole body is authenticated when ``ZKM_NETWORK_KEY`` is set: requests
and responses carry an HMAC-SHA256 over the payload (the reference signs
network requests with ECDSA, sdk/src/network/prover.rs:242-306) — so the
pickle channel only accepts peers holding the shared key.
"""

from __future__ import annotations

import hashlib
import hmac
import http.client
import http.server
import os
import pickle
import threading
import uuid


def _key() -> bytes | None:
    k = os.environ.get("ZKM_NETWORK_KEY")
    return k.encode() if k else None


def _mac(body: bytes) -> str:
    k = _key()
    return hmac.new(k, body, hashlib.sha256).hexdigest() if k else ""


def _check_mac(body: bytes, mac: str) -> bool:
    k = _key()
    if k is None:
        return True
    return hmac.compare_digest(hmac.new(k, body, hashlib.sha256).hexdigest(), mac)


def _pack_proof(obj):
    """Proof objects -> stable bytes wherever a codec exists."""
    from ..verifier import stark_codec as codec
    from .client import ProofWithPublicValues

    if isinstance(obj, ProofWithPublicValues):
        return {"fmt": "pwp", "data": obj.to_bytes()}
    from ..recursion.compress import CompressedProof

    if isinstance(obj, CompressedProof):
        return {"fmt": "compressed", "data": codec.encode_compressed_proof(obj)}
    if isinstance(obj, list) and obj and obj[0].__class__.__name__ == "ShardProof":
        return {"fmt": "core", "data": codec.encode_core_proof(obj)}
    return {"fmt": "pickle", "data": pickle.dumps(obj)}


def _unpack_proof(env):
    from ..verifier import stark_codec as codec

    fmt, data = env["fmt"], env["data"]
    if fmt == "pwp":
        from .client import ProofWithPublicValues

        return ProofWithPublicValues.from_bytes(data)
    if fmt == "compressed":
        return codec.decode_compressed_proof(data)[0]
    if fmt == "core":
        return codec.decode_core_proof(data)[0]
    return pickle.loads(data)


class ProverServer:
    """Serves the stage-granular prover RPC (cuda proto/api.proto analog)."""

    def __init__(self, client=None, host: str = "127.0.0.1", port: int = 0):
        from .client import ProverClient

        self.client = client or ProverClient.new()
        self.jobs: dict[str, dict] = {}
        outer = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _reply(self, obj, code: int = 200):
                data = pickle.dumps(obj)
                self.send_response(code)
                self.send_header("Content-Length", str(len(data)))
                self.send_header("X-ZKM-MAC", _mac(data))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                if self.path == "/ready":
                    self._reply({"ready": True})
                elif self.path.startswith("/status/"):
                    job = outer.jobs.get(self.path.split("/")[-1])
                    if job is None:
                        self._reply({"error": "unknown job"}, 404)
                    elif job.get("error"):
                        self._reply({"state": "failed", "error": job["error"]})
                    elif "result" in job:
                        self._reply({"state": "done", "result": job["result"]})
                    else:
                        self._reply({"state": "running"})
                else:
                    self._reply({"error": "not found"}, 404)

            def do_POST(self):
                n = int(self.headers.get("Content-Length", "0"))
                body = self.rfile.read(n)
                if not _check_mac(body, self.headers.get("X-ZKM-MAC", "")):
                    self._reply({"error": "bad request MAC"}, 403)
                    return
                req = pickle.loads(body)
                if self.path == "/setup":
                    pk, vk = outer.client.setup(req["program"])
                    self._reply({"pk": pk, "vk": vk})
                elif self.path in ("/prove", "/prove_core", "/compress", "/shrink", "/wrap"):
                    job_id = uuid.uuid4().hex
                    outer.jobs[job_id] = {}
                    threading.Thread(
                        target=outer._run_job, args=(job_id, self.path, req), daemon=True
                    ).start()
                    self._reply({"job_id": job_id})
                elif self.path == "/verify":
                    proof = req["proof"]
                    if isinstance(proof, dict) and "fmt" in proof:
                        proof = _unpack_proof(proof)
                    ok = outer.client.verify(req["vk"], proof, req["program"])
                    self._reply({"ok": ok})
                else:
                    self._reply({"error": "not found"}, 404)

        self.httpd = http.server.ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]

    # ------------------------------------------------------------- job runner

    def _run_job(self, job_id: str, path: str, req: dict):
        try:
            if path == "/prove":
                proof = self.client.prove(
                    req["pk"], req["program"], req.get("stdin"),
                    shard_size=req.get("shard_size", 1 << 20),
                    mode=req.get("mode", "core"),
                )
                self.jobs[job_id]["result"] = _pack_proof(proof)
                return
            rp = self.client._recursion_prover()
            if path == "/prove_core":
                from ..executor import execute_for_proving

                stdin = req.get("stdin")
                records, _info = execute_for_proving(
                    req["program"],
                    stdin_bufs=stdin.buffers if stdin is not None else (),
                    proof_stream=stdin.proofs if stdin is not None else (),
                    shard_size=req.get("shard_size", 1 << 20),
                )
                proofs = self.client.machine.prove(
                    req["pk"], records, device=self.client.device
                )
                self.jobs[job_id]["result"] = _pack_proof(proofs)
            elif path == "/compress":
                proofs = _unpack_proof(req["proofs"])
                cp = rp.compress(req["vk"], proofs)
                self.jobs[job_id]["result"] = _pack_proof(cp)
            elif path == "/shrink":
                cp = _unpack_proof(req["proof"])
                self.jobs[job_id]["result"] = _pack_proof(rp.shrink(cp))
            elif path == "/wrap":
                cp = _unpack_proof(req["proof"])
                self.jobs[job_id]["result"] = _pack_proof(rp.wrap(cp))
            else:
                raise ValueError(path)
        except Exception as e:  # surfaced through /status
            self.jobs[job_id]["error"] = repr(e)

    def serve_background(self) -> threading.Thread:
        t = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        t.start()
        return t

    def shutdown(self):
        self.httpd.shutdown()


class NetworkProver:
    """Client-side prover that forwards to a ProverServer
    (sdk/src/network/prover.rs NetworkProver analog; GenerateProof +
    GetStatus polling, HMAC-authenticated when ZKM_NETWORK_KEY is set)."""

    def __init__(self, endpoint: str):
        assert endpoint.startswith("http://"), "endpoint must be http://host:port"
        self.host = endpoint[len("http://") :]

    def _call(self, method: str, path: str, payload=None):
        conn = http.client.HTTPConnection(self.host, timeout=600)
        body = pickle.dumps(payload) if payload is not None else None
        headers = {"X-ZKM-MAC": _mac(body)} if body is not None else {}
        conn.request(method, path, body=body, headers=headers)
        resp = conn.getresponse()
        data = resp.read()
        if not _check_mac(data, resp.getheader("X-ZKM-MAC", "")):
            conn.close()
            raise RuntimeError("prover service response failed MAC check")
        out = pickle.loads(data)
        conn.close()
        if resp.status != 200:
            raise RuntimeError(f"prover service error: {out}")
        return out

    def _poll(self, job: str, poll_interval: float):
        import time

        while True:
            st = self._call("GET", f"/status/{job}")
            if st.get("state") == "done":
                return _unpack_proof(st["result"])
            if st.get("state") == "failed":
                raise RuntimeError(f"remote job failed: {st.get('error')}")
            time.sleep(poll_interval)

    def ready(self) -> bool:
        return bool(self._call("GET", "/ready").get("ready"))

    def setup(self, program):
        out = self._call("POST", "/setup", {"program": program})
        return out["pk"], out["vk"]

    def prove(self, pk, program, stdin=None, shard_size: int = 1 << 20, mode: str = "core", poll_interval: float = 1.0):
        job = self._call("POST", "/prove", {
            "pk": pk, "program": program, "stdin": stdin,
            "shard_size": shard_size, "mode": mode,
        })["job_id"]
        return self._poll(job, poll_interval)

    # -- stage-granular API (cuda api.proto ProveCore/Compress/Shrink/Wrap) --

    def prove_core(self, pk, program, stdin=None, shard_size: int = 1 << 20, poll_interval: float = 1.0):
        job = self._call("POST", "/prove_core", {
            "pk": pk, "program": program, "stdin": stdin, "shard_size": shard_size,
        })["job_id"]
        return self._poll(job, poll_interval)

    def compress(self, vk, shard_proofs, poll_interval: float = 1.0):
        job = self._call("POST", "/compress", {
            "vk": vk, "proofs": _pack_proof(list(shard_proofs)),
        })["job_id"]
        return self._poll(job, poll_interval)

    def shrink(self, cp, poll_interval: float = 1.0):
        job = self._call("POST", "/shrink", {"proof": _pack_proof(cp)})["job_id"]
        return self._poll(job, poll_interval)

    def wrap(self, cp, poll_interval: float = 1.0):
        job = self._call("POST", "/wrap", {"proof": _pack_proof(cp)})["job_id"]
        return self._poll(job, poll_interval)

    def verify(self, vk, proof, program) -> bool:
        env = _pack_proof(proof) if not isinstance(proof, (dict, list)) else proof
        return bool(self._call("POST", "/verify", {"vk": vk, "proof": env, "program": program})["ok"])
