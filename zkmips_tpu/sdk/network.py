"""Remote prover service: offload proving to another host/process.

The reference has two remote backends — a twirp/bincode RPC to a GPU
container (crates/cuda/src/lib.rs:38-80, proto/api.proto: Ready/Setup/
ProveCore/Compress/Shrink/Wrap) and a gRPC prover network
(sdk/src/network/prover.rs, stage.proto GenerateProof/GetStatus).  The
TPU-native equivalent keeps the same shape: a stdlib HTTP server wrapping a
local ProverClient (run it on the TPU host), and a client-side Prover that
serializes Program/ZKMStdin, posts a prove request, and polls for status —
so laptops drive TPU pods with no extra dependencies.

Payloads are pickled (the reference uses bincode; both are trusted-channel
codecs — this is an internal RPC, not an adversarial boundary).
"""

from __future__ import annotations

import http.client
import http.server
import pickle
import threading
import uuid


class ProverServer:
    """Serves Ready/Setup/Prove/Verify over HTTP (api.proto analog)."""

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
                req = pickle.loads(self.rfile.read(n))
                if self.path == "/setup":
                    pk, vk = outer.client.setup(req["program"])
                    self._reply({"pk": pk, "vk": vk})
                elif self.path == "/prove":
                    job_id = uuid.uuid4().hex
                    outer.jobs[job_id] = {}
                    threading.Thread(
                        target=outer._run_job, args=(job_id, req), daemon=True
                    ).start()
                    self._reply({"job_id": job_id})
                elif self.path == "/verify":
                    ok = outer.client.verify(req["vk"], req["proof"], req["program"])
                    self._reply({"ok": ok})
                else:
                    self._reply({"error": "not found"}, 404)

        self.httpd = http.server.ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]

    def _run_job(self, job_id: str, req: dict):
        try:
            proof = self.client.prove(
                req["pk"], req["program"], req.get("stdin"),
                shard_size=req.get("shard_size", 1 << 20),
                mode=req.get("mode", "core"),
            )
            self.jobs[job_id]["result"] = proof
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
    GetStatus polling)."""

    def __init__(self, endpoint: str):
        assert endpoint.startswith("http://"), "endpoint must be http://host:port"
        self.host = endpoint[len("http://") :]

    def _call(self, method: str, path: str, payload=None):
        conn = http.client.HTTPConnection(self.host, timeout=600)
        body = pickle.dumps(payload) if payload is not None else None
        conn.request(method, path, body=body)
        resp = conn.getresponse()
        data = pickle.loads(resp.read())
        conn.close()
        if resp.status != 200:
            raise RuntimeError(f"prover service error: {data}")
        return data

    def ready(self) -> bool:
        return bool(self._call("GET", "/ready").get("ready"))

    def setup(self, program):
        out = self._call("POST", "/setup", {"program": program})
        return out["pk"], out["vk"]

    def prove(self, pk, program, stdin=None, shard_size: int = 1 << 20, mode: str = "core", poll_interval: float = 1.0):
        import time

        job = self._call("POST", "/prove", {
            "pk": pk, "program": program, "stdin": stdin,
            "shard_size": shard_size, "mode": mode,
        })["job_id"]
        while True:
            st = self._call("GET", f"/status/{job}")
            if st.get("state") == "done":
                return st["result"]
            if st.get("state") == "failed":
                raise RuntimeError(f"remote prove failed: {st.get('error')}")
            time.sleep(poll_interval)

    def verify(self, vk, proof, program) -> bool:
        return bool(self._call("POST", "/verify", {"vk": vk, "proof": proof, "program": program})["ok"])
