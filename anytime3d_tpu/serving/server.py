"""HTTP serving endpoint: exported StableHLO program + micro-batching.

The reference has no serving story at all (inference = rerunning the
training scripts, test_modelnet_3D.py). This module turns a serialized
serving program (serving/export.py) into a production-shaped endpoint:

- one compiled fixed-shape program on the device, weights baked in;
- MicroBatcher coalesces concurrent requests into that shape;
- packed voxel IO (1 bit/voxel base64 in the JSON body) so the transport
  and host<->device transfers stay 32x below float grids.

Protocol (JSON over HTTP, stdlib-only on both ends):

  POST /infer   {"voxels_packed_b64": <base64 of N/8 uint8 bit-packed
                 occupancy>, "mask": [z_cat floats, optional]}
            ->  {"category": int, "z_mean": [...], "z_log_var": [...],
                 "pred_packed_b64": <base64 bits>}  (fields per program)
  GET  /healthz ->  {"ok": true, "batches_run": int}

Start:  python -m anytime3d_tpu.cli.serve --artifact model.stablehlo \
            --item-bytes 32768 --mask-dim 64 --port 8731
"""

from __future__ import annotations

import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from anytime3d_tpu.serving.batcher import MicroBatcher
from anytime3d_tpu.serving.export import load_infer


class InferenceServer:
    """Owns the deserialized program and the batcher; serves over HTTP."""

    def __init__(
        self,
        artifact: bytes,
        item_shape,
        mask_dim: int,
        batch_size: int = 8,
        max_wait_s: float = 0.002,
        input_dtype=np.uint8,
    ):
        self._fn = load_infer(artifact)
        self.batcher = MicroBatcher(
            self._fn,
            batch_size=batch_size,
            input_shape=tuple(item_shape),
            mask_dim=mask_dim,
            max_wait_s=max_wait_s,
            input_dtype=input_dtype,
        )
        self._item_shape = tuple(item_shape)
        self._mask_dim = mask_dim
        self._dtype = input_dtype
        self._httpd: Optional[ThreadingHTTPServer] = None

    # ---- request handling ------------------------------------------------
    def infer_one(self, body: dict) -> dict:
        if "voxels_packed_b64" in body:
            x = np.frombuffer(
                base64.b64decode(body["voxels_packed_b64"]), np.uint8
            )
        else:
            if self._dtype == np.uint8:
                # Packed-IO server: casting a float occupancy grid to uint8
                # would silently truncate [0,1] values to all-zeros and
                # return a confident wrong prediction. Fail the request.
                raise ValueError(
                    "this server takes packed-bit input: send "
                    "'voxels_packed_b64' (np.packbits of the boolean grid), "
                    "not raw 'input' floats"
                )
            x = np.asarray(body["input"], np.float32)
        x = x.reshape(self._item_shape).astype(self._dtype)
        mask = (
            np.asarray(body["mask"], np.float32)
            if body.get("mask") is not None
            else None
        )
        out = self.batcher.submit(x, mask).result(timeout=300)
        resp = {}
        for k, v in out.items():
            v = np.asarray(v)
            if k.endswith("_packed"):
                resp[k + "_b64"] = base64.b64encode(v.tobytes()).decode()
            elif v.ndim == 0:
                resp[k] = v.item()
            elif v.size <= 4096:
                resp[k] = v.tolist()
            else:  # large float grids ride base64 of their raw bytes
                resp[k + "_f32_b64"] = base64.b64encode(
                    v.astype(np.float32).tobytes()
                ).decode()
        return resp

    # ---- HTTP plumbing ---------------------------------------------------
    def make_handler(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code: int, payload: dict):
                data = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                if self.path == "/healthz":
                    self._send(
                        200, {"ok": True, "batches_run": server.batcher.batches_run}
                    )
                else:
                    self._send(404, {"error": "not found"})

            def do_POST(self):
                if self.path != "/infer":
                    self._send(404, {"error": "not found"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    body = json.loads(self.rfile.read(n) or b"{}")
                    self._send(200, server.infer_one(body))
                except Exception as e:  # noqa: BLE001 — surface to client
                    self._send(400, {"error": repr(e)})

        return Handler

    def serve(self, port: int, background: bool = False, host: str = "127.0.0.1") -> int:
        """Bind and serve; returns the bound port (0 = ephemeral).

        Binds loopback by default — the endpoint is unauthenticated; pass
        ``host='0.0.0.0'`` (cli/serve ``--host``) for deliberate exposure."""
        self._httpd = ThreadingHTTPServer((host, port), self.make_handler())
        bound = self._httpd.server_address[1]
        if background:
            t = threading.Thread(target=self._httpd.serve_forever, daemon=True)
            t.start()
        else:
            self._httpd.serve_forever()
        return bound

    def close(self):
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
        self.batcher.close()
