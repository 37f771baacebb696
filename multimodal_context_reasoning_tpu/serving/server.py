"""Minimal HTTP scoring server (stdlib-only).

POST /score  — body: {"examples": [{"example_id", "img_id", "premise",
               "answer_choices": [4 strings]}, ...]}
               → {"results": [{"example_id", "prediction", "logits",
               "probs"}, ...]}
GET  /healthz — liveness.

Requests are scored through the AOT-compiled :class:`ModCRScorer`; the
threading server accepts concurrent connections while device calls
serialize on a lock (one compiled program, one device stream).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from multimodal_context_reasoning_tpu.data.schemas import RawExample
from multimodal_context_reasoning_tpu.serving.scorer import ModCRScorer


def _make_handler(scorer: ModCRScorer, lock: threading.Lock):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def _reply(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"status": "ok"})
            else:
                self._reply(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/score":
                self._reply(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(length) or b"{}")
                raw = payload.get("examples", [])
                if not raw:
                    self._reply(400, {"error": "no examples"})
                    return
                examples = [
                    RawExample(
                        example_id=str(d.get("example_id", i)),
                        img_id=str(d["img_id"]),
                        premise=d["premise"],
                        answer_choices=list(d["answer_choices"]),
                        answer_label=None,
                    )
                    for i, d in enumerate(raw)
                ]
                with lock:
                    results = scorer.score(examples)
                self._reply(200, {"results": results})
            except KeyError as e:
                self._reply(400, {"error": f"missing field {e}"})
            except Exception as e:  # surface, don't crash the server
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def serve(
    scorer: ModCRScorer,
    host: str = "127.0.0.1",
    port: int = 8477,
    *,
    block: bool = True,
) -> Optional[ThreadingHTTPServer]:
    lock = threading.Lock()
    server = ThreadingHTTPServer((host, port), _make_handler(scorer, lock))
    if block:
        server.serve_forever()
        return None
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server
