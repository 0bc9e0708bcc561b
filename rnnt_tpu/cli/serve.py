"""Streaming ASR server:
``python -m rnnt_tpu.cli.serve <checkpoint_dir> [--port 8000]``.

The serving-path equivalent of the reference's browser demo
(reference rnnt-js/index.js: mic chunks → streaming encoder with explicit
state → incremental decode → live transcript).  Here the runtime is the
on-device StreamingSession; clients stream 16 kHz mono PCM over plain
HTTP:

    POST /session                         -> {"session": id}
    POST /feed/<id>   (body: int16 PCM)   -> {"new_tokens": [...], "text": str}
    GET  /text/<id>                       -> {"text": str}
    DELETE /session/<id>                  -> {}

Each feed returns incrementally emitted tokens; all stream state (conv
carries, predictor decode state) stays on the device between requests.
"""

from __future__ import annotations

import argparse
import json
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("checkpoint")
    ap.add_argument("--config", default=None)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from rnnt_tpu.config.config import (
        build_featurizer_spec, build_model_spec, load_config)
    from rnnt_tpu.decode.streaming import StreamingSession
    from rnnt_tpu.train import checkpoint as ckpt
    from rnnt_tpu.train.loop import _load_tokenizer

    cfg_path = args.config or ckpt.find_config(args.checkpoint)
    cfg = load_config(cfg_path)
    spec = build_model_spec(cfg)
    fspec = build_featurizer_spec(cfg)
    tokenizer = _load_tokenizer(cfg)
    restored = ckpt.restore_checkpoint(args.checkpoint)
    params, model_state = restored["params"], restored["model_state"]

    sessions: dict[str, StreamingSession] = {}
    lock = threading.Lock()  # decode requests serialize onto the device

    class Handler(BaseHTTPRequestHandler):
        def _json(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            if self.path == "/session":
                sid = uuid.uuid4().hex[:12]
                with lock:
                    sessions[sid] = StreamingSession(
                        params, model_state, spec, fspec)
                self._json(200, {"session": sid})
                return
            if self.path.startswith("/feed/"):
                sid = self.path.split("/feed/", 1)[1]
                session = sessions.get(sid)
                if session is None:
                    self._json(404, {"error": "unknown session"})
                    return
                n = int(self.headers.get("Content-Length", 0))
                pcm = np.frombuffer(self.rfile.read(n), dtype=np.int16)
                audio = pcm.astype(np.float32) / 32768.0
                with lock:
                    new = session.feed(audio)[0]
                    text = tokenizer.decode(session.tokens())
                self._json(200, {"new_tokens": new, "text": text})
                return
            self._json(404, {"error": "unknown endpoint"})

        def do_GET(self):
            if self.path.startswith("/text/"):
                sid = self.path.split("/text/", 1)[1]
                session = sessions.get(sid)
                if session is None:
                    self._json(404, {"error": "unknown session"})
                    return
                with lock:
                    text = tokenizer.decode(session.tokens())
                self._json(200, {"text": text})
                return
            self._json(404, {"error": "unknown endpoint"})

        def do_DELETE(self):
            if self.path.startswith("/session/"):
                sid = self.path.split("/session/", 1)[1]
                with lock:
                    sessions.pop(sid, None)
                self._json(200, {})
                return
            self._json(404, {"error": "unknown endpoint"})

        def log_message(self, fmt, *a):  # quiet
            pass

    server = ThreadingHTTPServer((args.host, args.port), Handler)
    print(f"serving on http://{args.host}:{args.port} "
          f"(model {cfg.model_name}, {fspec.num_bins}-bin featurizer)")
    server.serve_forever()


if __name__ == "__main__":
    main()
