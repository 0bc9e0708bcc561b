"""Streaming ASR server:
``python -m rnnt_tpu.cli.serve <checkpoint_dir> [--port 8000] [--slots 8]``.

The serving-path equivalent of the reference's browser demo
(reference rnnt-js/index.js: mic chunks → streaming encoder with explicit
state → incremental decode → live transcript), upgraded to multi-client
continuous batching: all sessions share ONE StreamingSessionPool, so
concurrent callers are decoded together in padded sub-batches on the
device instead of serializing one jit program per client.  Clients stream
16 kHz mono PCM over plain HTTP:

    POST /session                         -> {"session": id}
    POST /feed/<id>   (body: int16 PCM)   -> {"new_tokens": [...], "text": str}
    GET  /text/<id>                       -> {"text": str}
    GET  /stats                           -> device-step latency p50/p99,
                                             batching occupancy, token count
    DELETE /session/<id>                  -> {"text": str}   (flushes tail)

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
    ap.add_argument("--slots", type=int, default=8,
                    help="max concurrent sessions batched on the device")
    ap.add_argument("--chunk-seconds", type=float, default=0.2)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from rnnt_tpu.config.config import (
        build_featurizer_spec, build_model_spec, load_config)
    from rnnt_tpu.decode.streaming import StreamingSessionPool
    from rnnt_tpu.train import checkpoint as ckpt
    from rnnt_tpu.train.loop import _load_tokenizer

    cfg_path = args.config or ckpt.find_config(args.checkpoint)
    cfg = load_config(cfg_path)
    spec = build_model_spec(cfg)
    fspec = build_featurizer_spec(cfg)
    tokenizer = _load_tokenizer(cfg)
    restored = ckpt.restore_checkpoint(args.checkpoint)
    params, model_state = restored["params"], restored["model_state"]

    pool = StreamingSessionPool(params, model_state, spec, fspec,
                                slots=args.slots,
                                chunk_seconds=args.chunk_seconds)
    sessions: dict[str, int] = {}  # public id -> pool slot
    lock = threading.Lock()  # device work serializes; batching happens in pump

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
                with lock:
                    try:
                        slot = pool.open()
                    except RuntimeError:
                        self._json(503, {"error": "all slots in use"})
                        return
                    sid = uuid.uuid4().hex[:12]
                    sessions[sid] = slot
                self._json(200, {"session": sid})
                return
            if self.path.startswith("/feed/"):
                sid = self.path.split("/feed/", 1)[1]
                slot = sessions.get(sid)
                if slot is None:
                    self._json(404, {"error": "unknown session"})
                    return
                n = int(self.headers.get("Content-Length", 0))
                pcm = np.frombuffer(self.rfile.read(n), dtype=np.int16)
                audio = pcm.astype(np.float32) / 32768.0
                with lock:
                    pool.feed(slot, audio)
                    new = pool.pump().get(slot, [])
                    text = tokenizer.decode(pool.tokens(slot))
                self._json(200, {"new_tokens": new, "text": text})
                return
            self._json(404, {"error": "unknown endpoint"})

        def do_GET(self):
            if self.path == "/stats":
                with lock:
                    self._json(200, pool.stats())
                return
            if self.path.startswith("/text/"):
                sid = self.path.split("/text/", 1)[1]
                slot = sessions.get(sid)
                if slot is None:
                    self._json(404, {"error": "unknown session"})
                    return
                with lock:
                    text = tokenizer.decode(pool.tokens(slot))
                self._json(200, {"text": text})
                return
            self._json(404, {"error": "unknown endpoint"})

        def do_DELETE(self):
            if self.path.startswith("/session/"):
                sid = self.path.split("/session/", 1)[1]
                slot = sessions.pop(sid, None)
                if slot is None:
                    self._json(200, {})
                    return
                with lock:
                    pool.flush(slot)
                    pool.pump()
                    text = tokenizer.decode(pool.tokens(slot))
                    pool.close(slot)
                self._json(200, {"text": text})
                return
            self._json(404, {"error": "unknown endpoint"})

        def log_message(self, fmt, *a):  # quiet
            pass

    server = ThreadingHTTPServer((args.host, args.port), Handler)
    print(f"serving on http://{args.host}:{args.port} "
          f"(model {cfg.model_name}, {fspec.num_bins}-bin featurizer, "
          f"{args.slots} batched slots)")
    server.serve_forever()


if __name__ == "__main__":
    main()
