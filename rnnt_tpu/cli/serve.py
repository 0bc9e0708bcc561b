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

Mic-rate ingest: /feed accepts a ``X-Sample-Rate`` header (or ``?rate=``
query); non-16 kHz audio is polyphase-decimated on the host — the
reference's AudioWorklet downsamples 48 kHz by taking every 3rd sample
(rnnt-js/audio-processor.js:12-19); here an anti-aliasing filter is applied.

Batching: a background pump thread owns all device work.  Feeds only
buffer samples and wake the pump; concurrent callers' chunks land in ONE
padded sub-batch device step (the round-1 design pumped inside the feed
handler under the global lock, so cross-client batching happened only by
accident).
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
    ap.add_argument("checkpoint",
                    help="checkpoint dir, or an export-bundle dir with "
                         "--bundle")
    ap.add_argument("--bundle", action="store_true",
                    help="serve from an export bundle (StableHLO graphs + "
                         "manifest ONLY — no model code; runtime/bundle.py)"
                    )
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

    if args.bundle:
        from rnnt_tpu.runtime.bundle import BundleRuntime

        runtime = BundleServerRuntime(BundleRuntime(args.checkpoint),
                                      slots=args.slots)
        server = ThreadingHTTPServer((args.host, args.port),
                                     make_handler(runtime))
        print(f"serving on http://{args.host}:{args.port} "
              f"(export bundle {args.checkpoint}, {args.slots} sessions)")
        try:
            server.serve_forever()
        finally:
            runtime.stop()
        return

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
    runtime = ServerRuntime(pool, tokenizer)
    server = ThreadingHTTPServer((args.host, args.port),
                                 make_handler(runtime))
    print(f"serving on http://{args.host}:{args.port} "
          f"(model {cfg.model_name}, {fspec.num_bins}-bin featurizer, "
          f"{args.slots} batched slots, background pump)")
    try:
        server.serve_forever()
    finally:
        runtime.stop()


class ServerRuntime:
    """Sessions + the background pump thread that owns all device work.

    Feed handlers only buffer samples and wait on a condition until the
    pump has consumed every full chunk for their slot; the pump batches all
    concurrently buffered slots into one device step."""

    def __init__(self, pool, tokenizer):
        self.pool = pool
        self.tokenizer = tokenizer
        self.sessions: dict[str, int] = {}  # public id -> pool slot
        self.cond = threading.Condition()
        self._stop = False
        self._thread = threading.Thread(target=self._pump_loop, daemon=True)
        self._thread.start()

    # ----- pump thread -----

    def _pump_loop(self):
        while True:
            with self.cond:
                self.cond.wait_for(
                    lambda: self._stop or self.pool.has_ready())
                if self._stop:
                    return
                self.pool.pump()
                self.cond.notify_all()

    def stop(self):
        with self.cond:
            self._stop = True
            self.cond.notify_all()
        self._thread.join(timeout=5)

    # ----- request-side operations (each takes the condition lock) -----

    def open(self) -> str:
        with self.cond:
            slot = self.pool.open()  # raises RuntimeError when full
            sid = uuid.uuid4().hex[:12]
            self.sessions[sid] = slot
            return sid

    def feed(self, sid: str, audio, timeout: float = 30.0):
        """Buffer, wake the pump, wait until this slot's full chunks are
        consumed; returns (new_tokens, text) or None for unknown session."""
        with self.cond:
            slot = self.sessions.get(sid)
            if slot is None:
                return None
            mark = len(self.pool.tokens(slot))
            self.pool.feed(slot, audio)
            self.cond.notify_all()
            self.cond.wait_for(
                lambda: not self.pool.slot_ready(slot), timeout=timeout)
            toks = self.pool.tokens(slot)
            return toks[mark:], self.tokenizer.decode(toks)

    def text(self, sid: str):
        with self.cond:
            slot = self.sessions.get(sid)
            if slot is None:
                return None
            return self.tokenizer.decode(self.pool.tokens(slot))

    def delete(self, sid: str):
        """Flush the tail, wait for its decode, close the slot."""
        with self.cond:
            slot = self.sessions.pop(sid, None)
            if slot is None:
                return ""
            self.pool.flush(slot)
            self.cond.notify_all()
            self.cond.wait_for(
                lambda: not self.pool.slot_ready(slot), timeout=30.0)
            out = self.tokenizer.decode(self.pool.tokens(slot))
            self.pool.close(slot)
            return out

    def stats(self):
        with self.cond:
            return self.pool.stats()


class BundleServerRuntime:
    """serve --bundle: per-session BundleStream driven synchronously from
    the request threads (one device program per graph call; the pooled
    continuous-batching path needs the live model and stays checkpoint-
    based).  Duck-types ServerRuntime for make_handler."""

    def __init__(self, bundle_runtime, slots: int = 8):
        self.rt = bundle_runtime
        self.slots = slots
        self.lock = threading.Lock()
        self.sessions: dict[str, object] = {}
        self._fed_samples = 0

    def open(self) -> str:
        with self.lock:
            if len(self.sessions) >= self.slots:
                raise RuntimeError("all slots in use")
            sid = uuid.uuid4().hex[:12]
            self.sessions[sid] = self.rt.open_stream()
            return sid

    def feed(self, sid: str, audio):
        with self.lock:
            stream = self.sessions.get(sid)
            if stream is None:
                return None
            self._fed_samples += len(audio)
            new = stream.feed(audio)
            return list(new), stream.text()

    def text(self, sid: str):
        with self.lock:
            stream = self.sessions.get(sid)
            return None if stream is None else stream.text()

    def delete(self, sid: str):
        with self.lock:
            stream = self.sessions.pop(sid, None)
            if stream is None:
                return ""
            stream.flush()
            return stream.text()

    def stats(self):
        with self.lock:
            return {"sessions": len(self.sessions),
                    "fed_samples": self._fed_samples,
                    "mode": "bundle"}

    def stop(self):
        pass


def resample_to_16k(audio: np.ndarray, rate: int) -> np.ndarray:
    """Host-side mic-rate ingest (reference rnnt-js/audio-processor.js:12-19
    decimates 48 kHz by taking every 3rd sample; this applies a polyphase
    anti-aliasing filter instead)."""
    if rate == 16000:
        return audio
    from rnnt_tpu.data.augment import _resample

    return _resample(audio, rate / 16000.0)


def make_handler(runtime: ServerRuntime):
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
                try:
                    sid = runtime.open()
                except RuntimeError:
                    self._json(503, {"error": "all slots in use"})
                    return
                self._json(200, {"session": sid})
                return
            if self.path.startswith("/feed/"):
                sid = self.path.split("/feed/", 1)[1].split("?")[0]
                n = int(self.headers.get("Content-Length", 0))
                pcm = np.frombuffer(self.rfile.read(n), dtype=np.int16)
                audio = pcm.astype(np.float32) / 32768.0
                rate = int(self.headers.get("X-Sample-Rate", "16000"))
                if "?rate=" in self.path:
                    rate = int(self.path.split("?rate=", 1)[1])
                if rate != 16000:
                    audio = resample_to_16k(audio, rate)
                res = runtime.feed(sid, audio)
                if res is None:
                    self._json(404, {"error": "unknown session"})
                    return
                new, text = res
                self._json(200, {"new_tokens": new, "text": text})
                return
            self._json(404, {"error": "unknown endpoint"})

        def do_GET(self):
            if self.path == "/stats":
                self._json(200, runtime.stats())
                return
            if self.path.startswith("/text/"):
                sid = self.path.split("/text/", 1)[1]
                text = runtime.text(sid)
                if text is None:
                    self._json(404, {"error": "unknown session"})
                    return
                self._json(200, {"text": text})
                return
            self._json(404, {"error": "unknown endpoint"})

        def do_DELETE(self):
            if self.path.startswith("/session/"):
                sid = self.path.split("/session/", 1)[1]
                self._json(200, {"text": runtime.delete(sid)})
                return
            self._json(404, {"error": "unknown endpoint"})

        def log_message(self, fmt, *a):  # quiet
            pass

    return Handler


if __name__ == "__main__":
    main()
