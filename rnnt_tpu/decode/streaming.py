"""Streaming inference runtime: constant-memory, chunk-in → tokens-out.

Capability parity with the reference's browser streaming stack (reference
rnnt-js/index.js:120-230): chunked featurizer with a win−hop sample overlap
(rnnt-js/featurizer.js:79-107), streaming encoder threading per-conv carry
states (rnnt/jasper.py:141-157, rnnt-js/index.js:152-214), and incremental
greedy decode persisting predictor state across chunks
(rnnt-js/decoder.js:57-100).

TPU-native design: all stream state — conv carries, predictor decode state
— is a pytree of device arrays that never leaves the device between chunks;
the featurizer chunk, encoder chunk, and decode chunk are each jitted once
per chunk shape.  Batched sessions decode many independent streams in
lockstep (continuous batching), which the browser runtime cannot do.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from rnnt_tpu.decode.greedy import decode_init_carry, greedy_decode_incremental
from rnnt_tpu.models.encoder import (
    encoder_streaming_apply,
    encoder_streaming_init_state,
)
from rnnt_tpu.models.rnnt import RNNTSpec
from rnnt_tpu.ops.stft import FeaturizerSpec, make_featurizer


class StreamingSession:
    """One (optionally batched) audio stream.

    feed(samples) accepts host float32 samples of any length (for batch > 1:
    (B, n) arrays) and returns the list of newly emitted token ids (batch of
    lists).  tokens() returns everything emitted so far.
    """

    def __init__(self, params, model_state, spec: RNNTSpec,
                 fspec: FeaturizerSpec, *, batch: int = 1,
                 max_tokens_per_chunk: int = 64,
                 max_symbols_per_step: int = 10):
        self.params = params
        self.model_state = model_state
        self.spec = spec
        self.fspec = fspec
        self.batch = batch
        self.max_tokens_per_chunk = max_tokens_per_chunk
        self.max_symbols_per_step = max_symbols_per_step

        self._featurize = jax.jit(make_featurizer(fspec))
        self._buffer = np.zeros((batch, 0), np.float32)
        self.conv_states = encoder_streaming_init_state(batch, spec.encoder)
        self.decode_carry = decode_init_carry(
            {"predictor": params["predictor"], "joint": params["joint"]},
            spec.predictor, spec.joint, batch)
        self._tokens: list[list[int]] = [[] for _ in range(batch)]
        self.encoder_frames_emitted = 0

        @jax.jit
        def _encode_chunk(params, model_state, feats, conv_states):
            return encoder_streaming_apply(
                params["encoder"], model_state["encoder"], feats, conv_states,
                spec.encoder)

        @jax.jit
        def _decode_chunk(dec_params, enc, t_lens, carry):
            return greedy_decode_incremental(
                dec_params, enc, t_lens, spec.predictor, spec.joint,
                max_tokens=max_tokens_per_chunk,
                max_symbols_per_step=max_symbols_per_step, carry=carry)

        self._encode_chunk = _encode_chunk
        self._decode_chunk = _decode_chunk

    def reset(self):
        self._buffer = np.zeros((self.batch, 0), np.float32)
        self.conv_states = encoder_streaming_init_state(self.batch,
                                                        self.spec.encoder)
        self.decode_carry = decode_init_carry(
            {"predictor": self.params["predictor"],
             "joint": self.params["joint"]},
            self.spec.predictor, self.spec.joint, self.batch)
        self._tokens = [[] for _ in range(self.batch)]
        self.encoder_frames_emitted = 0

    def feed(self, samples: np.ndarray) -> list[list[int]]:
        samples = np.asarray(samples, np.float32)
        if samples.ndim == 1:
            samples = samples[None, :]
        if samples.shape[0] != self.batch:
            raise ValueError(f"expected batch {self.batch}, got {samples.shape[0]}")
        self._buffer = np.concatenate([self._buffer, samples], axis=1)

        n_frames = self.fspec.num_frames(self._buffer.shape[1])
        if n_frames == 0:
            return [[] for _ in range(self.batch)]
        consumed = n_frames * self.fspec.hop_length
        chunk = self._buffer[:, : consumed + self.fspec.overlap]
        self._buffer = self._buffer[:, consumed:]

        feats = self._featurize(chunk)  # (B, n_frames, bins)
        enc, self.conv_states = self._encode_chunk(
            self.params, self.model_state, feats, self.conv_states)
        if enc.shape[1] == 0:
            return [[] for _ in range(self.batch)]
        self.encoder_frames_emitted += enc.shape[1]
        t_lens = jnp.full((self.batch,), enc.shape[1], jnp.int32)
        dec_params = {"predictor": self.params["predictor"],
                      "joint": self.params["joint"]}
        tokens, counts, self.decode_carry = self._decode_chunk(
            dec_params, enc, t_lens, self.decode_carry)
        tokens = np.asarray(tokens)
        counts = np.asarray(counts)
        out = []
        for b in range(self.batch):
            new = list(int(t) for t in tokens[b, : counts[b]])
            self._tokens[b].extend(new)
            out.append(new)
        return out

    def tokens(self, b: int = 0) -> list[int]:
        return self._tokens[b]
