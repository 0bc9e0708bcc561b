"""Beam-search transducer decode as a jitted, batched, fixed-shape loop.

The reference has greedy decode only (reference rnnt/model.py:45-139);
beam search (width 8-16) is the BASELINE.json config-#4 capability.

TPU-native design: frame-synchronous beam with a bounded number of
expansion rounds per frame (the beam analog of the reference's
``max_outputs_per_step`` cap, rnnt/model.py:59).  All hypothesis state —
token buffers, scores, predictor state — lives in fixed-shape
(B, K, ...) device arrays; every round scores a (B, K, V) candidate pool,
takes a global top-K with `lax.top_k`, and gathers beam state by parent
index.  Under pjit, per-beam state shards with the batch axis, so
multi-chip beam decode exchanges hypotheses through the same XLA
collectives as any other sharded computation.

Path merging: hypotheses with identical label histories arriving by
different alignment paths are score-merged (log-sum-exp) at every frame
boundary.  Merging there is exact: after the final (blank-forced)
expansion round every live hypothesis has consumed frame t, so equal
label histories imply equal predictor state and the merge is the
textbook transducer path-sum — done with fixed shapes as a (K, K)
equality matrix over the token buffers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from rnnt_tpu.decode.greedy import _make_predictor_stepper
from rnnt_tpu.models.joint import joint_single

_NEG = -1e30


class _BeamState(NamedTuple):
    tokens: jax.Array     # (B, K, L)
    n: jax.Array          # (B, K)
    score: jax.Array      # (B, K)
    pred_feat: jax.Array  # (B*K, D)
    pred_state: tuple     # leaves (B*K, ...)


def merge_duplicate_scores(tokens: jax.Array, n: jax.Array,
                           score: jax.Array) -> jax.Array:
    """Log-sum-exp scores of beam lanes holding identical label histories.

    tokens (B, K, L) blank-padded, n (B, K) emission counts, score (B, K).
    Returns new scores: the lowest-indexed lane of each duplicate group
    carries the merged score; the other members drop to log-zero (they
    fall out of the beam at the next top-k).  Token buffers are
    blank-padded past ``n``, so whole-buffer equality plus equal ``n``
    identifies equal histories exactly.
    """
    K = score.shape[1]
    eq = jnp.all(tokens[:, :, None, :] == tokens[:, None, :, :], axis=-1)
    eq &= n[:, :, None] == n[:, None, :]
    live = score > _NEG / 2
    eq &= live[:, :, None] & live[:, None, :]
    first = jnp.argmax(eq, axis=-1)  # lowest dup index (eq[i,i] for live i)
    is_canon = (first == jnp.arange(K)[None, :]) & live
    contrib = jnp.where(eq, score[:, None, :], _NEG)
    merged = jax.nn.logsumexp(contrib, axis=-1)
    return jnp.where(is_canon, merged, jnp.where(live, _NEG, score))


def beam_decode(params, audio: jax.Array, t_lens: jax.Array,
                predictor_spec, joint_spec, *, beam_width: int = 8,
                max_tokens: int = 200, expansions_per_frame: int = 3,
                length_norm: bool = True, merge_paths: bool = True):
    """Batched beam decode over encoder output.

    params: {"predictor", "joint"}; audio (B, T, H); t_lens (B,).
    Returns (tokens (B, max_tokens) int32, counts (B,) int32,
    scores (B,) f32) for the best hypothesis per utterance
    (length-normalized comparison when ``length_norm``).
    """
    B, T, _ = audio.shape
    K = beam_width
    V = joint_spec.num_classes
    blank = joint_spec.blank_idx

    feat0, pstate0, pred_step = _make_predictor_stepper(
        params["predictor"], predictor_spec, blank, B * K)

    init = _BeamState(
        tokens=jnp.full((B, K, max_tokens), blank, jnp.int32),
        n=jnp.zeros((B, K), jnp.int32),
        score=jnp.concatenate(
            [jnp.zeros((B, 1)), jnp.full((B, K - 1), _NEG)], axis=1),
        pred_feat=feat0,
        pred_state=pstate0,
    )
    t_lens = t_lens.astype(jnp.int32)
    b_idx = jnp.arange(B)[:, None]

    def gather_beams(x, parent):
        """x: (B*K, ...) -> gathered by parent (B, K) -> (B*K, ...)."""
        xk = x.reshape((B, K) + x.shape[1:])
        out = jnp.take_along_axis(
            xk, parent.reshape((B, K) + (1,) * (x.ndim - 1)), axis=1)
        return out.reshape((B * K,) + x.shape[1:])

    def expansion_round(carry, allow_emit: bool, frame):
        state, expanding = carry
        lp = jax.nn.log_softmax(
            joint_single(params["joint"], frame, state.pred_feat)
            .astype(jnp.float32), axis=-1).reshape(B, K, V)

        stay = jnp.where(expanding, state.score + lp[..., blank], state.score)
        if allow_emit:
            emit = jnp.where(expanding[..., None], state.score[..., None] + lp,
                             _NEG)
            emit = emit.at[..., blank].set(_NEG)
            # No emissions past the token buffer.
            emit = jnp.where((state.n < max_tokens)[..., None], emit, _NEG)
            pool = jnp.concatenate([stay, emit.reshape(B, K * V)], axis=1)
        else:
            pool = stay

        top_score, top_idx = lax.top_k(pool, K)  # (B, K)
        is_emit = top_idx >= K
        parent = jnp.where(is_emit, (top_idx - K) // V, top_idx)
        token = jnp.where(is_emit, (top_idx - K) % V, blank).astype(jnp.int32)

        tokens = jnp.take_along_axis(state.tokens, parent[..., None], axis=1)
        n = jnp.take_along_axis(state.n, parent, axis=1)
        slot = jnp.clip(n, 0, max_tokens - 1)
        cur = jnp.take_along_axis(tokens, slot[..., None], axis=2)[..., 0]
        new_col = jnp.where(is_emit, token, cur)
        tokens = tokens.at[b_idx, jnp.arange(K)[None, :], slot].set(new_col)
        n = jnp.where(is_emit, n + 1, n)

        pred_feat = gather_beams(state.pred_feat, parent)
        pred_state = jax.tree.map(lambda x: gather_beams(x, parent),
                                  state.pred_state)
        if allow_emit:
            stepped_feat, stepped_state = pred_step(pred_state,
                                                    token.reshape(B * K))
            emit_flat = is_emit.reshape(B * K)
            pred_feat = jnp.where(emit_flat[:, None], stepped_feat, pred_feat)
            pred_state = jax.tree.map(
                lambda new, old: jnp.where(
                    emit_flat.reshape((B * K,) + (1,) * (new.ndim - 1)),
                    new, old),
                stepped_state, pred_state)

        new_state = _BeamState(tokens, n, top_score, pred_feat, pred_state)
        return new_state, is_emit

    def frame_body(t, state: _BeamState) -> _BeamState:
        active = t < t_lens  # (B,)
        frame_b = lax.dynamic_index_in_dim(
            audio, jnp.clip(t, 0, T - 1), axis=1, keepdims=False)  # (B, H)
        frame = jnp.repeat(frame_b, K, axis=0)  # (B*K, H)

        expanding = jnp.ones((B, K), bool)
        new_state = state
        for r in range(expansions_per_frame + 1):
            allow = r < expansions_per_frame
            new_state, expanding = expansion_round(
                (new_state, expanding), allow, frame)

        if merge_paths:
            new_state = new_state._replace(score=merge_duplicate_scores(
                new_state.tokens, new_state.n, new_state.score))

        # Freeze lanes whose audio is exhausted.
        def sel(new, old):
            mask = active.reshape((B,) + (1,) * (new.ndim - 1)) \
                if new.shape[0] == B else \
                jnp.repeat(active, K).reshape((B * K,) + (1,) * (new.ndim - 1))
            return jnp.where(mask, new, old)

        return _BeamState(
            sel(new_state.tokens, state.tokens),
            sel(new_state.n, state.n),
            sel(new_state.score, state.score),
            sel(new_state.pred_feat, state.pred_feat),
            jax.tree.map(sel, new_state.pred_state, state.pred_state),
        )

    final = lax.fori_loop(0, T, frame_body, init)

    if length_norm:
        ranked = final.score / jnp.maximum(final.n, 1).astype(jnp.float32)
    else:
        ranked = final.score
    best = jnp.argmax(ranked, axis=1)  # (B,)
    tokens = jnp.take_along_axis(final.tokens, best[:, None, None], axis=1)[:, 0]
    counts = jnp.take_along_axis(final.n, best[:, None], axis=1)[:, 0]
    scores = jnp.take_along_axis(final.score, best[:, None], axis=1)[:, 0]
    return tokens, counts, scores
