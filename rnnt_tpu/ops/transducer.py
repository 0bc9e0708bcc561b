"""RNN-T (transducer) loss: forward-backward over the T×U lattice.

Capability parity with ``torchaudio.functional.rnnt_loss`` as used by the
reference (reference rnnt/model.py:35-41: blank = last class, no clamp,
mean reduction) — computed TPU-natively instead of calling a CUDA kernel:

* ``transducer_loss_from_logits`` — reference implementation over full
  (B, T, U+1, V) logits.  Correctness oracle and tiny-model path.
* ``transducer_loss`` — production XLA path: the joint is evaluated in
  T-chunks under ``jax.checkpoint`` so the (B, T, U+1, V) logits and the
  (B, T, U+1, H) lattice are never resident in HBM at once; only the
  (B, T, U+1, 2) blank/label log-probs persist.  This replaces the
  reference's refuse-to-run ``max_joint_size`` batch-halving guard
  (rnnt/train.py:120-130) with a memory-bounded computation.
* the alpha recursion runs as a `lax.scan` over T with a log-semiring
  `associative_scan` over U inside each row — O(T) sequential steps, each a
  vectorized VPU op, instead of a per-cell Python loop.

The fused Pallas lattice kernel (rnnt_tpu/ops/transducer_pallas.py) is the
speed-of-light path; both must agree to tolerance.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

# Large-but-finite "log zero": keeps -inf out of the lattice so that
# (NEG - NEG) arithmetic in logsumexp/backward can't produce NaNs.
NEG = -1e30


def _lse(a, b):
    m = jnp.maximum(a, b)
    # Where both sides are log-zero, keep log-zero without evaluating exp(inf);
    # the tiny floor keeps the backward pass NaN-free (no 0/0) there too.
    m_safe = jnp.where(m <= NEG / 2, 0.0, m)
    s = jnp.exp(a - m_safe) + jnp.exp(b - m_safe)
    # Floor keeps the backward NaN-free when both sides are log-zero (s=0).
    # It must be a *normal* f32 (subnormals flush to zero on TPU/XLA-CPU);
    # it never distorts reachable cells because there s >= exp(0) = 1.
    out = m_safe + jnp.log(s + 1e-30)
    return jnp.where(m <= NEG / 2, NEG, out)


def lattice_log_probs(logits: jax.Array, targets: jax.Array,
                      u_lens: jax.Array, blank: int):
    """Reduce (B, T, U+1, V) logits to the two per-cell numbers the lattice
    recursion needs.

    Returns (lp_blank, lp_label): both (B, T, U+1) float32, where
    ``lp_label[b, t, u]`` is the log-prob of emitting target ``u`` (the
    label leaving lattice column u) and is log-zero for ``u >= u_len``.
    """
    logits = logits.astype(jnp.float32)
    denom = jax.nn.logsumexp(logits, axis=-1)
    lp = logits - denom[..., None]
    lp_blank = lp[..., blank]

    B, _, U1 = lp_blank.shape
    # Targets padded to U+1 with a dummy class for the final column.
    tgt = jnp.concatenate(
        [targets, jnp.zeros((B, 1), dtype=targets.dtype)], axis=1)
    lp_label = jnp.take_along_axis(lp, tgt[:, None, :, None], axis=-1)[..., 0]
    u_mask = jnp.arange(U1)[None, :] < u_lens[:, None]  # (B, U+1)
    lp_label = jnp.where(u_mask[:, None, :], lp_label, NEG)
    return lp_blank, lp_label


def row_scan(c, e_shift):
    """Lattice-row recurrence a[u] = LSE(c[u], a[u-1] + e_shift[u]) as an
    associative scan in the (LSE, +) log semiring: affine map composition
    combine((A1,b1),(A2,b2)) = (A1+A2, LSE(b1+A2, b2)).

    c, e_shift: (B, U).  e_shift[:, 0] must be log-zero (nothing enters
    column 0 from the left).  Shared by the full and the banded (pruned)
    alpha recursions."""
    elems = (e_shift, c)

    def combine(x, y):
        A1, b1 = x
        A2, b2 = y
        return A1 + A2, _lse(b1 + A2, b2)

    _, a = lax.associative_scan(combine, elems, axis=1)
    return a


def shift_right(x, fill):
    """(B, U) -> (B, U): drop the last column, prepend a fill column."""
    B = x.shape[0]
    return jnp.concatenate(
        [jnp.full((B, 1), fill, x.dtype), x[:, :-1]], axis=1)


def transducer_alpha_loss(lp_blank: jax.Array, lp_label: jax.Array,
                          t_lens: jax.Array, u_lens: jax.Array) -> jax.Array:
    """Alpha (forward) recursion over the lattice; returns per-sample
    negative log-likelihood, shape (B,).

    alpha[t, u] = LSE(alpha[t-1, u] + lp_blank[t-1, u],
                      alpha[t, u-1] + lp_label[t, u-1])
    loss = -(alpha[T-1, U] + lp_blank[T-1, U])  at the true (t_len, u_len).
    """
    lp_blank = lp_blank.astype(jnp.float32)
    lp_label = lp_label.astype(jnp.float32)
    B, T, U1 = lp_blank.shape

    # Row 0: alpha[0, u] = cumsum of lp_label[0, :u]; realized with the same
    # scan with c = (0, NEG, NEG, ...).
    c0 = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.float32), jnp.full((B, U1 - 1), NEG)], axis=1)

    def step(alpha_prev, lps):
        lpb_prev, lpl_cur = lps  # lp_blank[t-1], lp_label[t]
        c = alpha_prev + lpb_prev
        alpha = row_scan(c, shift_right(lpl_cur, NEG))
        return alpha, alpha

    alpha0 = row_scan(c0, shift_right(lp_label[:, 0], NEG))
    # Rows 1..T-1 consume lp_blank[t-1] and lp_label[t].
    xs = (jnp.swapaxes(lp_blank[:, :-1], 0, 1),
          jnp.swapaxes(lp_label[:, 1:], 0, 1))
    _, alphas_tail = lax.scan(step, alpha0, xs)
    alphas = jnp.concatenate([alpha0[None], alphas_tail], axis=0)  # (T, B, U+1)
    alphas = jnp.swapaxes(alphas, 0, 1)  # (B, T, U+1)

    b_idx = jnp.arange(B)
    t_last = t_lens - 1
    final_alpha = alphas[b_idx, t_last, u_lens]
    final_blank = lp_blank[b_idx, t_last, u_lens]
    return -(final_alpha + final_blank)


def lattice_nll(lp_blank, lp_label, t_lens, u_lens, mesh=None):
    """Alpha-recursion NLL dispatch: the Pallas lattice kernel on TPU
    (rnnt_tpu/ops/lattice_pallas.py — ~15x faster than the scan), the XLA
    scan elsewhere.  Set RNNT_ALPHA_IMPL=scan to force the scan.

    The kernel op carries its own GSPMD partitioning rule
    (rnnt_tpu/parallel/partition.py): under a sharded jit each device runs
    its batch shard — no mesh threading needed.  Passing a concrete
    ``mesh`` with a "model" axis > 1 instead selects the sequence-parallel
    T-sharded lattice (ops/lattice_tshard.py): per-device O(T/n) lattice
    memory with ICI wavefront exchange, for audio too long for one
    device's HBM share.
    """
    import os

    if mesh is not None and mesh.shape.get("model", 1) > 1:
        from rnnt_tpu.ops.lattice_tshard import transducer_alpha_loss_tsharded

        batch_axis = "data" if mesh.shape.get("data", 1) > 1 else None
        return transducer_alpha_loss_tsharded(
            lp_blank, lp_label, t_lens, u_lens, mesh,
            batch_axis=batch_axis)
    del mesh
    impl = os.environ.get("RNNT_ALPHA_IMPL", "")
    use_pallas = (impl == "pallas"
                  or (jax.default_backend() == "tpu" and impl != "scan"))
    if use_pallas:
        from rnnt_tpu.ops.lattice_pallas import transducer_alpha_loss_fast

        return transducer_alpha_loss_fast(lp_blank, lp_label, t_lens, u_lens)
    return transducer_alpha_loss(lp_blank, lp_label, t_lens, u_lens)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def clamp_grads(x: jax.Array, clamp: float) -> jax.Array:
    """Identity forward; backward clamps the cotangent to [-clamp, clamp].

    The torchaudio rnnt_loss ``clamp`` option (the reference exposes it as
    the ``rnnt_grad_clamp`` hyperparameter tuned by rnnt/optuna.py:13-17,
    though its trainer never actually forwards it — clamp is hardcoded off
    at rnnt/model.py:40).  Applied to the joint logits so d(loss)/d(logits)
    is bounded."""
    return x


def _cg_fwd(x, clamp):
    return x, None


def _cg_bwd(clamp, _, g):
    return (jnp.clip(g, -clamp, clamp),)


clamp_grads.defvjp(_cg_fwd, _cg_bwd)


def transducer_loss_from_logits(logits: jax.Array, targets: jax.Array,
                                t_lens: jax.Array, u_lens: jax.Array,
                                blank: int, reduction: str = "mean",
                                mesh=None, grad_clamp: float = -1.0) -> jax.Array:
    """Loss from full (B, T, U+1, V) logits — the correctness oracle."""
    if grad_clamp > 0:
        logits = clamp_grads(logits, grad_clamp)
    lp_blank, lp_label = lattice_log_probs(logits, targets, u_lens, blank)
    losses = lattice_nll(lp_blank, lp_label, t_lens, u_lens, mesh=mesh)
    if reduction == "mean":
        return jnp.mean(losses)
    if reduction == "sum":
        return jnp.sum(losses)
    return losses


def _joint_chunk_log_probs(joint_params, enc_chunk, text, targets_pad,
                           u_mask, blank, grad_clamp=-1.0):
    """Joint + log-softmax + blank/label gather for a chunk of T frames.

    enc_chunk: (B, Tc, H) already side-projected; text: (B, U+1, H).
    Returns (lp_blank, lp_label): (B, Tc, U+1) float32.  Under
    ``jax.checkpoint`` so backward rematerializes the (B, Tc, U+1, V) logits
    instead of storing them.
    """
    h = jnp.tanh(enc_chunk[:, :, None, :] + text[:, None, :, :])
    w = joint_params["out"]["w"].astype(h.dtype)
    b = joint_params["out"]["b"].astype(jnp.float32)
    logits = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
    logits = logits.astype(jnp.float32)
    if grad_clamp > 0:
        logits = clamp_grads(logits, grad_clamp)
    denom = jax.nn.logsumexp(logits, axis=-1)
    lp_blank = logits[..., blank] - denom
    lp_label = jnp.take_along_axis(
        logits, targets_pad[:, None, :, None], axis=-1)[..., 0] - denom
    lp_label = jnp.where(u_mask[:, None, :], lp_label, NEG)
    return lp_blank, lp_label


@partial(jax.checkpoint, static_argnums=(5, 6))
def _joint_chunk_log_probs_remat(joint_params, enc_chunk, text, targets_pad,
                                 u_mask, blank, grad_clamp=-1.0):
    return _joint_chunk_log_probs(joint_params, enc_chunk, text, targets_pad,
                                  u_mask, blank, grad_clamp)


def transducer_loss(joint_params, audio: jax.Array, text: jax.Array,
                    targets: jax.Array, t_lens: jax.Array, u_lens: jax.Array,
                    blank: int, *, chunk_size: int = 32,
                    reduction: str = "mean", mesh=None,
                    grad_clamp: float = -1.0) -> jax.Array:
    """Memory-bounded fused joint + transducer loss (XLA path).

    audio: (B, T, H) encoder output; text: (B, U+1, H) predictor output
    (blank-prepended targets); targets: (B, U) label ids;
    t_lens/u_lens: valid lengths.  ``blank`` must be the last class for
    parity with the reference convention (rnnt/joint.py:20).

    The joint runs per T-chunk under remat: peak activation memory is
    O(B · chunk · U · V) for one chunk, while only O(B · T · U) blank/label
    log-probs persist for the lattice recursion.
    """
    from rnnt_tpu.models.joint import project_sides

    audio, text = project_sides(joint_params, audio, text)

    B, T, _ = audio.shape
    U1 = text.shape[1]
    targets_pad = jnp.concatenate(
        [targets, jnp.zeros((B, 1), dtype=targets.dtype)], axis=1)
    u_mask = jnp.arange(U1)[None, :] < u_lens[:, None]

    # Pad T to a chunk multiple, then scan chunks.
    n_chunks = -(-T // chunk_size)
    pad_t = n_chunks * chunk_size - T
    audio_p = jnp.pad(audio, ((0, 0), (0, pad_t), (0, 0)))
    chunks = audio_p.reshape(B, n_chunks, chunk_size, -1)

    def body(_, enc_chunk):
        lpb, lpl = _joint_chunk_log_probs_remat(
            joint_params, enc_chunk, text, targets_pad, u_mask, blank,
            grad_clamp)
        return None, (lpb, lpl)

    _, (lpb, lpl) = lax.scan(body, None, jnp.swapaxes(chunks, 0, 1))
    # (n_chunks, B, chunk, U+1) -> (B, T, U+1)
    lp_blank = jnp.moveaxis(lpb, 0, 1).reshape(B, -1, U1)[:, :T]
    lp_label = jnp.moveaxis(lpl, 0, 1).reshape(B, -1, U1)[:, :T]

    losses = lattice_nll(lp_blank, lp_label, t_lens, u_lens, mesh=mesh)
    if reduction == "mean":
        return jnp.mean(losses)
    if reduction == "sum":
        return jnp.sum(losses)
    return losses
