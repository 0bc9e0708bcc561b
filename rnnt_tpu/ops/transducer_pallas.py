"""Pallas fused joint + transducer-lattice kernels (the speed-of-light path).

This replaces the reference's two-step hot path — materialize the
(B, T, U+1, V) joint logits (reference rnnt/joint.py:32-39), then call the
CUDA ``rnnt_loss`` (reference rnnt/model.py:35-41) — with a flash-style
fused kernel: for each (T_tile × U_tile) tile the joint hidden
``tanh(enc_t + pred_u)`` and the V-wide logits exist only in VMEM; the only
lattice-sized arrays ever written to HBM are three (B, T, U+1) scalars
(logsumexp, blank logit, label logit).  The backward pass rematerializes
each tile and accumulates dW/db/dpred in VMEM scratch across grid steps.

The cheap O(T·U) alpha recursion stays in XLA (rnnt_tpu/ops/transducer.py);
autodiff through it supplies exactly the per-cell cotangents the backward
kernel needs — no hand-derived beta pass.

HBM traffic per sample drops from O(T·U·V + T·U·H) to O(T·U + (T+U)·H),
which is the difference between the reference's ``max_joint_size`` OOM
guard (rnnt/train.py:120-130) and running full batches flat out.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rnnt_tpu.ops.transducer import NEG, transducer_alpha_loss

# Tile sizes: rows = T_TILE * U_TILE feed the MXU as (rows, H) @ (H, V).
T_TILE = 16
U_TILE = 8


def _cdiv(a, b):
    return -(-a // b)


def _interpret() -> bool:
    # Interpreter mode lets the same kernels run (slowly) on CPU for tests.
    return jax.default_backend() != "tpu"


# ------------------------------- forward -------------------------------

def _fwd_kernel(enc_ref, pred_ref, w_ref, b_ref, tgt_ref,
                lse_ref, blank_ref, label_ref, *, blank_idx: int):
    """One (1, T_TILE, H) x (1, U_TILE, H) tile -> three (1, T_TILE, U_TILE)
    outputs.  Logits tile lives only in VMEM."""
    enc = enc_ref[0]    # (T_TILE, H)
    pred = pred_ref[0]  # (U_TILE, H)
    h = jnp.tanh(enc[:, None, :] + pred[None, :, :])  # (T_TILE, U_TILE, H)
    rows = h.reshape(T_TILE * U_TILE, -1)
    logits = jnp.dot(rows, w_ref[:], preferred_element_type=jnp.float32)
    logits = logits + b_ref[:].astype(jnp.float32)  # (rows, V)

    m = jnp.max(logits, axis=-1, keepdims=True)
    lse = (m + jnp.log(jnp.sum(jnp.exp(logits - m), axis=-1, keepdims=True)))
    lse_ref[0] = lse.reshape(T_TILE, U_TILE)

    blank_ref[0] = logits[:, blank_idx:blank_idx + 1].reshape(T_TILE, U_TILE)

    V = logits.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, (U_TILE, V), 1)
    tgt_col = jnp.broadcast_to(tgt_ref[:].reshape(U_TILE, 1), (U_TILE, V))
    onehot = (col == tgt_col).astype(jnp.float32)  # (U_TILE, V)
    lg3 = logits.reshape(T_TILE, U_TILE, V)
    label = jnp.sum(lg3 * onehot[None, :, :], axis=-1)
    label_ref[0] = label


def _fwd_pallas(enc, pred, w, b, targets_pad, blank_idx: int):
    """enc (B,T,H), pred (B,U1,H), w (H,V), b (V,), targets_pad (B,U1).
    Returns (lse, blank_logit, label_logit), each (B, T, U1) f32.
    T and U1 must be multiples of the tiles (caller pads)."""
    B, T, H = enc.shape
    U1 = pred.shape[1]
    grid = (B, T // T_TILE, U1 // U_TILE)

    out_shape = [jax.ShapeDtypeStruct((B, T, U1), jnp.float32)] * 3
    out_spec = pl.BlockSpec((1, T_TILE, U_TILE),
                            lambda bb, i, j: (bb, i, j),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, blank_idx=blank_idx),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, T_TILE, H), lambda bb, i, j: (bb, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U_TILE, H), lambda bb, i, j: (bb, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, w.shape[1]), lambda bb, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b.shape[0]), lambda bb, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U_TILE), lambda bb, i, j: (bb, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec, out_spec, out_spec],
        out_shape=out_shape,
        interpret=_interpret(),
    )(enc, pred, w, b[None, :], targets_pad)


# ------------------------------- backward -------------------------------

def _bwd_kernel(enc_ref, pred_ref, w_ref, b_ref, tgt_ref,
                g_blank_ref, g_label_ref, g_lse_ref,
                denc_ref, dpred_ref, dw_ref, db_ref,
                dpred_acc, dw_acc, db_acc, *, blank_idx: int):
    """Rematerialize the tile, form dlogits from the three per-cell
    cotangents, and backpropagate to enc/pred/W/b.

    Accumulation strategy:
      * denc block index ignores j (innermost) -> safe revisited-block
        accumulation in the output buffer.
      * dpred is accumulated in a full-(U1, H) VMEM scratch per batch
        element and flushed to the output on the last i.
      * dW/db accumulate in VMEM scratch across the whole grid and flush on
        the final step.
    """
    bb = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    n_b = pl.num_programs(0)
    n_i = pl.num_programs(1)
    n_j = pl.num_programs(2)

    enc = enc_ref[0]
    pred = pred_ref[0]
    h = jnp.tanh(enc[:, None, :].astype(jnp.float32)
                 + pred[None, :, :].astype(jnp.float32))
    rows = h.reshape(T_TILE * U_TILE, -1)
    logits = jnp.dot(rows.astype(enc.dtype), w_ref[:],
                     preferred_element_type=jnp.float32)
    logits = logits + b_ref[:].astype(jnp.float32)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)  # softmax (rows, V)

    g_blank = g_blank_ref[0].reshape(-1, 1)   # (rows, 1)
    g_label = g_label_ref[0].reshape(-1, 1)
    g_lse = g_lse_ref[0].reshape(-1, 1)

    V = logits.shape[-1]
    col_u = jax.lax.broadcasted_iota(jnp.int32, (U_TILE, V), 1)
    tgt_col = jnp.broadcast_to(tgt_ref[:].reshape(U_TILE, 1), (U_TILE, V))
    onehot_t = (col_u == tgt_col).astype(jnp.float32)  # (U_TILE, V)
    onehot_rows = jnp.broadcast_to(onehot_t[None, :, :],
                                   (T_TILE, U_TILE, V)).reshape(-1, V)
    col_r = jax.lax.broadcasted_iota(jnp.int32, (T_TILE * U_TILE, V), 1)
    onehot_blank = (col_r == blank_idx).astype(jnp.float32)

    dlogits = (g_lse * p + g_blank * onehot_blank + g_label * onehot_rows)

    # d rows (pre-tanh): (rows, H) — contract over V without an explicit
    # transpose (dot_general keeps the MXU layout happy).
    dh = jax.lax.dot_general(
        dlogits.astype(w_ref.dtype), w_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dpre = dh * (1.0 - rows.astype(jnp.float32) ** 2)
    dpre3 = dpre.reshape(T_TILE, U_TILE, -1)

    # denc: sum over u; output block revisited across j -> accumulate.
    denc_tile = jnp.sum(dpre3, axis=1)  # (T_TILE, H)

    @pl.when(j == 0)
    def _():
        denc_ref[0] = jnp.zeros_like(denc_ref[0])

    denc_ref[0] += denc_tile

    # dpred: sum over t; accumulate full (U1, H) per batch in scratch.
    @pl.when((i == 0) & (j == 0))
    def _():
        dpred_acc[:] = jnp.zeros_like(dpred_acc)

    dpred_tile = jnp.sum(dpre3, axis=0)  # (U_TILE, H)
    dpred_acc[pl.ds(j * U_TILE, U_TILE), :] += dpred_tile

    @pl.when((i == n_i - 1) & (j == n_j - 1))
    def _():
        dpred_ref[0] = dpred_acc[:]

    # dW/db: accumulate across the entire grid in scratch; flush last.
    @pl.when((bb == 0) & (i == 0) & (j == 0))
    def _():
        dw_acc[:] = jnp.zeros_like(dw_acc)
        db_acc[:] = jnp.zeros_like(db_acc)

    dw_acc[:] += jax.lax.dot_general(
        rows.astype(jnp.float32), dlogits,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db_acc[:] += jnp.sum(dlogits, axis=0, keepdims=True)

    @pl.when((bb == n_b - 1) & (i == n_i - 1) & (j == n_j - 1))
    def _():
        dw_ref[:] = dw_acc[:]
        db_ref[:] = db_acc[:]


def _bwd_pallas(enc, pred, w, b, targets_pad, g_blank, g_label, g_lse,
                blank_idx: int):
    B, T, H = enc.shape
    U1 = pred.shape[1]
    V = w.shape[1]
    grid = (B, T // T_TILE, U1 // U_TILE)

    g_spec = pl.BlockSpec((1, T_TILE, U_TILE), lambda bb, i, j: (bb, i, j),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, blank_idx=blank_idx),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, T_TILE, H), lambda bb, i, j: (bb, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U_TILE, H), lambda bb, i, j: (bb, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, V), lambda bb, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V), lambda bb, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U_TILE), lambda bb, i, j: (bb, j),
                         memory_space=pltpu.VMEM),
            g_spec, g_spec, g_spec,
        ],
        out_specs=[
            pl.BlockSpec((1, T_TILE, H), lambda bb, i, j: (bb, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U1, H), lambda bb, i, j: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, V), lambda bb, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V), lambda bb, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, H), jnp.float32),
            jax.ShapeDtypeStruct((B, U1, H), jnp.float32),
            jax.ShapeDtypeStruct((H, V), jnp.float32),
            jax.ShapeDtypeStruct((1, V), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((U1, H), jnp.float32),
            pltpu.VMEM((H, V), jnp.float32),
            pltpu.VMEM((1, V), jnp.float32),
        ],
        interpret=_interpret(),
    )(enc, pred, w, b[None, :], targets_pad, g_blank, g_label, g_lse)


# --------------------------- custom_vjp wrapper ---------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_joint_outputs(enc, pred, w, b, targets_pad, blank_idx):
    """(lse, blank_logit, label_logit) over the padded lattice — all
    (B, T, U1) f32.  T % T_TILE == 0 and U1 % U_TILE == 0 required."""
    return _fwd_pallas(enc, pred, w, b, targets_pad, blank_idx)


def _fjo_fwd(enc, pred, w, b, targets_pad, blank_idx):
    outs = _fwd_pallas(enc, pred, w, b, targets_pad, blank_idx)
    return outs, (enc, pred, w, b, targets_pad)


def _fjo_bwd(blank_idx, residuals, gs):
    enc, pred, w, b, targets_pad = residuals
    g_lse, g_blank, g_label = gs
    denc, dpred, dw, db = _bwd_pallas(
        enc, pred, w, b, targets_pad, g_blank, g_label, g_lse, blank_idx)
    return (denc.astype(enc.dtype), dpred.astype(pred.dtype),
            dw.astype(w.dtype), db[0].astype(b.dtype), None)


fused_joint_outputs.defvjp(_fjo_fwd, _fjo_bwd)


# ------------------------------ public loss ------------------------------

def transducer_loss_pallas(joint_params, audio, text, targets, t_lens, u_lens,
                           blank: int, *, reduction: str = "mean"):
    """Fused-joint transducer loss (Pallas fast path).

    Same contract as ``rnnt_tpu.ops.transducer.transducer_loss``; requires
    blank to be the last class.  Pads T/U1 up to tile multiples; the alpha
    recursion and final gather run in XLA on the (B, T, U1) scalars.
    """
    from rnnt_tpu.models.joint import project_sides

    audio, text = project_sides(joint_params, audio, text)
    w = joint_params["out"]["w"]
    b = joint_params["out"]["b"]

    B, T, H = audio.shape
    U1 = text.shape[1]
    T_pad = _cdiv(T, T_TILE) * T_TILE
    U_pad = _cdiv(U1, U_TILE) * U_TILE
    audio_p = jnp.pad(audio, ((0, 0), (0, T_pad - T), (0, 0)))
    text_p = jnp.pad(text, ((0, 0), (0, U_pad - U1), (0, 0)))
    targets_pad = jnp.pad(
        jnp.concatenate([targets, jnp.zeros((B, 1), targets.dtype)], axis=1),
        ((0, 0), (0, U_pad - U1))).astype(jnp.int32)

    lse, blank_logit, label_logit = fused_joint_outputs(
        audio_p, text_p.astype(audio_p.dtype), w.astype(audio_p.dtype),
        b, targets_pad, blank)

    lse = lse[:, :T, :U1]
    lp_blank = blank_logit[:, :T, :U1] - lse
    u_mask = jnp.arange(U1)[None, :] < u_lens[:, None]
    lp_label = jnp.where(u_mask[:, None, :],
                         label_logit[:, :T, :U1] - lse, NEG)

    losses = transducer_alpha_loss(lp_blank, lp_label, t_lens, u_lens)
    if reduction == "mean":
        return jnp.mean(losses)
    if reduction == "sum":
        return jnp.sum(losses)
    return losses
