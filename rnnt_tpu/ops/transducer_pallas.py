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

from rnnt_tpu.ops.transducer import NEG, lattice_nll

# Tile sizes: rows = T_TILE * U_TILE feed the MXU as (rows, H) @ (H, V).
# Mosaic requires block shapes whose trailing dims are divisible by (8, 128)
# OR equal to the full array dims.  The U tile exploits the second rule:
# when the padded label axis fits in one tile (U1 <= 128) the lattice is
# tiled (8, round_up(U1, 8)) instead of (8, 128) — at the base config's
# U1 = 65 that skips 44% of the joint matmul work the fixed 128-wide tile
# would burn on padding.
# T tile 16 measured best on v5e (8: +10% step time; 32: backward tile
# overruns the 20 MB scoped-VMEM ceiling).
T_TILE = 16
U_TILE_MAX = 128


def _cdiv(a, b):
    return -(-a // b)


def _pick_u(U1: int) -> tuple[int, int]:
    """(u_tile, u_pad): one full-width tile when U1 fits, else 128-tiles."""
    if U1 <= U_TILE_MAX:
        u_pad = _cdiv(U1, 8) * 8
        return u_pad, u_pad
    u_pad = _cdiv(U1, U_TILE_MAX) * U_TILE_MAX
    return U_TILE_MAX, u_pad


def _interpret() -> bool:
    # Interpreter mode lets the same kernels run (slowly) on CPU for tests.
    return jax.default_backend() != "tpu"


# ------------------------------- forward -------------------------------

def _fwd_kernel(enc_ref, pred_ref, w_ref, b_ref, onehot_ref, blank1h_ref,
                lse_ref, blank_ref, label_ref):
    """One (1, T_TILE, H) x (1, U_TILE, H) tile -> three (1, T_TILE, U_TILE)
    outputs.  Logits tile lives only in VMEM.

    The blank column is selected by a (1, V) one-hot operand rather than a
    baked-in index: under vocab (tensor-parallel) sharding each shard sees
    only its V-slice of the one-hot, so non-owner shards contribute zero
    and the cross-shard psum in parallel/partition.py recovers the value.
    """
    # All math stays 3-D (T_TILE, U_TILE, ·) with the big dim on lanes —
    # Mosaic cannot relayout (T, U) lane vectors into per-row sublane
    # scalars, so reductions over V (lanes) land directly in the (T, U)
    # output tile layout.
    enc = enc_ref[0]    # (T_TILE, H)
    pred = pred_ref[0]  # (U_TILE, H)
    h3 = jnp.tanh(enc[:, None, :] + pred[None, :, :])  # (T_TILE, U_TILE, H)
    logits = jax.lax.dot_general(
        h3, w_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (T_TILE, U_TILE, V)
    V = logits.shape[-1]
    logits = logits + b_ref[:].astype(jnp.float32).reshape(1, 1, V)

    m = jnp.max(logits, axis=-1)                          # (T_TILE, U_TILE)
    m3 = jax.lax.broadcast_in_dim(m, logits.shape, (0, 1))
    lse_ref[0] = m + jnp.log(jnp.sum(jnp.exp(logits - m3), axis=-1))

    blank1h = blank1h_ref[:].astype(jnp.float32).reshape(1, 1, V)
    blank_ref[0] = jnp.sum(logits * blank1h, axis=-1)

    onehot = onehot_ref[0].astype(jnp.float32)  # (U_TILE, V)
    label_ref[0] = jnp.sum(logits * onehot[None, :, :], axis=-1)


def _fwd_pallas(enc, pred, w, b, label_onehot, blank_onehot, u_tile: int):
    """enc (B,T,H), pred (B,U1,H), w (H,V), b (V,), blank_onehot (V,),
    label_onehot (B,U1,V) one-hot of the label leaving each lattice column.
    Returns (lse, blank_logit, label_logit), each (B, T, U1) f32.
    T and U1 must be multiples of the tiles (caller pads)."""
    B, T, H = enc.shape
    U1 = pred.shape[1]
    grid = (B, T // T_TILE, U1 // u_tile)

    out_shape = [jax.ShapeDtypeStruct((B, T, U1), jnp.float32)] * 3
    out_spec = pl.BlockSpec((1, T_TILE, u_tile),
                            lambda bb, i, j: (bb, i, j),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, w.shape[1]), lambda bb, i, j: (0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, T_TILE, H), lambda bb, i, j: (bb, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, u_tile, H), lambda bb, i, j: (bb, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, w.shape[1]), lambda bb, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            vec_spec,
            pl.BlockSpec((1, u_tile, w.shape[1]), lambda bb, i, j: (bb, j, 0),
                         memory_space=pltpu.VMEM),
            vec_spec,
        ],
        out_specs=[out_spec, out_spec, out_spec],
        out_shape=out_shape,
        interpret=_interpret(),
    )(enc, pred, w, b[None, :], label_onehot, blank_onehot[None, :])


# ------------------------------- backward -------------------------------

# V is processed in chunks so the backward tile working set stays under the
# ~16 MB VMEM budget (full-V logits + dlogits + dh at f32 would need ~24 MB).
# 256 measured best on v5e at base shapes: 9.32 ms fwd+bwd vs 10.77 at 128
# (fewer grid steps, wider matmuls); 512 is only ~1% faster with far less
# VMEM headroom for scaled configs.
V_CHUNK = 256


def _pick_v_chunk(V: int) -> int:
    if V <= V_CHUNK:
        return V
    if V % V_CHUNK == 0:
        return V_CHUNK
    if V % 128 == 0:
        return 128
    return V


def _bwd_kernel(enc_ref, pred_ref, w_ref, b_ref, onehot_ref, blank1h_ref,
                lse_ref, g_blank_ref, g_label_ref, g_lse_ref,
                denc_ref, dpred_ref, dw_ref, db_ref,
                h_scr, dh_scr, dpred_acc, *, n_v: int,
                grad_clamp: float = -1.0):
    """Merged backward: one pass over the V chunks computes both the dh
    accumulation (for denc/dpred) and the dW/db slab accumulation — the
    joint logits for each chunk are materialized once, not twice.

    Grid (B, T tiles, U tiles, V chunks + 1), V innermost; the trailing
    flush-only step converts dh -> denc/dpred so the matmul temporaries and
    dpre3 are never co-resident.  h3 is cached per lattice tile in scratch;
    dh accumulates in f32.  dW/db accumulate directly in slab-shaped constant-index output
    buffers that persist in VMEM across the whole grid.  Softmax comes from
    the forward's logsumexp (flash-style).
    """
    bb = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    vc = pl.program_id(3)
    n_i = pl.num_programs(1)
    n_j = pl.num_programs(2)

    t_tile = enc_ref.shape[1]
    u_tile = pred_ref.shape[1]
    chunk = w_ref.shape[1]
    shape_c = (t_tile, u_tile, chunk)

    def b3(x):
        return jax.lax.broadcast_in_dim(x, shape_c, (0, 1))

    @pl.when(vc == 0)
    def _():
        h_scr[:] = jnp.tanh(enc_ref[0][:, None, :] + pred_ref[0][None, :, :])
        dh_scr[:] = jnp.zeros_like(dh_scr)

    @pl.when((bb == 0) & (i == 0) & (j == 0) & (vc == 0))
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    @pl.when((i == 0) & (j == 0) & (vc == 0))
    def _():
        dpred_acc[:] = jnp.zeros_like(dpred_acc)

    @pl.when(vc < n_v)
    def _():
        h3 = h_scr[:]
        logits_c = jax.lax.dot_general(
            h3, w_ref[:], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        logits_c = logits_c + b_ref[:].astype(jnp.float32).reshape(1, 1, chunk)
        p_c = jnp.exp(logits_c - b3(lse_ref[0]))

        blank1h = blank1h_ref[:].astype(jnp.float32).reshape(1, 1, chunk)
        dl_c = (b3(g_lse_ref[0]) * p_c
                + b3(g_blank_ref[0]) * blank1h
                + b3(g_label_ref[0]) * onehot_ref[0].astype(jnp.float32)[None])
        if grad_clamp > 0:  # d(loss)/d(logits) clamp (ops/transducer.py
            dl_c = jnp.clip(dl_c, -grad_clamp, grad_clamp)  # clamp_grads)

        # dh addend in two H-halves under fori_loop: one (T,U,H/2) f32
        # buffer lives at a time instead of a full (T,U,H) one — the last
        # ~1MB that pushed the merged kernel over the VMEM budget.  Lane-dim
        # slices must start at 128-multiples on real Mosaic, so small-H
        # kernels (tests, tiny configs) take the unsplit path.
        H = w_ref.shape[0]
        half = H // 2
        if half % 128 == 0:
            def dh_half(hc, carry):
                w_h = w_ref[pl.ds(hc * half, half), :]  # (H/2, chunk)
                add = jax.lax.dot_general(
                    dl_c.astype(w_ref.dtype), w_h,
                    dimension_numbers=(((2,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dh_scr[:, :, pl.ds(hc * half, half)] += add
                return carry

            jax.lax.fori_loop(0, 2, dh_half, 0)
        else:
            dh_scr[:] += jax.lax.dot_general(
                dl_c.astype(w_ref.dtype), w_ref[:],
                dimension_numbers=(((2,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        h_rows = h3.reshape(t_tile * u_tile, -1)
        dl_rows = dl_c.reshape(t_tile * u_tile, chunk)
        dw_ref[vc] += jax.lax.dot_general(
            h_rows, dl_rows.astype(h_rows.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        db_ref[vc] += jnp.sum(dl_rows, axis=0, keepdims=True)

    @pl.when(vc == n_v)
    def _():
        h3f = h_scr[:].astype(jnp.float32)
        dpre3 = dh_scr[:].astype(jnp.float32) * (1.0 - h3f ** 2)

        @pl.when(j == 0)
        def _():
            denc_ref[0] = jnp.zeros_like(denc_ref[0])

        denc_ref[0] += jnp.sum(dpre3, axis=1)
        dpred_acc[pl.ds(j * u_tile, u_tile), :] += jnp.sum(dpre3, axis=0)

        @pl.when((i == n_i - 1) & (j == n_j - 1))
        def _():
            dpred_ref[0] = dpred_acc[:]


def _bwd_vmem_need(t_tile, u_tile, U1, H, V, chunk):
    """Scoped-VMEM estimate (bytes) for one backward grid step: scratch
    (h3 bf16 + dh f32 + dpred acc) + resident dw/db slabs + double-buffered
    in/out blocks.  Used to size the compiler's scoped-vmem limit and to
    shrink the T tile for very large H*u_tile working sets — the fixed
    defaults OOM'd at scaled (H=2048) and long-form (u_tile=128) shapes."""
    scratch = 2 * t_tile * u_tile * H + 4 * t_tile * u_tile * H + 4 * U1 * H
    slabs = 4 * V * H + 4 * V
    blocks_in = 2 * (2 * t_tile * H + 2 * u_tile * H + 2 * H * chunk
                     + 2 * u_tile * chunk + 4 * chunk
                     + 4 * 4 * t_tile * u_tile)
    blocks_out = 2 * 4 * t_tile * H + 4 * U1 * H
    return scratch + slabs + blocks_in + blocks_out


def _bwd_pallas(enc, pred, w, b, label_onehot, blank_onehot, lse,
                g_blank, g_label, g_lse, u_tile: int,
                grad_clamp: float = -1.0):
    B, T, H = enc.shape
    U1 = pred.shape[1]
    V = w.shape[1]
    chunk = _pick_v_chunk(V)
    n_v = V // chunk

    # Adaptive T tile: the dh/h3 scratch scales with t*u*H; drop to 8 when
    # 16 would push the whole working set past ~48 MB (v5e VMEM is 128 MB;
    # past ~half, the pipeline double-buffers stop fitting comfortably).
    t_tile = T_TILE
    while (t_tile > 8
           and _bwd_vmem_need(t_tile, u_tile, U1, H, V, chunk) > 48 * 2**20):
        t_tile //= 2
    # 1.6x margin over the block/scratch estimate: Mosaic's own stack
    # temporaries (dot accumulators, fori_loop halves) measured ~25-30%
    # beyond the estimate at long-form shapes.  This only raises the
    # compiler's scoped-vmem ceiling, not actual allocation.
    vmem_limit = min(
        max(int(_bwd_vmem_need(t_tile, u_tile, U1, H, V, chunk) * 1.6),
            20 * 2**20),
        100 * 2**20)
    grid = (B, T // t_tile, U1 // u_tile, n_v + 1)

    g_spec = pl.BlockSpec((1, t_tile, u_tile),
                          lambda bb, i, j, vc: (bb, i, j),
                          memory_space=pltpu.VMEM)

    def vclamp(vc):
        return jnp.minimum(vc, n_v - 1)

    vchunk_spec = pl.BlockSpec((1, chunk), lambda bb, i, j, vc: (0, vclamp(vc)),
                               memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, t_tile, H), lambda bb, i, j, vc: (bb, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, u_tile, H), lambda bb, i, j, vc: (bb, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((H, chunk), lambda bb, i, j, vc: (0, vclamp(vc)),
                     memory_space=pltpu.VMEM),
        vchunk_spec,
        pl.BlockSpec((1, u_tile, chunk),
                     lambda bb, i, j, vc: (bb, j, vclamp(vc)),
                     memory_space=pltpu.VMEM),
        vchunk_spec,
        g_spec,  # lse residual
        g_spec, g_spec, g_spec,
    ]
    args = (enc, pred, w, b[None, :], label_onehot, blank_onehot[None, :],
            lse, g_blank, g_label, g_lse)

    denc, dpred, dw_slabs, db_slabs = pl.pallas_call(
        functools.partial(_bwd_kernel, n_v=n_v, grad_clamp=grad_clamp),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, t_tile, H), lambda bb, i, j, vc: (bb, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U1, H), lambda bb, i, j, vc: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_v, H, chunk), lambda bb, i, j, vc: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_v, 1, chunk), lambda bb, i, j, vc: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, H), jnp.float32),
            jax.ShapeDtypeStruct((B, U1, H), jnp.float32),
            jax.ShapeDtypeStruct((n_v, H, chunk), jnp.float32),
            jax.ShapeDtypeStruct((n_v, 1, chunk), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((t_tile, u_tile, H), enc.dtype),      # h3
            pltpu.VMEM((t_tile, u_tile, H), jnp.float32),    # dh accumulator
            pltpu.VMEM((U1, H), jnp.float32),                # dpred accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit),
        interpret=_interpret(),
    )(*args)

    dw = jnp.concatenate([dw_slabs[k] for k in range(n_v)], axis=1)
    db = jnp.concatenate([db_slabs[k] for k in range(n_v)], axis=1)
    return denc, dpred, dw, db


# --------------------------- custom_vjp wrapper ---------------------------

# GSPMD partitioning (rnnt_tpu/parallel/partition.py): batch-parallel over
# B and vocab-parallel over w's V axis (tensor parallelism) — per-shard
# partial lse/blank/label are logsumexp-merged / psum'd over the model
# axis; dW/db stay V-sharded and are psum'd over the batch axis only.
# custom_vjp stays OUTSIDE (custom_partitioning has no differentiation rule).
from rnnt_tpu.parallel.partition import (  # noqa: E402
    fused_joint_bwd_partitioned,
    fused_joint_fwd_partitioned,
)


@functools.lru_cache(maxsize=None)
def _fwd_cp(u_tile: int):
    def fn(enc, pred, w, b, label_onehot, blank_onehot):
        return _fwd_pallas(enc, pred, w, b, label_onehot, blank_onehot,
                           u_tile)

    return fused_joint_fwd_partitioned(fn)


@functools.lru_cache(maxsize=None)
def _bwd_cp(u_tile: int, grad_clamp: float = -1.0):
    def fn(enc, pred, w, b, label_onehot, blank_onehot,
           lse, g_blank, g_label, g_lse):
        return _bwd_pallas(enc, pred, w, b, label_onehot, blank_onehot, lse,
                           g_blank, g_label, g_lse, u_tile, grad_clamp)

    return fused_joint_bwd_partitioned(fn)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_joint_outputs(enc, pred, w, b, label_onehot, blank_onehot, u_tile,
                        grad_clamp=-1.0):
    """(lse, blank_logit, label_logit) over the padded lattice — all
    (B, T, U1) f32.  T % T_TILE == 0 and U1 % u_tile == 0 required.
    grad_clamp > 0 bounds d(loss)/d(logits) in the backward (torchaudio
    rnnt_loss clamp semantics)."""
    return _fwd_cp(u_tile)(enc, pred, w, b, label_onehot, blank_onehot)


def _fjo_fwd(enc, pred, w, b, label_onehot, blank_onehot, u_tile, grad_clamp):
    outs = _fwd_cp(u_tile)(enc, pred, w, b, label_onehot, blank_onehot)
    lse = outs[0]
    return outs, (enc, pred, w, b, label_onehot, blank_onehot, lse)


def _fjo_bwd(u_tile, grad_clamp, residuals, gs):
    enc, pred, w, b, label_onehot, blank_onehot, lse = residuals
    g_lse, g_blank, g_label = gs
    denc, dpred, dw, db = _bwd_cp(u_tile, grad_clamp)(
        enc, pred, w, b, label_onehot, blank_onehot, lse,
        g_blank, g_label, g_lse)
    return (denc.astype(enc.dtype), dpred.astype(pred.dtype),
            dw.astype(w.dtype), db[0].astype(b.dtype), None, None)


fused_joint_outputs.defvjp(_fjo_fwd, _fjo_bwd)


# ------------------------------ public loss ------------------------------

def transducer_loss_pallas(joint_params, audio, text, targets, t_lens, u_lens,
                           blank: int, *, reduction: str = "mean", mesh=None,
                           grad_clamp: float = -1.0):
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
    u_tile, U_pad = _pick_u(U1)
    audio_p = jnp.pad(audio, ((0, 0), (0, T_pad - T), (0, 0)))
    text_p = jnp.pad(text, ((0, 0), (0, U_pad - U1), (0, 0)))
    targets_pad = jnp.pad(
        jnp.concatenate([targets, jnp.zeros((B, 1), targets.dtype)], axis=1),
        ((0, 0), (0, U_pad - U1))).astype(jnp.int32)
    V = w.shape[1]
    label_onehot = jax.nn.one_hot(targets_pad, V, dtype=audio_p.dtype)
    blank_onehot = jax.nn.one_hot(blank, V, dtype=audio_p.dtype)

    lse, blank_logit, label_logit = fused_joint_outputs(
        audio_p, text_p.astype(audio_p.dtype), w.astype(audio_p.dtype),
        b, label_onehot, blank_onehot, u_tile, grad_clamp)

    lse = lse[:, :T, :U1]
    lp_blank = blank_logit[:, :T, :U1] - lse
    u_mask = jnp.arange(U1)[None, :] < u_lens[:, None]
    lp_label = jnp.where(u_mask[:, None, :],
                         label_logit[:, :T, :U1] - lse, NEG)

    losses = lattice_nll(lp_blank, lp_label, t_lens, u_lens, mesh=mesh)
    if reduction == "mean":
        return jnp.mean(losses)
    if reduction == "sum":
        return jnp.sum(losses)
    return losses
