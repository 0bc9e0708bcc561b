"""Pruned RNN-T loss: a factored "simple" joint prunes the T×U lattice to a
narrow U-band, and the full joint is evaluated only inside the band.

This is a capability the reference does not have (its loss is
``torchaudio.functional.rnnt_loss`` over the full lattice,
/root/reference/rnnt/model.py:31-41).  The technique is the pruned
transducer of "Pruned RNN-T for fast, memory-efficient ASR training"
(Kuang et al., Interspeech 2022, the k2/icefall recipe), re-derived here
TPU-natively:

1. **Simple joint** (factored, trains its own small projections):
   ``logit(t,u,v) = am(t,v) + lm(u,v)`` with ``am = audio @ W_am``,
   ``lm = text @ W_lm``.  Because the joint factors, the per-cell
   normalizer ``Z(t,u) = logsumexp_v(am+lm)`` is ONE (B,T,V)x(B,V,U)
   matmul of exponentials — the full-lattice simple loss costs
   O(B·T·U·V) instead of the full joint's O(B·T·U·H·V).
2. **Occupancy-driven band**: the gradient of the simple loss w.r.t. the
   label log-probs is the posterior occupancy of each label arc; per
   frame t the band start ``s(t)`` maximizes the occupancy mass in a
   window of ``band`` labels, then is made monotone non-decreasing with
   per-frame jumps < band (so blank transitions always stay in-band) and
   pinned to 0 at t=0 and to cover (t_len-1, u_len) at the end.
3. **Banded full joint + banded alpha recursion**: the expensive joint
   (H-dim tanh + H×V matmul) runs on (B, T, band) lattice cells instead
   of (B, T, U+1) — an (U+1)/band FLOP cut on the dominant matmuls —
   chunked over T under ``jax.checkpoint`` like the full chunked path.

The pruned NLL sums over the sub-lattice of paths inside the band, so it
upper-bounds the exact NLL and equals it when the band covers the full
lattice (tested in tests/test_transducer_pruned.py).  Training minimizes
``simple_scale * simple_nll + pruned_scale * pruned_nll`` (k2 default
weighting); the simple loss keeps the band estimator aligned with the
model as both train.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from rnnt_tpu.ops.transducer import (
    NEG,
    clamp_grads,
    lattice_nll,
    row_scan,
    shift_right,
)


# --------------------------- simple (factored) joint ---------------------------

def simple_joint_log_probs(simple_params, audio, text, targets, u_lens,
                           blank: int):
    """Full-lattice blank/label log-probs of the factored joint.

    audio: (B, T, Da) raw encoder output; text: (B, U+1, Dt) raw predictor
    output; targets: (B, U).  Returns (lp_blank, lp_label): (B, T, U+1) f32.

    The normalizer never materializes (B, T, U, V): Z = log(exp(am) @
    exp(lm)^T) with per-row max subtraction for stability.
    """
    f32 = jnp.float32
    am = (jnp.dot(audio.astype(f32), simple_params["am"]["w"].astype(f32))
          + simple_params["am"]["b"].astype(f32))          # (B, T, V)
    lm = (jnp.dot(text.astype(f32), simple_params["lm"]["w"].astype(f32))
          + simple_params["lm"]["b"].astype(f32))          # (B, U+1, V)

    am_max = jnp.max(am, axis=-1)                          # (B, T)
    lm_max = jnp.max(lm, axis=-1)                          # (B, U+1)
    pa = jnp.exp(am - am_max[..., None])
    pl = jnp.exp(lm - lm_max[..., None])
    # (B, T, V) @ (B, V, U+1) -> (B, T, U+1); sum_v pa*pl >= exp(0)*... > 0.
    z = jnp.einsum("btv,buv->btu", pa, pl,
                   preferred_element_type=f32)
    z = jnp.log(z + 1e-30) + am_max[:, :, None] + lm_max[:, None, :]

    B = targets.shape[0]
    U1 = text.shape[1]
    V = am.shape[-1]
    tgt_pad = jnp.concatenate(
        [targets, jnp.zeros((B, 1), dtype=targets.dtype)], axis=1)  # (B, U+1)
    # Label/blank selection as one-hot einsums, not V-axis gathers: under
    # tensor parallelism am/lm are V-sharded, and a gather on the sharded
    # axis forces GSPMD to all-gather the operand (and XLA transposes the
    # gather into a TPU scatter-add in backward) — the einsum contracts V
    # into a psum'd MXU matmul both ways.
    oh = jax.nn.one_hot(tgt_pad, V, dtype=f32)               # (B, U+1, V)
    am_lbl = jnp.einsum("btv,buv->btu", am, oh,
                        preferred_element_type=f32)          # (B, T, U+1)
    lm_lbl = jnp.einsum("buv,buv->bu", lm, oh,
                        preferred_element_type=f32)          # (B, U+1)
    bh = jax.nn.one_hot(blank, V, dtype=f32)                 # (V,)
    am_blank = jnp.einsum("btv,v->bt", am, bh,
                          preferred_element_type=f32)
    lm_blank = jnp.einsum("buv,v->bu", lm, bh,
                          preferred_element_type=f32)

    lp_blank = am_blank[:, :, None] + lm_blank[:, None, :] - z
    lp_label = am_lbl + lm_lbl[:, None, :] - z
    u_mask = jnp.arange(U1)[None, :] < u_lens[:, None]
    lp_label = jnp.where(u_mask[:, None, :], lp_label, NEG)
    return lp_blank, lp_label


# ------------------------------ pruning bounds ------------------------------

@jax.custom_vjp
def nll_with_occupancy(lp_blank, lp_label, t_lens, u_lens):
    """(losses (B,), gamma (B,T,U+1)) with gamma = -d(losses)/d(lp_label),
    the label-arc posterior occupancy.

    Runs the lattice DP backward ONCE and reuses it twice: as the returned
    occupancy (for prune_bounds) and as this op's own vjp — each sample's
    loss depends only on its own lattice, so d(sum g_b*loss_b)/d lp[b] =
    g_b * (d loss_b/d lp[b]), i.e. the vjp is the saved per-sample
    gradient scaled by the incoming cotangent.  Saves a full DP fwd+bwd
    pair per step vs. calling jax.grad separately for gamma.

    The gamma output is treated as non-differentiable (its consumers must
    stop_gradient it — prune_bounds does)."""
    losses, d_blank, d_label = _nwo_compute(lp_blank, lp_label,
                                            t_lens, u_lens)
    return losses, -d_label


def _nwo_compute(lp_blank, lp_label, t_lens, u_lens):
    losses, vjp = jax.vjp(
        lambda a, b: lattice_nll(a, b, t_lens, u_lens), lp_blank, lp_label)
    d_blank, d_label = vjp(jnp.ones_like(losses))
    return losses, d_blank, d_label


def _nwo_fwd(lp_blank, lp_label, t_lens, u_lens):
    losses, d_blank, d_label = _nwo_compute(lp_blank, lp_label,
                                            t_lens, u_lens)
    return (losses, -d_label), (d_blank, d_label)


def _nwo_bwd(res, gs):
    d_blank, d_label = res
    g_losses, _ = gs  # gamma cotangent dropped by contract (stop_gradient)
    g3 = g_losses[:, None, None]
    return g3 * d_blank, g3 * d_label, None, None


nll_with_occupancy.defvjp(_nwo_fwd, _nwo_bwd)


def prune_bounds(gamma, t_lens, u_lens, band: int):
    """Band starts s: (B, T) int32 from label-occupancy gamma (B, T, U+1).

    Guarantees (see module docstring):  0 <= s <= U1-band;  s non-
    decreasing with s[t+1]-s[t] <= band-1;  for t >= t_len-1,
    s == clip(u_len-band+1, 0, U1-band) so the final cell (t_len-1, u_len)
    is ALWAYS in-band (the end pin wins over the jump cap — enforced by a
    reverse pull-up pass);  s[:, 0] == 0 for every feasible sample
    (u_len <= (ceil(t_len/tile)-1)*(band-1); infeasible ones start the
    band higher, their pruned loss hits the degenerate cap, and the simple
    loss still trains them).
    """
    B, T, U1 = gamma.shape
    S = min(band, U1)
    # Windowed occupancy mass via cumsum; positions k in [0, U1-S].
    cs = jnp.cumsum(gamma, axis=-1)
    cs = jnp.concatenate([jnp.zeros((B, T, 1), cs.dtype), cs], axis=-1)
    win = cs[..., S:] - cs[..., :-S]                       # (B, T, U1-S+1)
    raw = jnp.argmax(win, axis=-1).astype(jnp.int32)       # (B, T)

    final = jnp.clip(u_lens - (S - 1), 0, U1 - S).astype(jnp.int32)  # (B,)
    raw = jnp.minimum(raw, final[:, None])
    t_ids = jnp.arange(T)[None, :]
    raw = jnp.where(t_ids >= (t_lens - 1)[:, None], final[:, None], raw)
    raw = raw.at[:, 0].set(0)

    # Monotone non-decreasing.
    mono = lax.cummax(raw, axis=1)
    # Cap jumps at S-1 in two passes.  Forward pulls later bounds DOWN:
    # s[t] = min(mono[t], s[t-1]+(S-1)) = min_{j<=t} mono[j] + (t-j)(S-1),
    # a min-plus prefix scan whose closed form is ramp + cummin(mono-ramp).
    # That pass can pull the END PIN below `final` when early occupancy
    # sits at low u (then the final lattice cell falls out of band and the
    # sample's pruned gradient vanishes), so re-pin and run the mirror-
    # image reverse max-plus pass pulling earlier bounds UP:
    # s[t] = max_{j>=t} s[j] - (j-t)(S-1)  (k2's
    # adjust_pruning_lower_bound).  Both passes preserve monotonicity and
    # the jump cap; the reverse pass preserves the pin, and s[0] stays 0
    # for feasible samples because the forward pass guarantees
    # s[j] <= j*(S-1).
    k = S - 1
    ramp = (jnp.arange(T, dtype=jnp.int32) * k)[None, :]
    s = ramp + lax.cummin(mono - ramp, axis=1)
    s = jnp.where(t_ids >= (t_lens - 1)[:, None], final[:, None], s)
    s = ramp + lax.cummax(s - ramp, axis=1, reverse=True)
    return lax.stop_gradient(s.astype(jnp.int32))


# --------------------------- banded alpha recursion ---------------------------

def banded_to_full(lp_band, bounds, U1: int):
    """Expand banded (B, T, S) log-probs to the full (B, T, U1) lattice
    with log-zero outside the band.

    The production path then runs the EXISTING full-lattice DP (the Pallas
    alpha kernel, ops/lattice_pallas.py, with its GSPMD partitioning):
    out-of-band cells are log-zero so every path leaving the band scores
    -inf — exactly the banded recursion's semantics, without a sequential
    per-frame scan.  The DP itself has no V dimension, so un-banding it
    costs no joint FLOPs.

    The expansion is a per-row one-hot CONTRACTION, not a gather: v5e runs
    per-element gathers at ~11 ns/element, and the former
    take_along_axis-based scatter (with a gather-adjoint custom_vjp) cost
    16.7 ms fwd+bwd at (32, 250, 16, 65) — over half the pruned loss.
    AD transposes the einsum into another einsum, so neither direction
    touches the gather unit and no custom_vjp is needed."""
    B, T, S = lp_band.shape
    rel = jnp.arange(U1, dtype=jnp.int32)[None, None, :] \
        - bounds[:, :, None]                                    # (B, T, U1)
    inband = (rel >= 0) & (rel < S)
    onehot = (rel[:, :, None, :]
              == jnp.arange(S, dtype=jnp.int32)[None, None, :, None])
    # HIGHEST: this is an exact SELECTION of f32 log-probs — the default
    # TPU precision would round the values through a bf16 MXU pass and
    # break the full-band==exact-loss invariant in fp32 runs.  S <= 16, so
    # the f32 pass costs nothing (same pattern as band_lerp).
    vals = jnp.einsum("bts,btsu->btu", lp_band.astype(jnp.float32),
                      onehot.astype(jnp.float32),
                      precision=jax.lax.Precision.HIGHEST)
    return jnp.where(inband, vals, NEG)


def banded_alpha_loss(lp_blank, lp_label, bounds, t_lens, u_lens):
    """Alpha recursion restricted to the band; per-sample NLL (B,).

    Reference implementation (sequential scan over T) used by tests to
    prove the ``banded_to_full`` + full-DP path equivalent; the production
    loss uses the scatter instead.

    lp_blank/lp_label: (B, T, S) where cell (b, t, s) is lattice cell
    (t, bounds[b,t]+s).  Cross-row transitions realign band coordinates by
    off[t] = bounds[t] - bounds[t-1] (guaranteed in [0, S-1])."""
    lp_blank = lp_blank.astype(jnp.float32)
    lp_label = lp_label.astype(jnp.float32)
    B, T, S = lp_blank.shape
    s_ids = jnp.arange(S)[None, :]                        # (1, S)

    alpha0 = row_scan(
        jnp.concatenate([jnp.zeros((B, 1), jnp.float32),
                         jnp.full((B, S - 1), NEG)], axis=1),
        shift_right(lp_label[:, 0], NEG))

    off = (bounds[:, 1:] - bounds[:, :-1]).astype(jnp.int32)  # (B, T-1)

    def step(alpha_prev, xs):
        lpb_prev, lpl_cur, off_t = xs  # (B,S), (B,S), (B,)
        src = s_ids + off_t[:, None]                       # (B, S)
        valid = src < S
        stay = jnp.take_along_axis(alpha_prev + lpb_prev,
                                   jnp.minimum(src, S - 1), axis=1)
        c = jnp.where(valid, stay, NEG)
        alpha = row_scan(c, shift_right(lpl_cur, NEG))
        return alpha, alpha

    xs = (jnp.swapaxes(lp_blank[:, :-1], 0, 1),
          jnp.swapaxes(lp_label[:, 1:], 0, 1),
          jnp.swapaxes(off, 0, 1))
    _, alphas_tail = lax.scan(step, alpha0, xs)
    alphas = jnp.concatenate([alpha0[None], alphas_tail], axis=0)  # (T,B,S)

    b_idx = jnp.arange(B)
    t_last = t_lens - 1
    coord = u_lens - bounds[b_idx, t_last]                 # final band coord
    coord_c = jnp.clip(coord, 0, S - 1)
    final_alpha = alphas[t_last, b_idx, coord_c]
    final_blank = lp_blank[b_idx, t_last, coord_c]
    nll = -(final_alpha + final_blank)
    # If the band can't reach u_len by t_last (u_len > (t_len-1)*(S-1),
    # i.e. > S-1 labels/frame — degenerate input), the cell is out of band:
    # return the log-zero-derived large loss rather than a wrong cell's.
    return jnp.where((coord >= 0) & (coord < S), nll, -NEG)


# ------------------------------ banded full joint ------------------------------

def _banded_chunk_log_probs(joint_params, enc_chunk, text, s_chunk,
                            targets_pad, u_lens, blank, band: int,
                            grad_clamp=-1.0):
    """Full joint on the band cells of one T-chunk.

    enc_chunk: (B, Tc, H) side-projected audio; text: (B, U+1, H)
    side-projected;  s_chunk: (B, Tc) band starts.  Returns
    (lp_blank, lp_label): (B, Tc, S) f32.
    """
    B, Tc, H = enc_chunk.shape
    U1 = text.shape[1]
    idx = s_chunk[:, :, None] + jnp.arange(band)[None, None, :]  # (B,Tc,S)
    # Gathers as one-hot matmuls: XLA transposes a gather into a slow TPU
    # scatter-add, while a one-hot einsum is an MXU matmul in BOTH
    # directions (same trick as the fused kernel's label selection,
    # ops/transducer_pallas.py _fwd_kernel).
    sel_u = jax.nn.one_hot(idx, U1, dtype=text.dtype)      # (B,Tc,S,U1)
    text_band = jnp.einsum("btsu,buh->btsh", sel_u, text,
                           preferred_element_type=jnp.float32
                           ).astype(text.dtype)
    h = jnp.tanh(enc_chunk[:, :, None, :] + text_band)
    w = joint_params["out"]["w"].astype(h.dtype)
    b = joint_params["out"]["b"].astype(jnp.float32)
    logits = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
    logits = logits.astype(jnp.float32)
    if grad_clamp > 0:
        logits = clamp_grads(logits, grad_clamp)
    denom = jax.nn.logsumexp(logits, axis=-1)
    lp_blank = logits[..., blank] - denom
    lbl = jnp.take_along_axis(targets_pad[:, None, :], idx, axis=2)  # (B,Tc,S)
    sel_v = jax.nn.one_hot(lbl, logits.shape[-1], dtype=jnp.float32)
    lp_label = jnp.einsum("btsv,btsv->bts", logits, sel_v) - denom
    lp_label = jnp.where(idx < u_lens[:, None, None], lp_label, NEG)
    return lp_blank, lp_label


@partial(jax.checkpoint, static_argnums=(6, 7, 8))
def _banded_chunk_log_probs_remat(joint_params, enc_chunk, text, s_chunk,
                                  targets_pad, u_lens, blank, band,
                                  grad_clamp=-1.0):
    return _banded_chunk_log_probs(joint_params, enc_chunk, text, s_chunk,
                                   targets_pad, u_lens, blank, band,
                                   grad_clamp)


# --------------------- banded fused joint (Pallas path) ---------------------

def _banded_fused_log_probs(joint_params, audio_p, text_p, s_tile,
                            targets_pad, blank: int, band: int,
                            tile: int, grad_clamp: float):
    """Banded joint through the EXISTING fused Pallas kernel.

    With tile-granular bounds (one band start per ``tile`` frames), each
    (batch, T-tile) pair is an independent T_TILE x band lattice patch —
    so reshaping the encoder to (B*n_t, T_TILE, H) and gathering each
    tile's text band to (B*n_t, band, H) turns the banded joint into a
    plain ``fused_joint_outputs`` call (ops/transducer_pallas.py): same
    kernels, same custom_vjp, same GSPMD partitioning, zero new Mosaic.

    audio_p: (B, T_pad, H) side-projected, T_pad % tile == 0;
    text_p: (B, U+1, H) side-projected; s_tile: (B, n_t) band starts.
    Returns (lp_blank, lp_label): (B, T_pad, band) f32 (label NOT yet
    u_len-masked).
    """
    from rnnt_tpu.ops.transducer_pallas import fused_joint_outputs

    B, T_pad, H = audio_p.shape
    U1 = text_p.shape[1]
    n_t = T_pad // tile
    w = joint_params["out"]["w"]
    b = joint_params["out"]["b"]
    V = w.shape[1]
    dt = audio_p.dtype

    idx = s_tile[:, :, None] + jnp.arange(band)[None, None, :]  # (B,n_t,S)
    sel = jax.nn.one_hot(idx, U1, dtype=dt)                     # (B,n_t,S,U1)
    text_band = jnp.einsum("btsu,buh->btsh", sel, text_p.astype(dt),
                           preferred_element_type=jnp.float32).astype(dt)
    # Label one-hots for the band WITHOUT an int gather (a (B, n_t, S)
    # take_along_axis ran at ~11 ns/element = ~1.4 ms here): chain the
    # band-selection one-hot with the target one-hot — 0/1 matmul on the
    # MXU, exact.
    tgt_oh = jax.nn.one_hot(targets_pad, V, dtype=dt)           # (B,U1,V)
    label_onehot = jnp.einsum("btsu,buv->btsv", sel, tgt_oh,
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST
                              ).astype(dt)
    blank_onehot = jax.nn.one_hot(blank, V, dtype=dt)

    enc_r = audio_p.reshape(B * n_t, tile, H)
    lse, blank_logit, label_logit = fused_joint_outputs(
        enc_r, text_band.reshape(B * n_t, band, H), w.astype(dt), b,
        label_onehot.reshape(B * n_t, band, V), blank_onehot,
        band, grad_clamp)
    lp_blank = (blank_logit - lse).reshape(B, T_pad, band)
    lp_label = (label_logit - lse).reshape(B, T_pad, band)
    return lp_blank, lp_label


def _resolve_pruned_impl() -> str:
    """'fused' (banded joint via the Pallas fused kernel) on TPU, 'chunked'
    (XLA remat scan) elsewhere; RNNT_PRUNED_IMPL=fused|chunked overrides
    (interpret-mode 'fused' runs the kernels on CPU for tests)."""
    import os

    impl = os.environ.get("RNNT_PRUNED_IMPL", "")
    if impl in ("fused", "chunked"):
        return impl
    return "fused" if jax.default_backend() == "tpu" else "chunked"


# ------------------------------- public entry -------------------------------

def pruned_warmup_loss(joint_params, audio, text, targets, t_lens, u_lens,
                       blank: int, *, simple_scale: float = 0.5,
                       chunk_size: int = 32, reduction: str = "mean",
                       grad_clamp: float = -1.0):
    """Warmup objective for pruned training (k2/icefall practice: train
    the full lattice while the simple heads learn, THEN prune): the EXACT
    full-lattice loss plus ``simple_scale`` x the simple-joint NLL, so the
    occupancy bands are informed by trained simple heads when
    ``training.pruned_warmup_steps`` expires and the banded loss takes
    over.  Flagship-scale A/B evidence for why (docs/pruned_ab_base_long
    .json): from-scratch band-8 training lags the exact loss badly
    (WER 0.52 vs 0.10 at step 1500), band 16 lags mildly (0.23) — narrow
    bands around untrained alignments prune real probability mass."""
    from rnnt_tpu.ops.transducer import transducer_loss
    from rnnt_tpu.ops.transducer_pallas import transducer_loss_pallas

    lpb_s, lpl_s = simple_joint_log_probs(
        joint_params["simple"], audio, text, targets, u_lens, blank)
    losses_simple = lattice_nll(lpb_s, lpl_s, t_lens, u_lens)
    use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        exact = transducer_loss_pallas(
            joint_params, audio, text, targets, t_lens, u_lens, blank,
            grad_clamp=grad_clamp, reduction="none")
    else:
        exact = transducer_loss(
            joint_params, audio, text, targets, t_lens, u_lens, blank,
            chunk_size=chunk_size, grad_clamp=grad_clamp, reduction="none")
    losses = exact + simple_scale * losses_simple
    if reduction == "mean":
        return jnp.mean(losses)
    if reduction == "sum":
        return jnp.sum(losses)
    return losses

def pruned_transducer_loss(joint_params, audio, text, targets, t_lens,
                           u_lens, blank: int, *, band: int = 16,
                           simple_scale: float = 0.5,
                           pruned_scale: float = 1.0,
                           chunk_size: int = 32, reduction: str = "mean",
                           grad_clamp: float = -1.0,
                           bounds_tile: int = 16):
    """simple_scale * simple NLL + pruned_scale * banded NLL.

    audio: (B, T, Da) encoder output, text: (B, U+1, Dt) predictor output
    (both RAW — side projections applied here); joint_params must carry the
    ``simple`` subtree (joint_init(..., simple=True)).  Same call contract
    as ``transducer_loss`` otherwise.

    Bounds are TILE-granular: one band start per ``bounds_tile`` frames
    (occupancy pooled per tile).  This caps the label rate at
    (band-1)/bounds_tile per frame — 15/16 ≈ 0.94 labels/frame at the
    defaults, ~4x the Librispeech+BPE-1024 average — and lets the banded
    joint run through the fused Pallas kernel (each tile is one
    fixed-shape lattice patch).  On the fused path ``band`` is rounded up
    to a multiple of 8 (Mosaic sublane quantum).
    """
    from rnnt_tpu.models.joint import project_sides

    B, T, _ = audio.shape
    U1 = text.shape[1]
    impl = _resolve_pruned_impl()
    if impl == "fused":
        from rnnt_tpu.ops.transducer_pallas import T_TILE
        if bounds_tile % T_TILE != 0:
            # Mosaic would only reject this at TPU compile time (CPU
            # interpret mode doesn't enforce tile granularity) — fail
            # loudly at trace time instead.
            raise ValueError(
                f"bounds_tile={bounds_tile} must be a multiple of the fused "
                f"kernel's T tile ({T_TILE}) on the fused path")
        band = -(-band // 8) * 8
    band = min(band, U1)
    tile = bounds_tile

    # 1+2) Full-lattice simple loss + label occupancy in ONE DP fwd+bwd
    # (nll_with_occupancy reuses the backward as its own vjp), then
    # tile-pooled occupancy -> per-tile band starts.
    lpb_s, lpl_s = simple_joint_log_probs(
        joint_params["simple"], audio, text, targets, u_lens, blank)
    losses_simple, gamma = nll_with_occupancy(lpb_s, lpl_s, t_lens, u_lens)

    n_t = -(-T // tile)
    T_pad = n_t * tile
    gamma_p = jnp.pad(lax.stop_gradient(gamma),
                      ((0, 0), (0, T_pad - T), (0, 0)))
    gamma_tile = gamma_p.reshape(B, n_t, tile, U1).sum(axis=2)
    t_lens_tile = -(-t_lens // tile)
    s_tile = prune_bounds(gamma_tile, t_lens_tile, u_lens, band)  # (B, n_t)
    bounds = jnp.repeat(s_tile, tile, axis=1)[:, :T]              # (B, T)

    audio_p, text_p = project_sides(joint_params, audio, text)
    targets_pad = jnp.concatenate(
        [targets, jnp.zeros((B, 1), dtype=targets.dtype)], axis=1)

    # 3) Banded full joint: fused Pallas kernel on TPU, chunked XLA remat
    # elsewhere.
    if impl == "fused":
        audio_pad = jnp.pad(audio_p, ((0, 0), (0, T_pad - T), (0, 0)))
        lp_blank, lp_label = _banded_fused_log_probs(
            joint_params, audio_pad, text_p, s_tile, targets_pad, blank,
            band, tile, grad_clamp)
        lp_blank = lp_blank[:, :T]
        idx_f = bounds[:, :, None] + jnp.arange(band)[None, None, :]
        lp_label = jnp.where(idx_f < u_lens[:, None, None],
                             lp_label[:, :T], NEG)
    else:
        n_chunks = -(-T // chunk_size)
        pad_t = n_chunks * chunk_size - T
        audio_pad = jnp.pad(audio_p, ((0, 0), (0, pad_t), (0, 0)))
        chunks = jnp.swapaxes(
            audio_pad.reshape(B, n_chunks, chunk_size, -1), 0, 1)
        s_pad = jnp.pad(bounds, ((0, 0), (0, pad_t)), mode="edge")
        s_chunks = jnp.swapaxes(s_pad.reshape(B, n_chunks, chunk_size), 0, 1)

        def body(_, xs):
            enc_chunk, s_chunk = xs
            lpb, lpl = _banded_chunk_log_probs_remat(
                joint_params, enc_chunk, text_p, s_chunk, targets_pad,
                u_lens, blank, band, grad_clamp)
            return None, (lpb, lpl)

        _, (lpb, lpl) = lax.scan(body, None, (chunks, s_chunks))
        lp_blank = jnp.moveaxis(lpb, 0, 1).reshape(B, -1, band)[:, :T]
        lp_label = jnp.moveaxis(lpl, 0, 1).reshape(B, -1, band)[:, :T]

    # Banded DP == full DP over a log-zero-filled lattice (see
    # banded_to_full): reuse the Pallas alpha kernel instead of a
    # sequential banded scan.
    losses_pruned = lattice_nll(
        banded_to_full(lp_blank, bounds, U1),
        banded_to_full(lp_label, bounds, U1), t_lens, u_lens)
    # Degenerate guard: a sample whose target can't fit the band's label
    # rate (u_len > n_tiles*(band-1), i.e. pathologically short audio for
    # its target) has an unreachable final cell -> NLL ~ -NEG.  Cap it so
    # batch metrics stay sane; its pruned gradient is ~0 and the simple
    # loss still trains it.
    losses_pruned = jnp.minimum(losses_pruned, 1e6)

    losses = simple_scale * losses_simple + pruned_scale * losses_pruned
    if reduction == "mean":
        return jnp.mean(losses)
    if reduction == "sum":
        return jnp.sum(losses)
    return losses
