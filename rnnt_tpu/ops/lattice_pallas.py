"""Pallas alpha/beta lattice recursion — the transducer DP at kernel speed.

The XLA path (rnnt_tpu/ops/transducer.py) runs the alpha recursion as a
`lax.scan` over T with an associative scan over U inside each row; measured
on a v5e that costs ~46 ms fwd+bwd at (B=4, T=1000, U=193) — ~38% of the
whole train step — because every one of the T steps is a tiny fusion with
scan overhead.  Here the whole recursion runs inside Pallas kernels:

* forward: one grid step processes a (B_TILE, T_CHUNK, U_pad) slab; each
  row's recurrence  a[u] = LSE(c[u], a[u-1] + e[u-1])  is a Hillis-Steele
  inclusive scan over the U lanes in the (LSE, +) semiring (log2(U) rounds
  of `pltpu.roll` + combine); the alpha row carries across T chunks in
  VMEM scratch.  Alphas are saved for the backward.
* backward: the beta recursion runs the same way in reverse (T chunks
  visited descending, suffix scan over lanes), emitting the blank/label
  edge-posterior gradients row by row — the textbook forward-backward,
  fused.

Used by both transducer loss paths via ``transducer_alpha_loss_fast``;
falls back to interpret mode off-TPU so the same kernels are tested on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rnnt_tpu.ops.transducer import NEG

B_TILE = 8       # minimum batch tile (one vreg of sublanes)
T_CHUNK = 128


def _pick_b_tile(b_padded: int) -> int:
    """Widest batch tile dividing the padded batch (<= 32).  The DP row
    ops are instruction-latency-bound on (b_tile, 128) vregs: a (32, 128)
    op is 4 vregs issued back-to-back but costs far less than 4x one vreg,
    while quartering the sequential row-iteration count — measured the
    difference between the DP being ~6 ms vs ~2 ms of a B=32 train step."""
    for cand in (32, 16, 8):
        if b_padded % cand == 0:
            return cand
    return 8


def _dp_vmem_limit(b_tile: int, U: int, n_lattice_bufs: int) -> int:
    """Scoped-vmem ceiling for the DP kernels: lattice blocks are
    (b_tile, T_CHUNK, U) f32, double-buffered, plus small scratch."""
    need = n_lattice_bufs * 2 * 4 * b_tile * T_CHUNK * U + 8 * 4 * b_tile * U
    return min(max(int(need * 1.6), 20 * 2**20), 100 * 2**20)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _lse(a, b):
    # No log-zero guards needed: NEG is finite (-1e30), so when both inputs
    # are log-zero m = a (or b), one exp argument is exactly 0, s >= 1, and
    # the result is NEG + log(s) <= NEG + log2 — still effectively log-zero
    # downstream (exp of it flushes to 0).  Accumulated A-sums stay well
    # inside f32 range (<= 2^7 * |NEG| ~ 1e32 << 3.4e38).  The guarded
    # version (two extra selects + a floor) measured ~15% of the whole DP
    # kernel's time; the scan is instruction-latency-bound on (8, 128)
    # vregs, so every op in the inner loop counts.
    m = jnp.maximum(a, b)
    return m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m))


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def _prefix_row_scan(c, e_shifted, U: int):
    """Row recurrence a[u] = LSE(c[u], a[u-1] + e_shifted[u]) where
    e_shifted[u] = lp_label[u-1] (NEG at u=0).  Hillis-Steele over lanes in
    the affine log-semiring: combine((A1,b1),(A2,b2)) = (A1+A2,
    LSE(b1+A2, b2)) with left identity (0, NEG)."""
    A, bvec = e_shifted, c
    lane = _lane_iota(c.shape)
    k = 1
    while k < U:
        A_s = pltpu.roll(A, k, axis=1)
        b_s = pltpu.roll(bvec, k, axis=1)
        fill = lane < k
        A_s = jnp.where(fill, 0.0, A_s)
        b_s = jnp.where(fill, NEG, b_s)
        bvec = _lse(b_s + A, bvec)
        A = A + A_s
        k *= 2
    return bvec


def _suffix_row_scan(d, e, U: int):
    """Reverse recurrence beta[u] = LSE(d[u], e[u] + beta[u+1]) with
    beta[U] = log-zero.  Same semiring, composed right-to-left:
    combine(f, g) = (A_f + A_g, LSE(b_f, A_f + b_g)), right identity
    (0, NEG)."""
    A, bvec = e, d
    lane = _lane_iota(d.shape)
    k = 1
    while k < U:
        A_s = pltpu.roll(A, U - k, axis=1)   # == roll by -k
        b_s = pltpu.roll(bvec, U - k, axis=1)
        fill = lane >= U - k
        A_s = jnp.where(fill, 0.0, A_s)
        b_s = jnp.where(fill, NEG, b_s)
        bvec = _lse(bvec, A + b_s)
        A = A + A_s
        k *= 2
    return bvec


# ------------------------------- forward -------------------------------

def _alpha_kernel(lpb_ref, lpl_ref, tl_ref, ul_ref,
                  alphas_ref, llmask_ref, alpha_carry, ll_acc, *,
                  n_t: int, U: int):
    i = pl.program_id(1)
    b_tile = tl_ref.shape[0]
    lane = _lane_iota((b_tile, U))

    @pl.when(i == 0)
    def _():
        # alpha[0, 0] = 0; realized by seeding the carry as "row -1" such
        # that the first row's c = seed works out: we instead seed the
        # first row directly below.
        alpha_carry[:] = jnp.full((b_tile, U), NEG)
        ll_acc[:] = jnp.zeros((b_tile, U), jnp.float32)

    t_lens = tl_ref[:]  # (B_TILE, U) broadcast int32
    u_lens = ul_ref[:]

    def row(r, _):
        t = i * T_CHUNK + r
        lpb_row = lpb_ref[:, r, :]
        lpl_row = lpl_ref[:, r, :]
        prev = alpha_carry[:]

        # c[u]: from-blank term.  Row 0 has no previous row: c = (0, NEG...).
        c_first = jnp.where(lane == 0, 0.0, NEG)
        # lpb of the PREVIOUS row is carried in via alpha_carry trick: we
        # instead store alpha_prev + lpb_prev when finishing each row, so
        # `prev` already includes the blank emission (see bottom of loop).
        c = jnp.where(t == 0, c_first, prev)

        e_shifted = pltpu.roll(lpl_row, 1, axis=1)
        e_shifted = jnp.where(lane < 1, NEG, e_shifted)
        alpha_row = _prefix_row_scan(c, e_shifted, U)

        alphas_ref[:, r, :] = alpha_row
        # Final-cell contribution: loss = -(alpha + lpb) at (t_len-1, u_len).
        hit = (t == t_lens - 1) & (lane == u_lens)
        ll_acc[:] += jnp.where(hit, alpha_row + lpb_row, 0.0)
        # Carry alpha_row + lpb_row as next row's from-blank term.
        alpha_carry[:] = alpha_row + lpb_row
        return _

    jax.lax.fori_loop(0, T_CHUNK, row, 0)

    @pl.when(i == n_t - 1)
    def _():
        llmask_ref[:] = ll_acc[:]


def _alpha_pallas(lpb, lpl, t_lens_b, u_lens_b):
    B, T, U = lpb.shape
    b_tile = _pick_b_tile(B)
    grid = (B // b_tile, T // T_CHUNK)
    lat_spec = pl.BlockSpec((b_tile, T_CHUNK, U), lambda bb, i: (bb, i, 0),
                            memory_space=pltpu.VMEM)
    len_spec = pl.BlockSpec((b_tile, U), lambda bb, i: (bb, 0),
                            memory_space=pltpu.VMEM)
    alphas, llmask = pl.pallas_call(
        functools.partial(_alpha_kernel, n_t=T // T_CHUNK, U=U),
        grid=grid,
        in_specs=[lat_spec, lat_spec, len_spec, len_spec],
        out_specs=[lat_spec, len_spec],
        out_shape=[jax.ShapeDtypeStruct((B, T, U), jnp.float32),
                   jax.ShapeDtypeStruct((B, U), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((b_tile, U), jnp.float32),
                        pltpu.VMEM((b_tile, U), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_dp_vmem_limit(b_tile, U, 3)),
        interpret=_interpret(),
    )(lpb, lpl, t_lens_b, u_lens_b)
    return alphas, llmask


# --------------------- chain (T-sharded) variants ---------------------
#
# Building blocks for the sequence-parallel lattice (ops/lattice_tshard.py):
# the same recursions, but taking an explicit alpha/beta carry row in and
# returning the final carry out, with a per-shard global-T offset — so a
# chain of devices, each holding a T-shard, can run the DP end to end by
# passing (B, U) boundary rows over ICI (the CP analog for transducers,
# SURVEY.md §5: "shard T across chips with ICI exchange of alpha-wavefront
# boundaries").

def _alpha_chain_kernel(lpb_ref, lpl_ref, tl_ref, ul_ref, t0_ref,
                        carry_in_ref, alphas_ref, llmask_ref, carry_out_ref,
                        alpha_carry, ll_acc, *, n_t: int, U: int):
    i = pl.program_id(1)
    b_tile = tl_ref.shape[0]
    lane = _lane_iota((b_tile, U))

    @pl.when(i == 0)
    def _():
        alpha_carry[:] = carry_in_ref[:]
        ll_acc[:] = jnp.zeros((b_tile, U), jnp.float32)

    t_lens = tl_ref[:]
    u_lens = ul_ref[:]
    t0 = t0_ref[:]  # (b_tile, U) global row offset of this shard

    def row(r, _):
        t = t0 + i * T_CHUNK + r  # global row index, (b_tile, U) int32
        lpb_row = lpb_ref[:, r, :]
        lpl_row = lpl_ref[:, r, :]
        prev = alpha_carry[:]

        c_first = jnp.where(lane == 0, 0.0, NEG)
        c = jnp.where(t == 0, c_first, prev)

        e_shifted = pltpu.roll(lpl_row, 1, axis=1)
        e_shifted = jnp.where(lane < 1, NEG, e_shifted)
        alpha_row = _prefix_row_scan(c, e_shifted, U)

        alphas_ref[:, r, :] = alpha_row
        hit = (t == t_lens - 1) & (lane == u_lens)
        ll_acc[:] += jnp.where(hit, alpha_row + lpb_row, 0.0)
        alpha_carry[:] = alpha_row + lpb_row
        return _

    jax.lax.fori_loop(0, T_CHUNK, row, 0)

    @pl.when(i == n_t - 1)
    def _():
        llmask_ref[:] = ll_acc[:]
        carry_out_ref[:] = alpha_carry[:]


def _alpha_chain_pallas(lpb, lpl, t_lens_b, u_lens_b, t0_b, carry_in):
    """Local T-shard alpha pass.  Returns (alphas, llmask, carry_out)."""
    B, T, U = lpb.shape
    b_tile = _pick_b_tile(B)
    grid = (B // b_tile, T // T_CHUNK)
    lat_spec = pl.BlockSpec((b_tile, T_CHUNK, U), lambda bb, i: (bb, i, 0),
                            memory_space=pltpu.VMEM)
    len_spec = pl.BlockSpec((b_tile, U), lambda bb, i: (bb, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_alpha_chain_kernel, n_t=T // T_CHUNK, U=U),
        grid=grid,
        in_specs=[lat_spec, lat_spec, len_spec, len_spec, len_spec, len_spec],
        out_specs=[lat_spec, len_spec, len_spec],
        out_shape=[jax.ShapeDtypeStruct((B, T, U), jnp.float32),
                   jax.ShapeDtypeStruct((B, U), jnp.float32),
                   jax.ShapeDtypeStruct((B, U), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((b_tile, U), jnp.float32),
                        pltpu.VMEM((b_tile, U), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_dp_vmem_limit(b_tile, U, 3)),
        interpret=_interpret(),
    )(lpb, lpl, t_lens_b, u_lens_b, t0_b, carry_in)


def _beta_chain_kernel(lpb_ref, lpl_ref, alphas_ref, tl_ref, ul_ref, ll_ref,
                       g_ref, t0_ref, carry_in_ref,
                       glpb_ref, glpl_ref, carry_out_ref, beta_carry, *,
                       n_t: int, U: int):
    i = pl.program_id(1)  # ascending; blocks index-mapped descending
    b_tile = tl_ref.shape[0]
    lane = _lane_iota((b_tile, U))
    t_lens = tl_ref[:]
    u_lens = ul_ref[:]
    ll = ll_ref[:]
    g = g_ref[:]
    t0 = t0_ref[:]

    @pl.when(i == 0)
    def _():
        beta_carry[:] = carry_in_ref[:]

    seed = jnp.where(lane == u_lens, 0.0, NEG)

    def row(r_, _):
        r = T_CHUNK - 1 - r_
        t = t0 + (n_t - 1 - i) * T_CHUNK + r
        lpb_row = lpb_ref[:, r, :]
        lpl_row = lpl_ref[:, r, :]
        alpha_row = alphas_ref[:, r, :]

        beta_next = jnp.where(t == t_lens - 1, seed, beta_carry[:])

        d = lpb_row + beta_next
        beta_row = _suffix_row_scan(d, lpl_row, U)

        valid = t < t_lens
        glpb_ref[:, r, :] = -g * jnp.exp(jnp.where(
            valid, alpha_row + lpb_row + beta_next - ll, NEG))
        beta_up = pltpu.roll(beta_row, U - 1, axis=1)  # == roll by -1
        beta_up = jnp.where(lane >= U - 1, NEG, beta_up)
        glpl_ref[:, r, :] = -g * jnp.exp(jnp.where(
            valid, alpha_row + lpl_row + beta_up - ll, NEG))

        beta_carry[:] = beta_row
        return _

    jax.lax.fori_loop(0, T_CHUNK, row, 0)

    @pl.when(i == n_t - 1)
    def _():
        carry_out_ref[:] = beta_carry[:]


def _beta_chain_pallas(lpb, lpl, alphas, t_lens_b, u_lens_b, ll_b, g_b,
                       t0_b, carry_in):
    """Local T-shard beta pass (descending).  Returns
    (glpb, glpl, carry_out) where carry_out is beta at this shard's first
    row — the previous shard's beta_next."""
    B, T, U = lpb.shape
    b_tile = _pick_b_tile(B)
    n_t = T // T_CHUNK
    grid = (B // b_tile, n_t)
    lat_desc = pl.BlockSpec((b_tile, T_CHUNK, U),
                            lambda bb, i: (bb, n_t - 1 - i, 0),
                            memory_space=pltpu.VMEM)
    len_spec = pl.BlockSpec((b_tile, U), lambda bb, i: (bb, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_beta_chain_kernel, n_t=n_t, U=U),
        grid=grid,
        in_specs=[lat_desc, lat_desc, lat_desc, len_spec, len_spec,
                  len_spec, len_spec, len_spec, len_spec],
        out_specs=[lat_desc, lat_desc, len_spec],
        out_shape=[jax.ShapeDtypeStruct((B, T, U), jnp.float32),
                   jax.ShapeDtypeStruct((B, T, U), jnp.float32),
                   jax.ShapeDtypeStruct((B, U), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((b_tile, U), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_dp_vmem_limit(b_tile, U, 5)),
        interpret=_interpret(),
    )(lpb, lpl, alphas, t_lens_b, u_lens_b, ll_b, g_b, t0_b, carry_in)


# ------------------------------- backward -------------------------------

def _beta_kernel(lpb_ref, lpl_ref, alphas_ref, tl_ref, ul_ref, ll_ref,
                 g_ref, glpb_ref, glpl_ref, beta_carry, *, n_t: int, U: int):
    i = pl.program_id(1)  # ascending; blocks are index-mapped descending
    b_tile = tl_ref.shape[0]
    lane = _lane_iota((b_tile, U))
    t_lens = tl_ref[:]
    u_lens = ul_ref[:]
    ll = ll_ref[:]
    g = g_ref[:]

    @pl.when(i == 0)
    def _():
        beta_carry[:] = jnp.full((b_tile, U), NEG)

    seed = jnp.where(lane == u_lens, 0.0, NEG)

    def row(r_, _):
        r = T_CHUNK - 1 - r_
        t = (n_t - 1 - i) * T_CHUNK + r
        lpb_row = lpb_ref[:, r, :]
        lpl_row = lpl_ref[:, r, :]
        alpha_row = alphas_ref[:, r, :]

        beta_next = jnp.where(t == t_lens - 1, seed, beta_carry[:])

        d = lpb_row + beta_next
        beta_row = _suffix_row_scan(d, lpl_row, U)

        # Mask inside the exp: padded rows hold finite junk whose exp could
        # overflow and then NaN when multiplied by a zero mask.
        valid = t < t_lens
        glpb_ref[:, r, :] = -g * jnp.exp(jnp.where(
            valid, alpha_row + lpb_row + beta_next - ll, NEG))
        beta_up = pltpu.roll(beta_row, U - 1, axis=1)  # == roll by -1
        beta_up = jnp.where(lane >= U - 1, NEG, beta_up)
        glpl_ref[:, r, :] = -g * jnp.exp(jnp.where(
            valid, alpha_row + lpl_row + beta_up - ll, NEG))

        beta_carry[:] = beta_row
        return _

    jax.lax.fori_loop(0, T_CHUNK, row, 0)


def _beta_pallas(lpb, lpl, alphas, t_lens_b, u_lens_b, ll_b, g_b):
    B, T, U = lpb.shape
    b_tile = _pick_b_tile(B)
    n_t = T // T_CHUNK
    grid = (B // b_tile, n_t)
    # T blocks visited in DESCENDING order.
    lat_desc = pl.BlockSpec((b_tile, T_CHUNK, U),
                            lambda bb, i: (bb, n_t - 1 - i, 0),
                            memory_space=pltpu.VMEM)
    len_spec = pl.BlockSpec((b_tile, U), lambda bb, i: (bb, 0),
                            memory_space=pltpu.VMEM)
    glpb, glpl = pl.pallas_call(
        functools.partial(_beta_kernel, n_t=n_t, U=U),
        grid=grid,
        in_specs=[lat_desc, lat_desc, lat_desc, len_spec, len_spec,
                  len_spec, len_spec],
        out_specs=[lat_desc, lat_desc],
        out_shape=[jax.ShapeDtypeStruct((B, T, U), jnp.float32),
                   jax.ShapeDtypeStruct((B, T, U), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((b_tile, U), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_dp_vmem_limit(b_tile, U, 5)),
        interpret=_interpret(),
    )(lpb, lpl, alphas, t_lens_b, u_lens_b, ll_b, g_b)
    return glpb, glpl


# ------------------------------ public op ------------------------------

def _pad_to(x, axis, mult, value=0.0):
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _pad_lattice(lp_blank, lp_label):
    """Pad (B, T, U) inputs to kernel tile multiples; padded label columns
    stay log-zero so the row scan can't walk through them."""
    U = lp_blank.shape[2]
    lpb = _pad_to(_pad_to(lp_blank.astype(jnp.float32), 2, 128), 1, T_CHUNK)
    lpl = _pad_to(_pad_to(lp_label.astype(jnp.float32), 2, 128), 1, T_CHUNK)
    if lpl.shape[2] != U:
        u_pad_mask = jnp.arange(lpl.shape[2]) >= U
        lpl = jnp.where(u_pad_mask[None, None, :], NEG, lpl)
    return lpb, lpl


def _alpha_unpadded(lp_blank, lp_label, t_lens, u_lens):
    """(losses (B,), alphas (B, T, U)) with all padding internal — the
    boundary shapes are the caller's, so the op partitions cleanly over B
    (per-shard local shapes pad independently)."""
    B, T, U = lp_blank.shape
    lpb, lpl = _pad_lattice(lp_blank, lp_label)
    pad_b = (-B) % B_TILE
    if pad_b:
        lpb = jnp.pad(lpb, ((0, pad_b), (0, 0), (0, 0)))
        lpl = jnp.pad(lpl, ((0, pad_b), (0, 0), (0, 0)),
                      constant_values=NEG)
        t_lens = jnp.pad(t_lens, (0, pad_b), constant_values=1)
        u_lens = jnp.pad(u_lens, (0, pad_b), constant_values=0)
    Bp, _, Up = lpb.shape
    tl_b = jnp.broadcast_to(t_lens.astype(jnp.int32)[:, None], (Bp, Up))
    ul_b = jnp.broadcast_to(u_lens.astype(jnp.int32)[:, None], (Bp, Up))
    alphas, llmask = _alpha_pallas(lpb, lpl, tl_b, ul_b)
    losses = -jnp.sum(llmask, axis=1)[:B]
    return losses, alphas[:B, :T, :U]


def _beta_unpadded(lp_blank, lp_label, alphas, t_lens, u_lens, losses, g):
    """(glp_blank, glp_label), both (B, T, U); padding internal as above."""
    B, T, U = lp_blank.shape
    lpb, lpl = _pad_lattice(lp_blank, lp_label)
    al = _pad_to(_pad_to(alphas.astype(jnp.float32), 2, 128), 1, T_CHUNK)
    pad_b = (-B) % B_TILE
    if pad_b:
        lpb = jnp.pad(lpb, ((0, pad_b), (0, 0), (0, 0)))
        lpl = jnp.pad(lpl, ((0, pad_b), (0, 0), (0, 0)),
                      constant_values=NEG)
        al = jnp.pad(al, ((0, pad_b), (0, 0), (0, 0)))
        t_lens = jnp.pad(t_lens, (0, pad_b), constant_values=1)
        u_lens = jnp.pad(u_lens, (0, pad_b), constant_values=0)
        losses = jnp.pad(losses, (0, pad_b))
        g = jnp.pad(g, (0, pad_b))
    Bp, _, Up = lpb.shape
    tl_b = jnp.broadcast_to(t_lens.astype(jnp.int32)[:, None], (Bp, Up))
    ul_b = jnp.broadcast_to(u_lens.astype(jnp.int32)[:, None], (Bp, Up))
    ll_b = jnp.broadcast_to((-losses)[:, None], (Bp, Up)).astype(jnp.float32)
    g_b = jnp.broadcast_to(g.astype(jnp.float32)[:, None], (Bp, Up))
    glpb, glpl = _beta_pallas(lpb, lpl, al, tl_b, ul_b, ll_b, g_b)
    return glpb[:B, :T, :U], glpl[:B, :T, :U]


# GSPMD-partitionable wrappers: the lattice DP is embarrassingly parallel
# over B, so under a sharded jit each device runs its own batch shard —
# no mesh threading, no shard_map at the call sites.
from rnnt_tpu.parallel.partition import batch_partitioned  # noqa: E402

_alpha_cp = batch_partitioned(
    _alpha_unpadded, "bbbb", "bb",
    "b t u, b t u, b, b -> b, b t u")
_beta_cp = batch_partitioned(
    _beta_unpadded, "bbbbbbb", "bb",
    "b t u, b t u, b t u, b, b, b, b -> b t u, b t u")


@jax.custom_vjp
def transducer_alpha_loss_fast(lp_blank, lp_label, t_lens, u_lens):
    """Per-sample negative log-likelihood, shape (B,) — Pallas fast path
    with the same contract as ``transducer_alpha_loss``."""
    losses, _ = _alpha_cp(lp_blank, lp_label, t_lens, u_lens)
    return losses


def _fast_fwd(lp_blank, lp_label, t_lens, u_lens):
    losses, alphas = _alpha_cp(lp_blank, lp_label, t_lens, u_lens)
    return losses, (lp_blank, lp_label, alphas, t_lens, u_lens, losses)


def _fast_bwd(res, g):
    lp_blank, lp_label, alphas, t_lens, u_lens, losses = res
    glpb, glpl = _beta_cp(lp_blank, lp_label, alphas, t_lens, u_lens,
                          losses, g)
    return glpb, glpl, None, None


transducer_alpha_loss_fast.defvjp(_fast_fwd, _fast_bwd)
