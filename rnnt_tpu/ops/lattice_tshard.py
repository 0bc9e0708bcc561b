"""Sequence-parallel (T-sharded) transducer lattice — the CP analog.

The reference handles long audio only by refusing it (the max_joint_size
batch-halving guard, rnnt/train.py:120-130).  SURVEY.md §5 names the
TPU-native answer: shard the T axis of the (B, T, U) lattice across devices
and exchange the alpha/beta wavefront boundary rows over ICI.  This module
implements it:

* every device holds a contiguous T-shard of the blank/label log-probs and
  runs the local DP chain kernels (ops/lattice_pallas.py `_alpha_chain_*`);
* the (B, U) boundary row travels device-to-device via `lax.ppermute` — a
  sequential pipeline (the recursion over T is inherently ordered), so this
  scales *memory*, not latency: audio too long for one device's HBM share
  decodes/trains with per-device O(T/n) lattice state;
* the backward runs the beta chain in the reverse direction.

Composable under `jax.shard_map` with the batch axis sharded on "data" and
T on a second mesh axis — lattice rows live only on their owning device.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from rnnt_tpu.ops.lattice_pallas import (
    B_TILE,
    T_CHUNK,
    _alpha_chain_pallas,
    _beta_chain_pallas,
    _pad_lattice,
    _pick_b_tile,
)
from rnnt_tpu.ops.transducer import NEG


def _pad_batch(arrs, t_lens, u_lens, pad_value=0.0):
    B = arrs[0].shape[0]
    b_tile = _pick_b_tile(-(-B // B_TILE) * B_TILE)
    pad_b = (-B) % b_tile
    if pad_b:
        arrs = [jnp.pad(a, ((0, pad_b),) + ((0, 0),) * (a.ndim - 1),
                        constant_values=pad_value) for a in arrs]
        t_lens = jnp.pad(t_lens, (0, pad_b), constant_values=1)
        u_lens = jnp.pad(u_lens, (0, pad_b), constant_values=0)
    return arrs, t_lens, u_lens, B


def _chain_fwd_local(lpb, lpl, t_lens, u_lens, axis: str, n: int):
    """Per-shard forward: run the alpha chain stage-by-stage, passing the
    carry row over ICI.  Returns (losses (B,), alphas local)."""
    # U/T padding happened globally before shard_map; only batch pads here.
    (arrs, tl, ul, B) = _pad_batch([lpb, lpl], t_lens, u_lens)
    lpb_p, lpl_p = arrs
    Bp, Tl, U = lpb_p.shape

    d = lax.axis_index(axis)
    tl_b = jnp.broadcast_to(tl.astype(jnp.int32)[:, None], (Bp, U))
    ul_b = jnp.broadcast_to(ul.astype(jnp.int32)[:, None], (Bp, U))
    t0_b = jnp.broadcast_to((d * Tl).astype(jnp.int32), (Bp, U))

    carry = jnp.full((Bp, U), NEG, jnp.float32)
    alphas = jnp.zeros((Bp, Tl, U), jnp.float32)
    llm = jnp.zeros((Bp, U), jnp.float32)
    for s in range(n):
        a, m, carry = lax.cond(
            d == s,
            lambda c: _alpha_chain_pallas(lpb_p, lpl_p, tl_b, ul_b, t0_b, c),
            lambda c: (alphas, llm, c),
            carry)
        alphas = alphas + jnp.where(d == s, a, 0.0)
        llm = llm + jnp.where(d == s, m, 0.0)
        if s < n - 1:
            carry = lax.ppermute(carry, axis,
                                 [(i, i + 1) for i in range(n - 1)])
    losses = lax.psum(-jnp.sum(llm, axis=1), axis)[:B]
    return losses, alphas


def _chain_bwd_local(lpb, lpl, alphas_p, t_lens, u_lens, losses, g,
                     axis: str, n: int):
    """Per-shard backward: beta chain in reverse shard order."""
    (arrs, tl, ul, B) = _pad_batch([lpb, lpl], t_lens, u_lens)
    lpb_p, lpl_p = arrs
    Bp, Tl, U = lpb_p.shape
    pad_b = Bp - B
    if pad_b:
        losses = jnp.pad(losses, (0, pad_b))
        g = jnp.pad(g, (0, pad_b))

    d = lax.axis_index(axis)
    tl_b = jnp.broadcast_to(tl.astype(jnp.int32)[:, None], (Bp, U))
    ul_b = jnp.broadcast_to(ul.astype(jnp.int32)[:, None], (Bp, U))
    t0_b = jnp.broadcast_to((d * Tl).astype(jnp.int32), (Bp, U))
    ll_b = jnp.broadcast_to((-losses)[:, None], (Bp, U)).astype(jnp.float32)
    g_b = jnp.broadcast_to(g.astype(jnp.float32)[:, None], (Bp, U))

    carry = jnp.full((Bp, U), NEG, jnp.float32)
    glpb = jnp.zeros((Bp, Tl, U), jnp.float32)
    glpl = jnp.zeros((Bp, Tl, U), jnp.float32)
    for s in reversed(range(n)):
        gb, gl, carry = lax.cond(
            d == s,
            lambda c: _beta_chain_pallas(lpb_p, lpl_p, alphas_p, tl_b, ul_b,
                                         ll_b, g_b, t0_b, c),
            lambda c: (glpb, glpl, c),
            carry)
        glpb = glpb + jnp.where(d == s, gb, 0.0)
        glpl = glpl + jnp.where(d == s, gl, 0.0)
        if s > 0:
            carry = lax.ppermute(carry, axis,
                                 [(i + 1, i) for i in range(n - 1)])
    return glpb[:B], glpl[:B]


def _make_chain_loss(mesh, axis: str, n: int, batch_axis: str | None):
    """custom_vjp OUTSIDE the shard_maps: fwd and bwd are each their own
    shard_map call, so AD never traces across a shard_map boundary.  (With
    the vjp inside a single shard_map, the transpose under check_vma=False
    splits the unmapped-output cotangent 1/n per device — grads came out
    exactly want/n.)

    ``batch_axis`` composes with data parallelism: lattice/length/loss
    batch dims shard over it (each (data, model) sub-row of the mesh runs
    an independent chain over its batch shard)."""
    shard_map = jax.shard_map

    ba = batch_axis
    spec_t = P(ba, axis, None)
    spec_b = P(ba)

    fwd_sm = shard_map(
        partial(_chain_fwd_local, axis=axis, n=n),
        mesh=mesh,
        in_specs=(spec_t, spec_t, spec_b, spec_b),
        out_specs=(spec_b, spec_t),
        check_vma=False)

    bwd_sm = shard_map(
        partial(_chain_bwd_local, axis=axis, n=n),
        mesh=mesh,
        in_specs=(spec_t, spec_t, spec_t, spec_b, spec_b, spec_b, spec_b),
        out_specs=(spec_t, spec_t),
        check_vma=False)

    @jax.custom_vjp
    def chain_loss(lpb, lpl, t_lens, u_lens):
        losses, _ = fwd_sm(lpb, lpl, t_lens, u_lens)
        return losses

    def fwd(lpb, lpl, t_lens, u_lens):
        losses, alphas = fwd_sm(lpb, lpl, t_lens, u_lens)
        return losses, (lpb, lpl, alphas, t_lens, u_lens, losses)

    def bwd(res, g):
        lpb, lpl, alphas, t_lens, u_lens, losses = res
        glpb, glpl = bwd_sm(lpb, lpl, alphas, t_lens, u_lens, losses, g)
        return glpb, glpl, None, None

    chain_loss.defvjp(fwd, bwd)
    return chain_loss


def transducer_alpha_loss_tsharded(lp_blank, lp_label, t_lens, u_lens, mesh,
                                   axis: str = "model",
                                   batch_axis: str | None = None):
    """Per-sample NLL (B,) with the T axis sharded over ``mesh[axis]``.

    Same contract as ``transducer_alpha_loss_fast``; lattice rows stay on
    their owning device (only (B, U) boundary rows cross ICI).  T is padded
    so every shard holds an equal T_CHUNK-aligned block; U pads to 128
    lanes (padding columns forced to log-zero by the local chain).
    ``batch_axis`` additionally shards the batch dim (data parallelism);
    B must then divide by ``mesh[batch_axis]``.
    """
    n = mesh.shape[axis]
    B, T, U = lp_blank.shape

    lpb, lpl = _pad_lattice(lp_blank, lp_label)
    step = n * T_CHUNK
    pad_t = (-lpb.shape[1]) % step
    if pad_t:
        lpb = jnp.pad(lpb, ((0, 0), (0, pad_t), (0, 0)))
        lpl = jnp.pad(lpl, ((0, 0), (0, pad_t), (0, 0)), constant_values=NEG)

    fn = _make_chain_loss(mesh, axis, n, batch_axis)
    return fn(lpb, lpl, t_lens.astype(jnp.int32), u_lens.astype(jnp.int32))
