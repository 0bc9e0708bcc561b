"""Arbitrary-start contiguous-window gather — the TPU-fast primitive behind
the device-side augmentation ops (data/augment_device.py).

Why this exists: XLA lowers `jnp.take_along_axis` with data-dependent
indices to a per-element gather that runs at ~22 ns/element on v5e
(measured, BASELINE.md round 3) — a (32, 80000) fractional-delay read
costs ~56 ms.  But the augmentation ops (chorus taps, rate-change
resampling, phase-vocoder analysis frames) never need *scattered* reads:
every consumer reads a short CONTIGUOUS window at an arbitrary per-block
start.  A tiny Pallas kernel fetches each window with one 128-aligned
dynamic slice plus one in-register lane rotate — HBM-bandwidth speed
instead of gather-unit speed — and a constant banded one-hot einsum
(`band_lerp`, MXU) turns windows into fractionally-interpolated outputs
with no per-element gather anywhere.

The same "gathers become one-hot matmuls" move the pruned loss uses for
its lattice reads (ops/transducer_pruned.py); reference counterpart: the
host DSP in data/augment.py (np.interp / sliding_window_view).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rnnt_tpu.parallel.partition import batch_partitioned


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _window_kernel(starts_ref, x_ref, out_ref, *, width: int, w2: int):
    """Per grid step: 8 windows of one batch row.

    starts_ref (B, Np) int32 in SMEM (scalar prefetch — arbitrary dynamic
    indexing is only legal there); x_ref (1, Lx) f32 (whole padded row —
    Pallas keeps it resident across the inner grid axis since its index_map
    only depends on the batch index); out_ref (1, 8, width).
    """
    b = pl.program_id(0)
    j = pl.program_id(1)
    for i in range(8):
        s = starts_ref[b, j * 8 + i]
        q = s // 128                       # aligned slice start (provably
        r = s - q * 128                    # a 128-multiple for Mosaic)
        win = x_ref[0, :, pl.ds(q * 128, w2)]          # (1, w2)
        # Left-rotate by r == positive right-rotate by w2 - r (pltpu.roll
        # takes positive shifts only); k < width reads win[k + r] with
        # k + r < width + 128 == w2, so no wraparound enters the output.
        win = pltpu.roll(win, w2 - r, axis=1)
        out_ref[0, pl.ds(i, 1), :] = win[:, :width]


def _gather_windows_impl(x, starts, *, width: int):
    B, L = x.shape
    N = starts.shape[1]
    w2 = width + 128
    # Pad so every aligned slice q*128 + w2 stays in bounds for any start
    # in [0, L-1]; padding reads as zeros (collation discipline: samples
    # are zero beyond their lens).
    Lx = -(-L // 128) * 128 + w2
    xp = jnp.pad(x.astype(jnp.float32),
                 ((0, 0), (0, Lx - L))).reshape(B, 1, Lx)
    Np = -(-N // 8) * 8
    sp = jnp.pad(jnp.clip(starts, 0, L - 1).astype(jnp.int32),
                 ((0, 0), (0, Np - N)))
    out = pl.pallas_call(
        functools.partial(_window_kernel, width=width, w2=w2),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, Np // 8),
            in_specs=[pl.BlockSpec((1, 1, Lx),
                                   lambda b, j, starts: (b, 0, 0))],
            out_specs=pl.BlockSpec((1, 8, width),
                                   lambda b, j, starts: (b, j, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B, Np, width), jnp.float32),
        interpret=_interpret(),
    )(sp, xp)
    return out[:, :N]


def gather_windows(x, starts, width: int):
    """out[b, n, k] = x[b, starts[b, n] + k] for k in [0, width).

    x (B, L) f32; starts (B, N) int32, clipped to [0, L-1]; width must be a
    multiple of 128.  Reads beyond L return 0.  Partitions along the batch
    axis under GSPMD (batch-pure op).
    """
    if width % 128 != 0:
        raise ValueError(f"width must be a multiple of 128, got {width}")

    def impl(x, starts):
        return _gather_windows_impl(x, starts, width=width)

    fn = batch_partitioned(impl, "bb", "b", "B L, B N -> B N w")
    return fn(x, starts)


def band_lerp(win, rel, s_lo: int, s_hi: int,
              max_chunk_bytes: int = 256 << 20):
    """Fractional interpolation of window rows without per-element gathers.

    win (B, N, W); rel (B, N, C) float window positions for each of C
    output lanes; requires floor(rel[..., l]) - l in [s_lo, s_hi] for every
    lane l (the caller aligns window starts so the per-lane offset stays in
    a small static band).  Returns y (B, N, C) with
    y[..., l] = (1-f)*win[..., i] + f*win[..., i+1], i = floor(rel), via

      y = sum_s hat(rel - (l + s)) * win[l + s],  s in [s_lo, s_hi + 1],

    where the shifted window columns come from ONE constant banded one-hot
    einsum on the MXU (f32 HIGHEST — exact selection) instead of W slices
    (lane-shift relayouts) or a gather.

    Memory: the einsum materializes a (B, N, C, S) f32 intermediate (plus
    its same-shape hat weights) — ~750 MB at B=32 x 5 s with S=74.  When
    that would exceed ``max_chunk_bytes`` the N axis is processed in
    ``lax.map`` chunks so larger batch x bucket combinations can't spike
    HBM (ADVICE r3 #4)."""
    B, N, W = win.shape
    C = rel.shape[-1]
    S = s_hi - s_lo + 2                      # +1 for the lerp upper tap
    l_ = np.arange(C)[None, :, None]
    s_ = np.arange(S)[None, None, :]
    m_ = np.arange(W)[:, None, None]
    T = jnp.asarray(m_ == l_ + s_lo + s_, jnp.float32)       # (W, C, S)
    offs = jnp.asarray(l_ + s_lo + s_, jnp.float32)

    def compute(win, rel):
        wb = jnp.einsum("bnm,mls->bnls", win, T,
                        precision=jax.lax.Precision.HIGHEST)  # (B, n, C, S)
        pos = rel[..., None] - offs
        w = jnp.maximum(0.0, 1.0 - jnp.abs(pos))
        return jnp.sum(wb * w, axis=-1)

    if 2 * B * N * C * S * 4 <= max_chunk_bytes:
        return compute(win, rel)
    nc = max(1, max_chunk_bytes // (2 * B * C * S * 4))
    G = -(-N // nc)
    pad = G * nc - N
    win_c = jnp.pad(win, ((0, 0), (0, pad), (0, 0)))
    rel_c = jnp.pad(rel, ((0, 0), (0, pad), (0, 0)))
    win_c = win_c.reshape(B, G, nc, W).transpose(1, 0, 2, 3)
    rel_c = rel_c.reshape(B, G, nc, C).transpose(1, 0, 2, 3)
    out = jax.lax.map(lambda a: compute(*a), (win_c, rel_c))  # (G, B, nc, C)
    return out.transpose(1, 0, 2, 3).reshape(B, G * nc, C)[:, :N]
