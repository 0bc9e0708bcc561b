"""Optimizer and LR schedule.

Parity: AdamW with the reference's hyperparameters (reference
rnnt/config/basic_sp_convjs.yaml:88-93) and the linear-warmup → cosine decay
→ min-ratio-floor schedule (reference rnnt/lr_sched.py:33-42), built on
optax and gradient-clipped by global norm (reference rnnt/train.py:136).
"""

from __future__ import annotations

import math

import optax

from rnnt_tpu.config.config import TrainingConfig


def warmup_cosine_schedule(base_lr: float, warmup_steps: int,
                           total_steps: int, min_lr_ratio: float = 0.05):
    """Reference semantics (rnnt/lr_sched.py:33-42): linear 0→lr over
    warmup_steps (step counter starting at 1), then cosine to
    base_lr * min_lr_ratio."""

    def schedule(step):
        import jax.numpy as jnp

        s = step + 1  # torch scheduler's _step_count starts at 1
        warm = s / max(1, warmup_steps)
        progress = (s - warmup_steps) / max(1, total_steps - warmup_steps)
        progress = jnp.clip(progress, 0.0, 1.0)
        cos = 0.5 * (1.0 + jnp.cos(math.pi * progress))
        decayed = (1.0 - min_lr_ratio) * cos + min_lr_ratio
        factor = jnp.where(s <= warmup_steps, warm, decayed)
        return base_lr * factor

    return schedule


def make_optimizer(tc: TrainingConfig, total_steps: int):
    """Returns (optax transform, schedule fn).  With
    ``accumulate_steps > 1`` gradients accumulate across microbatches
    before each optimizer update (absent in the reference — its
    ``perstep_batch_size`` is commented out, config basic_sp_convjs:81)."""
    oc = tc.optimizer
    sched = warmup_cosine_schedule(oc.lr, tc.lr_schedule.warmup_steps,
                                   total_steps, tc.lr_schedule.min_lr_ratio)
    tx = optax.chain(
        optax.clip_by_global_norm(tc.clip_grad_norm),
        optax.adamw(learning_rate=sched, b1=oc.betas[0], b2=oc.betas[1],
                    eps=oc.eps, weight_decay=oc.weight_decay),
    )
    if tc.accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=tc.accumulate_steps)
    return tx, sched
