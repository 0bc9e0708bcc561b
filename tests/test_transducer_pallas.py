"""Pallas fused lattice kernel vs the XLA chunked path (interpret mode on
CPU; the same kernels compile for real on TPU).  Values and gradients must
agree — this is the parity gate for the speed-of-light loss path.
"""

import numpy as np
import jax
import jax.flatten_util
import jax.numpy as jnp
import pytest

from rnnt_tpu.models.joint import JointSpec, joint_init
from rnnt_tpu.ops.transducer import transducer_loss
from rnnt_tpu.ops.transducer_pallas import transducer_loss_pallas


def _case(B=2, T=24, U=11, H=128, V=128, seed=0, with_proj=False):
    key = jax.random.PRNGKey(seed)
    spec = JointSpec(audio_features=H if with_proj else -1,
                     text_features=H if with_proj else -1,
                     hidden_features=H, num_classes=V)
    params = joint_init(key, spec)
    audio = jax.random.normal(jax.random.PRNGKey(seed + 1), (B, T, H)) * 0.5
    text = jax.random.normal(jax.random.PRNGKey(seed + 2), (B, U + 1, H)) * 0.5
    targets = jax.random.randint(jax.random.PRNGKey(seed + 3), (B, U), 0, V - 1)
    t_lens = jnp.array([T, T - 5][:B])
    u_lens = jnp.array([U, U - 3][:B])
    return spec, params, audio, text, targets, t_lens, u_lens


@pytest.mark.parametrize("with_proj", [False, True])
def test_pallas_loss_matches_xla(with_proj):
    spec, params, audio, text, targets, t_lens, u_lens = _case(
        with_proj=with_proj)

    ref = transducer_loss(params, audio, text, targets, t_lens, u_lens,
                          spec.blank_idx, chunk_size=8)
    out = transducer_loss_pallas(params, audio, text, targets, t_lens,
                                 u_lens, spec.blank_idx)
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-4, atol=1e-4)


def test_pallas_grads_match_xla():
    spec, params, audio, text, targets, t_lens, u_lens = _case()

    def f_ref(p, a, x):
        return transducer_loss(p, a, x, targets, t_lens, u_lens,
                               spec.blank_idx, chunk_size=8)

    def f_pal(p, a, x):
        return transducer_loss_pallas(p, a, x, targets, t_lens, u_lens,
                                      spec.blank_idx)

    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(params, audio, text)
    g_pal = jax.grad(f_pal, argnums=(0, 1, 2))(params, audio, text)
    fr, _ = jax.flatten_util.ravel_pytree(g_ref)
    fp, _ = jax.flatten_util.ravel_pytree(g_pal)
    np.testing.assert_allclose(np.asarray(fp), np.asarray(fr),
                               rtol=2e-3, atol=1e-5)


def test_pallas_nonaligned_shapes():
    """T/U not multiples of the tiles exercise the padding path."""
    spec, params, audio, text, targets, t_lens, u_lens = _case(T=19, U=6)
    ref = transducer_loss(params, audio, text, targets, t_lens, u_lens,
                          spec.blank_idx, chunk_size=8)
    out = transducer_loss_pallas(params, audio, text, targets, t_lens,
                                 u_lens, spec.blank_idx)
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-4, atol=1e-4)


def test_pallas_multi_u_tile_grads():
    """U1 > 128 forces the 128-wide multi-tile lattice grid (j > 0 paths:
    dpred slab accumulation, per-tile onehot blocks) — values and grads
    must still match the XLA path."""
    spec, params, audio, text, targets, t_lens, u_lens = _case(
        B=2, T=12, U=140, H=128, V=128, seed=5)

    def f_ref(p, a, x):
        return transducer_loss(p, a, x, targets, t_lens, u_lens,
                               spec.blank_idx, chunk_size=8)

    def f_pal(p, a, x):
        return transducer_loss_pallas(p, a, x, targets, t_lens, u_lens,
                                      spec.blank_idx)

    ref = f_ref(params, audio, text)
    out = f_pal(params, audio, text)
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-4, atol=1e-4)

    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(params, audio, text)
    g_pal = jax.grad(f_pal, argnums=(0, 1, 2))(params, audio, text)
    fr, _ = jax.flatten_util.ravel_pytree(g_ref)
    fp, _ = jax.flatten_util.ravel_pytree(g_pal)
    np.testing.assert_allclose(np.asarray(fp), np.asarray(fr),
                               rtol=2e-3, atol=1e-5)
