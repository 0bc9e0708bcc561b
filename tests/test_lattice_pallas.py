"""Pallas alpha/beta lattice recursion vs the XLA scan implementation —
values and gradients (interpret mode on CPU; same kernels compile on TPU).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rnnt_tpu.ops.lattice_pallas import transducer_alpha_loss_fast
from rnnt_tpu.ops.transducer import NEG, transducer_alpha_loss


def _case(B=3, T=40, U1=17, seed=0):
    rng = np.random.RandomState(seed)
    lpb = (rng.randn(B, T, U1) - 1.5).astype(np.float32)
    lpl = (rng.randn(B, T, U1) - 1.5).astype(np.float32)
    u_lens = rng.randint(1, U1, size=(B,)).astype(np.int32)
    t_lens = rng.randint(U1, T + 1, size=(B,)).astype(np.int32)
    # Labels beyond u_len are log-zero (the loss paths mask them upstream).
    u_mask = np.arange(U1)[None, :] < u_lens[:, None]
    lpl = np.where(u_mask[:, None, :], lpl, NEG).astype(np.float32)
    return (jnp.asarray(lpb), jnp.asarray(lpl), jnp.asarray(t_lens),
            jnp.asarray(u_lens))


@pytest.mark.parametrize("shape", [(3, 40, 17), (8, 128, 128), (2, 150, 31)])
def test_values_match_xla(shape):
    B, T, U1 = shape
    lpb, lpl, t_lens, u_lens = _case(B, T, U1)
    ref = transducer_alpha_loss(lpb, lpl, t_lens, u_lens)
    out = transducer_alpha_loss_fast(lpb, lpl, t_lens, u_lens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_grads_match_xla():
    lpb, lpl, t_lens, u_lens = _case(B=2, T=24, U1=9, seed=3)

    def f_ref(a, b):
        return jnp.sum(transducer_alpha_loss(a, b, t_lens, u_lens)
                       * jnp.asarray([1.0, 0.5]))

    def f_fast(a, b):
        return jnp.sum(transducer_alpha_loss_fast(a, b, t_lens, u_lens)
                       * jnp.asarray([1.0, 0.5]))

    gr = jax.grad(f_ref, argnums=(0, 1))(lpb, lpl)
    gf = jax.grad(f_fast, argnums=(0, 1))(lpb, lpl)
    for a, b in zip(gf, gr):
        assert np.isfinite(np.asarray(a)).all()
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-5)
