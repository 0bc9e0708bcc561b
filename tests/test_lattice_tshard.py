"""Sequence-parallel (T-sharded) lattice vs the single-device oracle.

SURVEY.md §5: the CP analog for transducers is sharding the T axis of the
(B, T, U) lattice across devices with ICI exchange of the alpha/beta
wavefront boundary rows.  These tests run the chain on a real
(data, model) mesh (virtual CPU devices, kernels in interpret mode) and
assert loss AND gradient equality with the unsharded XLA-scan oracle.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rnnt_tpu.ops.lattice_tshard import transducer_alpha_loss_tsharded
from rnnt_tpu.ops.transducer import transducer_alpha_loss
from rnnt_tpu.parallel.mesh import make_mesh


def _problem(B, T, U1, seed=0):
    rng = np.random.RandomState(seed)
    lpb = jnp.asarray(np.log(rng.uniform(0.2, 0.8, (B, T, U1))
                             ).astype(np.float32))
    lpl = jnp.asarray(np.log(rng.uniform(0.1, 0.6, (B, T, U1))
                             ).astype(np.float32))
    t_lens = jnp.asarray(rng.randint(T // 2, T + 1, (B,)), jnp.int32)
    u_lens = jnp.asarray(rng.randint(1, U1, (B,)), jnp.int32)
    return lpb, lpl, t_lens, u_lens


@pytest.mark.parametrize("n_shards", [2, 4])
def test_tsharded_loss_matches_oracle(n_shards):
    mesh = make_mesh(data=8 // n_shards, model=n_shards)
    B, T, U1 = 2, 2 * 128 + 37, 9  # T deliberately not shard-aligned
    lpb, lpl, t_lens, u_lens = _problem(B, T, U1)

    want = transducer_alpha_loss(lpb, lpl, t_lens, u_lens)
    got = jax.jit(lambda a, b: transducer_alpha_loss_tsharded(
        a, b, t_lens, u_lens, mesh))(lpb, lpl)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_tsharded_grads_match_oracle():
    mesh = make_mesh(data=4, model=2)
    B, T, U1 = 2, 150, 7
    lpb, lpl, t_lens, u_lens = _problem(B, T, U1, seed=3)

    def loss_ref(a, b):
        return jnp.sum(transducer_alpha_loss(a, b, t_lens, u_lens))

    def loss_ts(a, b):
        return jnp.sum(transducer_alpha_loss_tsharded(
            a, b, t_lens, u_lens, mesh))

    want = jax.grad(loss_ref, argnums=(0, 1))(lpb, lpl)
    got = jax.jit(jax.grad(loss_ts, argnums=(0, 1)))(lpb, lpl)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-4, atol=1e-5)
