"""Serving-export roundtrip: jax.export serialize -> deserialize -> call
must reproduce the live model (the reference's ONNX chain has no such
automated check — its converter bugs were found by hand,
rnnt-js/index.js:197-214).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import export as jexport

from rnnt_tpu.models.joint import JointSpec, joint_init, joint_single
from rnnt_tpu.models.predictor import ConvPredictorSpec, conv_predictor_apply, conv_predictor_init


def test_joint_roundtrip():
    spec = JointSpec(audio_features=-1, text_features=-1, hidden_features=32,
                     num_classes=16)
    params = joint_init(jax.random.PRNGKey(0), spec)
    a = jax.random.normal(jax.random.PRNGKey(1), (1, 32))
    t = jax.random.normal(jax.random.PRNGKey(2), (1, 32))

    fn = jax.jit(lambda x, y: joint_single(params, x, y))
    exported = jexport.export(fn)(a, t)
    blob = exported.serialize()
    restored = jexport.deserialize(blob)
    np.testing.assert_allclose(np.asarray(restored.call(a, t)),
                               np.asarray(fn(a, t)), rtol=1e-6)


def test_predictor_roundtrip():
    spec = ConvPredictorSpec(num_symbols=16, output_dim=24,
                             symbol_embedding_dim=8, dropout=0.0)
    params = conv_predictor_init(jax.random.PRNGKey(0), spec)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (1, 6), 0, 16)

    fn = jax.jit(lambda t: conv_predictor_apply(params, t, spec))
    exported = jexport.export(fn)(tokens)
    restored = jexport.deserialize(exported.serialize())
    np.testing.assert_allclose(np.asarray(restored.call(tokens)),
                               np.asarray(fn(tokens)), rtol=1e-5, atol=1e-6)
