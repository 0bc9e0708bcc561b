"""Causal conv unit tests.

Port of the *ideas* in reference rnnt/tests/test_audioencoder.py (shape
arithmetic, causality-by-perturbation, lookahead, output-length parity) plus
a torch.nn.functional.conv1d oracle for numerical parity.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from rnnt_tpu.ops.causal_conv import (
    ConvSpec,
    causal_conv_apply,
    causal_conv_init,
    causal_conv_out_len,
    causal_conv_streaming,
    streaming_init_state,
)

SPECS = [
    ConvSpec(8, 16, kernel_size=3, stride=1, dilation=1),
    ConvSpec(8, 16, kernel_size=11, stride=2, dilation=1),
    ConvSpec(8, 16, kernel_size=5, stride=1, dilation=2),
    ConvSpec(8, 16, kernel_size=29, stride=1, dilation=2),
    ConvSpec(8, 16, kernel_size=7, stride=3, dilation=1),
]


def _torch_reference(params, x, spec):
    """Left-pad + conv1d with torch as an independent oracle."""
    xt = torch.from_numpy(np.asarray(x)).permute(0, 2, 1)  # (B, C, T)
    w = torch.from_numpy(np.asarray(params["w"])).permute(2, 1, 0)  # (Cout, Cin, K)
    b = torch.from_numpy(np.asarray(params["b"]))
    xt = F.pad(xt, (spec.left_padding, 0))
    y = F.conv1d(xt, w, b, stride=spec.stride, dilation=spec.dilation)
    return y.permute(0, 2, 1).numpy()


@pytest.mark.parametrize("spec", SPECS)
def test_matches_torch_and_out_len(spec):
    key = jax.random.PRNGKey(0)
    params = causal_conv_init(key, spec)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 37, spec.in_channels))
    y = causal_conv_apply(params, x, spec)
    ref = _torch_reference(params, x, spec)
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-5)
    assert y.shape[1] == causal_conv_out_len(37, spec)


@pytest.mark.parametrize("spec", SPECS)
def test_causality_by_perturbation(spec):
    """Mutating the last input frame must not change earlier outputs
    (reference rnnt/tests/test_audioencoder.py:32-47)."""
    params = causal_conv_init(jax.random.PRNGKey(0), spec)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 40, spec.in_channels))
    y = causal_conv_apply(params, x, spec)
    x2 = x.at[:, -1, :].set(99.0)
    y2 = causal_conv_apply(params, x2, spec)
    # Find which output frames can legally see input frame 39: out frame o
    # covers inputs up to o*stride + (k-1)*d - left_pad.
    diff = np.abs(np.asarray(y - y2)).max(axis=(0, 2))
    last_o = y.shape[1] - 1
    for o in range(y.shape[1]):
        last_visible = o * spec.stride + (spec.kernel_size - 1) * spec.dilation - spec.left_padding
        if last_visible < 39:
            assert diff[o] == 0.0, f"output {o} changed but can't see frame 39"
    # The last output frame sees frame 39 iff the stride arithmetic reaches it
    # (with stride > 1 the tail input may not be consumed yet — it stays in
    # the streaming state instead).
    if last_o * spec.stride + (spec.kernel_size - 1) * spec.dilation - spec.left_padding >= 39:
        assert diff[last_o] > 0.0, "last output should see the last input"


def test_additional_context_lookahead():
    """additional_context shifts the window to see bounded future
    (reference rnnt/tests/test_audioencoder.py:49-64)."""
    spec = ConvSpec(4, 4, kernel_size=5, stride=1, dilation=1, additional_context=2)
    params = causal_conv_init(jax.random.PRNGKey(0), spec)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 30, 4))
    y = causal_conv_apply(params, x, spec)
    # Perturb frame 10; outputs at t in [10-  (k-1-ac) .. ] change: output t
    # sees inputs [t - (k-1) + ac, t + ac].
    x2 = x.at[:, 10, :].set(50.0)
    y2 = causal_conv_apply(params, x2, spec)
    diff = np.abs(np.asarray(y - y2)).max(axis=(0, 2))
    changed = np.nonzero(diff > 0)[0]
    assert changed.min() == 10 - spec.additional_context
    assert changed.max() == 10 + spec.kernel_size - 1 - spec.additional_context


@pytest.mark.parametrize("spec", SPECS)
@pytest.mark.parametrize("chunk", [2, 4, 6])
def test_streaming_equals_batch(spec, chunk):
    """Chunked streaming output must equal the batch output
    (reference rnnt/tests/test_streaming.py:80-132)."""
    if chunk % spec.stride != 0:
        pytest.skip("chunk must be divisible by stride to keep state length fixed")
    params = causal_conv_init(jax.random.PRNGKey(0), spec)
    T = 24
    x = jax.random.normal(jax.random.PRNGKey(1), (2, T, spec.in_channels))
    full = causal_conv_apply(params, x, spec)

    state = streaming_init_state(2, spec)
    outs = []
    for i in range(0, T, chunk):
        y, state = causal_conv_streaming(params, x[:, i:i + chunk, :], state, spec)
        outs.append(y)
    streamed = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(streamed), np.asarray(full[:, :streamed.shape[1], :]), atol=1e-5)


def test_out_len_matches_reference_formula():
    """Length arithmetic vs actual output across lengths 10..30
    (reference rnnt/tests/test_audioencoder.py:133-147)."""
    spec = ConvSpec(4, 4, kernel_size=11, stride=2, dilation=1)
    params = causal_conv_init(jax.random.PRNGKey(0), spec)
    for L in range(10, 31):
        x = jnp.zeros((1, L, 4))
        y = causal_conv_apply(params, x, spec)
        assert y.shape[1] == causal_conv_out_len(L, spec), L
