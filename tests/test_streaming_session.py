"""End-to-end streaming == offline equivalence (the reference's
load-bearing guarantee, rnnt/tests/test_streaming.py + rnnt-js runtime):
chunked audio through FeatureStreamer -> streaming encoder -> incremental
greedy decode must emit exactly the tokens offline decode emits over the
same frames.  Requires a norm whose statistics don't depend on the chunk
(batch norm with frozen stats — the reference's fullcausal deployment)."""

import numpy as np
import jax
import jax.numpy as jnp

from rnnt_tpu.decode.greedy import greedy_decode
from rnnt_tpu.decode.streaming import StreamingSession
from rnnt_tpu.models.encoder import EncoderSpec, JasperBlockSpec, encoder_apply
from rnnt_tpu.models.joint import JointSpec
from rnnt_tpu.models.predictor import ConvPredictorSpec
from rnnt_tpu.models.rnnt import RNNTSpec, rnnt_init
from rnnt_tpu.ops.stft import FeaturizerSpec, make_featurizer


def _small_fullcausal_spec():
    enc = EncoderSpec(
        input_features=201, norm_type="batch",
        prologue_kernel_size=11, prologue_stride=2,
        blocks=(JasperBlockSpec(5, 32, 32, 0.0, 2, "batch"),),
        epilogue_features=32, epilogue_kernel_size=9, epilogue_dilation=2,
        output_features=48)
    pred = ConvPredictorSpec(num_symbols=64, output_dim=48,
                             symbol_embedding_dim=24, dropout=0.0)
    joint = JointSpec(audio_features=-1, text_features=-1,
                      hidden_features=48, num_classes=64)
    return RNNTSpec(encoder=enc, predictor=pred, joint=joint)


def _randomize_stats(state, key):
    leaves, treedef = jax.tree.flatten(state)
    keys = jax.random.split(key, len(leaves))
    return jax.tree.unflatten(
        treedef, [jax.random.uniform(k, l.shape, minval=0.5, maxval=1.5)
                  for k, l in zip(keys, leaves)])


def test_streaming_session_matches_offline():
    spec = _small_fullcausal_spec()
    fspec = FeaturizerSpec()
    params, model_state = rnnt_init(jax.random.PRNGKey(0), spec)
    model_state = _randomize_stats(model_state, jax.random.PRNGKey(5))
    # Bias the joint toward blank so the untrained model emits sparsely
    # (like a trained model) instead of spamming the per-frame cap.
    b = params["joint"]["out"]["b"]
    params["joint"]["out"]["b"] = b.at[spec.joint.blank_idx].set(2.5)

    rng = np.random.RandomState(0)
    wave = (rng.randn(16000).astype(np.float32) * 0.2
            + np.sin(2 * np.pi * 500 * np.arange(16000) / 16000)
            .astype(np.float32) * 0.3)

    # Streaming: 200 ms chunks.
    session = StreamingSession(params, model_state, spec, fspec)
    for i in range(0, len(wave), 3200):
        session.feed(wave[i:i + 3200])
    streamed_tokens = session.tokens()
    n_frames = session.encoder_frames_emitted
    assert n_frames > 0

    # Offline decode over exactly the encoder frames the stream produced.
    featurize = make_featurizer(fspec)
    feats = featurize(wave[None, :])
    enc, _ = encoder_apply(params["encoder"], model_state["encoder"], feats,
                           spec.encoder, training=False)
    assert enc.shape[1] >= n_frames
    dec_params = {"predictor": params["predictor"], "joint": params["joint"]}
    tokens, counts = greedy_decode(
        dec_params, enc[:, :n_frames, :], jnp.asarray([n_frames]),
        spec.predictor, spec.joint, max_tokens=64)
    offline = list(np.asarray(tokens[0, : int(counts[0])]))

    assert offline == streamed_tokens, (
        f"streamed {streamed_tokens} != offline {offline}")


def test_session_pool_matches_single_sessions():
    """Pool-multiplexed streams (different feed paces, padded sub-batches,
    gather/scatter lanes) must emit exactly what dedicated per-stream
    sessions emit."""
    from rnnt_tpu.decode.streaming import StreamingSessionPool

    spec = _small_fullcausal_spec()
    fspec = FeaturizerSpec()
    params, model_state = rnnt_init(jax.random.PRNGKey(1), spec)
    model_state = _randomize_stats(model_state, jax.random.PRNGKey(6))
    b = params["joint"]["out"]["b"]
    params["joint"]["out"]["b"] = b.at[spec.joint.blank_idx].set(2.0)

    rng = np.random.RandomState(3)
    waves = [rng.randn(12800).astype(np.float32) * 0.3 for _ in range(3)]

    expected = []
    for w in waves:
        s = StreamingSession(params, model_state, spec, fspec)
        for i in range(0, len(w), 3200):
            s.feed(w[i:i + 3200])
        expected.append(s.tokens())

    pool = StreamingSessionPool(params, model_state, spec, fspec, slots=4,
                                chunk_seconds=0.2)
    slots = [pool.open() for _ in range(3)]
    # Interleave feeds at different paces: stream 0 gets 200 ms at a time,
    # stream 1 gets 400 ms, stream 2 arrives late.
    pos = [0, 0, 0]
    step_sizes = [3200, 6400, 3200]
    for tick in range(10):
        for j in range(3):
            if j == 2 and tick < 2:
                continue
            lo = pos[j]
            hi = min(lo + step_sizes[j], len(waves[j]))
            if lo < hi:
                pool.feed(slots[j], waves[j][lo:hi])
                pos[j] = hi
        pool.pump()
    for j in range(3):
        assert pool.tokens(slots[j]) == expected[j], (
            f"stream {j}: pool {pool.tokens(slots[j])} != {expected[j]}")

    st = pool.stats()
    assert st["device_steps"] > 0
    assert st["active_slots"] == 3 and st["slots"] == 4
    assert st["mean_batched_lanes"] >= 1.0
    assert st["tokens_emitted"] == sum(len(e) for e in expected)

    # Slot reuse must start clean: exhaust free slots so close/open recycles
    # stream 0's lane, replay stream 1's audio and get stream 1's tokens.
    extra = pool.open()
    pool.close(slots[0])
    s_new = pool.open()
    assert s_new == slots[0], (s_new, extra)
    for i in range(0, len(waves[1]), 3200):
        pool.feed(s_new, waves[1][i:i + 3200])
        pool.pump()
    assert pool.tokens(s_new) == expected[1]
