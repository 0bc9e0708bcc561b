"""Streaming session with the LSTM predictor: stateful decode carry across
chunks must equal offline decode over the same frames (the conv-predictor
variant is covered in test_streaming_session.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from rnnt_tpu.decode.greedy import greedy_decode
from rnnt_tpu.decode.streaming import StreamingSession
from rnnt_tpu.models.encoder import EncoderSpec, JasperBlockSpec, encoder_apply
from rnnt_tpu.models.joint import JointSpec
from rnnt_tpu.models.predictor import LSTMPredictorSpec
from rnnt_tpu.models.rnnt import RNNTSpec, rnnt_init
from rnnt_tpu.ops.stft import FeaturizerSpec, make_featurizer


def test_lstm_streaming_matches_offline():
    enc = EncoderSpec(
        input_features=201, norm_type="batch",
        prologue_kernel_size=7, prologue_stride=2,
        blocks=(JasperBlockSpec(5, 24, 24, 0.0, 1, "batch"),),
        epilogue_features=24, epilogue_kernel_size=9, epilogue_dilation=2,
        output_features=32)
    pred = LSTMPredictorSpec(num_symbols=48, output_dim=32,
                             symbol_embedding_dim=16, num_lstm_layers=1,
                             lstm_hidden_dim=24, lstm_layer_norm=True)
    joint = JointSpec(audio_features=-1, text_features=-1,
                      hidden_features=32, num_classes=48)
    spec = RNNTSpec(encoder=enc, predictor=pred, joint=joint)
    fspec = FeaturizerSpec()

    params, model_state = rnnt_init(jax.random.PRNGKey(1), spec)
    b = params["joint"]["out"]["b"]
    params["joint"]["out"]["b"] = b.at[spec.joint.blank_idx].set(2.0)

    rng = np.random.RandomState(3)
    wave = (rng.randn(12800).astype(np.float32) * 0.3
            + np.sin(2 * np.pi * 700 * np.arange(12800) / 16000)
            .astype(np.float32) * 0.4)

    session = StreamingSession(params, model_state, spec, fspec)
    for i in range(0, len(wave), 3200):
        session.feed(wave[i:i + 3200])
    streamed = session.tokens()
    n_frames = session.encoder_frames_emitted
    assert n_frames > 0

    feats = make_featurizer(fspec)(wave[None, :])
    enc_out, _ = encoder_apply(params["encoder"], model_state["encoder"],
                               feats, spec.encoder, training=False)
    dec_params = {"predictor": params["predictor"], "joint": params["joint"]}
    tokens, counts = greedy_decode(
        dec_params, enc_out[:, :n_frames, :], jnp.asarray([n_frames]),
        spec.predictor, spec.joint, max_tokens=64)
    offline = list(np.asarray(tokens[0, : int(counts[0])]))
    assert offline == streamed, f"streamed {streamed} != offline {offline}"
