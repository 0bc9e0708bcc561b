"""Differential parity against the ACTUAL reference modules.

Imports the reference PyTorch classes from /root/reference (read-only),
transplants their weights into this framework's pytrees via
rnnt_tpu.compat.torch_import, and asserts output equality on random inputs.
This converts every "matches the reference" docstring into a checked
theorem — the cheapest insurance for WER parity given that no speech corpus
exists in this environment.

Covered (reference file:line):
  * CausalConv1d across stride/dilation/lookahead combos (rnnt/causalconv.py:9-40)
  * AudioEncoder, all three norm types, eval + train-mode batch norm with
    running-stat updates (rnnt/jasper.py:90-183)
  * AudioEncoder.streaming_forward state-for-state (rnnt/jasper.py:141-170)
  * calc_output_lens (rnnt/jasper.py:172-183)
  * ConvPredictor / LSTMPredictor incl. LSTM state carry (rnnt/predictor.py:11-228)
  * JointNetwork forward + single_forward, with/without per-side
    projections (rnnt/joint.py:4-55)
  * Full-model state-dict import incl. DDP "module." prefix and
    save_model checkpoint wrapper (rnnt/util.py:7-12)

Known deliberate divergence (not tested for equality): a JasperBlock with
additional_context > 0 *crashes* in the reference (unshortened residual,
rnnt/jasper.py:47-64); this framework trims the residual.  Lookahead parity
is therefore proven at the CausalConv1d level, where the reference works.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

from rnnt.causalconv import CausalConv1d as RefCausalConv1d  # noqa: E402
from rnnt.jasper import AudioEncoder as RefAudioEncoder  # noqa: E402
from rnnt.jasper import JasperBlock as RefJasperBlock  # noqa: E402
from rnnt.joint import JointNetwork as RefJointNetwork  # noqa: E402
from rnnt.predictor import ConvPredictor as RefConvPredictor  # noqa: E402
from rnnt.predictor import LSTMPredictor as RefLSTMPredictor  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rnnt_tpu.compat import (  # noqa: E402
    import_causal_conv,
    import_conv_predictor,
    import_encoder,
    import_joint,
    import_lstm_predictor,
    import_reference_state_dict,
)
from rnnt_tpu.models.encoder import (  # noqa: E402
    EncoderSpec,
    JasperBlockSpec,
    encoder_apply,
    encoder_out_len,
    encoder_streaming_apply,
    encoder_streaming_init_state,
)
from rnnt_tpu.models.joint import JointSpec, joint_apply, joint_single  # noqa: E402
from rnnt_tpu.models.predictor import (  # noqa: E402
    ConvPredictorSpec,
    LSTMPredictorSpec,
    conv_predictor_apply,
    lstm_predictor_apply,
)
from rnnt_tpu.models.rnnt import RNNTSpec, prepend_blank, rnnt_forward  # noqa: E402
from rnnt_tpu.ops.causal_conv import ConvSpec, causal_conv_apply  # noqa: E402


def _j(x: torch.Tensor) -> jnp.ndarray:
    return jnp.asarray(x.detach().numpy())


def _nct(x: torch.Tensor) -> jnp.ndarray:
    """torch (B, C, T) -> ours (B, T, C)."""
    return jnp.asarray(x.detach().numpy().transpose(0, 2, 1))


def _assert_close(mine: jnp.ndarray, ref: torch.Tensor, atol, transpose=False):
    r = ref.detach().numpy()
    if transpose:
        r = r.transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(mine), r, atol=atol, rtol=1e-5)


# --------------------------- CausalConv1d ---------------------------

@pytest.mark.parametrize("k,s,d,ac", [
    (11, 2, 1, 0),   # prologue shape (basic_sp_convjs.yaml)
    (3, 1, 1, 0),    # conv predictor conv1
    (29, 1, 2, 0),   # dilated epilogue
    (11, 1, 1, 2),   # bounded lookahead (basic_sp_convjs.yaml:41)
    (5, 1, 1, 4),    # lookahead == padding (max legal)
    (7, 3, 2, 0),    # stride+dilation combo
])
def test_causal_conv_parity(k, s, d, ac):
    torch.manual_seed(k * 100 + s * 10 + d + ac)
    cin, cout, T = 12, 20, 64
    ref = RefCausalConv1d(cin, cout, k, s, d, additional_context=ac)
    spec = ConvSpec(cin, cout, k, s, d, additional_context=ac)
    params = import_causal_conv(ref.state_dict())

    x = torch.randn(3, cin, T)
    with torch.no_grad():
        want = ref(x)
    got = causal_conv_apply(params, _nct(x), spec)
    _assert_close(got, want, atol=1e-5, transpose=True)


# --------------------------- AudioEncoder ---------------------------

def _small_ref_encoder(norm_type: str):
    """A miniature lineage-shaped encoder: prologue stride 2, two Jasper
    blocks, dilated epilogue, 1x1 out conv (rnnt/jasper.py:90-135)."""
    torch.manual_seed(7)
    blocks = [
        RefJasperBlock(11, 32, 32, dropout=0.0, num_sub_blocks=2, norm_type=norm_type),
        RefJasperBlock(13, 32, 48, dropout=0.0, num_sub_blocks=3, norm_type=norm_type),
    ]
    ref = RefAudioEncoder(
        input_features=24, prologue_kernel_size=11, prologue_stride=2,
        prologue_dilation=1, blocks=blocks, epilogue_features=48,
        epilogue_kernel_size=29, epilogue_stride=1, epilogue_dilation=2,
        output_features=64, norm_type=norm_type)
    spec = EncoderSpec(
        input_features=24, prologue_kernel_size=11, prologue_stride=2,
        prologue_dilation=1,
        blocks=(JasperBlockSpec(11, 32, 32, 0.0, 2, norm_type),
                JasperBlockSpec(13, 32, 48, 0.0, 3, norm_type)),
        epilogue_features=48, epilogue_kernel_size=29, epilogue_stride=1,
        epilogue_dilation=2, output_features=64, norm_type=norm_type)
    return ref, spec


@pytest.mark.parametrize("norm_type", ["batch", "instance", "instance_affine"])
def test_encoder_parity_eval(norm_type):
    ref, spec = _small_ref_encoder(norm_type)
    if norm_type == "batch":
        # Give the running stats non-trivial values before comparing.
        ref.train()
        with torch.no_grad():
            for seed in (1, 2):
                torch.manual_seed(seed)
                ref(torch.randn(2, 24, 80))
    ref.eval()
    params, state = import_encoder(ref.state_dict(), spec)

    torch.manual_seed(11)
    x = torch.randn(2, 24, 100)
    with torch.no_grad():
        want = ref(x)
    got, _ = encoder_apply(params, state, _nct(x), spec, training=False)
    _assert_close(got, want, atol=3e-5, transpose=True)


def test_encoder_parity_train_mode_batch_norm():
    """Train-mode batch statistics AND the running-stat update rule match
    (torch momentum 0.1, unbiased running var — rnnt/jasper.py:29-30)."""
    ref, spec = _small_ref_encoder("batch")
    ref.train()
    params, state = import_encoder(ref.state_dict(), spec)

    torch.manual_seed(13)
    x = torch.randn(4, 24, 60)
    with torch.no_grad():
        want = ref(x)
    got, new_state = encoder_apply(params, state, _nct(x), spec, training=True)
    _assert_close(got, want, atol=3e-5, transpose=True)

    # Running stats after one train step: compare the prologue norm's.
    ref_sd = ref.state_dict()
    np.testing.assert_allclose(
        np.asarray(new_state["prologue"]["mean"]),
        ref_sd["blocks.1.running_mean"].numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_state["prologue"]["var"]),
        ref_sd["blocks.1.running_var"].numpy(), atol=1e-5)


def test_encoder_base_convjs_scale_parity():
    """The real base_convjs architecture (201 input, 256/384/512 x4 blocks,
    instance_affine) minus the block-1 lookahead, which crashes the
    reference (rnnt/jasper.py:47-64)."""
    torch.manual_seed(3)
    nt = "instance_affine"
    blocks = [
        RefJasperBlock(11, 256, 256, 0.0, 4, norm_type=nt),
        RefJasperBlock(13, 256, 384, 0.0, 4, norm_type=nt),
        RefJasperBlock(25, 384, 512, 0.0, 4, norm_type=nt),
    ]
    ref = RefAudioEncoder(
        input_features=201, prologue_kernel_size=11, prologue_stride=2,
        prologue_dilation=1, blocks=blocks, epilogue_features=512,
        epilogue_kernel_size=29, epilogue_stride=1, epilogue_dilation=2,
        output_features=1024, norm_type=nt)
    ref.eval()
    spec = EncoderSpec(
        input_features=201, prologue_kernel_size=11, prologue_stride=2,
        prologue_dilation=1,
        blocks=(JasperBlockSpec(11, 256, 256, 0.0, 4, nt),
                JasperBlockSpec(13, 256, 384, 0.0, 4, nt),
                JasperBlockSpec(25, 384, 512, 0.0, 4, nt)),
        epilogue_features=512, epilogue_kernel_size=29, epilogue_stride=1,
        epilogue_dilation=2, output_features=1024, norm_type=nt)
    params, state = import_encoder(ref.state_dict(), spec)

    torch.manual_seed(5)
    x = torch.randn(2, 201, 96)
    with torch.no_grad():
        want = ref(x)
    got, _ = encoder_apply(params, state, _nct(x), spec, training=False)
    _assert_close(got, want, atol=1e-4, transpose=True)

    # calc_output_lens parity (rnnt/jasper.py:172-183).
    lens = torch.tensor([96, 51, 10, 30])
    want_lens = ref.calc_output_lens(lens).numpy()
    got_lens = np.asarray(encoder_out_len(jnp.asarray(lens.numpy()), spec))
    np.testing.assert_array_equal(got_lens, want_lens)


def test_encoder_streaming_parity():
    """Chunked streaming, state-for-state vs the reference's
    streaming_forward (rnnt/jasper.py:141-157).  Batch norm (frozen stats)
    is the streaming-exact configuration the reference documents
    (rnnt/jasper.py:9-14)."""
    ref, spec = _small_ref_encoder("batch")
    ref.train()
    with torch.no_grad():
        torch.manual_seed(1)
        ref(torch.randn(2, 24, 80))
    ref.eval()
    params, state = import_encoder(ref.state_dict(), spec)

    torch.manual_seed(17)
    chunks = [torch.randn(2, 24, 16) for _ in range(3)]

    ref_state = ref.streaming_init_state(2)
    my_state = encoder_streaming_init_state(2, spec)
    for chunk in chunks:
        with torch.no_grad():
            want, ref_state = ref.streaming_forward(chunk, ref_state)
        got, my_state = encoder_streaming_apply(params, state, _nct(chunk),
                                                my_state, spec)
        _assert_close(got, want, atol=3e-5, transpose=True)
        # Carry states match position-for-position (same flat ordering).
        assert len(my_state) == len(ref_state)
        for ms, rs in zip(my_state, ref_state):
            np.testing.assert_allclose(
                np.asarray(ms), rs.numpy().transpose(0, 2, 1), atol=3e-5)


# --------------------------- Predictors ---------------------------

def test_conv_predictor_parity():
    torch.manual_seed(21)
    ref = RefConvPredictor(num_symbols=64, output_dim=48,
                           symbol_embedding_dim=32, dropout=0.0)
    ref.eval()
    spec = ConvPredictorSpec(num_symbols=64, output_dim=48,
                             symbol_embedding_dim=32, dropout=0.0)
    params = import_conv_predictor(ref.state_dict())

    tokens = torch.randint(0, 64, (3, 17))
    with torch.no_grad():
        want = ref(tokens)
    got = conv_predictor_apply(params, jnp.asarray(tokens.numpy()), spec)
    _assert_close(got, want, atol=1e-5)


@pytest.mark.parametrize("layer_norm", [False, True])
def test_lstm_predictor_parity(layer_norm):
    torch.manual_seed(23)
    ref = RefLSTMPredictor(num_symbols=64, output_dim=48,
                           symbol_embedding_dim=32, num_lstm_layers=2,
                           lstm_hidden_dim=40, lstm_layer_norm=layer_norm,
                           lstm_dropout=0.0)
    ref.eval()
    spec = LSTMPredictorSpec(num_symbols=64, output_dim=48,
                             symbol_embedding_dim=32, num_lstm_layers=2,
                             lstm_hidden_dim=40, lstm_layer_norm=layer_norm,
                             lstm_dropout=0.0)
    params = import_lstm_predictor(ref.state_dict(), spec)

    tokens = torch.randint(0, 64, (3, 12))
    lens = torch.tensor([12, 12, 12])
    with torch.no_grad():
        want, _, ref_st = ref(tokens, lens)
    got, my_st = lstm_predictor_apply(params, jnp.asarray(tokens.numpy()), spec)
    _assert_close(got, want, atol=1e-5)

    # State carry: feed a second segment resuming from the returned state.
    tokens2 = torch.randint(0, 64, (3, 5))
    with torch.no_grad():
        want2, _, _ = ref(tokens2, torch.tensor([5, 5, 5]), ref_st)
    got2, _ = lstm_predictor_apply(params, jnp.asarray(tokens2.numpy()), spec,
                                   state=my_st)
    _assert_close(got2, want2, atol=1e-5)


# --------------------------- Joint ---------------------------

@pytest.mark.parametrize("proj", [False, True])
def test_joint_parity(proj):
    torch.manual_seed(29)
    a_feat, t_feat = (24, 20) if proj else (-1, -1)
    H, V = 16, 10
    ref = RefJointNetwork(audio_features=a_feat, text_features=t_feat,
                          hidden_features=H, num_classes=V)
    ref.eval()
    spec = JointSpec(audio_features=a_feat, text_features=t_feat,
                     hidden_features=H, num_classes=V)
    params = import_joint(ref.state_dict())

    B, T, U = 2, 6, 4
    audio = torch.randn(B, T, a_feat if proj else H)
    text = torch.randn(B, U, t_feat if proj else H)
    with torch.no_grad():
        want = ref(audio, text)                       # (B, T, U, V)
        want_single = ref.single_forward(audio[:, 0], text[:, 0])
    got = joint_apply(params, _j(audio), _j(text))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5, rtol=1e-5)
    got_single = joint_single(params, _j(audio[:, 0]), _j(text[:, 0]))
    np.testing.assert_allclose(np.asarray(got_single), want_single.numpy(),
                               atol=1e-5, rtol=1e-5)
    assert spec.blank_idx == ref.blank_idx


# --------------------------- Full model ---------------------------

def test_full_model_checkpoint_import():
    """Assemble a reference save_model-style checkpoint (rnnt/util.py:7-12,
    with DDP 'module.' prefixes) and verify the imported model reproduces
    the reference's full forward: predictor + encoder + full-lattice joint
    logits (rnnt/model.py:17-32)."""
    torch.manual_seed(31)
    nt = "instance_affine"
    enc = RefAudioEncoder(
        input_features=24, prologue_kernel_size=11, prologue_stride=2,
        prologue_dilation=1,
        blocks=[RefJasperBlock(11, 32, 32, 0.0, 2, norm_type=nt)],
        epilogue_features=32, epilogue_kernel_size=9, epilogue_stride=1,
        epilogue_dilation=2, output_features=40, norm_type=nt)
    pred = RefConvPredictor(num_symbols=32, output_dim=40,
                            symbol_embedding_dim=24, dropout=0.0)
    joint = RefJointNetwork(audio_features=-1, text_features=-1,
                            hidden_features=40, num_classes=32)
    enc.eval(), pred.eval(), joint.eval()

    sd = {}
    for prefix, mod in (("encoder", enc), ("predictor", pred), ("joint", joint)):
        for k, v in mod.state_dict().items():
            sd[f"module.{prefix}.{k}"] = v
    ckpt = {"model_state_dict": sd, "completed_steps": 123}

    spec = RNNTSpec(
        encoder=EncoderSpec(
            input_features=24, prologue_kernel_size=11, prologue_stride=2,
            prologue_dilation=1,
            blocks=(JasperBlockSpec(11, 32, 32, 0.0, 2, nt),),
            epilogue_features=32, epilogue_kernel_size=9, epilogue_stride=1,
            epilogue_dilation=2, output_features=40, norm_type=nt),
        predictor=ConvPredictorSpec(num_symbols=32, output_dim=40,
                                    symbol_embedding_dim=24, dropout=0.0),
        joint=JointSpec(-1, -1, 40, 32))
    params, state = import_reference_state_dict(ckpt, spec)

    torch.manual_seed(37)
    B, T, U = 2, 40, 6
    mels = torch.randn(B, 24, T)
    targets = torch.randint(0, 31, (B, U))

    # Reference RNNTModel.forward minus the torchaudio loss
    # (rnnt/model.py:17-32; torchaudio isn't installed in this env).
    blank = 31
    prepended = torch.cat(
        [torch.full((B, 1), blank, dtype=targets.dtype), targets], dim=1)
    with torch.no_grad():
        text = pred(prepended)
        audio = enc(mels).permute(0, 2, 1)
        want_logits = joint(audio, text)

    feats = _nct(mels)
    got_audio, got_text, _ = rnnt_forward(
        params, state, feats, spec, jnp.asarray(targets.numpy()))
    got_logits = joint_apply(params["joint"], got_audio, got_text)
    np.testing.assert_allclose(np.asarray(got_logits), want_logits.numpy(),
                               atol=3e-5, rtol=1e-5)
    assert jnp.array_equal(prepend_blank(jnp.asarray(targets.numpy()), blank),
                           jnp.asarray(prepended.numpy()))
