"""Transplant reference (jakepoz/rnnt, PyTorch) weights into JAX pytrees.

Works on a plain ``state_dict`` mapping (names -> torch tensors or numpy
arrays), so it serves two purposes:

* **Checkpoint migration**: load a reference ``checkpoint_step_N.pt``
  (``{"model_state_dict": ...}``, reference rnnt/util.py:7-12) and continue
  training / serving on TPU.
* **Differential parity testing**: instantiate the reference modules,
  transplant their random-init weights, and assert output equality
  (tests/test_reference_parity.py) — converting every "matches the
  reference" docstring into a checked invariant.

Layout translations (reference -> this framework):

* ``torch.nn.Conv1d`` weight ``(Cout, Cin, K)`` -> causal-conv ``w``
  ``(K, Cin, Cout)`` (ops/causal_conv.py uses ``("NHC", "HIO", "NHC")``).
* 1x1 ``Conv1d`` (residual / output convs, reference rnnt/jasper.py:36,135)
  -> matmul weight ``(Cin, Cout)``.
* ``torch.nn.Linear`` weight ``(out, in)`` -> ``w`` ``(in, out)``.
* Batch norm running stats -> explicit ``state`` pytree entries
  (ops/norm.py keeps them out of params).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from rnnt_tpu.models.encoder import EncoderSpec
from rnnt_tpu.models.predictor import ConvPredictorSpec, LSTMPredictorSpec
from rnnt_tpu.models.rnnt import RNNTSpec


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor, without importing torch here
        x = x.detach().cpu().numpy()
    # Copy: torch's .numpy() is a live view of the tensor's memory, and on
    # the CPU backend jnp.asarray may alias rather than copy — an in-place
    # torch update (e.g. batch-norm running stats) would silently mutate the
    # imported pytree.
    return np.array(x, copy=True)


def _arr(sd, key, dtype) -> jnp.ndarray:
    return jnp.asarray(_np(sd[key]), dtype=dtype)


def _linear(sd, prefix, dtype) -> dict:
    """torch Linear (out, in) -> {"w": (in, out), "b": (out,)?}."""
    p = {"w": jnp.asarray(_np(sd[f"{prefix}.weight"]).T, dtype=dtype)}
    if f"{prefix}.bias" in sd:
        p["b"] = _arr(sd, f"{prefix}.bias", dtype)
    return p


def _layer_norm(sd, prefix, dtype) -> dict:
    return {"scale": _arr(sd, f"{prefix}.weight", dtype),
            "bias": _arr(sd, f"{prefix}.bias", dtype)}


def import_causal_conv(sd, prefix: str = "", dtype=jnp.float32) -> dict:
    """Reference ``CausalConv1d`` (rnnt/causalconv.py:9-12, inner module
    attribute ``conv``) -> ``{"w": (K, Cin, Cout), "b": (Cout,)}``."""
    pre = f"{prefix}." if prefix and not prefix.endswith(".") else prefix
    w = _np(sd[f"{pre}conv.weight"])  # (Cout, Cin, K)
    return {"w": jnp.asarray(np.transpose(w, (2, 1, 0)), dtype=dtype),
            "b": _arr(sd, f"{pre}conv.bias", dtype)}


def _conv1x1(sd, prefix, dtype) -> dict:
    """Plain 1x1 torch Conv1d -> matmul params (Cin, Cout)."""
    w = _np(sd[f"{prefix}.weight"])  # (Cout, Cin, 1)
    return {"w": jnp.asarray(w[:, :, 0].T, dtype=dtype),
            "b": _arr(sd, f"{prefix}.bias", dtype)}


def _norm(sd, prefix, norm_type: str, dtype):
    """BatchNorm1d / InstanceNorm1d(affine) / InstanceNorm1d ->
    (params, state) matching ops/norm.py's norm_init layout."""
    if norm_type == "batch":
        params = {"scale": _arr(sd, f"{prefix}.weight", dtype),
                  "bias": _arr(sd, f"{prefix}.bias", dtype)}
        state = {"mean": _arr(sd, f"{prefix}.running_mean", jnp.float32),
                 "var": _arr(sd, f"{prefix}.running_var", jnp.float32)}
    elif norm_type == "instance_affine":
        params = {"scale": _arr(sd, f"{prefix}.weight", dtype),
                  "bias": _arr(sd, f"{prefix}.bias", dtype)}
        state = {}
    elif norm_type == "instance":
        params, state = {}, {}
    else:
        raise ValueError(f"unknown norm_type: {norm_type}")
    return params, state


def import_encoder(sd, spec: EncoderSpec, prefix: str = "",
                   dtype=jnp.float32):
    """Reference ``AudioEncoder`` state dict -> (params, state).

    The reference builds one flat ``torch.nn.Sequential`` named ``blocks``
    in a fixed order (rnnt/jasper.py:98-135): prologue conv, norm, GELU,
    N JasperBlocks, epilogue conv, norm, GELU, 1x1 output conv.  The
    sequential indices are replayed here from the spec.
    """
    pre = f"{prefix}blocks"
    params: dict = {}
    state: dict = {}

    params["prologue"] = {"conv": import_causal_conv(sd, f"{pre}.0", dtype)}
    pnorm, pstate = _norm(sd, f"{pre}.1", spec.norm_type, dtype)
    params["prologue"]["norm"] = pnorm
    state["prologue"] = pstate
    idx = 3  # past prologue conv, norm, GELU

    block_params, block_states = [], []
    for b in spec.blocks:
        bpre = f"{pre}.{idx}"
        convs, norms, nstates = [], [], []
        for i in range(b.num_sub_blocks):
            convs.append(import_causal_conv(sd, f"{bpre}.convs.{i}", dtype))
            np_, ns_ = _norm(sd, f"{bpre}.norms.{i}", b.norm_type, dtype)
            norms.append(np_)
            nstates.append(ns_)
        res_conv = _conv1x1(sd, f"{bpre}.residual_conv", dtype)
        res_norm, res_state = _norm(sd, f"{bpre}.residual_norm", b.norm_type, dtype)
        block_params.append({"convs": convs, "norms": norms,
                             "residual_conv": res_conv, "residual_norm": res_norm})
        block_states.append({"norms": nstates, "residual_norm": res_state})
        idx += 1
    params["blocks"] = block_params
    state["blocks"] = block_states

    params["epilogue"] = {"conv": import_causal_conv(sd, f"{pre}.{idx}", dtype)}
    enorm, estate = _norm(sd, f"{pre}.{idx + 1}", spec.norm_type, dtype)
    params["epilogue"]["norm"] = enorm
    state["epilogue"] = estate

    params["out"] = _conv1x1(sd, f"{pre}.{idx + 3}", dtype)
    return params, state


def import_conv_predictor(sd, prefix: str = "", dtype=jnp.float32) -> dict:
    """Reference ``ConvPredictor`` (rnnt/predictor.py:189-228) -> params."""
    return {
        "embedding": _arr(sd, f"{prefix}embedding.weight", dtype),
        "input_ln": _layer_norm(sd, f"{prefix}input_layer_norm", dtype),
        "conv1": import_causal_conv(sd, f"{prefix}conv1", dtype),
        "conv2": import_causal_conv(sd, f"{prefix}conv2", dtype),
        "linear": _linear(sd, f"{prefix}linear", dtype),
        "output_ln": _layer_norm(sd, f"{prefix}output_layer_norm", dtype),
    }


def import_lstm_predictor(sd, spec: LSTMPredictorSpec, prefix: str = "",
                          dtype=jnp.float32) -> dict:
    """Reference ``LSTMPredictor`` (rnnt/predictor.py:93-137) -> params.

    Gate order is torch's chunk order i,f,g,o (rnnt/predictor.py:77), which
    matches models/predictor.py's ``jnp.split``; weights transplant without
    gate permutation.
    """
    layers = []
    for i in range(spec.num_lstm_layers):
        lpre = f"{prefix}lstm_layers.{i}"
        lp = {"x2g": _linear(sd, f"{lpre}.x2g", dtype),
              "p2g": _linear(sd, f"{lpre}.p2g", dtype)}
        if spec.lstm_layer_norm:
            lp["c_norm"] = _layer_norm(sd, f"{lpre}.c_norm", dtype)
            lp["g_norm"] = _layer_norm(sd, f"{lpre}.g_norm", dtype)
        layers.append(lp)
    return {
        "embedding": _arr(sd, f"{prefix}embedding.weight", dtype),
        "input_ln": _layer_norm(sd, f"{prefix}input_layer_norm", dtype),
        "layers": layers,
        "linear": _linear(sd, f"{prefix}linear", dtype),
        "output_ln": _layer_norm(sd, f"{prefix}output_layer_norm", dtype),
    }


def import_joint(sd, prefix: str = "", dtype=jnp.float32) -> dict:
    """Reference ``JointNetwork`` (rnnt/joint.py:4-20) -> params.  The
    per-side projections exist only when configured with positive feature
    sizes (the reference gates on ``hasattr``, rnnt/joint.py:26-30)."""
    params = {"out": _linear(sd, f"{prefix}joint_ln", dtype)}
    if f"{prefix}audio_ln.weight" in sd:
        params["audio_proj"] = _linear(sd, f"{prefix}audio_ln", dtype)
    if f"{prefix}text_ln.weight" in sd:
        params["text_proj"] = _linear(sd, f"{prefix}text_ln", dtype)
    return params


def import_reference_state_dict(sd, spec: RNNTSpec, dtype=jnp.float32):
    """Full reference ``RNNTModel`` state dict (or ``save_model`` checkpoint
    dict, reference rnnt/util.py:7-12) -> (params, state) for
    models/rnnt.py.  DDP's ``module.`` prefix is stripped."""
    if "model_state_dict" in sd:
        sd = sd["model_state_dict"]
    if any(k.startswith("module.") for k in sd):
        sd = {k.removeprefix("module."): v for k, v in sd.items()}

    enc_params, enc_state = import_encoder(sd, spec.encoder, "encoder.", dtype)
    if isinstance(spec.predictor, ConvPredictorSpec):
        pred = import_conv_predictor(sd, "predictor.", dtype)
    elif isinstance(spec.predictor, LSTMPredictorSpec):
        pred = import_lstm_predictor(sd, spec.predictor, "predictor.", dtype)
    else:
        raise TypeError(f"unknown predictor spec: {type(spec.predictor)}")
    params = {"encoder": enc_params,
              "predictor": pred,
              "joint": import_joint(sd, "joint.", dtype)}
    return params, {"encoder": enc_state}
