"""The jitted, sharded train/eval step.

The reference's hot loop (reference rnnt/train.py:111-166) is H2D copy →
forward → backward → clip → step, with DDP all-reduce hooks firing in
backward.  Here the entire step — on-device featurization, encoder,
predictor, chunked joint+transducer loss, gradient, clip, AdamW update —
is ONE jitted function over a ("data", "model") mesh; batch arrays arrive
sharded on the data axis and XLA inserts the gradient all-reduce over ICI.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from rnnt_tpu.models.encoder import encoder_out_len
from rnnt_tpu.models.rnnt import RNNTSpec, rnnt_forward
from rnnt_tpu.ops.stft import FeaturizerSpec, make_featurizer
from rnnt_tpu.ops.transducer import transducer_loss


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    model_state: Any   # batch-norm running stats etc.
    step: jax.Array


def decode_wire_audio(audio: jax.Array) -> jax.Array:
    """Decode wire-format audio (data/dataset.py) on device; f32 passes
    through.  int16 halves the host->device transfer bytes, uint8 mu-law
    quarters them — on a tunneled/remote device that transfer is the e2e
    training bottleneck (BASELINE.md round 4)."""
    if audio.dtype == jnp.uint8:      # mu-law (mu=255, bias 128)
        from rnnt_tpu.data.dataset import MULAW_PRESCALE

        y = (audio.astype(jnp.float32) - 128.0) * (1.0 / 127.0)
        mag = (jnp.power(256.0, jnp.abs(y)) - 1.0) * (1.0 / 255.0)
        return jnp.sign(y) * mag * (1.0 / MULAW_PRESCALE)
    if jnp.issubdtype(audio.dtype, jnp.integer):
        from rnnt_tpu.data.dataset import WIRE_SCALE

        return audio.astype(jnp.float32) * (1.0 / WIRE_SCALE)
    return audio


def feature_lens_from_samples(audio_lens: jax.Array,
                              fspec: FeaturizerSpec) -> jax.Array:
    if fspec.center:
        n = audio_lens // fspec.hop_length + 1
    else:
        n = (audio_lens - fspec.n_fft) // fspec.hop_length + 1
    return jnp.maximum(n, 0).astype(jnp.int32)


def make_loss_fn(spec: RNNTSpec, fspec: FeaturizerSpec, precision: str,
                 mesh=None, spec_augment: bool = False,
                 device_augment: bool = False):
    """Loss over a raw-audio batch; featurization happens on device.

    ``mesh`` is normally unused: the Pallas loss kernels carry their own
    GSPMD partitioning rules (rnnt_tpu/parallel/partition.py), so the same
    jitted step runs on any mesh without wrapper plumbing.  The one
    exception is ``spec.lattice_shard_t`` — the T-sharded lattice
    (ops/lattice_tshard.py) is a shard_map program and needs the concrete
    mesh at trace time."""
    if spec.loss_impl == "pruned" and getattr(spec, "lattice_shard_t", False):
        # Also rejected at config build (config/config.py build_model_spec);
        # guard here too for specs constructed directly.
        raise ValueError("lattice_shard_t does not compose with "
                         "loss_impl='pruned' (the banded lattice is already "
                         "O(T*band) per device)")
    if not getattr(spec, "lattice_shard_t", False):
        mesh = None
    featurize = make_featurizer(fspec)
    compute_dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32

    def loss_fn(params, model_state, batch, rng, training: bool):
        audio_in = decode_wire_audio(batch["audio"])
        audio_lens = batch["audio_lens"]
        if device_augment and training and rng is not None:
            rng, da_rng = jax.random.split(rng)
            if device_augment == "full":
                # Entire recipe on device, incl. the length-changing ops;
                # lengths update dynamically (static buffer shapes).
                from rnnt_tpu.data.augment_device import device_augment_full
                audio_in, audio_lens = device_augment_full(
                    da_rng, audio_in, audio_lens, fspec.sample_rate)
            else:
                from rnnt_tpu.data.augment_device import device_augment as _da
                audio_in = _da(da_rng, audio_in, audio_lens,
                               fspec.sample_rate)
        feats = featurize(audio_in)  # (B, T, bins) f32
        if spec_augment and training and rng is not None:
            from rnnt_tpu.data.augment import spec_augment as _sa
            rng, sa_rng = jax.random.split(rng)
            feats = _sa(sa_rng, feats)
        feats = feats.astype(compute_dtype)
        feat_lens = feature_lens_from_samples(audio_lens, fspec)
        audio, text, new_state = rnnt_forward(
            params, model_state, feats, spec, batch["targets"],
            training=training, rng=rng)
        t_lens = encoder_out_len(feat_lens, spec.encoder)
        from rnnt_tpu.models.rnnt import resolve_loss_impl
        if spec.loss_impl == "pruned_warmup":
            # Exact full-lattice loss + simple-head training for the first
            # training.pruned_warmup_steps (k2 practice; the loop switches
            # to the banded loss after — see train/loop.py).
            from rnnt_tpu.ops.transducer_pruned import pruned_warmup_loss
            loss = pruned_warmup_loss(
                params["joint"], audio, text, batch["targets"], t_lens,
                batch["target_lens"], spec.blank_idx,
                simple_scale=spec.pruned_simple_scale,
                chunk_size=spec.loss_chunk_size, grad_clamp=spec.grad_clamp)
            return loss, new_state
        if spec.loss_impl == "pruned":
            from rnnt_tpu.ops.transducer_pruned import pruned_transducer_loss
            loss = pruned_transducer_loss(
                params["joint"], audio, text, batch["targets"], t_lens,
                batch["target_lens"], spec.blank_idx,
                band=spec.pruned_band,
                simple_scale=spec.pruned_simple_scale,
                pruned_scale=spec.pruned_scale,
                chunk_size=spec.loss_chunk_size, grad_clamp=spec.grad_clamp)
            return loss, new_state
        use_pallas = (resolve_loss_impl(spec.loss_impl) == "pallas"
                      and mesh is None)  # tshard needs the chunked path
        if use_pallas:
            from rnnt_tpu.ops.transducer_pallas import transducer_loss_pallas
            loss = transducer_loss_pallas(
                params["joint"], audio, text, batch["targets"], t_lens,
                batch["target_lens"], spec.blank_idx,
                grad_clamp=spec.grad_clamp)
        else:
            loss = transducer_loss(
                params["joint"], audio, text, batch["targets"], t_lens,
                batch["target_lens"], spec.blank_idx,
                chunk_size=spec.loss_chunk_size, grad_clamp=spec.grad_clamp,
                mesh=mesh)
        return loss, new_state

    return loss_fn


def make_train_step(spec: RNNTSpec, fspec: FeaturizerSpec, tx,
                    precision: str = "bf16", mesh=None,
                    spec_augment: bool = False,
                    device_augment: bool = False):
    """Returns step(state, batch, rng) -> (state, metrics).  Jit/shard it
    with the shardings from rnnt_tpu.parallel."""
    loss_fn = make_loss_fn(spec, fspec, precision, mesh=mesh,
                           spec_augment=spec_augment,
                           device_augment=device_augment)

    def train_step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)

        def wrapped(params):
            return loss_fn(params, state.model_state, batch, rng, True)

        (loss, new_model_state), grads = jax.value_and_grad(
            wrapped, has_aux=True)(state.params)
        grad_norm = optax.global_norm(grads)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "grad_norm": grad_norm,
            "total_target_len": jnp.sum(batch["target_lens"]),
        }
        # Per-submodel gradient norms (reference rnnt/train.py:155-161).
        for k, v in grads.items():
            metrics[f"grad_norm/{k}"] = optax.global_norm(v)
        new_state = TrainState(new_params, new_opt_state, new_model_state,
                               state.step + 1)
        return new_state, metrics

    return train_step


def make_eval_forward(spec: RNNTSpec, fspec: FeaturizerSpec,
                      precision: str = "bf16"):
    """Featurize + encode for decoding: batch -> (audio (B,T,H), t_lens)."""
    featurize = make_featurizer(fspec)
    compute_dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32

    def forward(params, model_state, batch):
        from rnnt_tpu.models.encoder import encoder_apply

        feats = featurize(decode_wire_audio(batch["audio"])).astype(
            compute_dtype)
        feat_lens = feature_lens_from_samples(batch["audio_lens"], fspec)
        audio, _ = encoder_apply(params["encoder"], model_state["encoder"],
                                 feats, spec.encoder, training=False)
        t_lens = encoder_out_len(feat_lens, spec.encoder)
        return audio, t_lens

    return forward
