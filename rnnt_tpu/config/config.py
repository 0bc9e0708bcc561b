"""Config system: YAML → typed dataclasses → model/featurizer specs.

The reference wires every component through Hydra ``_target_`` class paths
(reference rnnt/train.py:50-63, rnnt/config/basic_sp_convjs.yaml) and saves
the config next to each checkpoint as the interchange format
(rnnt/train.py:41-42, rnnt/eval.py:26-30).  This module keeps that
*capability* — everything configurable from YAML, config saved alongside
checkpoints and rediscovered by eval/infer/export — with a plain
dataclass schema instead of arbitrary-import instantiation.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

import yaml

from rnnt_tpu.models.encoder import EncoderSpec, JasperBlockSpec
from rnnt_tpu.models.joint import JointSpec
from rnnt_tpu.models.predictor import ConvPredictorSpec, LSTMPredictorSpec
from rnnt_tpu.models.rnnt import RNNTSpec
from rnnt_tpu.ops.stft import FeaturizerSpec


@dataclass
class TokenizerConfig:
    spm_model: str = ""
    vocab_json: str = ""


@dataclass
class FeaturizerConfig:
    kind: str = "spectrogram"  # spectrogram | old_piecewise | mel | log
    n_fft: int = 400
    win_length: int = 400
    hop_length: int = 160
    num_mels: int = 0
    sample_rate: int = 16000
    mean: Any = 15.0           # float or list (per-channel)
    invstddev: Any = 0.25
    # torch.stft-style centered framing (reflect pad); the reference's
    # 80-mel variant inherits center=True from torchaudio defaults, the
    # TFJS streaming variants use center=False.
    center: bool = False
    # Path to a global_features.json with per-channel stats (overrides
    # mean/invstddev when set; reference rnnt/calc_global_features.py:94-101).
    global_stats: str = ""


@dataclass
class PredictorConfig:
    kind: str = "conv"  # conv | lstm
    output_dim: int = 1024
    symbol_embedding_dim: int = 512
    dropout: float = 0.3
    # LSTM-only:
    num_lstm_layers: int = 2
    lstm_hidden_dim: int = 1024
    lstm_layer_norm: bool = True


@dataclass
class BlockConfig:
    kernel_size: int
    in_channels: int
    out_channels: int
    dropout: float
    num_sub_blocks: int
    norm_type: str = ""
    additional_context: int = 0


@dataclass
class EncoderConfig:
    input_features: int = 201
    norm_type: str = "instance_affine"
    prologue_kernel_size: int = 11
    prologue_stride: int = 2
    prologue_dilation: int = 1
    blocks: list[BlockConfig] = field(default_factory=list)
    epilogue_features: int = 512
    epilogue_kernel_size: int = 29
    epilogue_stride: int = 1
    epilogue_dilation: int = 2
    output_features: int = 1024


@dataclass
class JointConfig:
    audio_features: int = -1
    text_features: int = -1
    hidden_features: int = 1024


@dataclass
class OptimizerConfig:
    lr: float = 3e-4
    eps: float = 1e-8
    betas: tuple = (0.95, 0.9999)
    weight_decay: float = 0.01


@dataclass
class LRScheduleConfig:
    warmup_steps: int = 2000
    min_lr_ratio: float = 0.05
    total_steps: int = 0  # 0 => derived from dataset size at train time


@dataclass
class TrainingConfig:
    precision: str = "bf16"        # bf16 | fp32 (activation compute dtype)
    # Base RNG seed: model init uses PRNGKey(seed), the per-step rng stream
    # PRNGKey(42 + 1009*seed) (seed 0 reproduces the historical keys).
    # Multi-seed A/Bs (scripts/pruned_ab.py --seeds) vary this.
    seed: int = 0
    num_epochs: int = 1
    total_steps: int = 0           # overrides epochs when > 0
    log_steps: int = 50
    # Per-parameter weight histograms every N steps (reference logs
    # gradient/weight histograms every 2000, rnnt/train.py:147-161).
    hist_steps: int = 2000
    eval_steps: int = 20000
    eval_max_elements: int = 1000
    checkpoint_steps: int = 100000
    global_batch_size: int = 4
    clip_grad_norm: float = 10.0
    loss_chunk_size: int = 16
    # auto = fused Pallas joint on TPU, chunked XLA remat elsewhere (the
    # fused kernels measure ~4% faster end-to-end on v5e; interpret mode
    # would crawl on CPU).
    loss_impl: str = "auto"  # auto | chunked | pallas | pruned
    # Pruned-loss knobs (loss_impl == "pruned": banded lattice driven by a
    # factored simple joint, ops/transducer_pruned.py — trains a
    # simple_scale*simple + pruned_scale*banded objective).
    pruned_band: int = 16
    pruned_simple_scale: float = 0.5
    pruned_scale: float = 1.0
    # k2-style pruned warmup: for the first N steps train the EXACT
    # full-lattice loss + simple heads (loss_impl "pruned_warmup"), then
    # switch to the banded loss — narrow bands around untrained alignments
    # prune real probability mass (flagship-scale A/B, BASELINE.md r4).
    pruned_warmup_steps: int = 0
    # > 0 clamps d(loss)/d(logits) in the transducer backward (the
    # torchaudio rnnt_loss `clamp`; the reference tunes it in optuna but
    # hardcodes it off in the trainer, rnnt/model.py:40).
    rnnt_grad_clamp: float = -1.0
    # Sequence-parallel lattice: shard the loss lattice's T axis over the
    # mesh "model" axis (per-device O(T/n) memory for long-form audio;
    # forces the chunked loss path).  Needs mesh.model > 1.
    lattice_shard_t: bool = False
    accumulate_steps: int = 1   # gradient accumulation microbatches
    spec_augment: bool = False  # device-side time/freq masking (train only)
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    lr_schedule: LRScheduleConfig = field(default_factory=LRScheduleConfig)
    # Static-shape bucketing (replaces the reference's max_joint_size
    # batch-halving, rnnt/train.py:120-130): utterances are padded into
    # (frames, tokens) buckets so XLA sees a handful of shapes.
    frame_buckets: list[int] = field(default_factory=lambda: [512, 1024, 2048])
    token_buckets: list[int] = field(default_factory=lambda: [64, 128, 256])


@dataclass
class DataConfig:
    dataset: str = "synthetic"   # synthetic | librispeech | commonvoice
    cache_dir: str = ""
    train_splits: list[str] = field(default_factory=lambda: ["train.clean.100"])
    eval_split: str = "validation.clean"
    num_workers: int = 2
    worker_mode: str = "thread"  # thread | process (forked row workers)
    augment: bool = True
    # Run augmentation inside the jitted train step on device
    # (data/augment_device.py), lifting the 2-CPU host feed bottleneck
    # (bench.py --train-e2e).  ``true`` (= "partial"): the fixed-length half
    # of the recipe (chorus, compressor, shaped noise, peak level) moves to
    # device; host workers keep atempo/pitch/trim.  ``full``: the ENTIRE
    # recipe runs on device (atempo as a batched phase vocoder, pitch as a
    # rate-change resample, trim as a shift) with dynamic audio_lens over
    # the static bucket buffers; host workers only tokenize/collate.
    augment_device: bool | str = False
    # Explicit augmentation stack: list of {kind: ..., p: ..., **kwargs}
    # dicts (see rnnt_tpu/data/augment.py AUGMENTATIONS).  Empty => the
    # default fullcausal recipe.  Mirrors the reference's Hydra-instantiated
    # augmentor list (config/basic_sp_convjs_fullcausal.yaml:120-158).
    augmentations: list = field(default_factory=list)
    # Audio H2D wire format: "int16" halves host->device transfer bytes
    # ((near-)lossless for 16-bit PCM corpora; decoded on device,
    # train/step.py decode_wire_audio).  "mulaw" (8-bit G.711-style
    # companding, ~38 dB SNR) quarters them — for transfer-starved hosts.
    # "float32" sends raw floats.
    wire_dtype: str = "int16"
    # Batch staging (data/device_cache.py): "device" stages the
    # wire-format corpus in HBM once and serves batches as on-device row
    # gathers (per-step H2D ~128 bytes instead of megabytes — for weak-
    # PCIe/tunneled hosts); "stream" transfers every batch; "auto"
    # (default) uses the device cache when there is no host-side
    # augmentation (augment off or augment_device: full) and the corpus
    # fits device_cache_budget_mb, else streams.
    staging: str = "auto"   # auto | stream | device
    device_cache_budget_mb: int = 2048
    # Synthetic-data knobs (used when no real dataset is available).
    synthetic_size: int = 256
    synthetic_seconds: float = 3.0
    synthetic_max_words: int = 12   # larger => flagship-scale target U
    # Evaluate on the training set (overfitting sanity checks).
    eval_on_train: bool = False


@dataclass
class MeshConfig:
    # -1 = use all remaining devices on that axis.
    data: int = -1
    model: int = 1


@dataclass
class Config:
    model_name: str = "rnnt_tpu"
    num_text_tokens: int = 1023
    num_total_symbols: int = 1024
    blank_idx: int = 1023
    tokenizer: TokenizerConfig = field(default_factory=TokenizerConfig)
    featurizer: FeaturizerConfig = field(default_factory=FeaturizerConfig)
    predictor: PredictorConfig = field(default_factory=PredictorConfig)
    encoder: EncoderConfig = field(default_factory=EncoderConfig)
    joint: JointConfig = field(default_factory=JointConfig)
    training: TrainingConfig = field(default_factory=TrainingConfig)
    data: DataConfig = field(default_factory=DataConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)


def _from_dict(cls, d: dict):
    if d is None:
        return cls()
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for k, v in d.items():
        if k not in fields:
            raise KeyError(f"unknown config key {k!r} for {cls.__name__}")
        ftype = fields[k].type
        if dataclasses.is_dataclass(_resolve(ftype)) and isinstance(v, dict):
            kwargs[k] = _from_dict(_resolve(ftype), v)
        elif k == "blocks" and isinstance(v, list):
            kwargs[k] = [_from_dict(BlockConfig, b) for b in v]
        else:
            kwargs[k] = v
    return cls(**kwargs)


_TYPES = {c.__name__: c for c in (
    TokenizerConfig, FeaturizerConfig, PredictorConfig, BlockConfig,
    EncoderConfig, JointConfig, OptimizerConfig, LRScheduleConfig,
    TrainingConfig, DataConfig, MeshConfig, Config)}


def _resolve(t):
    if isinstance(t, str):
        return _TYPES.get(t, str)
    return t


def load_config(path: str | Path) -> Config:
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    return _from_dict(Config, raw)


def apply_overrides(cfg: Config, overrides: list[str]) -> Config:
    """Hydra-style dotted overrides (parity with the reference's CLI
    grammar, e.g. ``python -m rnnt.train training.lr=1e-4``; reference
    rnnt/train.py:23 via @hydra.main): each item is ``a.b.c=value`` with
    the value YAML-parsed (ints/floats/bools/lists work).  Mutates and
    returns cfg; unknown paths raise."""
    for item in overrides or []:
        if "=" not in item:
            raise ValueError(f"override {item!r} must look like key.path=value")
        path, _, raw = item.partition("=")
        parts = path.strip().split(".")
        obj = cfg
        for p in parts[:-1]:
            if not hasattr(obj, p):
                raise KeyError(f"unknown config path {path!r} (at {p!r})")
            obj = getattr(obj, p)
        leaf = parts[-1]
        if not hasattr(obj, leaf):
            raise KeyError(f"unknown config key {path!r}")
        setattr(obj, leaf, _coerce(yaml.safe_load(raw), getattr(obj, leaf),
                                   path))
    return cfg


def _coerce(value, current, path: str):
    """Coerce a YAML-parsed override to the existing field's type.

    PyYAML is YAML 1.1: ``1e-4`` (no dot before the exponent) parses as the
    STRING ``"1e-4"``, so ``training.optimizer.lr=1e-4`` would silently
    assign a str without this.  int->float widens; anything else that
    doesn't match the current field's type raises."""
    if current is None or value is None:
        return value
    want = type(current)
    if isinstance(value, want) and not (want is float and
                                        isinstance(value, bool)):
        return value
    if want is float and isinstance(value, (int, str)) and not isinstance(
            value, bool):
        try:
            return float(value)
        except ValueError:
            pass
    if want is int and isinstance(value, str):
        try:
            return int(value)
        except ValueError:
            pass
    if want is bool and isinstance(value, str):
        low = value.lower()
        if low in ("true", "false"):
            return low == "true"
        if low == "full":  # data.augment_device: bool | "full"
            return low     # normalized: "FULL" must still == "full" downstream
    if isinstance(current, (list, tuple)) and isinstance(value,
                                                         (list, tuple)):
        return want(value)
    raise ValueError(
        f"override {path!r}: cannot coerce {value!r} "
        f"({type(value).__name__}) to {want.__name__}")


def config_to_dict(cfg: Config) -> dict:
    return dataclasses.asdict(cfg)


def save_config(cfg: Config, path: str | Path) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(config_to_dict(cfg), f, sort_keys=False)


def build_featurizer_spec(cfg: Config) -> FeaturizerSpec:
    fc = cfg.featurizer
    mean, invstd = fc.mean, fc.invstddev
    if fc.global_stats:
        import json
        stats = json.loads(Path(fc.global_stats).read_text())
        # Accept ours ("mean") and the reference's schema ("means",
        # /root/reference/global_features.json).
        mean = stats.get("mean", stats.get("means"))
        invstd = stats["invstddev"]
    log_mode = {"spectrogram": "piecewise", "old_piecewise": "old_piecewise",
                "mel": "old_piecewise", "log": "log"}[fc.kind]
    return FeaturizerSpec(
        n_fft=fc.n_fft, win_length=fc.win_length, hop_length=fc.hop_length,
        num_mels=fc.num_mels if fc.kind == "mel" else 0,
        sample_rate=fc.sample_rate, log_mode=log_mode, center=fc.center,
        mean=tuple(mean) if isinstance(mean, (list, tuple)) else float(mean),
        invstddev=(tuple(invstd) if isinstance(invstd, (list, tuple))
                   else float(invstd)),
    )


def build_model_spec(cfg: Config) -> RNNTSpec:
    ec = cfg.encoder
    blocks = tuple(
        JasperBlockSpec(
            kernel_size=b.kernel_size, in_channels=b.in_channels,
            out_channels=b.out_channels, dropout=b.dropout,
            num_sub_blocks=b.num_sub_blocks,
            norm_type=b.norm_type or ec.norm_type,
            additional_context=b.additional_context)
        for b in ec.blocks)
    encoder = EncoderSpec(
        input_features=ec.input_features,
        prologue_kernel_size=ec.prologue_kernel_size,
        prologue_stride=ec.prologue_stride,
        prologue_dilation=ec.prologue_dilation,
        blocks=blocks,
        epilogue_features=ec.epilogue_features,
        epilogue_kernel_size=ec.epilogue_kernel_size,
        epilogue_stride=ec.epilogue_stride,
        epilogue_dilation=ec.epilogue_dilation,
        output_features=ec.output_features,
        norm_type=ec.norm_type)

    pc = cfg.predictor
    if pc.kind == "conv":
        predictor = ConvPredictorSpec(
            num_symbols=cfg.num_total_symbols, output_dim=pc.output_dim,
            symbol_embedding_dim=pc.symbol_embedding_dim, dropout=pc.dropout)
    elif pc.kind == "lstm":
        predictor = LSTMPredictorSpec(
            num_symbols=cfg.num_total_symbols, output_dim=pc.output_dim,
            symbol_embedding_dim=pc.symbol_embedding_dim,
            num_lstm_layers=pc.num_lstm_layers,
            lstm_hidden_dim=pc.lstm_hidden_dim,
            lstm_layer_norm=pc.lstm_layer_norm,
            lstm_dropout=pc.dropout)
    else:
        raise ValueError(f"unknown predictor kind: {pc.kind}")

    joint = JointSpec(
        audio_features=cfg.joint.audio_features,
        text_features=cfg.joint.text_features,
        hidden_features=cfg.joint.hidden_features,
        num_classes=cfg.num_total_symbols)

    if cfg.training.loss_impl == "pruned" and cfg.training.lattice_shard_t:
        # The pruned banded DP never materializes the full-T lattice per
        # device the way lattice_shard_t addresses (its band is O(T*band)),
        # and the two code paths don't compose — fail at config build
        # rather than silently dropping the sharding flag.
        raise ValueError(
            "training.lattice_shard_t is not supported with "
            "training.loss_impl='pruned': the banded lattice is already "
            "O(T*band) per device; use loss_impl='chunked' (or 'auto') for "
            "the T-sharded lattice, or drop lattice_shard_t for the pruned "
            "loss")

    return RNNTSpec(encoder=encoder, predictor=predictor, joint=joint,
                    loss_chunk_size=cfg.training.loss_chunk_size,
                    loss_impl=cfg.training.loss_impl,
                    pruned_band=cfg.training.pruned_band,
                    pruned_simple_scale=cfg.training.pruned_simple_scale,
                    pruned_scale=cfg.training.pruned_scale,
                    grad_clamp=cfg.training.rnnt_grad_clamp,
                    lattice_shard_t=cfg.training.lattice_shard_t)
