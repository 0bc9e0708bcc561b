"""Training loop: data → jitted sharded step → metrics/eval/checkpoint.

Capability parity with the reference trainer (reference rnnt/train.py:23-221):
config-driven setup, TensorBoard metrics (loss, lr, grad-norm, input length,
epoch), periodic greedy-decode WER eval, periodic + final checkpointing,
process-0-only side effects.  DDP/NCCL/DistributedSampler are replaced by
mesh sharding (rnnt_tpu/parallel); the eval decode is the batched jitted
while_loop instead of a per-utterance Python loop (rnnt/train.py:170-201).
Training resume (absent in the reference) restores params/opt state/step.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from rnnt_tpu.config.config import Config, build_featurizer_spec, build_model_spec
from rnnt_tpu.data.dataset import (
    BatchIterator,
    Buckets,
    commonvoice_dataset,
    concatenate_rows,
    librispeech_dataset,
    synthetic_dataset,
)
from rnnt_tpu.data.tokenizer import UnigramTokenizer
from rnnt_tpu.decode.greedy import greedy_decode
from rnnt_tpu.models.rnnt import rnnt_init
from rnnt_tpu.parallel.mesh import make_mesh, param_shardings
from rnnt_tpu.train import checkpoint as ckpt
from rnnt_tpu.train.metrics import wer
from rnnt_tpu.train.optim import make_optimizer
from rnnt_tpu.train.step import TrainState, make_eval_forward, make_train_step


def _load_tokenizer(cfg: Config) -> UnigramTokenizer:
    if cfg.tokenizer.spm_model:
        return UnigramTokenizer.from_file(cfg.tokenizer.spm_model)
    if cfg.tokenizer.vocab_json:
        return UnigramTokenizer.from_vocab_json(cfg.tokenizer.vocab_json)
    raise ValueError("config.tokenizer needs spm_model or vocab_json")


def _load_datasets(cfg: Config):
    dc = cfg.data
    if dc.dataset == "synthetic":
        train = synthetic_dataset(dc.synthetic_size, dc.synthetic_seconds,
                                  seed=0, max_words=dc.synthetic_max_words)
        if dc.eval_on_train:
            return train, train
        evals = synthetic_dataset(max(dc.synthetic_size // 8, 8),
                                  dc.synthetic_seconds, seed=1,
                                  max_words=dc.synthetic_max_words)
        return train, evals
    if dc.dataset not in ("librispeech", "commonvoice"):
        raise ValueError(f"unknown dataset {dc.dataset}")

    def load(split: str):
        """A split may carry an explicit corpus prefix ("commonvoice:train",
        "librispeech:train.clean.100"); unprefixed splits use cfg.data.dataset.
        This covers the reference's mixed fullcausal recipe (librispeech
        100/360/500 + commonvoice train in one training set,
        rnnt/config/basic_sp_convjs_fullcausal.yaml:97-151)."""
        corpus, _, name = split.rpartition(":")
        corpus = corpus or dc.dataset
        if corpus == "librispeech":
            return librispeech_dataset([name], dc.cache_dir)
        if corpus == "commonvoice":
            return commonvoice_dataset(name, dc.cache_dir)
        raise ValueError(f"unknown corpus prefix {corpus!r} in split {split!r}")

    train = concatenate_rows([load(s) for s in dc.train_splits])
    evals = train if dc.eval_on_train else load(dc.eval_split)
    return train, evals


def _shard_batch(batch: dict, mesh) -> dict:
    """Place a host batch on the mesh, batch axis on "data".

    Single-host: a plain sharded device_put of the global batch.
    Multi-host: each process feeds its own disjoint shard (BatchIterator
    shard_id/num_shards — the reference's DistributedSampler,
    rnnt/train.py:89) and the global array is assembled from the
    process-local shards without any cross-host copy."""
    shardings = {
        "audio": NamedSharding(mesh, P("data", None)),
        "audio_lens": NamedSharding(mesh, P("data")),
        "targets": NamedSharding(mesh, P("data", None)),
        "target_lens": NamedSharding(mesh, P("data")),
    }
    if jax.process_count() > 1:
        return {k: jax.make_array_from_process_local_data(shardings[k], v)
                for k, v in batch.items()}
    return {k: jax.device_put(v, shardings[k]) for k, v in batch.items()}


class MetricsLogger:
    """TensorBoard (when available) + metrics.jsonl + stdout."""

    def __init__(self, output_dir: Path, enabled: bool):
        self.enabled = enabled
        self.writer = None
        self.jsonl = None
        if enabled:
            try:
                from tensorboardX import SummaryWriter
                self.writer = SummaryWriter(logdir=str(output_dir))
            except Exception:
                self.writer = None
            self.jsonl = open(output_dir / "metrics.jsonl", "a")

    def log(self, step: int, scalars: dict):
        if not self.enabled:
            return
        if self.writer is not None:
            for k, v in scalars.items():
                self.writer.add_scalar(k, v, step)
        if self.jsonl is not None:
            self.jsonl.write(json.dumps({"step": step, **scalars}) + "\n")
            self.jsonl.flush()

    def log_histograms(self, step: int, tree, prefix: str = "weights"):
        """Per-parameter histograms (reference rnnt/train.py:147-153)."""
        if not self.enabled or self.writer is None:
            return
        import numpy as np

        def visit(path, leaf):
            name = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                            for p in path)
            self.writer.add_histogram(f"{prefix}/{name}",
                                      np.asarray(leaf).ravel(), step)

        jax.tree_util.tree_map_with_path(visit, tree)

    def close(self):
        if self.writer is not None:
            self.writer.close()
        if self.jsonl is not None:
            self.jsonl.close()


def train(cfg: Config, *, output_base: str = "experiments",
          resume: str | None = None, max_steps: int | None = None,
          make_augmentor=None, profile: bool = False) -> float:
    """Train per config; returns the last eval WER (reference convention,
    rnnt/train.py:218)."""
    tc = cfg.training
    mesh = make_mesh(cfg.mesh.data, cfg.mesh.model)
    # The global batch must divide the data axis; shrink the mesh to the
    # largest data-axis size that divides it rather than erroring out.
    if tc.global_batch_size % mesh.shape["data"] != 0:
        d = mesh.shape["data"]
        while tc.global_batch_size % d != 0:
            d -= 1
        mesh = make_mesh(d, cfg.mesh.model)
        print(f"note: data axis reduced to {d} to divide global batch "
              f"{tc.global_batch_size}")
    is_main = jax.process_index() == 0

    spec = build_model_spec(cfg)
    fspec = build_featurizer_spec(cfg)
    tokenizer = _load_tokenizer(cfg)
    train_ds, eval_ds = _load_datasets(cfg)
    buckets = Buckets.from_frames(tc.frame_buckets, tc.token_buckets, fspec)

    augmentor = None
    full_device_augment = cfg.data.augment_device == "full"
    if cfg.data.augment and make_augmentor is not None:
        augmentor = make_augmentor(cfg)
    elif cfg.data.augment and cfg.data.augmentations:
        from rnnt_tpu.data.augment import build_augmentor
        from rnnt_tpu.data.augment_device import (
            DEVICE_SIDE_KINDS, DEVICE_SIDE_KINDS_FULL)
        aug_cfgs = cfg.data.augmentations
        if cfg.data.augment_device:
            from rnnt_tpu.data.augment_device import (
                warn_stripped_param_mismatch)
            skip = (DEVICE_SIDE_KINDS_FULL if full_device_augment
                    else DEVICE_SIDE_KINDS)
            stripped = [c for c in aug_cfgs if c.get("kind") in skip]
            warn_stripped_param_mismatch(stripped)
            aug_cfgs = [c for c in aug_cfgs if c.get("kind") not in skip]
        augmentor = build_augmentor(aug_cfgs) if aug_cfgs else None
    elif cfg.data.augment and full_device_augment:
        # The ENTIRE recipe runs inside the jitted step
        # (data/augment_device.py device_augment_full); host workers only
        # tokenize/collate.
        augmentor = None
    elif cfg.data.augment and cfg.data.augment_device:
        # Host keeps only the length-changing ops; chorus/compressor/
        # noise/peak run inside the jitted step (data/augment_device.py).
        from rnnt_tpu.data.augment_device import host_only_default_augmentor
        augmentor = host_only_default_augmentor()
    elif cfg.data.augment:
        from rnnt_tpu.data.augment import default_augmentor
        augmentor = default_augmentor()

    output_dir = ckpt.next_run_dir(output_base, cfg.model_name)
    logger = MetricsLogger(output_dir, enabled=is_main)
    if is_main:
        from rnnt_tpu.config.config import save_config
        save_config(cfg, output_dir / "config.yaml")
        print(f"Output directory: {output_dir}")

    # Steps-per-epoch estimate for the LR schedule (exact length is only
    # known per-epoch with bucketing; the schedule needs a total).
    steps_per_epoch = max(len(train_ds) // tc.global_batch_size, 1)
    total_steps = tc.total_steps or steps_per_epoch * tc.num_epochs
    if max_steps is not None:
        total_steps = min(total_steps, max_steps)

    tx, sched = make_optimizer(tc, total_steps)

    params, model_state = rnnt_init(jax.random.PRNGKey(tc.seed), spec)
    if is_main:
        sizes = {k: sum(x.size for x in jax.tree.leaves(v))
                 for k, v in params.items()}
        for k, n in sizes.items():
            print(f"Number of {k} parameters: {n:,}")

    pshard = param_shardings(mesh, params)
    params = jax.device_put(params, pshard)
    model_state = jax.device_put(model_state, param_shardings(mesh, model_state))
    # Explicit shardings: without them jit leaves scalar opt leaves on a
    # single device, which conflicts with committed restored arrays on
    # resume.  AdamW moments of model-sharded weights shard like their
    # params (param_shardings matches the repeated param paths inside the
    # opt-state tree; scalars stay replicated via the rank guard).
    opt_shapes = jax.eval_shape(tx.init, params)
    opt_shardings = param_shardings(mesh, opt_shapes)
    opt_state = jax.jit(tx.init, out_shardings=opt_shardings)(params)
    state = TrainState(params, opt_state, model_state, jnp.zeros((), jnp.int32))

    if resume:
        payload = {"params": state.params, "opt_state": state.opt_state,
                   "model_state": state.model_state, "step": 0}
        restored = ckpt.restore_checkpoint(resume, payload)
        # Re-place restored arrays on the mesh shardings the fresh state
        # used (orbax restores to default single-device placement).
        shardings = jax.tree.map(lambda x: x.sharding,
                                 (state.params, state.opt_state,
                                  state.model_state))
        p, o, m = jax.device_put(
            (restored["params"], restored["opt_state"],
             restored["model_state"]), shardings)
        state = TrainState(p, o, m,
                           jnp.asarray(restored["step"], jnp.int32))
        if is_main:
            print(f"Resumed from {resume} at step {int(state.step)}")

    raw_step = make_train_step(
        spec, fspec, tx, tc.precision, mesh=mesh,
        spec_augment=tc.spec_augment,
        device_augment=cfg.data.augment and cfg.data.augment_device)
    step_fn = jax.jit(raw_step, donate_argnums=(0,))
    # k2-style pruned warmup: exact-loss (+simple heads) step for the
    # first pruned_warmup_steps, then the banded step takes over (one
    # extra compile at the switch; resume-safe — selection is by
    # state.step).
    raw_warm_step = None
    warm_step_fn = None
    warmup_until = 0
    if spec.loss_impl == "pruned" and tc.pruned_warmup_steps > 0:
        import dataclasses as _dcw

        warmup_until = tc.pruned_warmup_steps
        raw_warm_step = make_train_step(
            _dcw.replace(spec, loss_impl="pruned_warmup"), fspec, tx,
            tc.precision, mesh=mesh, spec_augment=tc.spec_augment,
            device_augment=cfg.data.augment and cfg.data.augment_device)
        warm_step_fn = jax.jit(raw_warm_step, donate_argnums=(0,))

    # Device-resident staging (data/device_cache.py): stage the corpus in
    # HBM once and gather batches on device — per-step H2D drops to a
    # (B,) index vector.  Requires no host-side augmentation (the cache is
    # augmentation-free; in-step device augmentation keeps epochs fresh)
    # and a single process (multi-host keeps the streamed per-shard path).
    cache = None
    cached_gather = None
    if cfg.data.staging not in ("auto", "stream", "device"):
        raise ValueError(f"data.staging must be auto|stream|device, "
                         f"got {cfg.data.staging!r}")
    want_cache = cfg.data.staging in ("auto", "device")
    if cfg.data.staging == "device" and augmentor is not None:
        raise ValueError("data.staging: device requires no host-side "
                         "augmentation (set data.augment_device: full "
                         "or data.augment: false)")
    if want_cache and augmentor is None and jax.process_count() == 1:
        from rnnt_tpu.data.device_cache import DeviceSampleCache
        budget = cfg.data.device_cache_budget_mb << 20
        cache = DeviceSampleCache.build(
            train_ds, tokenizer, buckets, wire_dtype=cfg.data.wire_dtype,
            mesh=mesh, budget_bytes=budget,
            sample_rate=fspec.sample_rate,
            num_workers=cfg.data.num_workers)
        if cache is None:
            if cfg.data.staging == "device":
                raise ValueError(
                    f"data.staging: device — corpus exceeds "
                    f"device_cache_budget_mb={cfg.data.device_cache_budget_mb}")
            if is_main:
                print("note: corpus exceeds device_cache_budget_mb; "
                      "streaming batches")
        else:
            # Two dispatches per step: the tiny gather program + the SAME
            # jitted step the streamed path uses (see gather_jit's note on
            # why fusing the gather into the step is a compile trap).
            cached_gather = cache.gather_jit(mesh)
            if is_main:
                print(f"device sample cache: {cache.n_samples} samples, "
                      f"{cache.nbytes() / 2**20:.1f} MiB in HBM")
    eval_forward = jax.jit(make_eval_forward(spec, fspec, tc.precision))
    # Cross-objective comparable eval metric: the EXACT transducer NLL on
    # the eval stream, regardless of the training objective — pruned-loss
    # A/Bs (scripts/pruned_ab.py) compare variants on this curve, since the
    # pruned objective (0.5*simple + banded) is not numerically comparable
    # to the exact NLL.
    import dataclasses as _dc
    from rnnt_tpu.train.step import make_loss_fn as _make_loss_fn
    _exact_spec = (_dc.replace(spec, loss_impl="chunked")
                   if spec.loss_impl == "pruned" else spec)
    _exact_loss = _make_loss_fn(_exact_spec, fspec, tc.precision)
    eval_loss_fn = jax.jit(
        lambda p, ms, b: _exact_loss(p, ms, b, None, False)[0])
    max_eval_tokens = max(tc.token_buckets)
    decode_fn = jax.jit(lambda p, a, tl: greedy_decode(
        p, a, tl, spec.predictor, spec.joint, max_tokens=max_eval_tokens))

    rng = jax.random.PRNGKey(42 + 1009 * tc.seed)
    last_wer = float("nan")
    completed = int(state.step)
    start_step = completed
    t_log = time.time()
    audio_secs_since_log = 0.0
    pending = []  # (step, metrics dict of device scalars)

    def flush_metrics(epoch):
        nonlocal pending, t_log, audio_secs_since_log
        if not pending:
            return
        dt = time.time() - t_log
        # Failure detection (the reference has none, SURVEY.md §5): a
        # non-finite loss aborts with an emergency checkpoint so the run is
        # resumable from just before the blow-up.
        last_loss = float(pending[-1][1]["loss"])
        if not np.isfinite(last_loss):
            if is_main:
                ckpt.save_checkpoint(output_dir, state, cfg, wait=True)
            raise FloatingPointError(
                f"non-finite loss {last_loss} at step {pending[-1][0]}; "
                f"emergency checkpoint saved to {output_dir}")
        for s, m in pending:
            scalars = {"loss/train": float(m["loss"]),
                       "total_norm/train": float(m["grad_norm"]),
                       "learning_rate": float(sched(s - 1)),
                       "input_length/train": int(m["total_target_len"]),
                       "epoch": epoch}
            # Per-submodel grad norms (reference rnnt/train.py:155-161).
            scalars.update({f"total_norm/{k.split('/', 1)[1]}": float(v)
                            for k, v in m.items()
                            if k.startswith("grad_norm/")})
            logger.log(s, scalars)
        sps = len(pending) / dt if dt > 0 else 0.0
        asps = audio_secs_since_log / dt if dt > 0 else 0.0
        if is_main:
            print(f"step {pending[-1][0]}: loss={float(pending[-1][1]['loss']):.3f} "
                  f"{sps:.2f} steps/s {asps:.1f} audio-s/s")
        logger.log(pending[-1][0], {"steps_per_sec": sps,
                                    "audio_seconds_per_sec": asps})
        pending = []
        audio_secs_since_log = 0.0
        t_log = time.time()

    def run_eval():
        # Every host evaluates the same (unsharded) eval stream, so the WER
        # is identical everywhere and only process 0 logs it — the
        # rank-0-eval convention without cross-host result exchange.
        nonlocal last_wer
        eval_iter = BatchIterator(
            eval_ds, tokenizer, buckets, batch_size=tc.global_batch_size,
            shuffle=False, drop_last=False,
            max_batches=max(tc.eval_max_elements // tc.global_batch_size, 1),
            wire_dtype=cfg.data.wire_dtype)
        originals, decoded = [], []
        exact_losses = []
        for eb in eval_iter:
            sb = _shard_batch(eb, mesh)
            exact_losses.append(
                float(eval_loss_fn(state.params, state.model_state, sb)))
            audio, t_lens = eval_forward(state.params, state.model_state, sb)
            tokens, counts = decode_fn(
                {"predictor": state.params["predictor"],
                 "joint": state.params["joint"]}, audio, t_lens)
            tokens = np.asarray(tokens)
            counts = np.asarray(counts)
            for i in range(len(counts)):
                if eb["target_lens"][i] == 0:
                    continue
                ref_ids = eb["targets"][i, : eb["target_lens"][i]]
                originals.append(tokenizer.decode(ref_ids))
                decoded.append(tokenizer.decode(tokens[i, : counts[i]]))
        if originals:
            last_wer = wer(originals, decoded)
            scalars = {"wer/eval": last_wer}
            if exact_losses:
                scalars["loss/eval_exact"] = float(np.mean(exact_losses))
            logger.log(completed, scalars)
            if is_main:
                print(f"eval wer at step {completed}: {last_wer:.4f} "
                      f"(exact nll {scalars.get('loss/eval_exact', float('nan')):.3f})")
                for o, d in list(zip(originals, decoded))[:3]:
                    print(f"  ref: {o}\n  hyp: {d}")

    done = False

    def post_step(epoch, metrics, audio_secs):
        """Shared per-step bookkeeping for the streamed and cached paths."""
        nonlocal completed, audio_secs_since_log, done
        completed += 1
        if profile and completed - start_step == 6:
            jax.block_until_ready(metrics["loss"])
            jax.profiler.stop_trace()
            if is_main:
                print(f"profiler trace written to {output_dir / 'trace'}")
        audio_secs_since_log += audio_secs
        pending.append((completed, metrics))
        if completed % tc.log_steps == 0:
            flush_metrics(epoch)
        if completed % tc.eval_steps == 0 or completed == total_steps:
            flush_metrics(epoch)
            run_eval()
        if completed % tc.hist_steps == 0 and is_main:
            logger.log_histograms(completed, state.params)
        if completed % tc.checkpoint_steps == 0 and is_main:
            # Async: snapshots to host, persists in the background.
            ckpt.save_checkpoint(output_dir, state, cfg)
        if completed >= total_steps:
            done = True

    for epoch in range(max(tc.num_epochs, 1)):
        if done:
            break
        if cache is not None:
            for gi, idx in cache.epoch_batches(tc.global_batch_size,
                                               seed=epoch):
                if profile and completed - start_step == 2:
                    jax.block_until_ready(state.step)
                    jax.profiler.start_trace(str(output_dir / "trace"))
                batch = cached_gather(cache.groups[gi], idx)
                fn = (warm_step_fn if warm_step_fn is not None
                      and completed < warmup_until else step_fn)
                state, metrics = fn(state, batch, rng)
                post_step(epoch, metrics,
                          cache.batch_audio_seconds(gi, idx))
                if done:
                    break
            continue
        n_proc = jax.process_count()
        if tc.global_batch_size % n_proc:
            raise ValueError(f"global batch {tc.global_batch_size} must "
                             f"divide across {n_proc} processes")
        it = BatchIterator(train_ds, tokenizer, buckets,
                           batch_size=tc.global_batch_size // n_proc,
                           augmentor=augmentor, shuffle=True, seed=epoch,
                           num_workers=cfg.data.num_workers,
                           worker_mode=cfg.data.worker_mode,
                           shard_id=jax.process_index(), num_shards=n_proc,
                           wire_dtype=cfg.data.wire_dtype)
        from rnnt_tpu.data.pipeline import PrefetchIterator
        for batch in PrefetchIterator(it, depth=4):
            sb = _shard_batch(batch, mesh)
            # Profile steps 3-6 of this run (past compile + warmup).
            if profile and completed - start_step == 2:
                jax.block_until_ready(state.step)
                jax.profiler.start_trace(str(output_dir / "trace"))
            fn = (warm_step_fn if warm_step_fn is not None
                  and completed < warmup_until else step_fn)
            state, metrics = fn(state, sb, rng)
            post_step(epoch, metrics,
                      float(batch["audio_lens"].sum()) / fspec.sample_rate)
            if done:
                break

    flush_metrics(max(tc.num_epochs, 1) - 1)
    if np.isnan(last_wer):
        run_eval()
    if is_main:
        ckpt.save_checkpoint(output_dir, state, cfg, wait=True)
    ckpt.wait_for_checkpoints()
    logger.close()
    return last_wer
