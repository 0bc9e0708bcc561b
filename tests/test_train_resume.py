"""Training loop integration: checkpoint -> resume continues at the right
step with the same optimizer state (the reference cannot resume at all —
SURVEY.md §5)."""

import numpy as np
import pytest

from rnnt_tpu.config.config import Config, BlockConfig
from rnnt_tpu.train.loop import train


def _tiny_cfg(tmp_path, total_steps):
    cfg = Config()
    cfg.model_name = "resume_test"
    cfg.tokenizer.spm_model = "/root/reference/spm_unigram_1023.model"
    cfg.encoder.blocks = [BlockConfig(5, 32, 32, 0.0, 1)]
    cfg.encoder.epilogue_features = 32
    cfg.encoder.output_features = 32
    cfg.predictor.output_dim = 32
    cfg.predictor.symbol_embedding_dim = 16
    cfg.predictor.dropout = 0.0
    cfg.joint.hidden_features = 32
    cfg.training.precision = "fp32"
    cfg.training.total_steps = total_steps
    cfg.training.num_epochs = 100
    cfg.training.global_batch_size = 4
    cfg.training.log_steps = 2
    cfg.training.eval_steps = 10 ** 6
    cfg.training.checkpoint_steps = total_steps
    cfg.training.loss_chunk_size = 8
    cfg.training.frame_buckets = [128]
    cfg.training.token_buckets = [32]
    cfg.data.dataset = "synthetic"
    cfg.data.synthetic_size = 16
    cfg.data.synthetic_seconds = 1.0
    cfg.data.augment = False
    return cfg


def test_train_checkpoint_resume(tmp_path):
    base = str(tmp_path)
    cfg = _tiny_cfg(tmp_path, total_steps=3)
    train(cfg, output_base=base)

    run_dir = tmp_path / "resume_test" / "run-1"
    ckpts = list(run_dir.glob("checkpoint_step_*"))
    assert ckpts, f"no checkpoint in {run_dir}"
    assert (run_dir / "config.yaml").exists()
    assert (run_dir / "metrics.jsonl").exists()

    # Resume for 2 more steps; the new run must log steps 4..5.
    cfg2 = _tiny_cfg(tmp_path, total_steps=5)
    train(cfg2, output_base=base, resume=str(ckpts[0]))
    run2 = tmp_path / "resume_test" / "run-2"
    metrics = (run2 / "metrics.jsonl").read_text()
    import json
    steps = [json.loads(l)["step"] for l in metrics.splitlines()
             if '"loss/train"' in l]
    assert steps and min(steps) >= 4, steps
