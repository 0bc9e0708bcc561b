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


def test_async_save_is_donation_safe(tmp_path):
    """An async save must snapshot before returning: overwriting the live
    buffers right after save_checkpoint() must not corrupt the checkpoint."""
    import jax.numpy as jnp
    from rnnt_tpu.train import checkpoint as ckpt

    class State:
        params = {"w": jnp.arange(8, dtype=jnp.float32)}
        opt_state = {"m": jnp.zeros(8)}
        model_state = {}
        step = 7

    s = State()
    ckpt.save_checkpoint(tmp_path, s)  # async
    # Simulate donation: clobber the arrays the save referenced.
    s.params["w"] = s.params["w"] * 0 - 1.0
    ckpt.wait_for_checkpoints()
    restored = ckpt.restore_checkpoint(tmp_path / "checkpoint_step_7")
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.arange(8, dtype=np.float32))
    assert restored["step"] == 7
