"""Config system — rnnt_tpu/config/config.py.

Covers the CLI override grammar (parity with the reference's Hydra
overrides, reference rnnt/train.py:23) including YAML-1.1 type traps, and
config-build validation of incompatible flag combinations."""

import pytest

from rnnt_tpu.cli.train import resolve_config
from rnnt_tpu.config.config import (
    apply_overrides,
    build_model_spec,
    load_config,
)


@pytest.fixture()
def cfg():
    return load_config(resolve_config("tiny_conv"))


def test_override_scientific_notation_coerces_to_float(cfg):
    # PyYAML (YAML 1.1) parses '1e-4' as a STRING; the override must still
    # land as a float on the float-typed field.
    apply_overrides(cfg, ["training.optimizer.lr=1e-4"])
    assert isinstance(cfg.training.optimizer.lr, float)
    assert cfg.training.optimizer.lr == 1e-4


def test_override_basic_types(cfg):
    apply_overrides(cfg, [
        "training.global_batch_size=8",
        "training.optimizer.lr=0.001",
        "training.spec_augment=true",
        "data.dataset=synthetic",
        "training.pruned_band=32",
    ])
    assert cfg.training.global_batch_size == 8
    assert cfg.training.optimizer.lr == pytest.approx(1e-3)
    assert cfg.training.spec_augment is True
    assert cfg.data.dataset == "synthetic"
    assert cfg.training.pruned_band == 32


def test_override_int_widens_to_float(cfg):
    apply_overrides(cfg, ["training.optimizer.lr=1"])
    assert isinstance(cfg.training.optimizer.lr, float)
    assert cfg.training.optimizer.lr == 1.0


def test_override_type_mismatch_raises(cfg):
    with pytest.raises(ValueError, match="cannot coerce"):
        apply_overrides(cfg, ["training.global_batch_size=banana"])


def test_override_unknown_path_raises(cfg):
    with pytest.raises(KeyError):
        apply_overrides(cfg, ["training.nonexistent=1"])
    with pytest.raises(ValueError):
        apply_overrides(cfg, ["training.global_batch_size"])  # no '='


def test_pruned_plus_lattice_shard_t_rejected(cfg):
    """loss_impl='pruned' + lattice_shard_t don't compose; config build
    must fail loudly instead of silently dropping the sharding flag."""
    cfg.training.loss_impl = "pruned"
    cfg.training.lattice_shard_t = True
    with pytest.raises(ValueError, match="lattice_shard_t"):
        build_model_spec(cfg)
    # Each alone stays fine.
    cfg.training.lattice_shard_t = False
    build_model_spec(cfg)
    cfg.training.loss_impl = "chunked"
    cfg.training.lattice_shard_t = True
    build_model_spec(cfg)
