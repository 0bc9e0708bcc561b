"""Checkpointing: orbax save/restore with the config saved alongside.

Parity + extension: the reference writes
{model_state_dict, optimizer_state_dict, completed_steps} per checkpoint
(reference rnnt/util.py:7-12) with config.yaml next to it as the
interchange format every consumer rediscovers
(rnnt/eval.py:26-30, rnnt/infer.py:24-25, rnnt/export_onnx.py:20-21) —
but has *no training resume path*.  Here checkpoints are orbax
(multi-host-safe) and restore feeds straight back into the train loop.

Saves are **asynchronous** by default: orbax copies the arrays to host
synchronously, then persists to disk in a background thread while
training continues — the device never idles on checkpoint I/O.  Callers
that need durability *now* (final/emergency checkpoints) pass
``wait=True``; ``wait_for_checkpoints()`` drains any pending save.
"""

from __future__ import annotations

from pathlib import Path

import jax
import orbax.checkpoint as ocp

from rnnt_tpu.config.config import Config, save_config


def checkpoint_dir(output_dir: str | Path, step: int) -> Path:
    return Path(output_dir) / f"checkpoint_step_{step}"


_CKPTR: ocp.StandardCheckpointer | None = None


def _checkpointer() -> ocp.StandardCheckpointer:
    global _CKPTR
    if _CKPTR is None:
        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def wait_for_checkpoints() -> None:
    """Block until any in-flight async save has committed to disk."""
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()


def save_checkpoint(output_dir: str | Path, state, cfg: Config | None = None,
                    *, wait: bool = False):
    """Save a TrainState; writes config.yaml beside it (interchange format).

    Returns once the arrays are snapshotted to host; disk persistence
    continues in the background (``wait=True`` blocks until committed).
    Donation-safe: the snapshot happens before return, so the train step
    may overwrite the live buffers immediately.
    """
    path = checkpoint_dir(output_dir, int(state.step)).absolute()
    ckptr = _checkpointer()
    ckptr.wait_until_finished()  # at most one save in flight
    payload = {"params": state.params, "opt_state": state.opt_state,
               "model_state": state.model_state, "step": int(state.step)}
    ckptr.save(path, payload, force=True)
    if wait:
        ckptr.wait_until_finished()
    if cfg is not None and jax.process_index() == 0:
        save_config(cfg, Path(output_dir) / "config.yaml")


def latest_checkpoint(output_dir: str | Path) -> Path | None:
    root = Path(output_dir)
    if not root.exists():
        return None
    ckpts = sorted(root.glob("checkpoint_step_*"),
                   key=lambda p: int(p.name.rsplit("_", 1)[1]))
    return ckpts[-1] if ckpts else None


def restore_checkpoint(path: str | Path, template=None):
    """Restore a checkpoint.  With ``template`` (a payload-shaped pytree of
    arrays/ShapeDtypeStructs) the restore is structure-checked — use for
    training resume.  Without it the full on-disk tree is returned as host
    arrays — use for eval/infer/export, which only need params/model_state
    (the reference's consumers restore the same way, rnnt/eval.py:32-48)."""
    wait_for_checkpoints()  # never read a checkpoint still being written
    ckptr = _checkpointer()
    if template is None:
        return ckptr.restore(Path(path).absolute())
    return ckptr.restore(Path(path).absolute(), template)


def find_config(checkpoint_path: str | Path) -> Path:
    """Config discovered next to the checkpoint, reference-convention
    (rnnt/eval.py:26-27)."""
    p = Path(checkpoint_path)
    for cand in (p / "config.yaml", p.parent / "config.yaml"):
        if cand.exists():
            return cand
    raise FileNotFoundError(f"no config.yaml next to {checkpoint_path}")


def next_run_dir(base: str | Path, model_name: str) -> Path:
    """experiments/<model_name>/run-N auto-increment
    (reference rnnt/util.py:26-43)."""
    root = Path(base) / model_name
    root.mkdir(parents=True, exist_ok=True)
    nums = [int(d.name.split("-")[-1]) for d in root.iterdir()
            if d.is_dir() and d.name.startswith("run-")]
    run = max(nums) + 1 if nums else 1
    out = root / f"run-{run}"
    out.mkdir(parents=True, exist_ok=True)
    return out
