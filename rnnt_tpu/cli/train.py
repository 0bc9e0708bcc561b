"""Train CLI: ``python -m rnnt_tpu.cli.train --config <yaml> [--resume ckpt]``.

Parity with ``python -m rnnt.train --config-name <yaml>``
(reference rnnt/train.py:23,221); adds --resume (the reference has no
training-resume path) and --max-steps for smoke runs.
"""

from __future__ import annotations

import argparse
from pathlib import Path

from rnnt_tpu.config.config import load_config
from rnnt_tpu.train.loop import train

CONFIG_DIR = Path(__file__).resolve().parent.parent / "config" / "configs"


def resolve_config(name: str) -> Path:
    p = Path(name)
    if p.exists():
        return p
    cand = CONFIG_DIR / name
    if cand.exists():
        return cand
    cand = CONFIG_DIR / f"{name}.yaml"
    if cand.exists():
        return cand
    raise FileNotFoundError(f"config {name!r} not found (looked in {CONFIG_DIR})")


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="base_convjs",
                    help="config name (in rnnt_tpu/config/configs) or path")
    ap.add_argument("--resume", default=None, help="checkpoint dir to resume")
    ap.add_argument("--max-steps", type=int, default=None)
    ap.add_argument("--output-base", default="experiments")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu, tpu)")
    ap.add_argument("--profile", action="store_true",
                    help="capture a jax.profiler trace of steps 3-6 into "
                         "<run_dir>/trace (view in TensorBoard/Perfetto)")
    ap.add_argument("--set", action="append", default=[], dest="overrides",
                    metavar="KEY.PATH=VALUE",
                    help="dotted config override (Hydra-grammar parity), "
                         "e.g. --set training.loss_impl=pruned")
    args = ap.parse_args(argv)

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from rnnt_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    # Multi-host startup: the TPU-native replacement for the reference's
    # torchrun/RANK rendezvous (reference rnnt/train.py:25-36).  When the
    # standard coordinator env vars are present, join the distributed
    # runtime; the rest of the code is identical on 1 or N hosts.
    import os
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        import jax
        jax.distributed.initialize()

    cfg = load_config(resolve_config(args.config))
    from rnnt_tpu.config.config import apply_overrides
    apply_overrides(cfg, args.overrides)
    final_wer = train(cfg, output_base=args.output_base, resume=args.resume,
                      max_steps=args.max_steps, profile=args.profile)
    print(f"final wer: {final_wer}")


if __name__ == "__main__":
    main()
