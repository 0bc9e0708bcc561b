"""Eval CLI: ``python -m rnnt_tpu.cli.eval <checkpoint_dir> [--config yaml]``.

Parity with ``python -m rnnt.eval`` (reference rnnt/eval.py:23-125):
restore checkpoint + sibling config, greedy-decode the eval set, print
per-utterance original/decoded pairs, corpus WER, and wall-time per sample
— but decoding whole batches in one jitted loop instead of per-utterance
Python (reference eval runs batch-size 1 on CPU).
"""

from __future__ import annotations

import argparse
import time

import jax
import numpy as np

from rnnt_tpu.config.config import build_featurizer_spec, build_model_spec, load_config
from rnnt_tpu.data.dataset import BatchIterator, Buckets
from rnnt_tpu.decode.greedy import greedy_decode
from rnnt_tpu.train import checkpoint as ckpt
from rnnt_tpu.train.loop import _load_tokenizer
from rnnt_tpu.train.metrics import wer
from rnnt_tpu.train.step import make_eval_forward


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("checkpoint", help="checkpoint directory")
    ap.add_argument("--config", default=None,
                    help="config yaml (default: next to checkpoint)")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--max-elements", type=int, default=200)
    ap.add_argument("--beam", type=int, default=0,
                    help="beam width (0 = greedy decode)")
    ap.add_argument("--rescore", action="store_true",
                    help="with --beam: pick each utterance's hypothesis "
                         "from the final beam (+ greedy candidate) by the "
                         "EXACT sum-over-alignments NLL "
                         "(decode/rescore.py marginal_rescore)")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu, tpu)")
    args = ap.parse_args(argv)

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    cfg_path = args.config or ckpt.find_config(args.checkpoint)
    cfg = load_config(cfg_path)
    spec = build_model_spec(cfg)
    fspec = build_featurizer_spec(cfg)
    tokenizer = _load_tokenizer(cfg)

    restored = ckpt.restore_checkpoint(args.checkpoint)
    params, model_state = restored["params"], restored["model_state"]

    # Same eval corpus the training loop evaluated on (honors
    # eval_on_train and the synthetic-corpus knobs — a regenerated
    # seed-1 corpus here used to report nonsense WER on overfit
    # checkpoints).
    from rnnt_tpu.train.loop import _load_datasets
    _, ds = _load_datasets(cfg)

    buckets = Buckets.from_frames(cfg.training.frame_buckets,
                                  cfg.training.token_buckets, fspec)
    it = BatchIterator(ds, tokenizer, buckets, batch_size=args.batch_size,
                      shuffle=False, drop_last=False,
                      max_batches=max(args.max_elements // args.batch_size, 1),
                      wire_dtype=cfg.data.wire_dtype)

    eval_forward = jax.jit(make_eval_forward(spec, fspec, cfg.training.precision))
    max_tokens = max(cfg.training.token_buckets)
    if args.beam > 0 and args.rescore:
        from rnnt_tpu.decode.beam import beam_decode_nbest
        from rnnt_tpu.decode.rescore import marginal_rescore

        def _rescored(p, a, tl):
            toks, cnts, _ = beam_decode_nbest(
                p, a, tl, spec.predictor, spec.joint,
                beam_width=args.beam, max_tokens=max_tokens)
            full = {"predictor": p["predictor"], "joint": p["joint"]}
            best_t, best_n, _ = marginal_rescore(
                full, a, tl, toks, cnts, spec.predictor, spec.joint,
                chunk_size=cfg.training.loss_chunk_size)
            return best_t, best_n

        decode_fn = jax.jit(_rescored)
    elif args.beam > 0:
        from rnnt_tpu.decode.beam import beam_decode
        decode_fn = jax.jit(lambda p, a, tl: beam_decode(
            p, a, tl, spec.predictor, spec.joint, beam_width=args.beam,
            max_tokens=max_tokens)[:2])
    else:
        decode_fn = jax.jit(lambda p, a, tl: greedy_decode(
            p, a, tl, spec.predictor, spec.joint, max_tokens=max_tokens))

    originals, decoded = [], []
    t0 = time.time()
    n = 0
    for batch in it:
        audio, t_lens = eval_forward(params, model_state, batch)
        tokens, counts = decode_fn(
            {"predictor": params["predictor"], "joint": params["joint"]},
            audio, t_lens)
        tokens, counts = np.asarray(tokens), np.asarray(counts)
        for i in range(len(counts)):
            if batch["target_lens"][i] == 0:
                continue
            orig = tokenizer.decode(batch["targets"][i, :batch["target_lens"][i]])
            hyp = tokenizer.decode(tokens[i, : counts[i]])
            print(f"\nOriginal: {orig}\nDecoded : {hyp}")
            originals.append(orig)
            decoded.append(hyp)
            n += 1
    dt = time.time() - t0
    print(f"\nWER: {wer(originals, decoded):.4f}")
    print(f"Total time: {dt:.2f}s, {dt / max(n, 1):.3f}s per sample")


if __name__ == "__main__":
    main()
