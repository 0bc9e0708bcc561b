"""Host-only batch production rate for the e2e bench's tokenize/collate
pipeline (augmentor=None): how fast can this 2-CPU host actually feed?"""
import sys, time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")

    from rnnt_tpu.cli.train import resolve_config
    from rnnt_tpu.config.config import build_featurizer_spec, load_config
    from rnnt_tpu.data.dataset import BatchIterator, Buckets, synthetic_dataset
    from rnnt_tpu.data.pipeline import PrefetchIterator
    from rnnt_tpu.data.tokenizer import UnigramTokenizer

    cfg = load_config(resolve_config("base_convjs"))
    fspec = build_featurizer_spec(cfg)
    ds = synthetic_dataset(size=512, seconds=5.0)
    tok = UnigramTokenizer.from_file("/root/reference/spm_unigram_1023.model")
    buckets = Buckets.from_frames([512], [64], fspec)

    def batches(num_workers):
        epoch = 0
        while True:
            it = BatchIterator(ds, tok, buckets, batch_size=32,
                               augmentor=None, shuffle=True, seed=epoch,
                               num_workers=num_workers)
            yield from PrefetchIterator(it, depth=4)
            epoch += 1

    for nw in (2, 0):
        gen = batches(nw)
        for _ in range(3):
            next(gen)
        t0 = time.perf_counter()
        n, audio_s = 0, 0.0
        while time.perf_counter() - t0 < 20:
            b = next(gen)
            audio_s += float(np.sum(b["audio_lens"])) / 16000.0
            n += 1
        dt = time.perf_counter() - t0
        print(f"workers={nw}: {n/dt:.2f} batches/s, "
              f"{audio_s/dt:.0f} audio-s/s, {dt/n*1e3:.0f} ms/batch",
              flush=True)


if __name__ == "__main__":
    main()
