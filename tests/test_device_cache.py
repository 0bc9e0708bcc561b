"""Device-resident sample staging (data/device_cache.py): the cache must
hold exactly the streamed corpus, serve full-coverage shuffled epochs, and
plug into the train step with identical numerics to a host-staged batch."""

import numpy as np
import pytest

from rnnt_tpu.data.dataset import BatchIterator, Buckets, synthetic_dataset
from rnnt_tpu.data.device_cache import DeviceSampleCache, make_cached_train_step
from rnnt_tpu.data.tokenizer import UnigramTokenizer
from rnnt_tpu.ops.stft import FeaturizerSpec

SPM = "/root/reference/spm_unigram_1023.model"


@pytest.fixture(scope="module")
def tok():
    return UnigramTokenizer.from_file(SPM)


def _build(tok, wire="int16", size=24, budget=None):
    spec = FeaturizerSpec()
    buckets = Buckets.from_frames([256, 512], [64], spec)
    ds = synthetic_dataset(size, 3.0, seed=3)
    cache = DeviceSampleCache.build(ds, tok, buckets, wire_dtype=wire,
                                    budget_bytes=budget)
    return ds, buckets, cache


def test_cache_matches_streamed_rows(tok):
    ds, buckets, cache = _build(tok)
    # Streamed reference: same iterator settings the cache builder uses.
    batches = list(BatchIterator(ds, tok, buckets, batch_size=64,
                                 augmentor=None, shuffle=False,
                                 drop_last=False, wire_dtype="int16"))
    by_shape = {}
    for b in batches:
        key = (b["audio"].shape[1], b["targets"].shape[1])
        by_shape.setdefault(key, []).append(b)
    assert cache.n_samples == sum(len(b["audio_lens"]) for b in batches)
    groups = {(g["audio"].shape[1], g["targets"].shape[1]): g
              for g in cache.groups}
    assert set(groups) == set(by_shape)
    for key, bs in by_shape.items():
        for k in ("audio", "audio_lens", "targets", "target_lens"):
            want = np.concatenate([b[k] for b in bs], axis=0)
            np.testing.assert_array_equal(np.asarray(groups[key][k]), want)


def test_epoch_coverage_and_determinism(tok):
    _, _, cache = _build(tok)
    B = 4
    seen = []
    for gi, idx in cache.epoch_batches(B, seed=7):
        assert idx.shape == (B,) and idx.dtype == np.int32
        seen.extend((gi, int(i)) for i in idx)
    # Full batches only, no sample twice.
    assert len(seen) == len(set(seen))
    assert len(seen) == cache.steps_per_epoch(B) * B
    # Deterministic per seed, different across seeds.
    a = [(gi, tuple(ix)) for gi, ix in cache.epoch_batches(B, seed=7)]
    b = [(gi, tuple(ix)) for gi, ix in cache.epoch_batches(B, seed=7)]
    c = [(gi, tuple(ix)) for gi, ix in cache.epoch_batches(B, seed=8)]
    assert a == b
    assert a != c
    # Audio-seconds accounting matches the host copy of lens.
    gi, idx = a[0][0], np.asarray(a[0][1], np.int32)
    want = float(np.asarray(cache.groups[gi]["audio_lens"])[idx].sum()) / 16000.0
    assert abs(cache.batch_audio_seconds(gi, idx) - want) < 1e-9


def test_budget_fallback(tok):
    _, _, cache = _build(tok, budget=1024)  # 1 KiB: nothing fits
    assert cache is None


def test_cached_gather_equals_host_batch(tok):
    """Both gather flavors (the production two-dispatch gather_jit and the
    fused in-step make_cached_train_step) return bit-identical batches to
    host-side indexing of the same rows."""
    import jax

    _, _, cache = _build(tok)
    gi, idx = next(cache.epoch_batches(4, seed=0))

    got2 = cache.gather_jit()(cache.groups[gi], idx)
    probe = jax.jit(make_cached_train_step(
        lambda state, batch, rng: (state, batch)))
    _, got1 = probe(0, cache.groups[gi], idx, None)
    for k, v in cache.groups[gi].items():
        want = np.asarray(v)[idx]
        np.testing.assert_array_equal(np.asarray(got1[k]), want)
        np.testing.assert_array_equal(np.asarray(got2[k]), want)


def test_train_loop_device_staging(tmp_path):
    """cli-level smoke: tiny_conv with staging=device trains, logs, and
    checkpoints; loss is finite and the cache actually engaged."""
    import io
    from contextlib import redirect_stdout

    from rnnt_tpu.cli.train import resolve_config
    from rnnt_tpu.config.config import apply_overrides, load_config
    from rnnt_tpu.train.loop import train

    cfg = load_config(resolve_config("tiny_conv"))
    apply_overrides(cfg, ["data.staging=device", "data.synthetic_size=32",
                          "training.total_steps=4", "training.log_steps=2",
                          "training.eval_steps=4",
                          "training.eval_max_elements=8"])
    out = io.StringIO()
    with redirect_stdout(out):
        wer = train(cfg, output_base=str(tmp_path), max_steps=4)
    text = out.getvalue()
    assert "device sample cache:" in text
    assert np.isfinite(wer)


def test_staging_device_rejects_host_augment(tmp_path):
    from rnnt_tpu.cli.train import resolve_config
    from rnnt_tpu.config.config import apply_overrides, load_config
    from rnnt_tpu.train.loop import train

    cfg = load_config(resolve_config("tiny_conv"))
    apply_overrides(cfg, ["data.staging=device", "data.augment=true",
                          "data.augment_device=false"])
    with pytest.raises(ValueError, match="host-side"):
        train(cfg, output_base=str(tmp_path), max_steps=1)
