"""Data pipeline tests: bucketing collation and the synthetic corpus."""

import numpy as np

from rnnt_tpu.data.dataset import BatchIterator, Buckets, synthetic_dataset
from rnnt_tpu.data.tokenizer import UnigramTokenizer
from rnnt_tpu.ops.stft import FeaturizerSpec

SPM = "/root/reference/spm_unigram_1023.model"


def test_bucket_arithmetic():
    spec = FeaturizerSpec()
    b = Buckets.from_frames([512, 1024], [64, 128], spec)
    # sample bucket = win + (frames-1)*hop
    assert b.sample_buckets == (400 + 511 * 160, 400 + 1023 * 160)
    assert b.pick(1000, 10) == (b.sample_buckets[0], 64)
    assert b.pick(b.sample_buckets[0] + 1, 10) == (b.sample_buckets[1], 64)
    assert b.pick(10**9, 10) is None          # too long -> dropped
    assert b.pick(1000, 10**6) is None


def test_batch_iterator_shapes_and_masks():
    tok = UnigramTokenizer.from_file(SPM)
    spec = FeaturizerSpec()
    buckets = Buckets.from_frames([512], [64], spec)
    ds = synthetic_dataset(24, 2.0, seed=0)
    batches = list(BatchIterator(ds, tok, buckets, batch_size=4,
                                 shuffle=True, seed=1))
    assert batches, "no batches produced"
    for b in batches:
        B, S = b["audio"].shape
        assert B == 4 and S == buckets.sample_buckets[0]
        assert b["targets"].shape == (4, 64)
        for i in range(B):
            # padding beyond the lens must be zeros
            assert (b["audio"][i, b["audio_lens"][i]:] == 0).all()
            assert (b["targets"][i, b["target_lens"][i]:] == 0).all()
            assert b["target_lens"][i] > 0


def test_int16_wire_roundtrip():
    """wire_dtype=int16 collation halves H2D bytes; the device-side decode
    (train/step.py decode_wire_audio) reconstructs audio within the 16-bit
    quantum, and losses computed from the wire batch match f32 closely."""
    import jax.numpy as jnp

    from rnnt_tpu.data.dataset import WIRE_SCALE
    from rnnt_tpu.train.step import decode_wire_audio

    tok = UnigramTokenizer.from_file(SPM)
    spec = FeaturizerSpec()
    buckets = Buckets.from_frames([512], [64], spec)
    ds = synthetic_dataset(8, 2.0, seed=0)
    bf = next(iter(BatchIterator(ds, tok, buckets, batch_size=4,
                                 shuffle=False)))
    bi = next(iter(BatchIterator(ds, tok, buckets, batch_size=4,
                                 shuffle=False, wire_dtype="int16")))
    assert bi["audio"].dtype == np.int16
    dec = np.asarray(decode_wire_audio(jnp.asarray(bi["audio"])))
    assert dec.dtype == np.float32
    np.testing.assert_allclose(dec, bf["audio"], atol=0.5 / WIRE_SCALE + 1e-7)
    # padding survives exactly (0 encodes to 0)
    for i in range(4):
        assert (dec[i, bf["audio_lens"][i]:] == 0).all()
    # f32 passthrough is the identity
    same = decode_wire_audio(jnp.asarray(bf["audio"]))
    np.testing.assert_array_equal(np.asarray(same), bf["audio"])


def test_mulaw_wire_roundtrip():
    """8-bit mu-law wire: companded SNR is good enough for speech-scale
    signals, padding stays exactly zero, and full-scale values survive."""
    import jax.numpy as jnp

    from rnnt_tpu.train.step import decode_wire_audio

    tok = UnigramTokenizer.from_file(SPM)
    spec = FeaturizerSpec()
    buckets = Buckets.from_frames([512], [64], spec)
    ds = synthetic_dataset(8, 2.0, seed=0)
    bf = next(iter(BatchIterator(ds, tok, buckets, batch_size=4,
                                 shuffle=False)))
    bm = next(iter(BatchIterator(ds, tok, buckets, batch_size=4,
                                 shuffle=False, wire_dtype="mulaw")))
    assert bm["audio"].dtype == np.uint8
    dec = np.asarray(decode_wire_audio(jnp.asarray(bm["audio"])))
    x = bf["audio"]
    # mu-law error bound: quantization step in y is 1/127; |dx/dy| =
    # ln(256)*(|x|+1/255); the wire pre-scales by 1/2 (2x headroom) and
    # decode multiplies back, so |err| <= 2*ln(256)/127 * (|x|/2 + 1/255)
    # plus rounding slack.
    bound = np.log(256.0) / 127.0 * (np.abs(x) + 2 / 255.0) * 0.51 + 1e-6
    assert np.all(np.abs(dec - x) <= bound)
    for i in range(4):
        assert (dec[i, bf["audio_lens"][i]:] == 0).all()
    # signal-to-quantization-noise on the in-length part
    err = dec - x
    snr = 10 * np.log10((x ** 2).sum() / (err ** 2).sum())
    assert snr > 30.0, snr


def test_iterator_deterministic_with_seed():
    tok = UnigramTokenizer.from_file(SPM)
    spec = FeaturizerSpec()
    buckets = Buckets.from_frames([512], [64], spec)
    ds = synthetic_dataset(16, 2.0, seed=0)
    a = list(BatchIterator(ds, tok, buckets, batch_size=4, seed=7))
    b = list(BatchIterator(ds, tok, buckets, batch_size=4, seed=7))
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x["audio"], y["audio"])
        np.testing.assert_array_equal(x["targets"], y["targets"])


def test_worker_modes_identical_batches():
    """Serial, thread-pool, and forked process-pool row processing must
    yield byte-identical batches (per-row RNG is keyed on (seed, idx)),
    including with augmentation in the loop."""
    from rnnt_tpu.data.augment import default_augmentor

    tok = UnigramTokenizer.from_file(SPM)
    spec = FeaturizerSpec()
    buckets = Buckets.from_frames([512], [64], spec)
    ds = synthetic_dataset(16, 2.0, seed=0)
    aug = default_augmentor()

    def run(**kw):
        return list(BatchIterator(ds, tok, buckets, batch_size=4, seed=5,
                                  augmentor=aug, **kw))

    serial = run(num_workers=0)
    threaded = run(num_workers=2, worker_mode="thread")
    forked = run(num_workers=2, worker_mode="process")
    assert len(serial) == len(threaded) == len(forked) > 0
    for s, t, f in zip(serial, threaded, forked):
        for k in s:
            np.testing.assert_array_equal(s[k], t[k])
            np.testing.assert_array_equal(s[k], f[k])


def test_batch_iterator_host_sharding():
    """shard_id/num_shards must partition the epoch into disjoint,
    collectively-exhaustive streams (the DistributedSampler contract,
    reference rnnt/train.py:89)."""
    from rnnt_tpu.config.config import Config
    from rnnt_tpu.data.dataset import BatchIterator, Buckets, synthetic_dataset
    from rnnt_tpu.data.tokenizer import UnigramTokenizer
    from rnnt_tpu.ops.stft import FeaturizerSpec

    cfg = Config()
    ds = synthetic_dataset(size=24, seconds=1.0, seed=0)
    tok = UnigramTokenizer.from_file("/root/reference/spm_unigram_1023.model")
    buckets = Buckets.from_frames([128], [32], FeaturizerSpec())

    def ids_seen(shard_id, num_shards):
        it = BatchIterator(ds, tok, buckets, batch_size=2, shuffle=True,
                           seed=3, drop_last=False, shard_id=shard_id,
                           num_shards=num_shards)
        seen = []
        for b in it:
            # audio_lens identify the utterance (synthetic lengths vary)
            seen.extend(b["audio_lens"].tolist())
        return seen

    all_lens = ids_seen(0, 1)
    shards = [ids_seen(i, 4) for i in range(4)]
    assert sum(len(s) for s in shards) == len(all_lens)
    assert sorted(x for s in shards for x in s) == sorted(all_lens)


def test_concat_rows_indexing():
    from rnnt_tpu.data.dataset import concatenate_rows

    a = [{"text": f"a{i}"} for i in range(3)]
    b = [{"text": f"b{i}"} for i in range(2)]
    assert concatenate_rows([a]) is a
    cat = concatenate_rows([a, b])
    assert len(cat) == 5
    assert [cat[i]["text"] for i in range(5)] == ["a0", "a1", "a2", "b0", "b1"]
    assert cat[-1]["text"] == "b1"


def test_dataset_dispatch_commonvoice_and_mixed(monkeypatch):
    """`dataset: commonvoice` and corpus-prefixed mixed splits both build
    (reference fullcausal recipe: librispeech 100/360/500 + commonvoice
    train concatenated, rnnt/config/basic_sp_convjs_fullcausal.yaml:97-151)."""
    import rnnt_tpu.train.loop as loop
    from rnnt_tpu.config.config import Config

    row = {"audio": {"array": np.zeros(16), "sampling_rate": 16000}, "text": "x"}
    calls = []

    def fake_ls(splits, cache_dir=""):
        calls.append(("librispeech", tuple(splits)))
        return [dict(row, text=f"ls {splits[0]}")] * 3

    def fake_cv(split, cache_dir=""):
        calls.append(("commonvoice", split))
        return [dict(row, text=f"cv {split}")] * 2

    monkeypatch.setattr(loop, "librispeech_dataset", fake_ls)
    monkeypatch.setattr(loop, "commonvoice_dataset", fake_cv)

    cfg = Config()
    cfg.data.dataset = "commonvoice"
    cfg.data.train_splits = ["train"]
    cfg.data.eval_split = "validation"
    train, evals = loop._load_datasets(cfg)
    assert len(train) == 2 and train[0]["text"] == "cv train"
    assert len(evals) == 2 and evals[0]["text"] == "cv validation"
    assert ("commonvoice", "train") in calls

    calls.clear()
    cfg = Config()
    cfg.data.dataset = "librispeech"
    cfg.data.train_splits = ["train.clean.100", "commonvoice:train"]
    cfg.data.eval_split = "validation.clean"
    train, evals = loop._load_datasets(cfg)
    assert len(train) == 5  # 3 librispeech + 2 commonvoice rows
    assert train[0]["text"] == "ls train.clean.100"
    assert train[3]["text"] == "cv train"
    assert calls == [("librispeech", ("train.clean.100",)),
                     ("commonvoice", "train"),
                     ("librispeech", ("validation.clean",))]
