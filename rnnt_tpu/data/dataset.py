"""Datasets and static-shape batching.

Capability parity with the reference data layer (reference rnnt/dataset.py):
Librispeech / CommonVoice via HF datasets (:10-28), per-utterance
augment → tokenize processing (:45-64), and padded batch collation (:67-87).

TPU-native restructuring:
  * featurization moves *into the jitted train/eval step* (the STFT is an
    MXU conv; see rnnt_tpu/ops/stft.py) — the host ships raw int16-scale
    float audio, not spectrograms.  On a weak host this is the difference
    between starving the chip and saturating it.
  * the reference's dynamic shapes + ``max_joint_size`` batch halving
    (rnnt/train.py:120-130) become (sample, token) bucket padding: XLA sees
    a small, fixed set of shapes and never recompiles mid-run.
  * a synthetic dataset stands in when no corpus is on disk (zero-egress
    environments); same interface.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Sequence

import numpy as np

from rnnt_tpu.data.tokenizer import UnigramTokenizer
from rnnt_tpu.ops.stft import FeaturizerSpec

# int16 wire-format scale for audio H2D (see BatchIterator wire_dtype /
# train/step.py decode_wire_audio): 2x headroom over full-scale PCM.
WIRE_SCALE = 16384.0

# mu-law (G.711-style, mu=255) 8-bit wire: 4x fewer bytes than f32 at
# ~32 dB SNR — an OPTION for transfer-starved hosts (the remote-tunnel
# rig moves ~27 MB/s interleaved with compute; BASELINE.md round 4).
# uint8 with bias 128; 0.0 encodes to 128 so padding stays cheap.
# Encoded at HALF scale (decode_wire_audio multiplies by 2) so the wire
# keeps the same 2x headroom as int16: host-augmented audio (e.g. chorus
# sums of delayed copies) can exceed full-scale PCM and must not clip.
_MU = 255.0
MULAW_PRESCALE = 0.5


def mulaw_encode(audio: "np.ndarray") -> "np.ndarray":
    x = np.clip(audio * MULAW_PRESCALE, -1.0, 1.0)
    y = np.sign(x) * np.log1p(_MU * np.abs(x)) / np.log1p(_MU)
    return (np.rint(y * 127.0) + 128.0).astype(np.uint8)

_WORDS = (
    "the of and to in a is that it was for on are as with his they at be "
    "this have from or one had by word but not what all were we when your "
    "can said there use an each which she how their if will up other about "
    "out many then them these so some her would make like him into time has "
    "look two more write go see number no way could people my than first "
    "water been call who oil its now find long down day did get come made "
    "may part over new sound take only little work know place year live me "
    "back give most very after thing our just name good sentence man think "
    "say great where help through much before line right too mean old any "
    "same tell boy follow came want show also around form three small set "
    "put end does another well large must big even such because turn here "
    "why ask went men read need land different home us move try kind hand "
    "picture again change off play spell air away animal house point page "
    "letter mother answer found study still learn should world high every "
    "near add food between own below country plant last school father keep "
    "tree never start city earth eye light thought head under story saw "
    "left dont few while along might close something seem next hard open "
    "example begin life always those both paper together got group often run"
).split()


def synthetic_dataset(size: int, seconds: float, sample_rate: int = 16000,
                      seed: int = 0, max_words: int = 12) -> list[dict]:
    """Deterministic synthetic corpus: band-limited noise + random text.
    Mirrors the HF row shape: {"audio": {"array", "sampling_rate"}, "text"}.
    ``max_words`` scales target length (default keeps the historical 3-11
    word range; larger values give flagship-scale U for A/B studies)."""
    rng = np.random.RandomState(seed)
    rows = []
    for _ in range(size):
        n = int(seconds * sample_rate * rng.uniform(0.6, 1.0))
        audio = rng.randn(n).astype(np.float32) * 0.05
        # A few random tones so the spectrogram has structure.
        t = np.arange(n) / sample_rate
        for _ in range(3):
            f = rng.uniform(100, 4000)
            audio += (rng.uniform(0.02, 0.1)
                      * np.sin(2 * np.pi * f * t).astype(np.float32))
        n_words = rng.randint(max(3, max_words // 4), max_words)
        text = " ".join(rng.choice(_WORDS) for _ in range(n_words))
        rows.append({"audio": {"array": audio, "sampling_rate": sample_rate},
                     "text": text})
    return rows


def librispeech_dataset(splits: Sequence[str], cache_dir: str = ""):
    """HF librispeech_asr splits, concatenated
    (reference rnnt/dataset.py:10-14, rnnt/train.py:52-56)."""
    import datasets as hf_datasets

    parts = []
    for split in splits:
        ds = hf_datasets.load_dataset(
            "librispeech_asr", cache_dir=cache_dir or None, split=split)
        parts.append(ds)
    if len(parts) == 1:
        return parts[0]
    return hf_datasets.concatenate_datasets(parts)


def commonvoice_dataset(split: str, cache_dir: str = ""):
    """CommonVoice 16.1 (en), resampled to 16 kHz, 'sentence' → 'text'
    (reference rnnt/dataset.py:16-28)."""
    import datasets as hf_datasets

    ds = hf_datasets.load_dataset(
        "mozilla-foundation/common_voice_16_1", "en", split=split,
        cache_dir=cache_dir or None)
    ds = ds.cast_column("audio", hf_datasets.Audio(sampling_rate=16_000))

    def fixup(row):
        row["text"] = row["sentence"]
        return row

    return ds.map(fixup)


class _ConcatRows:
    """Concatenation of row datasets (HF datasets or plain row lists) behind
    one __len__/__getitem__ — schema-agnostic, so mixed corpora with
    different extra columns compose (the reference concatenates librispeech
    and commonvoice into one training set, rnnt/train.py:52-56 +
    config/basic_sp_convjs_fullcausal.yaml:97-151)."""

    def __init__(self, parts):
        self.parts = list(parts)
        self._offsets = []
        total = 0
        for p in self.parts:
            total += len(p)
            self._offsets.append(total)

    def __len__(self):
        return self._offsets[-1] if self._offsets else 0

    def __getitem__(self, idx):
        if idx < 0:
            idx += len(self)
        lo = 0
        for part, off in zip(self.parts, self._offsets):
            if idx < off:
                return part[idx - lo]
            lo = off
        raise IndexError(idx)


def concatenate_rows(parts):
    """Concatenate datasets; single part passes through untouched."""
    parts = list(parts)
    if len(parts) == 1:
        return parts[0]
    return _ConcatRows(parts)


@dataclass
class Buckets:
    """Static-shape padding targets: samples (audio) and tokens (text)."""
    sample_buckets: tuple[int, ...]
    token_buckets: tuple[int, ...]

    @classmethod
    def from_frames(cls, frame_buckets: Sequence[int],
                    token_buckets: Sequence[int],
                    spec: FeaturizerSpec) -> "Buckets":
        samples = tuple(spec.samples_for_frames(f)
                        for f in sorted(frame_buckets))
        return cls(samples, tuple(sorted(token_buckets)))

    def pick(self, n_samples: int, n_tokens: int) -> tuple[int, int] | None:
        """Smallest bucket fitting the utterance, or None (drop too-long)."""
        s = next((b for b in self.sample_buckets if b >= n_samples), None)
        t = next((b for b in self.token_buckets if b >= n_tokens), None)
        if s is None or t is None:
            return None
        return s, t


# Fork-inheritance stash for process workers: set in the parent immediately
# before the pool forks, read by `_process_row_forked` in the children.  No
# pickling happens (the tokenizer's ctypes handle and any mmap'd dataset
# cross the fork as inherited memory) — the same trick torch's DataLoader
# relies on with its default fork start method.
_FORK_STASH: "BatchIterator | None" = None


def _process_row_forked(idx: int):
    return _FORK_STASH._process(idx)


def _ordered_windowed_map(submit, fn, items, window: int):
    """Parallel ``map`` that keeps at most ``window`` tasks in flight and
    yields results in input order.  Executor.map / Pool.imap submit the
    whole epoch eagerly, so a fast pool racing ahead of the device would
    buffer unbounded augmented audio; this caps host memory at
    O(window · utterance)."""
    from collections import deque

    futs: deque = deque()
    try:
        for x in items:
            futs.append(submit(fn, x))
            if len(futs) >= window:
                yield futs.popleft().result()
        while futs:
            yield futs.popleft().result()
    finally:
        for f in futs:
            f.cancel()


class BatchIterator:
    """Tokenize, augment, bucket-pad, and batch a dataset.

    Yields numpy batches {"audio": (B, S) f32, "audio_lens": (B,) i32,
    "targets": (B, U) i32, "target_lens": (B,) i32} where (S, U) come from
    a fixed bucket grid.  Utterances are grouped per bucket so every batch
    is shape-uniform (bounded XLA compilation count).

    ``num_workers`` maps the per-row augment+tokenize over a pool
    (reference: DataLoader num_workers=4, rnnt/train.py:86-93).
    ``worker_mode="thread"`` (default) uses a thread pool — numpy/scipy
    release the GIL; ``"process"`` forks real workers for hosts where the
    Python-level share of row processing (tokenizer, resampling glue)
    serializes on the GIL.  Both modes are row-deterministic: the per-row
    RNG is seeded from (seed, idx), so serial/thread/process runs produce
    identical batches.
    """

    def __init__(self, dataset, tokenizer: UnigramTokenizer, buckets: Buckets,
                 batch_size: int, *, augmentor=None, shuffle: bool = True,
                 seed: int = 0, drop_last: bool = True,
                 max_batches: int | None = None, num_workers: int = 0,
                 worker_mode: str = "thread",
                 shard_id: int = 0, num_shards: int = 1,
                 wire_dtype: str = "float32"):
        self.dataset = dataset
        self.tokenizer = tokenizer
        self.buckets = buckets
        self.batch_size = batch_size
        self.augmentor = augmentor
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.max_batches = max_batches
        self.num_workers = num_workers
        if wire_dtype not in ("float32", "int16", "mulaw"):
            raise ValueError(f"wire_dtype must be float32|int16|mulaw, "
                             f"got {wire_dtype!r}")
        self.wire_dtype = wire_dtype
        if worker_mode not in ("thread", "process"):
            raise ValueError(f"worker_mode must be thread|process, "
                             f"got {worker_mode!r}")
        self.worker_mode = worker_mode
        # Per-host data sharding (the reference's DistributedSampler,
        # rnnt/train.py:89): every host shuffles with the same seed, then
        # takes a disjoint stride of the epoch order.
        self.shard_id = shard_id
        self.num_shards = num_shards

    def _process(self, idx: int):
        """Load + augment + tokenize one utterance (thread-safe: fresh
        RNG per row so a worker pool gives deterministic results)."""
        row = self.dataset[int(idx)]
        audio = np.asarray(row["audio"]["array"], dtype=np.float32)
        sr = row["audio"].get("sampling_rate", 16000)
        if self.augmentor is not None:
            rng = np.random.RandomState((self.seed * 1_000_003 + idx)
                                        % (2 ** 31 - 1))
            audio = self.augmentor(audio, sr, rng=rng)
        tokens = self.tokenizer.encode(row["text"].lower())
        return audio, tokens

    def __iter__(self) -> Iterator[dict]:
        order = np.arange(len(self.dataset))
        rng = np.random.RandomState(self.seed)
        if self.shuffle:
            rng.shuffle(order)
        if self.num_shards > 1:
            order = order[self.shard_id::self.num_shards]
        window = max(4 * self.num_workers, 16)
        if self.num_workers > 0 and self.worker_mode == "process":
            import multiprocessing
            from concurrent.futures import ProcessPoolExecutor
            global _FORK_STASH
            _FORK_STASH = self
            pool = ProcessPoolExecutor(
                max_workers=self.num_workers,
                mp_context=multiprocessing.get_context("fork"))
            rows = _ordered_windowed_map(pool.submit, _process_row_forked,
                                         order, window)
        elif self.num_workers > 0:
            from concurrent.futures import ThreadPoolExecutor
            pool = ThreadPoolExecutor(max_workers=self.num_workers)
            rows = _ordered_windowed_map(pool.submit, self._process,
                                         order, window)
        else:
            pool = None
            rows = map(self._process, order)
        pending: dict[tuple[int, int], list] = {}
        emitted = 0
        try:
            for audio, tokens in rows:
                if len(tokens) == 0:
                    continue
                b = self.buckets.pick(len(audio), len(tokens))
                if b is None:
                    continue  # too long for any bucket; drop
                pending.setdefault(b, []).append((audio, tokens))
                if len(pending[b]) == self.batch_size:
                    yield self._collate(pending.pop(b), b)
                    emitted += 1
                    if self.max_batches and emitted >= self.max_batches:
                        return
        finally:
            if pool is not None:
                pool.shutdown(wait=False, cancel_futures=True)
        if not self.drop_last:
            for b, items in pending.items():
                if items:
                    yield self._collate(items, b)
                    emitted += 1
                    if self.max_batches and emitted >= self.max_batches:
                        return

    def _collate(self, items, bucket) -> dict:
        S, U = bucket
        B = len(items)
        audio = np.zeros((B, S), np.float32)
        audio_lens = np.zeros((B,), np.int32)
        targets = np.zeros((B, U), np.int32)
        target_lens = np.zeros((B,), np.int32)
        for i, (a, toks) in enumerate(items):
            audio[i, : len(a)] = a
            audio_lens[i] = len(a)
            targets[i, : len(toks)] = toks
            target_lens[i] = len(toks)
        if self.wire_dtype == "int16":
            # Half the host->device bytes: speech corpora are 16-bit PCM so
            # the encoding is (near-)lossless; scale 16384 leaves 2x
            # headroom for host-augmented audio that exceeds [-1, 1].  The
            # device side auto-decodes (train/step.py decode_wire_audio).
            audio = np.clip(np.rint(audio * WIRE_SCALE),
                            -32768, 32767).astype(np.int16)
        elif self.wire_dtype == "mulaw":
            audio = mulaw_encode(audio)
        return {"audio": audio, "audio_lens": audio_lens,
                "targets": targets, "target_lens": target_lens}
