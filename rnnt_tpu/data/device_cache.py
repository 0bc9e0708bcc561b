"""Device-resident sample staging: an HBM corpus cache.

The reference streams every batch host->device each step
(reference rnnt/train.py:115-118, the per-step ``.to(device)``).  On hosts
where that transfer is slow relative to the step (weak PCIe, or this
environment's tunneled remote device measured at 2-27 MB/s interleaved
with compute — BASELINE.md round 4), the H2D copy is the end-to-end
training bottleneck no matter how fast the kernels are.

TPU-idiomatic fix: when the wire-format corpus (or a shard of it) fits in
spare HBM, stage it on device ONCE and serve each training batch as an
on-device row gather driven by a tiny (B,) index vector — per-step H2D
drops from megabytes to ~128 bytes.  The cache stores UNAUGMENTED wire
audio, so with in-step device augmentation (data/augment_device.py) every
epoch still sees fresh augmentation; epoch shuffling is a host-side
permutation of indices.  Row gathers move large contiguous rows (not
per-element lane gathers), which the TPU DMAs at full HBM bandwidth.

Composes with data parallelism: the cache is replicated over the mesh and
the gathered batch is sharding-constrained onto the "data" axis (same
placement as train/loop.py _shard_batch), so GSPMD lowers the gather
without collectives.  Multi-host runs cache each process's disjoint corpus
shard (the BatchIterator shard_id/num_shards convention).

Used automatically by train/loop.py when ``data.staging: auto`` (the
default) and the corpus fits ``data.device_cache_budget_mb``; forced with
``staging: device``, disabled with ``staging: stream``.
"""

from __future__ import annotations

import numpy as np

from rnnt_tpu.data.dataset import BatchIterator

_KEYS = ("audio", "audio_lens", "targets", "target_lens")


class DeviceSampleCache:
    """Bucket-grouped device arrays of collated samples.

    ``groups`` is a list of ``{key: device array}`` dicts, one per padded
    (S, U) bucket shape, each with a leading sample axis.  Host copies of
    ``audio_lens`` are kept for throughput accounting without D2H reads.
    """

    def __init__(self, groups, host_audio_lens, sample_rate: int = 16000):
        self.groups = groups
        self._host_audio_lens = host_audio_lens
        self.sample_rate = sample_rate

    # ------------------------------------------------------------- build
    @classmethod
    def build(cls, dataset, tokenizer, buckets, *, wire_dtype: str = "int16",
              mesh=None, collate_batch: int = 64,
              budget_bytes: int | None = None,
              shard_id: int = 0, num_shards: int = 1,
              sample_rate: int = 16000, num_workers: int = 0):
        """Tokenize + collate the corpus once (no host augmentation — the
        cache must stay augmentation-free) and stage it on device.

        Returns None when the corpus exceeds ``budget_bytes`` (checked
        incrementally while collating, so host memory stays bounded too);
        callers fall back to streamed staging.
        """
        import jax

        it = BatchIterator(dataset, tokenizer, buckets,
                           batch_size=collate_batch, augmentor=None,
                           shuffle=False, drop_last=False,
                           num_workers=num_workers,
                           shard_id=shard_id, num_shards=num_shards,
                           wire_dtype=wire_dtype)
        host: dict[tuple[int, int], list] = {}
        total = 0
        for b in it:
            key = (b["audio"].shape[1], b["targets"].shape[1])
            host.setdefault(key, []).append(b)
            total += sum(b[k].nbytes for k in _KEYS)
            if budget_bytes is not None and total > budget_bytes:
                return None
        if not host:
            return None

        sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            sharding = NamedSharding(mesh, P())  # replicated

        groups, host_lens = [], []
        for key in sorted(host):
            cat = {k: np.concatenate([bb[k] for bb in host[key]], axis=0)
                   for k in _KEYS}
            host_lens.append(cat["audio_lens"].copy())
            if sharding is not None:
                cat = {k: jax.device_put(v, sharding)
                       for k, v in cat.items()}
            else:
                cat = {k: jax.device_put(v) for k, v in cat.items()}
            groups.append(cat)
        return cls(groups, host_lens, sample_rate)

    # ----------------------------------------------------------- queries
    @property
    def n_samples(self) -> int:
        return sum(len(l) for l in self._host_audio_lens)

    def nbytes(self) -> int:
        return sum(int(np.prod(v.shape)) * v.dtype.itemsize
                   for g in self.groups for v in g.values())

    def steps_per_epoch(self, batch_size: int) -> int:
        return sum(len(l) // batch_size for l in self._host_audio_lens)

    # ---------------------------------------------------------- sampling
    def epoch_batches(self, batch_size: int, seed: int):
        """Yield (group_index, (B,) int32 row indices) covering each cached
        sample at most once, full batches only (the streamed path's
        drop_last=True semantics), batch order shuffled across groups."""
        rng = np.random.RandomState(seed)
        chunks = []
        for gi, lens in enumerate(self._host_audio_lens):
            perm = rng.permutation(len(lens))
            for j in range(len(lens) // batch_size):
                chunks.append((gi, perm[j * batch_size:
                                        (j + 1) * batch_size]))
        rng.shuffle(chunks)
        for gi, idx in chunks:
            yield gi, np.ascontiguousarray(idx, dtype=np.int32)

    def batch_audio_seconds(self, gi: int, idx: np.ndarray) -> float:
        return float(self._host_audio_lens[gi][idx].sum()) / self.sample_rate

    def gather_jit(self, mesh=None):
        """A jitted (group, idx) -> batch row gather, as its OWN tiny
        program (compiles in ~1 s).  The training loop runs it back to
        back with the UNMODIFIED jitted train step — two queued dispatches
        per step, no bulk H2D, and no extra step compile.  (Fusing the
        gather INTO the train step — make_cached_train_step — is
        numerically identical and saves one dispatch, but the combined
        program took 15-20 min to compile on the XLA:TPU backend vs ~3 min
        for the plain step; the split costs <1 ms/step and nothing to
        compile beyond the step the streamed path already built.)"""
        import jax
        import jax.numpy as jnp

        shardings = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            shardings = {
                "audio": NamedSharding(mesh, P("data", None)),
                "audio_lens": NamedSharding(mesh, P("data")),
                "targets": NamedSharding(mesh, P("data", None)),
                "target_lens": NamedSharding(mesh, P("data")),
            }

        def gather(group, idx):
            batch = {k: jnp.take(v, idx, axis=0) for k, v in group.items()}
            if shardings is not None:
                batch = {k: jax.lax.with_sharding_constraint(v, shardings[k])
                         for k, v in batch.items()}
            return batch

        return jax.jit(gather)


def make_cached_train_step(step_fn, mesh=None):
    """Wrap step(state, batch, rng) as step(state, cache_group, idx, rng):
    the batch is gathered from the device-resident group INSIDE the jitted
    program (one dispatch per step, no bulk H2D).  Jit with
    donate_argnums=(0,) — the cache group must NOT be donated.

    NOTE: numerically identical to ``gather_jit`` + the plain step, but
    the fused program measured 15-20 min XLA:TPU compiles (vs ~3 min for
    the plain step; the standalone gather compiles in ~1 s) — production
    paths use the two-dispatch split; this stays for single-dispatch
    deployments where the compile is paid once and cached."""

    def cached_step(state, group, idx, rng):
        import jax.numpy as jnp

        batch = {k: jnp.take(v, idx, axis=0) for k, v in group.items()}
        if mesh is not None:
            import jax
            from jax.sharding import NamedSharding, PartitionSpec as P

            shardings = {
                "audio": NamedSharding(mesh, P("data", None)),
                "audio_lens": NamedSharding(mesh, P("data")),
                "targets": NamedSharding(mesh, P("data", None)),
                "target_lens": NamedSharding(mesh, P("data")),
            }
            batch = {k: jax.lax.with_sharding_constraint(v, shardings[k])
                     for k, v in batch.items()}
        return step_fn(state, batch, rng)

    return cached_step
