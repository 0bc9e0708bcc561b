"""Measure H2D transfer cost through the axon tunnel for a training batch
(distinct payloads each rep — the runtime caches identical transfers)."""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp

B, L = 32, 80000
rng = np.random.default_rng(0)
bufs = [rng.standard_normal((B, L)).astype(np.float32) for _ in range(6)]
b16 = [(x * 32767).astype(np.int16) for x in bufs]

# f32 audio
x = jnp.asarray(bufs[0]); x.block_until_ready()
t0 = time.perf_counter()
for b in bufs[1:]:
    jnp.asarray(b).block_until_ready()
dt = (time.perf_counter() - t0) / 5
print(f"H2D f32 (B,80000) 10.2MB: {dt*1e3:.1f} ms "
      f"({10.24/dt:.0f} MB/s)", flush=True)

# int16 audio
x = jnp.asarray(b16[0]); x.block_until_ready()
t0 = time.perf_counter()
for b in b16[1:]:
    jnp.asarray(b).block_until_ready()
dt = (time.perf_counter() - t0) / 5
print(f"H2D int16 (B,80000) 5.1MB: {dt*1e3:.1f} ms", flush=True)

# pipelined (no per-transfer block)
t0 = time.perf_counter()
outs = [jnp.asarray(b) for b in bufs[1:]]
jax.block_until_ready(outs)
dt = (time.perf_counter() - t0) / 5
print(f"H2D f32 pipelined: {dt*1e3:.1f} ms", flush=True)
