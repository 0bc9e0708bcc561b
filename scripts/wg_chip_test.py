"""On-chip smoke + microbench for ops/window_gather.py (round 4, VERDICT #1).

Runs on the real TPU: correctness vs numpy oracle, then timed microbench of
gather_windows and band_lerp at the augmentation shapes (B=32 x 5 s).
"""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from rnnt_tpu.ops.window_gather import gather_windows, band_lerp


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    B, L, N, W = 4, 4096, 64, 256
    x = rng.standard_normal((B, L)).astype(np.float32)
    starts = rng.integers(0, L, size=(B, N)).astype(np.int32)

    t0 = time.time()
    out = jax.jit(lambda x, s: gather_windows(x, s, W))(x, starts)
    out = np.asarray(out)
    print(f"compile+run {time.time()-t0:.1f}s", flush=True)

    # numpy oracle
    xp = np.pad(x, ((0, 0), (0, W + 256)))
    ref = np.stack([
        np.stack([xp[b, min(int(s), L - 1): min(int(s), L - 1) + W]
                  for s in starts[b]]) for b in range(B)])
    err = np.abs(out - ref).max()
    print("gather_windows max err:", err, flush=True)
    assert err == 0.0, "MISMATCH"

    # band_lerp correctness at the resample band
    C, s_lo, s_hi = 128, -36, 36
    Nn = 16
    win = rng.standard_normal((B, Nn, C + s_hi - s_lo + 2)).astype(np.float32)
    # rel chosen so floor(rel)-l stays in band
    base = rng.uniform(0, 1, size=(B, Nn, 1)).astype(np.float32)
    lanes = np.arange(C, dtype=np.float32)[None, None, :]
    ratio = 1.18
    rel = base + lanes * ratio - s_lo  # offset so indices are >= 0 in win
    y = np.asarray(jax.jit(lambda w, r: band_lerp(w, r, 0, s_hi - s_lo))(win, rel))
    i = np.floor(rel).astype(np.int64)
    f = rel - i
    yr = (1 - f) * np.take_along_axis(win, i, axis=-1) + f * np.take_along_axis(win, i + 1, axis=-1)
    err2 = np.abs(y - yr).max()
    print("band_lerp max err:", err2, flush=True)
    assert err2 < 1e-5, "band_lerp MISMATCH"

    # microbench at augmentation scale: B=32, 5 s audio (80000 samples),
    # chorus-style: N windows of 256 covering the signal
    B2, L2 = 32, 80000
    N2, W2 = L2 // 128, 256
    xb = jnp.asarray(rng.standard_normal((B2, L2)), jnp.float32)
    sb = jnp.asarray(rng.integers(0, L2, size=(B2, N2)), jnp.int32)
    f_g = jax.jit(lambda x, s: gather_windows(x, s, W2))
    f_g(xb, sb).block_until_ready()
    # vary starts each iter to defeat remote-runtime memoization
    keys = [jnp.asarray(rng.integers(0, L2, size=(B2, N2)), jnp.int32) for _ in range(10)]
    t0 = time.time()
    for k in keys:
        f_g(xb, k).block_until_ready()
    dt = (time.time() - t0) / len(keys)
    print(f"gather_windows (B={B2}, N={N2}, W={W2}): {dt*1e3:.2f} ms", flush=True)

    print("OK", flush=True)


if __name__ == "__main__":
    main()
