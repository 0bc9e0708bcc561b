"""Small shared utilities.

``save_tensor_json`` / ``load_tensor_json`` is the base64 tensor
interchange format the reference uses to move arrays between Python and
its JS runtime (reference rnnt/util.py:15-23 ↔ rnnt-js/tensor.js:4-30);
kept here for serving/debug interop with the same wire format.
"""

from __future__ import annotations

import base64
import json

import numpy as np


def save_tensor_json(array) -> str:
    """Serialize a float32/int32 array to the reference's JSON format."""
    arr = np.asarray(array)
    if arr.dtype not in (np.float32, np.int32):
        raise ValueError(f"unsupported dtype {arr.dtype} (float32/int32 only)")
    return json.dumps({
        "dtype": str(arr.dtype),
        "shape": list(arr.shape),
        "data": base64.b64encode(arr.tobytes()).decode("utf-8"),
    })


def load_tensor_json(payload: str) -> np.ndarray:
    obj = json.loads(payload)
    data = base64.b64decode(obj["data"])
    return np.frombuffer(data, dtype=np.dtype(obj["dtype"])).reshape(
        obj["shape"]).copy()


def enable_compilation_cache(path: str | None = None) -> None:
    """Persistent XLA compilation cache (works on the remote axon backend:
    measured write + fresh-process read-back; the flagship augmented train
    step costs 15-20 min to compile through this rig's tunnel and is the
    dominant cost of bench/train startup).  Respects an explicit
    JAX_COMPILATION_CACHE_DIR env; defaults to <repo>/.jax_cache."""
    import os

    import jax

    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return  # user already configured it via env
    if path is None:
        from pathlib import Path

        path = str(Path(__file__).resolve().parent.parent / ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass  # older jax without the knobs: compile as usual
