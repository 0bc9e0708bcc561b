"""Device mesh + sharding rules: the framework's entire distribution layer.

The reference's distributed surface is DDP + NCCL with env-var rendezvous
(reference rnnt/train.py:25-36,67-70,214-215, DistributedSampler at :86-93).
The TPU-native equivalent is declarative: one ``jax.sharding.Mesh`` with
``("data", "model")`` axes, batch arrays sharded on ``data``, a handful of
wide weights sharded on ``model``, and a single jitted train step — XLA
inserts the gradient all-reduces (ICI) and any tensor-parallel collectives.
Multi-host startup is ``jax.distributed.initialize`` + the same code.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, model: int = 1, devices=None) -> Mesh:
    """Build a ("data", "model") mesh.  data=-1 consumes all remaining
    devices.  Degrades gracefully to (1, 1) on one device."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if model <= 0:
        model = 1
    model = min(model, n)
    if data == -1:
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs {data*model} devices, have {n}")
    mesh_devices = devices[: data * model].reshape(data, model)
    return Mesh(mesh_devices, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Tensor-parallel rules: path-substring -> PartitionSpec.  Only the wide
# output-side weights shard; everything else replicates (the model is small
# enough that DP is the primary axis — rules grow with the scaled configs).
_TP_RULES: list[tuple[tuple[str, ...], P]] = [
    (("joint", "out", "w"), P(None, "model")),       # (H, V): shard vocab
    (("joint", "out", "b"), P("model")),
    # Pruned-loss simple joint heads (Da, V)/(Dt, V): shard vocab like the
    # main joint output so the factored loss's V-dim matmuls stay sharded
    # (simple_joint_log_probs uses one-hot einsums, never a V-axis gather).
    (("joint", "simple", "am", "w"), P(None, "model")),
    (("joint", "simple", "am", "b"), P("model")),
    (("joint", "simple", "lm", "w"), P(None, "model")),
    (("joint", "simple", "lm", "b"), P("model")),
    (("encoder", "out", "w"), P(None, "model")),     # (C_epi, H): shard H
    (("encoder", "out", "b"), P("model")),
    (("predictor", "linear", "w"), P(None, "model")),  # (D, H): shard H
    (("predictor", "linear", "b"), P("model")),
]


def _path_strings(path) -> list[str]:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return parts


def _spec_for(path_parts: list[str], leaf, mesh: Mesh) -> P:
    if mesh.shape.get("model", 1) > 1:
        for keys, spec in _TP_RULES:
            if all(k in path_parts for k in keys):
                # Only shard rank-matching leaves whose dims divide evenly
                # (opt-state scalars like MultiSteps counters share the
                # param path but must stay replicated).
                if len(leaf.shape) != len(spec):
                    continue
                dims = [d for d in spec if d is not None]
                ok = True
                for axis_i, d in enumerate(spec):
                    if d is not None and leaf.shape[axis_i] % mesh.shape[d] != 0:
                        ok = False
                if ok and dims:
                    return spec
    return P()


def param_shardings(mesh: Mesh, params) -> dict:
    """NamedSharding pytree for a param/opt-state pytree: replicated by
    default, tensor-parallel rules applied when the model axis is > 1.

    Works on optimizer states too: AdamW's mu/nu subtrees repeat the param
    paths, so model-sharded weights get model-sharded moments (the TP
    memory win extends to the optimizer)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, _spec_for(_path_strings(path), leaf, mesh)),
        params)
