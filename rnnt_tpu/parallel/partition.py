"""GSPMD partitioning rules for the Pallas kernels.

``pallas_call`` is opaque to GSPMD: under a sharded ``jit`` the partitioner
would replicate the kernel on every device instead of splitting it.  The
framework previously worked around that by threading the mesh down the call
stack and wrapping each kernel in ``jax.shard_map``; this module replaces
that with ``jax.experimental.custom_partitioning`` so the kernels carry
their own partitioning rule and the surrounding code is mesh-free — the
train step is one ordinary jit whatever the mesh looks like.

All transducer kernels are embarrassingly parallel over the batch
dimension; weight-gradient outputs are the one exception (a cross-batch
sum), handled by an all-reduce over the batch mesh axis inside the
partitioned body (``psum`` riding ICI, exactly what GSPMD inserts for any
data-parallel gradient).

``custom_partitioning`` has no differentiation rule, so callers keep their
``jax.custom_vjp`` OUTSIDE and wrap the forward and backward
implementations separately (see ops/lattice_pallas.py,
ops/transducer_pallas.py).
"""

from __future__ import annotations

import jax
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P


def _batch_axis(arg_infos):
    """Mesh axis name the first batch-kind operand is sharded on (or None)."""
    spec = getattr(arg_infos[0].sharding, "spec", None)
    if spec is None or len(spec) == 0:
        return None
    return spec[0]


def _shardings(mesh, ax, kinds, infos):
    out = []
    for k, info in zip(kinds, infos):
        rank = len(info.shape)
        if k == "b" and ax is not None:
            out.append(NamedSharding(mesh, P(ax, *([None] * (rank - 1)))))
        else:
            out.append(NamedSharding(mesh, P(*([None] * rank))))
    return tuple(out)


def batch_partitioned(fn, in_kinds: str, out_kinds: str, rule: str):
    """Wrap ``fn`` so GSPMD splits it along the batch axis.

    in_kinds / out_kinds: one char per operand/result —
      'b' = leading dim is the batch (sharded like the first operand),
      'r' = replicated,
      's' = per-shard partial sum, all-reduced over the batch axis and
            replicated (weight gradients).
    rule: shardy sharding rule (einsum-like), used for sharding propagation.

    The first operand must be kind 'b'; its sharding decides the axis.
    On an unsharded input the op runs unpartitioned, bit-identical to
    calling ``fn`` directly — and inside an enclosing ``shard_map`` the
    wrapper simply traces ``fn`` on the local shard.
    """
    assert in_kinds[0] == "b", "first operand must carry the batch axis"
    f = custom_partitioning(fn)

    def infer(mesh, arg_infos, result_infos):
        ax = _batch_axis(arg_infos)
        out = _shardings(mesh, ax, out_kinds, result_infos)
        return out if len(out) > 1 else out[0]

    def partition(mesh, arg_infos, result_infos):
        ax = _batch_axis(arg_infos)

        def lower(*args):
            res = fn(*args)
            single = not isinstance(res, (tuple, list))
            outs = [res] if single else list(res)
            if ax is not None:
                for i, k in enumerate(out_kinds):
                    if k == "s":
                        outs[i] = jax.lax.psum(outs[i], ax)
            return outs[0] if single else tuple(outs)

        out = _shardings(mesh, ax, out_kinds, result_infos)
        return (mesh, lower, out if len(out) > 1 else out[0],
                _shardings(mesh, ax, in_kinds, arg_infos))

    f.def_partition(infer_sharding_from_operands=infer, partition=partition,
                    sharding_rule=rule)
    return f
