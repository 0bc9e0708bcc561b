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
    # A single-result op gets a bare ShapeDtypeStruct, not a sequence.
    if not isinstance(infos, (tuple, list)):
        infos = [infos]
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


# ------------------- fused joint: batch x vocab partitioning -------------------
#
# The fused joint+loss kernels (ops/transducer_pallas.py) additionally
# partition over the joint output weight's vocab axis — the tensor-parallel
# axis of scaled_tp.yaml.  Per shard, the kernel computes partial
# lse/blank/label over its V-slice (the blank/label one-hots are V-sharded,
# so non-owner shards contribute zeros); the combines below run on cheap
# (B, T, U1) scalars:
#   lse    = logsumexp-merge over the model axis (pmax + psum of exp)
#   blank  = psum over model        label = psum over model
#   denc/dpred = psum over model    dW/db = psum over batch, stay V-sharded
# Keeping dW V-sharded is the actual TP win: the (H, V) weight, its
# gradient, and its AdamW moments never materialize replicated.

def _dim_axis(arg_infos, idx, dim):
    spec = getattr(arg_infos[idx].sharding, "spec", None)
    if spec is None or len(spec) <= dim:
        return None
    return spec[dim]


def _fused_shardings(mesh, b_ax, v_ax, kinds, infos):
    """kinds: 'b' = (B, x, x) batch-sharded; 'r' = replicated;
    'v' = last dim vocab-sharded; 'bv' = batch + last-dim vocab."""
    out = []
    for k, info in zip(kinds, infos):
        rank = len(info.shape)
        spec = [None] * rank
        if "b" in k and b_ax is not None:
            spec[0] = b_ax
        if "v" in k and v_ax is not None:
            spec[-1] = v_ax
        out.append(NamedSharding(mesh, P(*spec)))
    return tuple(out)


def _logsumexp_merge(lse, ax):
    m = jax.lax.pmax(lse, ax)
    return m + jax.numpy.log(jax.lax.psum(jax.numpy.exp(lse - m), ax))


_FWD_IN_KINDS = ("b", "b", "v", "v", "bv", "v")
_FWD_RULE = "b t h, b u h, h v, v, b u v, v -> b t u, b t u, b t u"
_BWD_IN_KINDS = _FWD_IN_KINDS + ("b", "b", "b", "b")
_BWD_OUT_KINDS = ("b", "b", "v", "v")
_BWD_RULE = ("b t h, b u h, h v, v, b u v, v, b t u, b t u, b t u, b t u "
             "-> b t h, b u h, h v, q v")


def fused_joint_fwd_partitioned(fn):
    """fn(enc, pred, w, b, label_onehot, blank_onehot) ->
    (lse, blank_logit, label_logit), partitioned over batch and vocab."""
    f = custom_partitioning(fn)

    def infer(mesh, arg_infos, result_infos):
        b_ax = _dim_axis(arg_infos, 0, 0)
        return _fused_shardings(mesh, b_ax, None, ("b", "b", "b"),
                                result_infos)

    def partition(mesh, arg_infos, result_infos):
        b_ax = _dim_axis(arg_infos, 0, 0)
        v_ax = _dim_axis(arg_infos, 2, 1)  # w's vocab axis

        def lower(*args):
            lse, blank, label = fn(*args)
            if v_ax is not None:
                lse = _logsumexp_merge(lse, v_ax)
                blank = jax.lax.psum(blank, v_ax)
                label = jax.lax.psum(label, v_ax)
            return lse, blank, label

        return (mesh, lower,
                _fused_shardings(mesh, b_ax, None, ("b", "b", "b"),
                                 result_infos),
                _fused_shardings(mesh, b_ax, v_ax, _FWD_IN_KINDS, arg_infos))

    f.def_partition(infer_sharding_from_operands=infer, partition=partition,
                    sharding_rule=_FWD_RULE)
    return f


def fused_joint_bwd_partitioned(fn):
    """fn(enc, pred, w, b, label_onehot, blank_onehot, lse, g_blank,
    g_label, g_lse) -> (denc, dpred, dw, db), partitioned over batch and
    vocab; dw/db come back vocab-sharded."""
    f = custom_partitioning(fn)

    def infer(mesh, arg_infos, result_infos):
        b_ax = _dim_axis(arg_infos, 0, 0)
        v_ax = _dim_axis(arg_infos, 2, 1)
        return _fused_shardings(mesh, b_ax, v_ax, _BWD_OUT_KINDS,
                                result_infos)

    def partition(mesh, arg_infos, result_infos):
        b_ax = _dim_axis(arg_infos, 0, 0)
        v_ax = _dim_axis(arg_infos, 2, 1)

        def lower(*args):
            denc, dpred, dw, db = fn(*args)
            if v_ax is not None:
                denc = jax.lax.psum(denc, v_ax)
                dpred = jax.lax.psum(dpred, v_ax)
            if b_ax is not None:
                dw = jax.lax.psum(dw, b_ax)
                db = jax.lax.psum(db, b_ax)
            return denc, dpred, dw, db

        return (mesh, lower,
                _fused_shardings(mesh, b_ax, v_ax, _BWD_OUT_KINDS,
                                 result_infos),
                _fused_shardings(mesh, b_ax, v_ax, _BWD_IN_KINDS, arg_infos))

    f.def_partition(infer_sharding_from_operands=infer, partition=partition,
                    sharding_rule=_BWD_RULE)
    return f
