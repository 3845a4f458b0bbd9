"""Parameter/batch sharding rules for mesh-parallel training.

Data parallelism: fragment batches shard over the ``data`` axis; XLA
inserts the gradient psum automatically (params replicated or
tensor-sharded, batch sharded — standard GSPMD).

Tensor parallelism: the model is small (1.07M params) so TP is about
exercising the machinery, not memory (SURVEY.md §2.3): MPLayer bilinear
weights w[F,F,E] shard on the contraction dim over ``graph``; FC/EdgeFC
hidden kernels shard on the input dim. XLA turns the contractions into
reduce-scatter/all-reduce pairs over ICI.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..config import ModelConfig
from ..graph import Graph
from ..models import gnn
from ..train.losses import name_loss
from ..train.trainer import fold_sample_weight


def param_specs(params, tp: bool = False, axis: str = "graph"):
    """PartitionSpec pytree for the parameter tree."""

    def spec_for(path, leaf):
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        if not tp:
            return P()
        if "mp" in keys and keys[-1] == "w":
            return P(axis, None, None)  # contraction (l) dim sharded
        if "fc" in keys and keys[-1] == "kernel" and leaf.ndim == 2 and (
            leaf.shape[0] == leaf.shape[1]
        ):
            return P(axis, None)  # square hidden kernels only
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params, mesh: Mesh, tp: bool = False):
    specs = param_specs(params, tp)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def batch_spec() -> Graph:
    return Graph(P("data"), P("data"), P("data"), P("data"))


def shard_batch(mesh: Mesh, graph: Graph, y, w):
    gsh = Graph(*[
        jax.device_put(a, NamedSharding(mesh, P("data"))) for a in graph
    ])
    return (
        gsh,
        jax.device_put(y, NamedSharding(mesh, P("data"))),
        jax.device_put(w, NamedSharding(mesh, P("data"))),
    )


def make_parallel_train_step(
    config: ModelConfig,
    tx,
    loss_idx,
    mesh: Mesh,
    loss_balance: float = 1.0,
    tp: bool = False,
):
    """jit-compiled DP(+TP) training step with explicit shardings.

    Returns (step, shard_init) where shard_init places (params, opt_state)
    with the step's expected shardings.
    """

    def loss_fn(params, graph, y, w, rng):
        peaks = gnn.apply_batched(params, config, graph, training=True, rng=rng)
        yt = fold_sample_weight(y, w)
        return name_loss(yt.reshape(-1, 3), peaks.reshape(-1), loss_idx, s=loss_balance)

    def step(params, opt_state, graph, y, w, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, graph, y, w, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def shard_init(params, opt_state):
        params = shard_params(params, mesh, tp)
        p_specs = param_specs(params, tp)
        param_def = jax.tree_util.tree_structure(params)

        def place(node):
            # Param-shaped subtrees (Adam mu/nu) mirror the parameter
            # sharding; everything else (counts, hyperparams) replicates.
            if jax.tree_util.tree_structure(node) == param_def:
                return jax.tree_util.tree_map(
                    lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
                    node, p_specs,
                )
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, NamedSharding(mesh, P())), node
            )

        opt_state = jax.tree_util.tree_map(
            place, opt_state,
            is_leaf=lambda n: jax.tree_util.tree_structure(n) == param_def,
        )
        return params, opt_state

    jstep = jax.jit(step, donate_argnums=(0, 1))
    return jstep, shard_init
