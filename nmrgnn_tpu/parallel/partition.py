"""Atom-partitioned (graph-parallel) forward pass.

The graph-world analogue of sequence/context parallelism (SURVEY.md
§2.3, §5): one large molecular graph is sharded by atom rows across the
``graph`` mesh axis. Every per-atom op (RBF, EdgeFC, embedding, FC,
readout) is row-local; only the message-passing gather needs remote atom
features. This v1 exchanges them with a tiled all_gather per MP layer
inside shard_map (k=16 regular degree keeps the math identical to the
single-device path bit-for-bit in f32); the Pallas halo-ring variant
overlaps the exchange with local aggregation.

The reference has no equivalent — its answer to large molecules is
pre-fragmenting into 256-atom graphs (reference README.md:126).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..config import ModelConfig
from ..graph import Graph
from ..models.gnn import _dense
from ..ops.activations import get_activation
from ..ops.rbf import rbf_expand


def pad_to_multiple(graph: Graph, m: int) -> Graph:
    """Pad atom count up to a multiple of m (inert padding rows)."""
    n = graph.atoms.shape[0]
    p = (-n) % m
    if p == 0:
        return graph
    return Graph(
        atoms=jnp.pad(graph.atoms, ((0, p), (0, 0))),
        nlist=jnp.pad(graph.nlist, ((0, p), (0, 0))),
        edges=jnp.pad(graph.edges, ((0, p), (0, 0))),
        inv_degree=jnp.pad(graph.inv_degree, ((0, p),)),
    )


def apply_partitioned(
    params,
    config: ModelConfig,
    graph: Graph,
    mesh: Mesh,
    axis: str = "graph",
) -> jnp.ndarray:
    """Inference forward over an atom-sharded graph. Returns peaks f32[N].

    Atom count must be a multiple of the mesh axis size (use
    :func:`pad_to_multiple`). Parameters are replicated; activations are
    sharded [N/d, ...] per device.
    """
    n_shards = mesh.shape[axis]
    n = graph.atoms.shape[0]
    if n % n_shards:
        raise ValueError(f"atom count {n} not divisible by {axis}={n_shards}")

    fc_act = get_activation(config.fc_activation)
    mp_act = get_activation(config.mp_activation)
    row = P(axis)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), row, row, row, row),
        out_specs=row,
        check_vma=False,
    )
    def fwd(p, atoms, nlist, edges, inv_degree):
        edge_mask = (edges > 0).astype(jnp.float32)[..., None]
        e = rbf_expand(edges, config.rbf_low, config.rbf_high, config.edge_hidden_size)
        e = e * edge_mask
        for i, lp in enumerate(p["edge_fc"]):
            last = i == len(p["edge_fc"]) - 1
            e = _dense(lp, e, None if last else fc_act)
        e = e * edge_mask

        nodes = _dense(p["embed"], atoms)  # [n_local, F]

        compute_dtype = jnp.dtype(config.compute_dtype)
        for lp in p["mp"]:
            # exchange: full node table for the gather (graph-CP v1)
            full = jax.lax.all_gather(nodes, axis, tiled=True)  # [N, F]
            gathered = jnp.take(full, nlist, axis=0)  # [n_local, K, F]
            h = jnp.einsum(
                "ijn,ijl->inl",
                e.astype(compute_dtype),
                gathered.astype(compute_dtype),
            )
            upd = jnp.einsum(
                "inl,lmn->im",
                h,
                lp["w"].astype(compute_dtype),
                preferred_element_type=jnp.float32,
            ).astype(jnp.float32) * inv_degree[:, None]
            nodes = mp_act(upd) + nodes

        for lp in p["fc"][:-1]:
            nodes = _dense(lp, nodes, fc_act) + nodes
        nodes = _dense(p["fc"][-1], nodes, fc_act)

        full_peaks = _dense(p["out"], nodes)
        peaks = jnp.sum(
            full_peaks * atoms * p["peak_std"] + atoms * p["peak_avg"], axis=-1
        )
        return peaks

    return fwd(params, graph.atoms, graph.nlist, graph.edges, graph.inv_degree)


def jit_partitioned_forward(params, config: ModelConfig, mesh: Mesh, n_atoms: int):
    """jit-compiled partitioned forward with explicit input shardings so
    device_put'ed graphs stay resident shard-wise across frames."""
    row = NamedSharding(mesh, P("graph"))
    rep = NamedSharding(mesh, P())

    def f(p, g):
        return apply_partitioned(p, config, g, mesh)

    return jax.jit(
        f,
        in_shardings=(rep, Graph(row, row, row, row)),
        out_shardings=row,
    )
