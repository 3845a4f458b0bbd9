"""Halo-exchange graph partitioning: move only the boundary atom features.

The v1 partitioned forward (parallel/partition.py) all-gathers the full
node table every MP layer (N*F per shard per layer). This version
precomputes, per shard pair (s -> t), exactly which of s's atom rows t's
edges reference, exchanges only those with one all_to_all per layer
(D*H*F per shard, H = max pair halo), and rewrites each shard's neighbor
lists to index a local workspace = [own rows | received halo rows].

With RCM-ordered atoms the halo concentrates at shard boundaries, so
H << N/D and the exchange rides ICI at a small fraction of the
all-gather volume. This is the graph-world context-parallel halo the
reference lacks entirely (SURVEY.md §2.3, §5).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from ..config import ModelConfig
from ..graph import Graph
from ..models.gnn import _dense
from ..ops.activations import get_activation
from ..ops.rbf import rbf_expand


class HaloPlan(NamedTuple):
    """Host-precomputed exchange plan for one (structure, shard count)."""

    send_idx: np.ndarray     # i32[D, D, H] local row ids shard s sends to t
    local_nlist: np.ndarray  # i32[D, m, K] workspace-relative neighbor ids
    halo_size: int           # H
    n_shards: int
    rows_per_shard: int

    @property
    def workspace_rows(self) -> int:
        return self.rows_per_shard + self.n_shards * self.halo_size


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def make_halo_plan(nlist: np.ndarray, n_shards: int, halo_multiple: int = 8) -> HaloPlan:
    """Build the exchange plan on host. Atom count must divide n_shards."""
    nlist = np.asarray(nlist)
    n, k = nlist.shape
    if n % n_shards:
        raise ValueError(f"{n} atoms not divisible by {n_shards} shards")
    m = n // n_shards
    owner = nlist // m  # [n, K] owner shard of each referenced row

    # per (owner s, requester t): sorted unique rows of s needed by t
    send: list = [[None] * n_shards for _ in range(n_shards)]
    H = 1
    for t in range(n_shards):
        refs = nlist[t * m : (t + 1) * m]
        own = owner[t * m : (t + 1) * m]
        for s in range(n_shards):
            if s == t:
                send[s][t] = np.empty(0, np.int64)
                continue
            rows = np.unique(refs[own == s])
            send[s][t] = rows
            H = max(H, len(rows))
    H = _round_up(H, halo_multiple)

    send_idx = np.zeros((n_shards, n_shards, H), np.int32)
    # map global row -> workspace slot for each requester t
    local_nlist = np.zeros((n_shards, m, k), np.int32)
    for t in range(n_shards):
        slot_of = {}
        for s in range(n_shards):
            rows = send[s][t]
            send_idx[s, t, : len(rows)] = rows - s * m  # local to owner
            for j, r in enumerate(rows):
                slot_of[int(r)] = m + s * H + j
        refs = nlist[t * m : (t + 1) * m]
        own = owner[t * m : (t + 1) * m]
        ln = np.empty((m, k), np.int32)
        inside = own == t
        ln[inside] = (refs - t * m)[inside]
        for (i, j) in zip(*np.nonzero(~inside)):
            ln[i, j] = slot_of[int(refs[i, j])]
        local_nlist[t] = ln
    return HaloPlan(
        send_idx=send_idx,
        local_nlist=local_nlist,
        halo_size=H,
        n_shards=n_shards,
        rows_per_shard=m,
    )


def apply_partitioned_halo(
    params,
    config: ModelConfig,
    graph: Graph,
    plan: HaloPlan,
    mesh: Mesh,
    axis: str = "graph",
) -> jnp.ndarray:
    """Inference forward with halo-exchange message passing. The graph
    must be padded to plan.n_shards * plan.rows_per_shard atoms."""
    D, m, H = plan.n_shards, plan.rows_per_shard, plan.halo_size
    fc_act = get_activation(config.fc_activation)
    mp_act = get_activation(config.mp_activation)
    row = P(axis)

    send_idx = jnp.asarray(plan.send_idx)            # [D, D, H]
    local_nlist = jnp.asarray(plan.local_nlist)      # [D, m, K] sharded

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), row, P(axis, None, None), row, row),
        out_specs=row,
        check_vma=False,
    )
    def fwd(p, atoms, lnl, edges, inv_degree):
        me = jax.lax.axis_index(axis)
        lnl = lnl[0]  # [m, K]

        edge_mask = (edges > 0).astype(jnp.float32)[..., None]
        e = rbf_expand(edges, config.rbf_low, config.rbf_high, config.edge_hidden_size)
        e = e * edge_mask
        for i, lp in enumerate(p["edge_fc"]):
            last = i == len(p["edge_fc"]) - 1
            e = _dense(lp, e, None if last else fc_act)
        e = e * edge_mask

        nodes = _dense(p["embed"], atoms)  # [m, F]
        my_send = jax.lax.dynamic_index_in_dim(send_idx, me, 0, keepdims=False)  # [D, H]

        compute_dtype = jnp.dtype(config.compute_dtype)
        for lp in p["mp"]:
            # halo exchange: send each shard the rows it needs
            send_buf = jnp.take(nodes, my_send.reshape(-1), axis=0).reshape(
                D, H, -1
            )
            recv = jax.lax.all_to_all(
                send_buf, axis, split_axis=0, concat_axis=0, tiled=False
            )  # [D, H, F]: recv[s] = rows sent by shard s
            workspace = jnp.concatenate([nodes, recv.reshape(D * H, -1)], axis=0)
            gathered = jnp.take(workspace, lnl, axis=0)  # [m, K, F]
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
        return jnp.sum(
            full_peaks * atoms * p["peak_std"] + atoms * p["peak_avg"], axis=-1
        )

    return fwd(params, graph.atoms, local_nlist, graph.edges, graph.inv_degree)
