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
from ..ops.message_passing import attention_weights
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


def _global_operands(mesh: Mesh, axis: str, items):
    """Device-put operands for the shard_map'd partitioned forwards.

    ``items`` is a list of (host_array, row_sharded: bool). Single
    process: plain jnp.asarray (jit auto-shards). Multi-process (the
    whole-protein multi-host case, SURVEY.md §6 north star): every
    process holds the full structure on host; each contributes its own
    contiguous row block (mesh device order is process-contiguous) via
    host_local_array_to_global_array, so the same apply_* call works
    unchanged across hosts with the halo all_to_all riding cross-process
    collectives."""
    if jax.process_count() == 1:
        return [jnp.asarray(a) for a, _ in items]
    from jax.experimental import multihost_utils

    pid, npc = jax.process_index(), jax.process_count()
    out = []
    for a, row_sharded in items:
        if isinstance(a, jax.Array) and not isinstance(a, np.ndarray):
            # already a device/global array or a tracer (differentiable
            # multi-host callers globalize BEFORE jax.grad): pass through
            out.append(a)
            continue
        a = np.asarray(a)
        if row_sharded:
            if a.shape[0] % npc:
                raise ValueError(
                    f"leading dim {a.shape[0]} not divisible by "
                    f"{npc} processes"
                )
            chunk = a.shape[0] // npc
            local, spec = a[pid * chunk : (pid + 1) * chunk], P(axis)
        else:
            local, spec = a, P()
        out.append(
            multihost_utils.host_local_array_to_global_array(local, mesh, spec)
        )
    return out


def _global_params(params, mesh: Mesh):
    """Replicate a host param pytree across a (possibly multi-process)
    mesh; identity-ish in the single-process case."""
    if jax.process_count() == 1:
        return params
    from jax.experimental import multihost_utils

    def leaf(x):
        if isinstance(x, jax.Array) and not isinstance(x, np.ndarray):
            # device/global array or tracer (multi-host training: the
            # caller globalizes params once, outside jax.grad)
            return x
        return multihost_utils.host_local_array_to_global_array(
            np.asarray(x), mesh, P()
        )

    return jax.tree_util.tree_map(leaf, params)


def make_halo_plan(nlist: np.ndarray, n_shards: int, halo_multiple: int = 8) -> HaloPlan:
    """Build the exchange plan on host. Atom count must divide n_shards.

    Fully vectorized (unique + searchsorted per requester shard) — no
    per-boundary-edge Python loop, so whole-protein multi-host plans
    build in O(D * N*K log) numpy time."""
    nlist = np.asarray(nlist)
    n, k = nlist.shape
    if n % n_shards:
        raise ValueError(f"{n} atoms not divisible by {n_shards} shards")
    m = n // n_shards
    owner = nlist // m  # [n, K] owner shard of each referenced row

    # pass 1: per requester t, the sorted unique external rows it needs
    # (sorted ⇒ grouped by owner shard since owner = row // m is monotone)
    uniq: list = []
    H = 1
    for t in range(n_shards):
        refs = nlist[t * m : (t + 1) * m]
        own = owner[t * m : (t + 1) * m]
        u = np.unique(refs[own != t])
        uniq.append(u)
        if len(u):
            counts = np.bincount(u // m, minlength=n_shards)
            H = max(H, int(counts.max()))
    H = _round_up(H, halo_multiple)

    send_idx = np.zeros((n_shards, n_shards, H), np.int32)
    local_nlist = np.zeros((n_shards, m, k), np.int32)
    for t in range(n_shards):
        refs = nlist[t * m : (t + 1) * m]
        own = owner[t * m : (t + 1) * m]
        u = uniq[t]
        uo = u // m
        # first position of each owner's group inside u
        group_start = np.searchsorted(uo, np.arange(n_shards))
        group_count = np.searchsorted(uo, np.arange(n_shards), side="right") - group_start
        for s in range(n_shards):
            rows = u[group_start[s] : group_start[s] + group_count[s]]
            send_idx[s, t, : len(rows)] = rows - s * m  # local to owner
        # workspace slot of external ref r: m + owner(r)*H + rank within group
        pos = np.searchsorted(u, refs)            # [m, K], valid where ~inside
        inside = own == t
        pos = np.where(inside, 0, pos)
        slot = m + own * H + (pos - group_start[np.clip(own, 0, n_shards - 1)])
        local_nlist[t] = np.where(inside, refs - t * m, slot).astype(np.int32)
    return HaloPlan(
        send_idx=send_idx,
        local_nlist=local_nlist,
        halo_size=H,
        n_shards=n_shards,
        rows_per_shard=m,
    )


class BandedHaloPlan(NamedTuple):
    """Halo plan + per-shard interior band plan: the multi-chip fast path.

    Per shard the MP aggregation splits into
      acc = band(M_interior, own_nodes)            all T row tiles
          + band(M_halo, received_rows)            boundary tiles only
    summed BEFORE the activation, so numerics equal the single-device
    forward while the interior Pallas kernel runs independently of the
    all_to_all (overlap window; SURVEY.md §2.3).

    The halo stage is compacted: only ``num_boundary_tiles`` (uniform
    across shards, padded with zero-contribution tiles) participate,
    each with its own window of width ``halo_window`` into the received
    halo rows — with RCM ordering that is O(window/m) of the tiles, so
    the halo stage costs a small fraction of the interior band instead
    of a dense [T, E, B, D*H] block."""

    halo: HaloPlan
    lo: np.ndarray           # i32[D, T] per-shard interior window starts
    window: int              # W (lanes), <= rows_per_shard
    block_rows: int          # B
    boundary_ids: np.ndarray  # i32[D, Tb] tile indices with halo refs
    halo_lo: np.ndarray      # i32[D, Tb] window starts into halo rows
    halo_window: int         # Wh (lanes), <= D * H

    @property
    def num_tiles(self) -> int:
        return self.halo.rows_per_shard // self.block_rows

    @property
    def num_boundary_tiles(self) -> int:
        return self.boundary_ids.shape[1]

    @property
    def halo_lanes(self) -> int:
        return self.halo.n_shards * self.halo.halo_size


def make_banded_halo_plan(
    nlist: np.ndarray,
    edges: np.ndarray,
    n_shards: int,
    block_rows: int = 128,
    align: int = 128,
    w_buckets=(256, 384, 512, 640, 768, 896, 1024, 1280, 1536, 2048),
) -> BandedHaloPlan:
    """Build the banded multi-chip plan. The graph should be RCM-ordered
    (data.reorder.rcm_order) so interior windows stay narrow and halos
    concentrate at shard boundaries; atom count must be a multiple of
    n_shards * block_rows."""
    nlist = np.asarray(nlist)
    edges = np.asarray(edges)
    n, k = nlist.shape
    # halo slots padded to full lanes so the halo block matmul is tiled
    base = make_halo_plan(nlist, n_shards, halo_multiple=align)
    m = base.rows_per_shard
    if m % block_rows:
        raise ValueError(
            f"rows per shard {m} not a multiple of block_rows {block_rows}"
        )
    t = m // block_rows
    dh = n_shards * base.halo_size
    lo = np.zeros((n_shards, t), np.int64)
    need = np.zeros((n_shards, t), np.int64)
    h_lo = np.zeros((n_shards, t), np.int64)
    h_need = np.zeros((n_shards, t), np.int64)
    is_boundary = np.zeros((n_shards, t), bool)
    for s in range(n_shards):
        lnl = base.local_nlist[s]
        real = edges[s * m : (s + 1) * m] > 0
        interior = real & (lnl < m)
        external = real & (lnl >= m)
        for i in range(t):
            sel = slice(i * block_rows, (i + 1) * block_rows)
            idx = lnl[sel][interior[sel]]
            if len(idx):
                lo_i = (int(idx.min()) // align) * align
                lo[s, i] = lo_i
                need[s, i] = int(idx.max()) - lo_i + 1
            hdx = lnl[sel][external[sel]] - m
            if len(hdx):
                is_boundary[s, i] = True
                hlo_i = (int(hdx.min()) // align) * align
                h_lo[s, i] = hlo_i
                h_need[s, i] = int(hdx.max()) - hlo_i + 1

    def bucket(w, cap):
        for b in w_buckets:
            if w <= b:
                w = b
                break
        else:
            w = _round_up(w, 512)
        return max(min(w, cap), 128)

    w = bucket(int(need.max()) if need.size else align, m)
    lo = np.minimum(lo, max(m - w, 0))

    # boundary-tile compaction: uniform count across shards (SPMD), padded
    # with non-boundary tiles whose halo band is all-zero (no refs >= m)
    tb = max(int(is_boundary.sum(axis=1).max()), 1)
    boundary_ids = np.zeros((n_shards, tb), np.int64)
    for s in range(n_shards):
        ids = np.nonzero(is_boundary[s])[0]
        fill = np.nonzero(~is_boundary[s])[0]
        pad_id = fill[0] if len(fill) else (ids[0] if len(ids) else 0)
        padded = np.concatenate([ids, np.full(tb - len(ids), pad_id)])
        boundary_ids[s] = padded
    wh = bucket(int(h_need.max()) if h_need.size else align, dh)
    h_lo = np.minimum(h_lo, max(dh - wh, 0))
    halo_lo = np.take_along_axis(h_lo, boundary_ids, axis=1)
    return BandedHaloPlan(
        halo=base,
        lo=lo.astype(np.int32),
        window=w,
        block_rows=block_rows,
        boundary_ids=boundary_ids.astype(np.int32),
        halo_lo=halo_lo.astype(np.int32),
        halo_window=wh,
    )


def apply_partitioned_banded(
    params,
    config: ModelConfig,
    graph: Graph,
    plan: BandedHaloPlan,
    mesh: Mesh,
    axis: str = "graph",
    interpret: bool = False,
    differentiable: bool = False,
    arrays=None,
    training: bool = False,
    rng=None,
) -> jnp.ndarray:
    """Multi-chip forward with per-shard Pallas banded MP and overlapped
    halo exchange. Equals the single-device forward in f32. Serves both
    MP families: bilinear (layer-invariant bands, built once) and
    attention (per-layer one-channel bands from the softmax weights,
    with the padding-mass rank-1 correction riding the halo's row-0
    slot).

    ``training=True`` (requires ``rng``) applies the reference's
    training-time regularization — Gaussian distance noise before the
    edge stage and readout dropout (reference model.py:253,266-267) —
    with shard-local draws (the key is folded with the shard index, so
    the whole-protein draws differ from a single-device run's but are
    i.i.d. with the same distribution). The padding mask is computed
    from the PRE-noise distances, like every other forward here.

    ``arrays``: optional (send_idx, local_nlist, lo, boundary_ids,
    halo_lo) overriding the plan's host arrays — pass traced values here
    when calling under jit so a rebuilt same-shape plan (trajectory
    frames) reuses the compilation instead of baking stale constants.

    ``differentiable=True`` swaps the Pallas calls for their custom-VJP
    wrappers (ops/banded build_band_tracedlo_df / mp_banded_partial_df)
    so jax.grad flows through the whole partitioned forward — shard_map,
    the all_to_all halo exchange (its transpose is the reverse
    all_to_all), and the banded kernels — enabling graph-partitioned
    (context-parallel) TRAINING, not just inference. The reference has
    no multi-device training at all (SURVEY.md §2.3).

    Per MP layer and shard:
      1. issue the all_to_all for the boundary rows (D*H rows out/in)
      2. interior aggregation: banded Pallas kernel over OWN rows only —
         no dependency on the exchange, so XLA can run it under the
         in-flight collective
      3. halo aggregation: [T,E,B,DH] halo block x received rows
      4. nodes = act((interior + halo) * inv_degree) + nodes

    The graph must be RCM-ordered and padded to D * rows_per_shard atoms
    (see make_banded_halo_plan). ``interpret`` runs the Pallas kernels in
    interpreter mode (CPU tests / dryrun)."""
    from ..ops.banded import (
        build_band_tracedlo,
        build_band_tracedlo_df,
        mp_banded_partial,
        mp_banded_partial_df,
    )

    if differentiable:
        build_band_tracedlo = build_band_tracedlo_df
        mp_banded_partial = mp_banded_partial_df
    if training and rng is None:
        raise ValueError("training=True requires rng")
    if rng is None:
        rng = jax.random.PRNGKey(0)  # unused; keeps the operand list static

    base = plan.halo
    D, m, H = base.n_shards, base.rows_per_shard, base.halo_size
    B, W, T = plan.block_rows, plan.window, plan.num_tiles
    DH, Wh, Tb = plan.halo_lanes, plan.halo_window, plan.num_boundary_tiles
    fc_act = get_activation(config.fc_activation)
    mp_act = get_activation(config.mp_activation)
    compute_dtype = jnp.dtype(config.compute_dtype)
    row = P(axis)

    params = _global_params(params, mesh)
    if arrays is None:
        arrays = (base.send_idx, base.local_nlist, plan.lo,
                  plan.boundary_ids, plan.halo_lo)
    send_idx_a, lnl_a, lo_a, bids_a, hlo_a = arrays
    (
        send_idx_g, atoms_g, local_nlist, lo_all, bids_all, hlo_all,
        edges_g, inv_g, rng_g,
    ) = _global_operands(
        mesh, axis,
        [
            (send_idx_a, False),        # [D, D, H] replicated
            (graph.atoms, True),
            (lnl_a, True),              # [D, m, K]
            (lo_a, True),               # [D, T]
            (bids_a, True),             # [D, Tb]
            (hlo_a, True),              # [D, Tb]
            (graph.edges, True),
            (graph.inv_degree, True),
            (rng, False),               # replicated; folded per shard
        ],
    )

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(), P(), row, P(axis, None, None), P(axis, None),
            P(axis, None), P(axis, None), row, row, P(),
        ),
        out_specs=row,
        check_vma=False,
    )
    def fwd(p, send_idx, atoms, lnl, lo, bids, hlo, edges, inv_degree, rng):
        me = jax.lax.axis_index(axis)
        lnl = lnl[0]          # [m, K] workspace-relative neighbor ids
        lo = lo[0]            # [T]
        bids = bids[0]        # [Tb] boundary tile indices
        hlo = hlo[0]          # [Tb] halo window starts

        # padding masks from the ORIGINAL distances, before noise
        edge_mask = (edges > 0).astype(jnp.float32)[..., None]
        real = edges > 0
        if training and config.noise > 0:
            nrng = jax.random.fold_in(jax.random.fold_in(rng, 1), me)
            edges = edges + config.noise * jax.random.normal(
                nrng, edges.shape, edges.dtype
            )
        e = rbf_expand(edges, config.rbf_low, config.rbf_high, config.edge_hidden_size)
        e = e * edge_mask
        for i, lp in enumerate(p["edge_fc"]):
            last = i == len(p["edge_fc"]) - 1
            e = _dense(lp, e, None if last else fc_act)
        e = e * edge_mask     # [m, K, E]

        # boundary-tile row ids (halo band rows, compacted by boundary_ids)
        rows = (bids[:, None] * B + jnp.arange(B)[None, :]).reshape(-1)
        attention = config.mp_type == "attention"
        if not attention:
            # layer-invariant band structures, built once per forward:
            # interior refs (< m) land in the windowed band; halo refs
            # (>= m) fall outside every interior window and are excluded.
            M_int = build_band_tracedlo(
                lnl, e, lo, W, B, out_dtype=compute_dtype, interpret=interpret
            )
            # halo band over the BOUNDARY tiles only: lanes are
            # received-row slots (refs - m; interior refs go negative and
            # never match). Padding tiles have no halo refs, so their
            # band is zero and the scatter adds nothing.
            M_halo = build_band_tracedlo(
                jnp.take(lnl, rows, axis=0) - m,
                jnp.take(e, rows, axis=0),
                hlo, Wh, B, out_dtype=compute_dtype, interpret=interpret,
            )

        nodes = _dense(p["embed"], atoms)  # [m, F]
        my_send = jax.lax.dynamic_index_in_dim(send_idx, me, 0, keepdims=False)

        inv_col = inv_degree[:, None]
        for lp in p["mp"]:
            # 1) issue the exchange first ...
            send_buf = jnp.take(nodes, my_send.reshape(-1), axis=0).reshape(
                D, H, -1
            )
            recv = jax.lax.all_to_all(
                send_buf, axis, split_axis=0, concat_axis=0, tiled=False
            )  # [D, H, F]; recv[s] = rows sent by shard s
            halo_nodes = recv.reshape(DH, -1)
            if attention:
                # attention band depends on the layer's query, so the
                # E=1 bands rebuild per layer (cf. apply_banded_attention)
                a = attention_weights(
                    lp["wq"], lp["wk"], nodes, e, inv_degree
                )
                a_band = jnp.where(real, a, 0.0)[..., None]  # [m, K, 1]
                c = jnp.sum(jnp.where(real, 0.0, a), axis=-1)
                wv3 = lp["wv"].astype(compute_dtype)[:, :, None]
                Ma_int = build_band_tracedlo(
                    lnl, a_band, lo, W, B,
                    out_dtype=compute_dtype, interpret=interpret,
                )
                Ma_halo = build_band_tracedlo(
                    jnp.take(lnl, rows, axis=0) - m,
                    jnp.take(a_band, rows, axis=0),
                    hlo, Wh, B, out_dtype=compute_dtype, interpret=interpret,
                )
                acc = mp_banded_partial(
                    Ma_int, lo, nodes.astype(compute_dtype), wv3,
                    interpret=interpret,
                )
                acc = acc.at[rows].add(
                    mp_banded_partial(
                        Ma_halo, hlo, halo_nodes.astype(compute_dtype), wv3,
                        interpret=interpret,
                    )
                )
                # padding-slot softmax mass -> global row 0 (quirk
                # parity, cf. apply_banded_attention). Row 0 is the
                # smallest external ref so it always occupies halo
                # slot 0 of owner shard 0 when referenced; on shard 0
                # it is the local first row. c == 0 when unreferenced.
                row0 = jnp.where(me == 0, nodes[0], halo_nodes[0])
                nodes = mp_act(acc + c[:, None] * (row0 @ lp["wv"])) + nodes
            else:
                w = lp["w"].astype(compute_dtype)
                # 2) ... interior band runs with no dependency on the
                # exchange ...
                acc_int = mp_banded_partial(
                    M_int, lo, nodes.astype(compute_dtype), w,
                    interpret=interpret,
                )
                # 3) ... boundary-tile halo band consumes received rows.
                acc_halo = mp_banded_partial(
                    M_halo, hlo, halo_nodes.astype(compute_dtype), w,
                    interpret=interpret,
                )
                acc = acc_int.at[rows].add(acc_halo)
                nodes = mp_act(acc * inv_col) + nodes

        for lp in p["fc"][:-1]:
            nodes = _dense(lp, nodes, fc_act) + nodes
        nodes = _dense(p["fc"][-1], nodes, fc_act)
        if training and config.dropout:
            drng = jax.random.fold_in(jax.random.fold_in(rng, 2), me)
            keep = 1.0 - config.dropout_rate
            dmask = jax.random.bernoulli(drng, keep, nodes.shape)
            nodes = jnp.where(dmask, nodes / keep, 0.0)
        full_peaks = _dense(p["out"], nodes)
        # frozen de-standardization buffers (gnn.apply parity): training
        # through the differentiable partitioned forward must not leak
        # gradients into peak_std/peak_avg
        peak_std = jax.lax.stop_gradient(p["peak_std"])
        peak_avg = jax.lax.stop_gradient(p["peak_avg"])
        return jnp.sum(
            full_peaks * atoms * peak_std + atoms * peak_avg, axis=-1
        )

    return fwd(
        params, send_idx_g, atoms_g, local_nlist, lo_all, bids_all, hlo_all,
        edges_g, inv_g, rng_g,
    )


def make_partitioned_train_step(
    config: ModelConfig,
    tx,
    loss_idx,
    plan: BandedHaloPlan,
    mesh: Mesh,
    axis: str = "graph",
    loss_balance: float = 1.0,
    interpret: bool = False,
    training: bool = False,
):
    """Whole-structure (context-parallel) training step: NameLoss +
    jax.grad through the differentiable partitioned banded forward
    (shard_map, all_to_all halo exchange, custom-VJP Pallas kernels) and
    an optax update on replicated params.

    The reference can only train on 256-atom fragments (nmrdata
    fragmenting, SURVEY.md App. B); this trains on the intact protein
    across the ``axis`` shards of the mesh. ``y`` is the [N, 3] label
    block (shift, name-index, labeled-flag), ``w`` the [N] sample
    weights, both padded like the graph.

    ``training=True`` enables the reference's Gaussian distance noise
    and readout dropout (shard-local draws; see
    apply_partitioned_banded) — the step then takes a per-step ``rng``.
    The returned step's signature is
    ``step(params, opt_state, graph, y, w, rng=None, arrays=None)``:
    ``arrays`` optionally overrides the plan's host exchange arrays with
    traced values (send_idx, local_nlist, lo, boundary_ids, halo_lo), so
    trajectory frames whose rebuilt plans share this plan's SHAPES reuse
    the compilation instead of retracing (the production multi-frame
    training loop, train/partitioned.py).
    """
    import optax

    from ..train.losses import name_loss
    from ..train.trainer import fold_sample_weight

    def loss_fn(params, graph, y, w, rng, arrays):
        peaks = apply_partitioned_banded(
            params, config, graph, plan, mesh, axis=axis,
            interpret=interpret, differentiable=True,
            training=training, rng=rng, arrays=arrays,
        )
        yt = fold_sample_weight(y, w)
        return name_loss(yt, peaks, loss_idx, s=loss_balance)

    @jax.jit
    def step(params, opt_state, graph, y, w, rng=None, arrays=None):
        loss, grads = jax.value_and_grad(loss_fn)(params, graph, y, w, rng, arrays)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step


def apply_partitioned_halo(
    params,
    config: ModelConfig,
    graph: Graph,
    plan: HaloPlan,
    mesh: Mesh,
    axis: str = "graph",
    arrays=None,
) -> jnp.ndarray:
    """Inference forward with halo-exchange message passing. The graph
    must be padded to plan.n_shards * plan.rows_per_shard atoms.
    ``arrays``: optional (send_idx, local_nlist) traced overrides of the
    plan's host arrays (jit-cache-friendly plan rebuilds, see
    apply_partitioned_banded).

    Supports both MP families: bilinear (reference MPLayer) and
    attention (AMPLayer, config.mp_type == "attention"). The attention
    softmax/logit stage is purely shard-local (query from own rows, keys
    from own edge features); only the value gather touches remote rows,
    which the halo workspace already provides — including the row-0
    reference of padding slots (nlist = 0 refs land in every shard's
    halo), so the reference's unmasked-padding softmax quirk is exact."""
    D, m, H = plan.n_shards, plan.rows_per_shard, plan.halo_size
    fc_act = get_activation(config.fc_activation)
    mp_act = get_activation(config.mp_activation)
    row = P(axis)

    params = _global_params(params, mesh)
    if arrays is None:
        arrays = (plan.send_idx, plan.local_nlist)
    send_idx_a, lnl_a = arrays
    send_idx_g, atoms_g, local_nlist, edges_g, inv_g = _global_operands(
        mesh, axis,
        [
            (send_idx_a, False),       # [D, D, H] replicated
            (graph.atoms, True),
            (lnl_a, True),             # [D, m, K]
            (graph.edges, True),
            (graph.inv_degree, True),
        ],
    )

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), row, P(axis, None, None), row, row),
        out_specs=row,
        check_vma=False,
    )
    def fwd(p, send_idx, atoms, lnl, edges, inv_degree):
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
            if config.mp_type == "attention":
                a = attention_weights(
                    lp["wq"], lp["wk"], nodes, e, inv_degree
                )  # [m, K]
                upd = jnp.einsum("ij,ijl->il", a, gathered) @ lp["wv"]
            else:
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
        peak_std = jax.lax.stop_gradient(p["peak_std"])
        peak_avg = jax.lax.stop_gradient(p["peak_avg"])
        return jnp.sum(
            full_peaks * atoms * peak_std + atoms * peak_avg, axis=-1
        )

    return fwd(params, send_idx_g, atoms_g, local_nlist, edges_g, inv_g)
