"""Fast inference path: full forward with block-sparse Pallas message
passing (see ops/blocksparse.py for the design rationale).

Usage:
    struct = precompute_structure(graph)          # host, per frame
    peaks = apply_blocksparse(params, cfg, graph, struct)

Numerics match models.gnn.apply in f32 (same sums, block-reordered);
``compute_dtype='bfloat16'`` trades <1e-2 relative error for ~2x MP
throughput.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..graph import Graph
from ..ops.activations import get_activation
from ..ops.banded import (
    BandPlan,
    band_plan,
    build_band,
    build_band_df,
    build_band_fused,
    build_band_poly,
    build_band_xla,
    mp_banded,
    mp_banded_df,
    mp_banded_hbm,
    mp_banded_partial,
    mp_banded_partial_df,
    mp_banded_xla,
    plan_fits_vmem,
)
from ..ops.blocksparse import (
    BlockStructure,
    block_structure,
    build_block_adjacency_pallas,
    mp_blocksparse,
    mp_blocksparse_xla,
)
from ..ops.message_passing import attention_weights
from ..ops.rbf import rbf_expand
from .gnn import _dense


def precompute_structure(
    graph: Graph,
    block_size: int = 128,
    pair_rounding: int = 0,
    group: int = 1,
) -> BlockStructure:
    """Host-side sparsity pattern for a frame (reusable across layers and
    repeated forwards with the same neighbor lists)."""
    return block_structure(
        np.asarray(graph.nlist), np.asarray(graph.edges), block_size,
        pair_rounding=pair_rounding, group=group,
    )


def apply_blocksparse(
    params,
    config: ModelConfig,
    graph: Graph,
    struct: BlockStructure,
    interpret: bool = False,
    use_pallas: bool = True,
    group: int = 1,
) -> jnp.ndarray:
    """Forward pass (inference mode) with block-sparse MP. Returns
    peaks f32[N] for the unpadded atoms."""
    atoms, nlist, edges, inv_degree = graph
    n = atoms.shape[0]
    fc_act = get_activation(config.fc_activation)

    edge_mask = (edges > 0).astype(jnp.float32)[..., None]
    e = rbf_expand(edges, config.rbf_low, config.rbf_high, config.edge_hidden_size)
    e = e * edge_mask
    for i, p in enumerate(params["edge_fc"]):
        last = i == len(params["edge_fc"]) - 1
        e = _dense(p, e, None if last else fc_act)
    e = e * edge_mask  # [N, K, E]

    compute_dtype = jnp.dtype(config.compute_dtype)
    if use_pallas:
        A = build_block_adjacency_pallas(
            nlist, e, struct, out_dtype=compute_dtype, interpret=interpret
        )
    else:
        from ..ops.blocksparse import build_block_adjacency

        A = build_block_adjacency(nlist, e.astype(compute_dtype), struct)

    pad = struct.n_padded - n
    nodes = _dense(params["embed"], atoms).astype(compute_dtype)
    nodes = jnp.pad(nodes, ((0, pad), (0, 0)))
    inv_p = jnp.pad(inv_degree, ((0, pad),))

    for p in params["mp"]:
        w = p["w"].astype(compute_dtype)
        if use_pallas:
            nodes = mp_blocksparse(
                A, struct, nodes, w, inv_p, config.mp_activation,
                interpret=interpret, group=group,
            )
        else:
            nodes = mp_blocksparse_xla(
                A, struct, nodes, w, inv_p, config.mp_activation
            )

    nodes = nodes[:n].astype(jnp.float32)
    for p in params["fc"][:-1]:
        nodes = _dense(p, nodes, fc_act) + nodes
    nodes = _dense(params["fc"][-1], nodes, fc_act)
    full_peaks = _dense(params["out"], nodes)
    peaks = jnp.sum(
        full_peaks * atoms * params["peak_std"] + atoms * params["peak_avg"],
        axis=-1,
    )
    return peaks


def _edge_features(params, config, edges, mask=None):
    """RBF + EdgeFC + masking, shared by all fast-path forwards
    (reference: model.py:251-261). Matmuls honor config.compute_dtype
    (f32 accumulation) like gnn.apply.

    ``mask`` overrides the padding mask; callers that perturb ``edges``
    (training-time Gaussian distance noise) MUST pass the mask computed
    from the ORIGINAL edges — the reference masks on pre-noise distances
    (model.py:251-253), and noised padding slots (d=0+noise) would
    otherwise land inside the RBF domain and emit spurious messages."""
    fc_act = get_activation(config.fc_activation)
    compute_dtype = jnp.dtype(config.compute_dtype)
    edge_mask = (edges > 0).astype(jnp.float32)[..., None] if mask is None else mask
    e = rbf_expand(edges, config.rbf_low, config.rbf_high, config.edge_hidden_size)
    e = e * edge_mask
    for i, p in enumerate(params["edge_fc"]):
        last = i == len(params["edge_fc"]) - 1
        e = _dense(p, e, None if last else fc_act, compute_dtype=compute_dtype)
    return e * edge_mask  # [N, K, E]


def _readout(params, config, atoms, nodes, *, dropout_rng=None):
    """FC block + per-element head + de-standardization
    (reference: model.py:265-273). Matmuls honor config.compute_dtype
    (f32 accumulation); activations and the de-standardization stay f32.
    peak_std/peak_avg are frozen buffers (stop_gradient, like gnn.apply)
    so training through any fast path leaves them untouched.
    ``dropout_rng`` enables the reference's readout dropout
    (model.py:266-267) for training-mode callers."""
    fc_act = get_activation(config.fc_activation)
    compute_dtype = jnp.dtype(config.compute_dtype)
    for p in params["fc"][:-1]:
        nodes = _dense(p, nodes, fc_act, compute_dtype=compute_dtype) + nodes
    nodes = _dense(params["fc"][-1], nodes, fc_act, compute_dtype=compute_dtype)
    if dropout_rng is not None:
        keep = 1.0 - config.dropout_rate
        mask = jax.random.bernoulli(dropout_rng, keep, nodes.shape)
        nodes = jnp.where(mask, nodes / keep, 0.0)
    full_peaks = _dense(params["out"], nodes, compute_dtype=compute_dtype)
    peak_std = jax.lax.stop_gradient(params["peak_std"])
    peak_avg = jax.lax.stop_gradient(params["peak_avg"])
    return jnp.sum(
        full_peaks * atoms * peak_std + atoms * peak_avg, axis=-1
    )


def precompute_band(graph: Graph, block_rows: int = 128) -> BandPlan:
    """Host-side banding plan for an (RCM-ordered) frame. Reusable across
    layers, forwards, and trajectory frames with the same topology."""
    return band_plan(
        np.asarray(graph.nlist), np.asarray(graph.edges), block_rows=block_rows
    )


def apply_banded(
    params,
    config: ModelConfig,
    graph: Graph,
    plan: BandPlan,
    interpret: bool = False,
    use_pallas: bool = True,
    fused_edge: bool = True,
    cheb=None,
    hbm_table: bool = False,
    fused_first: bool = False,
) -> jnp.ndarray:
    """Forward pass (inference mode) with RCM-banded MP (see ops/banded.py).

    ``graph`` should be RCM-reordered (data.reorder.rcm_order with
    pin_zero=False) so the band is narrow; correctness does not depend
    on the order. Returns peaks f32[N] for the unpadded atoms.

    ``fused_edge=True`` (Pallas path only) computes RBF + EdgeFC + band
    build in one fused kernel so the [N, K, H] edge activations never
    round-trip through HBM. Passing ``cheb`` (ops.edgefn.EdgeCheb)
    switches the edge stage to its Chebyshev compression —
    transcendental-free, measured max error ~1e-6 at the shipped
    degree-64 fit (the serving fast path).

    ``hbm_table=True`` keeps the node table in HBM with double-buffered
    window DMA (ops/banded.mp_banded_hbm) — same numerics, no VMEM
    bound on the graph size (the >8k-atom serving regime).
    """
    atoms, nlist, edges, inv_degree = graph
    n = atoms.shape[0]

    compute_dtype = jnp.dtype(config.compute_dtype)
    pad = plan.n_padded - n
    if (use_pallas and cheb is not None and not hbm_table and fused_first
            and params["mp"]):
        # pipelined variant: the Chebyshev band build and MP layer 1
        # share one kernel with double-buffered band scratch. Measured
        # on v5e it is latency-NEUTRAL vs the serial kernels (Mosaic
        # does not co-schedule the VPU build with the MXU matmuls
        # across the predicated regions), so the serial path stays the
        # default; kept for future Mosaic scheduler improvements and as
        # the tested template for wavefront fusion (BENCHMARKS.md).
        from ..ops.banded import mp_banded_poly_fused

        nodes = _dense(params["embed"], atoms).astype(compute_dtype)
        nodes = jnp.pad(nodes, ((0, pad), (0, 0)))
        inv_p = jnp.pad(inv_degree, ((0, pad),))
        M, nodes = mp_banded_poly_fused(
            nlist, edges, cheb, plan, nodes,
            params["mp"][0]["w"].astype(compute_dtype), inv_p,
            config.mp_activation, out_dtype=compute_dtype,
            interpret=interpret,
        )
        for p in params["mp"][1:]:
            nodes = mp_banded(
                M, plan, nodes, p["w"].astype(compute_dtype), inv_p,
                config.mp_activation, interpret=interpret,
            )
        nodes = nodes[:n].astype(jnp.float32)
        return _readout(params, config, atoms, nodes)
    if use_pallas and cheb is not None:
        M = build_band_poly(
            nlist, edges, cheb, plan, out_dtype=compute_dtype, interpret=interpret
        )
    elif use_pallas and fused_edge:
        M = build_band_fused(
            nlist, edges, params["edge_fc"], plan,
            rbf_low=config.rbf_low, rbf_high=config.rbf_high,
            activation_name=config.fc_activation,
            out_dtype=compute_dtype, compute_dtype=compute_dtype,
            interpret=interpret,
        )
    elif use_pallas:
        e = _edge_features(params, config, edges)
        M = build_band(nlist, e, plan, out_dtype=compute_dtype, interpret=interpret)
    else:
        e = _edge_features(params, config, edges)
        M = build_band_xla(nlist, e, plan).astype(compute_dtype)

    pad = plan.n_padded - n
    nodes = _dense(params["embed"], atoms).astype(compute_dtype)
    nodes = jnp.pad(nodes, ((0, pad), (0, 0)))
    inv_p = jnp.pad(inv_degree, ((0, pad),))

    for p in params["mp"]:
        w = p["w"].astype(compute_dtype)
        if use_pallas and hbm_table:
            nodes = mp_banded_hbm(
                M, plan, nodes, w, inv_p, config.mp_activation, interpret=interpret
            )
        elif use_pallas:
            nodes = mp_banded(
                M, plan, nodes, w, inv_p, config.mp_activation, interpret=interpret
            )
        else:
            nodes = mp_banded_xla(M, plan, nodes, w, inv_p, config.mp_activation)

    nodes = nodes[:n].astype(jnp.float32)
    return _readout(params, config, atoms, nodes)


def apply_banded_classes(
    params,
    config: ModelConfig,
    graph: Graph,
    cls_plan,                # ops.banded.BandClassPlan
    cheb,                    # ops.edgefn.EdgeCheb
    arrays=None,             # traced (ids, lo) pairs overriding the plan's
    interpret: bool = False,
) -> jnp.ndarray:
    """VMEM-node-table forward with CLASS-BUCKETED band windows: tiles
    grouped by actual window need (ops/banded.band_plan_classes) so
    narrow tiles stop paying the widest tile's band in BOTH the build
    kernel and the MP matmul lanes. On the RCM-ordered 108M flagship
    graph the per-tile need spans 240-818 rows against a uniform
    W = 896 — the class plan (2 tiles @ 256, 10 @ 640, 8 @ 896) carries
    ~21% less band build work and ~14% fewer MP window FLOPs.
    Numerics match apply_banded(cheb=...) (same kernels, narrower
    windows); the small-graph twin of apply_banded_hbm_classes (which
    serves the >VMEM regime).

    Per class c: build M_c [Tc, E, B, Wc] (Chebyshev edge stage inside
    the build), one mp_banded_partial per MP layer against the shared
    VMEM node table, rows reassembled by contiguous-run
    dynamic_update_slice copies (ids are static per plan).

    ``arrays``: optional tuple of per-class (ids, lo) traced arrays so a
    rebuilt same-shape plan (trajectory frames) reuses the compilation
    (general-scatter reassembly on that path, cf.
    apply_banded_hbm_classes)."""
    from ..ops.banded import build_band_poly_cls, mp_banded_partial

    atoms, nlist, edges, inv_degree = graph
    n = atoms.shape[0]
    B = cls_plan.block_rows
    compute_dtype = jnp.dtype(config.compute_dtype)
    mp_act = get_activation(config.mp_activation)
    if arrays is None:
        arrays = tuple((None, None) for _ in cls_plan.classes)

    Ms = [
        build_band_poly_cls(
            nlist, edges, cheb, c, B, cls_plan.n_padded,
            ids=ids, lo=lo, out_dtype=compute_dtype, interpret=interpret,
        )
        for c, (ids, lo) in zip(cls_plan.classes, arrays)
    ]
    pad = cls_plan.n_padded - n
    nodes = _dense(params["embed"], atoms)
    nodes = jnp.pad(nodes, ((0, pad), (0, 0)))
    inv_col = jnp.pad(inv_degree, ((0, pad),))[:, None]

    def place(acc, c, ids, out_c):
        if ids is None:
            cid = np.asarray(c.ids)
            run_starts = np.nonzero(np.diff(cid, prepend=cid[0] - 2) != 1)[0]
            run_ends = np.append(run_starts[1:], len(cid))
            for a, b in zip(run_starts, run_ends):
                blk = jax.lax.dynamic_slice(
                    out_c, (int(a) * B, 0), (int(b - a) * B, out_c.shape[-1])
                )
                acc = jax.lax.dynamic_update_slice(
                    acc, blk, (int(cid[a]) * B, 0)
                )
            return acc
        rows = (ids[:, None] * B + jnp.arange(B)[None, :]).reshape(-1)
        return acc.at[rows].set(out_c)

    for p in params["mp"]:
        w3 = p["w"].astype(compute_dtype)
        acc = jnp.zeros((cls_plan.n_padded, nodes.shape[-1]), jnp.float32)
        for (c, (ids, lo)), M in zip(zip(cls_plan.classes, arrays), Ms):
            out_c = mp_banded_partial(
                M,
                jnp.asarray(c.lo) if lo is None else lo,
                nodes.astype(compute_dtype), w3,
                interpret=interpret,
            )
            acc = place(acc, c, ids, out_c)
        nodes = mp_act(acc * inv_col) + nodes

    nodes = nodes[:n].astype(jnp.float32)
    return _readout(params, config, atoms, nodes)


def apply_banded_hbm_classes(
    params,
    config: ModelConfig,
    graph: Graph,
    cls_plan,                # ops.banded.BandClassPlan
    cheb,                    # ops.edgefn.EdgeCheb
    arrays=None,             # traced (ids, lo) pairs overriding the plan's
    interpret: bool = False,
) -> jnp.ndarray:
    """HBM-node-table forward with CLASS-BUCKETED band windows: tiles
    grouped by actual window need (ops/banded.band_plan_classes) so
    narrow tiles stop paying the widest tile's band — on skewed
    large-structure distributions this cuts the band's HBM footprint,
    build work and matmul FLOPs by ~1/3 (BENCHMARKS.md). Numerics match
    apply_banded(hbm_table=True). Serving's large-graph fast path.

    ``arrays``: optional tuple of per-class (ids, lo) traced arrays so a
    rebuilt same-shape plan (trajectory frames) reuses the compilation.
    """
    from ..ops.banded import build_band_poly_cls, mp_banded_hbm_cls

    atoms, nlist, edges, inv_degree = graph
    n = atoms.shape[0]
    B = cls_plan.block_rows
    compute_dtype = jnp.dtype(config.compute_dtype)
    if arrays is None:
        arrays = tuple((None, None) for _ in cls_plan.classes)

    Ms = [
        build_band_poly_cls(
            nlist, edges, cheb, c, B, cls_plan.n_padded,
            ids=ids, lo=lo, out_dtype=compute_dtype, interpret=interpret,
        )
        for c, (ids, lo) in zip(cls_plan.classes, arrays)
    ]

    pad = cls_plan.n_padded - n
    nodes = _dense(params["embed"], atoms).astype(compute_dtype)
    nodes = jnp.pad(nodes, ((0, pad), (0, 0)))
    inv_p = jnp.pad(inv_degree, ((0, pad),))
    # per-class reassembly: contiguous tile-id RUNS become static
    # dynamic_update_slice copies (in-place-able DMA; a row scatter here
    # measured ~25% of the whole forward). With traced ids overrides the
    # general scatter is used instead (shape-reuse path).
    def combine(new_nodes, c, ids, out_c):
        if ids is None:
            cid = np.asarray(c.ids)
            run_starts = np.nonzero(
                np.diff(cid, prepend=cid[0] - 2) != 1
            )[0]
            run_ends = np.append(run_starts[1:], len(cid))
            for a, b in zip(run_starts, run_ends):
                blk = jax.lax.dynamic_slice(
                    out_c, (int(a) * B, 0), (int(b - a) * B, out_c.shape[-1])
                )
                new_nodes = jax.lax.dynamic_update_slice(
                    new_nodes, blk, (int(cid[a]) * B, 0)
                )
            return new_nodes
        rows = (ids[:, None] * B + jnp.arange(B)[None, :]).reshape(-1)
        return new_nodes.at[rows].set(out_c)

    for p in params["mp"]:
        w = p["w"].astype(compute_dtype)
        new_nodes = nodes
        for c, (ids, lo), M in zip(cls_plan.classes, arrays, Ms):
            out_c = mp_banded_hbm_cls(
                M, c, B, nodes, w, inv_p, config.mp_activation,
                ids=ids, lo=lo, interpret=interpret,
            )
            new_nodes = combine(new_nodes, c, ids, out_c)
        nodes = new_nodes

    nodes = nodes[:n].astype(jnp.float32)
    return _readout(params, config, atoms, nodes)


def apply_banded_attention(
    params,
    config: ModelConfig,
    graph: Graph,
    plan: BandPlan,
    interpret: bool = False,
    differentiable: bool = False,
    training: bool = False,
    rng=None,
    cheb=None,
) -> jnp.ndarray:
    """Attention-family (AMPLayer) forward on the RCM-banded fast path.

    The AMP aggregation (reference layers.py:82-96) factors through the
    same band structure as the bilinear layer: with per-slot softmax
    weights a[i, j],

        out[i] = act( (sum_j a[i, j] * nodes[nlist[i, j]]) @ wv )

    is a banded aggregation with ONE edge channel (the attention weight)
    followed by a dense [F, F] matmul — so the existing build_band /
    mp_banded_partial kernels serve it with E=1. The [N, K]-sized logit/
    softmax stage is VPU-trivial and stays in XLA.

    Quirk parity: the reference softmax runs over ALL K neighbor slots,
    padding included — padding slots (nlist = 0, edges = 0) receive
    softmax weight and contribute a * nodes[0] @ wv. Row 0 is generally
    outside other tiles' band windows, so those contributions are pulled
    out of the band: padding weights are zeroed before the band build and
    re-added exactly as a rank-1 term c[i] * (nodes[0] @ wv), where
    c[i] = sum of row i's padding-slot weights.

    Unlike the bilinear banded path the band depends on the node features
    (the query), so build_band runs once per MP layer rather than once
    per forward. Numerics match models.gnn.apply in f32.

    ``differentiable=True`` swaps in the custom-VJP kernel wrappers so
    jax.grad flows to every trainable leaf; ``training=True`` (requires
    ``rng``) additionally applies the reference's Gaussian distance noise
    and readout dropout (reference model.py:253,266-267). ``cheb``
    (ops.edgefn.EdgeCheb) switches the edge stage to its Chebyshev
    compression — transcendental-free, the serving "fast" precision.
    """
    atoms, nlist, edges, inv_degree = graph
    n = atoms.shape[0]
    compute_dtype = jnp.dtype(config.compute_dtype)
    mp_act = get_activation(config.mp_activation)

    band_build = build_band_df if differentiable else build_band
    banded_partial = mp_banded_partial_df if differentiable else mp_banded_partial

    real = edges > 0                           # [n, K]
    # padding mask from the ORIGINAL distances, before noise
    edge_mask = real.astype(jnp.float32)[..., None]
    if training and config.noise > 0:
        if rng is None:
            raise ValueError("training=True requires rng")
        rng, nrng = jax.random.split(rng)
        edges = edges + config.noise * jax.random.normal(nrng, edges.shape, edges.dtype)
    if cheb is not None:
        from ..ops.edgefn import eval_edge_chebyshev_device

        e = eval_edge_chebyshev_device(cheb, edges) * edge_mask  # [n, K, E]
    else:
        e = _edge_features(params, config, edges, mask=edge_mask)
    pad = plan.n_padded - n
    nodes = jnp.pad(_dense(params["embed"], atoms), ((0, pad), (0, 0)))
    lo = jnp.asarray(plan.lo)

    for p in params["mp"]:
        a = attention_weights(p["wq"], p["wk"], nodes[:n], e, inv_degree)
        a_band = jnp.where(real, a, 0.0)
        c = jnp.sum(jnp.where(real, 0.0, a), axis=-1)     # [n] padding mass
        M = band_build(
            nlist, a_band[..., None], plan,
            out_dtype=compute_dtype, interpret=interpret,
        )
        acc = banded_partial(
            M, lo, nodes.astype(compute_dtype),
            p["wv"].astype(compute_dtype)[:, :, None], interpret=interpret,
        )                                                  # [n_padded, F]
        row0v = nodes[0] @ p["wv"]                         # [F]
        upd = mp_act(acc[:n] + c[:, None] * row0v[None, :])
        nodes = nodes.at[:n].add(upd)

    nodes = nodes[:n].astype(jnp.float32)
    drng = None
    if training and config.dropout:
        rng, drng = jax.random.split(rng)
    return _readout(params, config, atoms, nodes, dropout_rng=drng)


def fragment_band_plan(
    batch_size: int, pad_to: int, block_rows: int = 128
) -> BandPlan:
    """Static band plan for a FLATTENED batch of padded fragments.

    A batch of ``batch_size`` fragments padded to ``pad_to`` atoms,
    flattened to ``batch_size * pad_to`` rows with each fragment's
    neighbor indices offset by its row base, is a block-banded operator
    by construction: every tile of fragment b only references rows in
    [b * pad_to, (b + 1) * pad_to). The plan is therefore STATIC — it
    depends on (batch_size, pad_to) only, never on the topology — so one
    compiled kernel set serves every training batch with zero per-batch
    host work (no RCM reorder, no band_plan scan). The window equals the
    fragment, so the banded MP layer is pure dense MXU work per fragment
    — the TPU-native form of the reference's per-fragment training step
    (reference main.py:79-80).
    """
    if pad_to % block_rows:
        raise ValueError(f"pad_to={pad_to} must be a multiple of {block_rows}")
    tiles_per_frag = pad_to // block_rows
    lo = np.repeat(np.arange(batch_size, dtype=np.int64) * pad_to, tiles_per_frag)
    return BandPlan(
        lo=lo.astype(np.int32),
        window=pad_to,
        block_rows=block_rows,
        n_padded=batch_size * pad_to,
    )


def apply_banded_fragments(
    params,
    config: ModelConfig,
    graph: Graph,
    *,
    training: bool = False,
    rngs=None,
    plan: Optional[BandPlan] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable banded forward over a BATCH of padded fragments:
    Graph[B, N, ...] -> peaks f32[B, N]. The production-training fast
    path: same math as gnn.apply_batched (reference GNNModel forward,
    model.py:245-274) with the MP gather+einsum replaced by the banded
    Pallas kernels over the flattened batch (see fragment_band_plan).

    RNG parity: ``rngs`` is the [B] per-fragment key array exactly as
    gnn.apply_batched produces with jax.random.split(rng, B), and the
    per-fragment noise/dropout draws consume splits in the same order as
    gnn.apply — so with the same seed the two paths sample identical
    noise and dropout masks and their gradients agree to roundoff (the
    training-parity contract, tested in tests/test_trainer.py).
    """
    atoms, nlist, edges, inv_degree = graph
    B, N, K = nlist.shape
    V = atoms.shape[-1]
    if plan is None:
        plan = fragment_band_plan(B, N)
    assert plan.n_padded == B * N and plan.window == N, (plan, B, N)

    # padding mask from the ORIGINAL distances, before noise
    # (reference model.py:251 masks pre-noise; see _edge_features)
    edge_mask = (edges > 0).astype(jnp.float32)[..., None]  # [B, N, K, 1]
    drngs = None
    if training:
        if rngs is None:
            raise ValueError("training=True requires rngs (one key per fragment)")
        if config.noise > 0:
            nxt = jax.vmap(jax.random.split)(rngs)       # [B, 2, key]
            rngs, nrngs = nxt[:, 0], nxt[:, 1]
            noise = jax.vmap(
                lambda r: jax.random.normal(r, (N, K), edges.dtype)
            )(nrngs)
            edges = edges + config.noise * noise
        if config.dropout:
            nxt = jax.vmap(jax.random.split)(rngs)
            drngs = nxt[:, 1]

    flat = lambda a: a.reshape((B * N,) + a.shape[2:])
    offs = (jnp.arange(B, dtype=nlist.dtype) * N)[:, None, None]
    nlist_f = flat(nlist + offs)                         # padding slots get
    edges_f = flat(edges)                                # e == 0: harmless
    mask_f = flat(edge_mask)
    inv_f = flat(inv_degree)

    e = _edge_features(params, config, edges_f, mask=mask_f)
    M = build_band_df(nlist_f, e, plan, interpret=interpret)

    nodes = _dense(params["embed"], flat(atoms))
    for p in params["mp"]:
        nodes = mp_banded_df(
            M, plan, nodes, p["w"], inv_f, config.mp_activation,
            interpret=interpret,
        )

    nodes = nodes.reshape(B, N, -1)
    if drngs is not None:
        return jax.vmap(
            lambda a, nd, r: _readout(params, config, a, nd, dropout_rng=r)
        )(atoms, nodes, drngs)
    return _readout(params, config, atoms, nodes)


def apply_banded_trainable(
    params,
    config: ModelConfig,
    graph: Graph,
    plan: BandPlan,
    *,
    training: bool = False,
    rng=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable banded forward: Pallas kernels forward, gather-free
    XLA backward (ops/banded.py build_band_df / mp_banded_df). Matches
    models.gnn.apply numerics in f32 and jax.grad flows to every
    trainable leaf — the fast-path analogue of the reference's Keras
    autodiff through MPLayer (reference layers.py:39-40).

    ``training=True`` applies the reference's Gaussian distance noise and
    readout dropout (reference model.py:253,266-267) as XLA elementwise
    ops around the kernels.
    """
    atoms, nlist, edges, inv_degree = graph
    n = atoms.shape[0]
    # padding mask from the ORIGINAL distances, before noise
    # (reference model.py:251 masks pre-noise; see _edge_features)
    edge_mask = (edges > 0).astype(jnp.float32)[..., None]
    if training and config.noise > 0:
        if rng is None:
            raise ValueError("training=True requires rng")
        rng, nrng = jax.random.split(rng)
        edges = edges + config.noise * jax.random.normal(nrng, edges.shape, edges.dtype)

    e = _edge_features(params, config, edges, mask=edge_mask)
    M = build_band_df(nlist, e, plan, interpret=interpret)

    pad = plan.n_padded - n
    nodes = _dense(params["embed"], atoms)
    nodes = jnp.pad(nodes, ((0, pad), (0, 0)))
    inv_p = jnp.pad(inv_degree, ((0, pad),))
    for p in params["mp"]:
        nodes = mp_banded_df(
            M, plan, nodes, p["w"], inv_p, config.mp_activation,
            interpret=interpret,
        )

    nodes = nodes[:n]
    drng = None
    if training and config.dropout:
        rng, drng = jax.random.split(rng)
    return _readout(params, config, atoms, nodes, dropout_rng=drng)
