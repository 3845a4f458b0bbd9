"""RCM-banded message passing — the TPU fast path for VMEM-scale graphs.

TPU-first redesign of the reference MPLayer hot loop (reference:
layers.py:33-40) for graphs whose node table fits in VMEM (N up to ~8k
f32 / ~16k bf16 at F=256). Complements ops/blocksparse.py, which remains
the fast path for larger graphs.

Key observations (measured, see BENCHMARKS.md):

 1. The XLA gather path is bound by random row fetches — [N, K, F]
    neighbor rows re-read from HBM every MP layer (~150 us/layer at
    N=2560 vs a ~15 us compute roofline).
 2. After a reverse Cuthill-McKee reorder, all real neighbors of a
    128-row tile of 108M.pdb lie inside a 785-index window — the
    adjacency is a *band*. (The pin-atom-0 quirk handled by
    data/reorder.py must NOT be applied to the kernel-facing order;
    banding is done on the raw RCM order.)
 3. The band values depend only on the EdgeFC output, which is
    layer-invariant: build the dense band M[T, E, B, W] with
    M[t, n, b, w] = sum_k e[tB+b, k, n] * [nlist[tB+b, k] == lo_t + w]
    ONCE per forward (compare+FMA on the VPU), then every MP layer is
    pure MXU work: h_n = M_n @ nodes[lo_t : lo_t+W], out = sum_n h_n
    @ W_n, fused with inv_degree, activation and the residual add,
    with the full node table resident in VMEM and windows taken as
    dynamic slices (no gather instruction anywhere).

Numerics match the gather path exactly in f32 (same sums, reordered).
Padding conventions (SURVEY.md C1/C2) hold automatically: padding edge
slots carry e == 0 so they contribute 0 wherever their nlist points.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class BandPlan(NamedTuple):
    """Per-structure banding plan (host-computed; depends only on the
    neighbor lists, so it is shared by all MP layers of a forward and by
    trajectory frames of the same topology)."""

    lo: np.ndarray   # i32[T] window start per row tile (aligned, in-range)
    window: int      # W: window width (multiple of 128)
    block_rows: int  # B: rows per tile
    n_padded: int    # N rounded up to a multiple of B

    @property
    def num_tiles(self) -> int:
        return self.n_padded // self.block_rows


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def band_plan(
    nlist: np.ndarray,
    edges: np.ndarray,
    block_rows: int = 128,
    align: int = 128,
    w_buckets=(256, 384, 512, 768, 1024, 1536, 2048, 3072, 4096),
) -> BandPlan:
    """Compute per-tile window starts and the (bucketed) window width.

    Only real edges (distance > 0) constrain the windows. The window
    width is bucketed to limit jit specializations across frames.
    """
    nlist = np.asarray(nlist)
    edges = np.asarray(edges)
    n = nlist.shape[0]
    n_pad = _round_up(max(n, block_rows), block_rows)
    t = n_pad // block_rows
    lo = np.zeros(t, np.int64)
    need = np.zeros(t, np.int64)
    for i in range(t):
        sel = slice(i * block_rows, min((i + 1) * block_rows, n))
        real = edges[sel] > 0
        if not real.any():
            continue
        idx = nlist[sel][real]
        lo_i = (int(idx.min()) // align) * align
        lo[i] = lo_i
        need[i] = int(idx.max()) - lo_i + 1
    w = int(need.max()) if t else align
    for b in w_buckets:
        if w <= b:
            w = b
            break
    else:
        w = _round_up(w, 512)
    w = min(w, n_pad) if n_pad >= 128 else w
    w = max(w, 128)
    # keep windows inside [0, n_pad); moving lo down only grows coverage
    lo = np.minimum(lo, max(n_pad - w, 0))
    return BandPlan(
        lo=lo.astype(np.int32), window=w, block_rows=block_rows, n_padded=n_pad
    )


def plan_fits_vmem(
    plan: BandPlan,
    n_features: int,
    n_edge_channels: int = 3,
    dtype_bytes: int = 4,
    budget_bytes: int = 12 * 1024 * 1024,
) -> bool:
    """Whether the mp_banded working set (full node table + one band tile
    double-buffered + weights) fits the per-core VMEM budget."""
    nodes = plan.n_padded * n_features * dtype_bytes
    band_tile = 2 * n_edge_channels * plan.block_rows * plan.window * dtype_bytes
    w = n_edge_channels * n_features * n_features * dtype_bytes
    scratch = n_edge_channels * plan.block_rows * n_features * 4
    return nodes + band_tile + w + scratch < budget_bytes


# ---------------------------------------------------------------------------
# Band build: one compare+FMA pass per forward.


def _build_band_kernel(
    lo_ref,      # i32[T] scalar prefetch
    nlist_ref,   # i32[B, K] row tile
    e_ref,       # f32[E, B, K] row tile of EdgeFC output
    m_ref,       # out [1, E, B, W]
    *,
    n_edge_channels: int,
    neighbor_k: int,
    window: int,
    block_rows: int,
):
    t = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, window), 1) + lo_ref[t]
    for n in range(n_edge_channels):
        acc = jnp.zeros((block_rows, window), jnp.float32)
        for k in range(neighbor_k):
            mask = (nlist_ref[:, k : k + 1] == lane).astype(jnp.float32)
            acc += mask * e_ref[n, :, k : k + 1].astype(jnp.float32)
        m_ref[0, n] = acc.astype(m_ref.dtype)


def build_band(
    nlist: jnp.ndarray,       # i32[N, K]
    edge_feats: jnp.ndarray,  # f32[N, K, E] (EdgeFC output; 0 on padding)
    plan: BandPlan,
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """M f32[T, E, B, W]: dense band of the message-passing operator."""
    B, W = plan.block_rows, plan.window
    n, k = nlist.shape
    e = edge_feats.shape[-1]
    pad = plan.n_padded - n
    nlist_p = jnp.pad(nlist.astype(jnp.int32), ((0, pad), (0, 0)), constant_values=-1)
    e_t = jnp.moveaxis(jnp.pad(edge_feats, ((0, pad), (0, 0), (0, 0))), -1, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(plan.num_tiles,),
        in_specs=[
            pl.BlockSpec((B, k), lambda t, lo: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((e, B, k), lambda t, lo: (0, t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, e, B, W), lambda t, lo: (t, 0, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    kernel = functools.partial(
        _build_band_kernel,
        n_edge_channels=e,
        neighbor_k=k,
        window=W,
        block_rows=B,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.num_tiles, e, B, W), out_dtype),
        interpret=interpret,
    )(jnp.asarray(plan.lo), nlist_p, e_t)


# ---------------------------------------------------------------------------
# MP layer: band tile x node window matmuls, node table VMEM-resident.


def _mp_banded_kernel(
    lo_ref,      # i32[T] scalar prefetch
    m_ref,       # [1, E, B, W] current band tile
    nodes_ref,   # [N_pad, F] FULL node table (VMEM-resident)
    w_ref,       # [E, F, F]
    inv_ref,     # [B, 1] row-tile inv_degree
    out_ref,     # [B, F] row output tile
    *,
    n_edge_channels: int,
    window: int,
    block_rows: int,
    activation,
):
    t = pl.program_id(0)
    lo = pl.multiple_of(lo_ref[t], 128)
    win = nodes_ref[pl.ds(lo, window), :]
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for n in range(n_edge_channels):
        h = jnp.dot(m_ref[0, n], win, preferred_element_type=jnp.float32)
        acc += jnp.dot(
            h.astype(w_ref.dtype), w_ref[n], preferred_element_type=jnp.float32
        )
    acc = acc * inv_ref[...]
    res = nodes_ref[pl.ds(t * block_rows, block_rows), :]
    out_ref[...] = (activation(acc) + res.astype(jnp.float32)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("activation_name", "interpret"))
def _mp_banded_call(M, lo, nodes, w_t, inv_rows, activation_name, interpret):
    from .activations import get_activation

    T, E, B, W = M.shape
    F = nodes.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(
                (1, E, B, W), lambda t, lo: (t, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full node table
            pl.BlockSpec((E, F, F), lambda t, lo: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda t, lo: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (B, F), lambda t, lo: (t, 0), memory_space=pltpu.VMEM
        ),
    )
    kernel = functools.partial(
        _mp_banded_kernel,
        n_edge_channels=E,
        window=W,
        block_rows=B,
        activation=get_activation(activation_name),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T * B, F), nodes.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * T * E * B * W * F + 2 * T * E * B * F * F,
            bytes_accessed=M.size * M.dtype.itemsize
            + nodes.size * nodes.dtype.itemsize
            + T * B * F * 8,
            transcendentals=T * B * F,
        ),
    )(lo, M, nodes, w_t, inv_rows)


def mp_banded(
    M: jnp.ndarray,           # [T, E, B, W] from build_band
    plan: BandPlan,
    nodes: jnp.ndarray,       # [N_pad, F] (padded to plan.n_padded)
    w: jnp.ndarray,           # [F, F, E]
    inv_degree: jnp.ndarray,  # f32[N_pad]
    activation_name: str = "softplus",
    interpret: bool = False,
) -> jnp.ndarray:
    """One MP layer (activation(aggregate) + residual) via the banded
    Pallas kernel. ``nodes`` must be padded to ``plan.n_padded`` rows."""
    w_t = jnp.moveaxis(w, -1, 0).astype(nodes.dtype)  # [E, F, F]
    inv_rows = inv_degree.reshape(plan.n_padded, 1).astype(jnp.float32)
    return _mp_banded_call(
        M, jnp.asarray(plan.lo), nodes, w_t, inv_rows, activation_name, interpret
    )


def build_band_xla(
    nlist: jnp.ndarray,
    edge_feats: jnp.ndarray,
    plan: BandPlan,
) -> jnp.ndarray:
    """Pure-XLA band build (correctness oracle for the Pallas kernel)."""
    B, W, T = plan.block_rows, plan.window, plan.num_tiles
    n, k = nlist.shape
    e = edge_feats.shape[-1]
    pad = plan.n_padded - n
    nlist_p = jnp.pad(nlist.astype(jnp.int32), ((0, pad), (0, 0)), constant_values=-1)
    e_p = jnp.pad(edge_feats, ((0, pad), (0, 0), (0, 0)))
    lo = jnp.asarray(plan.lo)  # [T]
    rel = nlist_p.reshape(T, B, k) - lo[:, None, None]  # [T, B, K]
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, W), 3)
    mask = (rel[..., None] == cols).astype(edge_feats.dtype)  # [T, B, K, W]
    m = jnp.einsum("tbkw,tbke->tebw", mask, e_p.reshape(T, B, k, e))
    return m


def mp_banded_xla(
    M: jnp.ndarray,
    plan: BandPlan,
    nodes: jnp.ndarray,
    w: jnp.ndarray,
    inv_degree: jnp.ndarray,
    activation_name: str = "softplus",
) -> jnp.ndarray:
    """Pure-XLA reference of the banded MP math (CPU path / oracle)."""
    from .activations import get_activation

    act = get_activation(activation_name)
    T, E, B, W = M.shape
    F = nodes.shape[-1]
    lo = jnp.asarray(plan.lo)
    wins = jax.vmap(
        lambda l: jax.lax.dynamic_slice(nodes, (l, 0), (W, F))
    )(lo)  # [T, W, F]
    h = jnp.einsum("tebw,twf->tebf", M, wins)
    out = jnp.einsum("tebf,efm->tbm", h, jnp.moveaxis(w, -1, 0))
    out = out * inv_degree.reshape(T, B)[..., None]
    return (act(out) + nodes.reshape(T, B, F)).reshape(T * B, F)
