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
import json
import os
from typing import NamedTuple, Optional

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
    w_buckets=(256, 384, 512, 640, 768, 896, 1024, 1280, 1536, 2048, 3072, 4096),
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


def band_plan_frames(
    nlist_stack: np.ndarray,   # i32[F, N, K]
    edges_stack: np.ndarray,   # f32[F, N, K]
    block_rows: int = 128,
    align: int = 128,
    w_buckets=(256, 384, 512, 640, 768, 896, 1024, 1280, 1536, 2048, 3072, 4096),
) -> BandPlan:
    """Union band plan covering EVERY frame of a stacked trajectory batch
    (same atoms/ordering, per-frame neighbor lists) — one compiled kernel
    set serves the whole batch."""
    nlist_stack = np.asarray(nlist_stack)
    edges_stack = np.asarray(edges_stack)
    f, n, k = nlist_stack.shape
    n_pad = _round_up(max(n, block_rows), block_rows)
    t = n_pad // block_rows
    lo = np.zeros(t, np.int64)
    need = np.zeros(t, np.int64)
    for i in range(t):
        sel = slice(i * block_rows, min((i + 1) * block_rows, n))
        real = edges_stack[:, sel] > 0
        if not real.any():
            continue
        idx = nlist_stack[:, sel][real]
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
    lo = np.minimum(lo, max(n_pad - w, 0))
    return BandPlan(
        lo=lo.astype(np.int32), window=w, block_rows=block_rows, n_padded=n_pad
    )


class BandClass(NamedTuple):
    """One window-width class of row tiles (see band_plan_classes)."""

    ids: np.ndarray   # i32[Tc] global tile indices of this class
    lo: np.ndarray    # i32[Tc] window starts (pre-gathered per class)
    window: int       # Wc


class BandClassPlan(NamedTuple):
    """Tiles bucketed into <= max_classes window widths.

    A single global window (BandPlan) pays the WIDEST tile's band for
    every tile; on large RCM-ordered structures the need distribution is
    heavily skewed (44.7k supercell: 318/350 tiles fit 896 lanes but 32
    force W=1280), so bucketing cuts both the VPU build work and the
    band's HBM footprint/matmul FLOPs by the skew (~36% measured there).
    Each class runs the band kernels over just its tiles via scalar-
    prefetch tile-id indirection; per-layer outputs scatter back into
    the node table (contiguous row blocks — XLA elides the copy)."""

    classes: tuple        # of BandClass, ascending window
    block_rows: int
    n_padded: int

    @property
    def num_tiles(self) -> int:
        return self.n_padded // self.block_rows


def band_plan_classes(
    nlist: np.ndarray,
    edges: np.ndarray,
    block_rows: int = 128,
    align: int = 128,
    max_classes: int = 3,
    w_buckets=(256, 384, 512, 640, 768, 896, 1024, 1280, 1536, 2048, 3072, 4096),
) -> BandClassPlan:
    """Bucket row tiles into up to ``max_classes`` window widths chosen
    from ``w_buckets`` to (greedily) minimize total band lanes."""
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
            need[i] = 1
            continue
        idx = nlist[sel][real]
        lo_i = (int(idx.min()) // align) * align
        lo[i] = lo_i
        need[i] = int(idx.max()) - lo_i + 1

    def bucket(w):
        for b in w_buckets:
            if w <= b:
                return b
        return _round_up(int(w), 512)

    w_max = min(bucket(int(need.max())), max(n_pad, 128))
    # candidate class boundaries: bucket widths <= w_max; greedy pick of
    # the (max_classes - 1) interior boundaries minimizing sum of lanes
    cands = [b for b in w_buckets if 128 <= b < w_max]
    best = (float("inf"), [w_max])

    def lanes(bounds):
        total = 0
        for nd in need:
            for b in bounds:
                if nd <= b:
                    total += b
                    break
        return total

    import itertools

    for k in range(0, max_classes):
        for combo in itertools.combinations(cands, k):
            bounds = sorted(combo) + [w_max]
            tl = lanes(bounds)
            if tl < best[0]:
                best = (tl, bounds)
    bounds = best[1]
    classes = []
    assigned = np.full(t, -1)
    for ci, b in enumerate(bounds):
        pick = (assigned < 0) & (need <= b)
        assigned[pick] = ci
        ids = np.nonzero(pick)[0]
        if len(ids) == 0:
            continue
        lo_c = np.minimum(lo[ids], np.maximum(n_pad - b, 0))
        classes.append(
            BandClass(
                ids=ids.astype(np.int32),
                lo=lo_c.astype(np.int32),
                window=int(min(b, max(n_pad, 128))),
            )
        )
    return BandClassPlan(
        classes=tuple(classes), block_rows=block_rows, n_padded=n_pad
    )


def plan_covers(plan: BandPlan, nlist: np.ndarray, edges: np.ndarray) -> bool:
    """Whether a (new frame's) real neighbors all fall inside the plan's
    per-tile windows — the verify half of verify-and-reuse across
    trajectory frames (the plan is topology-derived; small atom motions
    rarely escape the 128-aligned windows)."""
    nlist = np.asarray(nlist)
    edges = np.asarray(edges)
    n = nlist.shape[0]
    if _round_up(max(n, plan.block_rows), plan.block_rows) != plan.n_padded:
        return False
    lo = plan.lo[(np.arange(n) // plan.block_rows)][:, None]
    rel = nlist - lo
    ok = ((rel >= 0) & (rel < plan.window)) | (edges <= 0)
    return bool(ok.all())


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


def hbm_plan_fits_vmem(
    plan: BandPlan,
    n_features: int,
    n_edge_channels: int = 3,
    dtype_bytes: int = 4,
    budget_bytes: int = 12 * 1024 * 1024,
) -> bool:
    """Whether mp_banded_hbm's PER-TILE working set fits VMEM: the node
    table stays in HBM, but each step holds double-buffered [W, F]
    windows and [B, F] residual rows (scratch), the double-buffered
    [E, B, W] band tile (Mosaic input pipeline), the [E, F, F] weights
    and the [B, F] output tile. Replaces the old _HBM_MAX_WINDOW = 4096
    constant, which was only valid for bf16 at F = 256 (f32 at the same
    shapes busts the budget near W ~ 2.2k — unsafe in the wrong
    direction for wider configs)."""
    B, W = plan.block_rows, plan.window
    F, E, b = n_features, n_edge_channels, dtype_bytes
    win = 2 * W * F * b
    res = 2 * B * F * b
    band = 2 * E * B * W * b
    weights = E * F * F * b
    out = 2 * B * F * b
    return win + res + band + weights + out < budget_bytes


def fused_build_fits(
    plan: BandPlan,
    edge_hidden: int,
    n_edge_channels: int = 3,
    neighbor_k: int = 16,
    out_bytes: int = 4,
    budget_bytes: int = 15 * 1024 * 1024,
) -> bool:
    """Whether the fused edge+band kernel's scoped VMEM (per-slot MLP
    activations, f32 band accumulators, double-buffered output tile)
    fits the 16 MB scoped limit (with margin) — the cheap ESTIMATE
    (see fused_build_ok for the compile-probe-verified hybrid gate).

    Calibrated against MEASURED v5e scoped allocations of this kernel at
    B=128, E=3, f32 out: W=896 -> 11.4 MB (runs), W=1280 -> 17.08 MB
    (scoped OOM), W=1536 -> 20.9 MB (scoped OOM). Those three points fit
    scoped ~ 3.24 * (accumulators + double-buffered output) - 2 MB
    exactly — Mosaic's pipelining/concat temporaries are ~3.2x the naive
    sum, not the 2x the previous gate assumed, which let the 7lgi-class
    W=1280 band through and crashed exact-precision TPU serving."""
    B, W = plan.block_rows, plan.window
    x = B * neighbor_k * edge_hidden * 4
    accs = n_edge_channels * B * W * 4
    out2 = 2 * n_edge_channels * B * W * out_bytes
    est = 3.24 * (accs + out2) - 2 * 1024 * 1024 + x
    return est < budget_bytes


_PROBE_CACHE_PATH = os.path.join(
    os.path.expanduser("~"), ".cache", "nmrgnn_tpu", "vmem_probe.json"
)
_probe_cache: dict = {}


def _probe_cache_load() -> dict:
    if not _probe_cache:
        try:
            with open(_PROBE_CACHE_PATH) as f:
                _probe_cache.update(json.load(f))
        except (OSError, ValueError):
            pass
    return _probe_cache


def _probe_cache_store(key: str, value: bool) -> None:
    _probe_cache[key] = value
    try:
        os.makedirs(os.path.dirname(_PROBE_CACHE_PATH), exist_ok=True)
        with open(_PROBE_CACHE_PATH, "w") as f:
            json.dump(_probe_cache, f)
    except OSError:
        pass  # cache is an optimization only


def fused_build_compiles(
    block_rows: int,
    window: int,
    edge_hidden: int,
    n_edge_channels: int = 3,
    neighbor_k: int = 16,
    out_bytes: int = 4,
    edge_fc_layers: int = 3,
):
    """GROUND TRUTH for the fused-build scoped-VMEM gate: AOT-compile
    the kernel at (block_rows, window) with a minimal 2-tile plan and
    report whether Mosaic's scoped allocation succeeds — scoped-VMEM
    OOM is a *compile-time* failure, so a probe compile decides
    exactly, with no hand-measured multiplier to go stale under a
    toolchain update. Results cache in-process and on disk keyed by the
    jax/jaxlib versions (a new toolchain re-probes automatically).

    Returns True/False, or None off-TPU (no Mosaic compile to consult —
    callers fall back to the fused_build_fits estimate). Scoped VMEM is
    per-grid-step, so the 2-tile probe generalizes to any tile count at
    the same (B, W, E, K, hidden) signature."""
    if jax.default_backend() != "tpu":
        return None
    import jaxlib

    # keyed by toolchain AND device generation: scoped-VMEM budgets
    # differ across TPU kinds, so a verdict must not leak between them
    key = "/".join(map(str, (
        jax.__version__, jaxlib.__version__,
        jax.devices()[0].device_kind.replace("/", "_"),
        block_rows, window,
        edge_hidden, n_edge_channels, neighbor_k, out_bytes,
        edge_fc_layers,
    )))
    cache = _probe_cache_load()
    if key in cache:
        return bool(cache[key])
    h, e_ch = edge_hidden, n_edge_channels
    params = [
        {"kernel": np.zeros((h, h), np.float32),
         "bias": np.zeros((h,), np.float32)}
        for _ in range(max(edge_fc_layers - 1, 0))
    ] + [{"kernel": np.zeros((h, e_ch), np.float32),
          "bias": np.zeros((e_ch,), np.float32)}]
    plan = BandPlan(
        lo=np.zeros(2, np.int32), window=window, block_rows=block_rows,
        n_padded=2 * block_rows,
    )
    out_dtype = jnp.float32 if out_bytes == 4 else jnp.bfloat16

    def f(nlist, edges):
        return build_band_fused(
            nlist, edges, params, plan,
            rbf_low=0.0, rbf_high=1.0, out_dtype=out_dtype,
        )
    shapes = (
        jax.ShapeDtypeStruct((2 * block_rows, neighbor_k), jnp.int32),
        jax.ShapeDtypeStruct((2 * block_rows, neighbor_k), jnp.float32),
    )
    try:
        jax.jit(f).lower(*shapes).compile()
        ok = True
    except Exception as e:  # noqa: BLE001
        msg = str(e).lower()
        if "vmem" in msg or "scoped" in msg or "smem" in msg:
            ok = False
        else:
            raise
    _probe_cache_store(key, ok)
    return ok


def fused_build_ok(
    plan: BandPlan,
    edge_hidden: int,
    n_edge_channels: int = 3,
    neighbor_k: int = 16,
    out_bytes: int = 4,
    budget_bytes: int = 15 * 1024 * 1024,
    edge_fc_layers: int = 3,
) -> bool:
    """Toolchain-robust fused-build gate (VERDICT r4 weak item 6):

    1. quick REJECT when even the raw arrays (accumulators +
       double-buffered output + activations, no Mosaic overhead at all)
       exceed the physical scoped budget — no toolchain can fit that;
    2. quick ACCEPT when the calibrated estimate sits comfortably
       under budget (< 60%) — Mosaic overhead would have to grow ~1.7x
       over the measured 3.24x before this is wrong;
    3. otherwise (the uncertainty band where a stale multiplier could
       flip the decision) consult the COMPILE PROBE — the actual Mosaic
       allocation for this (B, W) signature, cached per toolchain —
       falling back to the estimate off-TPU."""
    B, W = plan.block_rows, plan.window
    x = B * neighbor_k * edge_hidden * 4
    accs = n_edge_channels * B * W * 4
    out2 = 2 * n_edge_channels * B * W * out_bytes
    naive = accs + out2 + x
    if naive > 16 * 1024 * 1024:
        return False
    est = 3.24 * (accs + out2) - 2 * 1024 * 1024 + x
    if est < 0.6 * budget_bytes:
        return True
    probed = fused_build_compiles(
        B, W, edge_hidden, n_edge_channels, neighbor_k, out_bytes,
        edge_fc_layers,
    )
    if probed is not None:
        return probed
    return est < budget_bytes


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
    # One compare per neighbor slot, shared across the E channels (the
    # VPU compare over [B, W] dominates this kernel; E-fold sharing cuts
    # the pass count ~2.4x vs a per-(n, k) compare).
    accs = [jnp.zeros((block_rows, window), jnp.float32)
            for _ in range(n_edge_channels)]
    for k in range(neighbor_k):
        mask = (nlist_ref[:, k : k + 1] == lane).astype(jnp.float32)
        for n in range(n_edge_channels):
            accs[n] += mask * e_ref[n, :, k : k + 1].astype(jnp.float32)
    for n in range(n_edge_channels):
        m_ref[0, n] = accs[n].astype(m_ref.dtype)


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


# ---------------------------------------------------------------------------
# HBM-resident node table: the banded MP layer for graphs whose node
# table does NOT fit VMEM (the >8k-atom regime where round 2 fell back
# to the block-sparse path at only ~1.2x over gather, VERDICT r2 item 5).
#
# The node table stays in HBM; each row tile's [W, F] window and [B, F]
# residual rows are DMA'd into double-buffered VMEM scratch, with the
# copy for tile t+1 issued before tile t's compute so the DMA hides
# under the band matmuls. Sequential window reads replace the gather
# path's random row fetches; traffic per layer is T*(W+B)*F*dtype vs the
# gather's N*K*F — ~4x less at K=16, W=896, and far better-behaved.


def _mp_banded_hbm_kernel(
    lo_ref,       # i32[T] scalar prefetch
    m_ref,        # [1, E, B, W] band tile (VMEM, Mosaic-pipelined)
    nodes_ref,    # [N_pad, F] node table in HBM/ANY
    w_ref,        # [E, F, F] (VMEM)
    inv_ref,      # [B, 1] row-tile inv_degree (VMEM)
    out_ref,      # [B, F] output tile (VMEM)
    win_ref,      # scratch [2, W, F] double-buffered windows
    res_ref,      # scratch [2, B, F] double-buffered residual rows
    sem_win,      # DMA sems (2,)
    sem_res,      # DMA sems (2,)
    *,
    n_edge_channels: int,
    window: int,
    block_rows: int,
    activation,
):
    t = pl.program_id(0)
    T = pl.num_programs(0)
    slot = jax.lax.rem(t, 2)
    nxt = jax.lax.rem(t + 1, 2)

    def win_dma(i, s):
        lo = pl.multiple_of(lo_ref[i], 128)
        return pltpu.make_async_copy(
            nodes_ref.at[pl.ds(lo, window), :], win_ref.at[s], sem_win.at[s]
        )

    def res_dma(i, s):
        return pltpu.make_async_copy(
            nodes_ref.at[pl.ds(i * block_rows, block_rows), :],
            res_ref.at[s],
            sem_res.at[s],
        )

    @pl.when(t == 0)
    def _():
        win_dma(0, 0).start()
        res_dma(0, 0).start()

    @pl.when(t + 1 < T)
    def _():
        win_dma(t + 1, nxt).start()
        res_dma(t + 1, nxt).start()

    win_dma(t, slot).wait()
    res_dma(t, slot).wait()

    win = win_ref[slot]
    acc = jnp.zeros((block_rows, win.shape[-1]), jnp.float32)
    for n in range(n_edge_channels):
        h = jnp.dot(m_ref[0, n], win, preferred_element_type=jnp.float32)
        acc += jnp.dot(
            h.astype(w_ref.dtype), w_ref[n], preferred_element_type=jnp.float32
        )
    acc = acc * inv_ref[...]
    out_ref[...] = (
        activation(acc) + res_ref[slot].astype(jnp.float32)
    ).astype(out_ref.dtype)


def mp_banded_hbm(
    M: jnp.ndarray,           # [T, E, B, W] from a band build
    plan: BandPlan,
    nodes: jnp.ndarray,       # [N_pad, F] — any size; stays in HBM
    w: jnp.ndarray,           # [F, F, E]
    inv_degree: jnp.ndarray,  # f32[N_pad]
    activation_name: str = "softplus",
    interpret: bool = False,
) -> jnp.ndarray:
    """One MP layer (activation(aggregate) + residual) with the node
    table in HBM and double-buffered window DMA — numerics identical to
    mp_banded, no VMEM bound on the graph size."""
    from .activations import get_activation

    T, E, B, W = M.shape
    F = nodes.shape[-1]
    w_t = jnp.moveaxis(w, -1, 0).astype(nodes.dtype)
    inv_rows = inv_degree.reshape(plan.n_padded, 1).astype(jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, E, B, W), lambda t, lo: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # node table in HBM
            pl.BlockSpec((E, F, F), lambda t, lo: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda t, lo: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, F), lambda t, lo: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, W, F), nodes.dtype),
            pltpu.VMEM((2, B, F), nodes.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _mp_banded_hbm_kernel,
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
            + T * (W + 2 * B) * F * nodes.dtype.itemsize,
            transcendentals=T * B * F,
        ),
    )(jnp.asarray(plan.lo), M, nodes, w_t, inv_rows)


# ---------------------------------------------------------------------------
# Traced-lo / partial-sum variants for the partitioned (multi-chip) path.
#
# Inside shard_map every shard runs the SAME program, so the band plan's
# per-tile window starts must be a traced per-shard array, not baked host
# constants; and the per-layer aggregation must be split into partial
# sums (interior band + halo block) that are added BEFORE the activation
# — which also lets XLA overlap the halo all_to_all with the interior
# kernel (SURVEY.md §2.3 "halo exchange overlapped with local
# aggregation").


def build_band_tracedlo(
    nlist: jnp.ndarray,       # i32[M, K] (M multiple of block_rows)
    edge_feats: jnp.ndarray,  # f32[M, K, E]
    lo: jnp.ndarray,          # i32[T] traced window starts (T = M/B)
    window: int,
    block_rows: int = 128,
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """build_band with traced per-tile window starts. References outside
    a tile's window simply never match a lane, so out-of-window entries
    (e.g. halo slots when building the interior band) are excluded."""
    m, k = nlist.shape
    e = edge_feats.shape[-1]
    assert m % block_rows == 0, (m, block_rows)
    t = m // block_rows
    e_t = jnp.moveaxis(edge_feats, -1, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((block_rows, k), lambda i, lo: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((e, block_rows, k), lambda i, lo: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, e, block_rows, window), lambda i, lo: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    kernel = functools.partial(
        _build_band_kernel,
        n_edge_channels=e,
        neighbor_k=k,
        window=window,
        block_rows=block_rows,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, e, block_rows, window), out_dtype),
        interpret=interpret,
    )(lo.astype(jnp.int32), nlist.astype(jnp.int32), e_t)


def _mp_banded_partial_kernel(
    lo_ref,      # i32[T] scalar prefetch
    m_ref,       # [1, E, B, W]
    table_ref,   # [Nt, F] node table the windows slice (VMEM-resident)
    w_ref,       # [E, F, F]
    out_ref,     # [B, F] partial-sum tile (no inv/activation/residual)
    *,
    n_edge_channels: int,
    window: int,
):
    t = pl.program_id(0)
    lo = pl.multiple_of(lo_ref[t], 128)
    win = table_ref[pl.ds(lo, window), :]
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for n in range(n_edge_channels):
        h = jnp.dot(m_ref[0, n], win, preferred_element_type=jnp.float32)
        acc += jnp.dot(
            h.astype(w_ref.dtype), w_ref[n], preferred_element_type=jnp.float32
        )
    out_ref[...] = acc.astype(out_ref.dtype)


def mp_banded_partial(
    M: jnp.ndarray,        # [T, E, B, W]
    lo: jnp.ndarray,       # i32[T] traced
    table: jnp.ndarray,    # [Nt, F] window source (rows the band references)
    w: jnp.ndarray,        # [F, F, E]
    interpret: bool = False,
) -> jnp.ndarray:
    """Partial MP aggregation sum_n (M_n @ table_window) @ w_n -> f32[T*B, F].

    No inv_degree scaling, activation or residual — callers combine
    several partial sums (interior + halo) first. ``table`` may have any
    row count >= max(lo) + W (it is NOT required to equal T*B)."""
    T, E, B, W = M.shape
    F = table.shape[-1]
    w_t = jnp.moveaxis(w, -1, 0).astype(table.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, E, B, W), lambda t, lo: (t, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full table
            pl.BlockSpec((E, F, F), lambda t, lo: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, F), lambda t, lo: (t, 0), memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(
        _mp_banded_partial_kernel, n_edge_channels=E, window=W
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T * B, F), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * T * E * B * W * F + 2 * T * E * B * F * F,
            bytes_accessed=M.size * M.dtype.itemsize
            + table.size * table.dtype.itemsize + T * B * F * 4,
            transcendentals=0,
        ),
    )(lo.astype(jnp.int32), M, table, w_t)


def mp_banded_partial_xla(
    M: jnp.ndarray,        # [T, E, B, W]
    lo: jnp.ndarray,       # i32[T]
    table: jnp.ndarray,    # [Nt, F]
    w: jnp.ndarray,        # [F, F, E]
) -> jnp.ndarray:
    """Pure-XLA mp_banded_partial (oracle + backward form for the df
    wrapper): sum_n (M_n @ table_window) @ w_n -> f32[T*B, F]."""
    T, E, B, W = M.shape
    F = table.shape[-1]
    wins = jax.vmap(
        lambda l: jax.lax.dynamic_slice(table, (l, 0), (W, F))
    )(lo)  # [T, W, F]
    h = jnp.einsum(
        "tebw,twf->tebf", M.astype(jnp.float32), wins.astype(jnp.float32)
    )
    out = jnp.einsum(
        "tebf,efm->tbm", h, jnp.moveaxis(w, -1, 0).astype(jnp.float32)
    )
    return out.reshape(T * B, F)


def _float0_like(x):
    """Zero cotangent for integer-dtype primals (custom_vjp contract)."""
    return np.zeros(np.shape(x), dtype=jax.dtypes.float0)


def mp_banded_partial_df(
    M: jnp.ndarray,
    lo: jnp.ndarray,
    table: jnp.ndarray,
    w: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable mp_banded_partial: Pallas forward, XLA-oracle VJP
    (window slices transpose to dynamic-update scatter-adds — no [N,K,F]
    gather anywhere in the backward). ``lo`` rides as an explicit
    custom_vjp operand (float0 cotangent) rather than a closure — it is
    a traced per-shard array inside shard_map, and custom_vjp closures
    over tracers leak under jit."""

    @jax.custom_vjp
    def f(M, lo, table, w):
        return mp_banded_partial(M, lo, table, w, interpret=interpret)

    def fwd(M, lo, table, w):
        return f(M, lo, table, w), (M, lo, table, w)

    def bwd(res, g):
        M, lo, table, w = res
        _, vjp = jax.vjp(
            lambda M, table, w: mp_banded_partial_xla(M, lo, table, w),
            M, table, w,
        )
        dM, dtable, dw = vjp(g)
        return dM, _float0_like(lo), dtable, dw

    f.defvjp(fwd, bwd)
    return f(M, lo.astype(jnp.int32), table, w)


def build_band_tracedlo_df(
    nlist: jnp.ndarray,       # i32[M, K] (M multiple of block_rows)
    edge_feats: jnp.ndarray,  # f32[M, K, E] — differentiated
    lo: jnp.ndarray,          # i32[T] traced
    window: int,
    block_rows: int = 128,
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable build_band_tracedlo (grads flow to ``edge_feats``);
    backward is the same window take_along_axis as build_band_df, with
    traced window starts. ``nlist``/``lo`` are explicit custom_vjp
    operands (float0 cotangents) — inside shard_map they are tracers,
    and custom_vjp closures over tracers leak under jit."""
    m, k = nlist.shape
    t = m // block_rows

    @jax.custom_vjp
    def f(nlist, e, lo):
        return build_band_tracedlo(
            nlist, e, lo, window, block_rows,
            out_dtype=out_dtype, interpret=interpret,
        )

    def fwd(nlist, e, lo):
        return f(nlist, e, lo), (nlist, lo)

    def bwd(res, gM):
        nlist, lo = res
        e_ch = gM.shape[1]
        rows = jnp.arange(m) // block_rows
        rel = nlist - lo[rows][:, None]                     # [M, K]
        valid = (rel >= 0) & (rel < window)
        relc = jnp.clip(rel, 0, window - 1)
        gmr = jnp.moveaxis(gM.astype(jnp.float32), 1, -1)
        gmr = gmr.reshape(t * block_rows, window, e_ch)
        de = jax.vmap(lambda row, idx: row[idx])(gmr, relc)  # [M, K, E]
        return (_float0_like(nlist), jnp.where(valid[..., None], de, 0.0),
                _float0_like(lo))

    f.defvjp(fwd, bwd)
    return f(nlist.astype(jnp.int32), edge_feats, lo.astype(jnp.int32))


# ---------------------------------------------------------------------------
# Differentiable wrappers — training THROUGH the fast path (the reference
# trains through its hot op via Keras autodiff, reference layers.py:39-40;
# round 1's Pallas kernels were inference-only, VERDICT item 4).
#
# Forward = the Pallas kernels above; backward = hand-picked XLA forms
# that stay gather-free in the hot dimensions:
#   * build_band backward: de[i,k,n] = dM[tile(i), n, i%B, rel(i,k)] — a
#     take_along_axis over the window axis (output is only [N,K,E]).
#   * mp_banded backward: VJP of the banded einsum oracle (mp_banded_xla)
#     — band-form matmuls plus a window scatter-add, no [N,K,F] gather.


def build_band_df(
    nlist: jnp.ndarray,
    edge_feats: jnp.ndarray,      # f32[N, K, E] — differentiated
    plan: BandPlan,
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable build_band (grads flow to ``edge_feats``).
    ``nlist`` rides as an explicit custom_vjp operand (float0 cotangent)
    rather than a closure — it is a tracer when this runs inside
    shard_map/jit (e.g. the data-parallel banded training step), and
    custom_vjp closures over tracers leak."""
    n, k = nlist.shape
    window, block_rows = plan.window, plan.block_rows

    @jax.custom_vjp
    def f(nlist, e):
        return build_band(nlist, e, plan, out_dtype=out_dtype, interpret=interpret)

    def fwd(nlist, e):
        return f(nlist, e), (nlist,)

    def bwd(res, gM):
        (nlist,) = res
        t = plan.num_tiles
        e_ch = gM.shape[1]
        # numpy constants, NOT jnp: device constants minted in the
        # forward trace would leak into this (later) backward trace
        lo_rows = np.repeat(plan.lo.astype(np.int32), block_rows)[:n]
        rel = nlist - lo_rows[:, None]                      # [N, K]
        valid = (rel >= 0) & (rel < window)
        relc = jnp.clip(rel, 0, window - 1)
        # [T, E, B, W] -> [N, W, E]
        gmr = jnp.moveaxis(gM.astype(jnp.float32), 1, -1)
        gmr = gmr.reshape(t * block_rows, window, e_ch)[:n]
        de = jax.vmap(lambda row, idx: row[idx])(gmr, relc)  # [N, K, E]
        return (_float0_like(nlist), jnp.where(valid[..., None], de, 0.0))

    f.defvjp(fwd, bwd)
    return f(nlist.astype(jnp.int32), edge_feats)


def mp_banded_df(
    M: jnp.ndarray,
    plan: BandPlan,
    nodes: jnp.ndarray,
    w: jnp.ndarray,
    inv_degree: jnp.ndarray,
    activation_name: str = "softplus",
    interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable mp_banded (grads flow to M, nodes, w, inv_degree).
    ``inv_degree`` rides as an explicit custom_vjp operand — it is a
    tracer inside shard_map (data-parallel banded training), and
    custom_vjp closures over tracers leak under jit."""

    @jax.custom_vjp
    def f(M, nodes, w, inv_degree):
        return mp_banded(
            M, plan, nodes, w, inv_degree, activation_name, interpret=interpret
        )

    def fwd(M, nodes, w, inv_degree):
        return f(M, nodes, w, inv_degree), (M, nodes, w, inv_degree)

    def bwd(res, g):
        M, nodes, w, inv_degree = res
        _, vjp = jax.vjp(
            lambda M, nodes, w, inv: mp_banded_xla(
                M, plan, nodes.astype(jnp.float32), w, inv, activation_name
            ).astype(nodes.dtype),
            M, nodes, w, inv_degree,
        )
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f(M, nodes, w, inv_degree)


# ---------------------------------------------------------------------------
# Fused edge stage: RBF + EdgeFC MLP + band build in ONE kernel.
#
# The unfused pipeline writes the [N, K, H] RBF expansion and the
# [N, K, E] EdgeFC output through HBM (~21 MB at N=2560, H=128) before
# the band build reads them back; measured on v5e this makes the edge
# stage HBM-bound (~135 us vs a ~20 us matmul roofline). Fusing keeps
# the per-tile [B*K, H] activations in VMEM end-to-end: HBM traffic
# drops to edges-in + M-out. Replaces the reference's Keras
# RBF/EdgeFCBlock stack (reference: layers.py:102-140, model.py:110-144)
# on the serving fast path.


def _fused_edge_band_kernel(
    lo_ref,       # i32[T] scalar prefetch
    nlist_ref,    # i32[B, K] row tile
    edges_ref,    # f32[B, K] row tile of raw distances
    wh_ref,       # [max(Lh,1), H, H] hidden EdgeFC kernels (stacked)
    bh_ref,       # [max(Lh,1), 1, H] hidden biases
    wf_ref,       # [H, Ep] final kernel, zero-padded to Ep lanes
    bf_ref,       # [1, Ep] final bias
    m_ref,        # out [1, E, B, W]
    *,
    n_edge_channels: int,
    n_hidden_layers: int,
    neighbor_k: int,
    window: int,
    block_rows: int,
    rbf_low: float,
    rbf_high: float,
    rbf_count: int,
    activation,
    compute_dtype,
):
    t = pl.program_id(0)
    B, K = block_rows, neighbor_k

    d = edges_ref[...]                                   # [B, K]
    gap = (rbf_high - rbf_low) / (rbf_count - 1)
    centers = (  # Mosaic iota is integer-only; cast after
        jax.lax.broadcasted_iota(jnp.int32, (1, rbf_count), 1).astype(jnp.float32)
        * gap + rbf_low
    )
    # Mosaic cannot reshape [B, K] across lanes into [B*K, 1]; expand the
    # RBF per neighbor slot ([B, 1] x [1, H] broadcasts) and stack along
    # sublanes instead.
    masks = [
        (d[:, k : k + 1] > 0).astype(jnp.float32) for k in range(K)
    ]  # K x [B, 1]
    xs = []
    for k in range(K):
        xk = d[:, k : k + 1] - centers                   # [B, H]
        xs.append(jnp.exp(-(xk * xk) * (1.0 / gap)) * masks[k])
    x = jnp.concatenate(xs, axis=0)                      # [K*B, H]
    for l in range(n_hidden_layers):
        x = jnp.dot(
            x.astype(compute_dtype),
            wh_ref[l].astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        x = activation(x + bh_ref[l])
    e = jnp.dot(
        x.astype(compute_dtype),
        wf_ref[...].astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    e = e + bf_ref[...]                                  # [K*B, Ep]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, window), 1) + lo_ref[t]
    accs = [jnp.zeros((B, window), jnp.float32) for _ in range(n_edge_channels)]
    for k in range(K):
        m_k = (nlist_ref[:, k : k + 1] == lane).astype(jnp.float32)
        e_k = e[k * B : (k + 1) * B] * masks[k]          # [B, Ep]
        for n in range(n_edge_channels):
            accs[n] += m_k * e_k[:, n : n + 1]
    for n in range(n_edge_channels):
        m_ref[0, n] = accs[n].astype(m_ref.dtype)


def build_band_fused(
    nlist: jnp.ndarray,    # i32[N, K]
    edges: jnp.ndarray,    # f32[N, K] raw distances
    edge_fc_params,        # list of {"kernel", "bias"} (models/gnn.py layout)
    plan: BandPlan,
    *,
    rbf_low: float,
    rbf_high: float,
    activation_name: str = "softplus",
    out_dtype=jnp.float32,
    compute_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """M f32[T, E, B, W] straight from raw distances: fused RBF + EdgeFC +
    band build (see module notes). Numerics match
    rbf_expand -> edge_fc -> build_band with the same compute_dtype."""
    from .activations import get_activation

    B, W = plan.block_rows, plan.window
    n, k = nlist.shape
    hidden = edge_fc_params[:-1]
    final = edge_fc_params[-1]
    h = final["kernel"].shape[0]
    e_ch = final["kernel"].shape[1]
    ep = max(_round_up(e_ch, 128), 128)
    lh = len(hidden)

    if lh:
        wh = jnp.stack([p["kernel"] for p in hidden])            # [Lh, H, H]
        bh = jnp.stack([p["bias"].reshape(1, h) for p in hidden])
    else:  # dummy slot; kernel never reads it (n_hidden_layers == 0)
        wh = jnp.zeros((1, h, h), jnp.float32)
        bh = jnp.zeros((1, 1, h), jnp.float32)
    wf = jnp.zeros((h, ep), jnp.float32).at[:, :e_ch].set(final["kernel"])
    bf = jnp.zeros((1, ep), jnp.float32).at[:, :e_ch].set(final["bias"])

    pad = plan.n_padded - n
    nlist_p = jnp.pad(nlist.astype(jnp.int32), ((0, pad), (0, 0)), constant_values=-1)
    edges_p = jnp.pad(edges, ((0, pad), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(plan.num_tiles,),
        in_specs=[
            pl.BlockSpec((B, k), lambda t, lo: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, k), lambda t, lo: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(wh.shape, lambda t, lo: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(bh.shape, lambda t, lo: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, ep), lambda t, lo: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ep), lambda t, lo: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, e_ch, B, W), lambda t, lo: (t, 0, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    kernel = functools.partial(
        _fused_edge_band_kernel,
        n_edge_channels=e_ch,
        n_hidden_layers=lh,
        neighbor_k=k,
        window=W,
        block_rows=B,
        rbf_low=float(rbf_low),
        rbf_high=float(rbf_high),
        rbf_count=h,
        activation=get_activation(activation_name),
        compute_dtype=jnp.dtype(compute_dtype),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.num_tiles, e_ch, B, W), out_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * plan.n_padded * k * h * h * max(lh, 1)
            + plan.n_padded * k * W * 2 * (1 + e_ch),
            bytes_accessed=plan.num_tiles * e_ch * B * W
            * jnp.dtype(out_dtype).itemsize
            + plan.n_padded * k * 8,
            transcendentals=plan.n_padded * k * h * (1 + lh),
        ),
    )(jnp.asarray(plan.lo), nlist_p, edges_p, wh, bh, wf, bf)


# ---------------------------------------------------------------------------
# Polynomial edge stage: the transcendental-free serving build.
#
# The fused kernel above still pays the edge stage's ~26M exp/softplus
# evaluations (~150 us/forward on v5e — its dominant cost). Serving
# instead compresses the whole scalar edge function e(d) = EdgeFC(RBF(d))
# into Chebyshev polynomials (ops/edgefn.py; measured max error ~1e-6
# at the shipped degree-64 fit — the f32 floor) and evaluates them with an
# FMA-only recurrence on the [B, K] distance tile before the band build.


def _poly_band_kernel(
    lo_ref,       # i32[T] scalar prefetch
    nlist_ref,    # i32[B, K]
    edges_ref,    # f32[B, K] raw distances
    m_ref,        # out [1, E, B, W]
    *,
    coeffs,       # tuple of E tuples of static floats (degree+1 each)
    d_lo: float,
    d_hi: float,
    n_edge_channels: int,
    neighbor_k: int,
    window: int,
    block_rows: int,
):
    t = pl.program_id(0)
    accs = _poly_build_tile(
        nlist_ref[...], edges_ref[...], lo_ref[t],
        coeffs=coeffs, d_lo=d_lo, d_hi=d_hi,
        n_edge_channels=n_edge_channels, neighbor_k=neighbor_k,
        window=window, block_rows=block_rows,
    )
    for n in range(n_edge_channels):
        m_ref[0, n] = accs[n].astype(m_ref.dtype)


def build_band_poly(
    nlist: jnp.ndarray,    # i32[N, K]
    edges: jnp.ndarray,    # f32[N, K] raw distances
    cheb,                  # ops.edgefn.EdgeCheb
    plan: BandPlan,
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """M [T, E, B, W] from raw distances via the Chebyshev-compressed
    edge stage. Coefficients are baked as compile-time constants (fixed
    per served model; ServingModel caches the compilation)."""
    B, W = plan.block_rows, plan.window
    n, k = nlist.shape
    e_ch = cheb.coeffs.shape[1]
    coeffs = tuple(
        tuple(float(c) for c in cheb.coeffs[:, n_]) for n_ in range(e_ch)
    )
    pad = plan.n_padded - n
    nlist_p = jnp.pad(nlist.astype(jnp.int32), ((0, pad), (0, 0)), constant_values=-1)
    edges_p = jnp.pad(edges, ((0, pad), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(plan.num_tiles,),
        in_specs=[
            pl.BlockSpec((B, k), lambda t, lo: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, k), lambda t, lo: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, e_ch, B, W), lambda t, lo: (t, 0, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    kernel = functools.partial(
        _poly_band_kernel,
        coeffs=coeffs,
        d_lo=cheb.d_lo,
        d_hi=cheb.d_hi,
        n_edge_channels=e_ch,
        neighbor_k=k,
        window=W,
        block_rows=B,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.num_tiles, e_ch, B, W), out_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=plan.n_padded * k * (len(coeffs[0]) * (2 + e_ch))
            + plan.n_padded * k * W * 2 * (1 + e_ch),
            bytes_accessed=plan.num_tiles * e_ch * B * W
            * jnp.dtype(out_dtype).itemsize
            + plan.n_padded * k * 8,
            transcendentals=0,
        ),
    )(jnp.asarray(plan.lo), nlist_p, edges_p)


# ---------------------------------------------------------------------------
# Pipelined build + first MP layer: the band build is VPU-bound (~125 us
# on 108M) and the four MP layers are MXU-bound (~100 us total); run
# serially they add up (VERDICT r3 weak item 3). This kernel overlaps
# them: grid step t BUILDS band tile t (VPU, Chebyshev edge stage) into
# double-buffered scratch while MATMULING tile t-1 (MXU, layer-1 band x
# window x W-contraction) from the slot built one step earlier — the two
# have no data dependency, so Mosaic's scheduler interleaves the vector
# and matrix pipelines. Outputs the full band M (layers 2..L reuse it)
# and the layer-1 node table.


def build_band_poly_tracedlo(
    nlist: jnp.ndarray,    # i32[M, K] (M multiple of block_rows)
    edges: jnp.ndarray,    # f32[M, K] raw distances
    cheb,                  # ops.edgefn.EdgeCheb
    lo: jnp.ndarray,       # i32[T] traced window starts (T = M/B)
    window: int,
    block_rows: int = 128,
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """build_band_tracedlo's Chebyshev twin: M [T, E, B, W] straight
    from raw distances (the compressed edge stage evaluated inside the
    build kernel), with traced per-tile window starts. Out-of-window
    references never match a lane, so the partitioned forward uses it
    for both the interior band (halo refs >= m excluded) and the halo
    band (interior refs go negative after the -m shift and never
    match). Masking is internal (d > 0), matching the exact edge
    stage's edge_mask (reference model.py:229-233 padding semantics)."""
    m, k = nlist.shape
    assert m % block_rows == 0, (m, block_rows)
    t = m // block_rows
    e_ch = cheb.coeffs.shape[1]
    coeffs = tuple(
        tuple(float(c) for c in cheb.coeffs[:, n_]) for n_ in range(e_ch)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((block_rows, k), lambda i, lo: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, k), lambda i, lo: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, e_ch, block_rows, window), lambda i, lo: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    kernel = functools.partial(
        _poly_band_kernel,
        coeffs=coeffs,
        d_lo=cheb.d_lo,
        d_hi=cheb.d_hi,
        n_edge_channels=e_ch,
        neighbor_k=k,
        window=window,
        block_rows=block_rows,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, e_ch, block_rows, window), out_dtype),
        interpret=interpret,
    )(lo.astype(jnp.int32), nlist.astype(jnp.int32), edges)


def _poly_build_tile(
    nlist_blk, edges_blk, lane0,
    *, coeffs, d_lo, d_hi, n_edge_channels, neighbor_k, window, block_rows,
):
    """Chebyshev edge stage + band accumulate for one row tile (shared
    by _poly_band_kernel and the fused kernel). Returns a list of E
    [B, W] f32 accumulators."""
    B, K = block_rows, neighbor_k
    d = edges_blk
    mask = (d > 0).astype(jnp.float32)
    x = 2.0 * (jnp.clip(d, d_lo, d_hi) - d_lo) / (d_hi - d_lo) - 1.0
    tp_prev = jnp.ones_like(x)
    tp = x
    es = [jnp.full((B, K), c[0], jnp.float32) + c[1] * x for c in coeffs]
    degree = len(coeffs[0]) - 1
    for p in range(2, degree + 1):
        tp_next = 2.0 * x * tp - tp_prev
        tp_prev, tp = tp, tp_next
        for n in range(n_edge_channels):
            es[n] += coeffs[n][p] * tp
    es = [e * mask for e in es]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, window), 1) + lane0
    accs = [jnp.zeros((B, window), jnp.float32) for _ in range(n_edge_channels)]
    for k in range(K):
        # compare -> f32 mask -> per-channel FMA (5 [B, W] passes per k
        # vs 7 with the where() form)
        mk = (nlist_blk[:, k : k + 1] == lane).astype(jnp.float32)
        for n in range(n_edge_channels):
            accs[n] += mk * es[n][:, k : k + 1]
    return accs


def _poly_mp_fused_kernel(
    lo_ref,       # i32[T] scalar prefetch
    nlist_ref,    # [B, K] tile min(t, T-1)
    edges_ref,    # [B, K] tile min(t, T-1)
    nodes_ref,    # [N_pad, F] full embed table (VMEM)
    w_ref,        # [E, F, F] layer-1 weights
    inv_ref,      # [B, 1] tile max(t-1, 0)
    m_ref,        # out [1, E, B, W] tile min(t, T-1)
    out_ref,      # out [B, F] tile max(t-1, 0)
    m_scratch,    # VMEM [2, E, B, W]
    *,
    coeffs, d_lo, d_hi, n_edge_channels, neighbor_k, window, block_rows,
    activation,
):
    t = pl.program_id(0)
    T = pl.num_programs(0) - 1
    parity = jax.lax.rem(t, 2)

    # slot indices are STATIC per predicated branch: a traced slot index
    # into VMEM scratch lowers to whole-buffer selects in Mosaic
    # (measured 5x regression on the first cut of this kernel)
    def _build(slot):
        accs = _poly_build_tile(
            nlist_ref[...], edges_ref[...], lo_ref[t],
            coeffs=coeffs, d_lo=d_lo, d_hi=d_hi,
            n_edge_channels=n_edge_channels, neighbor_k=neighbor_k,
            window=window, block_rows=block_rows,
        )
        for n in range(n_edge_channels):
            m_scratch[slot, n] = accs[n]
            m_ref[0, n] = accs[n].astype(m_ref.dtype)

    def _matmul(slot):
        prev = t - 1
        lo = pl.multiple_of(lo_ref[prev], 128)
        win = nodes_ref[pl.ds(lo, window), :]
        acc = jnp.zeros((block_rows, win.shape[-1]), jnp.float32)
        for n in range(n_edge_channels):
            h = jnp.dot(
                m_scratch[slot, n].astype(win.dtype), win,
                preferred_element_type=jnp.float32,
            )
            acc += jnp.dot(
                h.astype(w_ref.dtype), w_ref[n],
                preferred_element_type=jnp.float32,
            )
        acc = acc * inv_ref[...]
        res = nodes_ref[pl.ds(prev * block_rows, block_rows), :]
        out_ref[...] = (
            activation(acc) + res.astype(jnp.float32)
        ).astype(out_ref.dtype)

    # matmul branches issue FIRST so the MXU work for tile t-1 is in
    # flight before the (VPU-heavy) build of tile t is scheduled
    @pl.when((t > 0) & (parity == 1))  # prev tile was even -> slot 0
    def _matmul0():
        _matmul(0)

    @pl.when((t > 0) & (parity == 0))
    def _matmul1():
        _matmul(1)

    @pl.when((t < T) & (parity == 0))
    def _build0():
        _build(0)

    @pl.when((t < T) & (parity == 1))
    def _build1():
        _build(1)


def mp_banded_poly_fused(
    nlist: jnp.ndarray,       # i32[N, K]
    edges: jnp.ndarray,       # f32[N, K] raw distances
    cheb,                     # ops.edgefn.EdgeCheb
    plan: BandPlan,
    nodes: jnp.ndarray,       # [N_pad, F] embedded node table
    w: jnp.ndarray,           # [F, F, E] layer-1 weights
    inv_degree: jnp.ndarray,  # f32[N_pad]
    activation_name: str = "softplus",
    out_dtype=jnp.float32,
    interpret: bool = False,
):
    """(M [T, E, B, W], nodes_1 [N_pad, F]): the Chebyshev band build
    software-pipelined with MP layer 1 — build tile t overlaps the
    matmuls of tile t-1 (see module comment above). Numerics match
    build_band_poly followed by mp_banded."""
    from .activations import get_activation

    B, W, T = plan.block_rows, plan.window, plan.num_tiles
    n, k = nlist.shape
    F = nodes.shape[-1]
    e_ch = cheb.coeffs.shape[1]
    coeffs = tuple(
        tuple(float(c) for c in cheb.coeffs[:, n_]) for n_ in range(e_ch)
    )
    pad = plan.n_padded - n
    nlist_p = jnp.pad(nlist.astype(jnp.int32), ((0, pad), (0, 0)), constant_values=-1)
    edges_p = jnp.pad(edges, ((0, pad), (0, 0)))
    w_t = jnp.moveaxis(w, -1, 0).astype(nodes.dtype)
    inv_rows = inv_degree.reshape(plan.n_padded, 1).astype(jnp.float32)

    last = T - 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T + 1,),
        in_specs=[
            pl.BlockSpec((B, k), lambda t, lo: (min_tile(t, last), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, k), lambda t, lo: (min_tile(t, last), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full node table
            pl.BlockSpec((e_ch, F, F), lambda t, lo: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda t, lo: (max_tile(t - 1, 0), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, e_ch, B, W), lambda t, lo: (min_tile(t, last), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, F), lambda t, lo: (max_tile(t - 1, 0), 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((2, e_ch, B, W), jnp.float32)],
    )
    kernel = functools.partial(
        _poly_mp_fused_kernel,
        coeffs=coeffs,
        d_lo=cheb.d_lo,
        d_hi=cheb.d_hi,
        n_edge_channels=e_ch,
        neighbor_k=k,
        window=W,
        block_rows=B,
        activation=get_activation(activation_name),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, e_ch, B, W), out_dtype),
            jax.ShapeDtypeStruct((T * B, F), nodes.dtype),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=plan.n_padded * k * (len(coeffs[0]) * (2 + e_ch))
            + plan.n_padded * k * W * 2 * (1 + e_ch)
            + 2 * T * e_ch * B * W * F + 2 * T * e_ch * B * F * F,
            bytes_accessed=T * e_ch * B * W
            * jnp.dtype(out_dtype).itemsize
            + plan.n_padded * (k * 8 + 2 * F * nodes.dtype.itemsize),
            transcendentals=T * B * F,
        ),
    )(jnp.asarray(plan.lo), nlist_p, edges_p, nodes, w_t, inv_rows)


def min_tile(a, b):
    """min for BlockSpec index maps (ints under jit tracing or python)."""
    return jnp.minimum(a, b) if hasattr(a, "dtype") else min(a, b)


def max_tile(a, b):
    return jnp.maximum(a, b) if hasattr(a, "dtype") else max(a, b)


# ---------------------------------------------------------------------------
# Class-bucketed band kernels: each call processes ONE window-width
# class's tiles via scalar-prefetch tile-id indirection (index maps read
# ids[i]); lo arrays are pre-gathered per class so kernel bodies index
# them by grid step directly. See BandClassPlan.


def class_plan_covers(
    plan: BandClassPlan, nlist: np.ndarray, edges: np.ndarray
) -> bool:
    """Whether a (new frame's) real neighbors all fall inside each
    tile's CLASS window — verify-and-reuse across trajectory frames."""
    nlist = np.asarray(nlist)
    edges = np.asarray(edges)
    n = nlist.shape[0]
    if _round_up(max(n, plan.block_rows), plan.block_rows) != plan.n_padded:
        return False
    t = plan.num_tiles
    lo_full = np.zeros(t, np.int64)
    w_full = np.zeros(t, np.int64)
    for c in plan.classes:
        lo_full[c.ids] = c.lo
        w_full[c.ids] = c.window
    rows = np.arange(n) // plan.block_rows
    rel = nlist - lo_full[rows][:, None]
    ok = ((rel >= 0) & (rel < w_full[rows][:, None])) | (edges <= 0)
    return bool(ok.all())


def build_band_poly_cls(
    nlist: jnp.ndarray,    # i32[N, K]
    edges: jnp.ndarray,    # f32[N, K] raw distances
    cheb,                  # ops.edgefn.EdgeCheb
    cls: BandClass,
    block_rows: int,
    n_padded: int,
    ids: Optional[jnp.ndarray] = None,   # traced overrides (jit reuse)
    lo: Optional[jnp.ndarray] = None,
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """M_c [Tc, E, B, Wc]: the Chebyshev band build over one class's
    tiles (cf. build_band_poly)."""
    B, W = block_rows, cls.window
    n, k = nlist.shape
    e_ch = cheb.coeffs.shape[1]
    coeffs = tuple(
        tuple(float(c) for c in cheb.coeffs[:, n_]) for n_ in range(e_ch)
    )
    pad = n_padded - n
    nlist_p = jnp.pad(nlist.astype(jnp.int32), ((0, pad), (0, 0)), constant_values=-1)
    edges_p = jnp.pad(edges, ((0, pad), (0, 0)))
    tc = len(cls.ids)

    def kernel(lo_ref, ids_ref, nlist_ref, edges_ref, m_ref):
        _poly_band_kernel(
            lo_ref, nlist_ref, edges_ref, m_ref,
            coeffs=coeffs, d_lo=cheb.d_lo, d_hi=cheb.d_hi,
            n_edge_channels=e_ch, neighbor_k=k, window=W, block_rows=B,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(tc,),
        in_specs=[
            pl.BlockSpec((B, k), lambda i, lo, ids: (ids[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, k), lambda i, lo, ids: (ids[i], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, e_ch, B, W), lambda i, lo, ids: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((tc, e_ch, B, W), out_dtype),
        interpret=interpret,
    )(
        jnp.asarray(cls.lo) if lo is None else lo.astype(jnp.int32),
        jnp.asarray(cls.ids) if ids is None else ids.astype(jnp.int32),
        nlist_p, edges_p,
    )


def _mp_banded_hbm_cls_kernel(
    lo_ref,       # i32[Tc] scalar prefetch (class window starts)
    ids_ref,      # i32[Tc] scalar prefetch (global tile ids)
    m_ref,        # [1, E, B, W] class band tile
    nodes_ref,    # [N_pad, F] node table in HBM/ANY
    w_ref,        # [E, F, F]
    inv_ref,      # [B, 1] inv_degree rows of tile ids[i]
    out_ref,      # [B, F] class-contiguous output tile
    win_ref, res_ref, sem_win, sem_res,
    *,
    n_edge_channels, window, block_rows, activation,
):
    i = pl.program_id(0)
    T = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)
    nxt = jax.lax.rem(i + 1, 2)

    def win_dma(j, s):
        lo = pl.multiple_of(lo_ref[j], 128)
        return pltpu.make_async_copy(
            nodes_ref.at[pl.ds(lo, window), :], win_ref.at[s], sem_win.at[s]
        )

    def res_dma(j, s):
        return pltpu.make_async_copy(
            nodes_ref.at[pl.ds(ids_ref[j] * block_rows, block_rows), :],
            res_ref.at[s],
            sem_res.at[s],
        )

    @pl.when(i == 0)
    def _():
        win_dma(0, 0).start()
        res_dma(0, 0).start()

    @pl.when(i + 1 < T)
    def _():
        win_dma(i + 1, nxt).start()
        res_dma(i + 1, nxt).start()

    win_dma(i, slot).wait()
    res_dma(i, slot).wait()

    win = win_ref[slot]
    acc = jnp.zeros((block_rows, win.shape[-1]), jnp.float32)
    for n in range(n_edge_channels):
        h = jnp.dot(m_ref[0, n], win, preferred_element_type=jnp.float32)
        acc += jnp.dot(
            h.astype(w_ref.dtype), w_ref[n], preferred_element_type=jnp.float32
        )
    acc = acc * inv_ref[...]
    out_ref[...] = (
        activation(acc) + res_ref[slot].astype(jnp.float32)
    ).astype(out_ref.dtype)


def mp_banded_hbm_cls(
    M: jnp.ndarray,           # [Tc, E, B, Wc] from build_band_poly_cls
    cls: BandClass,
    block_rows: int,
    nodes: jnp.ndarray,       # [N_pad, F] — stays in HBM
    w: jnp.ndarray,           # [F, F, E]
    inv_degree: jnp.ndarray,  # f32[N_pad]
    activation_name: str = "softplus",
    ids: Optional[jnp.ndarray] = None,
    lo: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """One MP layer over ONE class's tiles with the node table in HBM.
    Returns the class-contiguous rows f32-like [Tc*B, F]; the caller
    scatters them back by cls.ids (contiguous blocks)."""
    from .activations import get_activation

    Tc, E, B, W = M.shape
    F = nodes.shape[-1]
    w_t = jnp.moveaxis(w, -1, 0).astype(nodes.dtype)
    inv_rows = inv_degree.reshape(-1, 1).astype(jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Tc,),
        in_specs=[
            pl.BlockSpec((1, E, B, W), lambda i, lo, ids: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # node table in HBM
            pl.BlockSpec((E, F, F), lambda i, lo, ids: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i, lo, ids: (ids[i], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, F), lambda i, lo, ids: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, W, F), nodes.dtype),
            pltpu.VMEM((2, B, F), nodes.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _mp_banded_hbm_cls_kernel,
        n_edge_channels=E,
        window=W,
        block_rows=B,
        activation=get_activation(activation_name),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Tc * B, F), nodes.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * Tc * E * B * W * F + 2 * Tc * E * B * F * F,
            bytes_accessed=M.size * M.dtype.itemsize
            + Tc * (W + 2 * B) * F * nodes.dtype.itemsize,
            transcendentals=Tc * B * F,
        ),
    )(
        jnp.asarray(cls.lo) if lo is None else lo.astype(jnp.int32),
        jnp.asarray(cls.ids) if ids is None else ids.astype(jnp.int32),
        M, nodes, w_t, inv_rows,
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
