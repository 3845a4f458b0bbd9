"""k-nearest-neighbor list construction — host and device paths.

The reference delegates neighbor search to nmrdata.parse_universe /
MDAnalysis C extensions on the host CPU (reference: library.py:112-113,
main.py:239-240), re-running it per trajectory frame in the hot loop
(SURVEY.md §3.1). Here:

  * ``neighbors_host`` — scipy cKDTree (fast host fallback, exact)
  * ``neighbors_device`` — jit-able blocked pairwise-distance + top_k,
    so trajectory inference can build graphs on-TPU and pipeline frames
    without a host<->device round trip per frame. O(N^2/B) FLOPs but
    MXU/VPU-friendly and trivially shardable over atom blocks.

Both return (nlist i32[N,K], dists f32[N,K]) with neighbors sorted by
increasing distance, self excluded, distances in the units of ``coords``.
Slots beyond the true neighbor count (N-1 < K) are padded with index 0 /
distance 0, matching the reference's padding conventions (SURVEY.md C1).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def neighbors_host(coords: np.ndarray, k: int, use_native: bool = True):
    """Exact k-NN on host: native C++ cell list (threads) when built,
    scipy cKDTree otherwise. coords: f32[N, 3]."""
    if use_native and coords.shape[0] > k:
        from .. import native

        out = native.cell_list_knn(coords, k) if native.available() else None
        if out is not None:
            return out
    from scipy.spatial import cKDTree

    n = coords.shape[0]
    kk = min(k + 1, n)
    tree = cKDTree(coords)
    dists, idx = tree.query(coords, k=kk)
    if kk == 1:
        dists = dists[:, None]
        idx = idx[:, None]
    # drop self (first column is always self at distance 0)
    dists, idx = dists[:, 1:], idx[:, 1:]
    out_i = np.zeros((n, k), np.int32)
    out_d = np.zeros((n, k), np.float32)
    m = dists.shape[1]
    out_i[:, :m] = idx
    out_d[:, :m] = dists
    return out_i, out_d


@partial(jax.jit, static_argnames=("k", "block"))
def neighbors_device(coords: jnp.ndarray, k: int, n_real: jnp.ndarray = None, block: int = 512):
    """Blocked exact k-NN on device. coords: f32[N, 3] (N padded to a
    multiple of ``block`` is ideal but not required).

    ``n_real`` (optional scalar) masks trailing padding atoms out of the
    candidate set so padded rows never appear as neighbors.
    """
    n = coords.shape[0]
    if n_real is None:
        n_real = jnp.int32(n)
    pad = (-n) % block
    cp = jnp.pad(coords, ((0, pad), (0, 0)))
    npad = n + pad
    sq = jnp.sum(cp * cp, axis=-1)  # [Np]

    valid_col = (jnp.arange(npad) < n_real)  # [Np]

    def one_block(b):
        rows = jax.lax.dynamic_slice_in_dim(cp, b * block, block, 0)
        row_sq = jax.lax.dynamic_slice_in_dim(sq, b * block, block, 0)
        # squared distances via the MXU: |x|^2 + |y|^2 - 2 x.y
        d2 = row_sq[:, None] + sq[None, :] - 2.0 * (rows @ cp.T)
        d2 = jnp.maximum(d2, 0.0)
        row_ids = b * block + jnp.arange(block)
        self_mask = row_ids[:, None] == jnp.arange(npad)[None, :]
        bad = self_mask | ~valid_col[None, :]
        d2 = jnp.where(bad, jnp.inf, d2)
        neg, idx = jax.lax.top_k(-d2, k)  # ascending distance
        d = jnp.sqrt(jnp.maximum(-neg, 0.0))
        # pad unreachable slots (inf distance) with index 0 / distance 0
        reachable = jnp.isfinite(-neg) & (-neg < jnp.inf)
        idx = jnp.where(reachable, idx, 0).astype(jnp.int32)
        d = jnp.where(reachable, d, 0.0)
        return idx, d

    idxs, ds = jax.lax.map(one_block, jnp.arange(npad // block))
    nlist = idxs.reshape(npad, k)[:n]
    dists = ds.reshape(npad, k)[:n]
    # zero out rows of padding atoms themselves
    valid_row = (jnp.arange(n) < n_real)[:, None]
    return jnp.where(valid_row, nlist, 0), jnp.where(valid_row, dists, 0.0)
