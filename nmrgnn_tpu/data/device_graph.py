"""Device-side graph construction: fragment sampling + neighbor lists
entirely on-accelerator.

The reference builds all graphs on the host CPU per frame
(nmrdata.parse_universe, reference main.py:239-240) and pre-fragments
training data offline. Here both run as jit-compiled TPU programs so the
training input pipeline and trajectory inference can keep coordinates
device-resident: distances via MXU (|x|^2+|y|^2-2xy), selection via
top_k. O(S*N) / O(S*size^2) FLOPs — cheap next to the model.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .parse import ANGSTROM_TO_NM


@partial(jax.jit, static_argnames=("fragment_size", "k"))
def fragment_device(
    coords: jnp.ndarray,        # f32[N, 3] (Angstrom)
    seed_indices: jnp.ndarray,  # i32[S]
    fragment_size: int = 256,
    k: int = 16,
):
    """Sample spatial-ball fragments around seed atoms, with in-fragment
    neighbor lists.

    Returns (members i32[S, size] original indices sorted by distance to
    seed, nlist i32[S, size, k] fragment-local indices, edges f32[S,
    size, k] distances in nm, weight f32[S, size] core/halo mask) — the
    same contract as the host fragmenter (data/fragment.py).
    """
    n = coords.shape[0]
    size = min(fragment_size, n)
    seeds = coords[seed_indices]                         # [S, 3]
    d2_seed = (
        jnp.sum(seeds**2, -1)[:, None]
        + jnp.sum(coords**2, -1)[None, :]
        - 2.0 * seeds @ coords.T
    )                                                    # [S, N]
    neg, members = jax.lax.top_k(-d2_seed, size)         # ascending distance

    frag_coords = coords[members]                        # [S, size, 3]
    # direct differences: the |x|^2+|y|^2-2xy trick loses ~1e-2 A to f32
    # cancellation at protein coordinate magnitudes; fragments are small
    # enough to afford the exact [S, size, size, 3] form
    diff = frag_coords[:, :, None, :] - frag_coords[:, None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    eye = jnp.eye(size, dtype=bool)
    d2 = jnp.where(eye[None], jnp.inf, d2)
    kk = min(k, size - 1)
    neg_n, nbr = jax.lax.top_k(-d2, kk)                  # [S, size, kk]
    dists = jnp.sqrt(jnp.maximum(-neg_n, 0.0)) * ANGSTROM_TO_NM
    if kk < k:
        pad = k - kk
        nbr = jnp.pad(nbr, ((0, 0), (0, 0), (0, pad)))
        dists = jnp.pad(dists, ((0, 0), (0, 0), (0, pad)))

    n_core = max(1, int(size * 0.5))
    weight = (jnp.arange(size) < n_core).astype(jnp.float32)
    weight = jnp.broadcast_to(weight, (seed_indices.shape[0], size))
    return members.astype(jnp.int32), nbr.astype(jnp.int32), dists, weight
