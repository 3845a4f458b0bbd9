"""The GNN chemical-shift model: parameter init + pure forward function.

Reimplements the reference GNNModel (reference: model.py:205-274) as a
functional JAX model over pytree params:

  edge_mask = (edges > 0)                      # model.py:251
  e = edges + noise (training only)            # model.py:253, GaussianNoise
  e = RBF(e) * edge_mask                       # model.py:254-257
  e = EdgeFC(e) * edge_mask                    # model.py:258-261
  nodes = atoms @ W_embed (no bias)            # model.py:262, built :241
  nodes = MPBlock(nodes, nlist, e, inv_deg)    # model.py:264 — mp_layers x
                                               #   (MPLayer + residual), model.py:164-168
  nodes = FCBlock(nodes)                       # model.py:265 — (fc_layers-1) x
                                               #   (Dense(F)+residual), final Dense(F//2)
                                               #   with activation, model.py:184-196
  nodes = Dropout(0.2) (training only)         # model.py:266-267
  full_peaks = nodes @ W_out + b_out           # model.py:268
  peaks = sum(full_peaks*atoms*peak_std + atoms*peak_avg, -1)   # model.py:272-273

EdgeFC block (reference model.py:110-138): Dense(hidden, act) x
(edge_fc_layers - 1) then a final *linear* Dense(edge_feature_size).

Initialization follows Keras Dense defaults (glorot_uniform kernels,
zero biases) so that from-scratch training behaves like the reference.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..graph import Graph
from ..ops.activations import get_activation
from ..ops.message_passing import amp_layer, mp_layer
from ..ops.rbf import rbf_expand

Params = Dict[str, Any]


def _glorot(rng, shape, fan_in, fan_out):
    limit = np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(rng, shape, jnp.float32, -limit, limit)


def _dense_init(rng, d_in, d_out, use_bias=True):
    p = {"kernel": _glorot(rng, (d_in, d_out), d_in, d_out)}
    if use_bias:
        p["bias"] = jnp.zeros((d_out,), jnp.float32)
    return p


def _dense(p, x, activation=None, compute_dtype=jnp.float32):
    """Dense layer. ``compute_dtype`` casts the matmul operands (bf16 on
    the TPU fast path) while accumulating in f32 on the MXU; bias add and
    activation stay f32."""
    y = jnp.matmul(
        x.astype(compute_dtype),
        p["kernel"].astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    if "bias" in p:
        y = y + p["bias"]
    return activation(y) if activation is not None else y


def init_params(
    rng: jax.Array,
    config: ModelConfig,
    peak_standards: Optional[Dict[int, tuple]] = None,
) -> Params:
    """Initialize the full parameter pytree.

    ``peak_standards`` maps element index -> (name, avg, std) exactly as
    the reference's nmrdata.load_standards() (reference: model.py:224-228):
    peak_std defaults to 1, peak_avg to 0 where no standard is given.
    """
    F = config.atom_feature_size
    E = config.edge_feature_size
    H = config.edge_hidden_size
    V = config.num_elements

    n_edge_fc = config.edge_fc_layers
    n_fc = config.fc_layers
    keys = jax.random.split(rng, 2 + n_edge_fc + config.mp_layers + n_fc)
    ki = iter(range(len(keys)))

    edge_fc = []
    d_in = H  # RBF expands distances to edge_hidden_size features
    for _ in range(n_edge_fc - 1):
        edge_fc.append(_dense_init(keys[next(ki)], d_in, H))
        d_in = H
    edge_fc.append(_dense_init(keys[next(ki)], d_in, E))

    if config.mp_type == "attention":
        mp = []
        for _ in range(config.mp_layers):
            k = jax.random.split(keys[next(ki)], 3)
            mp.append(
                {
                    "wq": _glorot(k[0], (F, E), F, E),
                    "wk": _glorot(k[1], (E, E), E, E),
                    "wv": _glorot(k[2], (F, F), F, F),
                }
            )
    else:
        # Keras glorot_uniform fan convention for rank-3 weights
        # (reference layers.py:13-18, default initializer): the leading
        # axes are a "receptive field", so for w[F, F, E]
        # fan_in = F*F, fan_out = E*F  ->  limit ~ 0.0095 at F=256, E=3.
        # (A naive fan_in=fan_out=F would start ~11x too large and badly
        # hurt from-scratch trainability.)
        mp = [
            {"w": _glorot(keys[next(ki)], (F, F, E), F * F, E * F)}
            for _ in range(config.mp_layers)
        ]

    fc = []
    for _ in range(n_fc - 1):
        fc.append(_dense_init(keys[next(ki)], F, F))
    fc.append(_dense_init(keys[next(ki)], F, F // 2))

    peak_std = np.ones((V,), np.float32)
    peak_avg = np.zeros((V,), np.float32)
    if peak_standards is not None:
        for k, v in peak_standards.items():
            if k < V:
                peak_std[k] = v[2]
                peak_avg[k] = v[1]

    return {
        "embed": _dense_init(keys[next(ki)], V, F, use_bias=False),
        "edge_fc": edge_fc,
        "mp": mp,
        "fc": fc,
        "out": _dense_init(keys[next(ki)], F // 2, V),
        "peak_std": jnp.asarray(peak_std),
        "peak_avg": jnp.asarray(peak_avg),
    }


def trainable_mask(params: Params) -> Params:
    """Pytree of bools: True for trainable leaves (peak standards are
    frozen buffers, like the reference's numpy attributes model.py:224-228)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: not any(
            getattr(p, "key", None) in ("peak_std", "peak_avg") for p in path
        ),
        params,
    )


def apply(
    params: Params,
    config: ModelConfig,
    graph: Graph,
    *,
    training: bool = False,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Forward pass for one (possibly padded) graph. Returns peaks f32[N].

    ``training=True`` enables Gaussian distance noise and dropout and
    requires ``rng`` (reference: model.py:253, 266-267).
    """
    atoms, nlist, edges, inv_degree = graph
    fc_act = get_activation(config.fc_activation)
    mp_act = get_activation(config.mp_activation)

    edge_mask = (edges > 0).astype(jnp.float32)[..., None]  # [N, K, 1]

    e = edges
    if training and config.noise > 0:
        if rng is None:
            raise ValueError("training=True requires rng")
        rng, nrng = jax.random.split(rng)
        e = e + config.noise * jax.random.normal(nrng, e.shape, e.dtype)

    compute_dtype = jnp.dtype(config.compute_dtype)

    e = rbf_expand(e, config.rbf_low, config.rbf_high, config.edge_hidden_size)
    e = e * edge_mask
    for i, p in enumerate(params["edge_fc"]):
        last = i == len(params["edge_fc"]) - 1
        e = _dense(p, e, None if last else fc_act, compute_dtype=compute_dtype)
    e = e * edge_mask  # [N, K, E]

    nodes = _dense(params["embed"], atoms)  # [N, F]

    for p in params["mp"]:
        if config.mp_type == "attention":
            upd = amp_layer(
                p["wq"], p["wk"], p["wv"], nodes, nlist, e, inv_degree, mp_act
            )
        else:
            upd = mp_layer(
                p["w"], nodes, nlist, e, inv_degree, mp_act,
                compute_dtype=compute_dtype,
            )
        nodes = upd + nodes

    for p in params["fc"][:-1]:
        nodes = _dense(p, nodes, fc_act, compute_dtype=compute_dtype) + nodes
    nodes = _dense(params["fc"][-1], nodes, fc_act, compute_dtype=compute_dtype)

    if training and config.dropout:
        rng, drng = jax.random.split(rng)
        keep = 1.0 - config.dropout_rate
        mask = jax.random.bernoulli(drng, keep, nodes.shape)
        nodes = jnp.where(mask, nodes / keep, 0.0)

    full_peaks = _dense(params["out"], nodes)  # [N, V]

    peak_std = jax.lax.stop_gradient(params["peak_std"])
    peak_avg = jax.lax.stop_gradient(params["peak_avg"])
    peaks = jnp.sum(full_peaks * atoms * peak_std + atoms * peak_avg, axis=-1)
    return peaks


def apply_batched(
    params: Params,
    config: ModelConfig,
    graph: Graph,
    *,
    training: bool = False,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """vmapped forward over a leading batch dim: Graph[B, N, ...] -> f32[B, N]."""
    if training:
        rngs = jax.random.split(rng, graph.atoms.shape[0])
        return jax.vmap(
            lambda g, r: apply(params, config, g, training=True, rng=r)
        )(graph, rngs)
    return jax.vmap(lambda g: apply(params, config, g))(graph)


def count_params(params: Params) -> int:
    leaves = [
        x
        for p, x in jax.tree_util.tree_leaves_with_path(params)
        if not any(getattr(q, "key", None) in ("peak_std", "peak_avg") for q in p)
    ]
    return sum(int(np.prod(x.shape)) for x in leaves)
