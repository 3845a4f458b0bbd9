"""Load the actual reference implementation (/root/reference/nmrgnn) as a
numerical parity oracle, without importing its package ``__init__`` (which
pulls in kerastuner / nmrdata / MDAnalysis that are not installed here).

The reference modules are executed from source inside a synthetic package
(``refnmrgnn``) with ``kerastuner`` and ``nmrdata`` stubbed just enough for
module import; we never call the stubbed functions. The reference model is
instantiated directly (``GNNModel(hypers_dict, standards)`` — the hypers
object only needs ``.get``, reference model.py:205-228), run in eval mode,
and its trained/initialized weights are extracted into our parameter
pytree layout (models/gnn.py:init_params) for apples-to-apples forwards.
"""
from __future__ import annotations

import importlib.util
import sys
import types

import numpy as np

REF = "/root/reference/nmrgnn"

# The shipped baseline's hyperparameters (reference model.py:22-36 defaults).
HYPERS = dict(
    atom_feature_size=256,
    edge_feature_size=3,
    edge_hidden_size=128,
    mp_layers=4,
    fc_layers=4,
    edge_fc_layers=4,
    noise=0.025,
    dropout=True,
    rbf_low=0.005,
    rbf_high=0.20,
    mp_activation="softplus",
    fc_activation="softplus",
    learning_rate=1e-4,
)

# A small, fast configuration for op-level tests.
SMALL_HYPERS = dict(
    HYPERS,
    atom_feature_size=32,
    edge_hidden_size=16,
    mp_layers=2,
    fc_layers=3,
    edge_fc_layers=3,
)


class _HyperParameters:
    """kerastuner.HyperParameters stand-in (only constructed as a default
    argument at reference model.py:12 import time; a plain dict-like with
    Choice/Int/Fixed recorders is plenty)."""

    def __init__(self):
        self._values = {}

    def _set(self, name, default):
        self._values[name] = default
        return default

    def Choice(self, name, values, ordered=None, default=None):
        return self._set(name, values[0] if default is None else default)

    def Int(self, name, lo, hi, step=1, default=None):
        return self._set(name, lo if default is None else default)

    def Fixed(self, name, value):
        return self._set(name, value)

    def get(self, name):
        return self._values[name]


def _stub_module(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def load_reference():
    """Import reference layers/losses/metrics/model from source. Returns a
    dict of modules keyed by short name."""
    _stub_module("kerastuner", HyperParameters=_HyperParameters)
    _stub_module(
        "nmrdata",
        load_standards=lambda: {},
        load_embeddings=lambda: {"name": {}},
    )
    if "refnmrgnn" not in sys.modules:
        pkg = types.ModuleType("refnmrgnn")
        pkg.__path__ = [REF]
        sys.modules["refnmrgnn"] = pkg
    mods = {}
    for name in ("layers", "losses", "metrics", "model"):
        full = f"refnmrgnn.{name}"
        if full not in sys.modules:
            spec = importlib.util.spec_from_file_location(full, f"{REF}/{name}.py")
            mod = importlib.util.module_from_spec(spec)
            sys.modules[full] = mod
            spec.loader.exec_module(mod)
        mods[name] = sys.modules[full]
    return mods


def build_reference_model(hypers=None, standards=None, graph=None):
    """Instantiate the reference GNNModel (model.py:205-274) and, when a
    graph tuple is given, run one eval-mode forward to build its weights.
    ``standards``: {element_idx: (name, avg, std)} exactly as
    nmrdata.load_standards()."""
    mods = load_reference()
    hp = dict(HYPERS, **(hypers or {}))
    model = mods["model"].GNNModel(hp, standards or {})
    # Keras 3 rejects the reference's positional `training` arg to
    # GaussianNoise (model.py:253). Eval-mode GaussianNoise is the
    # identity, and we only compare eval forwards, so substitute it.
    model.noise_block = lambda x, training=False: x
    if model.dropout is not None:  # same positional-arg issue, model.py:267
        model.dropout = lambda x, training=False: x
    if graph is not None:
        reference_forward(model, graph)
    return model


def reference_forward(model, graph, training=False):
    """Eval-mode reference forward on our Graph tuple; returns np.f32[N]."""
    import tensorflow as tf

    atoms, nlist, edges, inv_degree = graph
    inputs = [
        tf.constant(np.asarray(atoms, np.float32)),
        tf.constant(np.asarray(nlist, np.int32)),
        tf.constant(np.asarray(edges, np.float32)),
        tf.constant(np.asarray(inv_degree, np.float32)),
    ]
    return np.asarray(model(inputs, training=training))


def _dense_params(layer):
    p = {"kernel": np.asarray(layer.kernel)}
    if getattr(layer, "use_bias", True) and layer.bias is not None:
        p["bias"] = np.asarray(layer.bias)
    return p


def extract_params(model):
    """Reference GNNModel weights -> our params pytree (models/gnn.py
    layout). The model must already be built (called once)."""
    params = {
        "embed": {"kernel": np.asarray(model.embed_layer.kernel)},
        "edge_fc": [_dense_params(l) for l in model.edge_fc_block.edge_fc],
        "mp": [{"w": np.asarray(l.w)} for l in model.mp_block.mp],
        "fc": [_dense_params(l) for l in model.fc_block.fc],
        "out": _dense_params(model.out_layer),
        "peak_std": np.asarray(model.peak_std, np.float32),
        "peak_avg": np.asarray(model.peak_avg, np.float32),
    }
    return _to_jnp(params)


def _to_jnp(tree):
    import jax
    import jax.numpy as jnp

    return jax.tree_util.tree_map(jnp.asarray, tree)


def set_params(model, params):
    """Write our params pytree into a built reference GNNModel's weights
    (the reverse of extract_params) so both sides share identical values."""
    def _assign_dense(layer, p):
        layer.kernel.assign(np.asarray(p["kernel"], np.float32))
        if "bias" in p and layer.bias is not None:
            layer.bias.assign(np.asarray(p["bias"], np.float32))

    model.embed_layer.kernel.assign(np.asarray(params["embed"]["kernel"], np.float32))
    for layer, p in zip(model.edge_fc_block.edge_fc, params["edge_fc"]):
        _assign_dense(layer, p)
    for layer, p in zip(model.mp_block.mp, params["mp"]):
        layer.w.assign(np.asarray(p["w"], np.float32))
    for layer, p in zip(model.fc_block.fc, params["fc"]):
        _assign_dense(layer, p)
    _assign_dense(model.out_layer, params["out"])
