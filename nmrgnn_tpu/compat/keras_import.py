"""Import pretrained weights from the reference's Keras SavedModel
checkpoint into our parameter pytree.

The reference distributes its pretrained baseline as a TF SavedModel
(reference: nmrgnn/models/baseline/) whose trainable variables follow a
fixed naming scheme (verified against variables.index; SURVEY.md
Appendix A):

  embed_layer/kernel                      [V, F]   one-hot embedding
  variables/0..2e-1 (kernel/bias pairs)   EdgeFC: (e-1)x[H,H]+[H] then [H,E]+[E]
  variables/2e..2e+m-1                    m x MPLayer w [F,F,E]
  variables/..                            FC: (f-1)x[F,F]+[F] then [F,F/2]+[F/2]
  out_layer/kernel, out_layer/bias        [F/2, V], [V]

(each under the TF object-graph suffix ``/.ATTRIBUTES/VARIABLE_VALUE``).

Assignment is shape-driven and validated, so any hyperparameter
combination the reference can train round-trips. Peak standards are not
stored in the checkpoint (they are baked numpy constants in the
reference's graph, quirk C6) and come from load_standards().

Requires TensorFlow (only for reading; the framework itself is TF-free).
"""
from __future__ import annotations

import os
import re
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..data.embeddings import load_standards

_SUFFIX = "/.ATTRIBUTES/VARIABLE_VALUE"


def _load_tf_variables(path: str) -> Dict[str, np.ndarray]:
    try:
        import tensorflow as tf  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "importing reference checkpoints requires tensorflow "
            "(reader only); install it or convert the weights offline"
        ) from e
    import tensorflow as tf

    if os.path.isdir(path):
        for cand in (
            os.path.join(path, "variables", "variables"),
            os.path.join(path, "variables"),
        ):
            if os.path.exists(cand + ".index"):
                path = cand
                break
    reader = tf.train.load_checkpoint(path)
    out = {}
    for name in reader.get_variable_to_shape_map():
        if not name.endswith(_SUFFIX):
            continue
        short = name[: -len(_SUFFIX)]
        if short.startswith(("keras_api", "optimizer", "save_counter")):
            continue
        out[short] = reader.get_tensor(name)
    return out


def import_reference_checkpoint(
    path: str,
    config: Optional[ModelConfig] = None,
    peak_standards: Optional[dict] = None,
) -> Tuple[dict, ModelConfig]:
    """(params, config) from a reference SavedModel dir or checkpoint
    prefix. ``config`` fields are inferred from weight shapes when not
    given."""
    tv = _load_tf_variables(path)

    numbered = sorted(
        ((int(m.group(1)), tv[k]) for k in tv
         if (m := re.fullmatch(r"variables/(\d+)", k))),
        key=lambda t: t[0],
    )
    seq = [arr for _, arr in numbered]

    if "embed_layer/kernel" in tv:
        # Bundled-baseline scheme: embed/out tracked as named attributes
        # alongside the flat `variables` list (SURVEY.md Appendix A).
        embed = tv["embed_layer/kernel"]
        out_k = tv.get("out_layer/kernel")
        out_b = tv.get("out_layer/bias")
    else:
        # Legacy-Keras `model.save` scheme: everything in model.variables
        # creation order — blocks first, then out_layer (kernel, bias) and
        # embed_layer (kernel, built last; reference model.py:236-241).
        if len(seq) < 3 or seq[-1].ndim != 2 or seq[-2].ndim != 1:
            raise ValueError(
                f"{path}: not a reference GNNModel checkpoint (no "
                f"embed_layer/kernel and no trailing out/embed variables); "
                f"found {sorted(tv)[:5]}..."
            )
        embed, out_b, out_k = seq[-1], seq[-2], seq[-3]
        seq = seq[:-3]
    v_elems, f_atom = embed.shape

    # EdgeFC: leading (kernel, bias) pairs until the rank-3 MP weights
    edge_fc = []
    i = 0
    while i + 1 < len(seq) and seq[i].ndim == 2 and seq[i + 1].ndim == 1:
        edge_fc.append({"kernel": jnp.asarray(seq[i]),
                        "bias": jnp.asarray(seq[i + 1])})
        i += 2
        if seq[i - 2].shape[1] != seq[i - 2].shape[0]:
            break  # final Dense(edge_feature_size) reached
    e_feat = edge_fc[-1]["kernel"].shape[1]
    h_edge = edge_fc[0]["kernel"].shape[0]

    mp = []
    while i < len(seq) and seq[i].ndim == 3:
        w = seq[i]
        if w.shape != (f_atom, f_atom, e_feat):
            raise ValueError(f"unexpected MP weight shape {w.shape}")
        mp.append({"w": jnp.asarray(w)})
        i += 1

    fc = []
    while i + 1 < len(seq):
        fc.append({"kernel": jnp.asarray(seq[i]), "bias": jnp.asarray(seq[i + 1])})
        i += 2
    if i != len(seq):
        raise ValueError("dangling unpaired variables in checkpoint")
    if not fc or fc[-1]["kernel"].shape != (f_atom, f_atom // 2):
        raise ValueError("FC block does not end in Dense(F/2)")

    if out_k is None or out_k.shape != (f_atom // 2, v_elems):
        raise ValueError("missing or mis-shaped out_layer")

    inferred = ModelConfig(
        atom_feature_size=f_atom,
        edge_feature_size=e_feat,
        edge_hidden_size=h_edge,
        mp_layers=len(mp),
        fc_layers=len(fc),
        edge_fc_layers=len(edge_fc),
        num_elements=v_elems,
    )
    config = config or inferred
    for field in ("atom_feature_size", "edge_feature_size", "edge_hidden_size",
                  "mp_layers", "fc_layers", "edge_fc_layers", "num_elements"):
        if getattr(config, field) != getattr(inferred, field):
            raise ValueError(
                f"config.{field}={getattr(config, field)} disagrees with "
                f"checkpoint ({getattr(inferred, field)})"
            )

    standards = peak_standards if peak_standards is not None else load_standards()
    peak_std = np.ones((v_elems,), np.float32)
    peak_avg = np.zeros((v_elems,), np.float32)
    for k, v in standards.items():
        if k < v_elems:
            peak_std[k] = v[2]
            peak_avg[k] = v[1]

    params = {
        "embed": {"kernel": jnp.asarray(embed)},
        "edge_fc": edge_fc,
        "mp": mp,
        "fc": fc,
        "out": {"kernel": jnp.asarray(out_k), "bias": jnp.asarray(out_b)},
        "peak_std": jnp.asarray(peak_std),
        "peak_avg": jnp.asarray(peak_avg),
    }
    return params, config
