"""Subprocess helper for test_legacy_savedmodel_import.

Run with TF_USE_LEGACY_KERAS=1 (so tf.keras is Keras 2, the lineage the
reference's TF 2.3.2 baseline was exported with): instantiate the actual
reference GNNModel, save it with the reference's own persistence path
(``model.save`` -> TF SavedModel, reference main.py:82), then read the
SavedModel back through compat/keras_import.import_reference_checkpoint
and assert the imported-params JAX forward matches the reference forward.

Exit code 0 on parity, 1 on mismatch (prints the max abs diff).
"""
import os
import sys

assert os.environ.get("TF_USE_LEGACY_KERAS") == "1", (
    "run via test_legacy_savedmodel_import (needs TF_USE_LEGACY_KERAS=1 "
    "before tensorflow is imported)"
)

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.dirname(HERE))

from _reference import SMALL_HYPERS, build_reference_model, reference_forward  # noqa: E402


def main():
    outdir = sys.argv[1]

    # The session sitecustomize pins JAX to the tunneled TPU plugin; env
    # vars alone do not undo that (see tests/conftest.py), so force the
    # CPU platform through jax.config before any computation.
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from nmrgnn_tpu import ModelConfig, apply
    from nmrgnn_tpu.compat import import_reference_checkpoint
    from nmrgnn_tpu.data.embeddings import load_standards
    from nmrgnn_tpu.graph import Graph, inv_degree_from_nlist

    rng = np.random.default_rng(0)
    n, k, v = 16, 4, 10
    atoms = np.zeros((n, v), np.float32)
    atoms[np.arange(n), rng.integers(0, v, n)] = 1.0
    nlist = rng.integers(0, n, (n, k)).astype(np.int32)
    edges = rng.uniform(0.01, 0.2, (n, k)).astype(np.float32)
    edges[0, 0] = 0.0
    inv_degree = np.asarray(inv_degree_from_nlist(nlist))
    graph = Graph(atoms, nlist, edges, inv_degree)

    standards = load_standards()
    model = build_reference_model(SMALL_HYPERS, standards, graph=graph)
    want = reference_forward(model, graph)

    # GNNModel.get_config is broken in the reference (quirk C6: it
    # references a nonexistent attribute, model.py:233). TF 2.3 swallowed
    # this during SavedModel export; modern tf_keras does not, so restore
    # the default Model.get_config to take the same traces-only path the
    # original export took.
    import tf_keras

    type(model).get_config = tf_keras.Model.get_config
    model.save(outdir)

    params, config = import_reference_checkpoint(outdir, peak_standards=standards)
    got = np.asarray(apply(params, config, Graph(*[jnp.asarray(a) for a in graph])))

    maxdiff = float(np.max(np.abs(got - want)))
    print(f"legacy SavedModel roundtrip: max|diff| = {maxdiff:.3e}")
    if not np.allclose(got, want, rtol=1e-4, atol=1e-3):
        print("FAIL: imported-weight forward diverges from reference")
        return 1
    print("OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
