"""Reference-checkpoint importer tests: synthesize a TF checkpoint with
the reference's exact variable naming scheme (verified against the
bundled baseline's variables.index — SURVEY.md Appendix A), import it,
and check the resulting forward pass against the independent numpy
implementation."""
import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax.numpy as jnp

from nmrgnn_tpu import ModelConfig, apply
from nmrgnn_tpu.compat import import_reference_checkpoint
from nmrgnn_tpu.graph import Graph, inv_degree_from_nlist

from test_model import numpy_forward, rand_graph


def make_reference_style_checkpoint(tmp_path, cfg: ModelConfig, seed=0):
    """Write a TF checkpoint whose variable names mirror the reference
    SavedModel's object graph (embed_layer/kernel, variables/N,
    out_layer/{kernel,bias})."""
    rng = np.random.default_rng(seed)
    F, E, H, V = (cfg.atom_feature_size, cfg.edge_feature_size,
                  cfg.edge_hidden_size, cfg.num_elements)

    def rand(*shape):
        return tf.Variable(rng.normal(scale=0.2, size=shape).astype(np.float32))

    flat = []
    d_in = H
    for _ in range(cfg.edge_fc_layers - 1):
        flat += [rand(d_in, H), rand(H)]
        d_in = H
    flat += [rand(d_in, E), rand(E)]
    for _ in range(cfg.mp_layers):
        flat.append(rand(F, F, E))
    for _ in range(cfg.fc_layers - 1):
        flat += [rand(F, F), rand(F)]
    flat += [rand(F, F // 2), rand(F // 2)]

    ckpt = tf.train.Checkpoint(
        embed_layer=tf.train.Checkpoint(kernel=rand(V, F)),
        out_layer=tf.train.Checkpoint(kernel=rand(F // 2, V), bias=rand(V)),
        **{"variables": flat},
    )
    prefix = str(tmp_path / "variables")
    ckpt.write(prefix)
    return prefix


CFG = ModelConfig(
    atom_feature_size=32, edge_hidden_size=16, edge_feature_size=3,
    mp_layers=2, fc_layers=3, edge_fc_layers=3, num_elements=10,
    dropout=False, noise=0.0,
)


def test_import_and_forward_parity(tmp_path):
    prefix = make_reference_style_checkpoint(tmp_path, CFG)
    params, cfg = import_reference_checkpoint(prefix)
    assert cfg.atom_feature_size == 32
    assert cfg.mp_layers == 2 and cfg.edge_fc_layers == 3 and cfg.fc_layers == 3
    assert len(params["edge_fc"]) == 3 and len(params["mp"]) == 2
    # forward through imported weights matches the independent numpy model
    rng = np.random.default_rng(7)
    g = rand_graph(rng)
    got = np.asarray(apply(params, cfg, g))
    want = numpy_forward(params, cfg, g)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_import_baseline_config_shapes(tmp_path):
    cfg = ModelConfig()  # the shipped baseline architecture
    prefix = make_reference_style_checkpoint(tmp_path, cfg, seed=1)
    params, got_cfg = import_reference_checkpoint(prefix)
    from nmrgnn_tpu import count_params

    assert count_params(params) == 1_070_477
    assert got_cfg.edge_hidden_size == 128


def test_import_config_mismatch_raises(tmp_path):
    prefix = make_reference_style_checkpoint(tmp_path, CFG)
    with pytest.raises(ValueError, match="disagrees"):
        import_reference_checkpoint(prefix, config=CFG.replace(mp_layers=5))


def test_import_rejects_non_model_checkpoint(tmp_path):
    ckpt = tf.train.Checkpoint(foo=tf.Variable(np.zeros(3, np.float32)))
    prefix = str(tmp_path / "other")
    ckpt.write(prefix)
    with pytest.raises(ValueError, match="not a reference"):
        import_reference_checkpoint(prefix)


def test_cli_import_reference(tmp_path):
    """`nmrgnn-tpu import-reference <ckpt> <dir>` converts reference
    weights into a loadable native model dir (VERDICT r2 item 10)."""
    from click.testing import CliRunner

    from nmrgnn_tpu.cli import main as cli_main
    from nmrgnn_tpu.library import load_model

    prefix = make_reference_style_checkpoint(tmp_path, CFG, seed=3)
    out = str(tmp_path / "imported")
    res = CliRunner().invoke(cli_main, ["import-reference", prefix, out])
    assert res.exit_code == 0, res.output
    params, cfg = load_model(out)
    assert cfg.mp_layers == 2 and len(params["mp"]) == 2
    rng = np.random.default_rng(11)
    g = rand_graph(rng)
    got = np.asarray(apply(params, cfg, g))
    want = numpy_forward(params, cfg, g)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_baseline_index_readable():
    """The bundled reference checkpoint's index (weights blob absent in
    this mount) still yields the full shape map — guards the name scheme
    assumption."""
    vars = dict(tf.train.list_variables(
        "/root/reference/nmrgnn/models/baseline/variables/variables"
    ))
    assert vars["embed_layer/kernel/.ATTRIBUTES/VARIABLE_VALUE"] == [10, 256]
    assert vars["variables/8/.ATTRIBUTES/VARIABLE_VALUE"] == [256, 256, 3]
