"""Core model tests: op shapes (reference tests/test_nmrgnn.py 5-node-ring
fixtures), golden-value parity against an independent numpy implementation,
padding invariance, and parameter-count parity with the pretrained baseline
(SURVEY.md Appendix A: 1,070,477 trainable params)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nmrgnn_tpu import (
    Graph,
    ModelConfig,
    apply,
    apply_batched,
    count_params,
    init_params,
    inv_degree_from_nlist,
    pad_graph,
    ring_graph,
)
from nmrgnn_tpu.ops import amp_layer, mp_layer, rbf_expand


def rand_graph(rng, n=12, k=4, v=10, seed_edges=True):
    """Random small graph with possible duplicate neighbor indices."""
    atoms = np.zeros((n, v), np.float32)
    atoms[np.arange(n), rng.integers(0, v, n)] = 1.0
    nlist = rng.integers(0, n, (n, k)).astype(np.int32)
    edges = rng.uniform(0.01, 0.2, (n, k)).astype(np.float32)
    if seed_edges:
        edges[0, 0] = 0.0  # exercise the padding mask
    inv_degree = np.asarray(inv_degree_from_nlist(nlist))
    return Graph(
        jnp.asarray(atoms), jnp.asarray(nlist), jnp.asarray(edges), jnp.asarray(inv_degree)
    )


class TestOps:
    def test_mp_layer_ring_shape(self):
        g = ring_graph(5, 2, 16)
        e = jnp.ones((5, 2, 2))
        w = jax.random.normal(jax.random.PRNGKey(0), (16, 16, 2))
        out = mp_layer(w, g.atoms, g.nlist, e, g.inv_degree)
        assert out.shape == g.atoms.shape

    def test_amp_layer_ring_shape(self):
        g = ring_graph(5, 2, 16)
        e = jnp.ones((5, 2, 2))
        k0, k1, k2 = jax.random.split(jax.random.PRNGKey(0), 3)
        wq = jax.random.normal(k0, (16, 2))
        wk = jax.random.normal(k1, (2, 2))
        wv = jax.random.normal(k2, (16, 16))
        out = amp_layer(wq, wk, wv, g.atoms, g.nlist, e, g.inv_degree)
        assert out.shape == g.atoms.shape

    def test_rbf_golden(self):
        d = np.linspace(0.0, 0.3, 7).astype(np.float32)
        got = np.asarray(rbf_expand(jnp.asarray(d), 0.005, 0.20, 128))
        mu = np.linspace(0.005, 0.20, 128, dtype=np.float32)
        gap = mu[1] - mu[0]
        want = np.exp(-((d[:, None] - mu) ** 2) / gap)
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_mp_golden_numpy(self):
        """MP aggregation vs direct per-edge numpy loop (handles duplicate
        neighbor indices by summation, like tf.gather + einsum)."""
        rng = np.random.default_rng(0)
        n, k, f, e = 9, 3, 8, 2
        nodes = rng.normal(size=(n, f)).astype(np.float32)
        nlist = rng.integers(0, n, (n, k)).astype(np.int32)
        edges = rng.normal(size=(n, k, e)).astype(np.float32)
        inv_deg = rng.uniform(0.1, 1.0, n).astype(np.float32)
        w = rng.normal(size=(f, f, e)).astype(np.float32)

        want = np.zeros((n, f), np.float32)
        for i in range(n):
            for j in range(k):
                for nn in range(e):
                    want[i] += inv_deg[i] * edges[i, j, nn] * (
                        nodes[nlist[i, j]] @ w[:, :, nn]
                    )

        got = mp_layer(
            jnp.asarray(w), jnp.asarray(nodes), jnp.asarray(nlist),
            jnp.asarray(edges), jnp.asarray(inv_deg), activation=lambda x: x,
        )
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def numpy_forward(params, config, g):
    """Independent numpy re-derivation of the full forward pass
    (reference semantics, model.py:245-274)."""
    def softplus(x):
        return np.logaddexp(0.0, x)

    atoms = np.asarray(g.atoms, np.float64)
    nlist = np.asarray(g.nlist)
    edges = np.asarray(g.edges, np.float64)
    inv_deg = np.asarray(g.inv_degree, np.float64)

    mask = (edges > 0).astype(np.float64)[..., None]
    mu = np.linspace(config.rbf_low, config.rbf_high, config.edge_hidden_size)
    gap = mu[1] - mu[0]
    e = np.exp(-((edges[..., None] - mu) ** 2) / gap) * mask
    efc = params["edge_fc"]
    for i, p in enumerate(efc):
        e = e @ np.asarray(p["kernel"], np.float64) + np.asarray(p["bias"], np.float64)
        if i != len(efc) - 1:
            e = softplus(e)
    e = e * mask

    nodes = atoms @ np.asarray(params["embed"]["kernel"], np.float64)
    for p in params["mp"]:
        w = np.asarray(p["w"], np.float64)
        upd = np.einsum("ijn,ijl,lmn,i->im", e, nodes[nlist], w, inv_deg)
        nodes = softplus(upd) + nodes

    for p in params["fc"][:-1]:
        nodes = softplus(
            nodes @ np.asarray(p["kernel"], np.float64) + np.asarray(p["bias"], np.float64)
        ) + nodes
    p = params["fc"][-1]
    nodes = softplus(
        nodes @ np.asarray(p["kernel"], np.float64) + np.asarray(p["bias"], np.float64)
    )

    full = nodes @ np.asarray(params["out"]["kernel"], np.float64) + np.asarray(
        params["out"]["bias"], np.float64
    )
    std = np.asarray(params["peak_std"], np.float64)
    avg = np.asarray(params["peak_avg"], np.float64)
    return np.sum(full * atoms * std + atoms * avg, axis=-1)


class TestModel:
    cfg = ModelConfig(
        atom_feature_size=32,
        edge_hidden_size=16,
        num_elements=10,
        mp_layers=2,
        fc_layers=3,
        edge_fc_layers=3,
    )

    def test_param_count_baseline(self):
        params = init_params(jax.random.PRNGKey(0), ModelConfig())
        assert count_params(params) == 1_070_477

    def test_forward_shape(self):
        g = ring_graph(5, 2, 10)
        params = init_params(jax.random.PRNGKey(0), self.cfg)
        peaks = apply(params, self.cfg, g)
        assert peaks.shape == (5,)

    def test_forward_golden_numpy(self):
        rng = np.random.default_rng(1)
        g = rand_graph(rng)
        standards = {2: ("C", 126.0, 10.6), 3: ("N", 118.9, 50.9), 4: ("H", 5.63, 6.04)}
        params = init_params(jax.random.PRNGKey(3), self.cfg, standards)
        got = np.asarray(apply(params, self.cfg, g))
        want = numpy_forward(params, self.cfg, g)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_padding_invariance(self):
        rng = np.random.default_rng(2)
        g = rand_graph(rng, n=10)
        params = init_params(jax.random.PRNGKey(0), self.cfg)
        base = np.asarray(apply(params, self.cfg, g))
        padded = pad_graph(g, 32)
        got = np.asarray(apply(params, self.cfg, padded))
        np.testing.assert_allclose(got[:10], base, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(got[10:], 0.0, atol=1e-6)

    def test_batched_matches_single(self):
        rng = np.random.default_rng(3)
        graphs = [pad_graph(rand_graph(rng, n=8 + i), 16) for i in range(3)]
        batch = Graph(*[jnp.stack([getattr(g, f) for g in graphs]) for f in Graph._fields])
        params = init_params(jax.random.PRNGKey(0), self.cfg)
        got = np.asarray(apply_batched(params, self.cfg, batch))
        for i, g in enumerate(graphs):
            np.testing.assert_allclose(
                got[i], np.asarray(apply(params, self.cfg, g)), rtol=1e-5, atol=1e-5
            )

    def test_training_stochastic(self):
        g = ring_graph(5, 2, 10)
        params = init_params(jax.random.PRNGKey(0), self.cfg)
        r1 = apply(params, self.cfg, g, training=True, rng=jax.random.PRNGKey(1))
        r2 = apply(params, self.cfg, g, training=True, rng=jax.random.PRNGKey(2))
        assert not np.allclose(np.asarray(r1), np.asarray(r2))
        # eval mode is deterministic
        e1 = apply(params, self.cfg, g)
        e2 = apply(params, self.cfg, g)
        np.testing.assert_allclose(np.asarray(e1), np.asarray(e2))

    def test_jit_compiles(self):
        g = ring_graph(5, 2, 10)
        params = init_params(jax.random.PRNGKey(0), self.cfg)
        f = jax.jit(lambda p, gr: apply(p, self.cfg, gr))
        np.testing.assert_allclose(
            np.asarray(f(params, g)), np.asarray(apply(params, self.cfg, g)),
            rtol=1e-5, atol=1e-5,
        )

    def test_attention_model_family(self):
        """AMP variant (reference layers.py:48-100, unused there) trains
        and runs as a first-class model family here."""
        cfg = self.cfg.replace(mp_type="attention")
        g = ring_graph(5, 2, 10)
        params = init_params(jax.random.PRNGKey(0), cfg)
        assert "wq" in params["mp"][0] and "wv" in params["mp"][0]
        peaks = apply(params, cfg, g)
        assert peaks.shape == (5,)
        # differentiable end-to-end
        grads = jax.grad(lambda p: jnp.sum(apply(p, cfg, g) ** 2))(params)
        gq = np.asarray(grads["mp"][0]["wq"])
        assert np.isfinite(gq).all() and np.abs(gq).sum() > 0

    def test_isolated_atom_zero_message(self):
        """inv_degree==0 (divide_no_nan semantics, quirk C2): isolated atoms
        receive zero messages but still get embeddings/readout."""
        atoms = np.zeros((4, 10), np.float32)
        atoms[np.arange(4), [2, 3, 4, 2]] = 1.0
        nlist = np.zeros((4, 3), np.int32)  # all index-0 => degree 0
        edges = np.zeros((4, 3), np.float32)
        inv_degree = np.asarray(inv_degree_from_nlist(jnp.asarray(nlist)))
        assert np.all(inv_degree == 0)
        g = Graph(jnp.asarray(atoms), jnp.asarray(nlist), jnp.asarray(edges), jnp.asarray(inv_degree))
        params = init_params(jax.random.PRNGKey(0), self.cfg)
        peaks = apply(params, self.cfg, g)
        assert np.all(np.isfinite(np.asarray(peaks)))


def test_apply_bf16_close_to_f32():
    """compute_dtype='bfloat16' applies to edge_fc/MP/fc matmuls (f32
    accumulation); outputs must stay tightly correlated with f32
    (ADVICE r1: the bf16 apply path was untested)."""
    from nmrgnn_tpu.data.embeddings import load_standards

    cfg = ModelConfig(dropout=False, noise=0.0)
    params = init_params(jax.random.PRNGKey(0), cfg, load_standards())
    g = rand_graph(np.random.default_rng(3), n=64, k=16, v=10)
    f32 = np.asarray(apply(params, cfg, g))
    b16 = np.asarray(apply(params, cfg.replace(compute_dtype="bfloat16"), g))
    assert np.corrcoef(f32, b16)[0, 1] > 0.99999
    np.testing.assert_allclose(b16, f32, rtol=0.05, atol=0.5)
