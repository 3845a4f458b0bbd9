"""Block-sparse MP correctness: the block-sparse path (XLA reference and
Pallas-interpret kernel) must reproduce the gather-based MP layer exactly
on real protein graphs and on adversarial random graphs (duplicate
neighbors, padding edges, index-0 neighbors)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nmrgnn_tpu.data.parse import structure2graph
from nmrgnn_tpu.graph import inv_degree_from_nlist
from nmrgnn_tpu.ops.blocksparse import (
    block_structure,
    build_block_adjacency,
    mp_blocksparse,
    mp_blocksparse_xla,
)
from nmrgnn_tpu.ops.message_passing import mp_layer

PDB_108M = "/root/reference/tests/108M.pdb"


def reference_mp(nodes, nlist, edge_feats, inv_deg, w, n_pad):
    """Gather-path MP + residual, padded to n_pad rows."""
    out = mp_layer(w, nodes, nlist, edge_feats, inv_deg) + nodes
    return np.asarray(out)


def make_case(n=300, k=7, f=128, e=3, seed=0, block=128):
    rng = np.random.default_rng(seed)
    nlist = rng.integers(0, n, (n, k)).astype(np.int32)
    dists = rng.uniform(0.01, 0.2, (n, k)).astype(np.float32)
    dists[rng.uniform(size=(n, k)) < 0.2] = 0.0  # padding slots
    efeat = rng.normal(size=(n, k, e)).astype(np.float32)
    efeat *= (dists > 0)[..., None]
    nodes = rng.normal(size=(n, f)).astype(np.float32)
    w = (rng.normal(size=(f, f, e)) / np.sqrt(f)).astype(np.float32)
    inv = np.asarray(inv_degree_from_nlist(jnp.asarray(nlist)))
    return nlist, dists, efeat, nodes, w, inv


@pytest.mark.parametrize("seed,n,k", [(0, 300, 7), (1, 513, 16), (2, 128, 3)])
def test_blocksparse_xla_matches_gather(seed, n, k):
    nlist, dists, efeat, nodes, w, inv = make_case(n=n, k=k, seed=seed)
    struct = block_structure(nlist, dists, block_size=128)
    n_pad = struct.n_padded
    pad = n_pad - n
    nodes_p = np.pad(nodes, ((0, pad), (0, 0)))
    inv_p = np.pad(inv, (0, pad))
    A = build_block_adjacency(jnp.asarray(nlist), jnp.asarray(efeat), struct)
    got = np.asarray(
        mp_blocksparse_xla(A, struct, jnp.asarray(nodes_p), jnp.asarray(w), jnp.asarray(inv_p))
    )
    want = reference_mp(
        jnp.asarray(nodes), jnp.asarray(nlist), jnp.asarray(efeat),
        jnp.asarray(inv), jnp.asarray(w), n_pad,
    )
    np.testing.assert_allclose(got[:n], want, rtol=2e-4, atol=2e-4)
    # padding rows: softplus(0) + 0 = log(2)
    np.testing.assert_allclose(got[n:], np.log(2.0), rtol=1e-5)


def test_blocksparse_pallas_interpret_matches_xla():
    nlist, dists, efeat, nodes, w, inv = make_case(n=400, k=9, seed=3)
    struct = block_structure(nlist, dists, block_size=128)
    pad = struct.n_padded - 400
    nodes_p = jnp.asarray(np.pad(nodes, ((0, pad), (0, 0))))
    inv_p = jnp.asarray(np.pad(inv, (0, pad)))
    A = build_block_adjacency(jnp.asarray(nlist), jnp.asarray(efeat), struct)
    want = np.asarray(mp_blocksparse_xla(A, struct, nodes_p, jnp.asarray(w), inv_p))
    got = np.asarray(
        mp_blocksparse(A, struct, nodes_p, jnp.asarray(w), inv_p, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_blocksparse_on_108M():
    g = structure2graph(PDB_108M)
    n = g.atoms.shape[0]
    rng = np.random.default_rng(0)
    f, e = 64, 3
    efeat = rng.normal(size=(n, 16, e)).astype(np.float32)
    efeat *= (np.asarray(g.edges) > 0)[..., None]
    nodes = rng.normal(size=(n, f)).astype(np.float32)
    w = (rng.normal(size=(f, f, e)) / 8).astype(np.float32)
    struct = block_structure(np.asarray(g.nlist), np.asarray(g.edges), 128)
    # banded protein structure: ~8 active col blocks per row block
    # (160 real pairs of 400 possible, bucketed to 256)
    assert struct.n_pairs <= 256
    pad = struct.n_padded - n
    nodes_p = jnp.asarray(np.pad(nodes, ((0, pad), (0, 0))))
    inv_p = jnp.asarray(np.pad(np.asarray(g.inv_degree), (0, pad)))
    A = build_block_adjacency(jnp.asarray(g.nlist), jnp.asarray(efeat), struct)
    got = np.asarray(mp_blocksparse_xla(A, struct, nodes_p, jnp.asarray(w), inv_p))
    want = reference_mp(
        jnp.asarray(nodes), g.nlist, jnp.asarray(efeat), g.inv_degree,
        jnp.asarray(w), struct.n_padded,
    )
    np.testing.assert_allclose(got[:n], want, rtol=5e-4, atol=5e-4)


def test_pallas_adjacency_build_matches_scatter():
    nlist, dists, efeat, nodes, w, inv = make_case(n=400, k=9, seed=5)
    struct = block_structure(nlist, dists, block_size=128)
    from nmrgnn_tpu.ops.blocksparse import build_block_adjacency_pallas

    want = np.asarray(build_block_adjacency(jnp.asarray(nlist), jnp.asarray(efeat), struct))
    got = np.asarray(
        build_block_adjacency_pallas(
            jnp.asarray(nlist), jnp.asarray(efeat), struct, interpret=True
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # padding pairs must be zero even when they duplicate a real pair
    for t in range(struct.n_pairs):
        if struct.pair_valid[t] == 0:
            assert np.all(got[t] == 0)


def test_full_blocksparse_forward_matches_apply():
    """End-to-end: apply_blocksparse == models.gnn.apply on 108M."""
    import jax

    from nmrgnn_tpu import ModelConfig, apply, init_params
    from nmrgnn_tpu.graph import Graph
    from nmrgnn_tpu.models.infer import apply_blocksparse, precompute_structure

    cfg = ModelConfig(
        atom_feature_size=128, edge_hidden_size=32, mp_layers=2,
        fc_layers=2, edge_fc_layers=2, dropout=False, noise=0.0,
    )
    g = structure2graph(PDB_108M)
    g = Graph(*[jnp.asarray(a) for a in g])
    params = init_params(jax.random.PRNGKey(0), cfg)
    struct = precompute_structure(g)
    want = np.asarray(apply(params, cfg, g))
    got_xla = np.asarray(apply_blocksparse(params, cfg, g, struct, use_pallas=False))
    np.testing.assert_allclose(got_xla, want, rtol=1e-3, atol=1e-3)
    got_pl = np.asarray(
        apply_blocksparse(params, cfg, g, struct, interpret=True)
    )
    np.testing.assert_allclose(got_pl, want, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("group", [2, 4])
def test_grouped_kernel_matches(group):
    """Multi-pair grid steps must reproduce the single-pair kernel."""
    nlist, dists, efeat, nodes, w, inv = make_case(n=520, k=11, seed=8)
    struct = block_structure(nlist, dists, block_size=128, group=group)
    assert struct.n_pairs % group == 0
    # groups never span row blocks
    rows = struct.pair_rows.reshape(-1, group)
    assert np.all(rows == rows[:, :1])
    pad = struct.n_padded - 520
    nodes_p = jnp.asarray(np.pad(nodes, ((0, pad), (0, 0))))
    inv_p = jnp.asarray(np.pad(inv, (0, pad)))
    A = build_block_adjacency(jnp.asarray(nlist), jnp.asarray(efeat), struct)
    want = np.asarray(mp_blocksparse_xla(A, struct, nodes_p, jnp.asarray(w), inv_p))
    got = np.asarray(
        mp_blocksparse(A, struct, nodes_p, jnp.asarray(w), inv_p,
                       interpret=True, group=group)
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    # grouped structure must also match the gather reference end-to-end
    ref = reference_mp(
        jnp.asarray(nodes), jnp.asarray(nlist), jnp.asarray(efeat),
        jnp.asarray(inv), jnp.asarray(w), struct.n_padded,
    )
    np.testing.assert_allclose(got[:520], ref, rtol=5e-4, atol=5e-4)


def test_grouped_pallas_build_zeroes_padding():
    nlist, dists, efeat, *_ = make_case(n=300, k=7, seed=9)
    struct = block_structure(nlist, dists, block_size=128, group=4)
    from nmrgnn_tpu.ops.blocksparse import build_block_adjacency_pallas

    got = np.asarray(build_block_adjacency_pallas(
        jnp.asarray(nlist), jnp.asarray(efeat), struct, interpret=True
    ))
    want = np.asarray(build_block_adjacency(jnp.asarray(nlist), jnp.asarray(efeat), struct))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_structure_pair_bucketing():
    nlist = np.zeros((10, 2), np.int32)
    edges = np.ones((10, 2), np.float32)
    s = block_structure(nlist, edges, block_size=8)
    assert s.nb == 2
    # pairs: (0,0) real, (1,0) real (rows 8/9 -> col block 0), padded to 8
    assert s.n_pairs == 8
    # rows sorted, every row block present
    assert sorted(set(s.pair_rows.tolist())) == [0, 1]
    assert np.all(np.diff(s.pair_rows) >= 0)
