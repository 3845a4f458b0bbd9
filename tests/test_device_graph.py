"""Device-side fragment sampling parity with the host fragmenter."""
import jax.numpy as jnp
import numpy as np

from nmrgnn_tpu.data.device_graph import fragment_device
from nmrgnn_tpu.data.fragment import fragment_structure
from nmrgnn_tpu.data.pdb import read_structure

PDB_108M = "/root/reference/tests/108M.pdb"


def test_fragment_device_matches_host():
    struct = read_structure(PDB_108M)
    coords = struct.coords[0]
    host_frags = list(fragment_structure(struct, fragment_size=64, stride=500))
    seeds = jnp.asarray(np.arange(0, coords.shape[0], 500), jnp.int32)
    members, nlist, edges, weight = fragment_device(
        jnp.asarray(coords), seeds, fragment_size=64, k=16
    )
    assert members.shape[0] == len(host_frags)
    for s, hf in enumerate(host_frags):
        # same atom sets (ordering may differ on distance ties)
        assert set(np.asarray(members[s]).tolist()) == set(hf["orig_index"].tolist())
        # neighbor distances agree where membership order matches
        m_dev = np.asarray(members[s])
        m_host = hf["orig_index"]
        if np.array_equal(m_dev, m_host):
            np.testing.assert_allclose(
                np.asarray(edges[s]), hf["edges"], rtol=1e-4, atol=1e-5
            )
        assert np.asarray(weight[s]).sum() == hf["weight"].sum()


def test_fragment_device_small_molecule_padding():
    coords = jnp.asarray(np.random.default_rng(0).uniform(0, 5, (10, 3)).astype(np.float32))
    members, nlist, edges, weight = fragment_device(
        coords, jnp.asarray([0], jnp.int32), fragment_size=64, k=16
    )
    # size clamped to n; k padded with 0/0
    assert members.shape == (1, 10)
    assert nlist.shape == (1, 10, 16)
    assert np.all(np.asarray(edges[0, :, 9:]) == 0)
