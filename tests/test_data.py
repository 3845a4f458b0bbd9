"""Data layer tests: PDB parsing, neighbor search (host vs device parity),
graph construction on the real test structures (108M.pdb: 2,482-atom
myoglobin; 7lgi.pdb.gz: 2,770 atoms x 10 MODEL frames — same fixtures as
reference tests/test_nmrgnn.py:230-257)."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from nmrgnn_tpu.data import (
    ELEMENTS,
    element_to_index,
    load_embeddings,
    load_standards,
    neighbors_device,
    neighbors_host,
    read_structure,
    structure2graph,
)

REF_TESTS = "/root/reference/tests"
PDB_108M = os.path.join(REF_TESTS, "108M.pdb")
PDB_7LGI = os.path.join(REF_TESTS, "7lgi.pdb.gz")


class TestEmbeddings:
    def test_element_positions(self):
        # C/N/H positions fixed by baseline peak standards (Appendix A)
        assert ELEMENTS.index("C") == 2
        assert ELEMENTS.index("N") == 3
        assert ELEMENTS.index("H") == 4
        assert ELEMENTS.index("X") == 0

    def test_standards(self):
        s = load_standards()
        assert s[2][1] == pytest.approx(126.0)
        assert s[3][1] == pytest.approx(118.955)
        assert s[4][1] == pytest.approx(5.63)
        assert s[0][2] == 0.0  # padding element unconfident

    def test_name_vocab(self):
        emb = load_embeddings()
        names = emb["name"]
        assert "ALA-CA" in names and "GLY-HA2" in names and "TRP-HH2" in names
        assert "MB-H" in names and "DFT-C" in names
        assert names["X-X"] == 0
        # distinct indices
        assert len(set(names.values())) == len(names)

    def test_element_to_index_unknown(self):
        assert element_to_index("SE") == 1  # maps to 'Z'
        assert element_to_index("cl") == ELEMENTS.index("CL")


class TestPDB:
    def test_read_108M(self):
        s = read_structure(PDB_108M)
        assert s.n_atoms == 2482
        assert s.n_frames == 1
        assert s.elements[0] == "N"
        assert s.resnames[0] == "MET"
        # OpenMM-cleaned structure has explicit hydrogens
        assert sum(1 for e in s.elements if e == "H") > 1000

    def test_read_7lgi_trajectory(self):
        s = read_structure(PDB_7LGI)
        assert s.n_frames == 10
        assert s.n_atoms > 2000
        # frames differ
        assert np.mean((s.coords[0] - s.coords[1]) ** 2) > 0

    def test_hetatm_ion_elements(self, tmp_path):
        """CA-the-calcium-ion must not become CA-the-alpha-carbon, and
        Zn/K/Na ions get their real elements (VERDICT r2 item 8). Without
        element columns, heme 'NA' stays nitrogen and protein 'CA' stays
        carbon."""
        lines = [
            # ATOM CA in a protein residue: alpha carbon (no elem cols)
            "ATOM      1  CA  ALA A   1      11.000  11.000  11.000",
            # HETATM monatomic ions, resname == atom name, no elem cols
            "HETATM    2 CA    CA A 101      12.000  11.000  11.000",
            "HETATM    3 ZN    ZN A 102      11.000  12.000  11.000",
            "HETATM    4  K     K A 103      12.000  12.000  11.000",
            "HETATM    5 NA    NA A 104      11.000  11.000  12.000",
            # heme nitrogen named NA: NOT sodium
            "HETATM    6  NA  HEM A 105      12.000  12.000  12.000",
            "END",
        ]
        p = tmp_path / "ions.pdb"
        p.write_text("\n".join(lines) + "\n")
        s = read_structure(str(p))
        assert s.elements == ["C", "CA", "ZN", "K", "NA", "N"]
        # metals land in the 'Z' vocabulary slot, never in C
        assert element_to_index("CA") == 1
        assert element_to_index("ZN") == 1


class TestNeighbors:
    def test_host_device_parity(self):
        rng = np.random.default_rng(0)
        coords = rng.uniform(0, 20, (300, 3)).astype(np.float32)
        hi, hd = neighbors_host(coords, 8)
        di, dd = neighbors_device(jnp.asarray(coords), 8, block=128)
        np.testing.assert_allclose(np.asarray(dd), hd, rtol=1e-4, atol=1e-4)
        # indices can differ on exact ties; compare distances and the
        # gathered coordinates instead
        np.testing.assert_allclose(
            coords[np.asarray(di)], coords[hi], rtol=1e-4, atol=1e-4
        )

    def test_small_graph_padding(self):
        coords = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        nlist, dists = neighbors_host(coords, 5)
        assert nlist.shape == (3, 5)
        # only 2 real neighbors each; rest padded with 0/0
        assert np.all(nlist[:, 2:] == 0)
        assert np.all(dists[:, 2:] == 0)

    def test_device_n_real_mask(self):
        rng = np.random.default_rng(1)
        coords = rng.uniform(0, 10, (64, 3)).astype(np.float32)
        padded = np.pad(coords, ((0, 64), (0, 0)))
        ni, nd = neighbors_device(jnp.asarray(padded), 4, n_real=jnp.int32(64), block=64)
        hi, hd = neighbors_host(coords, 4)
        np.testing.assert_allclose(np.asarray(nd)[:64], hd, rtol=1e-4, atol=1e-4)
        assert np.all(np.asarray(ni)[64:] == 0)
        assert np.all(np.asarray(nd)[64:] == 0)


class TestGraph:
    def test_structure2graph_108M(self):
        g = structure2graph(PDB_108M)
        assert g.atoms.shape == (2482, 10)
        assert g.nlist.shape == (2482, 16)
        assert g.edges.shape == (2482, 16)
        assert g.inv_degree.shape == (2482,)
        # one-hot rows
        assert np.all(np.sum(np.asarray(g.atoms), -1) == 1)
        # distances in nm: covalent bonds ~0.1 nm; nearest neighbor of a
        # bonded atom must sit in [0.08, 0.2] nm
        d1 = np.asarray(g.edges)[:, 0]
        assert 0.05 < np.median(d1) < 0.15
        # all 2482 atoms have full degree 16 in a protein (some may hit
        # the index-0 quirk); inv_degree in (0, 1]
        inv = np.asarray(g.inv_degree)
        assert np.all(inv > 0) and np.all(inv <= 1.0)
        assert np.isclose(np.median(inv), 1 / 16, atol=0.01)


def test_write_structure_records_with_shift_csv(tmp_path):
    """Whole-structure records carry real labels from a shifts array:
    atoms absent from the table (NaN) train unlabeled (label_weight 0),
    present ones carry their shift."""
    from nmrgnn_tpu.data.dataset import read_fragments
    from nmrgnn_tpu.data.fragment import name_index_for, write_structure_records
    from nmrgnn_tpu.data.pdb import read_structure

    struct = read_structure("/root/reference/tests/108M.pdb")
    n = struct.n_atoms
    shifts = np.full((1, n), np.nan, np.float32)
    shifts[0, :100] = np.linspace(1.0, 9.0, 100)
    path = str(tmp_path / "s.tfr")
    count = write_structure_records(path, struct, frames=range(1), shifts=shifts)
    assert count == 1
    (sample,) = list(read_fragments(path))
    assert sample.n == n
    name_idx = name_index_for(struct)
    labeled = sample.y[:, 2] > 0
    # only the first 100 atoms AND in-vocab names are labeled
    assert labeled[100:].sum() == 0
    assert (labeled[:100] == (name_idx[:100] > 0)).all()
    np.testing.assert_allclose(
        sample.y[:100, 0], np.linspace(1.0, 9.0, 100), rtol=1e-6
    )
    # unlabeled atoms carry zero shift, not NaN
    assert np.isfinite(sample.y[:, 0]).all()
