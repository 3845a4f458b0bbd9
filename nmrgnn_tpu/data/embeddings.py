"""Element / atom-name vocabularies and peak standards.

This module natively provides the contract the reference delegates to the
external ``nmrdata`` package (reference call sites: model.py:39,47,
library.py:111-113, main.py:215,240; contract reconstructed in SURVEY.md
Appendix B):

  * ``load_embeddings()`` -> {'atom': {element: idx}, 'name': {'<RES>-<ATOM>': idx}}
  * ``load_standards()``  -> {element_idx: (element, avg_ppm, std_ppm)}

Element order constraint: the bundled baseline model bakes per-element
de-standardization vectors with C at index 2, N at index 3, H at index 4
(SURVEY.md Appendix A: peak_avg = [0,0,126.0,118.955,5.63,0,...]); our
canonical 10-element vocabulary honors those positions. Index 0 is the
padding element "X" (the ``nlist > 0`` / ``edges > 0`` padding conventions
depend on slot 0 being inert).

The atom-name vocabulary covers the standard PDBv3 atom names of the 20
amino acids plus 'MB-*'/'DFT-*' classes for organic small-molecule data
(regex-matched by metrics, reference model.py:50-85). Index 0 is reserved.
"""
from __future__ import annotations

import functools
import json
import os
from typing import Dict, Tuple

# Canonical element order. Positions 2/3/4 (C/N/H) are fixed by the
# baseline model's baked peak standards; the rest cover protein + common
# organic-molecule chemistry. "X" = padding, "Z" = unknown/other element.
ELEMENTS = ("X", "Z", "C", "N", "H", "O", "S", "P", "F", "CL")
ELEMENT_INDEX = {e: i for i, e in enumerate(ELEMENTS)}

# Published training-set shift statistics baked into the baseline model
# (SURVEY.md Appendix A graph constants).
_PEAK_STANDARDS: Dict[int, Tuple[str, float, float]] = {
    ELEMENT_INDEX["C"]: ("C", 126.0, 10.60346),
    ELEMENT_INDEX["N"]: ("N", 118.955, 50.94122),
    ELEMENT_INDEX["H"]: ("H", 5.63, 6.04064),
}

# PDBv3 sidechain atom names per residue (backbone handled separately).
_SIDECHAIN = {
    "ALA": ["CB", "HB1", "HB2", "HB3"],
    "ARG": ["CB", "HB2", "HB3", "CG", "HG2", "HG3", "CD", "HD2", "HD3",
            "NE", "HE", "CZ", "NH1", "HH11", "HH12", "NH2", "HH21", "HH22"],
    "ASN": ["CB", "HB2", "HB3", "CG", "OD1", "ND2", "HD21", "HD22"],
    "ASP": ["CB", "HB2", "HB3", "CG", "OD1", "OD2", "HD2"],
    "CYS": ["CB", "HB2", "HB3", "SG", "HG"],
    "GLN": ["CB", "HB2", "HB3", "CG", "HG2", "HG3", "CD", "OE1",
            "NE2", "HE21", "HE22"],
    "GLU": ["CB", "HB2", "HB3", "CG", "HG2", "HG3", "CD", "OE1", "OE2", "HE2"],
    "GLY": [],
    "HIS": ["CB", "HB2", "HB3", "CG", "ND1", "HD1", "CD2", "HD2",
            "CE1", "HE1", "NE2", "HE2"],
    "ILE": ["CB", "HB", "CG1", "HG12", "HG13", "CG2", "HG21", "HG22", "HG23",
            "CD1", "HD11", "HD12", "HD13"],
    "LEU": ["CB", "HB2", "HB3", "CG", "HG", "CD1", "HD11", "HD12", "HD13",
            "CD2", "HD21", "HD22", "HD23"],
    "LYS": ["CB", "HB2", "HB3", "CG", "HG2", "HG3", "CD", "HD2", "HD3",
            "CE", "HE2", "HE3", "NZ", "HZ1", "HZ2", "HZ3"],
    "MET": ["CB", "HB2", "HB3", "CG", "HG2", "HG3", "SD",
            "CE", "HE1", "HE2", "HE3"],
    "PHE": ["CB", "HB2", "HB3", "CG", "CD1", "HD1", "CD2", "HD2",
            "CE1", "HE1", "CE2", "HE2", "CZ", "HZ"],
    "PRO": ["CB", "HB2", "HB3", "CG", "HG2", "HG3", "CD", "HD2", "HD3"],
    "SER": ["CB", "HB2", "HB3", "OG", "HG"],
    "THR": ["CB", "HB", "OG1", "HG1", "CG2", "HG21", "HG22", "HG23"],
    "TRP": ["CB", "HB2", "HB3", "CG", "CD1", "HD1", "CD2", "NE1", "HE1",
            "CE2", "CE3", "HE3", "CZ2", "HZ2", "CZ3", "HZ3", "CH2", "HH2"],
    "TYR": ["CB", "HB2", "HB3", "CG", "CD1", "HD1", "CD2", "HD2",
            "CE1", "HE1", "CE2", "HE2", "CZ", "OH", "HH"],
    "VAL": ["CB", "HB", "CG1", "HG11", "HG12", "HG13",
            "CG2", "HG21", "HG22", "HG23"],
}

_BACKBONE = ["N", "H", "CA", "HA", "C", "O"]
_TERMINI = ["H1", "H2", "H3", "OXT", "HXT"]

# Organic small-molecule data classes (microbial metabolomics 'MB' and
# DFT-computed 'DFT' shift sets; regex-matched at reference model.py:80-85).
_ORGANIC_CLASSES = ("MB", "DFT")
_ORGANIC_ATOMS = ("H", "C", "N", "O")


def _build_name_vocab() -> Dict[str, int]:
    names = ["X-X"]  # index 0 reserved for padding / unlabeled
    for res in sorted(_SIDECHAIN):
        backbone = list(_BACKBONE)
        if res == "GLY":
            backbone = ["N", "H", "CA", "HA2", "HA3", "C", "O"]
        if res == "PRO":
            backbone = ["N", "CA", "HA", "C", "O"]
        for atom in backbone + _SIDECHAIN[res] + _TERMINI:
            names.append(f"{res}-{atom}")
    for cls in _ORGANIC_CLASSES:
        for atom in _ORGANIC_ATOMS:
            names.append(f"{cls}-{atom}")
    return {n: i for i, n in enumerate(names)}


@functools.lru_cache(maxsize=None)
def load_embeddings(path: str = None) -> dict:
    """Vocabulary dict: {'atom': element->idx, 'name': '<RES>-<ATOM>'->idx,
    'nlist': neighbor-slot vocab placeholder}.

    ``path`` optionally points to a JSON file overriding the built-in
    vocabulary (the reference's --embeddings flag, main.py:41)."""
    if path:
        with open(path) as f:
            d = json.load(f)
        d.setdefault("atom", dict(ELEMENT_INDEX))
        return d
    return {"atom": dict(ELEMENT_INDEX), "name": _build_name_vocab()}


def load_standards(path: str = None) -> Dict[int, Tuple[str, float, float]]:
    """Per-element shift statistics {element_idx: (element, avg, std)};
    elements with no training statistics get (elem, 0, 0) which marks them
    unconfident in check_peaks (reference library.py:39)."""
    if path:
        with open(path) as f:
            raw = json.load(f)
        return {int(k): tuple(v) for k, v in raw.items()}
    out = {}
    for i, e in enumerate(ELEMENTS):
        out[i] = _PEAK_STANDARDS.get(i, (e, 0.0, 0.0))
    return out


def element_to_index(symbol: str) -> int:
    """Map an element symbol to its one-hot index (unknown -> 'Z')."""
    return ELEMENT_INDEX.get(symbol.upper().strip(), ELEMENT_INDEX["Z"])


def save_embeddings(path: str, embeddings: dict) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(embeddings, f, indent=1)
