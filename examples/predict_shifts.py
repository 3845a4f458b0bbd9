"""End-to-end chemical-shift prediction walkthrough.

The script equivalent of the reference's Colab notebook
(reference: colab/NMRPredictor.ipynb): load a structure with explicit
hydrogens, predict shifts, check plausibility, and summarize by residue.

Usage:
    python examples/predict_shifts.py [structure.pdb] [out.csv]

Note the same preprocessing requirement as the reference (README.md:54-61):
structures must have explicit hydrogens (e.g. cleaned with OpenMM/pdbfixer);
the bundled test structures already do.
"""
import sys

import numpy as np

import nmrgnn_tpu
from nmrgnn_tpu.data import read_structure


def main():
    struct_file = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/tests/108M.pdb"
    out_csv = sys.argv[2] if len(sys.argv) > 2 else "peaks.csv"

    print(f"Reading {struct_file} ...")
    struct = read_structure(struct_file)
    print(f"  {struct.n_atoms} atoms, {struct.n_frames} frame(s)")

    graph = nmrgnn_tpu.universe2graph(struct)
    params, config = nmrgnn_tpu.load_model()  # bundled baseline

    import jax

    peaks = np.asarray(jax.jit(
        lambda p, g: nmrgnn_tpu.apply(p, config, g)
    )(params, nmrgnn_tpu.Graph(*[np.asarray(a) for a in graph])))

    try:
        confident = nmrgnn_tpu.check_peaks(graph.atoms, peaks)
    except Warning as w:
        print(f"warning: {w}")
        confident = np.zeros(len(peaks), bool)

    import pandas as pd

    df = pd.DataFrame(
        {
            "residue": struct.resnames,
            "resid": struct.resids,
            "name": struct.names,
            "shift_ppm": np.round(peaks, 2),
            "confident": confident,
        }
    )
    df.to_csv(out_csv, index=False)
    print(df.head(10).to_string())
    print(f"\n{confident.mean():.0%} confident; wrote {out_csv}")

    # per-element summary (compare with known shift ranges)
    for elem, idx in (("C", 2), ("N", 3), ("H", 4)):
        sel = np.asarray(graph.atoms)[:, idx] == 1
        if sel.any():
            print(f"  {elem}: mean {peaks[sel].mean():7.2f} ppm  "
                  f"std {peaks[sel].std():6.2f} (n={int(sel.sum())})")


if __name__ == "__main__":
    main()
