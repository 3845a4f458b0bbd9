"""Honest accuracy experiment: our framework vs the ACTUAL reference
implementation, trained from scratch on identical data.

No real NMR shift corpus ships in this environment (the reference's
pretrained weight blob is absent from the mount and its nmrdata corpus
is external), so accuracy parity is established the only honest way
available: train BOTH implementations — ours and the reference TF model
driven by its own Keras fit loop — from scratch on the SAME synthetic
geometry-derived fragment corpus (data/fragment.py synthetic_shift) and
compare their evaluation tables. Both see the same records, same loss
(NameLoss, s=1), same Adam(1e-4), and a matched optimizer-update count:
the reference trains in its own regime (one fragment per step, unbatched
— reference main.py:79-80, ~640 updates/epoch x ref-epochs), ours with
its padded-batch trainer (batch 8, ~72 updates/epoch x ours-epochs = 8x
the epochs for the same update count).

Writes ACCURACY.md at the repo root.

Usage:
    python benchmarks/accuracy.py [--workdir /tmp/nmracc] \
        [--ours-epochs 240] [--ref-epochs 30]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PDB_108M = "/root/reference/tests/108M.pdb"
PDB_7LGI = "/root/reference/tests/7lgi.pdb.gz"


def run(cmd, cwd=REPO, env=None, **kw):
    env = dict(env if env is not None else os.environ)
    # prepend (not replace): the session may carry a sitecustomize dir
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    print("+", " ".join(cmd), flush=True)
    r = subprocess.run(cmd, cwd=cwd, env=env, **kw)
    if r.returncode != 0:
        raise SystemExit(f"command failed: {cmd}")


def table_from_csv(csv_path, data_name):
    """Same grouping as cli.eval_tfrecords (reference main.py:155-171,
    incl. the mean-squared-error '-rmsd' quirk C4)."""
    import pandas as pd

    out = pd.read_csv(csv_path)
    results = {}
    for e in np.unique(out.element):
        sub = out[out.element == e]
        results[f"{data_name}-{e}-r"] = [len(sub.y), sub[["y", "yhat"]].corr().iloc[0, 1]]
        results[f"{data_name}-{e}-rmsd"] = [len(sub.y), float(np.mean((sub.yhat - sub.y) ** 2))]
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/nmracc")
    ap.add_argument("--ref-epochs", type=int, default=30)
    ap.add_argument("--ours-epochs", type=int, default=240)
    ap.add_argument("--ours-batch", type=int, default=8)
    ap.add_argument("--skip-reference", action="store_true")
    ap.add_argument("--retrain-reference", action="store_true",
                    help="retrain the reference even if its eval CSVs are "
                         "already in the workdir")
    ap.add_argument("--reuse-model", action="store_true",
                    help="skip our training if the workdir model exists "
                         "(it must have been trained with the same recipe)")
    ap.add_argument("--seed", type=int, default=0,
                    help="init/shuffle seed for BOTH stacks (replication "
                         "runs use a fresh workdir + nonzero seed)")
    ap.add_argument("--out", default=None,
                    help="output markdown path (default ACCURACY.md)")
    ap.add_argument("--head-decay", type=float, default=0.0,
                    help="P-X mitigation experiment: L2 decay on the out "
                         "head's N column during OUR training (the "
                         "reference recipe is untouched)")
    args = ap.parse_args()
    wd = args.workdir
    os.makedirs(wd, exist_ok=True)

    protein = os.path.join(wd, "protein.tfrecord")
    organic = os.path.join(wd, "organic.tfrecord")
    if not os.path.exists(protein):
        run([sys.executable, "-m", "nmrgnn_tpu.cli", "make-fragments",
             PDB_108M, PDB_7LGI, protein])
    if not os.path.exists(organic):
        run([sys.executable, "-m", "nmrgnn_tpu.cli", "make-organic",
             organic, "--molecules", "200"])

    # ours: the framework's native recipe (warmup+cosine, parameter EMA,
    # best-val restore — trainer defaults stay reference-parity; these
    # flags are the documented production recipe)
    model_dir = os.path.join(wd, "model")
    if args.reuse_model and os.path.exists(os.path.join(model_dir, "params.msgpack")):
        print(f"reusing trained model in {model_dir}")
        run_train = False
    else:
        run_train = True
    if run_train:
        run([sys.executable, "-m", "nmrgnn_tpu.cli", "train",
             protein, organic, model_dir, str(args.ours_epochs),
             "--checkpoint-path", os.path.join(wd, "ckpt"),
             "--validation", "0.1",
             "--batch-size", str(args.ours_batch),
             "--lr-schedule", "cosine", "--warmup-epochs", "5",
             "--ema-decay", "0.999", "--restore-best",
             "--seed", str(args.seed)]
            + (["--head-decay", str(args.head_decay)]
               if args.head_decay > 0 else []))

    # our eval (eval-tfrecords writes model.csv in cwd; keep per-set copies)
    import shutil

    ours = {}
    for name, rec in (("P", protein), ("Mol", organic)):
        run([sys.executable, "-m", "nmrgnn_tpu.cli", "eval-tfrecords",
             rec, "--model-file", model_dir, "--data-name", name], cwd=wd)
        csv = os.path.join(wd, f"ours_{name}.csv")
        shutil.move(os.path.join(wd, "model.csv"), csv)
        ours.update(table_from_csv(csv, name))

    # reference TF model trained once on the same records, its own loop
    ref = {}
    if not args.skip_reference:
        ref_csv_p = os.path.join(wd, "ref_P.csv")
        ref_csv_m = os.path.join(wd, "ref_Mol.csv")
        cached = os.path.exists(ref_csv_p) and os.path.exists(ref_csv_m)
        if args.retrain_reference or not cached:
            env = dict(os.environ, TF_USE_LEGACY_KERAS="1", JAX_PLATFORMS="cpu",
                       CUDA_VISIBLE_DEVICES="-1", REF_SEED=str(args.seed))
            run([sys.executable,
                 os.path.join(REPO, "benchmarks", "_ref_train_eval.py"),
                 f"{protein},{organic}", str(args.ref_epochs),
                 f"{protein}:{ref_csv_p}", f"{organic}:{ref_csv_m}"], env=env)
        else:
            print(f"reusing cached reference eval CSVs in {wd}")
        ref.update(table_from_csv(ref_csv_p, "P"))
        ref.update(table_from_csv(ref_csv_m, "Mol"))

    lines = [
        "# ACCURACY — ours vs the actual reference, same synthetic corpus",
        "",
        "No real NMR shift corpus is available in this environment (the",
        "reference's pretrained weight blob is absent from the mount and its",
        "nmrdata corpus is external), so the bundled baseline weights are",
        "trained on synthetic geometry-derived shifts — NOT the published",
        "baseline (see BASELINE.md for the reference's published numbers).",
        "This table instead establishes *implementation* accuracy parity:",
        "both frameworks trained from scratch on the same synthetic fragment",
        "corpus (108M + 7lgi frames + organic), matched optimizer-update",
        f"count (ours: batch {args.ours_batch} x {args.ours_epochs} epochs;",
        f"reference: its own unbatched regime x {args.ref_epochs} epochs),",
        "NameLoss s=1, Adam peak lr 1e-4, evaluated identically (Pearson r",
        "and the reference's mean-squared-error 'rmsd' columns, quirk C4).",
        "Each stack trains with its own production recipe: the reference",
        "with its published callbacks (constant-floor plateau LR,",
        "reference main.py:54-55), ours with the framework's native recipe",
        "(warmup+cosine decay, parameter EMA, best-validation restore).",
        "O/S element rows carry no shift standards (peak_std=0) and are",
        "excluded by both stacks.",
        "",
        "Generated by `python benchmarks/accuracy.py`.",
        "",
        "| metric | N | ours | reference TF |",
        "|---|---|---|---|",
    ]
    def has_standard(key):
        # element letter between the data-name and -r/-rmsd suffix;
        # O and S carry no shift standard (peak_std=0, Appendix A)
        elem = key.split("-")[1]
        return elem not in ("O", "S")

    for key in sorted(k for k in (set(ours) | set(ref)) if has_standard(k)):
        o = ours.get(key)
        r = ref.get(key)
        lines.append(
            f"| {key} | {(o or r)[0]} | "
            f"{'' if o is None else f'{o[1]:.4f}'} | "
            f"{'' if r is None else f'{r[1]:.4f}'} |"
        )
    out_md = args.out or os.path.join(REPO, "ACCURACY.md")
    with open(out_md, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out_md}")
    print(json.dumps({"ours": ours, "ref": ref}, indent=1))


if __name__ == "__main__":
    main()
