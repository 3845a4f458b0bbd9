"""P-X mitigation experiment (VERDICT r4 item 8).

Two arms, measured across the 3 accuracy seeds:

1. RETRAIN arm: `accuracy.py --head-decay 1e-2` — mild L2 on the out
   head's N column during training (TrainConfig.head_decay). Measured
   on seed 0: a no-op (Adam's adaptive scaling absorbs the penalty;
   P-N 14.07 -> 14.06, P-X 12.22 -> 12.50, within seed noise).

2. POST-HOC arm (this script): take each seed's TRAINED baseline model
   and scale the out head's N column by s < 1 — the *equilibrium* the
   decay would reach, applied directly, so the whole mitigation family
   "shrink the N head" is mapped in minutes instead of a 100-minute
   retrain per decay strength. For each seed and s it evaluates the
   protein corpus and reports P-N-rmsd (the trained rows we win 2x)
   vs P-X-rmsd and its N-like cluster (the extrapolation rows we
   lose). If no s improves P-X without surrendering the P-N >= 1.5x
   advantage, head shrinkage as a class is refuted with measurement.

Usage: python benchmarks/xrow_mitigation.py /tmp/nmracc /tmp/nmracc2 /tmp/nmracc3
"""
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCALES = (1.0, 0.97, 0.94, 0.9, 0.85, 0.8, 0.7)
N_COL = 3  # embeddings element order: X Z C N H ... (data/embeddings.py)


def eval_model(params, cfg, records, pad_to=256, batch_size=8):
    import jax
    import jax.numpy as jnp

    from nmrgnn_tpu.data.dataset import FragmentLoader, split_dataset
    from nmrgnn_tpu.data.embeddings import load_embeddings
    from nmrgnn_tpu.graph import Graph
    from nmrgnn_tpu.models import gnn

    emb = load_embeddings()
    rev_names = {v: k for k, v in emb["name"].items()}
    fwd = jax.jit(lambda p, g: gnn.apply_batched(p, cfg, g))
    samples, _ = split_dataset(list(records), 0.0, cfg.num_elements)
    loader = FragmentLoader(samples, pad_to=pad_to, batch_size=batch_size,
                            shuffle=False)
    element, pred, shift = [], [], []
    for g, y, w in loader.batches():
        yhat = np.asarray(fwd(params, Graph(*[jnp.asarray(a) for a in g])))
        for b in range(y.shape[0]):
            sel = w[b] > 0
            for n_i, yt, yp in zip(y[b][sel, 1], y[b][sel, 0], yhat[b][sel]):
                full = rev_names.get(int(n_i), "X-X")
                element.append(full.split("-", 1)[1][0])
                pred.append(float(yp))
                shift.append(float(yt))
    element = np.asarray(element)
    pred = np.asarray(pred)
    shift = np.asarray(shift)

    def mse(mask):
        return float(np.mean((pred[mask] - shift[mask]) ** 2))

    x = element == "X"
    nlike = x & (shift >= 80) & (shift < 200)
    return {
        "P-N-rmsd": mse(element == "N"),
        "P-X-rmsd": mse(x),
        "X-Nlike-mse": mse(nlike),
        "X-Nlike-bias": float(np.mean(pred[nlike] - shift[nlike])),
    }


def main():
    import jax

    from nmrgnn_tpu.library import load_model

    workdirs = sys.argv[1:] or ["/tmp/nmracc", "/tmp/nmracc2", "/tmp/nmracc3"]
    per_scale = {s: [] for s in SCALES}
    for wd in workdirs:
        params, cfg = load_model(os.path.join(wd, "model"))
        records = [os.path.join(wd, "protein.tfrecord")]
        for s in SCALES:
            p = jax.tree_util.tree_map(lambda x: x, params)
            k = np.asarray(p["out"]["kernel"]).copy()
            k[:, N_COL] *= s
            p["out"] = dict(p["out"], kernel=k)
            r = eval_model(p, cfg, records)
            per_scale[s].append(r)
            print(f"{os.path.basename(wd)} s={s}: "
                  + " ".join(f"{k2}={v:.3f}" for k2, v in r.items()),
                  flush=True)
    print("\n3-seed means:")
    print(f"{'s':>5} {'P-N-rmsd':>9} {'P-X-rmsd':>9} {'X-Nlike':>9} {'bias':>7}")
    for s in SCALES:
        m = {k2: np.mean([r[k2] for r in per_scale[s]])
             for k2 in per_scale[s][0]}
        print(f"{s:>5} {m['P-N-rmsd']:>9.3f} {m['P-X-rmsd']:>9.3f} "
              f"{m['X-Nlike-mse']:>9.3f} {m['X-Nlike-bias']:>7.2f}")


if __name__ == "__main__":
    main()
