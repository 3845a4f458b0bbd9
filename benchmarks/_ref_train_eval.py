"""Train/eval the ACTUAL reference TF model on our fragment records.

Subprocess helper for benchmarks/accuracy.py — run with
TF_USE_LEGACY_KERAS=1 set before TensorFlow is imported. Loads the
reference GNNModel from /root/reference source (tests/_reference.py
loader), trains it with its own Keras fit loop on the SAME TFRecord
fragments as our model (one fragment per step, unbatched, exactly the
reference's training regime — reference main.py:79-80, quirk C11), and
writes per-atom predictions in eval-tfrecords CSV format.

Usage: _ref_train_eval.py <train.tfrecord,...> <epochs> \
          <eval1.tfrecord>:<out1.csv> [<eval2.tfrecord>:<out2.csv> ...]
"""
import os
import sys

assert os.environ.get("TF_USE_LEGACY_KERAS") == "1"

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np  # noqa: E402
import tensorflow as tf  # noqa: E402

from _reference import SMALL_HYPERS, HYPERS, build_reference_model, load_reference  # noqa: E402

from nmrgnn_tpu.data.dataset import read_fragments  # noqa: E402
from nmrgnn_tpu.data.embeddings import load_embeddings, load_standards  # noqa: E402
from nmrgnn_tpu.graph import inv_degree_from_nlist  # noqa: E402


def load_samples(paths):
    out = []
    for p in paths:
        out.extend(read_fragments(p))
    return out


def to_inputs(s):
    g = s.graph
    inv = np.asarray(g.inv_degree, np.float32)
    return (
        tf.constant(g.atoms), tf.constant(g.nlist.astype(np.int32)),
        tf.constant(g.edges), tf.constant(inv),
    )


_SEED = int(os.environ.get("REF_SEED", "0"))


def main():
    tf.random.set_seed(_SEED)  # before the model is built/initialized
    train_paths = sys.argv[1].split(",")
    epochs = int(sys.argv[2])
    eval_specs = [a.split(":") for a in sys.argv[3:]]

    mods = load_reference()
    emb = load_embeddings()
    standards = load_standards()
    train = load_samples(train_paths)
    print(f"train fragments: {len(train)}")

    model = build_reference_model(HYPERS, standards, graph=None)
    # build weights with one forward
    model(list(to_inputs(train[0])), training=False)

    label_idx = mods["metrics"].type_mask(r".*", emb, regex=True)
    loss = mods["losses"].NameLoss(label_idx, s=1.0)
    opt = tf.keras.optimizers.Adam(1e-4)

    @tf.function(reduce_retracing=True)
    def step(x, y):
        with tf.GradientTape() as tape:
            yhat = model(x, training=True)
            l = loss.call(y, yhat)
        grads = tape.gradient(l, model.trainable_variables)
        opt.apply_gradients(zip(grads, model.trainable_variables))
        return l

    rng = np.random.default_rng(_SEED)
    for epoch in range(epochs):
        order = rng.permutation(len(train))
        losses = []
        for i in order:
            s = train[i]
            y = np.asarray(s.y, np.float32).copy()
            y[:, 2] = y[:, 2] * np.asarray(s.w, np.float32)
            l = step(list(to_inputs(s)), tf.constant(y))
            losses.append(float(l))
        print(f"epoch {epoch + 1}/{epochs} loss {np.mean(losses):.4f}", flush=True)

    import pandas as pd

    rev_names = {v: k for k, v in emb["name"].items()}
    for eval_path, out_csv in eval_specs:
        rows = {"element": [], "y": [], "yhat": [], "class": [], "name": []}
        for s in load_samples([eval_path]):
            yhat = np.asarray(model(list(to_inputs(s)), training=False))
            y = np.asarray(s.y)
            sel = np.asarray(s.w) > 0  # same selection as cli eval-tfrecords
            for n_i, yt, yp in zip(y[sel, 1], y[sel, 0], yhat[sel]):
                full = rev_names.get(int(n_i), "X-X")
                cls, atom = full.split("-", 1)
                rows["element"].append(atom[0])
                rows["y"].append(float(yt))
                rows["yhat"].append(float(yp))
                rows["class"].append(cls)
                rows["name"].append(atom)
        pd.DataFrame(rows).to_csv(out_csv, index=False)
        print(f"wrote {out_csv} ({len(rows['y'])} labeled atoms)")


if __name__ == "__main__":
    main()
