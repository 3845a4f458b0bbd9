"""Multi-frame whole-protein training: compiled epoch vs per-step loop.

VERDICT r4 weak item 3: PartitionedTrainer epochs were host-dispatch-
bound by construction — each structure a separate step() call ending in
a float(loss) readback, exactly the per-step round-trip pattern whose
removal bought the fragment Trainer ~30x epoch wall-clock. Round 5
stages same-shape frames into device-resident tables and lax.scan's the
train step across them (parallel/halo.make_partitioned_epoch_fn),
leaving ONE loss readback per epoch.

This script measures both loops on the same prepared 7lgi frames
(trajectory MODELs, synthetic labels — the `make-struct-records ->
train --graph-parallel` workflow's data) on the default device and
prints ms/epoch + the ratio. On a tunneled TPU the per-step loop pays
~2x23 ms of dispatch+readback round trip per frame; the scan pays it
once per epoch.

Usage: python benchmarks/partitioned_epoch.py [--frames 8] [--epochs 5]
"""
from __future__ import annotations

import argparse
import time

import numpy as np

PDB_7LGI = "/root/reference/tests/7lgi.pdb.gz"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--graph-shards", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nmrgnn_tpu.config import ModelConfig, TrainConfig
    from nmrgnn_tpu.data.dataset import Sample
    from nmrgnn_tpu.data.embeddings import load_embeddings
    from nmrgnn_tpu.data.fragment import name_index_for, synthetic_shift
    from nmrgnn_tpu.data.parse import structure2graph
    from nmrgnn_tpu.data.pdb import read_structure
    from nmrgnn_tpu.data.embeddings import element_to_index
    from nmrgnn_tpu.graph import Graph
    from nmrgnn_tpu.parallel import make_mesh
    from nmrgnn_tpu.train.partitioned import PartitionedTrainer

    struct = read_structure(PDB_7LGI)
    emb = load_embeddings()
    name_idx = name_index_for(struct, emb)
    elem_idx = np.asarray(
        [element_to_index(e) for e in struct.elements], np.int64
    )
    samples = []
    for f in range(min(args.frames, struct.n_frames)):
        g = structure2graph(struct, 16, frame=f)
        shift = synthetic_shift(elem_idx, np.asarray(g.edges))
        y = np.stack(
            [shift, name_idx.astype(np.float32),
             (name_idx > 0).astype(np.float32)], axis=-1,
        ).astype(np.float32)
        samples.append(Sample(
            graph=Graph(*[np.asarray(a) for a in g]),
            y=y, w=np.ones(len(elem_idx), np.float32),
        ))
    print(f"{len(samples)} frames x {samples[0].graph.atoms.shape[0]} atoms, "
          f"backend={jax.default_backend()}")

    mesh = make_mesh(data=1, graph=args.graph_shards)
    tr = PartitionedTrainer(
        ModelConfig(), TrainConfig(seed=0), mesh=mesh,
    )
    preps = [tr.prepare(s) for s in samples]
    keys = {p.shape_key for p in preps}
    print(f"plan shape groups: {len(keys)} "
          f"(window={preps[0].plan.window}, n={preps[0].graph.atoms.shape[0]})")
    state = tr.init_state()
    rng = jax.random.PRNGKey(0)

    # A) the r4 per-step loop: one dispatch + float(loss) per frame
    def per_step_epoch():
        total = 0.0
        r = rng
        for p in preps:
            r, srng = jax.random.split(r)
            _, _, loss = tr._train_step(p)(
                state.params, state.opt_state, p.graph, p.y, p.w, srng,
                p.arrays,
            )
            total += float(loss)
        return total

    # B) the compiled epoch scan (fit()'s path): one readback per group
    groups = tr._group(samples)
    tables = {k: tr._stage_tables(v) for k, v in groups.items()}

    def scan_epoch():
        total = 0.0
        for k, preps_g in groups.items():
            graphs, ys, ws, arrays = tables[k]
            f = len(preps_g)
            rngs = jax.random.split(rng, f)
            fn = tr._epoch_fn(preps_g[0], batched=False)
            _, _, _, losses = fn(
                state.params, state.opt_state, state.params,
                graphs, ys, ws, rngs, arrays,
                jnp.arange(f, dtype=jnp.int32),
            )
            total += float(jnp.sum(losses))
        return total

    for name, fn in (("per-step loop", per_step_epoch),
                     ("compiled scan", scan_epoch)):
        fn()  # compile + warm
        times = []
        for _ in range(args.epochs):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        best = min(times) * 1e3
        print(f"{name}: {best:.1f} ms/epoch (best of {args.epochs}; "
              f"median {np.median(times)*1e3:.1f})")
        if name == "per-step loop":
            base = best
    print(f"speedup: {base / best:.1f}x")


if __name__ == "__main__":
    main()
