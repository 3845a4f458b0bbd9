"""Whole-protein (graph-partitioned) training walkthrough.

The reference stack can only train on ~256-atom fragments; this
framework trains on the INTACT structure, atoms partitioned across the
mesh's 'graph' axis, with the banded Pallas kernels and the ring halo
exchange inside the step (parallel/halo.py, train/partitioned.py).

The same thing via the CLI:

    nmrgnn-tpu make-struct-records 7lgi.pdb.gz records.tfr
    nmrgnn-tpu train records.tfr mymodel 50 --graph-parallel 4

Run this script on a multi-chip host, or anywhere with
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu
for a virtual-mesh dry run.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from nmrgnn_tpu.config import ModelConfig, TrainConfig
from nmrgnn_tpu.data.dataset import read_fragments
from nmrgnn_tpu.data.fragment import write_structure_records
from nmrgnn_tpu.data.pdb import read_structure
from nmrgnn_tpu.parallel import make_mesh
from nmrgnn_tpu.train import PartitionedTrainer

PDB = "/root/reference/tests/7lgi.pdb.gz"  # 2,770 atoms x 10 frames


def main():
    # 1) whole-structure labeled records, one per trajectory frame
    records = "/tmp/whole_protein.tfr"
    if not os.path.exists(records):
        struct = read_structure(PDB)
        n = write_structure_records(records, struct, frames=range(4))
        print(f"wrote {n} whole-structure records")
    samples = list(read_fragments(records))
    train_s, val_s = samples[1:], samples[:1]

    # 2) a (data, graph) mesh: atoms shard over 'graph'
    n_dev = len(jax.devices())
    graph_ax = min(4, n_dev)
    mesh = make_mesh(data=n_dev // graph_ax, graph=graph_ax)
    print(f"mesh: {dict(mesh.shape)}")

    # 3) train the intact protein. Epochs compile to ONE lax.scan over a
    # device-resident frame table (one loss readback per epoch; frames
    # share a plan-shape envelope so the whole trajectory is one scan
    # group), and with data > 1 each data shard trains its OWN frame
    # concurrently — the step applies the mean gradient of the batch.
    trainer = PartitionedTrainer(
        ModelConfig(), TrainConfig(epochs=10, seed=0), mesh=mesh
    )
    state = trainer.fit(train_s, val_s, checkpoint_path="/tmp/wp_ckpt")

    # 4) predict with the trained weights (peaks in original atom order)
    peaks = trainer.predict(state.params, val_s[0])
    print(f"val-frame peaks: shape {peaks.shape}, first five {peaks[:5]}")


if __name__ == "__main__":
    main()
