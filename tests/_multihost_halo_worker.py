"""Worker for test_multihost.py::test_two_process_partitioned_halo.

Two cooperating processes (2 virtual CPU devices each) form a global
(graph=4,) mesh and run the halo-exchange partitioned forward on the
real 108M.pdb myoglobin structure — the whole-protein multi-host
inference case (SURVEY.md §6 north star): each process contributes its
own atom-row block, the per-MP-layer boundary exchange rides
cross-process Gloo collectives, and the result must equal the
single-device forward each process computes locally.

Usage: _multihost_halo_worker.py <pid> <nproc> <coordinator> <outdir> [pdb]
"""
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.dirname(HERE))

PDB_108M = "/root/reference/tests/108M.pdb"


def main():
    pid, nproc, coord, outdir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
    )
    pdb = sys.argv[5] if len(sys.argv) > 5 else PDB_108M
    from nmrgnn_tpu.parallel.mesh import initialize_distributed

    initialize_distributed(coord, num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()

    import numpy as np
    from jax.sharding import Mesh

    from _multihost_common import CFG

    from nmrgnn_tpu import apply, init_params
    from nmrgnn_tpu.data.parse import structure2graph
    from nmrgnn_tpu.data.reorder import permute_graph, rcm_order
    from nmrgnn_tpu.graph import Graph
    from nmrgnn_tpu.parallel import pad_to_multiple
    from nmrgnn_tpu.parallel.halo import (
        apply_partitioned_banded,
        apply_partitioned_halo,
        make_banded_halo_plan,
        make_halo_plan,
    )

    n_shards = len(jax.devices())  # 4 across both processes
    g = structure2graph(pdb)
    order = rcm_order(np.asarray(g.nlist), np.asarray(g.edges))
    g, _ = permute_graph(g, order, pin_zero=False)
    g = pad_to_multiple(Graph(*[np.asarray(a) for a in g]), n_shards * 128)
    params = init_params(jax.random.PRNGKey(0), CFG)
    plan = make_halo_plan(
        np.asarray(g.nlist), n_shards, edges=np.asarray(g.edges)
    )

    mesh = Mesh(np.asarray(jax.devices()), ("graph",))
    peaks = apply_partitioned_halo(params, CFG, g, plan, mesh)

    from jax.experimental import multihost_utils

    peaks_full = np.asarray(multihost_utils.process_allgather(peaks, tiled=True))

    # banded Pallas fast path across the same cross-process mesh
    # (interpret mode on the virtual CPU devices)
    plan_b = make_banded_halo_plan(
        np.asarray(g.nlist), np.asarray(g.edges), n_shards
    )
    peaks_b = apply_partitioned_banded(
        params, CFG, g, plan_b, mesh, interpret=True
    )
    peaks_b_full = np.asarray(
        multihost_utils.process_allgather(peaks_b, tiled=True)
    )

    # single-device reference, computed independently in this process
    want = np.asarray(apply(params, CFG, Graph(*[np.asarray(a) for a in g])))
    max_err = float(np.abs(peaks_full - want).max())
    max_err_b = float(np.abs(peaks_b_full - want).max())
    out = {
        "process_count": jax.process_count(),
        "halo_rows": int(plan.halo_rows),
        "max_err": max_err,
        "max_err_banded": max_err_b,
        "checksum": float(np.abs(peaks_full).sum()),
        "ok": bool(max_err < 2e-4 and max_err_b < 2e-4),
    }
    with open(os.path.join(outdir, f"halo_proc{pid}.json"), "w") as f:
        json.dump(out, f)
    print(f"proc {pid}: max_err={max_err:.2e} ok={out['ok']}", flush=True)


if __name__ == "__main__":
    main()
