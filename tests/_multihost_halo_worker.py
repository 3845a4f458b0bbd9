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

    # whole-protein TRAINING step across both hosts: grads flow through
    # the cross-process ring exchange; the updated params must match a
    # single-device step computed locally. Multi-host jit requires the
    # operands pre-globalized (the in-jit path passes jax.Arrays through)
    import jax.numpy as jnp
    import optax

    from nmrgnn_tpu.data.embeddings import load_embeddings
    from nmrgnn_tpu.parallel.halo import (
        _global_operands,
        _global_params,
        make_partitioned_train_step,
    )
    from nmrgnn_tpu.train.losses import name_loss
    from nmrgnn_tpu.train.metrics import type_mask
    from nmrgnn_tpu.train.trainer import fold_sample_weight

    n = g.atoms.shape[0]
    rng = np.random.default_rng(0)
    y = np.stack(
        [rng.normal(size=n).astype(np.float32) * 3,
         rng.integers(0, 6, n).astype(np.float32),
         np.ones(n, np.float32)], axis=-1,
    )
    w = np.ones(n, np.float32)
    loss_idx = tuple(type_mask(r".*", load_embeddings(), regex=True))
    tx = optax.adam(1e-3)

    params_g = _global_params(params, mesh)
    base = plan_b.halo
    n_off = len(base.send_idx)
    ops = _global_operands(
        mesh, "graph",
        [(a, False) for a in base.send_idx]
        + [(np.asarray(g.atoms), True), (np.asarray(g.nlist), True),
           (base.local_nlist, True),
           (plan_b.lo, True), (plan_b.boundary_ids, True),
           (plan_b.halo_lo, True), (np.asarray(g.edges), True),
           (np.asarray(g.inv_degree), True), (y, True), (w, True)],
    )
    send_g = tuple(ops[:n_off])
    (atoms_g, nlist_g, lnl_g, lo_g, bids_g, hlo_g, edges_g, inv_g,
     y_g, w_g) = ops[n_off:]
    graph_g = Graph(atoms_g, nlist_g, edges_g, inv_g)
    arrays_g = (send_g, lnl_g, lo_g, bids_g, hlo_g)
    step = make_partitioned_train_step(
        CFG, tx, loss_idx, plan_b, mesh, interpret=True
    )
    new_params, _, loss = step(
        params_g, tx.init(params_g), graph_g, y_g, w_g, None, arrays_g
    )

    def single_loss(p):
        yt = fold_sample_weight(jnp.asarray(y), jnp.asarray(w))
        return name_loss(
            yt, apply(p, CFG, Graph(*[jnp.asarray(a) for a in g])),
            loss_idx, s=1.0,
        )

    sloss, sgrads = jax.value_and_grad(single_loss)(params)
    supd, _ = tx.update(sgrads, tx.init(params), params)
    want_params = optax.apply_updates(params, supd)
    train_loss_err = abs(float(loss) - float(sloss)) / max(abs(float(sloss)), 1e-9)
    train_param_err = float(
        np.max(np.abs(
            np.asarray(new_params["embed"]["kernel"])
            - np.asarray(want_params["embed"]["kernel"])
        ))
    )

    out = {
        "process_count": jax.process_count(),
        "halo_rows": int(plan.halo_rows),
        "max_err": max_err,
        "max_err_banded": max_err_b,
        "train_loss_err": train_loss_err,
        "train_param_err": train_param_err,
        "checksum": float(np.abs(peaks_full).sum()),
        "ok": bool(
            max_err < 2e-4 and max_err_b < 2e-4
            and train_loss_err < 1e-4 and train_param_err < 1e-5
        ),
    }
    with open(os.path.join(outdir, f"halo_proc{pid}.json"), "w") as f:
        json.dump(out, f)
    print(f"proc {pid}: max_err={max_err:.2e} ok={out['ok']}", flush=True)


if __name__ == "__main__":
    main()
