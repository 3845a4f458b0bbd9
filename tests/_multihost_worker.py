"""Worker for test_multihost.py: one of two cooperating processes.

Each process owns 2 virtual CPU devices and half of a deterministic
fragment batch; together they form a (data=4,) mesh across processes and
run ONE DP training step through parallel.sharding.make_parallel_train_step
after bootstrapping with parallel.mesh.initialize_distributed (the
multi-host path VERDICT r1 flagged as untested). Gradients psum over
Gloo cross-process CPU collectives. Writes the post-step loss and a
per-leaf parameter checksum to <outdir>/proc<pid>.json.

Usage: _multihost_worker.py <pid> <nproc> <coordinator> <outdir>
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


def main():
    pid, nproc, coord, outdir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
    )
    from nmrgnn_tpu.parallel.mesh import initialize_distributed

    initialize_distributed(coord, num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()

    import numpy as np
    import jax.numpy as jnp
    import optax
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    from _multihost_common import CFG, make_batch

    from nmrgnn_tpu import init_params
    from nmrgnn_tpu.data.embeddings import load_embeddings
    from nmrgnn_tpu.graph import Graph
    from nmrgnn_tpu.parallel.sharding import make_parallel_train_step
    from nmrgnn_tpu.train.metrics import type_mask

    g, y, w = make_batch()
    b = y.shape[0]
    lo, hi = pid * b // nproc, (pid + 1) * b // nproc

    emb = load_embeddings()
    loss_idx = tuple(type_mask(r".*", emb, regex=True))
    tx = optax.adam(1e-3)
    params = init_params(jax.random.PRNGKey(1), CFG)
    opt_state = tx.init(params)

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    step, shard_init = make_parallel_train_step(CFG, tx, loss_idx, mesh)
    sp, so = shard_init(params, opt_state)

    def globalize(a):
        return multihost_utils.host_local_array_to_global_array(
            np.asarray(a)[lo:hi], mesh, P("data")
        )

    gs = Graph(*[globalize(a) for a in g])
    ys, ws = globalize(y), globalize(w)
    new_params, _, loss = step(sp, so, gs, ys, ws, jax.random.PRNGKey(9))

    def scalar(x):
        # replicated global scalar -> host float via a local shard
        s = jnp.sum(jnp.abs(x))
        return float(np.asarray(s.addressable_data(0)))

    sums = {
        jax.tree_util.keystr(path): scalar(leaf)
        for path, leaf in jax.tree_util.tree_leaves_with_path(new_params)
    }
    loss_val = float(np.asarray(loss.addressable_data(0)))
    out = {"loss": loss_val, "param_abs_sums": sums,
           "process_count": jax.process_count()}
    with open(os.path.join(outdir, f"proc{pid}.json"), "w") as f:
        json.dump(out, f)
    print(f"proc {pid}: loss={out['loss']:.6f}", flush=True)


if __name__ == "__main__":
    main()
