"""Verify the halo-overlap assumption against the COMPILED TPU artifact
(VERDICT r3 missing item 3).

The scaling projection (parallel/comm.py project_scaling) models the
partitioned forward as `t_layer = max(t_interior, t_comm) + t_halo`,
which is only valid if XLA actually schedules the ring ppermutes under
the interior Pallas kernel. This script AOT-compiles the real
partitioned banded forward against a v5e:2x4 TPU *topology* (no
hardware needed — PJRT topology compilation) and asserts, for every MP
layer, that the optimized HLO schedule sandwiches an interior
`tpu_custom_call` between each `collective-permute-start` and its
`collective-permute-done`: the latency-hiding scheduler really does run
the interior band matmuls while the boundary rows are in flight.

Exit 0 = overlap evidenced; exit 2 = topology compilation unavailable
in this environment; exit 1 = the schedule does NOT overlap (the
projection must switch to `overlap=False`).

Usage: python benchmarks/check_overlap_hlo.py [n_shards]
"""
from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PDB_108M = "/root/reference/tests/108M.pdb"


def main():
    n_shards = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    import numpy as np

    import jax
    import jax.numpy as jnp

    try:
        from jax.experimental import topologies

        topo = topologies.get_topology_desc("v5e:2x4", "tpu")
    except Exception as e:  # no libtpu / unsupported JAX
        print(f"topology compilation unavailable: {type(e).__name__}: {e}")
        sys.exit(2)

    from jax.sharding import Mesh

    from nmrgnn_tpu import ModelConfig, init_params
    from nmrgnn_tpu.data.parse import structure2graph
    from nmrgnn_tpu.data.reorder import permute_graph, rcm_order
    from nmrgnn_tpu.graph import Graph
    from nmrgnn_tpu.parallel.halo import (
        apply_partitioned_banded,
        make_banded_halo_plan,
    )

    cfg = ModelConfig()
    g = structure2graph(PDB_108M)
    order = rcm_order(np.asarray(g.nlist), np.asarray(g.edges))
    g, _ = permute_graph(g, order, pin_zero=False)

    def pad(a, m):
        p = (-a.shape[0]) % m
        return np.pad(a, ((0, p),) + ((0, 0),) * (a.ndim - 1))

    gp = Graph(*[pad(np.asarray(a), n_shards * 128) for a in g])
    plan = make_banded_halo_plan(
        np.asarray(gp.nlist), np.asarray(gp.edges), n_shards
    )
    devices = np.asarray(topo.devices).reshape(8 // n_shards, n_shards)
    mesh = Mesh(devices, ("data", "graph"))
    params = init_params(jax.random.PRNGKey(0), cfg)

    f = jax.jit(
        lambda p, gg: apply_partitioned_banded(
            p, cfg, gg, plan, mesh, interpret=False
        )
    )
    txt = (
        f.lower(params, Graph(*[jnp.asarray(a) for a in gp]))
        .compile()
        .as_text()
    )

    lines = txt.splitlines()
    starts, dones, kernels = {}, {}, []
    for i, line in enumerate(lines):
        m = re.search(r"%(collective-permute-start[.\w]*) =", line)
        if m:
            starts[m.group(1)] = i
        m = re.search(
            r"collective-permute-done\(%(collective-permute-start[.\w]*)\)",
            line,
        )
        if m:
            dones[m.group(1)] = i
        if 'custom_call_target="tpu_custom_call"' in line:
            kernels.append(i)

    if not starts:
        print("no collective-permute ops found — wrong program?")
        sys.exit(1)
    missing = set(starts) - set(dones)
    if missing:
        print(f"start ops without dones: {missing}")
        sys.exit(1)

    overlapped, blocking = 0, 0
    for name, si in sorted(starts.items(), key=lambda kv: kv[1]):
        di = dones[name]
        inside = [k for k in kernels if si < k < di]
        if inside:
            overlapped += 1
        else:
            blocking += 1
            print(f"{name}: no Pallas kernel between start@{si} and done@{di}")
    print(
        f"{overlapped}/{overlapped + blocking} collective-permute pairs have "
        f"an interior Pallas kernel scheduled between start and done "
        f"({len(kernels)} tpu_custom_calls total, {n_shards} shards)"
    )
    # every MP layer issues ppermute pair(s); require every pair overlapped
    sys.exit(0 if blocking == 0 else 1)


if __name__ == "__main__":
    main()
