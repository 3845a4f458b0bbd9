"""Benchmark: message-passing edge throughput on the 108M.pdb forward.

Prints ONE JSON line:
  {"metric": "edges/s/chip (MP aggregate, 108M.pdb fwd)",
   "value": ..., "unit": "edges/s", "vs_baseline": ...}

``value``: aggregated MP edges per second through the full flagship
forward pass on the default device (TPU when available):
edges_per_forward = real_edges * mp_layers, timed steady-state.

``vs_baseline``: speedup vs the reference-equivalent computation on this
host's CPU (the reference is a single-device TF/Keras model with no
accelerator-native path; its published table has no throughput numbers —
SURVEY.md §6 — so the CPU run of the same math is the baseline). The CPU
number is measured in a subprocess (JAX CPU backend) and cached in
.bench_cpu_baseline.json keyed by graph size/config.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(REPO, ".bench_cpu_baseline.json")
PDB = "/root/reference/tests/108M.pdb"
WARMUP = 3
ITERS = 36


def build_inputs():
    import jax
    import jax.numpy as jnp

    from nmrgnn_tpu import ModelConfig, init_params
    from nmrgnn_tpu.data.embeddings import load_standards
    from nmrgnn_tpu.data.parse import structure2graph
    from nmrgnn_tpu.graph import Graph, bucket_size, pad_graph

    config = ModelConfig()
    g = structure2graph(PDB)
    n_real_edges = int(np.sum(np.asarray(g.edges) > 0))
    g = Graph(*[jnp.asarray(a) for a in g])
    g = pad_graph(g, bucket_size(g.atoms.shape[0]))
    params = init_params(jax.random.PRNGKey(0), config, load_standards())
    return config, params, g, n_real_edges


def measure(iters=ITERS, warmup=WARMUP, fast=True):
    """Steady-state forward latency via the chained-loop slope method.

    The remote-TPU tunnel used in some environments is fully lazy —
    block_until_ready returns before execution and only a host readback
    forces work — so we time K forwards chained inside one jitted
    fori_loop (output fed back into the input to serialize iterations)
    ending in a scalar readback, at two K values; the slope is the true
    per-forward latency with dispatch overhead subtracted.

    ``fast=True`` measures the production serving configuration (the
    ServingModel default): RCM-banded Pallas MP, Chebyshev-compressed
    edge stage, bf16 MXU arithmetic with f32 accumulation. ``fast=False``
    (and the CPU baseline) measure the exact f32 gather forward — the
    reference-equivalent math.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    from nmrgnn_tpu.models import gnn

    config, params, g, n_real_edges = build_inputs()

    if fast:
        from nmrgnn_tpu.data.reorder import permute_graph, rcm_order
        from nmrgnn_tpu.graph import Graph
        from nmrgnn_tpu.models.infer import apply_banded, precompute_band
        from nmrgnn_tpu.ops.edgefn import fit_edge_chebyshev

        g_np = Graph(*[np.asarray(a) for a in g])
        order = rcm_order(g_np.nlist, g_np.edges)
        g_np, _ = permute_graph(g_np, order, pin_zero=False)
        g = Graph(*[jnp.asarray(a) for a in g_np])
        plan = precompute_band(g_np)
        cheb = fit_edge_chebyshev(
            params["edge_fc"],
            rbf_low=config.rbf_low, rbf_high=config.rbf_high,
            rbf_count=config.edge_hidden_size,
            activation=config.fc_activation, degree=64,
        )
        config = config.replace(compute_dtype="bfloat16")

        def forward(params, g2):
            return apply_banded(params, config, g2, plan, cheb=cheb)
    else:

        def forward(params, g2):
            return gnn.apply(params, config, g2)

    def chained(params, g, iters):
        def body(i, carry):
            g2 = g._replace(edges=g.edges + carry[:, None] * 1e-30)
            return forward(params, g2)

        peaks = lax.fori_loop(0, iters, body, jnp.zeros(g.atoms.shape[0]))
        return jnp.sum(peaks)

    # dynamic trip count: ONE compilation serves both anchors (each
    # tunnel AOT compile costs tens of seconds)
    f = jax.jit(chained)

    def timed(k):
        k = jnp.int32(k)
        float(f(params, g, k))  # compile + warm
        best = float("inf")
        for _ in range(warmup):
            t0 = time.perf_counter()
            float(f(params, g, k))
            best = min(best, time.perf_counter() - t0)
        return best

    # two LONG anchors: both device-dominated, so the ~0.5 ms tunnel
    # round-trip jitter cancels in the slope instead of dividing into it.
    # The chip is SHARED — concurrent tenants inflate latencies 1.5-3x —
    # so the slope is measured twice and the faster round wins (transient
    # load can only make a round slower, never faster).
    k_lo, k_hi = max(iters // 3, 1), iters
    dt = float("inf")
    for _ in range(2):
        t_lo, t_hi = timed(k_lo), timed(k_hi)
        dt = min(dt, max((t_hi - t_lo) / (k_hi - k_lo), 1e-9))
    edges_per_fwd = n_real_edges * config.mp_layers
    return edges_per_fwd / dt, dt, n_real_edges


def cpu_baseline() -> float:
    key = "108M-default-v2"  # bump when padding/model defaults change
    if os.path.exists(CACHE):
        try:
            d = json.load(open(CACHE))
            if key in d:
                return d[key]
        except Exception:
            pass
    env = dict(os.environ, NMRGNN_TPU_BENCH_CPU="1", JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        capture_output=True, text=True, env=env, timeout=900, cwd=REPO,
    )
    try:
        val = float(r.stdout.strip().splitlines()[-1])
    except Exception:
        return 0.0
    json.dump({key: val}, open(CACHE, "w"))
    return val


def main():
    if os.environ.get("NMRGNN_TPU_BENCH_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")
        eps, _, _ = measure(iters=5, warmup=2, fast=False)
        print(eps)
        return
    eps, dt, n_edges = measure(fast=True)
    base = cpu_baseline()
    vs = eps / base if base > 0 else 1.0
    print(
        json.dumps(
            {
                "metric": "edges/s/chip (MP aggregate, 108M.pdb fwd)",
                "value": round(eps, 1),
                "unit": "edges/s",
                "vs_baseline": round(vs, 3),
            }
        )
    )
    print(
        f"# fast serving path (banded Pallas + Chebyshev edge + bf16): "
        f"fwd latency {dt*1e3:.3f} ms, {n_edges} real edges, "
        f"cpu baseline (exact f32 gather) {base:.3e} edges/s",
        file=sys.stderr,
    )
    if os.environ.get("NMRGNN_TPU_BENCH_FULL"):
        # optional second measurement (adds minutes of tunnel round trips)
        eps_x, dt_x, _ = measure(fast=False)
        print(
            f"# exact f32 gather path on device: {dt_x*1e3:.3f} ms, "
            f"{eps_x:.3e} edges/s ({eps_x/base if base else 1.0:.0f}x cpu)",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
