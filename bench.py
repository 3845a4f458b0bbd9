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
# contention-robust capture (round-5): anchors long enough that the
# tunnel's fixed ~23 ms dispatch+readback is subtracted by the slope
# and its jitter is <2% of it; rounds are SPACED across minutes because
# observed co-tenant load drifts on the minute scale (back-to-back
# samples agree within 3% while slopes minutes apart differ 20%), so
# convergence requires agreement between two DIFFERENT rounds' minima.
K_LO, K_HI = 64, 256
MIN_SAMPLE_ROUNDS = 5
MAX_SAMPLE_ROUNDS = 12
INTER_ROUND_SLEEP_S = 12.0
AGREE_RTOL = 0.05


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


def measure(iters=ITERS, warmup=WARMUP, fast=True, quick=False):
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

        # production serving pick (ServingModel fast precision): the
        # class-bucketed VMEM forward when the window distribution is
        # skewed (108M: 2 tiles @ 256 / 10 @ 640 / 8 @ 896 vs a uniform
        # W=896 — measured ~9% faster interleaved), else uniform banded
        from nmrgnn_tpu.models.infer import apply_banded_classes
        from nmrgnn_tpu.ops.banded import band_plan_classes

        cls_plan = band_plan_classes(g_np.nlist, g_np.edges)
        if len(cls_plan.classes) > 1:
            def forward(params, g2):
                return apply_banded_classes(params, config, g2, cls_plan, cheb)
        else:
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

    def sample(k):
        t0 = time.perf_counter()
        float(f(params, g, jnp.int32(k)))
        return time.perf_counter() - t0

    # Contention-robust slope capture. The chip is SHARED — co-tenant
    # load is *sustained on the minute scale*, so a burst of agreeing
    # back-to-back samples proves nothing about the quiet-chip number.
    # Rounds are therefore spread across minutes (INTER_ROUND_SLEEP_S
    # apart); within each round the minimum of each anchor is tracked
    # (transient load only ever slows a sample down), and across rounds
    # the global per-anchor minima converge to the quiet-chip times.
    # Convergence = the two fastest per-round slopes come from different
    # rounds and agree within AGREE_RTOL; at least MIN_SAMPLE_ROUNDS
    # rounds always run, at most MAX_SAMPLE_ROUNDS.
    # quick=True (CPU baseline / test path): short anchors, no spacing
    k_lo, k_hi = (max(iters // 3, 1), iters) if quick else (K_LO, K_HI)
    float(f(params, g, jnp.int32(k_lo)))  # compile once
    float(f(params, g, jnp.int32(k_hi)))  # warm the long trip count
    lo_s, hi_s, round_dts = [], [], []
    min_rounds = 1 if quick else MIN_SAMPLE_ROUNDS
    max_rounds = 2 if quick else MAX_SAMPLE_ROUNDS
    for rounds in range(1, max_rounds + 1):
        r_lo, r_hi = [], []
        for _ in range(max(warmup, 2)):
            r_lo.append(sample(k_lo))
            r_hi.append(sample(k_hi))
        lo_s += r_lo
        hi_s += r_hi
        round_dts.append((min(r_hi) - min(r_lo)) / (k_hi - k_lo))
        best2 = sorted(round_dts)[:2]
        converged = (
            len(round_dts) >= 2 and best2[1] <= best2[0] * (1 + AGREE_RTOL)
        )
        if rounds >= min_rounds and converged:
            break
        if not quick and rounds < max_rounds:
            time.sleep(INTER_ROUND_SLEEP_S)
    dt = max((min(hi_s) - min(lo_s)) / (k_hi - k_lo), 1e-9)
    stats = {
        "rounds": rounds,
        "samples": len(lo_s) + len(hi_s),
        "dt_worst": max(max(round_dts), dt),
        "converged": converged,
    }
    edges_per_fwd = n_real_edges * config.mp_layers
    return edges_per_fwd / dt, dt, n_real_edges, stats


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
        eps, _, _, _ = measure(iters=5, warmup=2, fast=False, quick=True)
        print(eps)
        return
    eps, dt, n_edges, stats = measure(fast=True)
    base = cpu_baseline()
    vs = eps / base if base > 0 else 1.0
    print(
        json.dumps(
            {
                "metric": "edges/s/chip (MP aggregate, 108M.pdb fwd)",
                "value": round(eps, 1),
                "unit": "edges/s",
                "vs_baseline": round(vs, 3),
                "fwd_ms_best": round(dt * 1e3, 4),
                "fwd_ms_worst_observed": round(stats["dt_worst"] * 1e3, 4),
                "capture": {
                    "rounds": stats["rounds"],
                    "samples": stats["samples"],
                    "converged": stats["converged"],
                },
            }
        )
    )
    print(
        f"# fast serving path (banded Pallas + Chebyshev edge + bf16): "
        f"fwd latency {dt*1e3:.3f} ms (worst observed "
        f"{stats['dt_worst']*1e3:.3f} ms over {stats['samples']} samples, "
        f"converged={stats['converged']}), {n_edges} real edges, "
        f"cpu baseline (exact f32 gather) {base:.3e} edges/s",
        file=sys.stderr,
    )
    if os.environ.get("NMRGNN_TPU_BENCH_FULL"):
        # optional second measurement (adds minutes of tunnel round trips)
        eps_x, dt_x, _, _ = measure(fast=False)
        print(
            f"# exact f32 gather path on device: {dt_x*1e3:.3f} ms, "
            f"{eps_x:.3e} edges/s ({eps_x/base if base else 1.0:.0f}x cpu)",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
