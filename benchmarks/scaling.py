"""Forward/training-step scaling benchmark on real hardware.

Measures, at several structure sizes (108M.pdb and tiled supercells):
  * exact f32 XLA gather forward (reference-equivalent math)
  * banded Pallas forward, fast config (Chebyshev edge + bf16) — when
    the plan fits VMEM (ServingModel's auto selection)
  * block-sparse Pallas forward (bf16)
  * a training step (loss+grad+Adam) through the gather path and through
    apply_banded_trainable (custom VJP, VERDICT r1 item 4)

Prints a markdown table; run on the TPU (no JAX_PLATFORMS override).

Usage: python benchmarks/scaling.py [--sizes 1,4,18]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
PDB = "/root/reference/tests/108M.pdb"


def tiled_structure_graph(tiles: int, neighbor_number: int = 16):
    """Graph of a `tiles`x-replicated 108M supercell (shifted copies)."""
    from nmrgnn_tpu.data.parse import ANGSTROM_TO_NM, atoms_one_hot
    from nmrgnn_tpu.data.pdb import read_structure
    from nmrgnn_tpu.data.neighbors import neighbors_host
    from nmrgnn_tpu.data.parse import inv_degree_np
    from nmrgnn_tpu.graph import Graph

    struct = read_structure(PDB)
    coords = struct.coords[0]
    span = coords.max(0) - coords.min(0) + 8.0
    parts, elems = [], []
    grid = int(np.ceil(tiles ** (1 / 3)))
    placed = 0
    for ix in range(grid):
        for iy in range(grid):
            for iz in range(grid):
                if placed >= tiles:
                    break
                parts.append(coords + span * np.array([ix, iy, iz]))
                elems.extend(struct.elements)
                placed += 1
    xyz = np.concatenate(parts).astype(np.float32)
    nlist, dists = neighbors_host(xyz, neighbor_number)
    edges = (dists * ANGSTROM_TO_NM).astype(np.float32)
    atoms = atoms_one_hot(elems)
    return Graph(atoms, nlist, edges, inv_degree_np(nlist))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1,4,18")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nmrgnn_tpu import ModelConfig, init_params
    from nmrgnn_tpu.data.embeddings import load_standards
    from nmrgnn_tpu.data.reorder import permute_graph, rcm_order
    from nmrgnn_tpu.graph import Graph, bucket_size, pad_graph
    from nmrgnn_tpu.models import gnn
    from nmrgnn_tpu.models.infer import (
        apply_banded, apply_banded_trainable, apply_blocksparse,
        precompute_band, precompute_structure,
    )
    from nmrgnn_tpu.ops.banded import fused_build_fits, plan_fits_vmem
    from nmrgnn_tpu.ops.edgefn import fit_edge_chebyshev
    from nmrgnn_tpu.utils.profiling import device_time
    import optax

    config = ModelConfig()
    cfg16 = config.replace(compute_dtype="bfloat16")
    params = init_params(jax.random.PRNGKey(0), config, load_standards())
    cheb = fit_edge_chebyshev(
        params["edge_fc"], rbf_low=config.rbf_low, rbf_high=config.rbf_high,
        rbf_count=config.edge_hidden_size, activation=config.fc_activation,
        degree=64,
    )
    tx = optax.adam(1e-4)

    print("| atoms | path | latency | MP edges/s |")
    print("|---|---|---|---|")
    for tiles in [int(s) for s in args.sizes.split(",")]:
        g0 = tiled_structure_graph(tiles)
        n = g0.atoms.shape[0]
        n_edges = int((np.asarray(g0.edges) > 0).sum())
        order = rcm_order(g0.nlist, g0.edges)
        gr, _ = permute_graph(Graph(*[np.asarray(a) for a in g0]), order,
                              pin_zero=False)
        plan = precompute_band(gr)
        grj = Graph(*[jnp.asarray(a) for a in gr])
        gp = pad_graph(Graph(*[jnp.asarray(a) for a in g0]), bucket_size(n))

        def row(name, dt):
            eps = n_edges * config.mp_layers / dt
            print(f"| {n} | {name} | {dt*1e3:.3f} ms | {eps:.2e} |", flush=True)

        def t_of(f, nn):
            return device_time(f, jnp.zeros(nn), iters=16, repeats=4)

        def gather(c):
            g2 = gp._replace(edges=gp.edges + c[:, None] * 1e-30)
            return gnn.apply(params, config, g2)

        row("gather f32 (exact)", t_of(gather, gp.atoms.shape[0]))

        banded_ok = plan_fits_vmem(
            plan, config.atom_feature_size, config.edge_feature_size,
            dtype_bytes=2,
        ) and fused_build_fits(
            plan, config.edge_hidden_size, config.edge_feature_size,
            g0.nlist.shape[1], out_bytes=2,
        )
        if banded_ok:
            def banded(c):
                g2 = grj._replace(edges=grj.edges + c[:, None] * 1e-30)
                return apply_banded(params, cfg16, g2, plan, cheb=cheb)

            row(f"banded fast (W={plan.window})", t_of(banded, n))
        else:
            # node table exceeds VMEM: the HBM-table kernel takes over,
            # class-bucketed when the window-need distribution is skewed
            # (serving's selection; ops/banded.band_plan_classes)
            from nmrgnn_tpu.models.infer import apply_banded_hbm_classes
            from nmrgnn_tpu.ops.banded import band_plan_classes

            cls_plan = band_plan_classes(
                np.asarray(gr.nlist), np.asarray(gr.edges)
            )
            if len(cls_plan.classes) > 1:
                def banded_cls(c):
                    g2 = grj._replace(edges=grj.edges + c[:, None] * 1e-30)
                    return apply_banded_hbm_classes(
                        params, cfg16, g2, cls_plan, cheb
                    )

                ws = "/".join(str(cc.window) for cc in cls_plan.classes)
                row(f"banded HBM class-bucketed (W={ws})", t_of(banded_cls, n))

            def banded_hbm(c):
                g2 = grj._replace(edges=grj.edges + c[:, None] * 1e-30)
                return apply_banded(
                    params, cfg16, g2, plan, cheb=cheb, hbm_table=True
                )

            row(f"banded HBM-table (W={plan.window})", t_of(banded_hbm, n))

        struct = precompute_structure(
            Graph(*[np.asarray(a) for a in gr]), pair_rounding=32, group=4
        )

        def bsp(c):
            g2 = grj._replace(edges=grj.edges + c[:, None] * 1e-30)
            return apply_blocksparse(params, cfg16, g2, struct, group=4)

        row(f"block-sparse bf16 ({struct.n_pairs}p)", t_of(bsp, n))

        if tiles == 1:
            # attention family: gather vs the one-channel-band fast path
            from nmrgnn_tpu.models.infer import apply_banded_attention

            cfg_attn = config.replace(mp_type="attention")
            params_attn = init_params(
                jax.random.PRNGKey(1), cfg_attn, load_standards()
            )

            def attn_gather(c):
                g2 = gp._replace(edges=gp.edges + c[:, None] * 1e-30)
                return gnn.apply(params_attn, cfg_attn, g2)

            row("attention gather f32", t_of(attn_gather, gp.atoms.shape[0]))

            cheb_attn = fit_edge_chebyshev(
                params_attn["edge_fc"], rbf_low=config.rbf_low,
                rbf_high=config.rbf_high, rbf_count=config.edge_hidden_size,
                activation=config.fc_activation, degree=64,
            )

            def attn_banded(c):
                g2 = grj._replace(edges=grj.edges + c[:, None] * 1e-30)
                return apply_banded_attention(
                    params_attn, cfg_attn, g2, plan, cheb=cheb_attn
                )

            row(f"attention banded+cheb f32 (W={plan.window})",
                t_of(attn_banded, n))

            # training step benches (batchless whole-structure step)
            opt_state = tx.init(params)

            def make_step(fwd, target):
                def step(p, g2):
                    def loss(p):
                        return jnp.mean((fwd(p, g2) - target) ** 2)
                    l, grads = jax.value_and_grad(loss)(p)
                    updates, _ = tx.update(grads, opt_state, p)
                    return optax.apply_updates(p, updates), l
                return step

            def train_time(fwd, g, nn):
                target = jnp.asarray(np.random.default_rng(0)
                                     .normal(size=nn).astype(np.float32))
                step = make_step(fwd, target)

                def chained(c):
                    g2 = g._replace(edges=g.edges + c[:, None] * 1e-30)
                    p2, l = step(params, g2)
                    out = fwd(p2, g2)
                    return out * 0 + l  # consume params + loss

                return t_of(chained, nn)

            dt = train_time(lambda p, g2: gnn.apply(p, config, g2),
                            gp, gp.atoms.shape[0])
            row("train step gather f32", dt)
            dt = train_time(
                lambda p, g2: apply_banded_trainable(p, config, g2, plan),
                grj, n,
            )
            row("train step banded (custom VJP)", dt)


if __name__ == "__main__":
    main()
