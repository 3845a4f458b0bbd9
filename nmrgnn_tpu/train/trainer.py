"""Training loop: jitted update steps, plateau LR schedule, streaming
metric accumulation, checkpoint/resume.

Replaces the reference's Keras fit stack (reference: main.py:46-90):
  * Adam (reference model.py:44-45) via optax.inject_hyperparams so the
    learning rate is runtime-adjustable without retracing
  * ReduceLROnPlateau(factor=0.99, patience=4, min_lr=1e-4)
    (reference main.py:54-55) as a host-side callback
  * per-epoch weights checkpointing + resume (reference main.py:50-51,63-68)
  * metric accumulation across batches by streaming sufficient moments
    (a fix over the reference's last-batch-overwrite metrics, quirk C3)

TPU-first: the step is one jitted function over a padded
[B, N] fragment batch with donated params/opt_state; per-atom sample
weights ``w`` fold into the label mask (the Keras sample_weight channel).
"""
from __future__ import annotations

import dataclasses
import os
import pickle
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import ModelConfig, TrainConfig
from ..data.dataset import FragmentLoader, Sample
from ..data.embeddings import load_embeddings, load_standards
from ..graph import Graph
from ..library import save_model
from ..models import gnn
from .losses import name_loss
from .metrics import METRIC_SPECS, type_mask

# ---------------------------------------------------------------------------
# metric moments: enough sufficient statistics to finalize rmsd/corr/count
# across an epoch without storing predictions.

_MOMENT_NAMES = ("w", "wx", "wy", "wx2", "wy2", "wxy", "wd2")


def _moments(y_true, y_pred, label_idx):
    from .losses import label_mask

    w = label_mask(y_true, label_idx)
    x = y_true[..., 0]
    y = y_pred
    return jnp.stack(
        [
            jnp.sum(w),
            jnp.sum(w * x),
            jnp.sum(w * y),
            jnp.sum(w * x * x),
            jnp.sum(w * y * y),
            jnp.sum(w * x * y),
            jnp.sum(w * (x - y) ** 2),
        ]
    )


def finalize_metric(kind: str, m: np.ndarray) -> float:
    w, wx, wy, wx2, wy2, wxy, wd2 = [float(v) for v in m]
    if kind == "count":
        return w
    if w == 0:
        return 0.0
    if kind == "rmsd":
        return float(np.sqrt(wd2 / w))
    if kind == "corr":
        xm, ym = wx / w, wy / w
        cov = wxy / w - xm * ym
        vx = wx2 / w - xm * xm
        vy = wy2 / w - ym * ym
        den = np.sqrt(max(vx * vy, 0.0))
        return float(cov / den) if den > 0 else 0.0
    raise ValueError(kind)


def metric_kinds() -> List[Tuple[str, str, tuple]]:
    """(metric_name, kind, label_idx) for the standard suite."""
    emb = load_embeddings()
    out = []
    for name, fn, pattern in METRIC_SPECS:
        kind = "rmsd" if "rmsd" in name else ("count" if "count" in name else "corr")
        try:
            idx = tuple(type_mask(pattern, emb, regex=True))
        except ValueError:
            continue
        out.append((name, kind, idx))
    return out


# ---------------------------------------------------------------------------


def fold_sample_weight(y: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Multiply the per-atom sample weight into the label flag channel."""
    return y.at[..., 2].multiply(w)


@dataclasses.dataclass
class TrainState:
    params: dict
    opt_state: object
    epoch: int = 0
    lr: float = 1e-4
    best_val: float = float("inf")
    plateau: int = 0
    history: dict = dataclasses.field(default_factory=dict)
    # exponential moving average of params (None when ema_decay == 0);
    # used for validation + export while raw params keep training
    ema_params: Optional[dict] = None

    @property
    def eval_params(self) -> dict:
        """Weights to evaluate/export: EMA when enabled, else raw."""
        return self.ema_params if self.ema_params is not None else self.params


def save_train_checkpoint(path: str, state: TrainState, config) -> None:
    """Model + optimizer + EMA + schedule metadata (shared by the
    fragment Trainer and the partitioned whole-structure trainer; the
    model part is library.load_model-compatible)."""
    from flax import serialization

    os.makedirs(path, exist_ok=True)
    save_model(path, state.params, config)
    with open(os.path.join(path, "opt_state.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(state.opt_state))
    if state.ema_params is not None:
        with open(os.path.join(path, "ema.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(state.ema_params))
    with open(os.path.join(path, "train_state.pkl"), "wb") as f:
        pickle.dump(
            {
                "epoch": state.epoch,
                "lr": state.lr,
                "best_val": state.best_val,
                "plateau": state.plateau,
                "history": state.history,
            },
            f,
        )


def load_train_checkpoint(path: str, tx, state: TrainState) -> TrainState:
    """Inverse of save_train_checkpoint; ``state`` supplies the fresh
    pytree structure to deserialize into."""
    from flax import serialization

    from ..library import load_model

    params, _ = load_model(path)
    state.params = params
    opt_file = os.path.join(path, "opt_state.msgpack")
    if os.path.exists(opt_file):
        with open(opt_file, "rb") as f:
            state.opt_state = serialization.from_bytes(tx.init(params), f.read())
    ema_file = os.path.join(path, "ema.msgpack")
    if os.path.exists(ema_file):
        with open(ema_file, "rb") as f:
            state.ema_params = serialization.from_bytes(params, f.read())
    meta_file = os.path.join(path, "train_state.pkl")
    if os.path.exists(meta_file):
        with open(meta_file, "rb") as f:
            meta = pickle.load(f)
        state.epoch = meta["epoch"]
        state.lr = meta["lr"]
        state.best_val = meta["best_val"]
        state.plateau = meta["plateau"]
        state.history = meta["history"]
    return state


def banded_fragments_eligible(
    config, batch_size: int, pad_to: int, dp: int = 1,
    tensor_parallel: bool = False,
) -> Tuple[bool, bool]:
    """(shape_ok, vmem_fits) for the banded fragment fast path
    (models/infer.apply_banded_fragments): the bilinear MP family with
    128-aligned pad_to/F, and a flattened [batch/dp * pad_to, F] node
    table + double-buffered band tiles that fit the VMEM budget —
    mp_banded holds the whole table in VMEM, so an oversized
    batch*pad_to*F combination busts Mosaic's allocation at runtime
    unless gated here (exactly as serving gates the same kernel with
    plan_fits_vmem). Shared by the Trainer's mp_path resolution and the
    eval-tfrecords CLI."""
    from ..models.infer import fragment_band_plan
    from ..ops.banded import plan_fits_vmem

    shape_ok = (
        config.mp_type == "bilinear"
        and pad_to % 128 == 0
        and config.atom_feature_size % 128 == 0
        and not tensor_parallel
    )
    fits = False
    if shape_ok:
        fits = plan_fits_vmem(
            fragment_band_plan(max(batch_size // dp, 1), pad_to),
            config.atom_feature_size,
            n_edge_channels=config.edge_feature_size,
        )
    return shape_ok, fits


class Trainer:
    def __init__(
        self,
        config: Optional[ModelConfig] = None,
        train_config: Optional[TrainConfig] = None,
        embeddings: Optional[dict] = None,
        mesh=None,
        tensor_parallel: bool = False,
    ):
        """``mesh`` (a jax.sharding.Mesh with a 'data' axis, e.g. from
        parallel.make_mesh) enables data-parallel training: batches shard
        over 'data', gradients all-reduce automatically; with
        ``tensor_parallel`` the MP/FC kernels also shard over 'graph'.
        The reference trains strictly single-device (SURVEY.md §2.3)."""
        self.config = config or ModelConfig()
        self.tcfg = train_config or TrainConfig()
        self.embeddings = embeddings or load_embeddings()
        self.loss_idx = tuple(type_mask(r".*", self.embeddings, regex=True))
        self.metric_specs = metric_kinds()
        self.mesh = mesh
        self.tensor_parallel = tensor_parallel
        self._tx = optax.inject_hyperparams(optax.adam)(
            learning_rate=self.config.learning_rate
        )
        self.use_banded = self._resolve_mp_path()
        self._build_steps()

    def _resolve_mp_path(self) -> bool:
        """Whether the train/eval steps run the banded custom-VJP Pallas
        path (models/infer.apply_banded_fragments) instead of the XLA
        gather math. See TrainConfig.mp_path."""
        path = self.tcfg.mp_path
        if path == "gather":
            return False
        dp = self.mesh.shape["data"] if self.mesh is not None else 1
        shape_ok, fits = banded_fragments_eligible(
            self.config, self.tcfg.batch_size, self.tcfg.pad_to,
            dp=dp, tensor_parallel=self.tensor_parallel,
        )
        eligible = shape_ok and fits
        if path == "banded":
            if not eligible:
                raise ValueError(
                    "mp_path='banded' requires the bilinear MP family, "
                    "pad_to and atom_feature_size multiples of 128, "
                    "no tensor parallelism, and a per-shard "
                    "batch_size*pad_to*F working set that fits VMEM "
                    f"(got mp_type={self.config.mp_type}, "
                    f"batch_size={self.tcfg.batch_size}, "
                    f"pad_to={self.tcfg.pad_to}, "
                    f"F={self.config.atom_feature_size}, "
                    f"tensor_parallel={self.tensor_parallel}, "
                    f"vmem_fit={fits})"
                )
            return True
        if path != "auto":
            raise ValueError(f"unknown mp_path {path!r}")
        return eligible and jax.default_backend() == "tpu"

    # -- jitted steps ------------------------------------------------------
    def _make_forwards(self):
        """(train_fwd(params, graph, rng), eval_fwd(params, graph)) pair:
        the banded Pallas fast path when use_banded (same rng stream as
        gnn.apply_batched, so switching paths preserves the draws), else
        the XLA gather math. Under a mesh the banded kernels run inside
        shard_map over the 'data' axis (each shard flattens + bands its
        local fragments; Pallas custom calls have no SPMD partitioning
        rules, so plain jit would replicate them)."""
        cfg = self.config
        if not self.use_banded:
            return (
                lambda params, graph, rng: gnn.apply_batched(
                    params, cfg, graph, training=True, rng=rng
                ),
                lambda params, graph: gnn.apply_batched(params, cfg, graph),
            )
        from ..models.infer import apply_banded_fragments, fragment_band_plan

        interp = jax.default_backend() != "tpu"
        B, N = self.tcfg.batch_size, self.tcfg.pad_to
        if self.mesh is None:
            plan = fragment_band_plan(B, N)

            def train_fwd(params, graph, rng):
                rngs = jax.random.split(rng, graph.atoms.shape[0])
                return apply_banded_fragments(
                    params, cfg, graph, training=True, rngs=rngs,
                    plan=plan, interpret=interp,
                )

            def eval_fwd(params, graph):
                return apply_banded_fragments(
                    params, cfg, graph,
                    plan=fragment_band_plan(graph.atoms.shape[0], N),
                    interpret=interp,
                )

            return train_fwd, eval_fwd

        from functools import partial

        from jax.sharding import PartitionSpec as P

        dp = self.mesh.shape["data"]
        plan_local = fragment_band_plan(B // dp, N)

        def local_train(params, atoms, nlist, edges, inv, rngs):
            return apply_banded_fragments(
                params, cfg, Graph(atoms, nlist, edges, inv),
                training=True, rngs=rngs, plan=plan_local, interpret=interp,
            )

        def local_eval(params, atoms, nlist, edges, inv):
            return apply_banded_fragments(
                params, cfg, Graph(atoms, nlist, edges, inv),
                plan=plan_local, interpret=interp,
            )

        d = P("data")
        sm_train = partial(
            jax.shard_map, mesh=self.mesh,
            in_specs=(P(), d, d, d, d, d), out_specs=d, check_vma=False,
        )
        sm_eval = partial(
            jax.shard_map, mesh=self.mesh,
            in_specs=(P(), d, d, d, d), out_specs=d, check_vma=False,
        )

        def train_fwd(params, graph, rng):
            rngs = jax.random.split(rng, graph.atoms.shape[0])
            return sm_train(local_train)(params, *graph, rngs)

        def eval_fwd(params, graph):
            return sm_eval(local_eval)(params, *graph)

        return train_fwd, eval_fwd

    def _build_steps(self):
        cfg = self.config
        s = self.tcfg.loss_balance
        loss_idx = self.loss_idx
        tx = self._tx
        specs = self.metric_specs
        train_fwd, eval_fwd = self._make_forwards()

        hd = self.tcfg.head_decay
        hd_idx = ()
        if hd > 0:
            hd_idx = tuple(
                self.embeddings["atom"][e.strip().upper()]
                for e in self.tcfg.head_decay_elements.split(",")
                if e.strip()
            )

        def loss_fn(params, graph, y, w, rng):
            peaks = train_fwd(params, graph, rng)
            yt = fold_sample_weight(y, w)
            loss = name_loss(
                yt.reshape(-1, 3), peaks.reshape(-1), loss_idx, s=s
            )
            if hd > 0 and hd_idx:
                # L2 on the selected out-head element columns (see
                # TrainConfig.head_decay)
                cols = params["out"]["kernel"][:, jnp.asarray(hd_idx)]
                loss = loss + hd * jnp.sum(cols * cols)
            return loss

        decay = self.tcfg.ema_decay

        def ema_update(ema, params):
            if decay <= 0 or ema is None:
                return ema
            return jax.tree_util.tree_map(
                lambda e, p: decay * e + (1.0 - decay) * p, ema, params
            )

        def train_step(params, opt_state, ema, graph, y, w, rng):
            loss, grads = jax.value_and_grad(loss_fn)(params, graph, y, w, rng)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, ema_update(ema, params), loss

        def eval_step(params, graph, y, w):
            peaks = eval_fwd(params, graph)
            yt = fold_sample_weight(y, w).reshape(-1, 3)
            yp = peaks.reshape(-1)
            loss = name_loss(yt, yp, loss_idx, s=s)
            moments = jnp.stack([_moments(yt, yp, idx) for _, _, idx in specs])
            return loss, moments

        mesh = self.mesh

        def constrain_batch(graph, y, w):
            """Under a mesh, pin the gathered batch's sharding to the
            'data' axis so the step runs data-parallel (the resident
            table is replicated; without the constraint XLA may choose
            to replicate the batch compute instead)."""
            if mesh is None:
                return graph, y, w
            from jax.lax import with_sharding_constraint as wsc
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            def row(a):
                return wsc(
                    a,
                    NamedSharding(
                        mesh, P("data", *([None] * (a.ndim - 1)))
                    ),
                )

            return (
                Graph(*[row(a) for a in graph]), row(y), row(w),
            )

        def train_epoch_resident(params, opt_state, ema, dg, dy, dw, idx, rng):
            """Epoch scan over a DEVICE-RESIDENT fragment table: each
            step gathers its shuffled batch on device (idx i32[steps, B]
            rows into the [S, ...] table). Removes the per-epoch host
            staging (pad/stack/device_put of every fragment) that
            dominated epoch wall-clock ~20x over the actual compute."""

            def body(carry, ib):
                params, opt_state, ema, rng = carry
                rng, srng = jax.random.split(rng)
                graph = Graph(*[a[ib] for a in dg])
                graph, y, w = constrain_batch(graph, dy[ib], dw[ib])
                loss, grads = jax.value_and_grad(loss_fn)(
                    params, graph, y, w, srng
                )
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state, ema_update(ema, params), rng), loss

            (params, opt_state, ema, _), losses = jax.lax.scan(
                body, (params, opt_state, ema, rng), idx
            )
            return params, opt_state, ema, losses

        self.train_step = jax.jit(train_step, donate_argnums=(0, 1, 2))
        self.train_epoch_resident = jax.jit(
            train_epoch_resident, donate_argnums=(0, 1, 2)
        )
        self.eval_step = jax.jit(eval_step)

        def eval_epoch_body(params, dg, dy, dw, idx):
            """Whole validation pass as ONE dispatch over the resident
            table: scan the batches, summing loss and metric moments on
            device."""
            def body(carry, ib):
                tl, acc = carry
                graph = Graph(*[a[ib] for a in dg])
                peaks = eval_fwd(params, graph)
                yt = fold_sample_weight(dy[ib], dw[ib]).reshape(-1, 3)
                yp = peaks.reshape(-1)
                loss = name_loss(yt, yp, loss_idx, s=s)
                moments = jnp.stack(
                    [_moments(yt, yp, idx_) for _, _, idx_ in specs]
                )
                return (tl + loss, acc + moments), None

            (tl, acc), _ = jax.lax.scan(
                body, (jnp.float32(0.0), jnp.zeros((len(specs), 7))), idx
            )
            return tl, acc

        self.eval_epoch = jax.jit(eval_epoch_body)
        # keyed cache of device-resident datasets (train + val tables
        # coexist; tiny fragments, so a handful fit in HBM comfortably)
        self._resident: dict = {}

    def _resident_dataset(self, samples: Sequence[Sample]):
        """Stage the padded fragment set into device memory ONCE (S is
        padded to a batch multiple with zero-weight duplicates so every
        epoch is full batches). Rebuilt only when the sample list
        changes; the cache RETAINS the list so an id() key can never
        alias a recycled id to stale device tables."""
        key = (id(samples), len(samples))
        hit = self._resident.get(key)
        if hit is not None:
            return hit[1]
        from ..data.dataset import pad_sample

        bs = self.tcfg.batch_size
        padded = [pad_sample(s, self.tcfg.pad_to) for s in samples]
        s_pad = (-len(padded)) % bs
        if s_pad:
            filler = padded[0]
            dead = Sample(
                graph=filler.graph,
                y=np.ascontiguousarray(filler.y).copy(),
                w=np.zeros_like(filler.w),
            )
            dead.y[:, 2] = 0.0
            padded = padded + [dead] * s_pad
        graphs = Graph(
            *[jnp.asarray(np.stack([getattr(s.graph, f) for s in padded]))
              for f in Graph._fields]
        )
        ys = jnp.asarray(np.stack([s.y for s in padded]))
        ws = jnp.asarray(np.stack([s.w for s in padded]))
        if self.mesh is not None:
            # replicate the table across the mesh; per-step batches get
            # pinned to the 'data' axis inside the epoch scan
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            rep = NamedSharding(self.mesh, P())
            graphs = Graph(*[jax.device_put(a, rep) for a in graphs])
            ys = jax.device_put(ys, rep)
            ws = jax.device_put(ws, rep)
        if len(self._resident) >= 4:  # bound HBM held by stale tables
            self._resident.pop(next(iter(self._resident)))
        self._resident[key] = (samples, (graphs, ys, ws))
        return self._resident[key][1]

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

    # -- epoch loops -------------------------------------------------------
    def evaluate(self, samples: Sequence[Sample], params) -> Dict[str, float]:
        if self.mesh is None:
            # resident path: the val table stays on device; the whole
            # pass is one dispatch (host staging per epoch dominated
            # validation cost the same way it did training)
            dg, dy, dw = self._resident_dataset(samples)
            s_total = int(dy.shape[0])
            idx = jnp.asarray(
                np.arange(s_total).reshape(-1, self.tcfg.batch_size)
                .astype(np.int32)
            )
            loss, acc = self.eval_epoch(params, dg, dy, dw, idx)
            nb = idx.shape[0]
            out = {"loss": float(loss) / max(nb, 1)}
            for (name, kind, _), m in zip(self.metric_specs, np.asarray(acc)):
                out[name] = finalize_metric(kind, m)
            return out
        loader = FragmentLoader(
            samples,
            pad_to=self.tcfg.pad_to,
            batch_size=self.tcfg.batch_size,
            shuffle=False,
        )
        return self.evaluate_loader(loader, params=params)

    def evaluate_loader(self, loader, params=None, state=None) -> Dict[str, float]:
        params = params if params is not None else state.params
        total_loss, nb = 0.0, 0
        acc = np.zeros((len(self.metric_specs), len(_MOMENT_NAMES)))
        for g, y, w in loader.batches():
            loss, moments = self.eval_step(
                params, Graph(*[jnp.asarray(a) for a in g]), jnp.asarray(y), jnp.asarray(w)
            )
            total_loss += float(loss)
            nb += 1
            acc += np.asarray(moments)
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
        callbacks: Sequence[Callable] = (),
        early_stop_patience: Optional[int] = None,
    ) -> TrainState:
        """``early_stop_patience``: stop when val_loss has not improved
        for that many epochs (reference hyper-search EarlyStopping,
        main.py:298-304)."""
        epochs = epochs or self.tcfg.epochs
        state = state or self.init_state()
        rng = jax.random.PRNGKey(self.tcfg.seed + 1)
        if self.mesh is not None:
            from ..parallel.sharding import param_specs, shard_params

            if self.tcfg.batch_size % self.mesh.shape["data"]:
                raise ValueError(
                    f"batch_size {self.tcfg.batch_size} not divisible by "
                    f"data axis {self.mesh.shape['data']}"
                )
            state.params = shard_params(state.params, self.mesh, self.tensor_parallel)
            p_specs = param_specs(state.params, self.tensor_parallel)
            param_def = jax.tree_util.tree_structure(state.params)

            def place(node):
                # Adam mu/nu mirror the parameter sharding; scalars replicate
                if jax.tree_util.tree_structure(node) == param_def:
                    return jax.tree_util.tree_map(
                        lambda x, s: jax.device_put(
                            x, jax.sharding.NamedSharding(self.mesh, s)
                        ),
                        node, p_specs,
                    )
                return jax.tree_util.tree_map(
                    lambda x: jax.device_put(
                        x,
                        jax.sharding.NamedSharding(
                            self.mesh, jax.sharding.PartitionSpec()
                        ),
                    )
                    if hasattr(x, "shape")
                    else x,
                    node,
                )

            state.opt_state = jax.tree_util.tree_map(
                place, state.opt_state,
                is_leaf=lambda n: jax.tree_util.tree_structure(n) == param_def,
            )
        loader = FragmentLoader(
            train_samples,
            pad_to=self.tcfg.pad_to,
            batch_size=self.tcfg.batch_size,
            shuffle=True,
            seed=self.tcfg.seed,
        )
        ema_on = self.tcfg.ema_decay > 0
        if ema_on and state.ema_params is None:
            state.ema_params = jax.tree_util.tree_map(jnp.array, state.params)
        # in-memory epoch snapshot for NaN recovery (failure-detection
        # subsystem; the reference's only recovery is manual --load,
        # reference main.py:50-51)
        snapshot = None
        nan_retries = 0
        stall = 0
        best_seen = float("inf")
        best_restore = float("inf")
        best_weights = None
        total_epochs = state.epoch + epochs
        compiled = self.tcfg.compiled_epochs
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
            if compiled:
                # device-resident dataset: the epoch runs as one dispatch
                # with batches gathered ON DEVICE from the staged table
                # (host pad/stack/device_put per epoch was ~20x the
                # actual step compute); under a mesh the table is
                # replicated and each batch is pinned to the 'data' axis
                dg, dy, dw = self._resident_dataset(train_samples)
                s_total = int(dy.shape[0])
                order = loader._epoch_order()  # loader's seeded stream
                if s_total > len(order):
                    order = np.concatenate(
                        [order, np.arange(len(order), s_total)]
                    )
                idx = jnp.asarray(
                    order.reshape(-1, self.tcfg.batch_size).astype(np.int32)
                )
                rng, srng = jax.random.split(rng)
                state.params, state.opt_state, state.ema_params, losses = (
                    self.train_epoch_resident(
                        state.params, state.opt_state, state.ema_params,
                        dg, dy, dw, idx, srng,
                    )
                )
                losses = np.asarray(losses)
                epoch_loss = float(losses.sum())
                nb = int(idx.shape[0])
            else:
                for g, y, w in loader.batches():
                    rng, srng = jax.random.split(rng)
                    if self.mesh is not None:
                        from ..parallel.sharding import shard_batch

                        gj, yj, wj = shard_batch(self.mesh, g, y, w)
                    else:
                        gj = Graph(*[jnp.asarray(a) for a in g])
                        yj, wj = jnp.asarray(y), jnp.asarray(w)
                    state.params, state.opt_state, state.ema_params, loss = (
                        self.train_step(
                            state.params, state.opt_state, state.ema_params,
                            gj, yj, wj, srng,
                        )
                    )
                    epoch_loss += float(loss)
                    nb += 1
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
                # ReduceLROnPlateau (reference main.py:54-55)
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
                    f"{k}={v:.4g}" for k, v in logs.items() if isinstance(v, float)
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
            # when EMA is on so .eval_params keeps meaning "export these")
            if state.ema_params is not None:
                state.ema_params = best_weights
            else:
                state.params = best_weights
        return state
