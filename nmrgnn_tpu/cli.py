"""Command-line interface: train | hyper | eval-tfrecords | eval-struct |
make-fragments.

Mirrors the reference click CLI (reference: main.py:15-343) with the same
command names, arguments and output formats (CSV + markdown tables), plus
a native ``make-fragments`` command replacing the external nmrdata
preprocessing.
"""
from __future__ import annotations

import os
import pickle
import time

import click
import numpy as np


@click.group()
def main():
    """nmrgnn-tpu: TPU-native NMR chemical shift prediction."""
    # Some environments pre-register an accelerator PJRT plugin in
    # sitecustomize and pin JAX_PLATFORMS; honor an explicit CPU override.
    if os.environ.get("NMRGNN_TPU_FORCE_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")


def _jax():
    import jax

    return jax


@main.command()
@click.argument("tfrecords", nargs=-1, type=click.Path(exists=True))
@click.argument("name")
@click.argument("epochs", default=3)
@click.option("--checkpoint-path", default="/tmp/checkpoint", type=click.Path())
@click.option("--embeddings", default=None, help="path to embeddings JSON")
@click.option("--validation", default=0.1, help="relative size of validation")
@click.option("--tensorboard", default=None,
              help="log dir for TensorBoard event files (+ scalars.jsonl)")
@click.option("--load/--noload", default=False, help="resume from checkpoint path")
@click.option("--loss-balance", default=1.0, help="L2 (1.0) vs corr (0.0) balance")
@click.option("--batch-size", default=8)
@click.option("--pad-to", default=256)
@click.option("--config", "config_path", default=None, type=click.Path(exists=True),
              help="ModelConfig JSON (defaults to the baseline hyperparameters)")
@click.option("--data-parallel", default=0,
              help="shard batches over N devices (0 = single device)")
@click.option("--tensor-parallel/--no-tensor-parallel", default=False,
              help="also shard MP/FC kernels over the remaining devices")
@click.option("--graph-parallel", default=0,
              help="train on WHOLE structures (make-struct-records input), "
                   "atoms partitioned over N devices with banded Pallas MP "
                   "and halo exchange — no fragmenting (0 = off)")
@click.option("--lr-schedule", default="plateau",
              type=click.Choice(["plateau", "cosine"]),
              help="plateau = reference ReduceLROnPlateau parity; cosine = "
                   "warmup + cosine decay (native recipe)")
@click.option("--warmup-epochs", default=0)
@click.option("--ema-decay", default=0.0,
              help="params EMA for eval/export (0 = off; try 0.999)")
@click.option("--restore-best/--no-restore-best", default=False,
              help="export the best-validation weights instead of the last")
@click.option("--seed", default=0, help="init/shuffle RNG seed")
@click.option("--mp-path", default="auto",
              type=click.Choice(["auto", "banded", "gather"]),
              help="training-step message passing: banded = Pallas "
                   "custom-VJP fast path (~2x faster steps; auto-selected "
                   "on TPU), gather = XLA reference math")
@click.option("--head-decay", default=0.0,
              help="L2 decay on the out head's --head-decay-elements "
                   "columns (out-of-vocabulary extrapolation damping; "
                   "0 = off)")
@click.option("--head-decay-elements", default="N",
              help="comma-separated element letters for --head-decay")
def train(tfrecords, name, epochs, checkpoint_path, embeddings, validation,
          tensorboard, load, loss_balance, batch_size, pad_to, config_path,
          data_parallel, tensor_parallel, graph_parallel, lr_schedule,
          warmup_epochs, ema_decay, restore_best, seed, mp_path,
          head_decay, head_decay_elements):
    """Train the model on fragment TFRecords (reference main.py:36-90)."""
    from .config import ModelConfig, TrainConfig
    from .data.dataset import split_dataset
    from .data.embeddings import load_embeddings
    from .library import save_model
    from .train.trainer import Trainer

    if not tfrecords:
        raise click.UsageError("Must give input TFRecord files")
    emb = load_embeddings(embeddings)
    if config_path:
        with open(config_path) as f:
            cfg = ModelConfig.from_json(f.read())
    else:
        cfg = ModelConfig()
    tcfg = TrainConfig(
        epochs=epochs, validation=validation, loss_balance=loss_balance,
        checkpoint_path=checkpoint_path, batch_size=batch_size, pad_to=pad_to,
        lr_schedule=lr_schedule, warmup_epochs=warmup_epochs,
        ema_decay=ema_decay, restore_best=restore_best, seed=seed,
        mp_path=mp_path, head_decay=head_decay,
        head_decay_elements=head_decay_elements,
    )
    click.echo(f"Loading from {len(tfrecords)} files")
    train_s, val_s = split_dataset(list(tfrecords), validation, cfg.num_elements)
    click.echo(f"train={len(train_s)} val={len(val_s)} fragments")

    if graph_parallel:
        if data_parallel or tensor_parallel:
            raise click.UsageError(
                "--graph-parallel trains one whole structure per step; "
                "combine with neither --data-parallel nor --tensor-parallel"
            )
        from .parallel import make_mesh
        from .train.partitioned import PartitionedTrainer

        import jax

        n_dev = len(jax.devices())
        if graph_parallel > n_dev:
            raise click.UsageError(
                f"--graph-parallel {graph_parallel} exceeds the "
                f"{n_dev} visible device(s)"
            )
        if n_dev % graph_parallel:
            click.echo(
                f"note: {n_dev} devices not divisible by "
                f"--graph-parallel {graph_parallel}; using "
                f"{n_dev - n_dev % graph_parallel}",
                err=True,
            )
        mesh = make_mesh(data=n_dev // graph_parallel, graph=graph_parallel)
        click.echo(f"graph-parallel training: mesh {dict(mesh.shape)}")
        trainer = PartitionedTrainer(cfg, tcfg, mesh=mesh, embeddings=emb)
        state = (
            trainer.load_checkpoint(checkpoint_path) if load
            else trainer.init_state()
        )
        callbacks = _tensorboard_callbacks(tensorboard)
        state = trainer.fit(
            train_s, val_s, epochs=epochs, state=state,
            checkpoint_path=checkpoint_path, callbacks=callbacks,
        )
        save_model(name, state.eval_params, cfg)
        _dump_history(name, state.history)
        click.echo(f"Saved model to {name}")
        return

    mesh = None
    if data_parallel:
        from .parallel import make_mesh

        import jax

        n = len(jax.devices())
        mesh = make_mesh(data=data_parallel, graph=max(1, n // data_parallel)
                         if tensor_parallel else 1)
        click.echo(f"mesh: {dict(mesh.shape)}")
    trainer = Trainer(cfg, tcfg, emb, mesh=mesh, tensor_parallel=tensor_parallel)
    click.echo(
        f"training step: {'banded Pallas fast path' if trainer.use_banded else 'XLA gather'}"
    )
    state = trainer.load_checkpoint(checkpoint_path) if load else trainer.init_state()

    callbacks = _tensorboard_callbacks(tensorboard)
    state = trainer.fit(
        train_s, val_s, epochs=epochs, state=state,
        checkpoint_path=checkpoint_path, callbacks=callbacks,
    )
    save_model(name, state.eval_params, cfg)
    _dump_history(name, state.history)
    click.echo(f"Saved model to {name}")


def _tensorboard_callbacks(tensorboard):
    if not tensorboard:
        return []
    from .utils.tb_events import EventWriter

    os.makedirs(tensorboard, exist_ok=True)
    logf = open(os.path.join(tensorboard, "scalars.jsonl"), "a")
    events = EventWriter(tensorboard)

    def log_cb(st, logs):
        import json

        logf.write(json.dumps({"epoch": st.epoch, **logs}) + "\n")
        logf.flush()
        events.scalars(logs, st.epoch)
        events.flush()

    return [log_cb]


def _dump_history(name, history):
    # history pickle, reference main.py:84-90
    pfile, i = name + "-history-0.pb", 0
    while os.path.exists(pfile):
        i += 1
        pfile = f"{name}-history-{i}.pb"
    with open(pfile, "wb") as f:
        pickle.dump(history, file=f)


@main.command("eval-tfrecords")
@click.argument("tfrecords", nargs=-1, type=click.Path(exists=True))
@click.option("--model-file", type=click.Path(exists=True), default=None)
@click.option("--validation", default=0.0)
@click.option("--data-name", default="")
@click.option("--merge", default=None, help="merge results into a markdown table")
@click.option("--batch-size", default=8)
@click.option("--pad-to", default=256)
@click.option(
    "--mp-path", default="auto",
    type=click.Choice(["auto", "gather", "banded"]),
    help="MP math for the eval forward: the banded Pallas fast path "
    "(the Trainer's eval path) or the XLA gather math; 'auto' picks "
    "banded on TPU when eligible (mirrors `train`)",
)
def eval_tfrecords(tfrecords, model_file, validation, data_name, merge,
                   batch_size, pad_to, mp_path):
    """Evaluate on fragment TFRecords; writes {model}.csv and a markdown
    table in the reference's format (reference main.py:99-189). Note the
    '-rmsd' columns are mean *squared* error, matching the reference's
    published tables (quirk C4)."""
    import pandas as pd

    import jax.numpy as jnp

    from .data.dataset import FragmentLoader, split_dataset
    from .data.embeddings import load_embeddings
    from .graph import Graph
    from .library import load_model
    from .models import gnn

    if not tfrecords:
        raise click.UsageError("Must give input TFRecord files")
    params, cfg = load_model(model_file)
    model_name = os.path.basename(model_file or "baseline")
    train_s, val_s = split_dataset(list(tfrecords), validation, cfg.num_elements)
    data = val_s if validation > 0 else train_s
    emb = load_embeddings()
    rev_names = {v: k for k, v in emb["name"].items()}

    import jax

    from .train.trainer import banded_fragments_eligible

    shape_ok, fits = banded_fragments_eligible(cfg, batch_size, pad_to)
    if mp_path == "banded" and not (shape_ok and fits):
        raise click.UsageError(
            "--mp-path banded needs the bilinear MP family, 128-aligned "
            "pad_to and atom_feature_size, and a batch working set that "
            f"fits VMEM (shape_ok={shape_ok}, vmem_fit={fits})"
        )
    use_banded = mp_path == "banded" or (
        mp_path == "auto" and shape_ok and fits
        and jax.default_backend() == "tpu"
    )
    if use_banded:
        # the Trainer's banded eval path (trainer._make_forwards):
        # flattened batch + static fragment band plan, Pallas MP kernels
        from .models.infer import apply_banded_fragments, fragment_band_plan

        interp = jax.default_backend() != "tpu"
        _fwd_cache = {}

        def fwd(p, g):
            b = g.atoms.shape[0]
            fn = _fwd_cache.get(b)
            if fn is None:
                plan = fragment_band_plan(b, pad_to)
                fn = jax.jit(
                    lambda p, g, _plan=plan: apply_banded_fragments(
                        p, cfg, g, plan=_plan, interpret=interp
                    )
                )
                _fwd_cache[b] = fn
            return fn(p, g)
    else:
        fwd = jax.jit(lambda p, g: gnn.apply_batched(p, cfg, g))
    loader = FragmentLoader(data, pad_to=pad_to, batch_size=batch_size, shuffle=False)
    element, prediction, shift, nm, class_name = [], [], [], [], []
    count = 0
    for g, y, w in loader.batches():
        yhat = np.asarray(fwd(params, Graph(*[jnp.asarray(a) for a in g])))
        for b in range(y.shape[0]):
            sel = w[b] > 0
            for n_i, yt, yp in zip(y[b][sel, 1], y[b][sel, 0], yhat[b][sel]):
                full = rev_names.get(int(n_i), "X-X")
                cls, atom = full.split("-", 1)
                nm.append(atom)
                class_name.append(cls)
                element.append(atom[0])
                prediction.append(float(yp))
                shift.append(float(yt))
        count += 1
        click.echo(f"\rComputing...{count}", nl=False)
    click.echo("done")

    out = pd.DataFrame(
        {"element": element, "y": shift, "yhat": prediction,
         "class": class_name, "name": nm}
    )
    out.to_csv(f"{model_name}.csv", index=False)

    results = {}
    for e in np.unique(out.element):
        sub = out[out.element == e]
        results[f"{data_name}-{e}-r"] = [len(sub.y), sub[["y", "yhat"]].corr().iloc[0, 1]]
    for n in np.unique(out.name):
        sub = out[out.name == n]
        results[f"{data_name}-{n}-r"] = [len(sub.y), sub[["y", "yhat"]].corr().iloc[0, 1]]
    for e in np.unique(out.element):
        sub = out[out.element == e]
        results[f"{data_name}-{e}-rmsd"] = [len(sub.y), np.mean((sub.yhat - sub.y) ** 2)]
    for n in np.unique(out.name):
        sub = out[out.name == n]
        results[f"{data_name}-{n}-rmsd"] = [len(sub.y), np.mean((sub.yhat - sub.y) ** 2)]
    results = pd.DataFrame(results, index=["N", model_name]).transpose()

    if merge is None:
        merge = f"{model_name}.md"
    elif os.path.exists(merge):
        other = pd.read_table(
            merge, sep="|", header=0, index_col=1, skipinitialspace=True
        ).dropna(axis=1, how="all").iloc[1:]
        other.columns = other.columns.str.replace(" ", "")
        results = pd.concat([results, other])
    with open(merge, "w") as f:
        f.write(results.to_markdown())
        f.write("\n")
    click.echo(f"Wrote {model_name}.csv and {merge}")


@main.command("eval-struct")
@click.argument("struct-files", nargs=-1, type=click.Path(exists=True))
@click.argument("output-csv")
@click.option("--model-file", type=click.Path(exists=True), default=None)
@click.option("--neighbor-number", default=16)
@click.option("--stride", default=1, help="trajectory frame stride")
@click.option("--device-graph/--host-graph", default=False,
              help="build neighbor lists on-device (TPU) instead of host")
@click.option("--fast/--no-fast", default=False,
              help="serve via the RCM-reordered block-sparse Pallas path")
@click.option("--precision", default="exact",
              type=click.Choice(["exact", "fast"]),
              help="fast-path numerics: 'exact' = f32, matches the plain "
                   "forward to roundoff; 'fast' = bf16 + Chebyshev edge "
                   "stage (~7e-3 ppm mean abs shift difference)")
@click.option("--profile", default=None, type=click.Path(),
              help="capture a jax.profiler trace (XProf) to this directory")
@click.option("--graph-parallel", default=0,
              help="partition atoms over N devices (multi-chip serving "
                   "through the banded partitioned forward; 0 = single "
                   "device)")
def eval_struct(struct_files, output_csv, model_file, neighbor_number, stride,
                device_graph, fast, precision, profile, graph_parallel):
    """Predict chemical shifts for structure file(s)
    (reference main.py:192-278). Writes per-atom CSV with confidence."""
    import pandas as pd

    import jax
    import jax.numpy as jnp

    from .data.parse import ANGSTROM_TO_NM, atoms_one_hot, inv_degree_np
    from .data.pdb import read_structure
    from .data.neighbors import neighbors_device, neighbors_host
    from .graph import Graph, bucket_size
    from .library import check_peaks, load_model
    from .models import gnn

    if not struct_files:
        raise click.UsageError("Must pass at least one structure file")
    params, cfg = load_model(model_file)

    t0 = time.time_ns()
    struct = read_structure(*struct_files)
    parse_ns = time.time_ns() - t0

    n = struct.n_atoms
    pad_n = bucket_size(n)
    atoms_np = atoms_one_hot(struct.elements, cfg.num_elements)
    atoms_pad = np.pad(atoms_np, ((0, pad_n - n), (0, 0)))

    fwd = jax.jit(lambda p, g: gnn.apply(p, cfg, g))
    serving = None
    if fast and device_graph:
        click.echo(
            "note: --device-graph is ignored with --fast (the serving "
            "path builds graphs host-side, pipelined with inference)",
            err=True,
        )
    if graph_parallel:
        from .models.serving import ServingModel
        from .parallel import make_mesh

        n_dev = len(jax.devices())
        if graph_parallel > n_dev:
            raise click.UsageError(
                f"--graph-parallel {graph_parallel} exceeds the "
                f"{n_dev} visible device(s)"
            )
        if n_dev % graph_parallel:
            used = (n_dev // graph_parallel) * graph_parallel
            click.echo(
                f"note: {n_dev} devices not divisible by "
                f"--graph-parallel {graph_parallel}; using {used}",
                err=True,
            )
        if fast:
            click.echo(
                "note: --fast is ignored with --graph-parallel (the "
                "partitioned banded forward is its own pipelined path); "
                "--precision fast applies bf16 arithmetic AND the "
                "Chebyshev edge stage inside the per-shard band builds",
                err=True,
            )
        mesh = make_mesh(
            data=n_dev // graph_parallel, graph=graph_parallel
        )
        serving = ServingModel(params, cfg, precision=precision, mesh=mesh)
        click.echo(f"graph-parallel serving: mesh {dict(mesh.shape)}")
    elif fast:
        from .models.serving import ServingModel

        serving = ServingModel(params, cfg, precision=precision)

    frames = range(0, struct.n_frames, stride)
    timing = {"graph": 0, "inference": 0, "output": 0, "read": parse_ns}
    rows = []
    backend = jax.default_backend()
    click.echo(f"Running on {backend} ({len(frames)} frame(s), {n} atoms)")
    import contextlib

    stack = contextlib.ExitStack()
    if profile:
        from .utils.profiling import trace

        stack.enter_context(trace(profile))
        click.echo(f"profiling to {profile}")

    def emit_frame(i, peaks, t):
        try:
            confident = check_peaks(atoms_np, peaks)
        except Warning as wrn:
            click.echo(f"warning: {wrn}", err=True)
            confident = np.zeros(n, bool)
        rows.append(
            pd.DataFrame(
                {
                    "index": np.arange(n),
                    "residues": struct.resnames,
                    "resids": struct.resids,
                    "names": struct.names,
                    "peaks": np.round(peaks, 2),
                    "confident": confident,
                    "time": np.repeat(float(i), n),
                    "frame": np.repeat(i, n),
                }
            )
        )
        timing["output"] += time.time_ns() - t
        click.echo("|".join(f"{k}:{v/1e9:5.2f}s" for k, v in timing.items()))

    if serving is not None:
        # Pipelined: host graph building overlaps device inference
        # (ServingModel.predict_trajectory); graph time is hidden inside
        # the inference bucket.
        t = time.time_ns()
        for i, peaks in serving.predict_trajectory(
            struct, stride=stride, neighbor_number=neighbor_number
        ):
            timing["inference"] += time.time_ns() - t
            emit_frame(i, peaks, time.time_ns())
            t = time.time_ns()
        stack.close()
        pd.concat(rows).to_csv(output_csv, index=False)
        click.echo(f"Done. Results in {output_csv}")
        return

    for i in frames:
        t = time.time_ns()
        if device_graph:
            coords = jnp.asarray(
                np.pad(struct.coords[i], ((0, pad_n - n), (0, 0)))
            )
            nlist, dists = neighbors_device(coords, neighbor_number, n_real=jnp.int32(n))
            edges = dists * ANGSTROM_TO_NM
            from .graph import inv_degree_from_nlist

            g = Graph(jnp.asarray(atoms_pad), nlist, edges, inv_degree_from_nlist(nlist))
        else:
            nlist_np, dists_np = neighbors_host(struct.coords[i], neighbor_number)
            edges_np = (dists_np * ANGSTROM_TO_NM).astype(np.float32)
            nlist_pad = np.pad(nlist_np, ((0, pad_n - n), (0, 0)))
            g = Graph(
                jnp.asarray(atoms_pad),
                jnp.asarray(nlist_pad),
                jnp.asarray(np.pad(edges_np, ((0, pad_n - n), (0, 0)))),
                jnp.asarray(np.pad(inv_degree_np(nlist_np), ((0, pad_n - n),))),
            )
        timing["graph"] += time.time_ns() - t
        t = time.time_ns()
        peaks = np.asarray(fwd(params, g))[:n]
        timing["inference"] += time.time_ns() - t
        emit_frame(i, peaks, time.time_ns())
    stack.close()
    pd.concat(rows).to_csv(output_csv, index=False)
    click.echo(f"Done. Results in {output_csv}")


@main.command("make-fragments")
@click.argument("struct-files", nargs=-1, type=click.Path(exists=True))
@click.argument("output-tfrecord")
@click.option("--fragment-size", default=256)
@click.option("--neighbor-number", default=16)
@click.option("--frames", default=None, type=int, help="limit trajectory frames")
def make_fragments(struct_files, output_tfrecord, fragment_size, neighbor_number, frames):
    """Fragment structures into a training TFRecord (native replacement
    for the external nmrdata preprocessing; synthetic labels unless a
    shift table is provided — see data.fragment)."""
    from .data.fragment import write_structure_fragments
    from .data.pdb import read_structure

    total = 0
    for sf in struct_files:
        struct = read_structure(sf)
        r = range(min(frames, struct.n_frames)) if frames else None
        total += write_structure_fragments(
            output_tfrecord, struct, frames=r,
            fragment_size=fragment_size, neighbor_number=neighbor_number,
        )
    click.echo(f"Wrote {total} fragments to {output_tfrecord}")


@main.command("make-struct-records")
@click.argument("struct-files", nargs=-1, type=click.Path(exists=True))
@click.argument("output-tfrecord")
@click.option("--neighbor-number", default=16)
@click.option("--frames", default=None, type=int, help="limit trajectory frames")
@click.option("--shifts", "shifts_csv", default=None, type=click.Path(exists=True),
              help="CSV of real labels with columns index,shift[,frame] "
                   "(atoms absent from the CSV train unlabeled); synthetic "
                   "geometry-derived labels otherwise")
def make_struct_records(struct_files, output_tfrecord, neighbor_number, frames,
                        shifts_csv):
    """Write WHOLE-STRUCTURE labeled records (one per frame) — the input
    for graph-partitioned training (`train --graph-parallel N`), which
    trains on the intact protein with no fragmenting (the reference can
    only train on ~256-atom fragments, SURVEY.md App. B)."""
    from .data.fragment import write_structure_records
    from .data.pdb import read_structure

    if shifts_csv and len(struct_files) > 1:
        # the CSV indexes atoms of ONE structure; applying it to every
        # file would silently mislabel all but the first
        raise click.UsageError(
            "--shifts labels a single structure; run make-struct-records "
            "once per structure (append by reusing the output path is "
            "not supported with --shifts)"
        )
    total = 0
    append = False
    for sf in struct_files:
        struct = read_structure(sf)
        r = range(min(frames, struct.n_frames)) if frames else None
        shifts = None
        if shifts_csv:
            import pandas as pd

            df = pd.read_csv(shifts_csv)
            nf = struct.n_frames if r is None else len(r)
            shifts = np.full((nf, struct.n_atoms), np.nan, np.float32)
            fcol = df["frame"] if "frame" in df else np.zeros(len(df), int)
            for f, i, s in zip(fcol, df["index"], df["shift"]):
                if int(f) < nf:
                    shifts[int(f), int(i)] = s
        total += write_structure_records(
            output_tfrecord, struct, frames=r, shifts=shifts,
            neighbor_number=neighbor_number, append=append,
        )
        append = True
    click.echo(f"Wrote {total} whole-structure records to {output_tfrecord}")


@main.command("make-organic")
@click.argument("output-tfrecord")
@click.option("--molecules", default=500, help="number of synthetic molecules")
@click.option("--seed", default=0)
@click.option("--append/--no-append", default=False)
def make_organic(output_tfrecord, molecules, seed, append):
    """Generate a synthetic organic small-molecule TFRecord with MB/DFT
    name classes (combined protein + organic training; the Mol-* rows of
    the reference's table come from this data family)."""
    from .data.organic import write_organic_fragments

    n = write_organic_fragments(
        output_tfrecord, n_molecules=molecules, seed=seed, append=append
    )
    click.echo(f"Wrote {n} molecules to {output_tfrecord}")


@main.command("import-reference")
# no exists=True: a TF checkpoint *prefix* (foo/variables) is not itself
# a file — foo/variables.index is
@click.argument("checkpoint", type=click.Path())
@click.argument("out-dir", type=click.Path())
@click.option("--config", "config_path", default=None,
              type=click.Path(exists=True),
              help="ModelConfig JSON; inferred from weight shapes if omitted")
def import_reference(checkpoint, out_dir, config_path):
    """Convert a reference TF SavedModel dir / TF checkpoint prefix into a
    native model directory (params.msgpack + config.json), so the
    published baseline weights drop in the moment they are reachable
    (reference load path: library.py:92-103). Point OUT-DIR at
    nmrgnn_tpu/models/baseline to replace the bundled weights."""
    from .compat import import_reference_checkpoint
    from .config import ModelConfig
    from .library import save_model
    from .models.gnn import count_params

    cfg = None
    if config_path:
        with open(config_path) as f:
            cfg = ModelConfig.from_json(f.read())
    params, cfg = import_reference_checkpoint(checkpoint, config=cfg)
    save_model(out_dir, params, cfg)
    click.echo(
        f"Imported {count_params(params)} params from {checkpoint} "
        f"-> {out_dir}"
    )


@main.command()
@click.argument("tfrecords", nargs=-1, type=click.Path(exists=True))
@click.argument("epochs", default=3)
@click.option("--tuning_path", default="tuning")
@click.option("--embeddings", default=None)
@click.option("--validation", default=0.1)
@click.option("--trials", default=8, help="number of sampled configurations")
@click.option("--seed", default=0)
@click.option("--batch-size", default=8)
@click.option("--pad-to", default=256)
def hyper(tfrecords, epochs, tuning_path, embeddings, validation, trials, seed,
          batch_size, pad_to):
    """Tune hyperparameters (reference main.py:281-339) with a native
    successive-halving random search over the reference's HP space."""
    from .train.hyper import run_hyper

    if not tfrecords:
        raise click.UsageError("Must give input TFRecord files")
    best = run_hyper(
        list(tfrecords), epochs=epochs, validation=validation,
        trials=trials, tuning_path=tuning_path, seed=seed,
        embeddings_path=embeddings, batch_size=batch_size, pad_to=pad_to,
    )
    click.echo(f"Best config written to {tuning_path}/best_config.json")
    click.echo(best.to_json())


if __name__ == "__main__":
    main()
