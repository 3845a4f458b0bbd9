"""Trainer tests: loss actually decreases on learnable synthetic data,
checkpoint/resume round-trips, plateau LR schedule fires, metric
accumulation is sum-based (not last-batch)."""
import numpy as np
import pytest

from nmrgnn_tpu.config import ModelConfig, TrainConfig
from nmrgnn_tpu.data.dataset import read_fragments
from nmrgnn_tpu.data.fragment import write_structure_fragments
from nmrgnn_tpu.data.pdb import read_structure
from nmrgnn_tpu.train.trainer import Trainer, finalize_metric

PDB_108M = "/root/reference/tests/108M.pdb"

SMALL = ModelConfig(
    atom_feature_size=32,
    edge_hidden_size=16,
    mp_layers=2,
    fc_layers=2,
    edge_fc_layers=2,
    learning_rate=1e-3,
    dropout=False,
    noise=0.0,
)


@pytest.fixture(scope="module")
def samples(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("train") / "frags.tfrecord")
    struct = read_structure(PDB_108M)
    write_structure_fragments(path, struct, frames=range(1), fragment_size=64)
    return list(read_fragments(path))


class TestTrainer:
    def test_loss_decreases(self, samples):
        tr = Trainer(SMALL, TrainConfig(epochs=5, batch_size=4, pad_to=64, seed=0))
        state = tr.fit(samples[:16], samples[16:20], verbose=False)
        losses = state.history["loss"]
        assert losses[-1] < losses[0] * 0.9, losses

    def test_checkpoint_resume(self, samples, tmp_path):
        ckpt = str(tmp_path / "ckpt")
        tr = Trainer(SMALL, TrainConfig(epochs=2, batch_size=4, pad_to=64))
        state = tr.fit(samples[:8], samples[8:10], checkpoint_path=ckpt, verbose=False)
        tr2 = Trainer(SMALL, TrainConfig(epochs=1, batch_size=4, pad_to=64))
        restored = tr2.load_checkpoint(ckpt)
        assert restored.epoch == 2
        for a, b in zip(
            np.asarray(list(state.params["mp"][0].values())),
            np.asarray(list(restored.params["mp"][0].values())),
        ):
            np.testing.assert_allclose(a, b)
        # resumed training continues without error
        restored2 = tr2.fit(
            samples[:8], samples[8:10], state=restored, verbose=False, epochs=1
        )
        assert restored2.epoch == 3

    def test_plateau_reduces_lr(self, samples):
        tcfg = TrainConfig(
            epochs=4, batch_size=4, pad_to=64, lr_patience=1, lr_reduce_factor=0.5,
            min_lr=1e-6,
        )
        tr = Trainer(SMALL.replace(learning_rate=1e-2), tcfg)
        # lr too large to converge on 4 samples in 4 epochs reliably; force
        # plateau by evaluating against an unrelated val set
        state = tr.fit(samples[:4], samples[4:6], verbose=False)
        # with patience 1 over 4 epochs, at least one reduction usually
        # fires; lr must never exceed its start and never drop below min_lr
        assert state.lr <= 1e-2 and state.lr >= tcfg.min_lr
        # lr at min_lr stays put (Keras ReduceLROnPlateau semantics)
        tr2 = Trainer(SMALL.replace(learning_rate=1e-6), tcfg)
        st2 = tr2.fit(samples[:4], samples[4:6], verbose=False)
        assert st2.lr == pytest.approx(1e-6)

    def test_evaluate_metrics_finite(self, samples):
        tr = Trainer(SMALL, TrainConfig(batch_size=4, pad_to=64))
        state = tr.init_state()
        out = tr.evaluate_loader(
            __import__("nmrgnn_tpu.data.dataset", fromlist=["FragmentLoader"]).FragmentLoader(
                samples[:8], pad_to=64, batch_size=4, shuffle=False
            ),
            params=state.params,
        )
        assert "loss" in out and np.isfinite(out["loss"])
        assert "h_rmsd" in out and out["avg_ha_count"] >= 0


class TestNativeRecipe:
    def test_cosine_schedule_and_ema(self, samples, tmp_path):
        """Cosine warmup+decay drives lr; EMA weights exist, differ from
        the raw weights, and are the ones evaluated/checkpointed."""
        tcfg = TrainConfig(
            epochs=6, batch_size=4, pad_to=64, lr_schedule="cosine",
            warmup_epochs=2, cosine_final_lr=1e-5, ema_decay=0.9,
        )
        tr = Trainer(SMALL, tcfg)
        ckpt = str(tmp_path / "ckpt")
        state = tr.fit(samples[:16], samples[16:20], verbose=False,
                       checkpoint_path=ckpt)
        lrs = state.history["lr"]
        # warmup ascends, then decays toward the floor
        assert lrs[0] < lrs[1] and lrs[-1] < lrs[2]
        assert state.ema_params is not None
        raw = np.asarray(state.params["out"]["kernel"])
        ema = np.asarray(state.ema_params["out"]["kernel"])
        assert not np.allclose(raw, ema)
        assert state.eval_params is state.ema_params
        restored = tr.load_checkpoint(ckpt)
        np.testing.assert_allclose(
            np.asarray(restored.ema_params["out"]["kernel"]), ema
        )

    def test_restore_best(self, samples):
        """restore_best hands back the weights from the best-val epoch."""
        tcfg = TrainConfig(
            epochs=5, batch_size=4, pad_to=64, restore_best=True,
        )
        best_by_epoch = []
        tr = Trainer(SMALL, tcfg)
        state = tr.fit(
            samples[:16], samples[16:20], verbose=False,
            callbacks=[lambda st, logs: best_by_epoch.append(logs["val_loss"])],
        )
        # evaluation of the returned params reproduces the best epoch's val
        out = tr.evaluate(samples[16:20], state.eval_params)
        assert out["loss"] == pytest.approx(min(best_by_epoch), rel=1e-4)


BANDED = ModelConfig(
    atom_feature_size=128,
    edge_hidden_size=16,
    mp_layers=2,
    fc_layers=2,
    edge_fc_layers=2,
    learning_rate=1e-3,
    noise=0.025,
    dropout=True,
)


class TestBandedTrainingPath:
    """The production banded fast path (TrainConfig.mp_path) must be a
    drop-in for the gather math: same rng stream, same draws, grads and
    trained params equal to roundoff (VERDICT r3 item 1)."""

    @pytest.fixture(scope="class")
    def frag128(self, tmp_path_factory):
        path = str(tmp_path_factory.mktemp("banded") / "frags.tfrecord")
        struct = read_structure(PDB_108M)
        write_structure_fragments(path, struct, frames=range(1), fragment_size=100)
        return list(read_fragments(path))

    def test_grad_parity_same_rng(self, frag128):
        import jax
        import jax.numpy as jnp

        from nmrgnn_tpu.data.dataset import batch_samples
        from nmrgnn_tpu.graph import Graph
        from nmrgnn_tpu.models import gnn
        from nmrgnn_tpu.models.infer import apply_banded_fragments

        g, y, w = batch_samples(frag128[:4], 128)
        graph = Graph(*[jnp.asarray(a) for a in g])
        params = gnn.init_params(jax.random.PRNGKey(1), BANDED)
        key = jax.random.PRNGKey(7)
        wj = jnp.asarray(w)

        def loss_gather(p):
            return jnp.sum(
                gnn.apply_batched(p, BANDED, graph, training=True, rng=key) * wj
            )

        def loss_banded(p):
            rngs = jax.random.split(key, 4)
            return jnp.sum(
                apply_banded_fragments(
                    p, BANDED, graph, training=True, rngs=rngs, interpret=True
                )
                * wj
            )

        l1, g1 = jax.value_and_grad(loss_gather)(params)
        l2, g2 = jax.value_and_grad(loss_banded)(params)
        # identical noise/dropout draws (same split order) => roundoff-only
        assert float(l1) == pytest.approx(float(l2), rel=1e-5)
        for (k1, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g1),
            jax.tree_util.tree_leaves_with_path(g2),
        ):
            scale = float(jnp.max(jnp.abs(a))) + 1e-9
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4 * scale,
                err_msg=jax.tree_util.keystr(k1),
            )

    def test_trained_params_match_gather(self, frag128):
        import jax

        def run(mp_path, mesh=None):
            tr = Trainer(
                BANDED,
                TrainConfig(epochs=1, batch_size=4, pad_to=128, seed=0,
                            mp_path=mp_path),
                mesh=mesh,
            )
            return tr, tr.fit(frag128[:8], frag128[8:10], verbose=False)

        tg, sg = run("gather")
        tb, sb = run("banded")
        assert not tg.use_banded and tb.use_banded
        for (k, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(sg.params),
            jax.tree_util.tree_leaves_with_path(sb.params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5,
                err_msg=jax.tree_util.keystr(k),
            )
        assert sg.history["loss"][0] == pytest.approx(
            sb.history["loss"][0], rel=1e-5
        )

    def test_banded_dp_mesh_matches_single_device(self, frag128):
        """Data-parallel banded training (shard_map over 'data') equals
        the single-device banded step."""
        import jax

        from nmrgnn_tpu.parallel import make_mesh

        tcfg = TrainConfig(epochs=1, batch_size=4, pad_to=128, seed=0,
                           mp_path="banded")
        t1 = Trainer(BANDED, tcfg)
        s1 = t1.fit(frag128[:8], frag128[8:10], verbose=False)
        mesh = make_mesh(data=2, graph=1)
        t2 = Trainer(BANDED, tcfg, mesh=mesh)
        s2 = t2.fit(frag128[:8], frag128[8:10], verbose=False)
        for (k, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(s1.params),
            jax.tree_util.tree_leaves_with_path(s2.params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5,
                err_msg=jax.tree_util.keystr(k),
            )

    def test_auto_resolution_and_validation(self):
        # CPU backend: auto resolves to gather
        tr = Trainer(BANDED, TrainConfig(mp_path="auto", pad_to=128))
        assert not tr.use_banded
        # ineligible config + forced banded is a loud error
        with pytest.raises(ValueError):
            Trainer(SMALL, TrainConfig(mp_path="banded", pad_to=64))
        with pytest.raises(ValueError):
            Trainer(BANDED, TrainConfig(mp_path="nope"))

    def test_vmem_gate_on_oversized_batch(self):
        """mp_banded holds the whole flattened [B*N, F] node table in
        VMEM; a batch/pad combination whose working set exceeds the
        budget must raise for mp_path='banded' and fall back to gather
        for 'auto' (instead of a runtime Mosaic allocation failure)."""
        big = TrainConfig(mp_path="banded", batch_size=64, pad_to=512)
        with pytest.raises(ValueError, match="VMEM"):
            Trainer(BANDED, big)
        tr = Trainer(BANDED, TrainConfig(mp_path="auto", batch_size=64,
                                         pad_to=512))
        assert not tr.use_banded
        # the default training shape still fits (the gate must not
        # disable the production fast path)
        from nmrgnn_tpu.models.infer import fragment_band_plan
        from nmrgnn_tpu.ops.banded import plan_fits_vmem

        d = TrainConfig()
        assert plan_fits_vmem(
            fragment_band_plan(d.batch_size, d.pad_to),
            BANDED.atom_feature_size,
        )


class TestNanRecovery:
    def test_nan_loss_recovers(self, samples):
        """A diverging run (huge lr) restores the last finite snapshot
        and halves the lr instead of corrupting the model."""
        tcfg = TrainConfig(epochs=6, batch_size=4, pad_to=64, min_lr=1e-8)
        tr = Trainer(SMALL.replace(learning_rate=1e6), tcfg)  # diverges fast
        try:
            state = tr.fit(samples[:8], samples[8:10], verbose=False)
            # either it recovered (finite history) ...
            assert all(np.isfinite(v) for v in state.history["loss"])
        except FloatingPointError:
            # ... or exhausted retries with a clear error — never silent NaN
            pass


class TestMetricFinalize:
    def test_rmsd(self):
        m = np.array([4.0, 0, 0, 0, 0, 0, 16.0])
        assert finalize_metric("rmsd", m) == pytest.approx(2.0)

    def test_corr_perfect(self):
        x = np.arange(10.0)
        w = np.ones(10)
        m = np.array(
            [w.sum(), (w * x).sum(), (w * x).sum(), (w * x * x).sum(),
             (w * x * x).sum(), (w * x * x).sum(), 0.0]
        )
        assert finalize_metric("corr", m) == pytest.approx(1.0)

    def test_count_and_empty(self):
        assert finalize_metric("count", np.zeros(7)) == 0.0
        assert finalize_metric("rmsd", np.zeros(7)) == 0.0
        assert finalize_metric("corr", np.zeros(7)) == 0.0
