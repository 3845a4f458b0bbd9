"""Loss/metric tests, including the reference's hand-computed golden values
(reference tests/test_nmrgnn.py:111-137 for NameRMSD, :188-195 for NameLoss)."""
import jax.numpy as jnp
import numpy as np
import pytest

from nmrgnn_tpu.data import load_embeddings
from nmrgnn_tpu.train.losses import corr_coeff, name_loss
from nmrgnn_tpu.train.metrics import (
    build_metric_fns,
    name_corr,
    name_count,
    name_rmsd,
    type_mask,
)

EMB = {"name": {"ALA-N": 4, "GLU-N": 2, "GLU-H": 3}}


def make_y(names, weights=None):
    n = len(names)
    shifts = np.zeros(n, np.float32)
    w = np.ones(n, np.float32) if weights is None else np.asarray(weights, np.float32)
    return jnp.asarray(np.stack([shifts, np.asarray(names, np.float32), w], axis=1))


class TestTypeMask:
    def test_regex(self):
        assert sorted(type_mask(r".*\-H", EMB, regex=True)) == [3]
        assert sorted(type_mask(r"GLU\-.*", EMB, regex=True)) == [2, 3]
        assert type_mask("ALA-N", EMB) == [4]

    def test_no_match_raises(self):
        with pytest.raises(ValueError):
            type_mask(r"LYS\-.*", EMB, regex=True)


class TestNameRMSD:
    """Golden values from reference tests/test_nmrgnn.py:113-134."""

    y = make_y([4.0, 3, 3, 2, 4])

    def test_h_group(self):
        y_pred = np.zeros(5, np.float32)
        y_pred[1] = 5
        got = name_rmsd(self.y, jnp.asarray(y_pred), type_mask(r".*\-H", EMB, regex=True))
        np.testing.assert_allclose(float(got), np.sqrt(5.0**2 / 2), rtol=1e-6)

    def test_exact_name(self):
        y_pred = np.zeros(5, np.float32)
        y_pred[1] = 5
        got = name_rmsd(self.y, jnp.asarray(y_pred), type_mask(r"GLU-H", EMB, regex=True))
        np.testing.assert_allclose(float(got), np.sqrt(5.0**2 / 2), rtol=1e-6)

    def test_glu_group(self):
        y_pred = np.zeros(5, np.float32)
        y_pred[-2] = 5
        got = name_rmsd(self.y, jnp.asarray(y_pred), type_mask(r"GLU\-.*", EMB, regex=True))
        np.testing.assert_allclose(float(got), np.sqrt(5.0**2 / 3), rtol=1e-6)

    def test_weight_flag_masks(self):
        y = make_y([3, 3, 3], weights=[1, 0, 1])
        y_pred = jnp.asarray(np.array([2.0, 100.0, 2.0], np.float32))
        got = name_rmsd(y, y_pred, [3])
        np.testing.assert_allclose(float(got), 2.0, rtol=1e-6)


class TestCorr:
    def test_perfect_corr(self):
        x = jnp.asarray(np.arange(10, dtype=np.float32))
        y = 2 * x + 1
        np.testing.assert_allclose(float(corr_coeff(x, y)), 1.0, atol=1e-5)

    def test_anticorr(self):
        x = jnp.asarray(np.arange(10, dtype=np.float32))
        np.testing.assert_allclose(float(corr_coeff(x, -x)), -1.0, atol=1e-5)

    def test_vs_numpy(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=50).astype(np.float32)
        y = rng.normal(size=50).astype(np.float32)
        want = np.corrcoef(x, y)[0, 1]
        np.testing.assert_allclose(float(corr_coeff(jnp.asarray(x), jnp.asarray(y))), want, atol=1e-4)

    def test_degenerate_zero(self):
        x = jnp.zeros(5)
        assert float(corr_coeff(x, x)) == 0.0  # divide_no_nan semantics

    def test_name_corr_masked(self):
        y = make_y([3, 3, 2, 3, 3])
        yt = np.array(y)
        yt[:, 0] = [1, 2, 99, 3, 4]
        y = jnp.asarray(yt)
        y_pred = jnp.asarray(np.array([2.0, 4, 0, 6, 8], np.float32))
        got = name_corr(y, y_pred, [3])
        np.testing.assert_allclose(float(got), 1.0, atol=1e-5)


class TestNameLoss:
    def test_pure_l2(self):
        y = make_y([3, 3, 2])
        yt = np.array(y)
        yt[:, 0] = [1.0, 2.0, 50.0]
        y = jnp.asarray(yt)
        y_pred = jnp.asarray(np.array([0.0, 0.0, 0.0], np.float32))
        got = name_loss(y, y_pred, [3], s=1.0)
        np.testing.assert_allclose(float(got), (1 + 4) / 2, rtol=1e-6)

    def test_balanced(self):
        y = make_y([3, 3, 3, 3])
        yt = np.array(y)
        yt[:, 0] = [1, 2, 3, 4]
        y = jnp.asarray(yt)
        y_pred = jnp.asarray(np.array([1.0, 2, 3, 4], np.float32))
        # perfect prediction: l2=0, r=1 -> loss = 0 for any s
        got = name_loss(y, y_pred, [3], s=0.5)
        np.testing.assert_allclose(float(got), 0.0, atol=1e-5)

    def test_smoke_reference_shape(self):
        # reference tests/test_nmrgnn.py:188-195
        y = make_y([4.0, 3, 3, 2, 4])[:, :2]
        y = jnp.concatenate([y, jnp.ones((5, 1))], axis=1)
        y_pred = jnp.ones(5)
        got = name_loss(y, y_pred, type_mask(r".*\-H", EMB, regex=True), s=0.5)
        assert np.isfinite(float(got))


class TestMetricSuite:
    def test_builds_all_15(self):
        fns = build_metric_fns(load_embeddings())
        assert len(fns) == 15
        y = make_y([1, 2, 3])
        y_pred = jnp.zeros(3)
        for name, fn in fns.items():
            assert np.isfinite(float(fn(y, y_pred))) or "r" in name
