"""Unit tests for numeric primitives: resize parity vs TF1, norms, spatial
grid, losses (golden values vs TF where available)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmpc_refseg_tpu.ops.resize import resize_bilinear
from cmpc_refseg_tpu.ops.normalization import l2_normalize, tf1_layer_norm
from cmpc_refseg_tpu.ops.spatial import spatial_coordinate_grid, spatial_batch
from cmpc_refseg_tpu.ops import losses
from cmpc_refseg_tpu.ops import metrics

tf = pytest.importorskip("tensorflow")


class TestResizeBilinear:
    @pytest.mark.parametrize("in_hw,out_hw", [
        ((40, 40), (320, 320)),   # score upsample (CMPC_model.py:141)
        ((320, 320), (40, 40)),   # target downsample (CMPC_model.py:439)
        ((13, 17), (29, 31)),     # odd sizes
        ((8, 8), (8, 8)),         # identity
        ((40, 40), (80, 80)),     # v3+ decoder upsample
    ])
    def test_matches_tf1_resize_bilinear(self, rng, in_hw, out_hw):
        x = rng.standard_normal((2, *in_hw, 3)).astype(np.float32)
        want = tf.compat.v1.image.resize_bilinear(
            tf.constant(x), out_hw).numpy()
        got = np.asarray(resize_bilinear(jnp.asarray(x), *out_hw))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_2d_and_3d_inputs(self, rng):
        x = rng.standard_normal((16, 16)).astype(np.float32)
        y = resize_bilinear(jnp.asarray(x), 32, 32)
        assert y.shape == (32, 32)
        x3 = rng.standard_normal((16, 16, 4)).astype(np.float32)
        y3 = resize_bilinear(jnp.asarray(x3), 8, 8)
        assert y3.shape == (8, 8, 4)


class TestNormalization:
    def test_l2_normalize_matches_tf(self, rng):
        x = rng.standard_normal((2, 5, 7)).astype(np.float32)
        want = tf.nn.l2_normalize(tf.constant(x), axis=-1).numpy()
        got = np.asarray(l2_normalize(jnp.asarray(x), axis=-1))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_l2_normalize_zero_safe(self):
        x = jnp.zeros((3, 4))
        assert np.all(np.isfinite(np.asarray(l2_normalize(x))))

    def test_tf1_layer_norm_whole_sample_semantics(self, rng):
        # tf.contrib.layers.layer_norm normalizes over axes 1..N-1 jointly.
        x = rng.standard_normal((2, 1, 6, 8)).astype(np.float32)
        gamma = rng.standard_normal(8).astype(np.float32)
        beta = rng.standard_normal(8).astype(np.float32)
        got = np.asarray(tf1_layer_norm(jnp.asarray(x), gamma, beta))
        xr = x.reshape(2, -1)
        mean = xr.mean(axis=1).reshape(2, 1, 1, 1)
        var = xr.var(axis=1).reshape(2, 1, 1, 1)
        want = (x - mean) / np.sqrt(var + 1e-12) * gamma + beta
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestSpatialGrid:
    def test_matches_reference_loop(self):
        # Direct port of util/processing_tools.py:5-17 as the golden
        h, w = 5, 7
        want = np.zeros((h, w, 8), dtype=np.float32)
        for i in range(h):
            for j in range(w):
                xmin = j / w * 2 - 1
                xmax = (j + 1) / w * 2 - 1
                ymin = i / h * 2 - 1
                ymax = (i + 1) / h * 2 - 1
                want[i, j] = [xmin, ymin, xmax, ymax, (xmin + xmax) / 2,
                              (ymin + ymax) / 2, 1 / w, 1 / h]
        got = np.asarray(spatial_coordinate_grid(h, w))
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_batch_shape(self):
        assert spatial_batch(3, 4, 4).shape == (3, 4, 4, 8)


class TestLosses:
    def test_weighed_logistic_loss_matches_tf(self, rng):
        logits = rng.standard_normal((2, 8, 8, 1)).astype(np.float32)
        labels = (rng.random((2, 8, 8, 1)) > 0.5).astype(np.float32)
        ce = tf.nn.sigmoid_cross_entropy_with_logits(
            logits=tf.constant(logits), labels=tf.constant(labels))
        want = tf.reduce_mean(tf.reduce_sum(ce, [1, 2, 3])).numpy()
        got = float(losses.weighed_logistic_loss(
            jnp.asarray(logits), jnp.asarray(labels), 1, 1))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_pos_weighting(self, rng):
        logits = jnp.asarray(rng.standard_normal((1, 4, 4, 1)), jnp.float32)
        labels = jnp.ones((1, 4, 4, 1), jnp.float32)
        unw = losses.weighed_logistic_loss(logits, labels, 1, 1)
        w3 = losses.weighed_logistic_loss(logits, labels, 3, 1)
        np.testing.assert_allclose(float(w3), 3 * float(unw), rtol=1e-5)

    def test_l2_regularization(self):
        ps = [jnp.ones((2, 2)), 2 * jnp.ones(3)]
        # 0.5*(4*1) + 0.5*(3*4) = 2 + 6 = 8; wd=0.1 -> 0.8
        np.testing.assert_allclose(
            float(losses.l2_regularization_loss(ps, 0.1)), 0.8, rtol=1e-6)

    def test_dice_and_iou_perfect_prediction(self):
        labels = jnp.ones((1, 4, 4, 1))
        logits = 100.0 * jnp.ones((1, 4, 4, 1))
        assert float(losses.dsc_loss(logits, labels)) < 1e-3
        assert float(losses.iou_loss(logits, labels)) < 1e-3


class TestMetrics:
    def test_mask_iu(self):
        pred = np.zeros((4, 4), bool)
        pred[:2] = True
        tgt = np.zeros((4, 4), bool)
        tgt[1:3] = True
        i, u = metrics.mask_intersection_union(jnp.asarray(pred),
                                               jnp.asarray(tgt))
        assert int(i) == 4 and int(u) == 12

    def test_accumulator(self):
        acc = metrics.SegEvalAccumulator()
        acc.update(8, 10)   # IoU .8 -> counts for .5,.6,.7,.8
        acc.update(1, 10)   # IoU .1 -> none
        r = acc.result()
        np.testing.assert_allclose(r["overall_iou"], 9 / 20)
        np.testing.assert_allclose(r["mean_iou"], (0.8 + 0.1) / 2)
        assert r["prec@0.5"] == 0.5 and r["prec@0.9"] == 0.0
