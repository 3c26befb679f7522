"""Golden parity tests against real TensorFlow ops via tf.compat.v1.

SURVEY.md lists 'numeric parity with TF1 idioms' as the top rebuild risk:
the reference leans on tf.image.resize_bilinear (no half-pixel centers),
dynamic_rnn zero-output-after-length semantics, LSTMCell gate order, and
sigmoid CE.  TF 2.x ships all of these under tf.compat.v1 — so we check our
implementations against the actual TF kernels, not a reimplementation.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


class TestResizeParity:
    def test_resize_bilinear_random_shapes(self, rng):
        """20 random shape pairs — exhaustive parity of the grid mapping."""
        from cmpc_refseg_tpu.ops.resize import resize_bilinear
        import jax.numpy as jnp2
        for _ in range(20):
            ih, iw = int(rng.integers(2, 90)), int(rng.integers(2, 90))
            oh, ow = int(rng.integers(2, 90)), int(rng.integers(2, 90))
            x = rng.standard_normal((1, ih, iw, 2)).astype(np.float32)
            want = tf.compat.v1.image.resize_bilinear(
                tf.constant(x), (oh, ow), align_corners=False).numpy()
            got = np.asarray(resize_bilinear(jnp2.asarray(x), oh, ow))
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=5e-5,
                                       err_msg=f"{(ih,iw)}->{(oh,ow)}")

    @pytest.mark.parametrize("in_hw,out_hw", [
        ((40, 40), (320, 320)), ((13, 17), (64, 48)), ((64, 48), (13, 17)),
        ((8, 8), (8, 8)),
    ])
    def test_resize_bilinear_matches_tf1(self, rng, in_hw, out_hw):
        from cmpc_refseg_tpu.ops.resize import resize_bilinear
        x = rng.standard_normal((2, *in_hw, 3)).astype(np.float32)
        want = tf.compat.v1.image.resize_bilinear(
            tf.constant(x), out_hw, align_corners=False).numpy()
        got = np.asarray(resize_bilinear(jnp.asarray(x), *out_hw))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


class TestLossParity:
    def test_weighed_logistic_loss_matches_tf(self, rng):
        """reference util/loss.py:6-16: sigmoid CE with pos/neg weights,
        sum over HW, mean over batch."""
        from cmpc_refseg_tpu.ops.losses import weighed_logistic_loss
        scores = rng.standard_normal((2, 5, 5, 1)).astype(np.float32)
        labels = (rng.random((2, 5, 5, 1)) > 0.5).astype(np.float32)
        pos_mult, neg_mult = 1.5, 0.5

        ce = tf.nn.sigmoid_cross_entropy_with_logits(
            labels=tf.constant(labels), logits=tf.constant(scores))
        w = labels * pos_mult + (1 - labels) * neg_mult
        want = tf.reduce_mean(
            tf.reduce_sum(ce * w, axis=[1, 2, 3])).numpy()
        got = float(weighed_logistic_loss(jnp.asarray(scores),
                                          jnp.asarray(labels),
                                          pos_mult, neg_mult))
        np.testing.assert_allclose(got, want, rtol=1e-5)


class TestLSTMParity:
    """Golden: tf.raw_ops.BlockLSTMV2 — TF's canonical fused LSTM kernel
    with the same ICFO (i, j/c, f, o) weight layout and forget_bias
    semantics as TF1's LSTMCell (Keras 3 removed compat.v1 rnn_cell)."""

    def _tf_block_lstm(self, x, kernel, bias, hidden):
        b, t, d = x.shape
        out = tf.raw_ops.BlockLSTM(
            seq_len_max=tf.constant(t, tf.int64),
            x=tf.constant(np.swapaxes(x, 0, 1)),          # [T,B,D]
            cs_prev=tf.zeros((b, hidden)),
            h_prev=tf.zeros((b, hidden)),
            w=tf.constant(kernel), wci=tf.zeros((hidden,)),
            wcf=tf.zeros((hidden,)), wco=tf.zeros((hidden,)),
            b=tf.constant(bias), use_peephole=False, forget_bias=1.0,
            cell_clip=-1.0)
        return np.swapaxes(out.h.numpy(), 0, 1)           # [B,T,H]

    def test_lstm_scan_matches_tf_block_lstm(self, rng):
        from cmpc_refseg_tpu.models.language import lstm_scan
        b, t, d, h = 2, 7, 5, 6
        x = rng.standard_normal((b, t, d)).astype(np.float32)
        kernel = (0.3 * rng.standard_normal((d + h, 4 * h))).astype(
            np.float32)
        bias = (0.1 * rng.standard_normal((4 * h,))).astype(np.float32)
        want_h = self._tf_block_lstm(x, kernel, bias, h)

        seq_len = np.asarray([4, 7], np.int32)
        got_out, got_final = lstm_scan(
            {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(bias)},
            jnp.asarray(x), jnp.asarray(seq_len))
        got_out = np.asarray(got_out)
        # valid positions match the TF kernel exactly
        np.testing.assert_allclose(got_out[0, :4], want_h[0, :4],
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(got_out[1], want_h[1],
                                   rtol=1e-5, atol=1e-5)
        # dynamic_rnn semantics: zero outputs and frozen state past seq_len
        assert np.all(got_out[0, 4:] == 0)
        np.testing.assert_allclose(np.asarray(got_final)[0], want_h[0, 3],
                                   rtol=1e-5, atol=1e-5)

    def test_reverse_scan_matches_tf_reverse_sequence(self, rng):
        """reverse=True == tf.reverse_sequence -> forward LSTM -> re-reverse
        (bidirectional_dynamic_rnn's backward pass)."""
        from cmpc_refseg_tpu.models.language import lstm_scan
        b, t, d, h = 2, 6, 4, 5
        x = rng.standard_normal((b, t, d)).astype(np.float32)
        seq_len = np.asarray([3, 6], np.int32)
        kernel = (0.3 * rng.standard_normal((d + h, 4 * h))).astype(
            np.float32)
        bias = np.zeros((4 * h,), np.float32)

        x_rev = tf.reverse_sequence(tf.constant(x),
                                    tf.constant(seq_len, tf.int64),
                                    seq_axis=1, batch_axis=0).numpy()
        want_fwd = self._tf_block_lstm(x_rev, kernel, bias, h)
        # zero past seq_len then re-reverse (dynamic_rnn + reverse_sequence)
        for i, s in enumerate(seq_len):
            want_fwd[i, s:] = 0
        want = tf.reverse_sequence(tf.constant(want_fwd),
                                   tf.constant(seq_len, tf.int64),
                                   seq_axis=1, batch_axis=0).numpy()

        got, _ = lstm_scan(
            {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(bias)},
            jnp.asarray(x), jnp.asarray(seq_len), reverse=True)
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=1e-5, atol=1e-5)


class TestMiscParity:
    def test_rgb_to_hsv_matches_tf(self, rng):
        from cmpc_refseg_tpu.models.model import rgb_to_hsv
        x = rng.random((4, 4, 3)).astype(np.float32) * 255.0
        want = tf.image.rgb_to_hsv(tf.constant(x / 255.0)).numpy()
        got = np.asarray(rgb_to_hsv(jnp.asarray(x / 255.0)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_l2_normalize_matches_tf(self, rng):
        from cmpc_refseg_tpu.ops.normalization import l2_normalize
        x = rng.standard_normal((3, 7)).astype(np.float32)
        want = tf.math.l2_normalize(tf.constant(x), axis=-1).numpy()
        got = np.asarray(l2_normalize(jnp.asarray(x), -1))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
