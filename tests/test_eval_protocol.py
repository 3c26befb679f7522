"""Regression tests pinning the reference eval-protocol mask semantics.

The reference thresholds the upsampled logits, bilinearly resizes the
resulting FLOAT 0/1 mask to native resolution, and then counts ANY nonzero
pixel as foreground (trainval_model.py:244-245 + util/eval_tools.py:31-35 —
np.logical_and on floats).  A `>0.5` re-threshold after the resize would
erode the boundary the reference dilates; these tests assert our evaluator
matches the reference literally and NOT the eroding variant.

The video driver does the opposite order (test.py:307-308): threshold the
sigmoid BEFORE the resize, then uint8-truncate the resized float mask.
"""

import numpy as np

from cmpc_refseg_tpu.data.image import resize_and_crop
from cmpc_refseg_tpu.infer_video import video_output_mask
from cmpc_refseg_tpu.train.evaluator import SCORE_THRESHOLD, native_prediction


def boundary_heavy_logits(h=32, w=32, seed=0):
    """Logits whose positive set has a long, irregular boundary, so the
    bilinear resize produces many fractional pixels in (0, 1)."""
    rng = np.random.default_rng(seed)
    up = rng.standard_normal((h, w)).astype(np.float32)
    yy, xx = np.mgrid[:h, :w]
    blob = ((yy - h / 2) ** 2 + (xx - w / 3) ** 2) < (h / 3) ** 2
    up = np.where(blob, np.abs(up) + 0.1, -np.abs(up) - 0.1)
    # checkerboard fringe along one edge of the blob: maximizes boundary
    up[h // 2:, :] *= np.where((yy[h // 2:, :] + xx[h // 2:, :]) % 2, 1, -1)
    return up.astype(np.float32)


class TestImageEvalProtocol:
    def test_matches_reference_literal_pipeline(self):
        up = boundary_heavy_logits()
        oh, ow = 45, 37   # native != model resolution, odd sizes
        # the reference, verbatim (trainval_model.py:244-245):
        pred_raw = (up >= SCORE_THRESHOLD).astype(np.float32)
        predicts = resize_and_crop(pred_raw, oh, ow)
        # util/eval_tools.py:33-34 — float truthiness == nonzero
        ref_fg = predicts.astype(bool)
        ours = native_prediction(up, oh, ow)
        assert ours.dtype == bool
        np.testing.assert_array_equal(ours, ref_fg)

    def test_nonzero_not_halfthreshold(self):
        """On a boundary-heavy mask the dilating reference semantics must
        differ from (and strictly contain) the eroding >0.5 variant."""
        up = boundary_heavy_logits()
        oh, ow = 45, 37
        ours = native_prediction(up, oh, ow)
        eroded = resize_and_crop(
            (up >= SCORE_THRESHOLD).astype(np.float32), oh, ow) > 0.5
        assert ours.sum() > eroded.sum()          # they genuinely differ
        assert np.all(ours[eroded])               # and ref is a superset

    def test_threshold_is_inclusive(self):
        """up == 1e-9 exactly counts as foreground (>= not >)."""
        up = np.full((8, 8), -1.0, np.float32)
        up[2:5, 2:5] = SCORE_THRESHOLD
        pred = native_prediction(up, 8, 8)
        assert pred[3, 3]

    def test_iou_moves_between_semantics(self):
        """The semantics difference changes the (I, U) sums — the quantity
        the parity budget is measured in."""
        up = boundary_heavy_logits(seed=3)
        oh, ow = 50, 41
        target = np.zeros((oh, ow), bool)
        target[10:40, 5:30] = True
        ref_pred = native_prediction(up, oh, ow)
        alt_pred = resize_and_crop(
            (up >= SCORE_THRESHOLD).astype(np.float32), oh, ow) > 0.5
        iou = lambda p: (np.logical_and(p, target).sum()
                         / np.logical_or(p, target).sum())
        assert iou(ref_pred) != iou(alt_pred)


class TestVideoOutputProtocol:
    def test_threshold_before_resize_and_uint8_truncation(self):
        """Reference test.py:307-308 verbatim: sigm >= thr at model res,
        resize the float mask, uint8-truncate x255."""
        rng = np.random.default_rng(1)
        sigm = rng.random((32, 32)).astype(np.float32)
        thr, oh, ow = 0.5, 45, 37
        pred_raw = (sigm >= thr).astype(np.float32)
        ref = resize_and_crop(pred_raw, oh, ow).astype("uint8") * 255
        ours = video_output_mask(pred_raw, oh, ow)
        np.testing.assert_array_equal(ours, ref)
        assert set(np.unique(ours)) <= {0, 255}

    def test_differs_from_threshold_after_resize(self):
        """Truncation erodes: resized fractional pixels in (0,1) drop to 0,
        while threshold-after-resize would keep those > thr."""
        rng = np.random.default_rng(2)
        sigm = rng.random((32, 32)).astype(np.float32)
        thr, oh, ow = 0.5, 45, 37
        ours = video_output_mask((sigm >= thr).astype(np.float32), oh, ow)
        after = (resize_and_crop(sigm, oh, ow) > thr).astype(np.uint8) * 255
        assert not np.array_equal(ours, after)
        # ours only keeps pixels whose interpolated mask value reached 1.0
        frac = resize_and_crop((sigm >= thr).astype(np.float32), oh, ow)
        np.testing.assert_array_equal(ours > 0, frac >= 1.0)


class TestShardedEvalDelta:
    """Quantifies the divergence between the sharded fast path (model-res
    IoU, evaluator.py::make_sharded_eval_step) and the reference parity
    protocol (native-res dilating semantics, evaluator.py::native_prediction)
    on boundary-heavy synthetic masks — so it is KNOWN when the fast path is
    safe for in-training model selection (VERDICT round-2 #7)."""

    def test_delta_bounded_on_boundary_heavy_masks(self):
        import jax
        from cmpc_refseg_tpu.config import get_config
        from cmpc_refseg_tpu.data.image import IMAGE_MEAN_BGR, resize_and_pad
        from cmpc_refseg_tpu.models.model import init_model
        from cmpc_refseg_tpu.train.evaluator import (evaluate,
                                                     evaluate_sharded)

        cfg = get_config("CMPC_model", H=32, W=32, num_steps=6,
                         vocab_size=30, glove_dim=8, rnn_size=16,
                         v_emb_dim=16, mlp_dim=12, res4_blocks=2,
                         batch_size=4)
        params, mstate = init_model(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(3)

        samples, fast_batches = [], []
        group_im, group_tgt, group_words, group_seq = [], [], [], []
        for i in range(8):
            oh, ow = 45 + 3 * i, 37 + 2 * i
            native_im = rng.integers(0, 256, (oh, ow, 3)).astype(np.uint8)
            yy, xx = np.mgrid[:oh, :ow]
            blob = ((yy - oh / 2) ** 2 + (xx - ow / 3) ** 2) < (oh / 3) ** 2
            fringe = ((yy + xx) % 2).astype(bool)
            mask = (blob ^ (fringe & (xx > ow // 2))).astype(np.float32)
            im = resize_and_pad(native_im.astype(np.float32), 32, 32)
            im = im[..., ::-1] - IMAGE_MEAN_BGR
            tgt_model = (resize_and_pad(mask, 32, 32) > 0
                         ).astype(np.float32)[..., None]
            words = np.zeros((6,), np.int32)
            words[:3] = rng.integers(3, 30, 3)
            samples.append({
                "im": im[None].astype(np.float32),
                "words": words[None],
                "seq_len": np.asarray([3], np.int32),
                "orig_size": (oh, ow),
                "target_native": mask > 0,
            })
            group_im.append(im.astype(np.float32))
            group_tgt.append(tgt_model)
            group_words.append(words)
            group_seq.append(3)
        for s in range(0, 8, 4):
            fast_batches.append({
                "im": np.stack(group_im[s:s + 4]),
                "words": np.stack(group_words[s:s + 4]),
                "seq_len": np.asarray(group_seq[s:s + 4], np.int32),
                "target": np.stack(group_tgt[s:s + 4]),
            })

        parity = evaluate(cfg, params, mstate, iter(samples),
                          batch_size=4)["no_crf"]
        fast = evaluate_sharded(cfg, params, mstate, iter(fast_batches))
        assert parity["n"] == fast["n"] == 8
        # Documented bound: on boundary-heavy masks at this tiny geometry
        # the model-res fast path tracks the native dilating protocol to
        # within 0.08 IoU (the dilation systematically FAVORS the parity
        # number for coarse predictions).  Use the fast path for relative
        # model selection; use `evaluate` for reported numbers.
        assert abs(parity["overall_iou"] - fast["overall_iou"]) < 0.08, (
            parity["overall_iou"], fast["overall_iou"])
        assert abs(parity["mean_iou"] - fast["mean_iou"]) < 0.08, (
            parity["mean_iou"], fast["mean_iou"])
