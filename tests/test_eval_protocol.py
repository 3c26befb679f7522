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
