"""Tests for the host data layer: tokenizer padding conventions, resize-pad /
resize-crop geometry, bbox extraction, brightness aug."""

import numpy as np
import pytest

from cmpc_refseg_tpu.data import text as text_proc
from cmpc_refseg_tpu.data import image as im_proc

VOCAB = {w: i for i, w in enumerate(
    ["<pad>", "<unk>", "the", "red", "car", "on", "left", "a", "dog"])}


class TestText:
    def test_tokenize_lowercase_and_unk(self):
        idx = text_proc.sentence2vocab_indices("The RED zeppelin", VOCAB)
        assert idx == [VOCAB["the"], VOCAB["red"], VOCAB["<unk>"]]

    def test_strip_trailing_period(self):
        idx = text_proc.sentence2vocab_indices("the red car.", VOCAB)
        assert idx == [VOCAB["the"], VOCAB["red"], VOCAB["car"]]

    def test_front_pad(self):
        idx = text_proc.preprocess_sentence("red car", VOCAB, 5)
        assert idx == [0, 0, 0, VOCAB["red"], VOCAB["car"]]

    def test_back_pad_with_length(self):
        idx, n = text_proc.preprocess_sentence_lstm("red car", VOCAB, 5)
        assert idx == [VOCAB["red"], VOCAB["car"], 0, 0, 0]
        assert n == 2

    def test_truncation(self):
        s = "the red car on the left"
        idx, n = text_proc.preprocess_sentence_lstm(s, VOCAB, 3)
        assert len(idx) == 3 and n == 3
        front = text_proc.preprocess_sentence(s, VOCAB, 3)
        assert front == idx  # truncation happens before padding


class TestImageGeometry:
    def test_resize_and_pad_shape_and_centering(self, rng):
        im = (rng.random((100, 200, 3)) * 255).astype(np.float32)
        out = im_proc.resize_and_pad(im, 320, 320)
        assert out.shape == (320, 320, 3)
        # scale = 320/200 = 1.6 -> resized 160x320, pad_h = 80
        assert np.all(out[:80] == 0) and np.all(out[240:] == 0)
        assert np.abs(out[80:240]).sum() > 0

    def test_resize_and_crop_inverts_pad_for_square(self, rng):
        im = (rng.random((64, 64)) * 255).astype(np.float32)
        padded = im_proc.resize_and_pad(im, 32, 32)
        back = im_proc.resize_and_crop(padded, 64, 64)
        assert back.shape == (64, 64)

    def test_mask_roundtrip_preserves_object(self):
        mask = np.zeros((240, 427), dtype=bool)
        mask[60:180, 100:300] = True
        m320 = im_proc.resize_and_pad(mask, 320, 320)
        assert m320.dtype == np.bool_
        back = im_proc.resize_and_crop(m320.astype(np.float32), 240, 427) > 0.5
        inter = np.logical_and(back, mask).sum()
        union = np.logical_or(back, mask).sum()
        assert inter / union > 0.9

    def test_bboxes_from_masks(self):
        mask = np.zeros((10, 10), bool)
        mask[2:5, 3:8] = True
        box = im_proc.bboxes_from_masks(mask)[0]
        assert list(box) == [3, 2, 7, 4]

    def test_brightness_uint8_range(self, rng):
        x = (rng.random((8, 8, 3)) * 255).astype(np.uint8)
        y = im_proc.brightness(x, gamma=0.2, rng=rng)
        assert y.dtype == np.uint8 and y.shape == x.shape

    def test_resize_antialias_downscale_close_to_mean(self, rng):
        # Downscaling a checkerboard with anti-aliasing should land near the
        # mean rather than aliasing to one phase.
        im = np.indices((64, 64)).sum(0) % 2 * 255.0
        small = im_proc.resize(im.astype(np.float32), 8, 8)
        assert abs(small.mean() - 127.5) < 20


class TestCropSubtractMean:
    """Dormant-surface crops (im_processing.py:43-92)."""

    def test_crop_bboxes_shapes_and_values(self):
        from cmpc_refseg_tpu.data.image import crop_bboxes_subtract_mean
        rng = np.random.default_rng(0)
        im = rng.integers(0, 255, (20, 24, 3), dtype=np.uint8)
        mean = np.array([10.0, 20.0, 30.0], np.float32)
        out = crop_bboxes_subtract_mean(im, [[2, 3, 9, 10], [0, 0, 23, 19]],
                                        8, mean)
        assert out.shape == (2, 8, 8, 3)
        # second bbox is the whole image: resize of the full image
        from cmpc_refseg_tpu.data.image import resize
        want = np.clip(np.rint(resize(im.astype(np.float32), 8, 8)),
                       0, 255) - mean
        np.testing.assert_allclose(out[1], want, atol=1e-5)
        # inclusive crop bounds: [ymin:ymax+1, xmin:xmax+1]
        one = crop_bboxes_subtract_mean(im, [[2, 3, 2, 3]], 4, mean)
        np.testing.assert_allclose(
            one[0], np.broadcast_to(im[3, 2].astype(np.float32) - mean,
                                    (4, 4, 3)), atol=1e-5)

    def test_crop_masks_background_is_mean(self):
        from cmpc_refseg_tpu.data.image import crop_masks_subtract_mean
        im = np.full((16, 16, 3), 200, np.uint8)
        mask = np.zeros((16, 16), np.uint8)
        mask[4:12, 4:12] = 1
        mean = np.array([50.0, 60.0, 70.0], np.float32)
        out = crop_masks_subtract_mean(im, mask, 8, mean)
        assert out.shape == (1, 8, 8, 3)
        # crop covers exactly the mask bbox -> all object pixels
        np.testing.assert_allclose(
            out[0], np.broadcast_to(200.0 - mean, (8, 8, 3)), atol=1e-4)
        # a mask with background inside its bbox: background == mean - mean
        mask2 = np.zeros((16, 16), np.uint8)
        mask2[4, 4] = 1
        mask2[11, 11] = 1
        out2 = crop_masks_subtract_mean(im, mask2, 8, mean)
        center = out2[0, 4, 4]          # interior background pixel
        np.testing.assert_allclose(center, np.floor(mean) - mean, atol=1.0)


class TestProcessingToolsTail:
    def test_generate_bilinear_filter(self):
        from cmpc_refseg_tpu.ops.spatial import generate_bilinear_filter
        f = generate_bilinear_filter(2)
        assert f.shape == (4, 4, 1, 1)
        # reference formula: outer(concat(arange(0,s), arange(s,0,-1))/s)
        ramp = np.array([0, 1, 2, 1]) / 2
        np.testing.assert_allclose(f[:, :, 0, 0], np.outer(ramp, ramp))

    def test_spatial_feature_from_bbox(self):
        from cmpc_refseg_tpu.ops.spatial import spatial_feature_from_bbox
        feats = spatial_feature_from_bbox([[0, 0, 9, 19]], (10, 20))
        np.testing.assert_allclose(
            feats[0], [-1.0, -1.0, 0.8, 0.9, -0.1, -0.05, 1.8, 1.9],
            atol=1e-9)
        # out-of-range boxes assert (reference :49-51)
        import pytest as _pytest
        with _pytest.raises(AssertionError):
            spatial_feature_from_bbox([[0, 0, 10, 5]], (10, 20))
