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
