"""Native component tests: C++ NMS parity with the numpy reference, DenseCRF
sanity (sharpening noisy masks, edge-aware refinement)."""

import numpy as np
import pytest

from cmpc_refseg_tpu.ops import nms as nms_mod
from cmpc_refseg_tpu.ops import densecrf as crf_mod


def random_dets(rng, n=60):
    x1 = rng.uniform(0, 80, n)
    y1 = rng.uniform(0, 80, n)
    w = rng.uniform(5, 40, n)
    h = rng.uniform(5, 40, n)
    score = rng.random(n)
    return np.stack([x1, y1, x1 + w, y1 + h, score], axis=1).astype(np.float32)


class TestNMS:
    def test_numpy_basic(self):
        dets = np.array([
            [0, 0, 10, 10, 0.9],
            [1, 1, 11, 11, 0.8],     # heavy overlap with #0 -> suppressed
            [50, 50, 60, 60, 0.7],
        ], np.float32)
        keep = nms_mod.nms_numpy(dets, 0.5)
        assert keep == [0, 2]

    def test_native_matches_numpy(self, rng):
        if nms_mod._load_native() is None:
            pytest.skip("libnms.so not built")
        for _ in range(5):
            dets = random_dets(rng)
            want = nms_mod.nms_numpy(dets, 0.4)
            got = nms_mod.nms_native(dets, 0.4)
            assert got == want

    def test_jax_mask_matches_numpy(self, rng):
        import jax.numpy as jnp
        dets = random_dets(rng, 30)
        want = set(nms_mod.nms_numpy(dets, 0.4))
        mask = nms_mod.nms_jax(jnp.asarray(dets[:, :4]),
                               jnp.asarray(dets[:, 4]), 0.4)
        got = set(np.nonzero(np.asarray(mask))[0].tolist())
        assert got == want


class TestDenseCRF:
    def _noisy_scene(self, rng):
        """Square object with distinct color + noisy probability map."""
        h = w = 48
        rgb = np.full((h, w, 3), 40, np.uint8)
        rgb[12:36, 12:36] = [200, 60, 60]
        prob = np.full((h, w), 0.2, np.float32)
        prob[12:36, 12:36] = 0.8
        noise = (rng.random((h, w)) < 0.05)
        prob[noise] = 1.0 - prob[noise]   # flip 5% of pixels
        gt = np.zeros((h, w), bool)
        gt[12:36, 12:36] = True
        return rgb, prob, gt

    def test_native_crf_improves_noisy_mask(self, rng):
        if not crf_mod.native_available():
            pytest.skip("libdensecrf.so not built")
        rgb, prob, gt = self._noisy_scene(rng)
        raw = prob > 0.5
        refined = crf_mod.refine_mask(rgb, prob)

        def iou(a, b):
            return np.logical_and(a, b).sum() / np.logical_or(a, b).sum()

        assert iou(refined, gt) >= iou(raw, gt)
        assert iou(refined, gt) > 0.95

    def test_jax_meanfield_denoises(self, rng):
        import jax.numpy as jnp
        rgb, prob, gt = self._noisy_scene(rng)
        q = crf_mod.mean_field_gaussian(jnp.asarray(prob)[None])
        refined = np.asarray(q)[0] > 0.5

        def iou(a, b):
            return np.logical_and(a, b).sum() / np.logical_or(a, b).sum()

        assert iou(refined, gt) >= iou(prob > 0.5, gt)

    def test_native_crf_output_range(self, rng):
        if not crf_mod.native_available():
            pytest.skip("libdensecrf.so not built")
        rgb, prob, _ = self._noisy_scene(rng)
        lib = crf_mod._load_native()
        import ctypes
        out = np.empty(prob.shape, np.float32)
        rc = lib.densecrf2d_refine(
            np.ascontiguousarray(rgb).ctypes.data_as(
                ctypes.POINTER(ctypes.c_ubyte)),
            np.ascontiguousarray(prob).ctypes.data_as(
                ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            prob.shape[0], prob.shape[1],
            3.0, 3.0, 20.0, 3.0, 10.0, 5)
        assert rc == 0
        assert np.all(out >= 0) and np.all(out <= 1)
