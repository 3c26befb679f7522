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


class TestDenseCRFGolden:
    """Exact O(N^2) dense mean-field vs the permutohedral implementation.

    The brute-force reference implements the SAME spec as
    native/densecrf.cpp (symmetric-normalized Gaussian kernels, Potts
    compat, Q = softmax(-U + sum_k w_k . norm . K_k (norm . Q))) with exact
    dense pairwise sums — so the only difference is the lattice
    approximation, which must stay within 1% pixel disagreement."""

    @staticmethod
    def _exact_meanfield(rgb, prob, *, sxy_g=3.0, compat_g=3.0,
                         sxy_b=20.0, srgb=3.0, compat_b=10.0, iters=5):
        h, w = prob.shape
        n = h * w
        yy, xx = np.mgrid[:h, :w].astype(np.float64)
        fg = np.stack([xx.ravel() / sxy_g, yy.ravel() / sxy_g], -1)
        fb = np.concatenate(
            [np.stack([xx.ravel() / sxy_b, yy.ravel() / sxy_b], -1),
             rgb.reshape(n, 3).astype(np.float64) / srgb], -1)

        def kernel(f):
            d2 = ((f[:, None, :] - f[None, :, :]) ** 2).sum(-1)
            return np.exp(-0.5 * d2)

        kg, kb = kernel(fg), kernel(fb)
        ng = 1.0 / np.sqrt(kg.sum(1) + 1e-20)
        nb = 1.0 / np.sqrt(kb.sum(1) + 1e-20)

        p = np.clip(prob.ravel(), 1e-8, 1 - 1e-8)
        un = np.stack([-np.log(1 - p), -np.log(p)], -1)   # [N,2]

        def softmax(x):
            m = x.max(-1, keepdims=True)
            e = np.exp(x - m)
            return e / e.sum(-1, keepdims=True)

        q = softmax(-un)
        for _ in range(iters):
            mg = ng[:, None] * (kg @ (ng[:, None] * q))
            mb = nb[:, None] * (kb @ (nb[:, None] * q))
            q = softmax(-un + compat_g * mg + compat_b * mb)
        return q[:, 1].reshape(h, w)

    @staticmethod
    def _native_refine(rgb, prob, *, compat_b=10.0, iters=5):
        import ctypes
        lib = crf_mod._load_native()
        h, w = prob.shape
        out = np.empty((h, w), np.float32)
        rgbc = np.ascontiguousarray(rgb)
        probc = np.ascontiguousarray(prob)
        rc = lib.densecrf2d_refine(
            rgbc.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            probc.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            h, w, 3.0, 3.0, 20.0, 3.0, compat_b, iters)
        assert rc == 0
        return out

    def test_lattice_impulse_response_is_unit_gaussian(self):
        """The sharpest correctness pin: the lattice filter's impulse
        response must be a centered unit-variance bump in feature space —
        this is exactly the calibration the embedding scale factors encode
        (a wrong scale shifts sigma multiplicatively)."""
        if crf_mod._load_native() is None:
            pytest.skip("libdensecrf.so not built")
        import ctypes
        lib = crf_mod._load_native()
        lib.permutohedral_filter.argtypes = [
            ctypes.POINTER(ctypes.c_float)] * 3 + [ctypes.c_int] * 3
        xs = np.linspace(-6, 6, 1201).astype(np.float32)
        for d in (2, 5):
            f = np.zeros((len(xs), d), np.float32)
            f[:, 0] = xs
            v = np.zeros((len(xs), 1), np.float32)
            v[len(xs) // 2] = 1.0
            out = np.empty_like(v)
            fc = np.ascontiguousarray(f)
            rc = lib.permutohedral_filter(
                fc.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                np.ascontiguousarray(v).ctypes.data_as(
                    ctypes.POINTER(ctypes.c_float)),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                len(xs), d, 1)
            assert rc == 0
            r = out.ravel() / out.sum()
            mu = float((r * xs).sum())
            sig = float(np.sqrt((r * (xs - mu) ** 2).sum()))
            assert abs(mu) < 0.05, (d, mu)
            assert abs(sig - 1.0) < 0.1, (d, sig)

    def test_gaussian_crf_matches_exact_dense(self, rng):
        """With the bilateral kernel off, the 2-D spatial lattice is
        near-exact: zero mask disagreement vs dense mean field."""
        if crf_mod._load_native() is None:
            pytest.skip("libdensecrf.so not built")
        h = w = 24
        rgb = np.full((h, w, 3), 40, np.uint8)
        prob = np.clip(np.where(np.arange(w)[None, :] < w // 2, 0.75, 0.25)
                       + 0.15 * rng.standard_normal((h, w)), 0.02, 0.98
                       ).astype(np.float32)
        exact = self._exact_meanfield(rgb, prob, compat_b=0.0)
        out = self._native_refine(rgb, prob, compat_b=0.0)
        assert np.mean((out > 0.5) != (exact > 0.5)) == 0.0
        assert np.corrcoef(out.ravel(), exact.ravel())[0, 1] > 0.999

    def test_full_crf_close_to_exact_dense(self, rng):
        """Full Gaussian+bilateral CRF vs exact dense mean field.  The 5-D
        bilateral kernel with srgb=3 is extremely sharp (noise of +-15
        intensity levels = 5 sigma), the permutohedral lattice's hardest
        regime; the approximation is bounded at a few % boundary flips —
        the same order canonical lattice implementations show here."""
        if crf_mod._load_native() is None:
            pytest.skip("libdensecrf.so not built")
        h = w = 24
        rgb = np.full((h, w, 3), 40, np.uint8)
        rgb[6:18, 6:18] = (200, 60, 60)
        rgb = np.clip(rgb.astype(int)
                      + rng.integers(-15, 15, rgb.shape), 0, 255
                      ).astype(np.uint8)
        prob = np.clip(np.where(np.arange(w)[None, :] < w // 2, 0.75, 0.25)
                       + 0.15 * rng.standard_normal((h, w)), 0.02, 0.98
                       ).astype(np.float32)
        exact = self._exact_meanfield(rgb, prob)
        out = self._native_refine(rgb, prob)
        disagree = np.mean((out > 0.5) != (exact > 0.5))
        assert disagree <= 0.05, f"mask disagreement {disagree:.3f}"
        assert np.corrcoef(out.ravel(), exact.ravel())[0, 1] > 0.9
