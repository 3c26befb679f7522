"""Tests for auxiliary surface: VGG16-FCN alt backbone, pivot-frame
selection, profiling module."""

import time

import jax
import numpy as np

from cmpc_refseg_tpu.infer_video import find_pivot_frames
from cmpc_refseg_tpu.models.vgg16_fcn import apply_vgg16_fcn, init_vgg16_fcn
from cmpc_refseg_tpu.utils.profiling import StepTimer, device_memory_stats


def test_vgg16_fcn_shapes(rng):
    params = init_vgg16_fcn(jax.random.PRNGKey(0))
    im = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    out = apply_vgg16_fcn(params, im)
    # stride 8 after 3 pools; conv4/5/fc stay at pool3 resolution
    assert out["pool3"].shape == (1, 8, 8, 256)
    assert out["conv5_3"].shape == (1, 8, 8, 512)
    assert out["fc8"].shape == (1, 8, 8, 1000)
    assert np.all(np.asarray(out["conv5_3"]) >= 0)  # relu
    assert np.isfinite(np.asarray(out["fc8"])).all()


def test_find_pivot_frames_clusters():
    # two tight clusters of 3 frames -> with num_propagate=2 each cluster
    # collapses to one pivot
    a = np.array([1.0, 0.0, 0.0])
    b = np.array([0.0, 1.0, 0.0])
    feats = np.stack([a, a + 1e-3, a + 2e-3, b, b + 1e-3, b + 2e-3])
    sel = find_pivot_frames(feats, num_propagate=2)
    assert len(sel) >= 2
    # every frame is within num_propagate of a selected pivot
    covered = set()
    for fid in sel:
        covered.update(range(max(fid - 2, 0), min(fid + 3, 6)))
    assert covered == set(range(6))


def test_find_pivot_frames_single_frame():
    assert find_pivot_frames(np.ones((1, 4))) == [0]


def test_step_timer_warmup_exclusion():
    t = StepTimer(window_size=10, warmup=1)
    t.start()
    time.sleep(0.05)  # "compile" lap
    t.lap()
    for _ in range(3):
        time.sleep(0.001)
        t.lap()
    s = t.summary()
    assert s["steps"] == 4
    assert s["warmup_time_s"] > 0.04
    assert s["mean_step_time_s"] < 0.04  # warmup excluded
    assert s["steps_per_sec"] > 0


def test_device_memory_stats_smoke():
    stats = device_memory_stats()  # CPU backend: usually empty dict
    assert isinstance(stats, dict)
