"""Utility-layer tests: H5 reader, metric logger, IO helpers, image saver."""

import json
import os

import numpy as np
import pytest


def test_h5_reader(tmp_path):
    h5py = pytest.importorskip("h5py")
    from cmpc_refseg_tpu.data.h5_reader import H5Reader
    qp = os.path.join(str(tmp_path), "q.h5")
    ip = os.path.join(str(tmp_path), "im.h5")
    rng = np.random.default_rng(0)
    with h5py.File(qp, "w") as f:
        f["answers"] = np.asarray([1, 0, 1])
        f["image_idxs"] = np.asarray([2, 0, 1])
        f["refexps"] = np.asarray([[3, 4, 0], [5, 0, 0], [3, 5, 4]])
    with h5py.File(ip, "w") as f:
        f["images"] = rng.integers(0, 255, (3, 8, 8, 3), dtype=np.uint8)
    r = H5Reader(qp, ip, shuffle=False)
    s = r.read_batch()
    assert s["answer"] == 1
    np.testing.assert_array_equal(s["refexp"], [3, 4, 0])
    assert s["image"].shape == (8, 8, 3)   # image_idxs[0] == 2
    assert r.num_batch == 3


def test_metric_logger_jsonl_and_close(tmp_path):
    from cmpc_refseg_tpu.utils.logging import MetricLogger
    d = os.path.join(str(tmp_path), "logs")
    lg = MetricLogger(d, use_tensorboard=False)
    lg.log(0, {"loss": 1.5})
    lg.log(10, {"loss": np.float32(0.5), "lr": 1e-4})
    lg.close()
    lines = [json.loads(x) for x in
             open(os.path.join(d, "metrics.jsonl"))]
    assert lines[0]["step"] == 0 and lines[0]["loss"] == 1.5
    assert lines[1]["lr"] == pytest.approx(1e-4)


def test_io_helpers(tmp_path):
    from cmpc_refseg_tpu.utils.io import (load_json, load_str_list,
                                          read_anchors, save_json,
                                          save_str_list)
    p = os.path.join(str(tmp_path), "l.txt")
    save_str_list(["a", "b"], p)
    assert load_str_list(p) == ["a", "b"]
    jp = os.path.join(str(tmp_path), "d.json")
    save_json({"x": 1}, jp)
    assert load_json(jp) == {"x": 1}
    ap = os.path.join(str(tmp_path), "anchors.txt")
    with open(ap, "w") as f:
        f.write("1.5,2.5 3.0,4.0 5.0,6.0")
    a = read_anchors(ap)
    assert a.shape == (3, 2)
    np.testing.assert_allclose(a[1], [3.0, 4.0])


def test_save_image_worker(tmp_path):
    from cmpc_refseg_tpu.utils.save_image_worker import SaveImageWorker
    w = SaveImageWorker()
    path = os.path.join(str(tmp_path), "sub", "m.png")
    w.save_image(path, np.full((6, 6), 255, np.uint8))
    w.flush()
    from PIL import Image
    assert np.asarray(Image.open(path)).max() == 255
