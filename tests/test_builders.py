"""Offline batch-builder tests (reference: build_batches.py,
generate_trainmeta.py, generate_black.py) over synthetic fixtures."""

import json
import os

import numpy as np
import pytest

from cmpc_refseg_tpu.data.builders import (build_referit_batches,
                                           build_refvos_sample,
                                           generate_black_submission,
                                           generate_trainmeta)
from cmpc_refseg_tpu.data.refvos import OBJECT_COLOR


@pytest.fixture
def ytvos_meta(tmp_path):
    """meta_expressions + masks where obj 1 appears only in frame 0."""
    from PIL import Image
    root = str(tmp_path)
    mask_dir = os.path.join(root, "Annotations")
    os.makedirs(os.path.join(mask_dir, "v1"))
    m0 = np.zeros((24, 32, 3), np.uint8)
    m0[4:12, 4:12] = OBJECT_COLOR["1"]
    Image.fromarray(m0).save(os.path.join(mask_dir, "v1", "f0.png"))
    Image.fromarray(np.zeros((24, 32, 3), np.uint8)).save(
        os.path.join(mask_dir, "v1", "f1.png"))
    meta = {"videos": {"v1": {
        "expressions": {"0": {"exp": "a thing", "obj_id": 1}},
        "frames": ["f0", "f1"]}}}
    meta_path = os.path.join(root, "meta.json")
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    return root, meta_path, mask_dir


def test_generate_trainmeta_keeps_only_present_frames(ytvos_meta, tmp_path):
    root, meta_path, mask_dir = ytvos_meta
    out = os.path.join(root, "train_meta.json")
    n = generate_trainmeta(meta_path, mask_dir, out)
    records = json.load(open(out))
    assert n == len(records) == 1       # frame f1 has no object color
    assert records[0] == ["v1/f0.jpg", "v1/f0.png", "a thing", "1"]


def test_generate_black_submission(ytvos_meta, tmp_path):
    root, meta_path, _ = ytvos_meta
    out = os.path.join(root, "sub")
    n = generate_black_submission(meta_path, out, height=8, width=10)
    assert n == 2
    from PIL import Image
    m = np.asarray(Image.open(os.path.join(out, "v1", "0", "f0.png")))
    assert m.shape == (8, 10) and m.max() == 0


def test_build_referit_batches_train_and_test(tmp_path):
    from PIL import Image
    from scipy.io import savemat
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "referit", "images"))
    os.makedirs(os.path.join(root, "referit", "mask"))
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (30, 40, 3), dtype=np.uint8)
                    ).save(os.path.join(root, "referit", "images", "7.jpg"))
    seg = np.ones((30, 40), np.int16)
    seg[10:20, 10:30] = 0               # object = segimg_t == 0
    savemat(os.path.join(root, "referit", "mask", "7_1.mat"),
            {"segimg_t": seg})
    for split in ("trainval", "test"):
        with open(os.path.join(root, "referit",
                               f"referit_query_{split}.json"), "w") as f:
            json.dump({"7_1": ["the thing", "a thing"]}, f)
    with open(os.path.join(root, "vocabulary_referit.txt"), "w") as f:
        f.write("\n".join(["<pad>", "<go>", "<eos>", "the", "a", "thing",
                           "<unk>"]))

    out = os.path.join(root, "out")
    n_tr = build_referit_batches("trainval", 8, 16, 16, data_root=root,
                                 out_root=out)
    n_te = build_referit_batches("test", 8, 16, 16, data_root=root,
                                 out_root=out)
    assert n_tr == n_te == 2            # 2 sentences
    z = np.load(os.path.join(out, "trainval_batch",
                             "referit_trainval_0.npz"), allow_pickle=True)
    assert z["im_batch"].shape == (16, 16, 3)   # train: resize-pad
    assert z["mask_batch"].any()
    assert z["text_batch"].shape == (8,)
    # front-padded tokens (preprocess_sentence convention)
    assert z["text_batch"][0] == 0 and z["text_batch"][-1] != 0
    z2 = np.load(os.path.join(out, "test_batch", "referit_test_0.npz"),
                 allow_pickle=True)
    assert z2["im_batch"].shape == (30, 40, 3)  # test: native resolution


def test_build_refvos_sample(tmp_path):
    from PIL import Image
    root = str(tmp_path)
    Image.fromarray(np.zeros((20, 24, 3), np.uint8)).save(
        os.path.join(root, "im.jpg"))
    m = np.zeros((20, 24, 3), np.uint8)
    m[5:15, 5:20] = OBJECT_COLOR["2"]
    Image.fromarray(m).save(os.path.join(root, "mask.png"))
    vocab = {"<pad>": 0, "<go>": 1, "<eos>": 2, "big": 3, "cat": 4,
             "<unk>": 5}
    out = os.path.join(root, "s0.npz")
    build_refvos_sample(os.path.join(root, "im.jpg"),
                        os.path.join(root, "mask.png"), "big cat", "2",
                        vocab, 6, 16, 16, out)
    z = np.load(out, allow_pickle=True)
    assert z["im_batch"].shape == (16, 16, 3)
    assert z["mask_batch"].any()
    assert int(z["seq_length"]) == 2
    # back-padded (preprocess_sentence_lstm convention)
    np.testing.assert_array_equal(z["text_batch"][:2], [3, 4])
    assert np.all(z["text_batch"][2:] == 0)
