"""A2D-Sentences builder tests with a synthetic CSV + h5 + frames fixture
(reference layout: Release/videoset.csv, Release/frames/<vid>/*.png,
a2d_annotation.txt, a2d_annotation_with_instances/<vid>/*.h5)."""

import csv
import os

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from cmpc_refseg_tpu.data.a2d import (build_a2d_batches, frame_range,
                                      gen_split_dict, get_masks)


@pytest.fixture
def a2d_root(tmp_path):
    from PIL import Image
    root = str(tmp_path)
    vid = "vid00001"
    frame_dir = os.path.join(root, "Release", "frames", vid)
    os.makedirs(frame_dir)
    rng = np.random.default_rng(0)
    for i in range(1, 21):   # 20 frames, 1-indexed (reference convention)
        Image.fromarray(rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
                        ).save(os.path.join(frame_dir, f"{i:0>5d}.png"))
    with open(os.path.join(root, "Release", "videoset.csv"), "w") as f:
        f.write(f"{vid},x,x,x,x,x,x,x,0\n")      # split code 0 = train
    # one annotated frame (id 10) with 2 instances
    inst_dir = os.path.join(root, "a2d_annotation_with_instances", vid)
    os.makedirs(inst_dir)
    m0 = np.zeros((24, 32), np.uint8)
    m0[4:12, 6:20] = 1
    m1 = np.zeros((24, 32), np.uint8)
    m1[14:20, 10:28] = 1
    with h5py.File(os.path.join(inst_dir, "00010.h5"), "w") as f:
        f["instance"] = np.asarray([3, 7])
        f["reMask"] = np.stack([m0.T, m1.T])     # reference stores transposed
    with open(os.path.join(root, "a2d_annotation.txt"), "w") as f:
        w = csv.writer(f)
        w.writerow(["video_id", "instance_id", "query"])
        w.writerow([vid, "7", "the lower thing"])
    vocab = os.path.join(root, "vocab.txt")
    with open(vocab, "w") as f:
        f.write("\n".join(["<pad>", "<go>", "<eos>", "the", "lower",
                           "thing", "<unk>"]))
    return root, vid, vocab


def test_frame_range_clamps(a2d_root):
    root, vid, _ = a2d_root
    frame_dir = os.path.join(root, "Release", "frames", vid)
    paths = frame_range(2, frame_dir)            # near the left edge
    assert len(paths) == 16
    assert os.path.basename(paths[0]) == "00001.png"   # clamped to frame 1
    assert os.path.basename(paths[-1]) == "00009.png"


def test_get_masks_selects_instance(a2d_root):
    root, vid, _ = a2d_root
    masks, frame_ids = get_masks(root, vid, 7)
    assert frame_ids == [10]
    assert masks[0].shape == (24, 32)
    assert masks[0][16, 20] and not masks[0][6, 10]   # instance 7, not 3


def test_build_a2d_batches(a2d_root, tmp_path):
    root, vid, vocab = a2d_root
    out = os.path.join(str(tmp_path), "out")
    counts = build_a2d_batches(root, out, vocab, T=6, input_H=16,
                               input_W=16)
    assert counts["train"] == 1 and counts["test"] == 0
    z = np.load(os.path.join(out, "train_batch", "a2d_train_0.npz"),
                allow_pickle=True)
    assert z["frames"].shape == (16, 16, 16, 3)
    assert z["im_batch"].shape == (16, 16, 3)
    assert z["mask_batch"].any()
    assert int(z["seq_length"]) == 3
    assert z["frame_id"] == 10
    assert gen_split_dict(root)[vid] == 0
