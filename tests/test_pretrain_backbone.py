"""Tests for tools/pretrain_backbone.py — the standalone DeepLab-ResNet VOC
pipeline (reference external/tensorflow-deeplab-resnet/{train,fine_tune,
evaluate,evaluate_msc,inference}.py + image_reader.py + the commented VOC
head at deeplab_resnet/model.py:403-422)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools import pretrain_backbone as pb


def test_voc_colormap_reference_colors():
    """First entries of the standard VOC palette (deeplab_resnet/utils.py's
    label_colours: background black, aeroplane (128,0,0), bicycle (0,128,0),
    bird (128,128,0), boat (0,0,128), ...)."""
    cm = pb.make_voc_colormap()
    assert cm.shape == (256, 3)
    np.testing.assert_array_equal(cm[0], (0, 0, 0))
    np.testing.assert_array_equal(cm[1], (128, 0, 0))
    np.testing.assert_array_equal(cm[2], (0, 128, 0))
    np.testing.assert_array_equal(cm[3], (128, 128, 0))
    np.testing.assert_array_equal(cm[4], (0, 0, 128))
    np.testing.assert_array_equal(cm[21], (128, 64, 128))


def test_augment_pair_pads_label_with_ignore():
    """Zero image padding, IGNORE_LABEL label padding, exact crop shape
    (image_reader.py:41-70)."""
    rng = np.random.default_rng(0)
    im = np.full((10, 8, 3), 7.0, np.float32)
    lb = np.full((10, 8), 2, np.uint8)
    cim, clb = pb.augment_pair(rng, im, lb, 32, 32, scale=False, mirror=False)
    assert cim.shape == (32, 32, 3) and clb.shape == (32, 32)
    assert (clb == pb.IGNORE_LABEL).sum() == 32 * 32 - 10 * 8
    assert (clb == 2).sum() == 10 * 8
    assert cim.sum() == pytest.approx(7.0 * 10 * 8 * 3)


def test_augment_pair_scale_keeps_label_values():
    """Nearest-neighbor label scaling never invents new classes."""
    rng = np.random.default_rng(1)
    im = np.zeros((40, 40, 3), np.float32)
    lb = np.zeros((40, 40), np.uint8)
    lb[10:30, 10:30] = 5
    for _ in range(5):
        _, clb = pb.augment_pair(rng, im, lb, 24, 24)
        assert set(np.unique(clb)) <= {0, 5, pb.IGNORE_LABEL}


def test_downsample_labels_nearest():
    lb = np.arange(64, dtype=np.int32).reshape(8, 8)
    out = pb.downsample_labels(lb, 4)
    assert out.shape == (2, 2)
    # src index i*8/2 = {0, 4}
    np.testing.assert_array_equal(out, [[0, 4], [32, 36]])
    # batched
    out_b = pb.downsample_labels(lb[None], 4)
    np.testing.assert_array_equal(out_b[0], out)


def test_voc_ce_loss_ignores_out_of_range():
    import jax.numpy as jnp
    logits = np.zeros((1, 2, 2, 3), np.float32)
    logits[0, :, :, 1] = 10.0
    labels = np.array([[[1, 1], [255, 255]]], np.int32)
    loss = float(pb.voc_ce_loss(jnp.asarray(logits), jnp.asarray(labels), 3))
    assert loss < 1e-3   # only the two correct pixels count
    labels_bad = np.array([[[0, 0], [255, 255]]], np.int32)
    loss_bad = float(pb.voc_ce_loss(jnp.asarray(logits),
                                    jnp.asarray(labels_bad), 3))
    assert loss_bad > 5.0


def _fake_voc(tmp_path, n=3, size=72, num_classes=4):
    import cv2
    rng = np.random.default_rng(0)
    lines = []
    for i in range(n):
        im = rng.integers(0, 255, (size, size, 3), np.uint8)
        lb = np.zeros((size, size), np.uint8)
        lb[size // 4: size // 2, size // 4: 3 * size // 4] = (
            i % (num_classes - 1)) + 1
        cv2.imwrite(str(tmp_path / f"im{i}.jpg"), im)
        cv2.imwrite(str(tmp_path / f"lb{i}.png"), lb)
        lines.append(f"im{i}.jpg lb{i}.png")
    (tmp_path / "list.txt").write_text("\n".join(lines) + "\n")
    return str(tmp_path), str(tmp_path / "list.txt")


def test_train_eval_infer_smoke(tmp_path):
    """End-to-end: a few SGD steps on fake data -> snapshot -> restore for
    eval (bucketed native-res mIoU) and single-image inference."""
    data_dir, data_list = _fake_voc(tmp_path)
    snap = str(tmp_path / "snap")
    common = ["--data-dir", data_dir, "--data-list", data_list,
              "--num-classes", "4", "--res4-blocks", "2",
              "--crop-size", "64", "--batch-size", "2"]
    loss = pb.main(["--mode", "train", *common, "--num-steps", "3",
                    "--snapshot-dir", snap, "--save-every", "100",
                    "--print-every", "1", "--seed", "0"])
    assert np.isfinite(loss)
    ckpt = os.path.join(snap, "model_step3.npz")
    assert os.path.exists(ckpt)

    miou = pb.main(["--mode", "eval", *common, "--restore", ckpt])
    assert 0.0 <= miou <= 1.0

    out_png = str(tmp_path / "pred.png")
    pred = pb.main(["--mode", "infer", *common, "--restore", ckpt,
                    "--image", os.path.join(data_dir, "im0.jpg"),
                    "--out", out_png])
    import cv2
    assert pred.shape == (72, 72)
    assert cv2.imread(out_png) is not None


def test_train_msc_smoke(tmp_path):
    """--train-msc: shared-weight towers at 3 scales, 4-term CE
    (train_msc.py:145-216)."""
    data_dir, data_list = _fake_voc(tmp_path)
    loss = pb.main(["--mode", "train", "--data-dir", data_dir,
                    "--data-list", data_list, "--num-classes", "4",
                    "--res4-blocks", "2", "--crop-size", "64",
                    "--batch-size", "1", "--num-steps", "2",
                    "--print-every", "1", "--seed", "0", "--train-msc"])
    assert np.isfinite(loss)


def test_head_only_scope_and_adam():
    """--scope head trains only fc1_voc12 (fine_tune.py:142,169)."""
    import argparse
    args = pb.build_argparser().parse_args(
        ["--mode", "train", "--num-classes", "3", "--res4-blocks", "2",
         "--scope", "head"])
    params = pb.init_params(args)
    train_p, frozen_p = pb.split_trainable(params, "head")
    assert set(train_p) == {"head"}
    assert "backbone" in frozen_p
    # scope=all: backbone conv kernels trainable, folded BN not
    train_p, frozen_p = pb.split_trainable(params, "all")
    assert "backbone" in train_p
    import jax
    keys = {p[-1].key for p, _ in
            jax.tree_util.tree_flatten_with_path(train_p["backbone"])[0]}
    assert keys == {"w"}


def test_msc_eval_forward_shapes():
    import jax
    import jax.numpy as jnp
    k = jax.random.PRNGKey(0)
    params = {"backbone": pb.init_backbone(k, 2),
              "head": pb.init_voc_head(k, 5)}
    im = jnp.zeros((1, 64, 64, 3), jnp.float32)
    single = pb.eval_forward(params, im, 5, 2, msc=False)
    fused = pb.eval_forward(params, im, 5, 2, msc=True)
    assert single.shape == fused.shape == (1, 64, 64, 5)
    # max-fusion can only raise logits
    assert float(jnp.min(fused - single)) >= -1e-5


def test_kaffe_npy_ingestion(tmp_path):
    """Fabricated caffemodel-npy (kaffe layout) -> backbone with folded BN
    + VOC head, value-checked."""
    import jax
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import convert_tf_checkpoint as ctc

    params = {"backbone": pb.init_backbone(jax.random.PRNGKey(0), 2),
              "head": pb.init_voc_head(jax.random.PRNGKey(1), 21)}
    rng = np.random.default_rng(0)
    data = {}

    def add_conv(name, k, cin, cout):
        data[name] = {"weights": rng.standard_normal(
            (k, k, cin, cout)).astype(np.float32)}

    def add_bn(name, c):
        data[name] = {
            "gamma": rng.uniform(0.5, 1.5, c).astype(np.float32),
            "beta": rng.standard_normal(c).astype(np.float32),
            "moving_mean": rng.standard_normal(c).astype(np.float32),
            "moving_variance": rng.uniform(0.5, 2.0, c).astype(np.float32)}

    add_conv("conv1", 7, 3, 64)
    add_bn("bn_conv1", 64)
    from cmpc_refseg_tpu.models.backbone import resnet_stages
    cin = 64
    for stage, blocks, mid, cout, _, _ in resnet_stages(2):
        for bi, b in enumerate(blocks):
            suffix = f"{stage[len('res'):]}{b}"
            if bi == 0:
                add_conv(f"res{suffix}_branch1", 1, cin, cout)
                add_bn(f"bn{suffix}_branch1", cout)
            add_conv(f"res{suffix}_branch2a", 1, cin if bi == 0 else cout, mid)
            add_bn(f"bn{suffix}_branch2a", mid)
            add_conv(f"res{suffix}_branch2b", 3, mid, mid)
            add_bn(f"bn{suffix}_branch2b", mid)
            add_conv(f"res{suffix}_branch2c", 1, mid, cout)
            add_bn(f"bn{suffix}_branch2c", cout)
        cin = cout
    for i in range(4):
        data[f"fc1_voc12_c{i}"] = {
            "weights": rng.standard_normal((3, 3, 2048, 21)).astype(
                np.float32),
            "biases": rng.standard_normal(21).astype(np.float32)}

    npy = tmp_path / "net.npy"
    np.save(npy, np.asarray(data, dtype=object))

    ctc.convert_backbone_from_kaffe_npy(str(npy), params["backbone"],
                                        params["head"])
    # conv kernel taken verbatim
    np.testing.assert_array_equal(params["backbone"]["conv1"]["w"],
                                  data["conv1"]["weights"])
    # BN folded: scale = gamma/sqrt(var+1e-3), offset = beta - mean*scale
    bn = data["bn_conv1"]
    scale = bn["gamma"] / np.sqrt(bn["moving_variance"] + 1e-3)
    np.testing.assert_allclose(params["backbone"]["conv1"]["scale"], scale,
                               rtol=1e-6)
    np.testing.assert_allclose(
        params["backbone"]["conv1"]["offset"],
        bn["beta"] - bn["moving_mean"] * scale, rtol=1e-5)
    np.testing.assert_array_equal(params["head"]["c2"]["w"],
                                  data["fc1_voc12_c2"]["weights"])
    np.testing.assert_array_equal(params["head"]["c3"]["b"],
                                  data["fc1_voc12_c3"]["biases"])
