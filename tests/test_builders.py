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


# ---------------------------------------------------------------------------
# COCO (UNC/Gref) builder + mask decoding + GloVe embedding builder
# ---------------------------------------------------------------------------

class TestCocoMask:
    def test_rle_string_roundtrip(self):
        from cmpc_refseg_tpu.data.coco_mask import (rle_counts_from_string,
                                                    rle_string_from_counts)
        rng = np.random.default_rng(0)
        for _ in range(20):
            counts = rng.integers(0, 5000, size=rng.integers(1, 30)).tolist()
            s = rle_string_from_counts(counts)
            assert rle_counts_from_string(s) == [int(c) for c in counts]

    def test_mask_rle_roundtrip_column_major(self):
        from cmpc_refseg_tpu.data.coco_mask import (mask_from_rle_counts,
                                                    rle_counts_from_mask)
        rng = np.random.default_rng(1)
        mask = rng.random((13, 17)) > 0.6
        counts = rle_counts_from_mask(mask)
        np.testing.assert_array_equal(
            mask_from_rle_counts(counts, 13, 17), mask)
        # zeros-first convention: an all-set first column forces a leading 0
        mask2 = np.ones((4, 3), bool)
        assert rle_counts_from_mask(mask2)[0] == 0

    def test_polygon_rasterization(self):
        from cmpc_refseg_tpu.data.coco_mask import mask_from_polygons
        # axis-aligned rectangle: exact expected pixels
        m = mask_from_polygons([[2, 1, 6, 1, 6, 4, 2, 4]], 8, 10)
        assert m[2, 4] and m[1, 2] and m[4, 6]
        assert not m[0, 0] and not m[6, 8]
        # union over multiple polygons
        m2 = mask_from_polygons([[0, 0, 2, 0, 2, 2, 0, 2],
                                 [5, 5, 8, 5, 8, 7, 5, 7]], 10, 10)
        assert m2[1, 1] and m2[6, 6] and not m2[3, 3]

    def test_decode_segmentation_dispatch(self):
        from cmpc_refseg_tpu.data.coco_mask import (decode_segmentation,
                                                    rle_counts_from_mask,
                                                    rle_string_from_counts)
        rng = np.random.default_rng(2)
        mask = rng.random((9, 7)) > 0.5
        counts = rle_counts_from_mask(mask)
        np.testing.assert_array_equal(
            decode_segmentation({"counts": counts, "size": [9, 7]}, 9, 7),
            mask)
        np.testing.assert_array_equal(
            decode_segmentation(
                {"counts": rle_string_from_counts(counts), "size": [9, 7]},
                9, 7),
            mask)


@pytest.fixture
def refer_fixture(tmp_path):
    """Synthetic REFER layout: refs(unc).p + instances.json + COCO jpgs +
    Gref vocabulary."""
    import pickle
    from PIL import Image
    root = str(tmp_path)
    ddir = os.path.join(root, "refer", "refcoco")
    os.makedirs(ddir)
    im_dir = os.path.join(root, "coco", "images", "train2014")
    os.makedirs(im_dir)
    with open(os.path.join(root, "vocabulary_Gref.txt"), "w") as f:
        f.write("\n".join(["<pad>", "<go>", "<eos>", "<unk>",
                           "the", "red", "box", "a", "dog"]) + "\n")
    rng = np.random.default_rng(0)
    refs = []
    annotations, images_meta = [], []
    for i, split in enumerate(["train", "val", "val"]):
        h, w = 30 + i, 40 + i
        img_id = 100 + i
        im = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        Image.fromarray(im).save(
            os.path.join(im_dir, f"COCO_train2014_{img_id:012d}.jpg"))
        images_meta.append({"id": img_id, "height": h, "width": w,
                            "file_name": f"COCO_train2014_{img_id:012d}.jpg"})
        seg = [[5, 5, w - 6, 5, w - 6, h - 6, 5, h - 6]]   # rectangle poly
        annotations.append({"id": 1000 + i, "image_id": img_id,
                            "segmentation": seg})
        refs.append({"ref_id": i, "ann_id": 1000 + i, "image_id": img_id,
                     "split": split,
                     "sentences": [{"sent": "the red box"},
                                   {"sent": "a dog"}][:i + 1]})
    with open(os.path.join(ddir, "refs(unc).p"), "wb") as f:
        pickle.dump(refs, f)
    with open(os.path.join(ddir, "instances.json"), "w") as f:
        json.dump({"images": images_meta, "annotations": annotations}, f)
    return root


class TestCocoBuilder:
    def test_val_batches_native_resolution(self, refer_fixture, tmp_path):
        from cmpc_refseg_tpu.data.builders import build_coco_batches
        out_root = os.path.join(str(tmp_path), "out")
        n = build_coco_batches("unc", "val", T=6, input_H=32, input_W=32,
                               data_root=refer_fixture, out_root=out_root)
        assert n == 2 + 2   # the two val refs carry 2 sentences each
        z = np.load(os.path.join(out_root, "unc", "val_batch",
                                 "unc_val_0.npz"))
        # test split keeps native resolution (build_batches.py:108-110 only
        # resize-pads 'train' setnames)
        assert z["im_batch"].shape == (31, 41, 3)
        assert z["mask_batch"].shape == (31, 41)
        assert z["mask_batch"][15, 20] and not z["mask_batch"][0, 0]
        assert z["text_batch"].shape == (6,)
        # front-padded (preprocess_sentence)
        assert z["text_batch"][0] == 0 and z["text_batch"][-1] != 0

    def test_train_batches_resize_padded(self, refer_fixture, tmp_path):
        from cmpc_refseg_tpu.data.builders import build_coco_batches
        out_root = os.path.join(str(tmp_path), "out")
        n = build_coco_batches("unc", "train", T=6, input_H=32, input_W=32,
                               data_root=refer_fixture, out_root=out_root)
        assert n == 1
        z = np.load(os.path.join(out_root, "unc", "train_batch",
                                 "unc_train_0.npz"))
        assert z["im_batch"].shape == (32, 32, 3)
        assert z["im_batch"].dtype == np.uint8
        assert z["mask_batch"].shape == (32, 32)

    def test_val_batches_feed_evaluator_end_to_end(self, refer_fixture,
                                                   tmp_path):
        """The built npz drive NpzReader + the full eval protocol."""
        import jax
        from cmpc_refseg_tpu.cli import npz_eval_samples
        from cmpc_refseg_tpu.config import get_config
        from cmpc_refseg_tpu.data.builders import build_coco_batches
        from cmpc_refseg_tpu.models.model import init_model
        from cmpc_refseg_tpu.train.evaluator import evaluate

        out_root = os.path.join(str(tmp_path), "out")
        build_coco_batches("unc", "val", T=6, input_H=32, input_W=32,
                           data_root=refer_fixture, out_root=out_root)
        cfg = get_config("CMPC_model", H=32, W=32, num_steps=6,
                         vocab_size=30, glove_dim=8, rnn_size=16,
                         v_emb_dim=16, mlp_dim=12, batch_size=1,
                         res4_blocks=2)
        params, state = init_model(jax.random.PRNGKey(0), cfg)
        samples = npz_eval_samples(out_root, "unc", "val", cfg)
        res = evaluate(cfg, params, state, samples, batch_size=2)
        assert res["no_crf"]["n"] == 4
        assert 0.0 <= res["no_crf"]["overall_iou"] <= 1.0


class TestGloveBuilder:
    def _write_glove(self, path, tokens, dim=4, seed=3):
        rng = np.random.default_rng(seed)
        vecs = {}
        with open(path, "w", encoding="utf-8") as f:
            for t in tokens:
                v = rng.standard_normal(dim).astype(np.float32)
                vecs[t] = v
                f.write(t + " " + " ".join(f"{x:.5f}" for x in v) + "\n")
        return vecs

    def test_vocab_aligned(self, tmp_path):
        from tools.build_glove_emb import build_vocab_aligned
        gpath = os.path.join(str(tmp_path), "glove.txt")
        vpath = os.path.join(str(tmp_path), "vocab.txt")
        vecs = self._write_glove(gpath, ["the", "dog", "box", "red"])
        with open(vpath, "w") as f:
            f.write("\n".join(["<pad>", "the", "box", "zzznotinglove"]) + "\n")
        mat, n_oov = build_vocab_aligned(gpath, vpath, seed=0)
        assert mat.shape == (4, 4) and n_oov == 2   # <pad> + zzznotinglove
        np.testing.assert_allclose(mat[1], vecs["the"], atol=1e-4)
        np.testing.assert_allclose(mat[2], vecs["box"], atol=1e-4)
        # OOV rows deterministic + small
        mat2, _ = build_vocab_aligned(gpath, vpath, seed=0)
        np.testing.assert_array_equal(mat[0], mat2[0])
        assert np.abs(mat[0]).max() < 0.1

    def test_full_mode_and_cli(self, tmp_path):
        from tools.build_glove_emb import build_full, main
        gpath = os.path.join(str(tmp_path), "glove.txt")
        vecs = self._write_glove(gpath, ["a", "b", "c"])
        mat, tokens = build_full(gpath)
        assert tokens == ["a", "b", "c"] and mat.shape == (3, 4)
        np.testing.assert_allclose(mat[1], vecs["b"], atol=1e-4)
        out = os.path.join(str(tmp_path), "emb.npy")
        ovocab = os.path.join(str(tmp_path), "voc.txt")
        main(["--glove", gpath, "--full", "--out", out,
              "--out-vocab", ovocab])
        assert np.load(out).shape == (3, 4)
        assert open(ovocab).read().split() == ["a", "b", "c"]

    def test_multiword_tokens(self, tmp_path):
        """Some GloVe releases contain tokens with spaces; the vector is the
        trailing dim floats."""
        from tools.build_glove_emb import iter_glove
        gpath = os.path.join(str(tmp_path), "glove.txt")
        with open(gpath, "w") as f:
            f.write("hello 1.0 2.0 3.0\n")
            f.write(". . . 4.0 5.0 6.0\n")
        items = list(iter_glove(gpath))
        assert items[0][0] == "hello"
        assert items[1][0] == ". . ."
        np.testing.assert_allclose(items[1][1], [4.0, 5.0, 6.0])


class TestRefvosBatchBuilder:
    def test_full_set_builder_and_cli(self, ytvos_meta, tmp_path):
        """build_refvos_batches enumerates meta, skips color-absent frames,
        and the -d refvos CLI drives it."""
        from PIL import Image
        root, meta_path, mask_dir = ytvos_meta
        im_dir = os.path.join(root, "JPEGImages")
        os.makedirs(os.path.join(im_dir, "v1"))
        rng = np.random.default_rng(0)
        for f in ("f0", "f1"):
            Image.fromarray(rng.integers(0, 255, (24, 32, 3),
                                         dtype=np.uint8)).save(
                os.path.join(im_dir, "v1", f + ".jpg"))
        vocab = os.path.join(root, "vocabulary_Gref.txt")
        with open(vocab, "w") as fh:
            fh.write("\n".join(["<pad>", "<go>", "<eos>", "<unk>", "a",
                                "thing"]) + "\n")

        from cmpc_refseg_tpu.data.builders import build_refvos_batches
        out = os.path.join(str(tmp_path), "o1")
        n = build_refvos_batches("train", 6, 16, 16, im_dir=im_dir,
                                 mask_dir=mask_dir, meta_expressions=meta_path,
                                 save_dir=out, vocab_file=vocab)
        assert n == 1    # frame f1 lacks the object color -> skipped
        z = np.load(os.path.join(out, "refvos", "train_batch",
                                 "refvos_train_0.npz"))
        assert z["im_batch"].shape == (16, 16, 3)
        assert z["mask_batch"].any()

        # CLI surface (reference build_batches.py:190-213)
        from cmpc_refseg_tpu.data.builders import main
        out2 = os.path.join(str(tmp_path), "o2")
        main(["-d", "refvos", "-t", "val", "-imdir", im_dir,
              "-maskdir", mask_dir, "-meta", meta_path, "-savedir", out2,
              "-data_root", root, "-T", "6", "-H", "16", "-W", "16"])
        z = np.load(os.path.join(out2, "refvos", "val_batch",
                                 "refvos_val_0.npz"))
        # val split keeps native resolution
        assert z["im_batch"].shape == (24, 32, 3)
