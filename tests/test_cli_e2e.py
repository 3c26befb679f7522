"""End-to-end CLI smoke: train a few iterations on a fake RefVOS dataset,
snapshot, then evaluate fake npz batches — the full user flow of
`cmpc-refseg -m train` / `-m test` (reference trainval_model.py CLI)."""

import json
import os

import numpy as np
import pytest


@pytest.fixture
def fake_refvos(tmp_path):
    from PIL import Image
    from cmpc_refseg_tpu.data.refvos import OBJECT_COLOR
    root = str(tmp_path)
    im_dir = os.path.join(root, "JPEGImages")
    mask_dir = os.path.join(root, "Annotations")
    os.makedirs(os.path.join(im_dir, "v0"))
    os.makedirs(os.path.join(mask_dir, "v0"))
    rng = np.random.default_rng(0)
    meta = []
    for i in range(2):
        im = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        Image.fromarray(im).save(os.path.join(im_dir, "v0", f"f{i}.jpg"))
        mask = np.zeros((48, 64, 3), np.uint8)
        mask[10:30, 20:50] = OBJECT_COLOR["1"]
        Image.fromarray(mask).save(os.path.join(mask_dir, "v0", f"f{i}.png"))
        meta.append([f"v0/f{i}.jpg", f"v0/f{i}.png", "the red box", "1"])
    meta_path = os.path.join(root, "meta.json")
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    vocab_path = os.path.join(root, "vocab.txt")
    with open(vocab_path, "w") as f:
        f.write("\n".join(["<pad>", "<go>", "<eos>", "the", "red", "box",
                           "<unk>"]))
    return dict(im_dir=im_dir, mask_dir=mask_dir, meta=meta_path,
                vocab=vocab_path, root=root)


def test_cli_train_then_eval(fake_refvos, tmp_path, capsys):
    from cmpc_refseg_tpu.cli import main

    ckpt_dir = os.path.join(str(tmp_path), "ckpt")
    log_dir = os.path.join(str(tmp_path), "logs")
    tiny = ["-H", "32", "-W", "32", "-T", "8", "-rnn_size", "16",
            "-v_emb_dim", "16", "-mlp_dim", "12", "-glove_dim", "8",
            "-res4_blocks", "2", "-vocab_size", "7"]
    main(["-m", "train", "-d", "refvos", "-t", "train", "-n", "CMPC_model",
          "-im_dir", fake_refvos["im_dir"], "-mask_dir",
          fake_refvos["mask_dir"], "-meta", fake_refvos["meta"],
          "-vocab", fake_refvos["vocab"], "-emb_dir", fake_refvos["root"],
          "-bs", "1", "-st", "2", "-s", "2", "-ckpt_dir", ckpt_dir,
          "-log_dir", log_dir, "-mesh", "1"] + tiny)
    # snapshot written
    from cmpc_refseg_tpu.train.checkpoint import latest_step
    assert latest_step(ckpt_dir) == 2

    # fake npz eval set (reference build_batches layout)
    eval_dir = os.path.join(str(tmp_path), "unc", "val_batch")
    os.makedirs(eval_dir)
    rng = np.random.default_rng(1)
    for i in range(2):
        text = np.zeros((8,), np.int32)
        text[:3] = [3, 4, 5]
        np.savez(os.path.join(eval_dir, f"unc_val_{i}.npz"),
                 text_batch=text,
                 im_batch=rng.integers(0, 255, (40, 56, 3), dtype=np.uint8),
                 mask_batch=(rng.random((40, 56)) > 0.5))
    main(["-m", "test", "-d", "unc", "-t", "val", "-n", "CMPC_model",
          "-f", str(tmp_path), "-ckpt_dir", ckpt_dir,
          "-emb_dir", fake_refvos["root"]] + tiny)
    out = capsys.readouterr().out
    assert "overall IoU" in out and "mean IoU" in out


def test_cli_video_train_then_eval(tmp_path, capsys):
    """Video CLI end-to-end on fake A2D npz batches."""
    from cmpc_refseg_tpu.cli_video import main as vmain
    rng = np.random.default_rng(0)
    for split in ("train", "test"):
        d = os.path.join(str(tmp_path), f"{split}_batch")
        os.makedirs(d)
        for i in range(2):
            text = np.zeros((6,), np.int32)
            text[:2] = [3, 4]
            mask = np.zeros((32, 32), bool)
            mask[8:20, 8:24] = True
            np.savez(os.path.join(d, f"a2d_{split}_{i}.npz"),
                     text_batch=text, seq_length=np.asarray(2),
                     mask_batch=mask,
                     frames=rng.integers(0, 255, (4, 32, 32, 3),
                                         dtype=np.uint8))
    ckpt = os.path.join(str(tmp_path), "ckpt")
    tiny = ["-H", "32", "-W", "32", "-num_steps", "6", "-rnn_size", "16",
            "-v_emb_dim", "16", "-mlp_dim", "12", "-glove_dim", "8",
            "-res4_blocks", "2", "-vocab_size", "30", "-num_frames", "4",
            "-sampled_frames", "0,1,3"]
    vmain(["-m", "train", "-f", str(tmp_path), "-i", "2", "-s", "2",
           "-ckpt_dir", ckpt, "-log_dir",
           os.path.join(str(tmp_path), "logs"),
           "-emb_dir", str(tmp_path)] + tiny)
    vmain(["-m", "test", "-f", str(tmp_path), "-ckpt_dir", ckpt,
           "-emb_dir", str(tmp_path)] + tiny)
    out = capsys.readouterr().out
    assert "mean_iou" in out and "prec@0.95" in out


def test_cli_resume_continues_from_snapshot(fake_refvos, tmp_path, capsys):
    """-resume restores the latest snapshot and continues at its step."""
    from cmpc_refseg_tpu.cli import main
    from cmpc_refseg_tpu.train.checkpoint import latest_step
    ckpt_dir = os.path.join(str(tmp_path), "ckpt")
    tiny = ["-H", "32", "-W", "32", "-T", "8", "-rnn_size", "16",
            "-v_emb_dim", "16", "-mlp_dim", "12", "-glove_dim", "8",
            "-res4_blocks", "2", "-vocab_size", "7"]
    common = ["-m", "train", "-d", "refvos", "-t", "train", "-n",
              "CMPC_model", "-im_dir", fake_refvos["im_dir"], "-mask_dir",
              fake_refvos["mask_dir"], "-meta", fake_refvos["meta"],
              "-vocab", fake_refvos["vocab"], "-emb_dir",
              fake_refvos["root"], "-bs", "1", "-s", "2", "-ckpt_dir",
              ckpt_dir, "-log_dir", os.path.join(str(tmp_path), "logs"),
              "-mesh", "1", "-workers", "1"] + tiny
    main(common + ["-st", "2"])
    assert latest_step(ckpt_dir) == 2
    main(common + ["-st", "4", "-resume"])
    out = capsys.readouterr().out
    assert "resumed from" in out and "at step 2" in out
    assert latest_step(ckpt_dir) == 4


def test_cli_eval_visualize_flag(fake_refvos, tmp_path):
    """-v dumps im/gt/pred PNGs per sample (reference visualize_seg)."""
    from cmpc_refseg_tpu.cli import main
    tiny = ["-H", "32", "-W", "32", "-T", "8", "-rnn_size", "16",
            "-v_emb_dim", "16", "-mlp_dim", "12", "-glove_dim", "8",
            "-res4_blocks", "2", "-vocab_size", "7"]
    eval_dir = os.path.join(str(tmp_path), "unc", "val_batch")
    os.makedirs(eval_dir)
    rng = np.random.default_rng(1)
    text = np.zeros((8,), np.int32)
    text[:2] = [3, 4]
    np.savez(os.path.join(eval_dir, "unc_val_0.npz"), text_batch=text,
             im_batch=rng.integers(0, 255, (24, 40, 3), dtype=np.uint8),
             mask_batch=(rng.random((24, 40)) > 0.5))
    log_dir = os.path.join(str(tmp_path), "logs")
    main(["-m", "test", "-d", "unc", "-t", "val", "-n", "CMPC_model",
          "-f", str(tmp_path), "-ckpt_dir", os.path.join(str(tmp_path), "x"),
          "-emb_dir", fake_refvos["root"], "-log_dir", log_dir, "-v"] + tiny)
    vis = os.path.join(log_dir, "visualize")
    assert sorted(os.listdir(vis)) == ["00000_gt.png", "00000_im.png",
                                       "00000_pred.png"]


def test_cli_periodic_validation(fake_refvos, tmp_path, capsys):
    """-val_meta triggers in-training validation every -val_every iters
    (reference trainval_model_bert.py:107-122)."""
    from cmpc_refseg_tpu.cli import main
    tiny = ["-H", "32", "-W", "32", "-T", "8", "-rnn_size", "16",
            "-v_emb_dim", "16", "-mlp_dim", "12", "-glove_dim", "8",
            "-res4_blocks", "2", "-vocab_size", "7"]
    main(["-m", "train", "-d", "refvos", "-t", "train", "-n", "CMPC_model",
          "-im_dir", fake_refvos["im_dir"], "-mask_dir",
          fake_refvos["mask_dir"], "-meta", fake_refvos["meta"],
          "-vocab", fake_refvos["vocab"], "-emb_dir", fake_refvos["root"],
          "-bs", "1", "-st", "2", "-s", "0", "-ckpt_dir",
          os.path.join(str(tmp_path), "c"), "-log_dir",
          os.path.join(str(tmp_path), "l"), "-mesh", "1", "-workers", "1",
          "-val_meta", fake_refvos["meta"], "-val_every", "2",
          "-val_batches", "2"] + tiny)
    out = capsys.readouterr().out
    assert "[val] overall IoU" in out
    # val metrics logged to jsonl
    lines = open(os.path.join(str(tmp_path), "l", "metrics.jsonl")).read()
    assert "val_overall_iou" in lines


def test_ytvos_inference_writes_masks(tmp_path):
    """infer_video.run_inference over a fake meta_expressions.json +
    frames writes per-expression mask PNGs at half resolution
    (reference test.py:237-334)."""
    import json
    from PIL import Image
    from cmpc_refseg_tpu.config import get_config
    from cmpc_refseg_tpu.infer_video import run_inference
    from cmpc_refseg_tpu.models.model import init_model
    import jax

    root = str(tmp_path)
    im_dir = os.path.join(root, "JPEGImages")
    os.makedirs(os.path.join(im_dir, "video1"))
    rng = np.random.default_rng(0)
    frames = ["00000", "00005", "00010"]
    for f in frames:
        Image.fromarray(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
                        ).save(os.path.join(im_dir, "video1", f"{f}.jpg"))
    meta = {"videos": {"video1": {
        "expressions": {"0": {"exp": "the red box"},
                        "1": {"exp": "a blue dog"}},
        "frames": frames}}}
    meta_path = os.path.join(root, "meta_expressions.json")
    with open(meta_path, "w") as fh:
        json.dump(meta, fh)
    vocab_path = os.path.join(root, "vocab.txt")
    with open(vocab_path, "w") as fh:
        fh.write("\n".join(["<pad>", "<go>", "<eos>", "the", "red", "box",
                            "a", "blue", "dog", "<unk>"]))

    cfg = get_config("CMPC_model", H=32, W=32, num_steps=8, vocab_size=10,
                     glove_dim=8, rnn_size=16, v_emb_dim=16, mlp_dim=12,
                     res4_blocks=2)
    params, state = init_model(jax.random.PRNGKey(0), cfg)
    out_dir = os.path.join(root, "results")
    n = run_inference(cfg, params, state, meta_path=meta_path, im_dir=im_dir,
                      out_dir=out_dir, vocab_path=vocab_path, frame_batch=2)
    assert n == 2
    for eid in ("0", "1"):
        for f in frames:
            p = os.path.join(out_dir, "video1", eid, f"{f}.png")
            assert os.path.isfile(p), p
            m = np.asarray(Image.open(p))
            assert m.shape == (24, 32)        # half resolution
            assert set(np.unique(m)) <= {0, 255}


def test_ytvos_inference_inconsistency_report(tmp_path):
    """-inconsistency_report writes inconsitent_frames.json (reference
    test_v5+.py:354 surface, typo preserved): [vid, eid, frame] triples
    whose c4/c5 aux-head masks disagree (IoU@0.2 < 0.3)."""
    import json
    from PIL import Image
    from cmpc_refseg_tpu.config import get_config
    from cmpc_refseg_tpu.infer_video import run_inference
    from cmpc_refseg_tpu.models.model import init_model
    import jax

    root = str(tmp_path)
    im_dir = os.path.join(root, "JPEGImages")
    os.makedirs(os.path.join(im_dir, "v1"))
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
                    ).save(os.path.join(im_dir, "v1", "00000.jpg"))
    meta = {"videos": {"v1": {"expressions": {"0": {"exp": "a thing"}},
                              "frames": ["00000"]}}}
    meta_path = os.path.join(root, "meta.json")
    with open(meta_path, "w") as fh:
        json.dump(meta, fh)
    vocab_path = os.path.join(root, "vocab.txt")
    with open(vocab_path, "w") as fh:
        fh.write("\n".join(["<pad>", "<go>", "<eos>", "a", "thing",
                            "<unk>"]))
    cfg = get_config("CMPC_model", H=32, W=32, num_steps=6, vocab_size=6,
                     glove_dim=8, rnn_size=16, v_emb_dim=16, mlp_dim=12,
                     res4_blocks=2)
    params, state = init_model(jax.random.PRNGKey(0), cfg)
    out_dir = os.path.join(root, "results")
    run_inference(cfg, params, state, meta_path=meta_path, im_dir=im_dir,
                  out_dir=out_dir, vocab_path=vocab_path, frame_batch=1,
                  inconsistency_report=True)
    rpt = os.path.join(out_dir, "inconsitent_frames.json")
    assert os.path.isfile(rpt)
    entries = json.load(open(rpt))
    assert isinstance(entries, list)
    for e in entries:
        assert e[:2] == ["v1", "0"]
