"""One-command dress rehearsal of the UNC accuracy-parity runbook.

The real parity run (docs/PARITY_RUNBOOK.md) is blocked on external
artifacts (COCO images, REFER pickles, the Baidu TF checkpoint).  This tool
executes the ENTIRE flow end-to-end against fabricated artifacts so the
runbook has no seams the day the real ones land (VERDICT round-2 #5):

  1. fabricate a reference-NAMED TF checkpoint (reusing the converter
     test fixture, tests/test_converter.py::_ckpt_tensors — every variable
     name is pinned against the reference source by that test suite),
  2. fabricate a synthetic mini-REFER/COCO layout (refcoco refs(unc).p
     pickle + instances.json with polygon+RLE annotations + COCO-named
     jpgs + vocabulary file),
  3. build val batches:      builders -d unc -t val        (reference
     build_batches.py:79-124 surface),
  4. convert the checkpoint: tools/convert_tf_checkpoint.convert -> orbax
     TrainState checkpoint,
  5. evaluate with CRF:      cmpc-refseg -m test -d unc -c  (reference
     trainval_model.py:150-303 protocol),
  6. report the printed IoU/precision table.

Run:  python tools/parity_rehearsal.py [workdir]
Also wrapped as a pytest (tests/test_parity_rehearsal.py, marked slow).
Requires TF (for writing the fabricated TF checkpoint) — the same
dependency the real conversion needs.
"""

import contextlib
import io
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TINY = dict(H=32, W=32, num_steps=6, vocab_size=30, glove_dim=8,
            rnn_size=16, v_emb_dim=16, mlp_dim=12, batch_size=1,
            res4_blocks=2)

VOCAB_WORDS = ["<pad>", "<go>", "<eos>", "<unk>", "a", "the", "red", "blue",
               "left", "right", "person", "dog", "on", "man", "woman", "big",
               "small", "green", "top", "bottom", "cat", "car", "chair",
               "table", "in", "of", "middle", "white", "black", "near"]


def fabricate_refer_layout(data_root: str, n_images: int = 3) -> None:
    """Synthetic mini-REFER: refcoco/refs(unc).p + instances.json (one
    polygon and one RLE annotation among them) + COCO-named train2014 jpgs
    + vocabulary_Gref.txt."""
    from PIL import Image

    from cmpc_refseg_tpu.data.coco_mask import (rle_counts_from_mask,
                                                rle_string_from_counts)

    rng = np.random.default_rng(11)
    os.makedirs(os.path.join(data_root, "refer", "refcoco"), exist_ok=True)
    im_dir = os.path.join(data_root, "coco", "images", "train2014")
    os.makedirs(im_dir, exist_ok=True)

    with open(os.path.join(data_root, "vocabulary_Gref.txt"), "w") as f:
        f.write("\n".join(VOCAB_WORDS) + "\n")

    refs, annotations, images = [], [], []
    sents = ["the red person on the left", "a big dog near the table",
             "small cat in the middle"]
    for i in range(n_images):
        h, w = 48 + 8 * i, 64 + 8 * i
        img_id, ann_id = 100 + i, 200 + i
        im = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        Image.fromarray(im).save(
            os.path.join(im_dir, f"COCO_train2014_{img_id:012d}.jpg"))
        images.append({"id": img_id, "height": h, "width": w,
                       "file_name": f"COCO_train2014_{img_id:012d}.jpg"})
        if i % 2 == 0:
            # polygon annotation: a triangle-ish blob
            seg = [[8.0, 8.0, float(w - 10), 12.0, float(w // 2),
                    float(h - 8)]]
        else:
            # RLE annotation of a centered box (compressed-string form)
            m = np.zeros((h, w), np.uint8)
            m[h // 4:3 * h // 4, w // 4:3 * w // 4] = 1
            seg = {"size": [h, w],
                   "counts": rle_string_from_counts(rle_counts_from_mask(m))}
        annotations.append({"id": ann_id, "image_id": img_id,
                            "segmentation": seg, "iscrowd": 0})
        refs.append({"ref_id": i, "ann_id": ann_id, "image_id": img_id,
                     "split": "val",
                     "sentences": [{"sent": sents[i % len(sents)]}]})

    with open(os.path.join(data_root, "refer", "refcoco",
                           "refs(unc).p"), "wb") as f:
        pickle.dump(refs, f)
    with open(os.path.join(data_root, "refer", "refcoco",
                           "instances.json"), "w") as f:
        json.dump({"images": images, "annotations": annotations}, f)


def fabricate_tf_checkpoint(workdir: str) -> str:
    """Reference-named TF ckpt via the converter test fixture (whose names
    are grep-pinned against the reference sources by tests/test_converter)."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from test_converter import _ckpt_tensors, _write_ckpt  # noqa: E402

    from cmpc_refseg_tpu.config import get_config
    cfg = get_config("CMPC_model", **TINY)
    tensors = _ckpt_tensors(cfg)
    return _write_ckpt(tensors, os.path.join(workdir, "tf", "model.ckpt"))


def convert_and_checkpoint(ckpt_path: str, workdir: str) -> str:
    """TF ckpt -> converted params -> orbax TrainState checkpoint that
    `cmpc-refseg -m test -ckpt_dir <dir>` restores."""
    import jax

    from tools.convert_tf_checkpoint import convert

    import dataclasses

    from cmpc_refseg_tpu.train.checkpoint import save_checkpoint
    from cmpc_refseg_tpu.train.optimizer import partition_params
    from cmpc_refseg_tpu.train.trainer import (create_train_state,
                                               replace_trainable)

    cfg, params, model_state = convert(ckpt_path, "CMPC_model",
                                       overrides=TINY)
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    trainable, frozen = partition_params(params, cfg)
    state = replace_trainable(state, trainable)
    state = dataclasses.replace(state, frozen=frozen,
                                model_state=model_state)
    ckpt_dir = os.path.join(workdir, "converted_ckpt")
    save_checkpoint(ckpt_dir, state, 0)
    return ckpt_dir


def run(workdir: str) -> dict:
    from cmpc_refseg_tpu import cli
    from cmpc_refseg_tpu.data import builders

    data_root = os.path.join(workdir, "data")
    out_root = os.path.join(workdir, "batches")

    print("[rehearsal] 1/5 fabricating mini-REFER/COCO layout ...")
    fabricate_refer_layout(data_root)

    print("[rehearsal] 2/5 building UNC val batches (builders -d unc) ...")
    builders.main(["-d", "unc", "-t", "val", "-data_root", data_root,
                   "-out_root", out_root, "-T", str(TINY["num_steps"]),
                   "-H", str(TINY["H"]), "-W", str(TINY["W"])])
    built = [f for f in os.listdir(os.path.join(out_root, "unc",
                                                "val_batch"))
             if f.endswith(".npz")]
    assert built, "builder wrote no batches"

    print("[rehearsal] 3/5 fabricating reference-named TF checkpoint ...")
    ckpt = fabricate_tf_checkpoint(workdir)

    print("[rehearsal] 4/5 converting TF -> orbax TrainState ...")
    ckpt_dir = convert_and_checkpoint(ckpt, workdir)

    print("[rehearsal] 5/5 evaluating (cmpc-refseg -m test -d unc -c) ...")
    argv = ["-m", "test", "-d", "unc", "-t", "val", "-f", out_root,
            "-ckpt_dir", ckpt_dir, "-emb_dir", data_root,
            "-T", str(TINY["num_steps"]), "-H", str(TINY["H"]),
            "-W", str(TINY["W"]), "-bs", "1", "-c"]
    for k in ("rnn_size", "v_emb_dim", "mlp_dim", "glove_dim",
              "res4_blocks", "vocab_size"):
        argv += [f"-{k}", str(TINY[k])]
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cli.main(argv)
    report = buf.getvalue()
    print(report)

    assert "overall IoU" in report, report
    results = {}
    for line in report.splitlines():
        if "=" in line and ("IoU" in line or "precision@" in line):
            k, v = line.rsplit("=", 1)
            try:
                results[k.strip()] = float(v.split("(")[0])
            except ValueError:
                pass
    assert "overall IoU" in results
    print(f"[rehearsal] PASS — full runbook flow is seam-free "
          f"({len(built)} batches, overall IoU "
          f"{results['overall IoU']:.4f} on fabricated weights)")
    return results


def main():
    import tempfile
    workdir = (sys.argv[1] if len(sys.argv) > 1
               else tempfile.mkdtemp(prefix="parity_rehearsal_"))
    os.makedirs(workdir, exist_ok=True)
    run(workdir)


if __name__ == "__main__":
    main()
