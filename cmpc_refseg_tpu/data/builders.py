"""Offline batch builders (reference: build_batches.py, generate_trainmeta.py,
generate_black.py).

Each builder writes per-sample `.npz` files consumed by NpzReader —
`{text_batch, im_batch, mask_batch, sent_batch}` (build_batches.py:72-76).
"""

from __future__ import annotations

import json
import os

import numpy as np

from cmpc_refseg_tpu.data import image as im_proc
from cmpc_refseg_tpu.data import text as text_proc
from cmpc_refseg_tpu.data.refvos import OBJECT_COLOR, decode_object_mask


def _imread(path):
    from PIL import Image
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"))


def _load_referit_mask(mask_path):
    """ReferIt .mat masks: object = (segimg_t == 0) (util/io.py:26-29)."""
    from scipy.io import loadmat
    mat = loadmat(mask_path)
    segimg_t = mat["segimg_t"]
    return segimg_t == 0


def build_referit_batches(setname: str, T: int, input_H: int, input_W: int,
                          data_root: str = "./data",
                          out_root: str = "./referit") -> int:
    """ReferIt builder (build_batches.py:30-76): resize-pad only for train;
    test keeps native resolution for the eval-time crop-back protocol."""
    vocab_file = os.path.join(data_root, "vocabulary_referit.txt")
    im_dir = os.path.join(data_root, "referit/images")
    mask_dir = os.path.join(data_root, "referit/mask")
    query_file = os.path.join(
        data_root, f"referit/referit_query_{setname.split('_')[-1]}.json")

    vocab_dict = text_proc.load_vocab_dict_from_file(vocab_file)
    with open(query_file) as f:
        query_dict = json.load(f)

    out_dir = os.path.join(out_root, setname + "_batch")
    os.makedirs(out_dir, exist_ok=True)
    is_train = "train" in setname

    n = 0
    for name, sents in sorted(query_dict.items()):
        im_name = name.split("_", 1)[0] + ".jpg"
        im = _imread(os.path.join(im_dir, im_name))
        mask = _load_referit_mask(os.path.join(mask_dir, name + ".mat"))
        if is_train:
            im_out = im_proc.resize_and_pad(im, input_H, input_W)
            im_out = np.clip(np.rint(im_out), 0, 255).astype(np.uint8)
            mask_out = im_proc.resize_and_pad(mask, input_H, input_W)
        else:
            im_out, mask_out = im, mask
        for sent in sents:
            text = text_proc.preprocess_sentence(sent, vocab_dict, T)
            np.savez(os.path.join(out_dir, f"referit_{setname}_{n}.npz"),
                     text_batch=np.asarray(text, np.int32),
                     im_batch=im_out, mask_batch=(mask_out > 0),
                     sent_batch=[sent])
            n += 1
    return n


def build_refvos_sample(im_path: str, mask_path: str, sent: str, obj_id: str,
                        vocab_dict: dict, T: int, input_H: int, input_W: int,
                        out_path: str) -> None:
    """RefVOS single-sample builder (build_batches.py:126-189)."""
    im = _imread(im_path)
    mask_rgb = _imread(mask_path)[:, :, :3]
    mask = decode_object_mask(mask_rgb, obj_id)
    im_out = im_proc.resize_and_pad(im, input_H, input_W)
    im_out = np.clip(np.rint(im_out), 0, 255).astype(np.uint8)
    mask_out = im_proc.resize_and_pad(mask, input_H, input_W)
    text, seq_len = text_proc.preprocess_sentence_lstm(sent, vocab_dict, T)
    np.savez(out_path, text_batch=np.asarray(text, np.int32),
             im_batch=im_out, mask_batch=(mask_out > 0),
             seq_length=np.int32(seq_len), sent_batch=[sent])


def generate_trainmeta(meta_expressions_path: str, mask_dir: str,
                       out_path: str) -> int:
    """Scan YouTube-VOS meta_expressions.json + PNG masks; keep only frames
    where the referred object's palette color is present; write
    [im, mask, exp, obj_id] records (generate_trainmeta.py:29-48)."""
    with open(meta_expressions_path) as f:
        meta = json.load(f)["videos"]
    records = []
    for vid, vdata in sorted(meta.items()):
        frames = vdata["frames"]
        for eid, edata in sorted(vdata["expressions"].items()):
            obj_id = str(edata["obj_id"])
            color = np.asarray(OBJECT_COLOR[obj_id], np.uint8)
            for frame in frames:
                mask_rel = f"{vid}/{frame}.png"
                mask_path = os.path.join(mask_dir, mask_rel)
                if not os.path.isfile(mask_path):
                    continue
                mask = _imread(mask_path)[:, :, :3]
                if np.any(np.all(mask == color, axis=-1)):
                    records.append([f"{vid}/{frame}.jpg", mask_rel,
                                    edata["exp"], obj_id])
    with open(out_path, "w") as f:
        json.dump(records, f)
    return len(records)


def generate_black_submission(meta_expressions_path: str, out_dir: str,
                              height: int = 720, width: int = 1280) -> int:
    """All-black PNG scaffolding for every video/expression/frame
    (generate_black.py:13-37)."""
    from PIL import Image
    with open(meta_expressions_path) as f:
        meta = json.load(f)["videos"]
    black = Image.fromarray(np.zeros((height, width), np.uint8))
    n = 0
    for vid, vdata in sorted(meta.items()):
        for eid in sorted(vdata["expressions"]):
            d = os.path.join(out_dir, vid, eid)
            os.makedirs(d, exist_ok=True)
            for frame in vdata["frames"]:
                black.save(os.path.join(d, f"{frame}.png"))
                n += 1
    return n
