"""RefVOS (YouTube-VOS referring) online data pipeline.

Reference: util/data_reader_refvos.py — loads a JPEG frame + palette PNG
mask, decodes the referred object by its palette color, resize-pads to
(H, W), derives YOLO anchor labels from the mask bbox, tokenizes the
expression (back-pad + seq_len).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from cmpc_refseg_tpu.data import image as im_proc
from cmpc_refseg_tpu.data import text as text_proc
from cmpc_refseg_tpu.data.anchors import preprocess_true_boxes

# palette colors of YouTube-VOS object ids (util/data_reader_refvos.py:14-21)
OBJECT_COLOR = {
    "1": [236, 95, 103],
    "2": [249, 145, 87],
    "3": [250, 200, 99],
    "4": [153, 199, 148],
    "5": [98, 179, 178],
    "6": [102, 153, 204],
}


def _imread(path: str) -> np.ndarray:
    from PIL import Image
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"))


def decode_object_mask(mask_rgb: np.ndarray, obj_id: str) -> np.ndarray:
    """Binary mask of one object from a palette-rendered RGB mask image
    (util/data_reader_refvos.py:29-30: equality on the R channel after
    comparing all 3 channels — we match all 3 for robustness-equivalence)."""
    c = OBJECT_COLOR[obj_id]
    # three chained channel compares beat np.all(mask == color, -1) ~5x
    # (no [H,W,3] bool intermediate + reduction)
    return ((mask_rgb[..., 0] == c[0]) & (mask_rgb[..., 1] == c[1])
            & (mask_rgb[..., 2] == c[2]))


def preprocess_sample(im: np.ndarray, mask_rgb: np.ndarray, sent: str,
                      obj_id: str, vocab_dict: dict, T: int,
                      input_h: int, input_w: int,
                      anchors: Optional[np.ndarray] = None) -> dict:
    """One training record (util/data_reader_refvos.py:27-46)."""
    mask_obj = decode_object_mask(mask_rgb, obj_id)
    im_out = im_proc.resize_and_pad(im, input_h, input_w)
    im_out = np.clip(np.rint(im_out), 0, 255).astype(np.uint8)
    mask_out = im_proc.resize_and_pad(mask_obj, input_h, input_w)
    text, seq_len = text_proc.preprocess_sentence_lstm(sent, vocab_dict, T)
    rec = {
        "text_batch": np.asarray(text, np.int32),
        "im_batch": im_out,
        "seq_length": np.int32(seq_len),
        "mask_batch": mask_out > 0,
        "sent_batch": np.asarray(sent),
    }
    if anchors is not None:
        bbox = im_proc.bboxes_from_masks(np.asarray(mask_out))
        bbox = bbox.astype(np.float64)
        # reader stores [x, y, w, h] += -> [x1, y1, x2, y2]
        bbox[:, 2:4] += bbox[:, :2]
        label_bbox, true_bbox = preprocess_true_boxes(bbox, input_h, anchors)
        rec["label_bbox"] = label_bbox.astype(np.float32)
        rec["true_bbox"] = true_bbox.astype(np.float32)
    return rec


class RefVOSDataset:
    """Picklable index->sample loader over a metadata list of
    [im, mask, expression, obj_id] records (train_meta.json made by
    generate_trainmeta.py:29-48).  No threads/processes of its own, so it
    can be constructed inside multiprocessing workers."""

    def __init__(self, im_dir: str, mask_dir: str, metadata_path: str,
                 vocab_path: str, T: int = 20, input_h: int = 320,
                 input_w: int = 320, anchors: Optional[np.ndarray] = None):
        self.im_dir = im_dir
        self.mask_dir = mask_dir
        with open(metadata_path) as f:
            self.metadata = json.load(f)
        self.T = T
        self.input_h = input_h
        self.input_w = input_w
        self.anchors = anchors
        self.vocab_dict = text_proc.load_vocab_dict_from_file(vocab_path)

    def __len__(self):
        return len(self.metadata)

    def load(self, i: int) -> dict:
        rec = self.metadata[i]
        im_name, mask_name, sent, obj_id = rec[:4]
        im = _imread(os.path.join(self.im_dir, im_name))
        mask = _imread(os.path.join(self.mask_dir, mask_name))[:, :, :3]
        return preprocess_sample(im, mask, sent, obj_id, self.vocab_dict,
                                 self.T, self.input_h, self.input_w,
                                 self.anchors)


class RefVOSReader:
    """RefVOSDataset + prefetch.  ``num_workers<=1``: one daemon thread (the
    reference's shape, deterministic order).  ``num_workers>1``: worker
    PROCESSES (decode/resize are GIL-bound; threads scale negatively)."""

    COLLATE_KEYS = ["text_batch", "im_batch", "seq_length", "mask_batch"]

    def __init__(self, im_dir: str, mask_dir: str, metadata_path: str,
                 vocab_path: str, shuffle=True, prefetch_num: int = 8,
                 T: int = 20, input_h: int = 320, input_w: int = 320,
                 anchors: Optional[np.ndarray] = None, seed: int = 0,
                 num_workers: int = 1, shard_index: int = 0,
                 shard_count: int = 1):
        from functools import partial

        from cmpc_refseg_tpu.data.reader import (PrefetchReader,
                                                 ProcessPrefetchReader)
        self.dataset = RefVOSDataset(im_dir, mask_dir, metadata_path,
                                     vocab_path, T, input_h, input_w, anchors)
        self.num_batch = len(self.dataset)
        if num_workers > 1:
            factory = partial(RefVOSDataset, im_dir, mask_dir, metadata_path,
                              vocab_path, T, input_h, input_w, anchors)
            self._reader = ProcessPrefetchReader(
                factory, self.num_batch, shuffle=shuffle,
                num_workers=num_workers, prefetch_num=prefetch_num,
                seed=seed, shard_index=shard_index, shard_count=shard_count)
        else:
            self._reader = PrefetchReader(self.num_batch, self.dataset.load,
                                          shuffle, prefetch_num, seed,
                                          shard_index=shard_index,
                                          shard_count=shard_count)

    def read_batch(self) -> dict:
        return self._reader.read()

    def read_collated(self, batch_size: int) -> dict:
        return self._reader.read_batch(batch_size, keys=self.COLLATE_KEYS)


class RefVOSBertReader:
    """RefVOS reader with precomputed per-expression BERT features
    (reference util/data_reader_refvos_bert.py:29-70): metadata records are
    [im, mask, expression, obj_id, eid]; features live at
    ``bert_dir/{video}_{eid}.npz`` with keys 'feature' [T,768] and
    'mask' [T]."""

    def __init__(self, im_dir: str, mask_dir: str, bert_dir: str,
                 metadata_path: str, shuffle=True, prefetch_num: int = 8,
                 T: int = 20, input_h: int = 320, input_w: int = 320,
                 seed: int = 0, num_workers: int = 1, shard_index: int = 0,
                 shard_count: int = 1):
        from cmpc_refseg_tpu.data.reader import PrefetchReader
        self.im_dir = im_dir
        self.mask_dir = mask_dir
        self.bert_dir = bert_dir
        with open(metadata_path) as f:
            self.metadata = json.load(f)
        self.T = T
        self.input_h = input_h
        self.input_w = input_w
        self._reader = PrefetchReader(len(self.metadata), self._load,
                                      shuffle, prefetch_num, seed,
                                      num_workers=num_workers,
                                      shard_index=shard_index,
                                      shard_count=shard_count)
        self.num_batch = len(self.metadata)

    def _load(self, i: int) -> dict:
        im_name, mask_name, sent, obj_id, eid = self.metadata[i][:5]
        vid = im_name.split("/")[0]
        feats = np.load(os.path.join(self.bert_dir, f"{vid}_{eid}.npz"))
        im = _imread(os.path.join(self.im_dir, im_name))
        mask_rgb = _imread(os.path.join(self.mask_dir, mask_name))[:, :, :3]
        mask_obj = decode_object_mask(mask_rgb, obj_id)
        im_out = im_proc.resize_and_pad(
            im.astype(np.float32), self.input_h, self.input_w)
        mask_out = im_proc.resize_and_pad(
            mask_obj.astype(np.float32), self.input_h, self.input_w) > 0

        feature = np.asarray(feats["feature"], np.float32)
        seq_mask = np.asarray(feats["mask"], np.float32).reshape(-1)
        # pad/truncate to T
        t = feature.shape[0]
        if t >= self.T:
            feature, seq_mask = feature[:self.T], seq_mask[:self.T]
        else:
            feature = np.pad(feature, ((0, self.T - t), (0, 0)))
            seq_mask = np.pad(seq_mask, (0, self.T - t))
        return {
            "im_batch": im_out,
            "mask_batch": mask_out,
            "words_feat": feature,
            "sequence_mask": seq_mask,
        }

    def read_batch(self) -> dict:
        return self._reader.read()

    def read_collated(self, batch_size: int) -> dict:
        return self._reader.read_batch(
            batch_size,
            keys=["im_batch", "mask_batch", "words_feat", "sequence_mask"])
