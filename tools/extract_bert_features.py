"""Precompute per-expression BERT features for the BERT model variants.

The reference consumes precomputed features (`util/data_reader_refvos_bert.py`
loads `bert_dir/{video}_{eid}.npz` with keys 'feature' [T,768] and 'mask'
[T]) but ships no extraction script.  This tool closes that loop: it walks a
YouTube-VOS `meta_expressions.json`, tokenizes each expression, runs a
HuggingFace BERT encoder (CPU torch; any local/cached `bert-base-uncased`-
compatible model), and writes the npz files the reader expects.

Usage:
  python tools/extract_bert_features.py -meta meta_expressions.json \
      -out bert_features/ [-model bert-base-uncased] [-T 20]
"""

from __future__ import annotations

import argparse
import json
import os


def extract(meta_path: str, out_dir: str, model_name: str = "bert-base-uncased",
            T: int = 20, device: str = "cpu") -> int:
    import numpy as np
    import torch
    from transformers import AutoModel, AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(model_name)
    model = AutoModel.from_pretrained(model_name).to(device).eval()

    with open(meta_path) as f:
        videos = json.load(f)["videos"]
    os.makedirs(out_dir, exist_ok=True)

    n = 0
    with torch.no_grad():
        for vid in sorted(videos):
            for eid, edata in sorted(videos[vid]["expressions"].items()):
                enc = tokenizer(edata["exp"], return_tensors="pt",
                                truncation=True, max_length=T,
                                padding="max_length")
                out = model(**{k: v.to(device) for k, v in enc.items()})
                feature = out.last_hidden_state[0].cpu().numpy()   # [T, 768]
                mask = enc["attention_mask"][0].numpy().astype("float32")
                np.savez(os.path.join(out_dir, f"{vid}_{eid}.npz"),
                         feature=feature.astype("float32"), mask=mask)
                n += 1
    return n


def main():
    ap = argparse.ArgumentParser("BERT feature extraction")
    ap.add_argument("-meta", required=True)
    ap.add_argument("-out", required=True)
    ap.add_argument("-model", default="bert-base-uncased")
    ap.add_argument("-T", type=int, default=20)
    args = ap.parse_args()
    n = extract(args.meta, args.out, args.model, args.T)
    print(f"wrote {n} expression feature files to {args.out}")


if __name__ == "__main__":
    main()
