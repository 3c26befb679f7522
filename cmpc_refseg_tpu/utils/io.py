"""Small IO helpers (reference: util/io.py)."""

from __future__ import annotations

import json

import numpy as np


def load_str_list(fname):
    with open(fname) as f:
        return [line.strip() for line in f]


def save_str_list(str_list, fname):
    with open(fname, "w") as f:
        f.write("\n".join(str_list) + "\n")


def load_json(fname):
    with open(fname) as f:
        return json.load(f)


def save_json(obj, fname):
    with open(fname, "w") as f:
        json.dump(obj, f, indent=2, sort_keys=True)


def read_anchors(anchor_path: str) -> np.ndarray:
    """Anchor file: one 'w,h' pair per line (util/io.py:36-43); returns
    [N, 2] float array."""
    with open(anchor_path) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    anchors = [[float(x) for x in ln.split(",")] for ln in lines]
    return np.asarray(anchors, dtype=np.float32).reshape(-1, 2)
