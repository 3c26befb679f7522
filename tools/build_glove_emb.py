"""Build the GloVe embedding matrix `data/{emb}_emb.npy` the models load at
init (reference: CMPC_model.py:79-81; the shipped `Gref_emb.npy` is a
missing-large-blob artifact, .MISSING_LARGE_BLOBS:1).

Two modes:
- --vocab: align rows to a vocabulary file (one token per line, the
  text_processing vocab convention incl. <unk>/<pad>/<eos>): row i is the
  GloVe vector of vocab token i.  Tokens absent from GloVe (incl. the
  special tokens) get a SEEDED small-normal init — the matrix is a
  trainable-variable initializer, so any reasonable init works; seeding
  keeps builds reproducible.
- --full: emit every GloVe vector in file order plus the matching token
  list — the refvos train path's full-GloVe vocabulary
  (vocab_size 1917498, trainval_model.py:33).

Usage:
  python tools/build_glove_emb.py --glove glove.840B.300d.txt \
      --vocab data/vocabulary_Gref.txt --out data/Gref_emb.npy
  python tools/build_glove_emb.py --glove glove.840B.300d.txt --full \
      --out data/refvos_emb.npy --out-vocab data/vocabulary_refvos.txt
"""

from __future__ import annotations

import argparse

import numpy as np


def iter_glove(path):
    """Yield (token, vector) from a GloVe text file.  Tokens may contain
    spaces in some releases; the vector is always the trailing `dim` floats,
    so split from the right."""
    dim = None
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split(" ")
            if dim is None:
                # infer dim from the first line: trailing floats
                k = len(parts) - 1
                while k > 0:
                    try:
                        float(parts[k])
                        k -= 1
                    except ValueError:
                        break
                dim = len(parts) - 1 - k
            token = " ".join(parts[:len(parts) - dim])
            vec = np.asarray(parts[len(parts) - dim:], dtype=np.float32)
            yield token, vec


def build_vocab_aligned(glove_path: str, vocab_path: str, *,
                        seed: int = 0, oov_scale: float = 0.01):
    """[len(vocab), dim] matrix with row i = GloVe vector of vocab token i;
    OOV rows ~ N(0, oov_scale^2) (seeded).  Returns (matrix, n_oov)."""
    with open(vocab_path, encoding="utf-8") as f:
        vocab = [line.strip() for line in f if line.strip()]
    want = {tok: i for i, tok in enumerate(vocab)}

    mat = None
    found = np.zeros(len(vocab), dtype=bool)
    for token, vec in iter_glove(glove_path):
        if mat is None:
            rng = np.random.default_rng(seed)
            mat = (oov_scale * rng.standard_normal(
                (len(vocab), vec.shape[0]))).astype(np.float32)
        i = want.get(token)
        if i is not None and not found[i]:
            mat[i] = vec
            found[i] = True
    if mat is None:
        raise ValueError(f"empty GloVe file {glove_path}")
    return mat, int((~found).sum())


def build_full(glove_path: str):
    """All GloVe vectors in file order + the token list (refvos full-vocab
    path)."""
    tokens, vecs = [], []
    for token, vec in iter_glove(glove_path):
        tokens.append(token)
        vecs.append(vec)
    return np.stack(vecs).astype(np.float32), tokens


def main(argv=None):
    ap = argparse.ArgumentParser(__doc__)
    ap.add_argument("--glove", required=True, help="GloVe .txt file")
    ap.add_argument("--vocab", help="vocabulary file to align rows to")
    ap.add_argument("--full", action="store_true",
                    help="emit every GloVe vector (refvos full-vocab path)")
    ap.add_argument("--out", required=True, help="output .npy matrix")
    ap.add_argument("--out-vocab",
                    help="with --full: write the matching token list here")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    if bool(args.vocab) == bool(args.full):
        ap.error("exactly one of --vocab / --full is required")
    if args.full:
        mat, tokens = build_full(args.glove)
        if args.out_vocab:
            with open(args.out_vocab, "w", encoding="utf-8") as f:
                f.write("\n".join(tokens) + "\n")
        print(f"{mat.shape[0]} tokens, dim {mat.shape[1]}")
    else:
        mat, n_oov = build_vocab_aligned(args.glove, args.vocab,
                                         seed=args.seed)
        print(f"{mat.shape[0]} rows, dim {mat.shape[1]}, {n_oov} OOV rows")
    np.save(args.out, mat)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
