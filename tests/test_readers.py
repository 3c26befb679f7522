"""Reader variants: BERT-feature RefVOS reader, img_name npz reader,
ConvGRU cell."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmpc_refseg_tpu.data.reader import NpzReader
from cmpc_refseg_tpu.data.refvos import OBJECT_COLOR, RefVOSBertReader
from cmpc_refseg_tpu.models.cmpc import convgru_step, init_convgru


def _write_refvos_bert_fixture(root, T=6):
    im_dir = os.path.join(root, "JPEGImages")
    mask_dir = os.path.join(root, "Annotations")
    bert_dir = os.path.join(root, "bert")
    os.makedirs(os.path.join(im_dir, "vid0"))
    os.makedirs(os.path.join(mask_dir, "vid0"))
    os.makedirs(bert_dir)
    from PIL import Image
    rng = np.random.default_rng(0)
    im = rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
    Image.fromarray(im).save(os.path.join(im_dir, "vid0", "f0.jpg"))
    mask = np.zeros((24, 32, 3), np.uint8)
    mask[6:18, 8:24] = OBJECT_COLOR["1"]
    Image.fromarray(mask).save(os.path.join(mask_dir, "vid0", "f0.png"))
    np.savez(os.path.join(bert_dir, "vid0_0.npz"),
             feature=rng.standard_normal((4, 16)).astype(np.float32),
             mask=np.asarray([1, 1, 1, 0], np.float32))
    meta = [["vid0/f0.jpg", "vid0/f0.png", "a red thing", "1", "0"]]
    meta_path = os.path.join(root, "meta.json")
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    return im_dir, mask_dir, bert_dir, meta_path


def test_refvos_bert_reader(tmp_path):
    im_dir, mask_dir, bert_dir, meta = _write_refvos_bert_fixture(
        str(tmp_path))
    r = RefVOSBertReader(im_dir, mask_dir, bert_dir, meta, shuffle=False,
                         T=6, input_h=32, input_w=32)
    s = r.read_batch()
    assert s["im_batch"].shape == (32, 32, 3)
    assert s["mask_batch"].shape == (32, 32)
    assert s["mask_batch"].any()
    assert s["words_feat"].shape == (6, 16)          # padded 4 -> 6
    np.testing.assert_array_equal(s["sequence_mask"], [1, 1, 1, 0, 0, 0])
    # pad rows must be zero
    assert np.all(s["words_feat"][4:] == 0)


def test_npz_reader_img_name(tmp_path):
    for i in range(3):
        np.savez(os.path.join(str(tmp_path), f"unc_val_{i}.npz"),
                 im_batch=np.full((4, 4, 3), i, np.uint8))
    id2name = {"0": "a.jpg", "1": "b.jpg", "2": "c.jpg"}
    r = NpzReader(str(tmp_path), "unc_val", shuffle=False, id2name=id2name)
    names = {r.read()["img_name"] for _ in range(3)}
    assert names == {"a.jpg", "b.jpg", "c.jpg"}


def test_convgru_step_shapes_and_gating(rng):
    class Cfg:
        mlp_dim = 8
        vf_h = vf_w = 4
    p = init_convgru(jax.random.PRNGKey(0), Cfg)
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 8)), jnp.float32)
    h0 = jnp.zeros_like(x)
    h1 = convgru_step(p, x, h0)
    assert h1.shape == x.shape
    assert np.isfinite(np.asarray(h1)).all()
    # GRU output is a convex combination u*h + (1-u)*tanh(cand): bounded
    assert np.abs(np.asarray(h1)).max() <= 1.0 + 1e-5
    # state evolves on a second step
    h2 = convgru_step(p, x, h1)
    assert not np.allclose(np.asarray(h1), np.asarray(h2))


def test_prefetch_worker_error_propagates():
    """A failing load_fn must surface in read(), not deadlock the consumer
    (regression: the worker used to die silently)."""
    import pytest
    from cmpc_refseg_tpu.data.reader import PrefetchReader

    def bad_load(i):
        raise ValueError("boom")

    r = PrefetchReader(3, bad_load, shuffle=False, prefetch_num=2)
    with pytest.raises(RuntimeError, match="prefetch worker failed"):
        r.read()


def test_process_prefetch_reader(tmp_path):
    """Spawn-based multiprocess loader delivers every sample per epoch and
    propagates worker construction errors."""
    from functools import partial

    from cmpc_refseg_tpu.data.reader import ProcessPrefetchReader
    from cmpc_refseg_tpu.data.refvos import RefVOSDataset
    import json
    from PIL import Image
    from cmpc_refseg_tpu.data.refvos import OBJECT_COLOR

    root = str(tmp_path)
    os.makedirs(os.path.join(root, "J", "v"))
    os.makedirs(os.path.join(root, "A", "v"))
    rng = np.random.default_rng(0)
    meta = []
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
                        ).save(os.path.join(root, "J", "v", f"f{i}.jpg"))
        m = np.zeros((24, 32, 3), np.uint8)
        m[6:18, 8:24] = OBJECT_COLOR["1"]
        Image.fromarray(m).save(os.path.join(root, "A", "v", f"f{i}.png"))
        meta.append([f"v/f{i}.jpg", f"v/f{i}.png", "a thing", "1"])
    with open(os.path.join(root, "meta.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(root, "vocab.txt"), "w") as f:
        f.write("\n".join(["<pad>", "<go>", "<eos>", "a", "thing", "<unk>"]))

    factory = partial(RefVOSDataset, os.path.join(root, "J"),
                      os.path.join(root, "A"),
                      os.path.join(root, "meta.json"),
                      os.path.join(root, "vocab.txt"), 6, 16, 16, None)
    r = ProcessPrefetchReader(factory, 4, shuffle=False, num_workers=2,
                              prefetch_num=8)
    try:
        batch = r.read_batch(4, keys=["im_batch", "mask_batch"])
        assert batch["im_batch"].shape == (4, 16, 16, 3)
        assert batch["mask_batch"].any()
    finally:
        r.close()


def _write_refvos_fixture(root, native=(96, 128), n=3, palette_mask=False):
    """Tiny RefVOS-layout dataset; JPEG frames + (RGB or palette) PNG masks."""
    import json
    from PIL import Image
    from cmpc_refseg_tpu.data.refvos import OBJECT_COLOR

    os.makedirs(os.path.join(root, "J", "v"), exist_ok=True)
    os.makedirs(os.path.join(root, "A", "v"), exist_ok=True)
    rng = np.random.default_rng(1)
    h, w = native
    meta = []
    for i in range(n):
        # smooth content so JPEG artifacts stay small (like natural video)
        small = rng.integers(0, 255, (h // 8, w // 8, 3), dtype=np.uint8)
        im = np.asarray(Image.fromarray(small).resize((w, h),
                                                      Image.BILINEAR))
        Image.fromarray(im).save(os.path.join(root, "J", "v", f"f{i}.jpg"),
                                 quality=90)
        m = np.zeros((h, w), np.uint8)
        m[h // 4:h // 2, w // 4:w // 2] = 1
        if palette_mask:
            pm = Image.fromarray(m, mode="P")
            pm.putpalette([0, 0, 0] + list(OBJECT_COLOR["1"])
                          + [0] * (254 * 3))
            pm.save(os.path.join(root, "A", "v", f"f{i}.png"))
        else:
            rgb = np.zeros((h, w, 3), np.uint8)
            rgb[m > 0] = OBJECT_COLOR["1"]
            Image.fromarray(rgb).save(os.path.join(root, "A", "v",
                                                   f"f{i}.png"))
        meta.append([f"v/f{i}.jpg", f"v/f{i}.png", "a thing", "1"])
    with open(os.path.join(root, "meta.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(root, "vocab.txt"), "w") as f:
        f.write("\n".join(["<pad>", "<go>", "<eos>", "a", "thing", "<unk>"]))
    return (os.path.join(root, "J"), os.path.join(root, "A"),
            os.path.join(root, "meta.json"), os.path.join(root, "vocab.txt"))


@pytest.mark.parametrize("palette_mask", [False, True])
def test_fast_decode_matches_slow_path(tmp_path, palette_mask):
    """fast_decode (scaled JPEG decode + uint8 resize; sampled-first mask
    decode) vs the parity path: masks must be BIT-IDENTICAL (the bool
    resize is nearest sampling either way), images within a few LSB (the
    anti-alias filter differs: DCT scaling + INTER_AREA vs gaussian +
    bilinear).  VERDICT r4 #4."""
    from cmpc_refseg_tpu.data.refvos import RefVOSDataset

    im_dir, mask_dir, meta, vocab = _write_refvos_fixture(
        str(tmp_path), native=(96, 128), palette_mask=palette_mask)
    slow = RefVOSDataset(im_dir, mask_dir, meta, vocab, T=6,
                         input_h=32, input_w=32)
    fast = RefVOSDataset(im_dir, mask_dir, meta, vocab, T=6,
                         input_h=32, input_w=32, fast_decode=True)
    for i in range(len(slow)):
        a, b = slow.load(i), fast.load(i)
        np.testing.assert_array_equal(a["mask_batch"], b["mask_batch"])
        np.testing.assert_array_equal(a["text_batch"], b["text_batch"])
        assert a["seq_length"] == b["seq_length"]
        assert b["im_batch"].dtype == np.uint8
        diff = np.abs(a["im_batch"].astype(np.int16)
                      - b["im_batch"].astype(np.int16))
        assert diff.mean() <= 3.0, f"mean LSB diff {diff.mean():.2f}"
        assert diff.max() <= 40, f"max LSB diff {diff.max()}"
        # zero-pad rows identical
        assert (b["im_batch"][0] == 0).all() == (a["im_batch"][0] == 0).all()


def test_fast_decode_with_anchors_and_reader(tmp_path):
    """fast_decode flows through RefVOSReader + anchors (bbox labels built
    from the bit-identical fast mask match the slow path's exactly)."""
    from cmpc_refseg_tpu.data.anchors import DEFAULT_ANCHORS
    from cmpc_refseg_tpu.data.refvos import RefVOSDataset, RefVOSReader

    im_dir, mask_dir, meta, vocab = _write_refvos_fixture(str(tmp_path))
    kw = dict(T=6, input_h=32, input_w=32, anchors=DEFAULT_ANCHORS)
    slow = RefVOSDataset(im_dir, mask_dir, meta, vocab, **kw)
    fast = RefVOSDataset(im_dir, mask_dir, meta, vocab, fast_decode=True,
                         **kw)
    a, b = slow.load(0), fast.load(0)
    np.testing.assert_array_equal(a["label_bbox"], b["label_bbox"])
    np.testing.assert_array_equal(a["true_bbox"], b["true_bbox"])

    r = RefVOSReader(im_dir, mask_dir, meta, vocab, shuffle=False,
                     T=6, input_h=32, input_w=32, fast_decode=True)
    batch = r.read_collated(3)
    assert batch["im_batch"].shape == (3, 32, 32, 3)
    assert batch["im_batch"].dtype == np.uint8
    assert batch["mask_batch"].any()


def test_reader_process_sharding_disjoint_and_covering():
    """Multi-host data sharding (ADVICE round 2): readers with the same seed
    but different shard_index draw DISJOINT strides of one shared epoch
    permutation, jointly covering every sample exactly once per epoch."""
    from cmpc_refseg_tpu.data.reader import PrefetchReader

    n, shards = 12, 3

    def make(idx):
        return PrefetchReader(n, lambda i: {"i": np.asarray(i)},
                              shuffle=True, seed=7, shard_index=idx,
                              shard_count=shards)

    seen = []
    for s in range(shards):
        r = make(s)
        seen.append({int(r.read()["i"]) for _ in range(n // shards)})
    assert set().union(*seen) == set(range(n))
    for a in range(shards):
        for b in range(a + 1, shards):
            assert not (seen[a] & seen[b]), (a, b, seen)


def test_reader_sharding_epoch_reshuffles():
    from cmpc_refseg_tpu.data.reader import PrefetchReader

    n = 8
    r = PrefetchReader(n, lambda i: {"i": np.asarray(i)}, shuffle=True,
                       seed=3, shard_index=0, shard_count=2)
    ep1 = [int(r.read()["i"]) for _ in range(n // 2)]
    ep2 = [int(r.read()["i"]) for _ in range(n // 2)]
    # each epoch's shard is half the permutation; across epochs the
    # permutation changes (overwhelmingly likely for n=8)
    assert len(set(ep1)) == n // 2 and len(set(ep2)) == n // 2
    assert r.n_epoch >= 1


def test_reader_sharding_nondivisible_lockstep():
    """Non-divisible dataset sizes (round-3 advisor medium): every shard
    trims the shared permutation to an equal length, so across MANY epochs
    the shards stay disjoint within each epoch and advance the shared-seed
    permutation in lockstep (no cross-host duplicates/skips)."""
    from cmpc_refseg_tpu.data.reader import PrefetchReader

    n, shards, epochs = 10, 3, 4
    per_shard = n // shards  # trimmed length

    readers = [PrefetchReader(n, lambda i: {"i": np.asarray(i)},
                              shuffle=True, seed=11, shard_index=s,
                              shard_count=shards) for s in range(shards)]
    for _ in range(epochs):
        seen = [{int(r.read()["i"]) for _ in range(per_shard)}
                for r in readers]
        # disjoint within the epoch; jointly cover exactly 9 of 10 samples
        assert sum(len(s) for s in seen) == shards * per_shard
        union = set().union(*seen)
        assert len(union) == shards * per_shard
        for a in range(shards):
            for b in range(a + 1, shards):
                assert not (seen[a] & seen[b])
    # epoch accounting uses the trimmed length
    assert readers[0].n_epoch == epochs


def test_reader_sharding_empty_shard_rejected():
    """shard_count > num_samples raises immediately instead of deadlocking
    the feeder thread (round-3 advisor low)."""
    from cmpc_refseg_tpu.data.reader import PrefetchReader
    import pytest

    with pytest.raises(ValueError, match="exceeds dataset size"):
        PrefetchReader(2, lambda i: {"i": np.asarray(i)}, shard_index=0,
                       shard_count=3)
