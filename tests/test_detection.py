"""Detection head ('v5+' surface) tests: decode geometry, loss behavior,
end-to-end train step with bbox labels."""

import jax
import jax.numpy as jnp
import numpy as np

from cmpc_refseg_tpu.config import get_config
from cmpc_refseg_tpu.data.anchors import (DEFAULT_ANCHORS, bbox_iou_xywh,
                                          preprocess_true_boxes)
from cmpc_refseg_tpu.models.detection import (_giou_xywh, apply_bbox_head,
                                              bbox_loss, init_bbox_head)

TINY = dict(H=32, W=32, num_steps=6, vocab_size=30, glove_dim=8,
            rnn_size=16, v_emb_dim=16, mlp_dim=12, batch_size=1,
            res4_blocks=2)


def test_decode_geometry(rng):
    cfg = get_config("CMPCv5_plus_model", **TINY)
    params = init_bbox_head(jax.random.PRNGKey(0), cfg)
    fused = jnp.asarray(rng.standard_normal((1, 4, 4, cfg.mlp_dim)),
                        jnp.float32)
    raw, dec = apply_bbox_head(params, fused, DEFAULT_ANCHORS, stride=8)
    assert raw.shape == (1, 4, 4, 3, 5)
    assert dec.shape == (1, 4, 4, 3, 5)
    # xy must lie inside each cell's pixel extent
    xy = np.asarray(dec[..., :2])
    for r in range(4):
        for c in range(4):
            assert np.all(xy[0, r, c, :, 0] >= c * 8)
            assert np.all(xy[0, r, c, :, 0] <= (c + 1) * 8)
            assert np.all(xy[0, r, c, :, 1] >= r * 8)
    assert np.all(np.asarray(dec[..., 4]) >= 0)
    assert np.all(np.asarray(dec[..., 4]) <= 1)


def test_giou_identity_and_disjoint():
    a = jnp.asarray([[10.0, 10.0, 4.0, 4.0]])
    np.testing.assert_allclose(np.asarray(_giou_xywh(a, a)), [1.0], atol=1e-6)
    b = jnp.asarray([[100.0, 100.0, 4.0, 4.0]])
    assert float(_giou_xywh(a, b)[0]) < 0  # disjoint -> negative GIoU


def test_loss_perfect_prediction_lower(rng):
    """Loss with predictions decoded onto the GT must be lower than a random
    head's loss."""
    label, true_box = preprocess_true_boxes(
        np.asarray([[8.0, 8.0, 24.0, 24.0]]), 32, DEFAULT_ANCHORS)
    label = jnp.asarray(label[None], jnp.float32)
    true_b = jnp.asarray(true_box[None], jnp.float32)

    raw_rand = jnp.asarray(rng.standard_normal((1, 4, 4, 3, 5)), jnp.float32)
    dec_rand = jnp.concatenate(
        [jax.nn.sigmoid(raw_rand[..., :2]) * 32,
         jnp.exp(raw_rand[..., 2:4]) * 8, jax.nn.sigmoid(raw_rand[..., 4:])],
        -1)
    # "perfect": decoded == label boxes, confident where assigned
    obj = label[..., 4:5]
    dec_good = jnp.concatenate([label[..., :4] + (1 - obj), obj], -1)
    raw_good = jnp.concatenate(
        [jnp.zeros((1, 4, 4, 3, 4)), (obj * 2 - 1) * 10.0], -1)
    l_good = float(bbox_loss(raw_good, dec_good, label, true_b,
                             input_size=32))
    l_rand = float(bbox_loss(raw_rand, dec_rand, label, true_b,
                             input_size=32))
    assert l_good < l_rand


def test_v5plus_train_step_decreases(rng):
    from cmpc_refseg_tpu.train.trainer import (create_train_state,
                                               make_train_step)
    cfg = get_config("CMPCv5_plus_model", **TINY, start_lr=1e-3)
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    step_fn = make_train_step(cfg)
    label, true_box = preprocess_true_boxes(
        np.asarray([[8.0, 8.0, 24.0, 24.0]]), cfg.H, DEFAULT_ANCHORS)
    words = np.zeros((1, cfg.num_steps), np.int32)
    words[0, -2:] = [3, 4]
    batch = {
        "im": jnp.asarray(rng.standard_normal((1, cfg.H, cfg.W, 3)),
                          jnp.float32),
        "words": jnp.asarray(words),
        "valid_idx": jnp.asarray([[cfg.num_steps - 2]], jnp.int32),
        "target": jnp.asarray(
            (rng.random((1, cfg.H, cfg.W, 1)) > 0.7).astype(np.float32)),
        "label_bbox": jnp.asarray(label[None], jnp.float32),
        "true_bbox": jnp.asarray(true_box[None], jnp.float32),
    }
    totals, bbox_losses = [], []
    for _ in range(10):
        state, metrics = step_fn(state, batch)
        totals.append(float(metrics["loss_total"]))
        bbox_losses.append(float(metrics["loss_bbox"]))
    assert np.all(np.isfinite(totals))
    assert totals[-1] < totals[0]           # past the Adam warmup spike
    assert bbox_losses[-1] < bbox_losses[0]


def test_label_assignment_reference_semantics():
    """IoU>0.3 anchors get the label; else the best anchor does
    (processing_tools.py:87-146)."""
    label, boxes = preprocess_true_boxes(
        np.asarray([[0.0, 0.0, 64.0, 64.0]]), 64, DEFAULT_ANCHORS, stride=8)
    assert label.shape == (8, 8, 3, 5)
    ys, xs, aa = np.nonzero(label[..., 4])
    assert len(ys) >= 1
    assert np.all(ys == 4) and np.all(xs == 4)  # center cell (32,32)/8
    np.testing.assert_allclose(boxes[0], [32, 32, 64, 64])
