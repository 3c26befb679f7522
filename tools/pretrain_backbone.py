"""Standalone DeepLab-ResNet VOC semantic-segmentation train/eval/inference.

This is the provenance pipeline of `data/weights/deeplab_resnet_init.ckpt` —
the reference vendors it at external/tensorflow-deeplab-resnet/:

- train.py:118-215         poly-decay SGD(momentum 0.9) with per-group LR
                           multipliers (backbone x1, head weights x10, head
                           biases x20), weight decay 5e-4 on conv weights,
                           labels downsampled nearest to the output-stride-8
                           feature grid (utils.py:41-59), pixels with label
                           >= num_classes ignored (train.py:166-175).
- fine_tune.py:137-170     head-only ('fc1_voc12') Adam fine-tuning
                           (--scope head --opt adam).
- image_reader.py:6-70     input pipeline: random scale U(0.5,1.5) (bilinear
                           image / nearest label), random horizontal mirror,
                           zero-pad to crop size (label padded with
                           ignore_label 255) + random crop.
- evaluate.py / evaluate_msc.py:61-115
                           mIoU over the val list; the msc variant runs
                           scales {1.0, 0.75, 0.5}, resizes logits to the
                           scale-1.0 feature grid, fuses with elementwise
                           max (evaluate_msc.py:98-104).
- inference.py:54-         single image -> argmax -> VOC-colorized PNG.
- deeplab_resnet/model.py:403-422
                           the VOC head: four atrous 3x3 convs, rates
                           6/12/18/24, summed into 'fc1_voc12'.

TPU-native notes: the hot path is the jitted (train_step / forward) below —
static crop shapes for training, bucketed padding (multiples of 64, masked
by ignore_label) for native-resolution eval so XLA compiles a handful of
shapes instead of one per image.

Usage:
  python tools/pretrain_backbone.py --mode train --data-dir VOC --data-list train.txt
  python tools/pretrain_backbone.py --mode eval  --data-dir VOC --data-list val.txt --msc
  python tools/pretrain_backbone.py --mode infer --image img.jpg --out pred.png
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from cmpc_refseg_tpu.models.backbone import (apply_backbone, init_backbone)
from cmpc_refseg_tpu.ops.layers import split_stream, xavier_conv_init
from cmpc_refseg_tpu.ops.resize import resize_bilinear

# train.py:20 — caffe BGR mean (same values as the CMPC drivers').
IMG_MEAN = np.array((104.00698793, 116.66876762, 122.67891434), np.float32)
IGNORE_LABEL = 255
ATROUS_RATES = (6, 12, 18, 24)   # deeplab_resnet/model.py:403-422


def make_voc_colormap(n: int = 256) -> np.ndarray:
    """Standard PASCAL VOC label palette (bit-interleave construction —
    reproduces deeplab_resnet/utils.py's label_colours table for 0..20)."""
    cmap = np.zeros((n, 3), np.uint8)
    for i in range(n):
        r = g = b = 0
        c = i
        for j in range(8):
            r |= ((c >> 0) & 1) << (7 - j)
            g |= ((c >> 1) & 1) << (7 - j)
            b |= ((c >> 2) & 1) << (7 - j)
            c >>= 3
        cmap[i] = (r, g, b)
    return cmap


def init_voc_head(key, num_classes: int, cin: int = 2048) -> dict:
    """Four biased atrous 3x3 convs (fc1_voc12_c0..c3), summed at apply."""
    keys = split_stream(key, len(ATROUS_RATES))
    return {f"c{i}": {"w": xavier_conv_init(k, (3, 3, cin, num_classes)),
                      "b": np.zeros((num_classes,), np.float32)}
            for i, k in enumerate(keys)}


def apply_voc_head(head: dict, c5: jnp.ndarray,
                   compute_dtype=None) -> jnp.ndarray:
    """fc1_voc12 logits [B,h,w,num_classes] from the res5c_relu tap."""
    x = c5 if compute_dtype is None else c5.astype(compute_dtype)
    out = None
    for i, rate in enumerate(ATROUS_RATES):
        u = head[f"c{i}"]
        w = u["w"] if compute_dtype is None else u["w"].astype(compute_dtype)
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding="SAME",
            rhs_dilation=(rate, rate),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        y = y + u["b"]
        out = y if out is None else out + y
    return out


def voc_logits(params: dict, im: jnp.ndarray, *, compute_dtype=None,
               res4_blocks: int = 23) -> jnp.ndarray:
    c5 = apply_backbone(params["backbone"], im, compute_dtype=compute_dtype,
                        taps=("c5",), res4_blocks=res4_blocks)["c5"]
    return apply_voc_head(params["head"], c5, compute_dtype)


def voc_ce_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                num_classes: int) -> jnp.ndarray:
    """Mean softmax CE over pixels with label < num_classes, on the
    output-stride-8 grid (train.py:166-175; labels already downsampled)."""
    valid = labels < num_classes
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    ce = jnp.where(valid, ce, 0.0)
    return jnp.sum(ce) / jnp.maximum(jnp.sum(valid), 1)


def downsample_labels(labels: np.ndarray, factor: int = 8,
                      out_size=None) -> np.ndarray:
    """Nearest-neighbor downsample to the feature grid (or an explicit
    (oh, ow)), matching tf.image.resize_nearest_neighbor's floor mapping
    (utils.py:55). Works on numpy or jnp arrays (static shapes)."""
    h, w = labels.shape[-2:] if labels.ndim == 2 else labels.shape[1:3]
    if out_size is None:
        oh, ow = (h + factor - 1) // factor, (w + factor - 1) // factor
    else:
        oh, ow = out_size
    ridx = (np.arange(oh) * h / oh).astype(np.int64)
    cidx = (np.arange(ow) * w / ow).astype(np.int64)
    return labels[..., ridx[:, None], cidx[None, :]]


# ---------------------------------------------------------------- input ---

def read_data_list(data_dir: str, data_list: str):
    """Lines of '<image> <mask>' relative to data_dir
    (image_reader.py:72-93)."""
    images, masks = [], []
    with open(data_list) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            im, mk = line.split()
            images.append(os.path.join(data_dir, im.lstrip("/")))
            masks.append(os.path.join(data_dir, mk.lstrip("/")))
    return images, masks


def _load_pair(im_path: str, mask_path: str):
    import cv2
    im = cv2.imread(im_path, cv2.IMREAD_COLOR).astype(np.float32)  # BGR
    label = cv2.imread(mask_path, cv2.IMREAD_GRAYSCALE)
    return im - IMG_MEAN, label


def augment_pair(rng: np.random.Generator, im: np.ndarray, label: np.ndarray,
                 crop_h: int, crop_w: int, *, scale=True, mirror=True):
    """Random scale U(0.5,1.5) + mirror + pad/random-crop
    (image_reader.py:6-70; label padded with IGNORE_LABEL so padding never
    contributes to the loss)."""
    import cv2
    if scale:
        s = rng.uniform(0.5, 1.5)
        nh, nw = max(1, int(im.shape[0] * s)), max(1, int(im.shape[1] * s))
        im = cv2.resize(im, (nw, nh), interpolation=cv2.INTER_LINEAR)
        label = cv2.resize(label, (nw, nh), interpolation=cv2.INTER_NEAREST)
    if mirror and rng.random() < 0.5:
        im, label = im[:, ::-1], label[:, ::-1]
    ph, pw = max(crop_h, im.shape[0]), max(crop_w, im.shape[1])
    if (ph, pw) != im.shape[:2]:
        pim = np.zeros((ph, pw, 3), np.float32)
        plb = np.full((ph, pw), IGNORE_LABEL, label.dtype)
        pim[: im.shape[0], : im.shape[1]] = im
        plb[: label.shape[0], : label.shape[1]] = label
        im, label = pim, plb
    y = rng.integers(0, ph - crop_h + 1)
    x = rng.integers(0, pw - crop_w + 1)
    return (np.ascontiguousarray(im[y: y + crop_h, x: x + crop_w]),
            np.ascontiguousarray(label[y: y + crop_h, x: x + crop_w]))


def pad_to_bucket(im: np.ndarray, label=None, multiple: int = 64):
    """Pad to the next multiple-of-`multiple` bucket for shape-stable eval
    jits; padded label pixels get IGNORE_LABEL."""
    h, w = im.shape[:2]
    bh = ((h + multiple - 1) // multiple) * multiple
    bw = ((w + multiple - 1) // multiple) * multiple
    pim = np.zeros((bh, bw, 3), np.float32)
    pim[:h, :w] = im
    if label is None:
        return pim, (h, w)
    plb = np.full((bh, bw), IGNORE_LABEL, np.int32)
    plb[:h, :w] = label
    return pim, plb, (h, w)


# ---------------------------------------------------------------- train ---

def head_bias_filter(path):
    return path[0] == "head" and path[-1] == "b"


def head_weight_filter(path):
    return path[0] == "head" and path[-1] == "w"


def make_train_step(cfg):
    """Poly-decay momentum SGD with the reference's three LR groups
    (train.py:196-213: conv x1, head weights x10, head biases x20), or
    head-only Adam (fine_tune.py:142,169)."""
    import optax

    def lr(step):
        return cfg["lr"] * (1.0 - step / cfg["num_steps"]) ** cfg["power"]

    def loss_fn(train_p, frozen_p, im, labels):
        params = merge_trees(train_p, frozen_p)

        def logits_at(x):
            return voc_logits(params, x, compute_dtype=cfg["compute_dtype"],
                              res4_blocks=cfg["res4_blocks"])

        logits = logits_at(im)
        if cfg["train_msc"]:
            # train_msc.py:145-216 — shared-weight towers at scales
            # {1, .75, .5}; loss = CE(max-fused) + per-scale CEs, each
            # against labels downsampled to that tower's grid.
            h, w = im.shape[1:3]
            fh, fw = logits.shape[1:3]
            per_scale = [logits]
            fused = logits
            for s in (0.75, 0.5):
                ls = logits_at(resize_bilinear(im, int(h * s), int(w * s)))
                per_scale.append(ls)
                fused = jnp.maximum(fused, resize_bilinear(ls, fh, fw))
            # `labels` arrive at full crop resolution in msc mode
            ce = voc_ce_loss(fused,
                             downsample_labels(labels, out_size=(fh, fw)),
                             cfg["num_classes"])
            for ls in per_scale:
                lbl = downsample_labels(labels, out_size=ls.shape[1:3])
                ce = ce + voc_ce_loss(ls, lbl, cfg["num_classes"])
        else:
            ce = voc_ce_loss(logits, labels, cfg["num_classes"])
        if cfg["opt"] == "adam":
            # fine_tune.py:148-150 — the head-only Adam loss is plain CE
            # with no l2 term.
            return ce, ce
        # tf.nn.l2_loss(v) = sum(v^2)/2 (train.py/train_msc.py l2_losses):
        # the 0.5 keeps --weight-decay on the reference's scale.
        wd = sum(jnp.sum(jnp.square(l))
                 for p, l in jax.tree_util.tree_leaves_with_path(train_p)
                 if p[-1].key == "w")
        return ce + cfg["weight_decay"] * 0.5 * wd, ce

    def lr_mult(path):
        if head_bias_filter([p.key for p in path]):
            return 20.0
        if head_weight_filter([p.key for p in path]):
            return 10.0
        return 1.0

    if cfg["opt"] == "adam":
        opt = optax.adam(cfg["lr"])
    else:
        # Per-group LR = scaling the post-momentum update: TF's per-group
        # MomentumOptimizers share accum semantics, update = (lr*mult)*accum.
        group_scale = optax.multi_transform(
            {m: optax.scale(m) for m in (1.0, 10.0, 20.0)},
            lambda tree: jax.tree_util.tree_map_with_path(
                lambda p, _: lr_mult(p), tree))
        opt = optax.chain(
            optax.sgd(learning_rate=lr, momentum=cfg["momentum"]),
            group_scale)

    @jax.jit
    def step(train_p, frozen_p, opt_state, im, labels):
        (loss, ce), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            train_p, frozen_p, im, labels)
        updates, opt_state = opt.update(grads, opt_state, train_p)
        train_p = optax.apply_updates(train_p, updates)
        return train_p, opt_state, loss, ce

    return opt, step


def split_trainable(params, scope: str):
    """scope='all': backbone conv kernels + head (BN constants stay frozen,
    matching TF where folded stats are not variables in the trainable set);
    scope='head': fc1_voc12 only (fine_tune.py:142)."""
    def is_trainable(path):
        if path[0] == "head":
            return True
        return scope == "all" and path[-1] == "w"

    train_p, frozen_p = {}, {}
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    for kp, leaf in flat:
        keys = [k.key for k in kp]
        dst = train_p if is_trainable(keys) else frozen_p
        node = dst
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = leaf
    return train_p, frozen_p


def run_train(args):
    cfg = dict(lr=args.learning_rate, num_steps=args.num_steps,
               power=args.power, momentum=args.momentum,
               weight_decay=args.weight_decay, num_classes=args.num_classes,
               res4_blocks=args.res4_blocks, opt=args.opt,
               train_msc=args.train_msc,
               compute_dtype=jnp.bfloat16 if args.bf16 else None)
    params = init_params(args)
    train_p, frozen_p = split_trainable(params, args.scope)
    opt, step = make_train_step(cfg)
    opt_state = opt.init(train_p)
    start_step = args.start_step
    if args.restore_opt:
        opt_state, start_step = load_opt_state_npz(args.restore_opt,
                                                   opt_state)
    frozen_p = jax.device_put(frozen_p)

    images, masks = read_data_list(args.data_dir, args.data_list)
    rng = np.random.default_rng(args.seed)
    ch, cw = args.crop_size, args.crop_size
    from cmpc_refseg_tpu.train.trainer import PreemptionGuard
    order = rng.permutation(len(images))
    pos = 0
    guard = PreemptionGuard().__enter__()
    for it in range(start_step, args.num_steps):
        if guard.fired:
            if args.snapshot_dir:
                save_params(args.snapshot_dir, it,
                            merge_trees(train_p, frozen_p), opt_state)
            print(f"preempted at iter {it}: snapshot saved, exiting cleanly",
                  flush=True)
            guard.__exit__()
            return float(loss) if it else float("nan")
        ims, lbs = [], []
        for _ in range(args.batch_size):
            if pos >= len(order):
                order, pos = rng.permutation(len(images)), 0
            i = order[pos]
            pos += 1
            im, lb = _load_pair(images[i], masks[i])
            im, lb = augment_pair(rng, im, lb, ch, cw,
                                  scale=not args.no_scale,
                                  mirror=not args.no_mirror)
            ims.append(im)
            lb = lb.astype(np.int32)
            # msc loss downsamples per tower inside the jit; single-scale
            # pre-downsamples to the stride-8 grid on the host
            lbs.append(lb if args.train_msc else downsample_labels(lb))
        train_p, opt_state, loss, ce = step(
            train_p, frozen_p, opt_state,
            np.stack(ims), np.stack(lbs))
        if it % args.print_every == 0:
            print(f"step {it} loss {float(loss):.4f} ce {float(ce):.4f}",
                  flush=True)
        if args.snapshot_dir and (it + 1) % args.save_every == 0:
            save_params(args.snapshot_dir, it + 1,
                        merge_trees(train_p, frozen_p), opt_state)
    guard.__exit__()
    if args.snapshot_dir:
        save_params(args.snapshot_dir, args.num_steps,
                    merge_trees(train_p, frozen_p), opt_state)
    return float(loss)


def merge_trees(a, b):
    """Deep-merge two disjoint pytrees of dicts."""
    out = dict(b)
    for k, v in a.items():
        out[k] = merge_trees(v, out[k]) if (isinstance(v, dict) and
                                            k in out) else v
    return out


def save_params(snapshot_dir, step, params, opt_state=None):
    """Save params (and, when given, the optimizer state + step) so resume
    continues momentum and the poly-LR decay rather than restarting them
    (TF's Saver checkpoints momentum slots via global_variables)."""
    os.makedirs(snapshot_dir, exist_ok=True)
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    out = os.path.join(snapshot_dir, f"model_step{step}.npz")
    np.savez(out, **{jax.tree_util.keystr(k): np.asarray(v)
                     for k, v in flat})
    if opt_state is not None:
        oflat = jax.tree_util.tree_leaves(opt_state)
        oout = os.path.join(snapshot_dir, f"opt_step{step}.npz")
        np.savez(oout, step=np.asarray(step),
                 **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(oflat)})
    print(f"saved {out}", flush=True)


def load_opt_state_npz(path, opt_state):
    """Restore (opt_state, step) saved by save_params; `opt_state` supplies
    the tree structure (from a fresh opt.init on the same trainable set)."""
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(opt_state)
    restored = [np.asarray(data[f"leaf_{i}"], dtype=np.asarray(l).dtype)
                for i, l in enumerate(leaves)]
    return jax.tree_util.tree_unflatten(treedef, restored), int(data["step"])


def load_params_npz(path, params):
    """Restore a pytree saved by save_params/convert_tf_checkpoint."""
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    leaves = [np.asarray(data[jax.tree_util.keystr(k)]) for k, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def init_params(args):
    k1, k2 = jax.random.split(jax.random.PRNGKey(args.seed))
    params = {"backbone": init_backbone(k1, args.res4_blocks),
              "head": init_voc_head(k2, args.num_classes)}
    if args.restore:
        params = load_params_npz(args.restore, params)
    return params


# ----------------------------------------------------------------- eval ---

def eval_forward(params, im, num_classes, res4_blocks, msc=False):
    """Logits at input resolution; msc fuses scales {1,.75,.5} with max
    after resizing to the scale-1.0 feature grid (evaluate_msc.py:98-104)."""
    def feature_logits(x):
        return voc_logits(params, x, res4_blocks=res4_blocks)

    logits = feature_logits(im)
    if msc:
        h, w = im.shape[1:3]
        fh, fw = logits.shape[1:3]
        for s in (0.75, 0.5):
            xs = resize_bilinear(im, int(h * s), int(w * s))
            ls = resize_bilinear(feature_logits(xs), fh, fw)
            logits = jnp.maximum(logits, ls)
    return resize_bilinear(logits, im.shape[1], im.shape[2])


def run_eval(args):
    params = jax.device_put(init_params(args))
    images, masks = read_data_list(args.data_dir, args.data_list)
    n = args.num_classes
    conf = np.zeros((n, n), np.int64)

    fwd = {}

    def forward(im):
        key = im.shape
        if key not in fwd:
            fwd[key] = jax.jit(lambda p, x: eval_forward(
                p, x, n, args.res4_blocks, msc=args.msc))
        return fwd[key](params, im)

    for i, (imp, mkp) in enumerate(zip(images, masks)):
        im, lb = _load_pair(imp, mkp)
        pim, plb, (h, w) = pad_to_bucket(im, lb)
        logits = forward(pim[None])
        pred = np.asarray(jnp.argmax(logits[0], -1))[:h, :w]
        gt = plb[:h, :w]
        valid = gt < n
        conf += np.bincount(gt[valid] * n + pred[valid],
                            minlength=n * n).reshape(n, n)
        if (i + 1) % 50 == 0:
            print(f"{i + 1}/{len(images)}", flush=True)
    inter = np.diag(conf).astype(np.float64)
    union = conf.sum(0) + conf.sum(1) - np.diag(conf)
    iou = inter / np.maximum(union, 1)
    miou = float(iou[union > 0].mean())
    print(json.dumps({"mean_iou": round(miou, 5),
                      "per_class_iou": [round(float(x), 5) for x in iou]}))
    return miou


def run_infer(args):
    import cv2
    params = jax.device_put(init_params(args))
    im = cv2.imread(args.image, cv2.IMREAD_COLOR).astype(np.float32) - IMG_MEAN
    pim, (h, w) = pad_to_bucket(im)
    logits = jax.jit(lambda p, x: eval_forward(
        p, x, args.num_classes, args.res4_blocks, msc=args.msc))(
            params, pim[None])
    pred = np.asarray(jnp.argmax(logits[0], -1))[:h, :w]
    rgb = make_voc_colormap()[pred]
    cv2.imwrite(args.out, rgb[:, :, ::-1])   # BGR on disk
    print(f"wrote {args.out}")
    return pred


def build_argparser():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--mode", choices=("train", "eval", "infer"),
                    required=True)
    ap.add_argument("--data-dir", default=".")
    ap.add_argument("--data-list", default="train.txt")
    ap.add_argument("--image"), ap.add_argument("--out", default="pred.png")
    ap.add_argument("--restore", help="params .npz (save_params/converter)")
    ap.add_argument("--restore-opt",
                    help="opt_step*.npz saved alongside a snapshot; restores "
                         "momentum + LR-schedule count and the step")
    ap.add_argument("--start-step", type=int, default=0,
                    help="continue the data loop from this iteration "
                         "(overridden by --restore-opt's recorded step)")
    ap.add_argument("--snapshot-dir", default="")
    ap.add_argument("--num-classes", type=int, default=21)
    ap.add_argument("--batch-size", type=int, default=10)
    ap.add_argument("--crop-size", type=int, default=321)
    ap.add_argument("--learning-rate", type=float, default=2.5e-4)
    ap.add_argument("--momentum", type=float, default=0.9)
    ap.add_argument("--power", type=float, default=0.9)
    ap.add_argument("--weight-decay", type=float, default=5e-4)
    ap.add_argument("--num-steps", type=int, default=20001)
    ap.add_argument("--save-every", type=int, default=1000)
    ap.add_argument("--print-every", type=int, default=10)
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--scope", choices=("all", "head"), default="all",
                    help="'head' = fine_tune.py head-only training")
    ap.add_argument("--opt", choices=("sgd", "adam"), default="sgd")
    ap.add_argument("--msc", action="store_true",
                    help="multi-scale max-fused eval (evaluate_msc.py)")
    ap.add_argument("--train-msc", action="store_true",
                    help="multi-scale training loss (train_msc.py:145-216)")
    ap.add_argument("--no-scale", action="store_true")
    ap.add_argument("--no-mirror", action="store_true")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--res4-blocks", type=int, default=23)
    return ap


def main(argv=None):
    args = build_argparser().parse_args(argv)
    if args.mode == "train":
        return run_train(args)
    if args.mode == "eval":
        return run_eval(args)
    return run_infer(args)


if __name__ == "__main__":
    main()
