"""Serving export (reference: export_model_serving.py — TF SavedModel with
signature `predict_images` {images, sentences, sequence_lenghts} -> {masks}).

TPU-native equivalents:
- `export_stablehlo`: `jax.export` serialized StableHLO artifact — the
  native JAX serving format (loadable back with jax.export.deserialize).
- `export_savedmodel`: jax2tf -> TF SavedModel with the SAME signature
  (incl. the reference's 'sequence_lenghts' typo) for drop-in TF-Serving
  compatibility; available when TF is importable.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from cmpc_refseg_tpu.config import ModelConfig
from cmpc_refseg_tpu.models.model import apply_model


def make_predict_fn(cfg: ModelConfig, params, state):
    """(images, sentences, sequence_lengths) -> masks [B,H,W] sigmoid, the
    export_model_serving.py:57-71 signature.

    Traces under xla_only_dispatch: exported artifacts must be portable, so
    the Pallas fast paths (TPU `tpu_custom_call`s pinned to the exporting
    host's kernel binaries) are forced off regardless of ambient CMPC_FUSED
    env vars — pinned by tests/test_serving.py."""
    from cmpc_refseg_tpu.ops.fused_dispatch import xla_only_dispatch

    def predict(images, sentences, sequence_lengths):
        batch = {"im": images, "words": sentences,
                 "seq_len": sequence_lengths}
        with xla_only_dispatch():
            outputs, _ = apply_model(params, state, cfg, batch, train=False)
        return outputs.sigm[..., 0]
    return predict


def export_stablehlo(cfg: ModelConfig, params, state, path: str,
                     batch_size: int = 1) -> str:
    """Serialize the jitted predict fn to a StableHLO artifact at `path`."""
    predict = make_predict_fn(cfg, params, state)
    args = (
        jax.ShapeDtypeStruct((batch_size, cfg.H, cfg.W, 3), jnp.float32),
        jax.ShapeDtypeStruct((batch_size, cfg.num_steps), jnp.int32),
        jax.ShapeDtypeStruct((batch_size,), jnp.int32),
    )
    exported = jax.export.export(jax.jit(predict))(*args)
    blob = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    return path


def load_stablehlo(path: str):
    with open(path, "rb") as f:
        return jax.export.deserialize(f.read())


def export_savedmodel(cfg: ModelConfig, params, state, export_dir: str,
                      batch_size: int = 1) -> str:
    """TF SavedModel with the reference's `predict_images` signature."""
    import tensorflow as tf
    from jax.experimental import jax2tf

    predict = make_predict_fn(cfg, params, state)
    tf_fn = tf.function(
        jax2tf.convert(predict, with_gradient=False),
        input_signature=[
            tf.TensorSpec([batch_size, cfg.H, cfg.W, 3], tf.float32,
                          name="images"),
            tf.TensorSpec([batch_size, cfg.num_steps], tf.int32,
                          name="sentences"),
            tf.TensorSpec([batch_size], tf.int32,
                          name="sequence_lenghts"),  # sic — reference typo
        ],
        autograph=False)
    module = tf.Module()
    module.predict_images = tf_fn
    tf.saved_model.save(
        module, export_dir,
        signatures={"predict_images": tf_fn.get_concrete_function()})
    return export_dir
