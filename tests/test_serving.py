"""Serving export roundtrips: StableHLO artifact and (if TF importable)
SavedModel with the reference `predict_images` signature."""

import os

import jax
import numpy as np
import pytest

from cmpc_refseg_tpu.config import get_config
from cmpc_refseg_tpu.models.model import init_model
from cmpc_refseg_tpu.serving.export import (export_stablehlo, load_stablehlo,
                                            make_predict_fn)

TINY = dict(H=32, W=32, num_steps=6, vocab_size=30, glove_dim=8,
            rnn_size=16, v_emb_dim=16, mlp_dim=12, batch_size=1,
            res4_blocks=2)


@pytest.fixture(scope="module")
def model():
    cfg = get_config("CMPC_model", **TINY)
    params, state = init_model(jax.random.PRNGKey(0), cfg)
    return cfg, params, state


def _inputs(cfg, rng):
    words = np.zeros((1, cfg.num_steps), np.int32)
    words[0, :3] = [3, 4, 5]
    return (rng.standard_normal((1, cfg.H, cfg.W, 3)).astype(np.float32),
            words, np.asarray([3], np.int32))


def test_stablehlo_roundtrip(model, tmp_path, rng):
    cfg, params, state = model
    path = os.path.join(str(tmp_path), "model.stablehlo")
    export_stablehlo(cfg, params, state, path)
    assert os.path.getsize(path) > 1000

    exported = load_stablehlo(path)
    ims, words, sl = _inputs(cfg, rng)
    got = np.asarray(exported.call(ims, words, sl))
    want = np.asarray(make_predict_fn(cfg, params, state)(ims, words, sl))
    assert got.shape == (1, cfg.H, cfg.W)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_savedmodel_signature(model, tmp_path, rng):
    tf = pytest.importorskip("tensorflow")
    cfg, params, state = model
    from cmpc_refseg_tpu.serving.export import export_savedmodel
    d = export_savedmodel(cfg, params, state, os.path.join(str(tmp_path),
                                                           "sm"))
    loaded = tf.saved_model.load(d)
    sig = loaded.signatures["predict_images"]
    # reference signature parity incl. the 'sequence_lenghts' typo
    assert set(sig.structured_input_signature[1]) == {
        "images", "sentences", "sequence_lenghts"}
    ims, words, sl = _inputs(cfg, rng)
    out = sig(images=tf.constant(ims), sentences=tf.constant(words),
              sequence_lenghts=tf.constant(sl))
    mask = list(out.values())[0].numpy()
    want = np.asarray(make_predict_fn(cfg, params, state)(ims, words, sl))
    np.testing.assert_allclose(mask, want, rtol=1e-4, atol=1e-4)


def test_http_server_predict_roundtrip(model, rng):
    """Drive the stdlib inference server over a real socket."""
    import base64
    import io
    import json
    import threading
    import urllib.request

    from PIL import Image

    from cmpc_refseg_tpu.serving.server import PredictService, serve

    cfg, params, state = model
    vocab = {"<pad>": 0, "<go>": 1, "<eos>": 2, "the": 3, "dog": 4,
             "<unk>": 5}
    svc = PredictService(cfg, params, state, vocab)
    httpd = serve(svc, port=0)          # ephemeral port
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz") as r:
            assert json.load(r)["status"] == "ok"

        img = rng.integers(0, 255, (40, 56, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        payload = json.dumps({
            "image": base64.b64encode(buf.getvalue()).decode(),
            "expression": "the dog",
        }).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=payload,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            out = json.load(r)
        mask = np.asarray(Image.open(io.BytesIO(
            base64.b64decode(out["mask"]))))
        assert mask.shape == (40, 56)   # native resolution
        assert 0.0 <= out["prob_max"] <= 1.0

        # probe: malformed body -> clean 400
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=b"not json",
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(bad)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        httpd.shutdown()


def test_quantized_calibrated_service(model, rng):
    """-quantize path with calibration images: backbone units get int8
    weights + static activation scales; predictions agree with the f32
    service on most pixels."""
    from cmpc_refseg_tpu.serving.server import PredictService

    cfg, params, state = model
    vocab = {"<pad>": 0, "<go>": 1, "<eos>": 2, "the": 3, "dog": 4,
             "<unk>": 5}
    cal = [rng.standard_normal((1, cfg.H, cfg.W, 3)).astype(np.float32) * 40]
    svc_f32 = PredictService(cfg, params, state, vocab)
    svc_q = PredictService(cfg, params, state, vocab, quantize=True,
                           calibration_images=cal)
    bb = svc_q.params["backbone"]["res2a"]["branch2b"]
    assert bb["w_q"].dtype.name == "int8"
    assert "x_scale" in bb

    img = rng.integers(0, 255, (40, 56, 3), dtype=np.uint8)
    prob_f, mask_f = svc_f32.predict(img, "the dog")
    prob_q, mask_q = svc_q.predict(img, "the dog")
    assert mask_q.shape == mask_f.shape
    assert np.mean(mask_q == mask_f) > 0.9


def test_export_stays_portable(model, tmp_path, monkeypatch):
    """Round-4 (VERDICT #10): export must trace the plain-XLA path even
    when the ambient dispatch env demands fused kernels — a Pallas
    tpu_custom_call baked into the artifact has undefined portability off
    the exporting host.  Pin both ways: every fused_mode decision during
    the export trace is the XLA branch, and the serialized StableHLO text
    carries no custom_call."""
    from cmpc_refseg_tpu.ops import fused_dispatch as fd

    cfg, params, state = model
    # interpret would otherwise engage the fused path on ANY platform
    monkeypatch.setenv("CMPC_FUSED", "interpret")
    monkeypatch.setenv("CMPC_FUSED_GRAPH", "interpret")
    decisions = []
    orig = fd.fused_mode

    def spy(*a, **kw):
        out = orig(*a, **kw)
        decisions.append(out)
        return out

    monkeypatch.setattr(fd, "fused_mode", spy)
    path = os.path.join(str(tmp_path), "pinned.stablehlo")
    export_stablehlo(cfg, params, state, path)
    assert decisions, "export trace never consulted the dispatch policy"
    assert all(d is None for d in decisions), decisions

    exported = load_stablehlo(path)
    text = exported.mlir_module()
    # match the op token, not the bare substring (MLIR debug locs
    # embed caller function names)
    assert "stablehlo.custom_call" not in text
    assert "tpu_custom_call" not in text
