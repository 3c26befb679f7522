"""Minimal stdlib HTTP inference server.

The reference delegates serving to TF-Serving via SavedModel export
(export_model_serving.py); the SavedModel path is kept (serving/export.py),
and this module adds a self-contained server so the framework can serve
predictions without any TF infrastructure:

  POST /predict   {"image": <base64 PNG/JPEG>, "expression": "..."}
               -> {"mask": <base64 PNG, native resolution>,
                   "prob_max": float, "latency_ms": float}
  GET  /healthz  -> {"status": "ok", ...}

Design: the jitted forward is compiled once at startup (fixed batch 1);
requests are served sequentially from the HTTP thread (the chip is a
single-stream device; concurrency belongs in a fleet balancer, not here).
"""

from __future__ import annotations

import base64
import io
import json
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class PredictService:
    """Holds the compiled forward + preprocessing state."""

    def __init__(self, cfg, params, model_state, vocab_dict,
                 quantize: bool = False, calibration_images=None):
        import jax

        from cmpc_refseg_tpu.models.model import apply_model, prepare_params

        self.cfg = cfg
        self.vocab = vocab_dict
        params = prepare_params(params, cfg, quantize_backbone=quantize)
        if quantize and calibration_images is not None:
            # bake static activation scales (skips the dynamic abs-max
            # pass per conv); images are mean-subtracted BGR [B,H,W,3]
            from cmpc_refseg_tpu.models.backbone import calibrate_backbone
            params = dict(params)
            params["backbone"] = calibrate_backbone(
                params["backbone"], calibration_images,
                res4_blocks=cfg.res4_blocks)
        self.params, self.state = jax.device_put((params, model_state))

        def fwd(p, s, batch):
            out, _ = apply_model(p, s, cfg, batch, train=False)
            return out.sigm
        # AOT pre-bound executable: request shapes are fixed (batch 1), so
        # bind the compiled program once — skips the per-call jit cache
        # lookup/pytree work AND makes any shape drift a loud error instead
        # of a silent recompile latency cliff.  Measured calling-convention
        # A/B on this platform: AOT == chained-throughput protocol, plain
        # jit +<=0.1 ms/call (PERF.md r5 "Serving dispatch overhead",
        # DISPATCH_r5.json).
        import jax.numpy as jnp
        self._jfwd = jax.jit(fwd)
        example = {
            "im": jax.ShapeDtypeStruct((1, cfg.H, cfg.W, 3), jnp.float32),
            "words": jax.ShapeDtypeStruct((1, cfg.num_steps), jnp.int32),
            "seq_len": jax.ShapeDtypeStruct((1,), jnp.int32),
        }
        try:
            self._fwd = self._jfwd.lower(
                self.params, self.state, example).compile()
        except Exception:          # backend without AOT support
            self._fwd = self._jfwd
        self.n_requests = 0

    def warmup(self):
        dummy = {
            "im": np.zeros((1, self.cfg.H, self.cfg.W, 3), np.float32),
            "words": np.zeros((1, self.cfg.num_steps), np.int32),
            "seq_len": np.asarray([1], np.int32),
        }
        np.asarray(self._fwd(self.params, self.state, dummy))

    def predict(self, image_rgb: np.ndarray, expression: str,
                threshold: float = 0.5) -> np.ndarray:
        from cmpc_refseg_tpu.data.image import (IMAGE_MEAN_BGR,
                                                resize_and_crop,
                                                resize_and_pad)
        from cmpc_refseg_tpu.data.text import preprocess_sentence_lstm
        tokens, seq_len = preprocess_sentence_lstm(
            expression, self.vocab, self.cfg.num_steps)
        im = resize_and_pad(image_rgb.astype(np.float32),
                            self.cfg.H, self.cfg.W)
        batch = {
            "im": (im[..., ::-1] - IMAGE_MEAN_BGR)[None].astype(np.float32),
            "words": np.asarray(tokens, np.int32)[None],
            "seq_len": np.asarray([seq_len], np.int32),
        }
        sigm = np.asarray(self._fwd(self.params, self.state, batch)
                          )[0, :, :, 0]
        prob = resize_and_crop(sigm, *image_rgb.shape[:2])
        self.n_requests += 1
        return prob, prob > threshold


def make_handler(service: PredictService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):   # quiet
            pass

        def _reply(self, code: int, obj: dict):
            blob = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(blob)))
            self.end_headers()
            self.wfile.write(blob)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"status": "ok",
                                  "requests": service.n_requests})
            else:
                self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/predict":
                self._reply(404, {"error": "unknown path"})
                return
            try:
                from PIL import Image
                n = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(n))
                img = np.asarray(Image.open(io.BytesIO(
                    base64.b64decode(req["image"]))).convert("RGB"))
                t0 = time.perf_counter()
                prob, mask = service.predict(
                    img, req["expression"],
                    float(req.get("threshold", 0.5)))
                latency = (time.perf_counter() - t0) * 1000
                buf = io.BytesIO()
                Image.fromarray(mask.astype(np.uint8) * 255).save(
                    buf, format="PNG")
                self._reply(200, {
                    "mask": base64.b64encode(buf.getvalue()).decode(),
                    "prob_max": float(prob.max()),
                    "latency_ms": round(latency, 2),
                })
            except Exception as e:
                self._reply(400, {"error": str(e)[:200]})
    return Handler


def serve(service: PredictService, host: str = "127.0.0.1",
          port: int = 8500) -> ThreadingHTTPServer:
    """Start (and return) the HTTP server; caller decides blocking policy."""
    service.warmup()
    return ThreadingHTTPServer((host, port), make_handler(service))


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser("cmpc_refseg_tpu inference server")
    ap.add_argument("-n", dest="model_name", default="CMPC_model")
    ap.add_argument("-ckpt_dir", dest="ckpt_dir", default="./checkpoints")
    ap.add_argument("-vocab", dest="vocab", required=True)
    ap.add_argument("-port", type=int, default=8500)
    ap.add_argument("-emb", dest="emb_name", default="refvos")
    ap.add_argument("-emb_dir", dest="emb_dir", default="data")
    ap.add_argument("-quantize", action="store_true",
                    help="int8 backbone serving path "
                         "(models/backbone.py::quantize_backbone)")
    args = ap.parse_args(argv)

    import jax

    from cmpc_refseg_tpu.cli import load_glove
    from cmpc_refseg_tpu.config import get_config
    from cmpc_refseg_tpu.data.text import load_vocab_dict_from_file
    from cmpc_refseg_tpu.train.checkpoint import restore_checkpoint
    from cmpc_refseg_tpu.train.trainer import state_params
    from cmpc_refseg_tpu.train.trainer import create_train_state
    from cmpc_refseg_tpu.utils.compile_cache import enable

    enable()
    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    cfg = get_config(args.model_name,
                     compute_dtype="bfloat16" if on_tpu else "float32")
    glove = load_glove(args.emb_dir, args.emb_name)
    state = create_train_state(jax.random.PRNGKey(0), cfg, glove)
    state = restore_checkpoint(args.ckpt_dir, state)
    params = state_params(state)
    service = PredictService(cfg, params, state.model_state,
                             load_vocab_dict_from_file(args.vocab),
                             quantize=args.quantize)
    httpd = serve(service, port=args.port)
    print(f"serving on :{args.port} (POST /predict, GET /healthz)")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
