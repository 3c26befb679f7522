"""High-level convenience API (replaces get_model.py's eval() dispatch).

>>> from cmpc_refseg_tpu.api import build_model
>>> model = build_model("CMPC_model", H=320, W=320)
>>> out = model.forward(batch)
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax

from cmpc_refseg_tpu.config import ModelConfig, get_config
from cmpc_refseg_tpu.models.model import apply_model, compute_loss, init_model


@dataclasses.dataclass
class Model:
    cfg: ModelConfig
    params: Any
    state: Any

    def forward(self, batch: dict, train: bool = False):
        outputs, new_state = self._jitted(train)(self.params, self.state,
                                                 batch)
        if train:
            self.state = new_state
        return outputs

    def loss(self, outputs, target):
        return compute_loss(outputs, target, self.cfg, self.params)

    def _jitted(self, train: bool):
        key = ("_fwd_train" if train else "_fwd_eval")
        fn = getattr(self, key, None)
        if fn is None:
            cfg = self.cfg
            fn = jax.jit(lambda p, s, b: apply_model(p, s, cfg, b,
                                                     train=train))
            object.__setattr__(self, key, fn)
        return fn


def build_model(name: str, *, seed: int = 0, glove=None,
                **overrides) -> Model:
    """Construct a model variant by reference name (see config.VARIANTS)."""
    cfg = get_config(name, **overrides)
    from cmpc_refseg_tpu.models.model import prepare_params
    params, state = init_model(jax.random.PRNGKey(seed), cfg, glove)
    params = prepare_params(params, cfg)
    # Commit to device once; numpy leaves would re-transfer on every call.
    params, state = jax.device_put((params, state))
    return Model(cfg=cfg, params=params, state=state)


def get_segmentation_model(name: str, **kwargs) -> Model:
    """Name-compatible entry point (reference: get_model.py:15-17, which
    `eval()`s the model name — replaced by an explicit registry)."""
    return build_model(name, **kwargs)
