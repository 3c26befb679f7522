"""CMPC-RefSeg TPU: a TPU-native (JAX/XLA/Pallas/pjit) referring-segmentation framework.

Re-implements the full capability surface of zigonk/CMPC-Refseg (CVPR 2020
"Referring Image Segmentation via Cross-Modal Progressive Comprehension",
plus the fork's RefVOS / A2D video extensions) as an idiomatic TPU framework:

- functional models (pure pytrees, explicit PRNG),
- `lax.scan` recurrences instead of TF `dynamic_rnn`,
- sharded data-parallel training via `jax.sharding.Mesh` + `jit`,
- frozen-BN backbone folded into conv scale/offset constants,
- graph reasoning without materializing the [HW, HW] adjacency,
- C++ native post-processing (NMS, DenseCRF) with on-device JAX fallbacks.

Reference layer map: /root/repo/SURVEY.md section 1.
"""

__version__ = "0.1.0"

from cmpc_refseg_tpu.config import ModelConfig, get_config, VARIANTS  # noqa: F401
