"""Numeric primitives: TF1-parity resize, norms, losses, metrics, conv helpers."""

from cmpc_refseg_tpu.ops.resize import resize_bilinear  # noqa: F401
from cmpc_refseg_tpu.ops.normalization import l2_normalize, tf1_layer_norm  # noqa: F401
from cmpc_refseg_tpu.ops.spatial import spatial_coordinate_grid  # noqa: F401
