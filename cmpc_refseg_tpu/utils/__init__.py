"""Shared utilities: running stats, IO helpers, metric logging."""

from cmpc_refseg_tpu.utils.moving_average import MovingAverage  # noqa: F401
