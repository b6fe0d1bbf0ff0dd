"""Pallas TPU kernels for the hot custom ops (XLA fallbacks in ops/)."""
from mgldvsr_tpu.ops.pallas.flow_warp import pallas_flow_warp
