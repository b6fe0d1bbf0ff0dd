"""Optical-flow networks and clip-level flow utilities."""
from mgldvsr_tpu.flow.raft import RAFT, RAFTConfig
from mgldvsr_tpu.flow.spynet import SpyNet
from mgldvsr_tpu.flow.maskflownet import MaskFlownetConfig, MaskFlownetS
from mgldvsr_tpu.flow.compute import compute_clip_flows, compute_occlusion_masks
