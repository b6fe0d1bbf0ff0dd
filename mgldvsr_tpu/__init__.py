"""mgldvsr_tpu: TPU-native motion-guided latent diffusion video super-resolution.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
IanYeung/MGLD-VSR (ECCV 2024, arXiv 2312.00853), re-designed TPU-first:

- the whole respaced DDPM sampling step (denoiser UNet + struct-cond encoder +
  motion-guided latent correction) compiles to a single XLA program driven by
  ``jax.lax.scan``;
- motion guidance is an explicit ``jax.grad`` of the occlusion-masked
  flow-warp loss (the reference re-enables autograd inside a no-grad sampler,
  /root/reference/ldm/models/diffusion/ddpm.py:4359-4374);
- data-parallel scale-out uses ``jax.sharding.Mesh`` + NamedSharding over ICI
  instead of NCCL DDP;
- hot custom ops (bilinear flow-warp, correlation volume) have Pallas TPU
  kernels with XLA fallbacks.
"""

__version__ = "0.1.0"

from mgldvsr_tpu.ops.resize import resize2d
from mgldvsr_tpu.ops.warp import flow_warp, resize_flow
from mgldvsr_tpu.ops.occlusion import forward_backward_consistency_check
from mgldvsr_tpu.core.schedules import (
    DiffusionSchedule,
    make_beta_schedule,
    respace_schedule,
    space_timesteps,
)
