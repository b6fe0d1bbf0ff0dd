"""Quality metrics: PSNR/SSIM (MATLAB parity), NIQE, FID, E*warp."""
from mgldvsr_tpu.metrics.image import (
    calculate_psnr,
    calculate_ssim,
    psnr_jnp,
    ssim_jnp,
)
from mgldvsr_tpu.metrics.niqe import calculate_niqe, fit_niqe_params
from mgldvsr_tpu.metrics.fid import (
    calculate_activation_statistics,
    calculate_fid,
)
from mgldvsr_tpu.metrics.temporal import calculate_ewarp
