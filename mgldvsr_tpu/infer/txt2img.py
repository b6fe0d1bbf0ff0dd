"""Stock latent-diffusion text-to-image pipeline.

Capability parity with the reference's bundled ``LatentDiffusion`` image
model (/root/reference/ldm/models/diffusion/ddpm.py:558-1550) and its DDIM/
PLMS samplers with classifier-free guidance
(/root/reference/ldm/models/diffusion/ddim.py:68-337, plms.py:11-236): the
text2img surface SD 2.1 users expect — CLIP-text conditioned UNet
(``UNetModel``, openaimodel.py:650-980: the dual-cond VSR denoiser minus
SPADE and temporal modules), eps-parameterized sampling over the base
schedule, VAE decode at scale_factor 0.18215.

TPU-first: the whole sampler runs as one ``lax.scan`` XLA program;
classifier-free guidance batches the conditional and unconditional branches
into a single UNet call (2B batch) so both ride the same MXU matmuls instead
of two kernel launches.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from mgldvsr_tpu.core.samplers import ddim_invert, ddim_sample, plms_sample
from mgldvsr_tpu.core.schedules import DiffusionSchedule
from mgldvsr_tpu.models.cliptext import (
    CLIPTextConfig,
    OpenCLIPTextEncoder,
    empty_prompt_tokens,
)
from mgldvsr_tpu.models.unet import InflatedUNetDualCond, UNetConfig
from mgldvsr_tpu.models.vae import AutoencoderKL, DiagonalGaussian, VAEConfig


def text2img_unet_config(dtype: Any = jnp.float32) -> UNetConfig:
    """SD 2.1 text2img denoiser: the stock ``UNetModel`` topology."""
    return UNetConfig(use_temporal=False, use_spade=False, num_frames=1,
                      dtype=dtype)


@dataclasses.dataclass(frozen=True)
class Text2ImgConfig:
    timesteps: int = 1000
    linear_start: float = 0.00085
    linear_end: float = 0.012
    scale_factor: float = 0.18215
    unet: UNetConfig = dataclasses.field(
        default_factory=text2img_unet_config)
    vae: VAEConfig = dataclasses.field(
        default_factory=lambda: VAEConfig(num_frames=1, enable_fusion=False))
    clip: CLIPTextConfig = dataclasses.field(default_factory=CLIPTextConfig)


class Text2ImgPipeline:
    """Module definitions + schedule; params are passed per call."""

    def __init__(self, cfg: Text2ImgConfig = Text2ImgConfig()):
        if cfg.unet.use_spade or cfg.unet.use_temporal:
            raise ValueError("text2img uses the stock UNetModel: "
                             "use_spade=False, use_temporal=False")
        self.cfg = cfg
        self.unet = InflatedUNetDualCond(cfg.unet)
        self.vae = AutoencoderKL(cfg.vae)
        self.clip = OpenCLIPTextEncoder(cfg.clip)
        self.sched = DiffusionSchedule.create(
            timesteps=cfg.timesteps,
            beta_schedule="linear",
            linear_start=cfg.linear_start,
            linear_end=cfg.linear_end,
        )

    def init_params(self, rng: jax.Array, height: int = 512,
                    width: int = 512) -> Dict[str, Any]:
        cfg = self.cfg
        hh = min(height, 8 * 2 ** len(cfg.vae.ch_mult))
        ww = min(width, hh)
        lat = jnp.zeros((1, hh // 8, ww // 8, 4))
        img = jnp.zeros((1, hh, ww, 3))
        tokens = empty_prompt_tokens(1, cfg.clip.context_length)
        ctx = jnp.zeros((1, cfg.clip.context_length, cfg.clip.width))
        ts = jnp.zeros((1,), jnp.int32)
        ks = jax.random.split(rng, 3)
        return {
            "unet": jax.jit(self.unet.init)(ks[0], lat, ts, ctx, None),
            "vae": jax.jit(self.vae.init)(ks[1], img),
            "clip": jax.jit(self.clip.init)(ks[2], tokens),
        }

    def embed_tokens(self, params, tokens: jnp.ndarray) -> jnp.ndarray:
        return self.clip.apply(params["clip"], tokens)

    def denoise_fn(self, params, context: jnp.ndarray,
                   uncond_context: Optional[jnp.ndarray] = None,
                   cfg_scale: float = 1.0):
        """eps(x, t) with optional classifier-free guidance.

        Matches the reference DDIMSampler's
        ``unconditional_guidance_scale`` path (ddim.py:178-192): both
        branches run in one doubled-batch UNet call."""
        if uncond_context is None or cfg_scale == 1.0:
            def fn(x, tb):
                return self.unet.apply(params["unet"], x, tb, context, None)
            return fn

        ctx2 = jnp.concatenate([uncond_context, context], axis=0)

        def fn(x, tb):
            x2 = jnp.concatenate([x, x], axis=0)
            tb2 = jnp.concatenate([tb, tb], axis=0)
            eps2 = self.unet.apply(params["unet"], x2, tb2, ctx2, None)
            eps_u, eps_c = jnp.split(eps2, 2, axis=0)
            return eps_u + cfg_scale * (eps_c - eps_u)

        return fn

    def sample_latents(
        self,
        params,
        context: jnp.ndarray,
        rng: jax.Array,
        height: int = 512,
        width: int = 512,
        num_steps: int = 50,
        sampler: str = "ddim",
        eta: float = 0.0,
        cfg_scale: float = 1.0,
        uncond_context: Optional[jnp.ndarray] = None,
        x_T: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        b = context.shape[0]
        k_init, k_samp = jax.random.split(rng)
        if x_T is None:
            x_T = jax.random.normal(
                k_init, (b, height // 8, width // 8, 4), jnp.float32)
        fn = self.denoise_fn(params, context, uncond_context, cfg_scale)
        if sampler == "ddim":
            return ddim_sample(self.sched, fn, x_T, k_samp,
                               num_steps=num_steps, eta=eta)
        if sampler == "plms":
            return plms_sample(self.sched, fn, x_T, num_steps=num_steps)
        raise ValueError(f"unknown sampler {sampler!r}")

    def decode(self, params, latents: jnp.ndarray) -> jnp.ndarray:
        return self.vae.apply(params["vae"], latents / self.cfg.scale_factor,
                              method="decode")

    def encode(self, params, images_pm1: jnp.ndarray,
               rng: jax.Array) -> jnp.ndarray:
        moments = self.vae.apply(params["vae"], images_pm1,
                                 method="encode_moments")
        return self.cfg.scale_factor * DiagonalGaussian(moments).sample(rng)

    def invert(self, params, images_pm1: jnp.ndarray, context: jnp.ndarray,
               rng: jax.Array, num_steps: int = 50) -> jnp.ndarray:
        """DDIM inversion of real images into noise latents (the capability
        of the reference's ddpm_inv.py experiments)."""
        z0 = self.encode(params, images_pm1, rng)
        fn = self.denoise_fn(params, context)
        return ddim_invert(self.sched, fn, z0, num_steps=num_steps)

    def generate(
        self,
        params,
        tokens: jnp.ndarray,
        rng: jax.Array,
        uncond_tokens: Optional[jnp.ndarray] = None,
        cfg_scale: float = 1.0,
        **kwargs,
    ) -> jnp.ndarray:
        """tokens [B,77] -> images [B,H,W,3] in [-1,1]."""
        context = self.embed_tokens(params, tokens)
        uncond = (self.embed_tokens(params, uncond_tokens)
                  if uncond_tokens is not None else None)
        lat = self.sample_latents(params, context, rng, cfg_scale=cfg_scale,
                                  uncond_context=uncond, **kwargs)
        return self.decode(params, lat)
