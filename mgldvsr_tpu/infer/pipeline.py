"""End-to-end MGLD-VSR inference pipeline, fully jittable.

Mirrors the fixed-size inference protocol of
/root/reference/scripts/vsr_val_ddpm_text_T_vqganfin_old.py:291-396 as one
pure function: VAE-encode the (bicubic pre-upscaled) LQ frames, build
x_T by noising the LQ latent to t=999 on the original schedule, compute RAFT
flows + occlusion masks at 1/8 resolution, run the 50-step motion-guided
sampler (one ``lax.scan`` XLA program), decode with the temporal video
decoder fusing LQ encoder features, and color-fix.

TPU-first: the entire restore step (minus tokenization, which is static)
compiles to a single XLA program; batch = frames; all convs/attention in
channels-last layout.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from mgldvsr_tpu.core.diffusion import (
    SamplerConfig,
    initial_latents,
    sample_video,
)
from mgldvsr_tpu.core.schedules import DiffusionSchedule, respace_schedule
from mgldvsr_tpu.flow.compute import (
    compute_clip_flows,
    compute_occlusion_masks,
    flows_to_latent_res,
)
from mgldvsr_tpu.flow.raft import RAFT, RAFTConfig
from mgldvsr_tpu.infer.colorfix import apply_colorfix
from mgldvsr_tpu.models.cliptext import (
    CLIPTextConfig,
    OpenCLIPTextEncoder,
    empty_prompt_tokens,
)
from mgldvsr_tpu.models.unet import (
    InflatedUNetDualCond,
    StructCondConfig,
    StructCondEncoder,
    UNetConfig,
)
from mgldvsr_tpu.models.vae import DiagonalGaussian, VAEConfig, VideoAutoencoderKLResi
from mgldvsr_tpu.ops.resize import resize2d


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    num_frames: int = 5
    sf: int = 4
    scale_factor: float = 0.18215
    timesteps: int = 1000
    ddpm_steps: int = 50
    linear_start: float = 0.00085
    linear_end: float = 0.0120
    guidance_scale: float = -10.0
    guidance_mode: str = "reference"
    dec_w: float = 1.0
    colorfix: str = "adain"
    # Resolution at which RAFT runs, relative to the working size. 1.0 is
    # the reference's fixed-script protocol (old.py:344-348 runs flows at
    # full working res) and the parity-oracle setting — the default.
    # Guidance only consumes 1/8-res flows, so 0.5 is the measured speed
    # knob (1.9174 vs 1.7751 fps/chip at the 512px 6-window headline,
    # r05 — +8% for a cheaper-than-reference flow protocol); the tiled
    # script's own protocol is 0.25 (oldcanvas_tile.py:396-401).
    flow_scale: float = 1.0
    # RAFT pair-batch bound: one batched call when the pair count is <=
    # this (fastest), else lax.map over groups of this many pairs. At
    # flow_scale=1.0 the 512px 6-window segment's one-shot 48-eval batch
    # compile-OOMs (27.66G vs 15.75G hbm, r05 — the full-res corr
    # volumes); chunking bounds flow memory without shrinking the SAMPLER
    # batch (flows run once per segment; the 50-step loop doesn't care).
    # Pairs are independent through RAFT, so outputs are identical.
    # None/0 = always one batched call.
    flow_chunk_pairs: Optional[int] = 8
    # Decode this many temporal windows per lax.map step (None/0 = the whole
    # batch in one program). Bounds decoder activation memory when batching
    # many windows per segment call; output equal to the full-batch
    # decode up to XLA reassociation (see decode()).
    decode_chunk_windows: Optional[int] = None
    unet: UNetConfig = UNetConfig()
    structcond: StructCondConfig = StructCondConfig()
    vae: VAEConfig = dataclasses.field(
        default_factory=lambda: VAEConfig(num_frames=5, enable_fusion=True)
    )
    clip: CLIPTextConfig = CLIPTextConfig()
    raft: RAFTConfig = RAFTConfig()


class MGLDVSRPipeline:
    """Holds module definitions + schedules; params are passed per call
    (pure-functional, shardable)."""

    def __init__(self, cfg: PipelineConfig = PipelineConfig()):
        self.cfg = cfg
        self.unet = InflatedUNetDualCond(cfg.unet)
        self.structcond = StructCondEncoder(cfg.structcond)
        self.vae = VideoAutoencoderKLResi(cfg.vae)
        self.clip = OpenCLIPTextEncoder(cfg.clip)
        self.raft = RAFT(cfg.raft)
        self.base_sched = DiffusionSchedule.create(
            timesteps=cfg.timesteps,
            beta_schedule="linear",
            linear_start=cfg.linear_start,
            linear_end=cfg.linear_end,
        )
        self.sched = respace_schedule(self.base_sched, cfg.ddpm_steps)

    # -- parameter initialisation (random; real weights via io.ckpt_convert)

    def init_params(
        self, rng: jax.Array, height: int = 512, width: int = 512,
        fast: bool = True,
    ) -> Dict[str, Any]:
        """Random parameter trees.

        ``fast=True`` (default) synthesizes leaves directly from
        ``jax.eval_shape`` of the module inits — zero XLA compilation, the
        same tree structure/shapes, and initializer-equivalent statistics
        (fan-in-scaled normals for kernels, zeros/ones for bias/scale).
        ``fast=False`` runs the exact flax initializers under jit.
        Real weights come from io.ckpt_convert / io.checkpoint."""
        if fast:
            shapes = jax.eval_shape(
                lambda: self._init_params_exact(rng, height, width)
            )
            return _synthesize_leaves(shapes, rng)
        return self._init_params_exact(rng, height, width)

    def _init_params_exact(self, rng: jax.Array, height: int, width: int
                           ) -> Dict[str, Any]:
        cfg = self.cfg
        t = cfg.num_frames
        ks = jax.random.split(rng, 5)
        # Parameters are size-independent (conv/attention nets), so
        # initialise at the smallest valid spatial size with a 1-iteration
        # RAFT (GRU weights are shared across iterations): eager full-size
        # init takes minutes on CPU, this takes seconds — and the resulting
        # trees are identical.
        hh = min(height, 8 * 2 ** max(len(cfg.structcond.channel_mult),
                                      len(cfg.vae.ch_mult)))
        ww = min(width, hh)
        frames = jnp.zeros((t, hh, ww, 3))
        lat = jnp.zeros((t, hh // 8, ww // 8, 4))
        tsteps = jnp.zeros((t,), jnp.int32)
        tokens = empty_prompt_tokens(t, cfg.clip.context_length)
        s_cond = jax.jit(self.structcond.init)(ks[0], lat, tsteps)
        ctx = jnp.zeros((t, cfg.clip.context_length, cfg.clip.width))
        sc = jax.eval_shape(self.structcond.apply, s_cond, lat, tsteps)
        sc = jax.tree_util.tree_map(lambda a: jnp.zeros(a.shape, a.dtype), sc)
        raft1 = RAFT(dataclasses.replace(cfg.raft, iters=1))
        return {
            "unet": jax.jit(self.unet.init)(ks[1], lat, tsteps, ctx, sc),
            "structcond": s_cond,
            "vae": jax.jit(self.vae.init)(ks[2], frames, lat),
            "clip": jax.jit(self.clip.init)(ks[3], tokens),
            "raft": jax.jit(raft1.init)(ks[4], frames, frames),
        }

    # -- stages ------------------------------------------------------------

    def encode(self, params, frames_pm1: jnp.ndarray, rng: jax.Array,
               sample_posterior: bool = True,
               noise_window_tile: bool = False):
        """frames in [-1,1] -> (scaled latent, multi-scale LQ features).
        ``sample_posterior=False`` takes the posterior mode (parity/
        deterministic runs). ``noise_window_tile`` draws the posterior
        noise for ONE ``num_frames`` window and tiles it over the window
        batch — the draw each window would get from a solo same-rng call
        (tiled protocol: every patch shares the seed, tile.py:428)."""
        moments, enc_fea = self.vae.apply(
            params["vae"], frames_pm1, method="encode"
        )
        g = DiagonalGaussian(moments)
        if not sample_posterior:
            z = g.mode()
        elif noise_window_tile:
            t = self.cfg.num_frames
            base = jax.random.normal(
                rng, (t, *g.mean.shape[1:]), dtype=g.mean.dtype)
            nw = g.mean.shape[0] // t
            z = g.mean + g.std * jnp.tile(base, (nw,) + (1,) * (base.ndim - 1))
        else:
            z = g.sample(rng)
        return self.cfg.scale_factor * z, enc_fea

    def decode(self, params, latents: jnp.ndarray, enc_fea,
               dec_w: Optional[float] = None,
               chunk_windows: Optional[int] = None) -> jnp.ndarray:
        """latents [B*T,...] -> pixels. ``chunk_windows`` (or the config
        default) decodes ``chunk_windows`` temporal windows at a time under
        ``lax.map`` so decoder activations don't scale with the window
        batch B — the windows=8 segment batch OOMed at 512px on one v5e
        chip with the full-batch decode (decode sits OUTSIDE the guided
        sampling scan, so only its own activations are at stake; temporal
        layers never cross ``num_frames`` windows, so chunking only changes
        XLA scheduling, not the math)."""
        w = self.cfg.dec_w if dec_w is None else dec_w
        cw = (self.cfg.decode_chunk_windows if chunk_windows is None
              else chunk_windows)
        n = latents.shape[0]
        group = (cw or 0) * self.cfg.num_frames

        def full(z, fea):
            return self.vae.apply(
                params["vae"], z / self.cfg.scale_factor, fea, w,
                method="decode")

        if not group or group >= n or n % group:
            return full(latents, enc_fea)
        zs = latents.reshape(n // group, group, *latents.shape[1:])
        feas = jax.tree_util.tree_map(
            lambda a: a.reshape(n // group, group, *a.shape[1:]), enc_fea)
        out = jax.lax.map(lambda args: full(*args), (zs, feas))
        return out.reshape(n, *out.shape[2:])

    def embed_empty_prompt(self, params, batch: int) -> jnp.ndarray:
        tokens = empty_prompt_tokens(batch, self.cfg.clip.context_length)
        return self.clip.apply(params["clip"], tokens)

    def compute_flows(self, params, frames_01: jnp.ndarray,
                      flow_scale: Optional[float] = None,
                      flow_method: str = "bilinear"):
        """frames [B*T,H,W,3] in [0,1] -> latent-res flows + occlusion masks
        ([B,T-1,...] each direction; flows never cross window boundaries).

        RAFT runs at ``flow_scale`` of the working resolution (flows are
        only consumed at 1/8 latent resolution). ``flow_scale=None`` uses
        the pipeline config; the tiled protocol passes 0.25/bicubic (the
        reference's oldcanvas_tile.py:396 downsize)."""
        fs = self.cfg.flow_scale if flow_scale is None else flow_scale
        nf = self.cfg.num_frames
        if fs != 1.0:
            n, h, w, _ = frames_01.shape
            small = resize2d(frames_01, (int(h * fs), int(w * fs)),
                             method=flow_method)
        else:
            small = frames_01
        n, h, w, c = small.shape
        assert n % nf == 0, f"{n} frames not a multiple of num_frames={nf}"
        clip_frames = small.reshape(n // nf, nf, h, w, c)
        raft_fn = lambda a, b: self.raft.apply(params["raft"], a, b)
        ck = self.cfg.flow_chunk_pairs
        if ck:
            raft_fn = _chunked_pairs(raft_fn, ck)
        ff, fb = compute_clip_flows(raft_fn, clip_frames)
        to_latent = 0.125 / fs
        ff = flows_to_latent_res(ff, to_latent)
        fb = flows_to_latent_res(fb, to_latent)
        fwd_occ, bwd_occ = compute_occlusion_masks(ff, fb)
        return (ff, fb), (fwd_occ, bwd_occ)

    def denoise_fn(self, params, struct_latent, context):
        def fn(x, t_orig):
            s_cond = self.structcond.apply(
                params["structcond"], struct_latent, t_orig
            )
            return self.unet.apply(params["unet"], x, t_orig, context, s_cond)

        return fn

    # -- full restore ------------------------------------------------------

    def restore_segment(
        self,
        params,
        frames_01: jnp.ndarray,
        rng: jax.Array,
        dec_w: Optional[float] = None,
        use_guidance: bool = True,
        deterministic: bool = False,
    ) -> jnp.ndarray:
        """[B*T, H, W, 3] target-size frames in [0,1] -> SR frames in [0,1].

        B >= 1 independent ``num_frames`` windows may be batched in one call
        (flows/guidance/temporal attention never cross window boundaries) —
        the single-chip throughput lever for the MXU's batch appetite.
        Jit-compatible: wrap in jax.jit (static self).

        ``deterministic=True`` zeroes every noise draw (posterior mode,
        x_T noise=0, sampler temperature=0) — the protocol-parity mode the
        reference-composition oracle runs both sides in (torch and JAX RNGs
        cannot draw identical gaussians)."""
        cfg = self.cfg
        k_enc, k_xt, k_samp = jax.random.split(rng, 3)
        frames_pm1 = frames_01 * 2.0 - 1.0

        init_latent, enc_fea = self.encode(
            params, frames_pm1, k_enc, sample_posterior=not deterministic)
        context = self.embed_empty_prompt(params, frames_01.shape[0])
        flows, masks = (
            self.compute_flows(params, frames_01) if use_guidance else (None, None)
        )
        x_T = initial_latents(
            self.base_sched, init_latent, k_xt,
            noise=jnp.zeros_like(init_latent) if deterministic else None)

        scfg = SamplerConfig(
            num_frames=cfg.num_frames,
            guidance_scale=cfg.guidance_scale,
            guidance_mode=cfg.guidance_mode,
            temperature=0.0 if deterministic else 1.0,
        )
        out = sample_video(
            self.sched,
            self.denoise_fn(params, init_latent, context),
            x_T,
            k_samp,
            scfg,
            flows,
            masks,
        )
        decoded = self.decode(params, out.latents, enc_fea, dec_w)
        fixed = apply_colorfix(decoded, frames_pm1, cfg.colorfix)
        return jnp.clip((fixed + 1.0) / 2.0, 0.0, 1.0)


    def log_images(self, params, frames_01: jnp.ndarray, rng: jax.Array,
                   n_row: int = 4, dec_w: Optional[float] = None):
        """Reference-style training-log rows (ddpm.py:4765-4876 log_images /
        main.py:291-395 ImageLogger): ``inputs`` (the LQ clip),
        ``reconstruction`` (VAE roundtrip with fusion features), ``samples``
        (full guided restore), and ``denoise_row`` (n_row evenly spaced
        intermediate latents of the reverse process, decoded; frame 0 of
        each). All [N, H, W, 3] in [0, 1]."""
        cfg = self.cfg
        k_enc, k_xt, k_samp = jax.random.split(rng, 3)
        frames_pm1 = frames_01 * 2.0 - 1.0
        init_latent, enc_fea = self.encode(params, frames_pm1, k_enc)
        context = self.embed_empty_prompt(params, frames_01.shape[0])
        flows, masks = self.compute_flows(params, frames_01)
        x_T = initial_latents(self.base_sched, init_latent, k_xt)
        scfg = SamplerConfig(
            num_frames=cfg.num_frames,
            guidance_scale=cfg.guidance_scale,
            guidance_mode=cfg.guidance_mode,
            return_intermediates=True,
        )
        out = sample_video(
            self.sched, self.denoise_fn(params, init_latent, context),
            x_T, k_samp, scfg, flows, masks,
        )
        recon = self.decode(params, init_latent, enc_fea, dec_w)
        samples = self.decode(params, out.latents, enc_fea, dec_w)
        inter = out.intermediates  # [steps, (t), h, w, c]
        import numpy as _np

        idxs = _np.linspace(0, inter.shape[0] - 1, n_row).astype(int)
        row = [
            self.decode(params, inter[i], enc_fea, dec_w)[0] for i in idxs
        ]
        to01 = lambda x: jnp.clip((x + 1.0) / 2.0, 0.0, 1.0)
        return {
            "inputs": frames_01,
            "reconstruction": to01(recon),
            "samples": to01(samples),
            "denoise_row": to01(jnp.stack(row)),
        }

    def restore_segment_canvas(
        self,
        params,
        frames_01: jnp.ndarray,
        rng: jax.Array,
        tile: int = 64,
        tile_overlap: int = 32,
        batch_tiles: int = 4,
        dec_w: Optional[float] = None,
        use_guidance: bool = True,
        return_latents: bool = False,
        flows_masks=None,
        deterministic: bool = False,
        clip01: bool = True,
        window_noise: bool = False,
    ):
        """Arbitrary-size segment restore with latent canvas tiling: the eps
        prediction per sampling step is a gaussian-stitched combination of
        64-latent-tile UNet evaluations (one coherent trajectory; parity
        with p_sample_loop_canvas, ddpm.py:4619-4693). Input size must be a
        multiple of 32 (pad upstream).

        ``flows_masks``: optional precomputed ``(flows, masks)`` at this
        patch's latent resolution — the tiled protocol computes flows ONCE
        on the full working frame and splits them (oldcanvas_tile.py:
        420-427); per-patch recomputation is only the standalone default.
        ``deterministic`` zeroes every noise draw (parity/oracle mode, same
        semantics as ``restore_segment``).
        ``window_noise``: every noise draw (posterior, x_T, per-step) is
        made for ONE ``num_frames`` window and tiled across the window
        batch, so K patches stacked along the frames axis each receive
        exactly the draws a solo same-rng call would — the reference's
        per-patch re-seed semantics (tile.py:428) under patch batching.
        With a single window it is the identity."""
        from mgldvsr_tpu.infer.canvas import make_tiled_denoise_fn

        cfg = self.cfg
        t = cfg.num_frames
        k_enc, k_xt, k_samp = jax.random.split(rng, 3)
        frames_pm1 = frames_01 * 2.0 - 1.0
        init_latent, enc_fea = self.encode(
            params, frames_pm1, k_enc, sample_posterior=not deterministic,
            noise_window_tile=window_noise)
        context = self.embed_empty_prompt(params, frames_01.shape[0])
        if not use_guidance:
            flows, masks = None, None
        elif flows_masks is not None:
            flows, masks = flows_masks
        else:
            flows, masks = self.compute_flows(params, frames_01)
        if deterministic:
            xt_noise = jnp.zeros_like(init_latent)
        elif window_noise:
            base = jax.random.normal(
                k_xt, (t, *init_latent.shape[1:]), dtype=init_latent.dtype)
            xt_noise = jnp.tile(
                base, (init_latent.shape[0] // t,) + (1,) * (base.ndim - 1))
        else:
            xt_noise = None
        x_T = initial_latents(
            self.base_sched, init_latent, k_xt, noise=xt_noise)

        denoise_fn = make_tiled_denoise_fn(
            lambda s, t: self.structcond.apply(params["structcond"], s, t),
            lambda x, t, c, sc: self.unet.apply(params["unet"], x, t, c, sc),
            init_latent,
            context,
            tile=tile,
            overlap=tile_overlap,
            batch_tiles=batch_tiles,
        )
        scfg = SamplerConfig(
            num_frames=cfg.num_frames,
            guidance_scale=cfg.guidance_scale,
            guidance_mode=cfg.guidance_mode,
            temperature=0.0 if deterministic else 1.0,
            noise_window_tile=window_noise,
        )
        out = sample_video(self.sched, denoise_fn, x_T, k_samp, scfg, flows, masks)
        decoded = self.decode(params, out.latents, enc_fea, dec_w)
        fixed = apply_colorfix(decoded, frames_pm1, cfg.colorfix)
        if not clip01:
            # tiled protocol: patches are overlap-averaged in [-1,1] BEFORE
            # the final clamp (oldcanvas_tile.py:473-475) — clamping per
            # patch first would change values wherever an out-of-range
            # pixel overlaps an in-range one
            result = fixed
        else:
            result = jnp.clip((fixed + 1.0) / 2.0, 0.0, 1.0)
        if return_latents:
            return result, out.latents
        return result

    def restore_with_latents(self, params, frames_01, rng,
                             dec_w: Optional[float] = None):
        """w_latent path (scripts/vsr_val_ddpm_text_T_vqganfin_w_latent.py):
        returns (frames, latents) so latents can be dumped for stage-2
        training. Protocol details of that script, replicated exactly:
        flows at FULL working resolution (its 0.125 downsize line is
        commented out, w_latent.py:350-355), occlusion masks from the
        SWAPPED consistency-check args (w_latent.py:360 — the tile
        script's order, not old.py's), and the sampler runs WITH flows at
        guidance_scale=-1.0 — which in the reference is a weak correction,
        not a disable: p_sample always applies
        latents -= scale*logvar*grad when flows are given
        (ddpm.py:4430-4438)."""
        cfg = self.cfg
        k_enc, k_xt, k_samp = jax.random.split(rng, 3)
        frames_pm1 = frames_01 * 2.0 - 1.0
        init_latent, enc_fea = self.encode(params, frames_pm1, k_enc)
        context = self.embed_empty_prompt(params, frames_01.shape[0])
        flows, masks = self.compute_flows(params, frames_01, flow_scale=1.0)
        masks = (masks[1], masks[0])
        x_T = initial_latents(self.base_sched, init_latent, k_xt)
        scfg = SamplerConfig(num_frames=cfg.num_frames,
                             guidance_scale=-1.0,
                             guidance_mode=cfg.guidance_mode)
        out = sample_video(
            self.sched,
            self.denoise_fn(params, init_latent, context),
            x_T,
            k_samp,
            scfg,
            flows,
            masks,
        )
        decoded = self.decode(params, out.latents, enc_fea, dec_w)
        fixed = apply_colorfix(decoded, frames_pm1, cfg.colorfix)
        return jnp.clip((fixed + 1.0) / 2.0, 0.0, 1.0), out.latents

    def restore_video(
        self,
        params,
        lq_frames_01: jnp.ndarray,
        rng: jax.Array,
        pch_size: int = 960,
        pch_stride: int = 750,
        min_side: int = 512,
        dec_w: Optional[float] = None,
        use_guidance: bool = True,
        patch_devices: Optional[Sequence] = None,
        flow_scale: float = 0.25,
        deterministic: bool = False,
        tile: int = 64,
        tile_overlap: int = 32,
        batch_tiles: int = 4,
        patch_batch: Optional[int] = None,
    ):
        """Full arbitrary-resolution protocol (oldcanvas_tile script):
        one bicubic pre-upscale by max(min_side/size_min, sf), reflect-pad
        to /32, flows computed ONCE on the full working frame at
        ``flow_scale`` (bicubic downsize; reference: 1/4 res,
        oldcanvas_tile.py:396-401) and resized to latent /8 res, pixel-split
        into overlapping patches with the flows/masks split by synchronized
        /8-scale spliters (tile.py:420-427), canvas-restore each patch with
        its flow patch under ONE jitted program (every patch shares the
        single clamped patch shape, so one compile serves all), overlap-
        average gather, then — if the pre-upscale overshot sf — a bicubic
        downscale of the PADDED frame followed by the reference's no-op
        pad crop (tile.py:523-535 quirk; see the tail of this method).

        Every patch uses the SAME rng (the reference re-seeds
        ``seed_everything(opt.seed)`` per patch, tile.py:428 — identical
        noise across patches keeps overlap seams coherent)."""
        import numpy as np

        from mgldvsr_tpu.infer.canvas import ImageSpliter

        import os as _os
        import time as _time
        _prog = bool(_os.environ.get("MGLD_PROGRESS"))
        _t0 = _time.perf_counter()

        def _mark(stage):
            nonlocal _t0
            if _prog:
                now = _time.perf_counter()
                print(f"[restore_video] {stage} {now - _t0:.2f}s", flush=True)
                _t0 = now

        cfg = self.cfg
        # pch_size<=0 selects the measured-optimal TPU geometry instead of
        # the reference's 960/750 default: one canvas tile per patch
        # (8*tile px), stride 7/8 of that. At 1280x736 this is the 512/448
        # grid that measured 0.2935 vs 0.125 fps on v5e — single-tile
        # patches batch onto the MXU like the fixed segment path (the
        # 960/750 default costs 2x the UNet tile-evals at this frame size).
        size_auto = pch_size <= 0
        if size_auto:
            pch_size = 8 * tile
        # An auto-resolved size with a stale explicit stride (e.g. the
        # reference's 750 default paired with --pch-size 0) would clamp to a
        # zero-overlap grid — auto-resolve the stride too whenever the size
        # was auto and the stride can't produce overlap.
        if pch_stride <= 0 or (size_auto and pch_stride >= pch_size):
            # Auto stride = 7/8 of the patch, computed in LATENT units and
            # scaled back up: the flow/mask spliters walk at pch_stride//8,
            # so a non-/8-aligned pixel stride would desync the pixel patch
            # grid from its flow patches by up to 7 px.
            pch_stride = 8 * max((pch_size * 7) // 64, 1)
        t, h0, w0, _ = lq_frames_01.shape
        # Reference pre-upscale (oldcanvas_tile.py:350-357): ONE bicubic
        # resize by max(min_side/size_min, sf) with int-truncated dims.
        upsample_scale = max(min_side / min(h0, w0), float(cfg.sf))
        work_h, work_w = int(h0 * upsample_scale), int(w0 * upsample_scale)
        pad_h = (-work_h) % 32
        pad_w = (-work_w) % 32
        frames = self._tile_jit("pre")(lq_frames_01, (work_h, work_w),
                                       (pad_h, pad_w))
        _mark("pre-upscale+pad")

        spliter = ImageSpliter(frames.shape, pch_size, pch_stride)
        patches = [patch for patch, _ in spliter.split(frames)]
        flow_patches: list = [None] * len(patches)
        if use_guidance:
            # Full-frame flows, one jitted program, CACHED on the instance —
            # a fresh jax.jit(lambda) per call retraces the whole RAFT every
            # restore_video call. (The round-3 per-patch recomputation both
            # deviated from the reference protocol at patch boundaries and
            # re-ran RAFT on every overlap.)
            flows, masks = self._tile_jit(("flows", flow_scale))(
                params, frames)
            _mark("flows")
            (ff, fb), (of, ob) = flows, masks
            # The tile script swaps the consistency-check arguments relative
            # to the fixed script (oldcanvas_tile.py:406 check(flows[1],
            # flows[0]) vs old.py:354 check(flows[0], flows[1])), which is a
            # pure swap of the resulting mask pair — replicate it here.
            of, ob = ob, of
            tm1, hl, wl = ff.shape[1:4]
            fsplit = ImageSpliter((tm1, hl, wl, 2), pch_size // 8,
                                  pch_stride // 8)
            # The reference zips the pixel and /8 spliters by ORDER; the /8
            # stride walk can produce a trailing extra position the pixel
            # walk lacks (integer-stride quirk) — extra entries are unused,
            # fewer would silently corrupt the zip.
            assert len(fsplit.positions) >= len(spliter.positions), (
                f"flow spliter produced {len(fsplit.positions)} patches for "
                f"{len(spliter.positions)} pixel patches")
            ph, pw = fsplit.pch_size_h, fsplit.pch_size_w
            for i, (oy, ox) in enumerate(
                    fsplit.positions[: len(spliter.positions)]):
                cut = lambda a: a[:, :, oy: oy + ph, ox: ox + pw, :]
                flow_patches[i] = ((cut(ff), cut(fb)), (cut(of), cut(ob)))
        # Reference protocol: the SAME seed for every patch (tile.py:428).
        keys = [rng] * len(patches)
        devices = list(patch_devices) if patch_devices else []
        if patch_batch is None:
            ph_px, pw_px = patches[0].shape[1:3]
            patch_batch = self._patch_batch_envelope(
                ph_px, pw_px, device=devices[0] if devices else None)
        if len(devices) > 1 and len(patches) > 1:
            full = self._restore_patches_sharded(
                params, patches, rng, flow_patches, devices, dec_w,
                use_guidance, deterministic,
                (tile, tile_overlap, batch_tiles), patch_batch,
                spliter, frames.shape, upsample_scale, (work_h, work_w))
            _mark(f"patch loop sharded ({len(patches)} over "
                  f"{len(devices)} devices) + device gather")
            return full
        else:
            # Patch batching: K same-shape patches ride the window axis of
            # ONE compiled program — the 512px 6-window segment batch
            # measured 1.92 vs 1.65 fps/window solo (r03 ladder), and the
            # 512/448 geometry's patches are single-canvas-tile, i.e.
            # exactly that workload. ``window_noise`` tiles every draw per
            # window so each patch still receives the identical noise a
            # solo same-seed call would (reference per-patch re-seed,
            # tile.py:428) — batched output == sequential output.
            kb = max(1, min(patch_batch, len(patches)))
            patch_fn = self._canvas_patch_jit(
                dec_w, use_guidance, deterministic,
                (tile, tile_overlap, batch_tiles))
            # dispatch every group asynchronously, THEN drain: JAX queues
            # the programs back-to-back on the device and the host-side
            # transfers overlap the next group's device compute
            groups_dev = []
            n_p = len(patches)
            for g0 in range(0, n_p, kb):
                idx = list(range(g0, min(g0 + kb, n_p)))
                # pad the trailing group by repeating its last patch so a
                # single (kb*t, H, W, 3) program shape serves every group
                pad = [idx[-1]] * (kb - len(idx))
                gidx = idx + pad
                stacked = jnp.concatenate([patches[i] for i in gidx], 0)
                if use_guidance:
                    fm = jax.tree_util.tree_map(
                        lambda *xs: jnp.concatenate(xs, 0),
                        *[flow_patches[i] for i in gidx])
                    o = patch_fn(params, stacked, keys[idx[0]], fm)
                else:
                    o = patch_fn(params, stacked, keys[idx[0]])
                groups_dev.append((idx, o))
            # gather + clamp + final downscale + crop ON DEVICE in one
            # cached jitted program: only the finished frames cross the
            # host link (the r04 tile512 drain moved 6x(5,512,512,3) fp32
            # = 94 MB/clip over the axon tunnel and averaged on host —
            # measured 1.2-1.9 s/clip of gather alone)
            gidxs = tuple(tuple(ix) for ix, _ in groups_dev)
            gkey = ("gather", frames.shape, tuple(spliter.positions),
                    gidxs, upsample_scale, (work_h, work_w))
            full_dev = self._tile_gather_jit(
                gkey, spliter, gidxs, frames.shape, upsample_scale,
                (work_h, work_w))([o for _, o in groups_dev])
            _tp = _time.perf_counter()
            full = np.asarray(full_dev)
            _mark(f"patch loop ({len(patches)}) + device gather "
                  f"(drain {_time.perf_counter() - _tp:.2f}s)")
            return full

    # largest full-batch-decode canvas program measured to fit a v5e
    # (r03/r04 ladders: 6 512px windows; 8 needed chunked decode), and the
    # marketing byte count of that chip's HBM for scaling to other parts
    _ENVELOPE_BASE_PX = 6 * 512 * 512
    _ENVELOPE_BASE_BYTES = 16e9

    def _patch_batch_envelope(self, ph: int, pw: int, device=None) -> int:
        """Auto window-axis patch batch: the measured v5e fit envelope,
        scaled by the device's reported HBM when it differs materially.

        Within +-25% of the v5e's 16 GB the measured constant is used
        verbatim (allocator reserves and GiB-vs-GB reporting make small
        ratios meaningless — scaling the measured fit by 0.93 would
        silently drop the known-good 6-window batch to 5). Note the axon
        tunnel reports EMPTY memory_stats; absent stats mean v5e behavior.
        """
        px = self._ENVELOPE_BASE_PX
        dev = device
        if dev is None:
            devs = jax.devices()
            dev = devs[0] if devs else None
        limit = None
        if dev is not None:
            try:
                stats = dev.memory_stats() or {}
            except Exception:
                stats = {}
            limit = stats.get("bytes_limit") or stats.get(
                "bytes_reservable_limit")
        if limit and not (0.75 * self._ENVELOPE_BASE_BYTES <= limit
                          <= 1.25 * self._ENVELOPE_BASE_BYTES):
            px = int(px * (limit / self._ENVELOPE_BASE_BYTES))
        return max(1, px // (ph * pw))

    def _tile_jit(self, key):
        """Instance-cached jitted helpers for the tile path (one wrapper
        object per key ⇒ one trace per shape for the session; a fresh
        jax.jit per call would retrace every restore_video invocation).
        Keys: "pre" (bicubic pre-upscale + clip + reflect pad; target dims
        passed as hashable static tuples) and ("flows", fs)."""
        cache = getattr(self, "_tile_jit_cache", None)
        if cache is None:
            cache = self._tile_jit_cache = {}
        fn = cache.get(key)
        if fn is None:
            if key == "pre":
                def pre(lq, work_hw, pad_hw):
                    fr = resize2d(lq, work_hw, method="bicubic")
                    fr = jnp.clip(fr, 0.0, 1.0)
                    if pad_hw[0] or pad_hw[1]:
                        # reflect-pad AFTER the resize (tile.py:384-388);
                        # r3 resized straight to the padded size, which
                        # resamples the whole frame differently
                        fr = jnp.pad(
                            fr, ((0, 0), (0, pad_hw[0]), (0, pad_hw[1]),
                                 (0, 0)), mode="reflect")
                    return fr

                fn = jax.jit(pre, static_argnums=(1, 2))
            else:
                fs = key[1]
                fn = jax.jit(lambda p, f: self.compute_flows(
                    p, f, flow_scale=fs, flow_method="bicubic"))
            cache[key] = fn
        return fn

    def _tile_gather_jit(self, key, spliter, gidxs, full_shape,
                         upsample_scale, work_hw):
        """One cached jitted program for the tiled-restore tail: overlap-
        count gather of the batched patch groups, the reference's
        average-then-clamp order, the padded-frame final downscale, and
        the (possibly no-op) pad crop — all on device, so only finished
        frames are transferred. Math identical to ImageSpliter.gather +
        the former host tail (oldcanvas_tile.py:473-535 semantics)."""
        cache = getattr(self, "_tile_jit_cache", None)
        if cache is None:
            cache = self._tile_jit_cache = {}
        fn = cache.get(key)
        if fn is not None:
            return fn
        cfg = self.cfg
        t = cfg.num_frames
        tt, H, W, C = full_shape
        positions = list(spliter.positions)
        ph, pw = spliter.pch_size_h, spliter.pch_size_w
        work_h, work_w = work_hw

        def gather(group_outs):
            acc = jnp.zeros((tt, H, W, C), jnp.float32)
            cnt = jnp.zeros((1, H, W, 1), jnp.float32)
            one = jnp.ones((1, ph, pw, 1), jnp.float32)
            for (ix, o) in zip(gidxs, group_outs):
                o = o.astype(jnp.float32)
                for j, pi in enumerate(ix):
                    oy, ox = positions[pi]
                    patch = jax.lax.dynamic_slice_in_dim(o, j * t, t, 0)
                    cur = jax.lax.dynamic_slice(
                        acc, (0, oy, ox, 0), (tt, ph, pw, C))
                    acc = jax.lax.dynamic_update_slice(
                        acc, cur + patch, (0, oy, ox, 0))
                    ccur = jax.lax.dynamic_slice(
                        cnt, (0, oy, ox, 0), (1, ph, pw, 1))
                    cnt = jax.lax.dynamic_update_slice(
                        cnt, ccur + one, (0, oy, ox, 0))
            full = acc / cnt
            full = jnp.clip((full + 1.0) / 2.0, 0.0, 1.0)
            if upsample_scale > cfg.sf:
                # padded-frame downscale + no-op pad crop quirk
                # (tile.py:523-535), exactly as the host path
                out_h = int(H * cfg.sf / upsample_scale)
                out_w = int(W * cfg.sf / upsample_scale)
                full = jnp.clip(resize2d(full, (out_h, out_w),
                                         method="bicubic"), 0.0, 1.0)
            return full[:, : work_h, : work_w, :]

        fn = jax.jit(gather)
        cache[key] = fn
        return fn

    def _canvas_patch_jit(self, dec_w, use_guidance: bool,
                          deterministic: bool,
                          tiling=(64, 32, 4)):
        """Jitted per-patch canvas restore, cached on the pipeline instance
        so repeated ``restore_video`` calls (and all same-shape patches
        within one call) reuse ONE compiled program. Round-3 shipped this
        loop unjitted — eager per-op dispatch made the tiled path ~40x
        slower than the identical shape through the fixed path;
        tests/test_patch_parallel.py guards the dispatch count."""
        tile, tile_overlap, batch_tiles = tiling
        key = (dec_w, use_guidance, deterministic, tiling)
        cache = getattr(self, "_canvas_jit_cache", None)
        if cache is None:
            cache = self._canvas_jit_cache = {}
        fn = cache.get(key)
        if fn is None:
            if use_guidance:
                fn = jax.jit(lambda p, patch, k, fm: self.restore_segment_canvas(
                    p, patch, k, tile=tile, tile_overlap=tile_overlap,
                    batch_tiles=batch_tiles, dec_w=dec_w, use_guidance=True,
                    flows_masks=fm, deterministic=deterministic,
                    clip01=False, window_noise=True))
            else:
                fn = jax.jit(lambda p, patch, k: self.restore_segment_canvas(
                    p, patch, k, tile=tile, tile_overlap=tile_overlap,
                    batch_tiles=batch_tiles, dec_w=dec_w, use_guidance=False,
                    deterministic=deterministic, clip01=False,
                    window_noise=True))
            cache[key] = fn
        return fn


    def restore_windows_sharded(
        self,
        params,
        frames_01: jnp.ndarray,
        rng: jax.Array,
        devices: Optional[Sequence] = None,
        dec_w: Optional[float] = None,
        boundary_weight: float = 1.0,
        deterministic: bool = False,
    ) -> jnp.ndarray:
        """[D*t, H, W, 3] CONSECUTIVE target-size frames in [0,1] -> SR.

        One num_frames window per device: the guided sampler runs with
        windows sharded over a ('data',) mesh and exchanges one boundary
        latent per neighbor per step over ICI (parallel/sharded_sampler),
        so the motion-guided correction is also enforced ACROSS window
        boundaries — beyond the reference's independent per-GPU windows
        (scripts old.py:294-296). At ``boundary_weight=0`` each window
        follows the per-window guided sampler's trajectory: sampler-level
        equivalence is asserted in tests/test_sharded_sampler.py, and
        FULL-pipeline equivalence against per-window ``restore_segment``
        (validating the ``extra=`` struct-cond shard_map routing with the
        real UNet) in tests/test_window_parallel.py, both sides run with
        ``deterministic=True`` (all noise draws zeroed; noise realizations
        otherwise differ between one D-window draw and D solo draws).
        """
        import numpy as np

        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from mgldvsr_tpu.ops.occlusion import (
            forward_backward_consistency_check,
        )
        from mgldvsr_tpu.parallel.sharded_sampler import sample_video_sharded

        cfg = self.cfg
        t = cfg.num_frames
        n, H, W, _ = frames_01.shape
        assert n % t == 0, f"{n} frames not a multiple of num_frames={t}"
        d = n // t
        if devices is None:
            devices = jax.devices()[:d]
        assert len(devices) == d, (
            f"need exactly one device per window: {d} windows, "
            f"{len(devices)} devices")
        mesh = Mesh(np.asarray(devices), ("data",))
        bsh = NamedSharding(mesh, P("data"))

        k_enc, k_xt, k_samp = jax.random.split(rng, 3)
        frames_01 = jax.device_put(frames_01, bsh)
        frames_pm1 = frames_01 * 2.0 - 1.0
        init_latent, enc_fea = jax.jit(
            lambda p, f, k: self.encode(
                p, f, k, sample_posterior=not deterministic))(
                    params, frames_pm1, k_enc)
        context_t = self.embed_empty_prompt(params, t)  # same rows ∀ frames

        # per-window flows + boundary-pair flows, one jitted program
        def flows_fn(p, frames):
            fs = cfg.flow_scale
            small = (resize2d(frames, (int(H * fs), int(W * fs)),
                              method="bilinear") if fs != 1.0 else frames)
            clips = small.reshape(d, t, *small.shape[1:])
            raft_fn = lambda a, b: self.raft.apply(p["raft"], a, b)
            ff, fb = compute_clip_flows(raft_fn, clips)
            to_latent = 0.125 / fs
            ff = flows_to_latent_res(ff, to_latent)
            fb = flows_to_latent_res(fb, to_latent)
            occ_f, occ_b = compute_occlusion_masks(ff, fb)
            hl, wl = ff.shape[2:4]
            if d > 1:
                last = clips[:-1, -1]   # [d-1, hs, ws, 3]
                first = clips[1:, 0]
                bf = raft_fn(jnp.concatenate([last, first]),
                             jnp.concatenate([first, last]))
                # bflow warps window d+1's first frame toward window d's
                # last frame (same direction convention as flows_backward)
                bflow = flows_to_latent_res(
                    bf[: d - 1][:, None], to_latent)[:, 0]
                brev = flows_to_latent_res(
                    bf[d - 1:][:, None], to_latent)[:, 0]
                bocc = forward_backward_consistency_check(bflow, brev)[0]
                bflow = jnp.concatenate(         # last entry unused
                    [bflow, jnp.zeros_like(bflow[:1])])
                bocc = jnp.concatenate([bocc, jnp.ones_like(bocc[:1])])
            else:
                bflow = jnp.zeros((1, hl, wl, 2))
                bocc = jnp.ones((1, hl, wl, 1))
            return ff, fb, occ_f, occ_b, bflow, bocc

        ff, fb, occ_f, occ_b, bflow, bocc = jax.jit(flows_fn)(
            params, frames_01)
        bflow = jax.device_put(bflow, bsh)
        bocc = jax.device_put(bocc, bsh)

        x_T = initial_latents(
            self.base_sched, init_latent, k_xt,
            noise=jnp.zeros_like(init_latent) if deterministic else None)
        scfg = SamplerConfig(
            num_frames=t,
            guidance_scale=cfg.guidance_scale,
            guidance_mode=cfg.guidance_mode,
            temperature=0.0 if deterministic else 1.0,
        )

        def dn(x, t_orig, struct_local):
            s_cond = self.structcond.apply(
                params["structcond"], struct_local, t_orig)
            return self.unet.apply(params["unet"], x, t_orig, context_t,
                                   s_cond)

        latents = jax.jit(
            lambda xT, k, fl, ms, bfl, boc, sl: sample_video_sharded(
                mesh, self.sched, dn, xT, k, scfg, fl, ms, bfl, boc,
                boundary_weight=boundary_weight, extra=(sl,)),
            static_argnames=(),
        )(x_T, k_samp, (ff, fb), (occ_f, occ_b), bflow, bocc, init_latent)

        decoded = jax.jit(
            lambda p, l, e: self.decode(p, l, e, dec_w))(
                params, latents, enc_fea)
        fixed = apply_colorfix(decoded, frames_pm1, cfg.colorfix)
        return jnp.clip((fixed + 1.0) / 2.0, 0.0, 1.0)

    def _restore_patches_sharded(self, params, patches, rng, flow_patches,
                                 devices, dec_w, use_guidance,
                                 deterministic, tiling, patch_batch,
                                 spliter, full_shape, upsample_scale,
                                 work_hw):
        """Canvas patches are independent programs — distribute them over
        local devices with ``shard_map`` over a ('patch',) mesh. Same
        design as the single-device path (r4 measured both levers): each
        device runs groups of ``kb`` same-shape patches stacked along the
        WINDOW axis of one compiled canvas program (``window_noise`` tiles
        every draw per window, so outputs equal the sequential per-patch
        path), and the overlap-average gather + clamp + final downscale +
        pad crop run ON DEVICE inside the same jitted program — only the
        finished frames cross the host link (the r4 host gather measured
        94 MB/clip + 1.2-1.9 s over the axon tunnel).

        Beyond-reference scaling: the reference's tile script
        (oldcanvas_tile.py) is strictly sequential per GPU."""
        import numpy as np

        from jax import shard_map
        from jax.sharding import Mesh, PartitionSpec as P

        cfg = self.cfg
        t = cfg.num_frames
        n_dev = len(devices)
        n_pch = len(patches)
        tile, tile_overlap, batch_tiles = tiling
        kb = max(1, min(patch_batch, -(-n_pch // n_dev)))
        n_grp = -(-n_pch // (n_dev * kb))          # groups per device
        n_pad = n_dev * n_grp * kb
        order = list(range(n_pch)) + [n_pch - 1] * (n_pad - n_pch)
        stack = jnp.stack([patches[i] for i in order])
        fstack = None
        if use_guidance:
            fstack = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs),
                *[flow_patches[i] for i in order])

        tt, H, W, C = full_shape
        ph, pw = spliter.pch_size_h, spliter.pch_size_w
        positions = tuple(spliter.positions)
        work_h, work_w = work_hw
        gkey = ("psharded", tuple(stack.shape), positions, n_dev, kb,
                dec_w, use_guidance, deterministic, tiling, full_shape,
                upsample_scale, work_hw)
        cache = getattr(self, "_tile_jit_cache", None)
        if cache is None:
            cache = self._tile_jit_cache = {}
        fn = cache.get(gkey)
        if fn is None:
            mesh = Mesh(np.array(devices), ("patch",))

            def full_prog(params_, stack_, rng_, fstack_):
                def one_group(args):
                    pat, fm = args           # [kb, t, ph, pw, 3]
                    flat = pat.reshape(kb * t, ph, pw, pat.shape[-1])
                    fmf = (jax.tree_util.tree_map(
                        lambda a: a.reshape(a.shape[0] * a.shape[1],
                                            *a.shape[2:]), fm)
                        if use_guidance else None)
                    o = self.restore_segment_canvas(
                        params_, flat, rng_, tile=tile,
                        tile_overlap=tile_overlap,
                        batch_tiles=batch_tiles, dec_w=dec_w,
                        use_guidance=use_guidance, flows_masks=fmf,
                        deterministic=deterministic, clip01=False,
                        window_noise=True)
                    return o.reshape(kb, t, ph, pw, o.shape[-1])

                def local(stack_l, fstack_l):
                    g = stack_l.reshape(n_grp, kb, *stack_l.shape[1:])
                    gf = jax.tree_util.tree_map(
                        lambda a: a.reshape(n_grp, kb, *a.shape[1:]),
                        fstack_l)
                    outs = jax.lax.map(one_group, (g, gf))
                    return outs.reshape(n_grp * kb, *outs.shape[2:])

                out = shard_map(
                    local, mesh=mesh, in_specs=(P("patch"), P("patch")),
                    out_specs=P("patch"), check_vma=False)(stack_, fstack_)
                # device-side overlap-average gather (XLA inserts the
                # all-gather); only real patches accumulate — the tail
                # padding repeats patch n_pch-1 and must not double-count
                acc = jnp.zeros((tt, H, W, C), jnp.float32)
                cnt = jnp.zeros((1, H, W, 1), jnp.float32)
                one = jnp.ones((1, ph, pw, 1), jnp.float32)
                for i in range(n_pch):
                    oy, ox = positions[i]
                    patch = out[i].astype(jnp.float32)
                    cur = jax.lax.dynamic_slice(
                        acc, (0, oy, ox, 0), (tt, ph, pw, C))
                    acc = jax.lax.dynamic_update_slice(
                        acc, cur + patch, (0, oy, ox, 0))
                    ccur = jax.lax.dynamic_slice(
                        cnt, (0, oy, ox, 0), (1, ph, pw, 1))
                    cnt = jax.lax.dynamic_update_slice(
                        cnt, ccur + one, (0, oy, ox, 0))
                full = acc / cnt
                full = jnp.clip((full + 1.0) / 2.0, 0.0, 1.0)
                if upsample_scale > cfg.sf:
                    # padded-frame downscale + no-op pad crop quirk
                    # (tile.py:523-535), exactly as the sequential path
                    out_h = int(H * cfg.sf / upsample_scale)
                    out_w = int(W * cfg.sf / upsample_scale)
                    full = jnp.clip(resize2d(full, (out_h, out_w),
                                             method="bicubic"), 0.0, 1.0)
                return full[:, : work_h, : work_w, :]

            fn = jax.jit(full_prog)
            cache[gkey] = fn
        return np.asarray(fn(params, stack, rng, fstack))


def _chunked_pairs(fn, chunk: int):
    """Wrap a per-pair batched net (e.g. RAFT) so it processes its batch in
    ``chunk``-sized groups under ``lax.map`` — bounds peak activation
    memory (the corr volumes) at the cost of serializing groups. Pairs are
    independent through the net, so outputs equal the one-shot batch."""

    def wrapped(a, b):
        n = a.shape[0]
        if n <= chunk:
            return fn(a, b)
        pad = (-n) % chunk
        if pad:
            a = jnp.concatenate([a, a[:pad]], 0)
            b = jnp.concatenate([b, b[:pad]], 0)
        ar = a.reshape(-1, chunk, *a.shape[1:])
        br = b.reshape(-1, chunk, *b.shape[1:])
        fl = jax.lax.map(lambda ab: fn(*ab), (ar, br))
        fl = fl.reshape(-1, *fl.shape[2:])
        return fl[:n]

    return wrapped


def _synthesize_leaves(shapes, rng: jax.Array):
    """Fill a ShapeDtypeStruct tree with initializer-equivalent values
    without compiling the module graphs: zeros for bias/alpha/mean,
    ones for scale/var, N(0, 0.02) for embeddings, fan-in-scaled normals
    for kernels."""
    import numpy as np

    flat, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    base_seed = int(jax.random.randint(rng, (), 0, 2**31 - 1))
    leaves = []
    for i, (path, leaf) in enumerate(flat):
        name = str(path[-1]).lower()
        shape, dtype = leaf.shape, leaf.dtype
        if any(k in name for k in ("bias", "alpha", "mean")):
            leaves.append(jnp.zeros(shape, dtype))
        elif any(k in name for k in ("scale", "var")):
            leaves.append(jnp.ones(shape, dtype))
        else:
            rs = np.random.RandomState((base_seed + i) % 2**31)
            if len(shape) >= 2:
                fan_in = int(np.prod(shape[:-1]))
                std = 1.0 / np.sqrt(max(fan_in, 1))
            else:
                std = 0.02
            leaves.append(
                jnp.asarray(rs.randn(*shape).astype(np.float32) * std,
                            dtype=dtype)
            )
    return jax.tree_util.tree_unflatten(treedef, leaves)


def upscale_frames(frames_01: jnp.ndarray, sf: int = 4) -> jnp.ndarray:
    """Bicubic pre-upscale of LQ frames to target size (reference:
    F.interpolate bicubic, ddpm.py:3724-3730)."""
    t, h, w, c = frames_01.shape
    up = resize2d(frames_01, (h * sf, w * sf), method="bicubic")
    return jnp.clip(up, 0.0, 1.0)
