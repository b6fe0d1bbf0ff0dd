"""Stage-2 training: finetune the video VAE decoder's fusion + temporal
layers with the sequence-oriented LPIPS/GAN loss.

Parity with the reference protocol (structure studied):
- VideoAutoencoderKLResi training (/root/reference/ldm/models/autoencoder.py:
  1940-1988): batch {lq, gt, diffusion latent}; recon = decode(latent,
  enc_fea(lq)); two Adam(β=0.5,0.9) optimizers alternating generator /
  discriminator; trainable = fusion_layer + temporal params (+disc)
  (:1609-1622).
- LPIPSWithDiscriminator (ldm/modules/losses/contperceptual.py:105-283):
  logvar-weighted L1+LPIPS NLL + 0.5*diff-loss + 0.5*swc-loss + hinge GAN
  with gradient-ratio adaptive weight and disc warmup (step 501).

TPU-first: the step is built from three jittable pieces —
``frozen_flows`` (SpyNet + occlusion), ``gen_step`` (one forward + three
VJP pulls for the grads and the gradient-ratio adaptive d_weight, Adam
update), ``disc_step`` (hinge update on the detached recon) — fused into
ONE program by ``train_step`` or jitted separately when the fused compile
is too large (512px).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import traverse_util

from mgldvsr_tpu.flow.compute import compute_clip_flows, compute_occlusion_masks
from mgldvsr_tpu.flow.spynet import SpyNet
from mgldvsr_tpu.models.discriminator import NLayerDiscriminator
from mgldvsr_tpu.models.lpips import LPIPS
from mgldvsr_tpu.models.vae import VAEConfig, VideoAutoencoderKLResi
from mgldvsr_tpu.train.losses import (
    adopt_weight,
    adaptive_d_weight,
    hinge_d_loss,
    l1_diff,
    swc_loss,
    vanilla_d_loss,
)
from mgldvsr_tpu.train.trainer import merge_params


@dataclasses.dataclass(frozen=True)
class Stage2Config:
    learning_rate: float = 5.0e-5
    grad_accum: int = 8
    disc_start: int = 501
    pixelloss_weight: float = 1.0
    diffloss_weight: float = 0.5
    temploss_weight: float = 0.5
    perceptual_weight: float = 0.5
    kl_weight: float = 0.0
    disc_weight: float = 0.025
    disc_factor: float = 1.0
    disc_loss: str = "hinge"
    logvar_init: float = 0.0
    fusion_w: float = 1.0
    num_frames: int = 5


class Stage2State(NamedTuple):
    gen_trainable: Any
    gen_frozen: Any
    logvar: jnp.ndarray
    disc: Any           # {'params', 'batch_stats'}
    aux: Any            # {'lpips', 'spynet'} frozen
    opt_g: Any
    opt_d: Any
    step: jnp.ndarray


def partition_vae_params(vae_params) -> Tuple[Dict, Dict]:
    """Trainable = decoder fusion_layer_* + temporal convs; rest frozen."""
    flat = traverse_util.flatten_dict(vae_params, sep="/")
    train, frozen = {}, {}
    for path, leaf in flat.items():
        if "fusion_layer" in path or "temporal" in path:
            train[path] = leaf
        else:
            frozen[path] = leaf
    return (
        traverse_util.unflatten_dict(train, sep="/"),
        traverse_util.unflatten_dict(frozen, sep="/"),
    )


class Stage2Trainer:
    def __init__(self, vae_cfg: VAEConfig, cfg: Stage2Config = Stage2Config()):
        self.cfg = cfg
        self.vae = VideoAutoencoderKLResi(vae_cfg)
        self.lpips = LPIPS()
        self.disc = NLayerDiscriminator()
        self.spynet = SpyNet()
        adam = lambda: optax.adam(cfg.learning_rate, b1=0.5, b2=0.9)
        self.tx_g = (
            optax.MultiSteps(adam(), cfg.grad_accum)
            if cfg.grad_accum > 1
            else adam()
        )
        self.tx_d = (
            optax.MultiSteps(adam(), cfg.grad_accum)
            if cfg.grad_accum > 1
            else adam()
        )
        self._d_loss = hinge_d_loss if cfg.disc_loss == "hinge" else vanilla_d_loss

    # -- init ----------------------------------------------------------------

    def init_state(
        self,
        rng: jax.Array,
        height: int = 64,
        width: int = 64,
        vae_params=None,
    ) -> Stage2State:
        t = self.cfg.num_frames
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        frames = jnp.zeros((t, height, width, 3))
        lat = jnp.zeros((t, height // 8, width // 8, 4))
        if vae_params is None:
            vae_params = self.vae.init(k1, frames, lat)
        disc_vars = self.disc.init(k2, frames, train=False)
        lpips_params = self.lpips.init(k3, frames, frames)
        spynet_params = self.spynet.init(k4, frames, frames)
        gen_train, gen_frozen = partition_vae_params(vae_params)
        logvar = jnp.asarray(self.cfg.logvar_init, jnp.float32)
        return Stage2State(
            gen_trainable=gen_train,
            gen_frozen=gen_frozen,
            logvar=logvar,
            disc=dict(disc_vars),
            aux={"lpips": lpips_params, "spynet": spynet_params},
            opt_g=self.tx_g.init((gen_train, logvar)),
            opt_d=self.tx_d.init(dict(disc_vars)["params"]),
            step=jnp.zeros((), jnp.int32),
        )

    # -- loss ------------------------------------------------------------------

    def _nll_terms(self, recon, gt, logvar, lpips_params):
        cfg = self.cfg
        rec = jnp.abs(gt - recon)
        if cfg.perceptual_weight > 0:
            p = self.lpips.apply(lpips_params, gt, recon)
            rec = rec + cfg.perceptual_weight * p.reshape(-1, 1, 1, 1)
        nll = rec / jnp.exp(logvar) + logvar
        # reference: mean over all elements / batch rows
        nll_loss = jnp.mean(nll) / nll.shape[0]
        return nll_loss, jnp.mean(rec)

    def frozen_flows(self, state: Stage2State, gt_01: jnp.ndarray):
        """SpyNet flows + occlusion masks on GT for the swc term (frozen:
        never differentiated). Separately jittable — at 512px the fused
        step's single program crashed the compile pipeline; splitting
        flows/generator/discriminator into three programs keeps each
        compile tractable with identical math."""
        t = self.cfg.num_frames
        b = gt_01.shape[0] // t
        gt_clips = gt_01.reshape(b, t, *gt_01.shape[1:])
        ff, fb = compute_clip_flows(
            lambda a, bb: self.spynet.apply(state.aux["spynet"], a, bb),
            gt_clips,
        )
        occs = compute_occlusion_masks(ff, fb)
        return (ff, fb), occs

    def gen_step(
        self,
        state: Stage2State,
        lq_01: jnp.ndarray,
        gt_01: jnp.ndarray,
        latents: jnp.ndarray,
        flows,
        occs,
    ):
        """Generator half: one forward, three VJP pulls, Adam update on
        (fusion+temporal params, logvar). Returns the updated state, the
        detached recon (input to ``disc_step``), and metrics."""
        cfg = self.cfg
        t = cfg.num_frames
        gt = gt_01 * 2.0 - 1.0
        lq = lq_01 * 2.0 - 1.0

        def recon_fn(gen_trainable, frozen):
            params = merge_params(gen_trainable, frozen)
            moments, enc_fea = self.vae.apply(params, lq, method="encode")
            dec = self.vae.apply(
                params, latents, enc_fea, cfg.fusion_w, method="decode"
            )
            return dec, moments

        # ONE forward, three vjp pulls — the torch autograd structure
        # (contperceptual.py: backward of the weighted loss + two
        # grad(·, last_layer) calls on the SAME graph, d_weight detached).
        # The previous formulation rebuilt the whole recon+LPIPS+disc
        # forward under two extra jax.grad calls (3 forwards total), which
        # tripled the program and crashed the remote compile helper at
        # 512px.
        last_key = "params/decoder/conv_out/kernel"
        flat_frozen = traverse_util.flatten_dict(state.gen_frozen, sep="/")
        have_last = last_key in flat_frozen
        last_w = (flat_frozen[last_key] if have_last
                  else jnp.zeros((), jnp.float32))

        def gen_fwd(gen_trainable, logvar, lw):
            if have_last:
                ff_ = dict(flat_frozen)
                ff_[last_key] = lw
                frozen = traverse_util.unflatten_dict(ff_, sep="/")
            else:
                frozen = state.gen_frozen
            recon, moments = recon_fn(gen_trainable, frozen)
            nll_loss, rec_mean = self._nll_terms(
                recon, gt, logvar, state.aux["lpips"]
            )
            weighted = nll_loss
            d = l1_diff(gt, recon, t)
            weighted = weighted + cfg.diffloss_weight * jnp.mean(d) / d.shape[0]
            temp = swc_loss(gt, recon, t, flows, occs)
            weighted = weighted + cfg.temploss_weight * temp
            logits_fake = self.disc.apply(
                {"params": state.disc["params"],
                 **{k: v for k, v in state.disc.items() if k != "params"}},
                recon,
                train=False,
            )
            g_loss = -jnp.mean(logits_fake)
            aux = {
                "nll_loss": nll_loss,
                "rec_loss": rec_mean,
                "temp_loss": temp,
                "g_loss": g_loss,
                "recon": recon,
            }
            return (weighted, nll_loss, g_loss), aux

        (weighted, nll_loss, g_loss), gen_vjp, aux = jax.vjp(
            gen_fwd, state.gen_trainable, state.logvar, last_w, has_aux=True
        )
        one = jnp.ones((), weighted.dtype)
        zero = jnp.zeros((), weighted.dtype)
        gw_gen, gw_logvar, _ = gen_vjp((one, zero, zero))
        gl_gen, gl_logvar, g_g = gen_vjp((zero, zero, one))
        if have_last:
            _, _, nll_g = gen_vjp((zero, one, zero))
            d_weight = adaptive_d_weight(
                jnp.linalg.norm(nll_g.ravel()),
                jnp.linalg.norm(g_g.ravel()),
                cfg.disc_weight,
            )
        else:
            d_weight = jnp.asarray(cfg.disc_weight)
        aux["d_weight"] = d_weight

        disc_factor_g = adopt_weight(cfg.disc_factor, state.step,
                                     cfg.disc_start)
        scale = d_weight * disc_factor_g  # constant in autodiff (detached)
        loss_g = weighted + scale * g_loss
        grads = jax.tree_util.tree_map(
            lambda a, b: a + scale * b,
            (gw_gen, gw_logvar), (gl_gen, gl_logvar),
        )
        updates, opt_g = self.tx_g.update(
            grads, state.opt_g, (state.gen_trainable, state.logvar)
        )
        gen_trainable, logvar = optax.apply_updates(
            (state.gen_trainable, state.logvar), updates
        )

        recon_det = jax.lax.stop_gradient(aux.pop("recon"))
        new_state = state._replace(
            gen_trainable=gen_trainable, logvar=logvar, opt_g=opt_g)
        metrics = {"loss_g": loss_g, **aux}
        return new_state, recon_det, metrics

    def disc_step(
        self,
        state: Stage2State,
        gt_01: jnp.ndarray,
        recon_det: jnp.ndarray,
    ):
        """Discriminator half on the detached recon; bumps ``step``."""
        cfg = self.cfg
        gt = gt_01 * 2.0 - 1.0
        disc_factor = adopt_weight(cfg.disc_factor, state.step, cfg.disc_start)

        def disc_loss_fn(dparams):
            variables = {"params": dparams,
                         **{k: v for k, v in state.disc.items()
                            if k != "params"}}
            logits_real, new_vars_r = self.disc.apply(
                variables, gt, train=True, mutable=["batch_stats"]
            )
            variables = {"params": dparams, **new_vars_r}
            logits_fake, new_vars = self.disc.apply(
                variables, recon_det, train=True, mutable=["batch_stats"]
            )
            d_loss = disc_factor * self._d_loss(logits_real, logits_fake)
            return d_loss, (new_vars, logits_real.mean(), logits_fake.mean())

        (loss_d, (new_disc_vars, lr_m, lf_m)), d_grads = jax.value_and_grad(
            disc_loss_fn, has_aux=True
        )(state.disc["params"])
        d_updates, opt_d = self.tx_d.update(
            d_grads, state.opt_d, state.disc["params"]
        )
        disc_params = optax.apply_updates(state.disc["params"], d_updates)

        new_state = state._replace(
            disc={"params": disc_params, **new_disc_vars},
            opt_d=opt_d,
            step=state.step + 1,
        )
        metrics = {
            "loss_d": loss_d,
            "logits_real": lr_m,
            "logits_fake": lf_m,
        }
        return new_state, metrics

    def train_step(
        self,
        state: Stage2State,
        lq_01: jnp.ndarray,
        gt_01: jnp.ndarray,
        latents: jnp.ndarray,
        rng: jax.Array,
    ) -> Tuple[Stage2State, Dict[str, jnp.ndarray]]:
        """lq_01 upscaled to GT size [bt,H,W,3] in [0,1]; latents already
        divided by the diffusion scale factor (get_input: lts/0.18215).

        One fused program: flows -> generator update -> discriminator
        update (the reference's alternating-optimizer step,
        autoencoder.py:1940-1988). At sizes where one fused compile is too
        large (512px crashed the remote compile helper twice), jit
        ``frozen_flows`` / ``gen_step`` / ``disc_step`` separately — the
        math is identical (``rng`` is accepted for API stability; the
        stage-2 step draws no noise)."""
        del rng
        flows, occs = self.frozen_flows(state, gt_01)
        state, recon_det, metrics_g = self.gen_step(
            state, lq_01, gt_01, latents, flows, occs)
        state, metrics_d = self.disc_step(state, gt_01, recon_det)
        return state, {**metrics_g, **metrics_d}
