"""Stage-1 training: finetune SPADE + temporal modules of the denoiser and
the struct-cond encoder on degraded clips.

Parity with the reference training path (structure studied):
- trainable set = UNet params whose path contains 'spade' or 'temporal',
  plus the whole struct-cond encoder
  (/root/reference/ldm/models/diffusion/ddpm.py:3237-3250, 4878-4900 —
  a single AdamW; frozen towers contribute no grads);
- per-frame random timestep, struct-cond from the LQ latent at the original
  timestep (ddpm.py:3950-3972);
- eps-MSE loss with per-t logvar weighting and optional elbo term
  (ddpm.py:4105-4155);
- LitEma shadow with warmup (ldm/modules/ema.py:5-78);
- gradient accumulation (reference: Lightning accumulate_grad_batches=4).

TPU-first: the whole step (VAE encodes + structcond + UNet + backward +
AdamW) is one jitted XLA program; data parallelism is a sharded batch over
the mesh's 'data' axis with XLA-inserted gradient psums — no DDP wrapper.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import traverse_util

from mgldvsr_tpu.core.schedules import DiffusionSchedule, q_sample
from mgldvsr_tpu.infer.pipeline import MGLDVSRPipeline, upscale_frames
from mgldvsr_tpu.models.vae import DiagonalGaussian


# ---------------------------------------------------------------------------
# Parameter partitioning
# ---------------------------------------------------------------------------


def partition_params(
    params: Dict[str, Any], trainable_keys=("spade", "temporal")
) -> Tuple[Dict, Dict]:
    """Split the pipeline param dict into (trainable, frozen) pytrees.

    UNet: only paths containing one of ``trainable_keys``; structcond: all;
    vae/clip/raft: frozen."""
    flat = traverse_util.flatten_dict(params, sep="/")
    train, frozen = {}, {}
    for path, leaf in flat.items():
        top = path.split("/", 1)[0]
        if top == "structcond":
            train[path] = leaf
        elif top == "unet" and any(k in path.lower() for k in trainable_keys):
            train[path] = leaf
        else:
            frozen[path] = leaf
    return (
        traverse_util.unflatten_dict(train, sep="/"),
        traverse_util.unflatten_dict(frozen, sep="/"),
    )


def merge_params(trainable: Dict, frozen: Dict) -> Dict:
    flat = dict(traverse_util.flatten_dict(frozen, sep="/"))
    flat.update(traverse_util.flatten_dict(trainable, sep="/"))
    return traverse_util.unflatten_dict(flat, sep="/")


# ---------------------------------------------------------------------------
# EMA (LitEma semantics: decay warmup (1+n)/(10+n), shadow of trainables)
# ---------------------------------------------------------------------------


def ema_update(shadow, new, num_updates, decay=0.9999):
    d = jnp.minimum(decay, (1.0 + num_updates) / (10.0 + num_updates))
    return jax.tree_util.tree_map(lambda s, p: s - (1.0 - d) * (s - p), shadow, new)


# ---------------------------------------------------------------------------
# Trainer
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Stage1Config:
    learning_rate: float = 5.0e-5
    grad_accum: int = 4
    ema_decay: float = 0.9999
    use_ema: bool = True
    original_elbo_weight: float = 0.0
    l_simple_weight: float = 1.0
    max_grad_norm: Optional[float] = None
    time_replace: Optional[int] = None  # train-time respacing (None = 1000)
    # 'bfloat16' halves the first-moment bytes (the variance stays fp32 —
    # bf16 nu is numerically unsafe); a single-chip memory lever for large
    # inputs (512px stage-1 OOMs a 16GB v5e with fp32 moments, r03)
    adam_mu_dtype: Optional[str] = None
    # Storage dtype for the FROZEN towers (VAE/CLIP/RAFT + UNet base —
    # 5.0 of the 5.4 GiB total at full scale). They receive no optimizer
    # updates and all full-scale compute runs in bf16 (flax casts params to
    # the module dtype at apply time), so fp32 storage is pure HBM waste:
    # 'bfloat16' halves it with bit-identical bf16 compute. Trainables stay
    # fp32 masters regardless.
    frozen_dtype: Optional[str] = None


class TrainState(NamedTuple):
    trainable: Any
    frozen: Any
    opt_state: Any
    ema: Any
    step: jnp.ndarray  # int32


class Stage1Trainer:
    def __init__(self, pipe: MGLDVSRPipeline, cfg: Stage1Config = Stage1Config()):
        self.pipe = pipe
        self.cfg = cfg
        if cfg.time_replace and cfg.time_replace != pipe.cfg.timesteps:
            from mgldvsr_tpu.core.schedules import respace_schedule

            self.sched = respace_schedule(pipe.base_sched, cfg.time_replace)
        else:
            self.sched = pipe.base_sched
        mu_dtype = (jnp.dtype(cfg.adam_mu_dtype)
                    if cfg.adam_mu_dtype else None)
        tx = optax.adamw(cfg.learning_rate, mu_dtype=mu_dtype)
        if cfg.max_grad_norm:
            tx = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm), tx)
        if cfg.grad_accum > 1:
            tx = optax.MultiSteps(tx, cfg.grad_accum)
        self.tx = tx

    def init_state(self, params: Dict[str, Any]) -> TrainState:
        trainable, frozen = partition_params(params)
        if self.cfg.frozen_dtype:
            fdt = jnp.dtype(self.cfg.frozen_dtype)
            frozen = jax.tree_util.tree_map(
                lambda x: x.astype(fdt)
                if jnp.issubdtype(x.dtype, jnp.floating) else x,
                frozen,
            )
        return TrainState(
            trainable=trainable,
            frozen=frozen,
            opt_state=self.tx.init(trainable),
            ema=jax.tree_util.tree_map(jnp.array, trainable)
            if self.cfg.use_ema
            else None,
            step=jnp.zeros((), jnp.int32),
        )

    # -- loss --------------------------------------------------------------

    def p_losses(
        self,
        params: Dict[str, Any],
        z_gt: jnp.ndarray,
        z_lq: jnp.ndarray,
        context: jnp.ndarray,
        t: jnp.ndarray,
        rng: jax.Array,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Denoising loss at per-frame timesteps ``t`` (respaced indices)."""
        sched = self.sched
        noise = jax.random.normal(rng, z_gt.shape, dtype=z_gt.dtype)
        x_noisy = q_sample(sched, z_gt, t, noise)
        t_ori = sched.timestep_map[t]
        s_cond = self.pipe.structcond.apply(params["structcond"], z_lq, t_ori)
        model_out = self.pipe.unet.apply(
            params["unet"], x_noisy, t_ori, context, s_cond
        )
        err = (model_out - noise) ** 2
        loss_simple = err.mean(axis=(1, 2, 3))
        # logvar fixed at zero (learn_logvar False): loss == loss_simple
        loss = self.cfg.l_simple_weight * loss_simple.mean()
        loss_vlb = (sched.lvlb_weights[t] * loss_simple).mean()
        loss = loss + self.cfg.original_elbo_weight * loss_vlb
        return loss, {"loss_simple": loss_simple.mean(), "loss_vlb": loss_vlb}

    # -- full step ---------------------------------------------------------

    def train_step(
        self,
        state: TrainState,
        lq_01: jnp.ndarray,
        gt_01: jnp.ndarray,
        rng: jax.Array,
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        """lq_01: [(b t), h, w, 3] already upscaled to GT size, in [0,1];
        gt_01: [(b t), H, W, 3]. Jit/pjit-compatible."""
        pipe = self.pipe
        k_enc1, k_enc2, k_t, k_noise = jax.random.split(rng, 4)
        frozen = state.frozen

        lq = lq_01 * 2.0 - 1.0
        gt = gt_01 * 2.0 - 1.0

        # frozen encodes (stop_gradient: VAE/CLIP are not trained here)
        full_frozen = merge_params(state.trainable, frozen)  # for vae/clip
        z_lq, _ = pipe.encode(full_frozen, lq, k_enc1)
        z_gt, _ = pipe.encode(full_frozen, gt, k_enc2)
        z_lq = jax.lax.stop_gradient(z_lq)
        z_gt = jax.lax.stop_gradient(z_gt)
        context = jax.lax.stop_gradient(
            pipe.embed_empty_prompt(full_frozen, z_gt.shape[0])
        )

        t = jax.random.randint(
            k_t, (z_gt.shape[0],), 0, self.sched.num_timesteps, dtype=jnp.int32
        )

        def loss_fn(trainable):
            params = merge_params(trainable, frozen)
            return self.p_losses(params, z_gt, z_lq, context, t, k_noise)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.trainable
        )
        updates, opt_state = self.tx.update(
            grads, state.opt_state, state.trainable
        )
        trainable = optax.apply_updates(state.trainable, updates)
        step = state.step + 1
        ema = (
            ema_update(state.ema, trainable, step, self.cfg.ema_decay)
            if state.ema is not None
            else None
        )
        metrics = dict(metrics, loss=loss, grad_norm=optax.global_norm(grads))
        return (
            TrainState(trainable, frozen, opt_state, ema, step),
            metrics,
        )

    def train_step_from_raw(
        self, state: TrainState, lq_small_01: jnp.ndarray, gt_01: jnp.ndarray,
        rng: jax.Array,
    ):
        """Convenience: bicubic-upscale the LQ clip inside the step."""
        lq_up = upscale_frames(lq_small_01, self.pipe.cfg.sf)
        return self.train_step(state, lq_up, gt_01, rng)


def with_ema(state: TrainState) -> Dict[str, Any]:
    """Full parameter dict with EMA shadows swapped in for the trainables —
    the reference's ``model.ema_scope()`` used at inference
    (ldm/modules/ema.py:5-78; scripts old.py:321)."""
    source = state.ema if state.ema is not None else state.trainable
    return merge_params(source, state.frozen)
