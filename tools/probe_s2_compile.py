"""Bisect the stage-2 @512px compile failure: AOT-lower + compile each of
the three split-step programs (frozen_flows / gen_step / disc_step)
separately and report which one kills the compile pipeline (the fused step
AND the split bench both died with `remote_compile: HTTP 500` on v5e —
r04 queue, train2_512b/c). Compile only: no step is executed, so this is
safe to run on the chip between bench items.

Usage: python tools/probe_s2_compile.py [--size 512] [--piece all|flows|gen|disc|gen_noad]
"""
from __future__ import annotations

import argparse
import os
import sys
import time
import traceback

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/mgld_tpu_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--piece", default="all",
                    choices=["all", "flows", "gen", "disc", "gen_noad", "genbisect"])
    ap.add_argument("--remat", action="store_true",
                    help="per-block activation remat in the VAE "
                         "(VAEConfig.use_checkpoint)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mgldvsr_tpu.models.vae import VAEConfig
    from mgldvsr_tpu.train.stage2 import Stage2Config, Stage2Trainer

    t, size = args.frames, args.size
    trainer = Stage2Trainer(
        VAEConfig(num_frames=t, enable_fusion=True, dtype=jnp.bfloat16,
                  use_checkpoint=args.remat),
        Stage2Config(grad_accum=1, num_frames=t))
    state = trainer.init_state(jax.random.PRNGKey(0), size, size)
    lq = jnp.zeros((t, size, size, 3))
    gt = jnp.zeros((t, size, size, 3))
    lat = jnp.zeros((t, size // 8, size // 8, 4))

    def try_compile(name, fn, *xargs):
        t0 = time.time()
        try:
            lowered = jax.jit(fn).lower(*xargs)
            compiled = lowered.compile()
            mem = getattr(compiled, "memory_analysis", lambda: None)()
            extra = ""
            if mem is not None:
                extra = (f" temp={getattr(mem, 'temp_size_in_bytes', 0) / 2**30:.2f}GiB"
                         f" out={getattr(mem, 'output_size_in_bytes', 0) / 2**30:.2f}GiB")
            print(f"PROBE {name}: OK {time.time() - t0:.1f}s{extra}",
                  flush=True)
            return True
        except Exception as e:
            print(f"PROBE {name}: FAIL {time.time() - t0:.1f}s "
                  f"{type(e).__name__}: {str(e).splitlines()[0][:200]}",
                  flush=True)
            traceback.print_exc(limit=3)
            return False

    results = {}
    if args.piece in ("all", "flows"):
        results["flows"] = try_compile(
            "flows", trainer.frozen_flows, state, gt)
    # flow/occ shapes for gen: latent-res is NOT used here — swc consumes
    # full-res flows as frozen_flows returns them
    flows_occs = jax.eval_shape(trainer.frozen_flows, state, gt)
    fl = jax.tree_util.tree_map(
        lambda a: jnp.zeros(a.shape, a.dtype), flows_occs[0])
    oc = jax.tree_util.tree_map(
        lambda a: jnp.zeros(a.shape, a.dtype), flows_occs[1])
    if args.piece in ("all", "gen"):
        results["gen"] = try_compile(
            "gen", trainer.gen_step, state, lq, gt, lat, fl, oc)
    if args.piece in ("all", "gen_noad"):
        # generator WITHOUT the two extra adaptive-d_weight pulls: bound
        # whether the multi-pull VJP is the blowup or the base fwd+bwd is
        import jax as _jax

        def gen_single_pull(st, lq_, gt_, lat_, fl_, oc_):
            # replicate gen_step's base loss with d_weight fixed -> exactly
            # one backward sweep, no adaptive pulls
            cfg = trainer.cfg
            gt2 = gt_ * 2.0 - 1.0
            lq2 = lq_ * 2.0 - 1.0

            def recon_fn(gen_trainable):
                from mgldvsr_tpu.train.trainer import merge_params
                params = merge_params(gen_trainable, st.gen_frozen)
                moments, enc_fea = trainer.vae.apply(
                    params, lq2, method="encode")
                dec = trainer.vae.apply(
                    params, lat_, enc_fea, cfg.fusion_w, method="decode")
                return dec

            def loss_fn(gen_trainable, logvar):
                from mgldvsr_tpu.train.losses import l1_diff, swc_loss
                recon = recon_fn(gen_trainable)
                nll_loss, _ = trainer._nll_terms(
                    recon, gt2, logvar, st.aux["lpips"])
                d = l1_diff(gt2, recon, cfg.num_frames)
                w = (nll_loss + cfg.diffloss_weight * jnp.mean(d) / d.shape[0]
                     + cfg.temploss_weight * swc_loss(
                         gt2, recon, cfg.num_frames, fl_, oc_))
                return w

            grads = _jax.grad(loss_fn, argnums=(0, 1))(
                st.gen_trainable, st.logvar)
            return grads

        results["gen_noad"] = try_compile(
            "gen_noad", gen_single_pull, state, lq, gt, lat, fl, oc)
    if args.piece in ("all", "disc"):
        results["disc"] = try_compile(
            "disc", trainer.disc_step, state, gt, gt)
    if args.piece == "genbisect":
        # gen failed at 512 even single-pull (r04g): bisect WHICH loss
        # term's backward kills the compile helper. Each variant is the
        # recon forward + ONE jax.grad over a subset of the loss terms.
        import jax as _jax
        from mgldvsr_tpu.train.trainer import merge_params
        from mgldvsr_tpu.train.losses import l1_diff, swc_loss

        cfg = trainer.cfg

        def recon_of(gen_trainable, lq2):
            params = merge_params(gen_trainable, state.gen_frozen)
            _, enc_fea = trainer.vae.apply(params, lq2, method="encode")
            return trainer.vae.apply(
                params, lat, enc_fea, cfg.fusion_w, method="decode")

        def make(terms):
            def loss_fn(gen_trainable, lq_, gt_):
                lq2 = lq_ * 2.0 - 1.0
                gt2 = gt_ * 2.0 - 1.0
                recon = recon_of(gen_trainable, lq2)
                w = jnp.mean(jnp.abs(gt2 - recon))
                if "lpips" in terms:
                    p = trainer.lpips.apply(state.aux["lpips"], gt2, recon)
                    w = w + jnp.mean(p)
                if "diff" in terms:
                    d = l1_diff(gt2, recon, cfg.num_frames)
                    w = w + jnp.mean(d) / d.shape[0]
                if "swc" in terms:
                    w = w + swc_loss(gt2, recon, cfg.num_frames, fl, oc)
                if "gan" in terms:
                    logits = trainer.disc.apply(
                        {"params": state.disc["params"],
                         **{k: v for k, v in state.disc.items()
                            if k != "params"}}, recon, train=False)
                    w = w - jnp.mean(logits)
                return w

            def step(gen_trainable, lq_, gt_):
                return _jax.grad(loss_fn)(gen_trainable, lq_, gt_)
            return step

        def fwd_only(gen_trainable, lq_):
            return jnp.mean(recon_of(gen_trainable, lq_ * 2.0 - 1.0))

        results["g_fwd"] = try_compile(
            "g_fwd", fwd_only, state.gen_trainable, lq)
        for name, terms in [("g_l1", ()), ("g_lpips", ("lpips",)),
                            ("g_diff", ("diff",)), ("g_swc", ("swc",)),
                            ("g_gan", ("gan",))]:
            results[name] = try_compile(
                name, make(terms), state.gen_trainable, lq, gt)
    import json
    print(json.dumps({"probe": "s2_compile", "size": size,
                      "results": results}))


if __name__ == "__main__":
    main()
