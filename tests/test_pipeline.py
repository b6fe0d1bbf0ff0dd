"""Tiny end-to-end pipeline test: full restore on miniature configs."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from mgldvsr_tpu.flow.raft import RAFTConfig
from mgldvsr_tpu.infer.pipeline import MGLDVSRPipeline, PipelineConfig, upscale_frames
from mgldvsr_tpu.models.cliptext import CLIPTextConfig
from mgldvsr_tpu.models.unet import StructCondConfig, UNetConfig
from mgldvsr_tpu.models.vae import VAEConfig


def tiny_config(num_frames=5, ddpm_steps=4):
    return PipelineConfig(
        num_frames=num_frames,
        ddpm_steps=ddpm_steps,
        unet=UNetConfig(
            model_channels=32,
            num_head_channels=16,
            context_dim=32,
            semb_channels=32,
            channel_mult=(1, 2),
            attention_resolutions=(1, 2),
            num_frames=num_frames,
        ),
        structcond=StructCondConfig(
            model_channels=32,
            out_channels=32,
            channel_mult=(1, 1),
            attention_resolutions=(1, 2),
            num_frames=num_frames,
        ),
        vae=VAEConfig(
            ch=32,
            ch_mult=(1, 1, 2, 2),
            num_res_blocks=1,
            num_frames=num_frames,
            enable_fusion=True,
            num_fuse_block=1,
        ),
        clip=CLIPTextConfig(vocab_size=49408, width=32, heads=2, layers=2),
        raft=RAFTConfig(iters=2),
    )


def test_pipeline_end_to_end_tiny():
    pipe = MGLDVSRPipeline(tiny_config())
    h = w = 32
    params = pipe.init_params(jax.random.PRNGKey(0), h, w)
    frames = jnp.asarray(
        np.random.RandomState(0).rand(5, h, w, 3), dtype=jnp.float32
    )
    out = pipe.restore_segment(params, frames, jax.random.PRNGKey(1))
    assert out.shape == (5, h, w, 3)
    o = np.asarray(out)
    assert np.isfinite(o).all()
    assert o.min() >= 0.0 and o.max() <= 1.0
    # adain colorfix: output channel means should be close to the input's
    assert np.allclose(
        o.mean(axis=(1, 2)), np.asarray(frames).mean(axis=(1, 2)), atol=0.15
    )


def test_pipeline_jit_and_guidance_toggle():
    pipe = MGLDVSRPipeline(tiny_config(ddpm_steps=2))
    h = w = 32
    params = pipe.init_params(jax.random.PRNGKey(0), h, w)
    frames = jnp.asarray(
        np.random.RandomState(1).rand(5, h, w, 3), dtype=jnp.float32
    )

    jit_restore = jax.jit(
        lambda p, f, k: pipe.restore_segment(p, f, k, use_guidance=True)
    )
    out1 = jit_restore(params, frames, jax.random.PRNGKey(2))
    out2 = jit_restore(params, frames, jax.random.PRNGKey(2))
    assert np.allclose(np.asarray(out1), np.asarray(out2))

    out_nog = pipe.restore_segment(
        params, frames, jax.random.PRNGKey(2), use_guidance=False
    )
    assert np.isfinite(np.asarray(out_nog)).all()


def test_upscale_frames():
    frames = jnp.asarray(np.random.RandomState(0).rand(3, 8, 8, 3), jnp.float32)
    up = upscale_frames(frames, 4)
    assert up.shape == (3, 32, 32, 3)
    assert float(up.min()) >= 0.0 and float(up.max()) <= 1.0


def test_window_batched_restore_matches_per_window():
    """b>1 independent windows batched in one restore_segment call must be
    exactly the per-window computation: flows/guidance/temporal modules may
    never mix windows. With temperature=0 the sampler is deterministic, so
    sample_video on concatenated per-window x_T must equal the concat of
    per-window runs."""
    from mgldvsr_tpu.core.diffusion import SamplerConfig, sample_video

    t = 3
    pipe = MGLDVSRPipeline(tiny_config(num_frames=t, ddpm_steps=3))
    h = w = 32
    params = pipe.init_params(jax.random.PRNGKey(0), h, w)
    rs = np.random.RandomState(1)
    win_a = jnp.asarray(rs.rand(t, h, w, 3), jnp.float32)
    win_b = jnp.asarray(rs.rand(t, h, w, 3), jnp.float32)
    both = jnp.concatenate([win_a, win_b], axis=0)

    # 1) flows: batched == per-window, exactly
    (ff2, fb2), (mo2, mb2) = pipe.compute_flows(params, both)
    (ffa, fba), (moa, mba) = pipe.compute_flows(params, win_a)
    (ffb, fbb), (mob, mbb) = pipe.compute_flows(params, win_b)
    np.testing.assert_allclose(np.asarray(ff2),
                               np.concatenate([ffa, ffb]), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fb2),
                               np.concatenate([fba, fbb]), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(mo2),
                                  np.concatenate([moa, mob]))

    # 2) deterministic guided sampling: batched == per-window
    lat_a = jnp.asarray(rs.randn(t, h // 8, w // 8, 4), jnp.float32)
    lat_b = jnp.asarray(rs.randn(t, h // 8, w // 8, 4), jnp.float32)
    xT_a = jnp.asarray(rs.randn(t, h // 8, w // 8, 4), jnp.float32)
    xT_b = jnp.asarray(rs.randn(t, h // 8, w // 8, 4), jnp.float32)
    ctx1 = pipe.embed_empty_prompt(params, t)
    ctx2 = pipe.embed_empty_prompt(params, 2 * t)
    scfg = SamplerConfig(num_frames=t, guidance_scale=-5.0, temperature=0.0)
    key = jax.random.PRNGKey(7)

    out_a = sample_video(
        pipe.sched, pipe.denoise_fn(params, lat_a, ctx1), xT_a, key, scfg,
        (ffa, fba), (moa, mba)).latents
    out_b = sample_video(
        pipe.sched, pipe.denoise_fn(params, lat_b, ctx1), xT_b, key, scfg,
        (ffb, fbb), (mob, mbb)).latents
    out_2 = sample_video(
        pipe.sched,
        pipe.denoise_fn(params, jnp.concatenate([lat_a, lat_b]), ctx2),
        jnp.concatenate([xT_a, xT_b]), key, scfg,
        (ff2, fb2), (mo2, mb2)).latents
    np.testing.assert_allclose(
        np.asarray(out_2), np.concatenate([out_a, out_b]),
        rtol=2e-4, atol=2e-4)

    # 3) the full batched restore runs end-to-end
    out = pipe.restore_segment(params, both, jax.random.PRNGKey(2))
    assert out.shape == (2 * t, h, w, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_decode_chunked_windows_bit_identical():
    """lax.map window-chunked decode (the windows=8 OOM fix) must match
    the full-batch decode: temporal layers never cross num_frames windows,
    so chunking by whole windows only changes XLA's fusion/reassociation
    (observed <4e-6 drift on CPU), never the math."""
    nf = 2
    pipe = MGLDVSRPipeline(tiny_config(num_frames=nf, ddpm_steps=2))
    h = w = 32
    params = pipe.init_params(jax.random.PRNGKey(0), h, w)
    frames = jnp.asarray(
        np.random.RandomState(3).rand(4 * nf, h, w, 3) * 2 - 1,
        dtype=jnp.float32)
    latents, enc_fea = pipe.encode(params, frames, jax.random.PRNGKey(1),
                                   sample_posterior=False)
    full = pipe.decode(params, latents, enc_fea)
    for cw in (1, 2):
        chunked = pipe.decode(params, latents, enc_fea, chunk_windows=cw)
        np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                                   atol=1e-5)
    # non-divisible and oversized chunk sizes fall back to the full batch
    # (same program -> exactly equal)
    np.testing.assert_array_equal(
        np.asarray(pipe.decode(params, latents, enc_fea, chunk_windows=3)),
        np.asarray(full))
    np.testing.assert_array_equal(
        np.asarray(pipe.decode(params, latents, enc_fea, chunk_windows=99)),
        np.asarray(full))
