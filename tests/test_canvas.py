"""Canvas tiling tests: offsets/weights semantics, tiled denoise_fn
consistency, pixel spliter round trip, and an end-to-end canvas restore."""
import numpy as np
import jax
import jax.numpy as jnp

from tests.test_pipeline import tiny_config
from mgldvsr_tpu.infer.canvas import (
    ImageSpliter,
    gaussian_tile_weights,
    make_tiled_denoise_fn,
    tile_offsets,
)
from mgldvsr_tpu.infer.pipeline import MGLDVSRPipeline


def test_tile_offsets_reference_walk():
    # size 64, tile 64 -> single tile
    assert tile_offsets(64, 64, 32) == [0]
    # size 96, tile 64, overlap 32 (stride 32): rows at 0 and clamped 32
    assert tile_offsets(96, 64, 32) == [0, 32]
    # size 128: 0, 32, clamped 64
    assert tile_offsets(128, 64, 32) == [0, 32, 64]
    # smaller than tile: single
    assert tile_offsets(48, 64, 32) == [0]


def test_gaussian_weights_properties():
    w = gaussian_tile_weights(64, 64)
    assert w.shape == (64, 64)
    assert w.min() > 0
    # peak near center, low at corners
    assert w[32, 31] > 5 * w[0, 0]


def test_tiled_denoise_equals_direct_for_constant_fn():
    """If the per-tile eps prediction equals a deterministic function of the
    tile content, stitching a CONSTANT field must reproduce it exactly."""
    t, H, W, C = 2, 8, 8, 4
    struct = jnp.zeros((t, H, W, C))
    ctx = jnp.zeros((t, 3, 8))

    def structcond_apply(s, tt):
        return s

    def unet_apply(x, tt, c, sc):
        return 2.0 * x  # linear in the tile content

    fn = make_tiled_denoise_fn(structcond_apply, unet_apply, struct, ctx,
                               tile=4, overlap=2, batch_tiles=3)
    x = jnp.ones((t, H, W, C)) * 0.5
    out = fn(x, jnp.zeros((t,), jnp.int32))
    # constant input -> every tile predicts the same constant -> stitched
    # output is that constant everywhere
    assert np.allclose(np.asarray(out), 1.0, atol=1e-5)


def test_tiled_denoise_covers_whole_canvas():
    t, H, W, C = 1, 12, 8, 2
    struct = jnp.zeros((t, H, W, C))
    ctx = jnp.zeros((t, 3, 4))
    fn = make_tiled_denoise_fn(lambda s, tt: s, lambda x, tt, c, sc: x + 1.0,
                               struct, ctx, tile=4, overlap=2)
    out = fn(jnp.zeros((t, H, W, C)), jnp.zeros((t,), jnp.int32))
    assert np.isfinite(np.asarray(out)).all()
    assert np.allclose(np.asarray(out), 1.0, atol=1e-5)


def test_image_spliter_round_trip():
    frames = np.random.RandomState(0).rand(2, 100, 70, 3).astype(np.float32)
    sp = ImageSpliter(frames.shape, pch_size=64, stride=48)
    patches = [np.asarray(p) for p, _ in sp.split(jnp.asarray(frames))]
    assert all(p.shape == (2, 64, 64, 3) for p in patches)
    rec = sp.gather(patches)
    assert np.allclose(rec, frames, atol=1e-6)


def test_canvas_restore_end_to_end_tiny():
    pipe = MGLDVSRPipeline(tiny_config(ddpm_steps=2))
    h, w = 32, 64  # latent 4x8 -> tiled with tile=4
    params = pipe.init_params(jax.random.PRNGKey(0), 32, 32)
    frames = jnp.asarray(
        np.random.RandomState(0).rand(5, h, w, 3), jnp.float32
    )
    out = pipe.restore_segment_canvas(
        params, frames, jax.random.PRNGKey(1), tile=4, tile_overlap=2,
        batch_tiles=4,
    )
    o = np.asarray(out)
    assert o.shape == (5, h, w, 3)
    assert np.isfinite(o).all()


def test_restore_video_full_protocol_awkward_size():
    """The oldcanvas_tile protocol end-to-end on a non-multiple-of-32,
    pre-upscale-requiring input: bicubic min-side upscale -> reflect /32
    pad -> full-frame flows -> pixel split (flows split at /8) -> canvas
    restore per patch -> gather -> downscale of the PADDED frame -> no-op
    pad crop. Expected shape follows the reference's exact arithmetic
    (oldcanvas_tile.py:523-535): 13x11 @ sf=4, min_side=64 ->
    upsample 64/11, work 75x64, padded 96x64, downscaled int(96*4/up)=66 x
    int(64*4/up)=44; the flag_pad crop [:75,:64] is a no-op at that size
    (the reference quirk keeps a scaled pad remnant in the output)."""
    pipe = MGLDVSRPipeline(tiny_config(ddpm_steps=2))
    t = pipe.cfg.num_frames
    frames = jnp.asarray(np.random.RandomState(0).rand(t, 13, 11, 3),
                         jnp.float32)
    out = pipe.restore_video(
        pipe.init_params(jax.random.PRNGKey(0), 64, 64),
        frames, jax.random.PRNGKey(1),
        pch_size=64, pch_stride=48, min_side=64,
    )
    assert out.shape == (t, 66, 44, 3)
    assert np.isfinite(out).all()
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_restore_video_auto_geometry_matches_explicit():
    """pch_size<=0 resolves to the measured-optimal grid: one canvas tile
    per patch (8*tile px) with stride 7/8 of it IN LATENT UNITS scaled
    back up (ADVICE r4: a non-/8-aligned pixel stride — e.g. the naive
    32*7//8=28 at tile=4 — desyncs the pixel patch grid from its /8 flow
    spliter by up to 7 px). tile=4 -> pch 32, stride 8*max(28//8,1)=24 —
    bit-identical to passing those values explicitly. At the production
    tile=64 both formulas give 512/448."""
    pipe = MGLDVSRPipeline(tiny_config(ddpm_steps=2))
    t = pipe.cfg.num_frames
    frames = jnp.asarray(np.random.RandomState(1).rand(t, 13, 11, 3),
                         jnp.float32)
    params = pipe.init_params(jax.random.PRNGKey(0), 64, 64)
    kw = dict(min_side=64, tile=4, tile_overlap=2)
    auto = pipe.restore_video(params, frames, jax.random.PRNGKey(1),
                              pch_size=0, pch_stride=0, **kw)
    explicit = pipe.restore_video(params, frames, jax.random.PRNGKey(1),
                                  pch_size=32, pch_stride=24, **kw)
    np.testing.assert_array_equal(np.asarray(auto), np.asarray(explicit))
    # a stale explicit stride >= an AUTO-resolved patch size auto-resolves
    # too (ADVICE r4 medium: --vqgantile-size 0 with the reference's 750
    # stride default must not silently become a zero-overlap grid)
    stale = pipe.restore_video(params, frames, jax.random.PRNGKey(1),
                               pch_size=0, pch_stride=750, **kw)
    np.testing.assert_array_equal(np.asarray(stale), np.asarray(auto))
