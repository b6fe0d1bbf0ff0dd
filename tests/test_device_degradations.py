"""On-device degradation op tests: DiffJPEG vs real cv2 JPEG proximity +
differentiability; filter2D vs cv2; USM; device noise statistics."""
import cv2
import numpy as np
import jax
import jax.numpy as jnp

from mgldvsr_tpu.ops.diffjpeg import diff_jpeg, quality_to_factor
from mgldvsr_tpu.ops.img_process import (
    filter2d,
    random_add_gaussian_noise,
    random_add_poisson_noise,
    usm_sharp,
)


def test_quality_to_factor():
    assert abs(float(quality_to_factor(50.0)) - 1.0) < 1e-6
    assert abs(float(quality_to_factor(25.0)) - 2.0) < 1e-6
    assert abs(float(quality_to_factor(90.0)) - 0.2) < 1e-5


def test_diffjpeg_close_to_cv2_jpeg():
    rs = np.random.RandomState(0)
    # smooth image (JPEG-friendly): low-res upsampled
    small = rs.rand(8, 8, 3).astype(np.float32)
    img = cv2.resize(small, (64, 64), interpolation=cv2.INTER_CUBIC)
    img = np.clip(img, 0, 1)

    q = 75
    ours = np.asarray(diff_jpeg(jnp.asarray(img)[None], q))[0]

    u8 = (img * 255).round().astype(np.uint8)
    _, buf = cv2.imencode(".jpg", u8, [int(cv2.IMWRITE_JPEG_QUALITY), q])
    ref = cv2.imdecode(buf, cv2.IMREAD_UNCHANGED).astype(np.float32) / 255.0

    # differentiable JPEG is an approximation; both should be close to the
    # original and to each other
    assert np.abs(ours - img).mean() < 0.05
    assert np.abs(ours - ref).mean() < 0.05


def test_diffjpeg_differentiable_and_lossy():
    rs = np.random.RandomState(1)
    img = jnp.asarray(rs.rand(1, 32, 32, 3), jnp.float32)

    g = jax.grad(lambda x: jnp.sum(diff_jpeg(x, 50)))(img)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0

    out_low = diff_jpeg(img, 10)
    out_high = diff_jpeg(img, 95)
    err_low = float(jnp.abs(out_low - img).mean())
    err_high = float(jnp.abs(out_high - img).mean())
    assert err_low > err_high  # lower quality = more loss


def test_filter2d_matches_cv2():
    rs = np.random.RandomState(2)
    img = rs.rand(2, 16, 16, 3).astype(np.float32)
    kern = rs.rand(5, 5).astype(np.float32)
    kern /= kern.sum()
    ours = np.asarray(filter2d(jnp.asarray(img), jnp.asarray(kern)))
    for n in range(2):
        ref = cv2.filter2D(img[n], -1, kern, borderType=cv2.BORDER_REFLECT_101)
        assert np.allclose(ours[n], ref, atol=1e-5), np.abs(ours[n] - ref).max()


def test_filter2d_per_sample_kernels():
    rs = np.random.RandomState(3)
    img = rs.rand(2, 12, 12, 3).astype(np.float32)
    k0 = np.zeros((3, 3), np.float32); k0[1, 1] = 1.0  # identity
    k1 = np.full((3, 3), 1 / 9, np.float32)            # box blur
    kern = np.stack([k0, k1])
    out = np.asarray(filter2d(jnp.asarray(img), jnp.asarray(kern)))
    assert np.allclose(out[0], img[0], atol=1e-6)
    ref1 = cv2.filter2D(img[1], -1, k1, borderType=cv2.BORDER_REFLECT_101)
    assert np.allclose(out[1], ref1, atol=1e-5)


def test_usm_sharp():
    img = np.zeros((1, 64, 64, 3), np.float32)
    img[:, :, 32:] = 0.8
    out = np.asarray(usm_sharp(jnp.asarray(img), radius=13))
    assert out.shape == img.shape
    # contrast across the edge must not decrease
    assert (out[0, :, 36] - out[0, :, 28]).mean() >= 0.79


def test_device_noise_statistics():
    img = jnp.full((4, 32, 32, 3), 0.5)
    out = random_add_gaussian_noise(
        jax.random.PRNGKey(0), img, (20, 20), gray_prob=0.0, clip=False
    )
    std = float(jnp.std(out - img))
    assert abs(std - 20 / 255) < 0.005

    # gray noise has identical values across channels
    out_g = random_add_gaussian_noise(
        jax.random.PRNGKey(1), img, (20, 20), gray_prob=1.0, clip=False
    )
    d = np.asarray(out_g - img)
    assert np.allclose(d[..., 0], d[..., 1], atol=1e-6)

    out_p = random_add_poisson_noise(
        jax.random.PRNGKey(2), img, (1.0, 1.0), clip=False
    )
    assert float(jnp.std(out_p - img)) > 0
