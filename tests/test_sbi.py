"""SmallBlurryImage tests: template construction, ZMSSD, ESM alignment,
SE3-from-SE2 lift."""

import numpy as np
import jax.numpy as jnp

from mcptam_tpu.ops.sbi import (
    make_sbi, sbi_gradients, sbi_zmssd, esm_align, se3_from_se2, ROWS, COLS,
)
from mcptam_tpu.core.camera import make_camera, project, unproject
from mcptam_tpu.core.se3 import so3_ln


def textured_image(rng, H=240, W=320):
    img = rng.uniform(0, 255, (H // 8, W // 8)).astype(np.float32)
    img = np.kron(img, np.ones((8, 8), np.float32))
    from mcptam_tpu.ops.pyramid import gaussian_blur_3
    return np.asarray(gaussian_blur_3(jnp.asarray(img), sigma=2.0, radius=4))


def test_make_sbi_shape_and_zero_mean(rng):
    img = jnp.asarray(textured_image(rng))
    sbi = make_sbi(img)
    assert sbi.shape == (ROWS, COLS)
    assert abs(float(jnp.mean(sbi))) < 2.0  # approx zero-mean (blur edge fx)


def test_sbi_zmssd_identity(rng):
    img = jnp.asarray(textured_image(rng))
    sbi = make_sbi(img)
    assert float(sbi_zmssd(sbi, sbi)) == 0.0
    other = make_sbi(jnp.asarray(textured_image(np.random.default_rng(7))))
    assert float(sbi_zmssd(sbi, other)) > 100.0


def test_esm_align_recovers_translation(rng):
    img = textured_image(rng)
    shift_px_l0 = 16.0  # 2 SBI px at 320->40 (scale 8)
    shifted = np.roll(img, int(shift_px_l0), axis=1)
    cur = make_sbi(jnp.asarray(shifted))
    tgt = make_sbi(jnp.asarray(img))
    gx, gy = sbi_gradients(tgt)
    se2, score = esm_align(cur, tgt, gx, gy, n_iterations=12)
    c, s, tx, ty = [float(v) for v in se2]
    # cur is img shifted right by 2 SBI px; warp cur(x + t) = tgt => t = +2
    assert abs(tx - 2.0) < 0.35, (tx, ty)
    assert abs(ty) < 0.35
    assert abs(s) < 0.05


def test_esm_align_recovers_rotation(rng):
    img = textured_image(rng)
    from scipy.ndimage import rotate
    deg = 6.0
    rot = rotate(img, deg, reshape=False, order=1, mode="nearest")
    cur = make_sbi(jnp.asarray(rot))
    tgt = make_sbi(jnp.asarray(img))
    gx, gy = sbi_gradients(tgt)
    se2, score = esm_align(cur, tgt, gx, gy, n_iterations=12)
    c, s, tx, ty = [float(v) for v in se2]
    theta = np.degrees(np.arctan2(s, c))
    assert abs(abs(theta) - deg) < 1.5, theta


def test_se3_from_se2_pure_rotation(rng):
    params = np.array([95.0, -0.003, 0.0, 0.0, 160.0, 120.0, 1.0, 0.0, 0.0])
    # SBI-sized camera: calib at 320x240, image size 40x30
    cam_sbi = make_camera(params, (320, 240), image_size=(COLS, ROWS))
    # SE2 = small pure rotation in image
    ang = np.radians(4.0)
    se2 = (jnp.cos(ang), jnp.sin(ang), jnp.zeros(()), jnp.zeros(()))
    R = se3_from_se2(se2, cam_sbi, cam_sbi)
    w = np.asarray(so3_ln(R))
    # an in-image-plane rotation about the optical axis -> rotation mostly
    # about z, magnitude ~= ang
    assert abs(abs(w[2]) - ang) < 0.01, w
    assert np.linalg.norm(w[:2]) < 0.01
