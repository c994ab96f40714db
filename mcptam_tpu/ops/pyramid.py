"""Image pyramid construction (CVD::halfSample analogue).

The reference builds a LEVELS=4 half-sampled pyramid per camera per frame
(src/KeyFrame.cc:177-193).  Here the whole pyramid is one fused XLA
computation over a batch of camera images: 2x2 box-average downsampling,
float32 in [0,255].
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from mcptam_tpu.config import LEVELS


def _stride2(img: jnp.ndarray, row_off: int, col_off: int) -> jnp.ndarray:
    """Stride-2 corner tap as an explicit ``lax.slice``.

    ``img[..., 0::2, 0::2]`` traces to a *gather* (jnp's take path), and
    once the hoisted index tensors sit behind a ``lax.scan`` boundary XLA
    can no longer pattern-match it back to a strided slice — it materializes
    a transposed copy of the full image and runs 4 serial gathers (~2 ms per
    VGA frame on v5e).  ``lax.slice`` keeps it a real strided slice."""
    nd = img.ndim
    H, W = img.shape[-2], img.shape[-1]
    start = [0] * (nd - 2) + [row_off, col_off]
    limit = list(img.shape[:-2]) + [H, W]
    strides = [1] * (nd - 2) + [2, 2]
    return lax.slice(img, start, limit, strides)


def half_sample(img: jnp.ndarray) -> jnp.ndarray:
    """2x2 average downsample of (...,H,W) -> (...,H//2,W//2)."""
    H, W = img.shape[-2], img.shape[-1]
    img = img[..., : H - H % 2, : W - W % 2]
    a = _stride2(img, 0, 0)
    b = _stride2(img, 0, 1)
    c = _stride2(img, 1, 0)
    d = _stride2(img, 1, 1)
    return (a + b + c + d) * 0.25


def build_pyramid(img_l0: jnp.ndarray, levels: int = LEVELS):
    """Return a tuple of `levels` images, level 0 first.  Works on batched
    (...,H,W) inputs; each level halves the trailing two dims."""
    pyr = [img_l0.astype(jnp.float32)]
    for _ in range(levels - 1):
        pyr.append(half_sample(pyr[-1]))
    return tuple(pyr)


def gaussian_blur_3(img: jnp.ndarray, sigma: float = 2.5, radius: int = 3) -> jnp.ndarray:
    """Separable Gaussian blur on (...,H,W) with reflective-ish edge clamp
    (used by the SmallBlurryImage pipeline, src/SmallBlurryImage.cc:67-95)."""
    import numpy as np

    x = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k /= k.sum()
    k = jnp.asarray(k)

    def conv_last(a):
        pad = [(0, 0)] * (a.ndim - 1) + [(radius, radius)]
        ap = jnp.pad(a, pad, mode="edge")
        out = jnp.zeros_like(a)
        for i in range(2 * radius + 1):
            out = out + k[i] * ap[..., i : i + a.shape[-1]]
        return out

    img = conv_last(img)
    img = jnp.swapaxes(conv_last(jnp.swapaxes(img, -1, -2)), -1, -2)
    return img
