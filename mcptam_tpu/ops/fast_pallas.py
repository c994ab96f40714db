"""Fused Pallas FAST-10 front-end: score + nonmax + threshold histogram.

The pure-JAX formulation in ops/fast.py materializes the 16 ring-shifted
copies of every pyramid level as full (C,H,W,16) HBM tensors and compares
every pixel against all 56 candidate thresholds as a (C,56,H*W) broadcast.
XLA does not fuse those chains: the compiled 4-cam VGA front-end touches
**13.2 GB of HBM per frame** (cost-analysis), i.e. ~16 ms on one chip —
the reference's whole CPU budget (libCVD's SSE FAST runs over each image
once, src/KeyFrame.cc:259-342).

This kernel restores the read-once structure on TPU: each grid step DMAs
one (TR+16, W) row tile (3-px ring halo + 1-px nonmax halo + alignment
slack) into VMEM and computes, entirely in registers/VMEM:

  * the FAST-10 max-threshold score (same max/min-arc composition as
    ops/fast.py::fast_score_image);
  * the 3x3 strict nonmax-suppressed score (ops/fast.py::nonmax_3x3
    tie-break semantics: earlier raster pixel wins);
  * the per-tile cumulative threshold histogram freq[t] = #(score > t)
    for t = 0..NBINS-1 — the input to the adaptive-threshold knee
    search (src/KeyFrame.cc:247-316) — so the (C,56,H*W) broadcast
    disappears.

HBM traffic per level: read the image once (plus tile halo), write the
two score images, write (tiles, 64) counts — ~3 passes instead of ~50.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcptam_tpu.ops.fast import RING_OFFSETS, BORDER

NBINS = 64  # freq[t] for t in [0, 64): covers the 5..60 adaptive range
_HALO = 16  # rows of halo + alignment slack per tile (>= 8 + 3 + 1)


def _score_rows(x, TR2: int):
    """FAST-10 scores for TR2 rows of a (TR2+14, W) VMEM tile.

    Row r of the result corresponds to tile row r + 7.  Column wrap from
    the rolls is garbage; callers mask the 3-px image border.
    """
    c = x[7 : 7 + TR2, :]

    def ring(dy, dx):
        rolled = jnp.roll(x, -dx, axis=1) if dx else x
        return rolled[7 + dy : 7 + dy + TR2, :]

    d = [ring(dy, dx) - c for (dy, dx) in RING_OFFSETS]

    def window10_max(vals):
        # max over the 16 arcs of (min over 10 contiguous ring entries)
        m2 = [jnp.minimum(vals[i], vals[(i + 1) % 16]) for i in range(16)]
        m4 = [jnp.minimum(m2[i], m2[(i + 2) % 16]) for i in range(16)]
        best = None
        for i in range(16):
            m8 = jnp.minimum(m4[i], m4[(i + 4) % 16])
            w10 = jnp.minimum(m8, m2[(i + 8) % 16])
            best = w10 if best is None else jnp.maximum(best, w10)
        return best

    bright = window10_max(d)
    dark = window10_max([-v for v in d])
    return jnp.maximum(jnp.maximum(bright, dark), 0.0)


def _fast_kernel(img_ref, score_ref, nm_ref, freq_ref, scratch, sem,
                 *, TR: int, W: int, Wp: int, H: int):
    c = pl.program_id(0)
    i = pl.program_id(1)
    TR16 = TR + _HALO

    cp = pltpu.make_async_copy(
        img_ref.at[c, pl.ds(i * TR, TR16), :], scratch, sem
    )
    cp.start()
    cp.wait()
    x = scratch[...]

    TR2 = TR + 2  # scores for rows -1 .. TR (nonmax halo)
    s_ext = _score_rows(x, TR2)

    # border + out-of-image mask (global coords; padded rows/cols masked off)
    gy = (i * TR - 1) + jax.lax.broadcasted_iota(jnp.int32, (TR2, Wp), 0)
    gx = jax.lax.broadcasted_iota(jnp.int32, (TR2, Wp), 1)
    inb = (
        (gy >= BORDER) & (gy < H - BORDER)
        & (gx >= BORDER) & (gx < W - BORDER)
    )
    s_ext = jnp.where(inb, s_ext, 0.0)
    score = s_ext[1 : 1 + TR, :]

    # 3x3 strict nonmax, earlier raster pixel wins ties
    keep = None
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            nb = jnp.roll(s_ext, -dx, axis=1) if dx else s_ext
            nb = nb[1 + dy : 1 + dy + TR, :]
            k = score > nb if (dy < 0 or (dy == 0 and dx < 0)) else score >= nb
            keep = k if keep is None else keep & k
    nm = jnp.where(keep, score, 0.0)

    score_ref[0] = score
    nm_ref[0] = nm

    # cumulative histograms over this tile's in-image rows: row 0 lane t =
    # #(score > t - eps), row 1 lane t = #(nm > t - eps) (the latter feeds
    # the sort-free candidate-cutoff selection).  The last tile's padded
    # rows score 0 and would otherwise inflate bin 0.  Emitted in an
    # (8,128) tile — the smallest legal f32 VMEM block.
    inimg = (
        (i * TR + jax.lax.broadcasted_iota(jnp.int32, (TR, Wp), 0) < H)
        & (jax.lax.broadcasted_iota(jnp.int32, (TR, Wp), 1) < W)
    ).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    acc = jnp.zeros((8, 128), jnp.float32)
    for t in range(NBINS):
        cnt = jnp.sum(inimg * (score > (t - 1e-6)).astype(jnp.float32))
        cnt_nm = jnp.sum(inimg * (nm > (t - 1e-6)).astype(jnp.float32))
        acc = acc + jnp.where((row == 0) & (lane == t), cnt, 0.0) \
                  + jnp.where((row == 1) & (lane == t), cnt_nm, 0.0)
    freq_ref[0, 0] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def fast_frontend(img: jnp.ndarray, interpret: bool = False):
    """(C,H,W) f32 image -> (score (C,H,W), nm (C,H,W), freq (C,NBINS),
    freq_nm (C,NBINS)).

    score/nm match ops/fast.py::fast_score_image / nonmax_3x3(score);
    freq[c, t] counts pixels with score > t (the adaptive-threshold
    histogram) and freq_nm[c, t] the same over the nonmax-suppressed
    scores (the candidate-cutoff histogram).  One fused read-once pass
    per row tile.
    """
    C, H, W = img.shape
    TR = min(48, max(8, ((H + 7) // 8) * 8))
    nH = -(-H // TR)
    Hp = nH * TR + _HALO
    Wp = -(-W // 128) * 128  # lane-tile alignment for the row-tile DMA
    # shift the image down 8 rows (alignment) => tile i reads padded rows
    # [i*TR, i*TR + TR + 16) and its row r maps to image row i*TR + r - 8
    padded = jnp.zeros((C, Hp, Wp), img.dtype)
    padded = jax.lax.dynamic_update_slice(padded, img, (0, 8, 0))

    kernel = functools.partial(_fast_kernel, TR=TR, W=W, Wp=Wp, H=H)
    score, nm, freq = pl.pallas_call(
        kernel,
        grid=(C, nH),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, TR, Wp), lambda c, i: (c, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TR, Wp), lambda c, i: (c, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, 128), lambda c, i: (c, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, nH * TR, Wp), jnp.float32),
            jax.ShapeDtypeStruct((C, nH * TR, Wp), jnp.float32),
            jax.ShapeDtypeStruct((C, nH, 8, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TR + _HALO, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(padded)
    return (score[:, :H, :W], nm[:, :H, :W],
            jnp.sum(freq[:, :, 0, :NBINS], axis=1),
            jnp.sum(freq[:, :, 1, :NBINS], axis=1))


def fast_frontend_reference(img: jnp.ndarray):
    """Pure-JAX reference with identical outputs (used on CPU and as the
    golden value in kernel tests)."""
    from mcptam_tpu.ops.fast import fast_score_image, nonmax_3x3

    score = fast_score_image(img)
    nm = nonmax_3x3(score)
    ts = jnp.arange(NBINS, dtype=score.dtype)

    def cumfreq(x):
        flat = x.reshape(x.shape[0], -1)
        return jnp.sum(
            flat[:, None, :] > ts[None, :, None] - 1e-6, axis=-1
        ).astype(jnp.float32)

    return score, nm, cumfreq(score), cumfreq(nm)


def fast_frontend_auto(img: jnp.ndarray):
    """Kernel on TPU, reference elsewhere (tests run on a CPU mesh).

    Dispatch goes through the shared :func:`mcptam_tpu.backend.use_pallas`
    predicate (honors ``jax.default_device`` and ``MCPTAM_NO_PALLAS``)."""
    from mcptam_tpu.backend import use_pallas
    if use_pallas():
        return fast_frontend(img)
    return fast_frontend_reference(img)
