"""Image pyramid + gradient construction.

TPU-native equivalent of ``FrameHessian::makeImages`` (reference:
n-lalanne/LDSO src/internal/FrameHessian.cc): per pyramid level an
(I, dx, dy) stack and the squared gradient magnitude used by pixel
selection. Levels are built by 2x2 averaging (as the reference does),
gradients by central differences.

Shapes are static per level; the whole build is one fused XLA program
per frame (avg-pool + shifts — bandwidth-bound, which is the natural
limit for this op).
"""

from __future__ import annotations

import os
from typing import List, Tuple

import jax
import jax.numpy as jnp


def level_shapes(w: int, h: int, levels: int) -> List[Tuple[int, int]]:
    """Per-level (w, h); requires divisibility so all levels are exact
    (reference: setGlobalCalib masks wG/hG to multiples of 2^levels)."""
    shapes = []
    for l in range(levels):
        assert w % (1 << l) == 0 and h % (1 << l) == 0, (
            f"image {w}x{h} not divisible at level {l}; crop to a multiple of "
            f"{1 << (levels - 1)}"
        )
        shapes.append((w >> l, h >> l))
    return shapes


def crop_to_multiple(img, levels: int):
    """Crop bottom/right so both dims divide by 2^(levels-1)."""
    m = 1 << (levels - 1)
    h, w = img.shape[-2], img.shape[-1]
    return img[..., : (h // m) * m, : (w // m) * m]


def _downsample2(img):
    """2x2 average pooling, [H, W] -> [H/2, W/2]."""
    h, w = img.shape
    return img.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))


def _gradients(img):
    """Central differences with clamped borders: [H, W] -> dx, dy."""
    right = jnp.roll(img, -1, axis=1).at[:, -1].set(img[:, -1])
    left = jnp.roll(img, 1, axis=1).at[:, 0].set(img[:, 0])
    down = jnp.roll(img, -1, axis=0).at[-1, :].set(img[-1, :])
    up = jnp.roll(img, 1, axis=0).at[0, :].set(img[0, :])
    dx = 0.5 * (right - left)
    dy = 0.5 * (down - up)
    return dx, dy


def build_pyramid_xla(img, levels: int):
    """Pure-XLA pyramid build (the portable fallback path)."""
    pyr = []
    gsq = []
    cur = jnp.asarray(img).astype(jnp.float32)  # uint8 frames widen on-device
    for l in range(levels):
        dx, dy = _gradients(cur)
        pyr.append(jnp.stack([cur, dx, dy], axis=-1))
        gsq.append(dx * dx + dy * dy)
        if l + 1 < levels:
            cur = _downsample2(cur)
    return pyr, gsq


def build_pyramid(img, levels: int, use_pallas: bool | None = None):
    """img [H, W] f32 -> (pyramid, grad_sq):
      pyramid: list of [H_l, W_l, 3] (I, dx, dy) stacks, finest first
      grad_sq: list of [H_l, W_l] squared gradient magnitude (absSquaredGrad)

    On TPU the fused Pallas stencil kernel is the default
    (kernels/pallas_pyramid.py — one HBM read per input pixel, all four
    per-level outputs in one pass): 0.047 ms vs 0.226 ms for the
    fused-XLA build at 640x480 on v5e (scripts/bench_kernels.py
    pyramid_pallas/pyramid_xla, round-3 roofline run — 20% vs 4% of the
    HBM-IO roofline). ``LDSO_PALLAS_PYRAMID=0`` forces the portable XLA
    path. Both are numerically equivalent
    (tests/test_frontend.py pallas equivalence).
    """
    if use_pallas is None:
        env = os.environ.get("LDSO_PALLAS_PYRAMID")
        use_pallas = (jax.default_backend() == "tpu"
                      and (env is None or env not in ("0", "off", "false")))
    if use_pallas:
        from ldso_tpu.kernels.pallas_pyramid import build_pyramid_pallas

        return build_pyramid_pallas(img, levels, interpret=False)
    return build_pyramid_xla(img, levels)


def build_pyramid_jit(levels: int):
    """Return a jitted pyramid builder for a fixed level count."""
    return jax.jit(lambda img: build_pyramid(img, levels))
