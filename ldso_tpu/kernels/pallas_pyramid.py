"""Pallas TPU kernel: fused pyramid level build.

The per-frame pyramid construction (reference: n-lalanne/LDSO
``FrameHessian::makeImages``, src/internal/FrameHessian.cc — per level
an (I, dx, dy) stack, the squared gradient magnitude, and the 2x2
average for the next level) is the first hot op every frame touches.
The XLA version (kernels/pyramid.py) emits one fused elementwise
program per level but still materializes the shifted copies; this
Pallas kernel computes ALL per-level outputs — dx, dy, absSquaredGrad,
and the next level — in ONE pass over the level image held in VMEM:
each input pixel is read exactly once from HBM (speed-of-light for a
bandwidth-bound stencil).

Outputs are separate [H, W] planes (not an [H, W, 3] stack) so every
buffer keeps the native (8, 128)-tiled f32 layout; the caller stacks
for the sampling code, which wants (I, dx, dy) interleaved.

Falls back to interpret mode off-TPU, so the same code path is what CI
tests on the CPU mesh.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _level_kernel(img_ref, dx_ref, dy_ref, gsq_ref, next_ref):
    img = img_ref[:]
    # central differences, borders clamped (matches kernels/pyramid.py)
    right = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
    left = jnp.concatenate([img[:, :1], img[:, :-1]], axis=1)
    down = jnp.concatenate([img[1:], img[-1:]], axis=0)
    up = jnp.concatenate([img[:1], img[:-1]], axis=0)
    dx = 0.5 * (right - left)
    dy = 0.5 * (down - up)
    dx_ref[:] = dx
    dy_ref[:] = dy
    gsq_ref[:] = dx * dx + dy * dy
    # 2x2 average as two MXU matmuls with {0,1} pooling matrices —
    # Mosaic supports neither 4D vector reshapes nor strided gathers,
    # and the MXU does this essentially for free next to the VPU work.
    h, w = img.shape

    def pool_mat(n):
        r = jax.lax.broadcasted_iota(jnp.int32, (n, n // 2), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (n, n // 2), 1)
        return jnp.where(r // 2 == c, 1.0, 0.0).astype(jnp.float32)

    # HIGHEST precision: a bf16 MXU pass would quantize the pooled
    # intensities and the error compounds over 6 levels
    pooled_w = jnp.dot(img, pool_mat(w), preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    next_ref[:] = 0.25 * jnp.dot(pool_mat(h).T, pooled_w,
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _level(img, interpret: bool):
    h, w = img.shape
    f32 = jnp.float32
    return pl.pallas_call(
        _level_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((h, w), f32),            # dx
            jax.ShapeDtypeStruct((h, w), f32),            # dy
            jax.ShapeDtypeStruct((h, w), f32),            # absSquaredGrad
            jax.ShapeDtypeStruct((h // 2, w // 2), f32),  # next level
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in range(4)),
        interpret=interpret,
    )(img)


def build_pyramid_pallas(img, levels: int, interpret: bool | None = None
                         ) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
    """Same contract as kernels/pyramid.build_pyramid:
    returns ([L x (H_l, W_l, 3) stacks], [L x (H_l, W_l) grad-sq])."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    img = jnp.asarray(img, jnp.float32)
    pyr, gsq = [], []
    cur = img
    for l in range(levels):
        dx, dy, g, nxt = _level(cur, interpret)
        pyr.append(jnp.stack([cur, dx, dy], axis=-1))
        gsq.append(g)
        cur = nxt
    return pyr, gsq
