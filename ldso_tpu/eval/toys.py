"""Toy problem builders: ready-made windows/states for benchmarks,
entry-point compile checks, and multi-chip dry runs.

These wrap the synthetic scene renderer (io/synthetic.py) into the exact
device pytrees the engine consumes, with ground truth attached.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ldso_tpu.config import LdsoConfig
from ldso_tpu.core import window as W
from ldso_tpu.io.synthetic import SyntheticDataset
from ldso_tpu.kernels import interp, pyramid


def make_synthetic_window(
    cfg: LdsoConfig,
    w: int = 256,
    h: int = 192,
    n_frames: int = 3,
    n_points: int | None = None,
    idepth_noise: float = 0.02,
    pose_noise: float = 0.002,
    seed: int = 0,
) -> Tuple[W.Window, SyntheticDataset]:
    """A BA-ready window: n_frames keyframes along a synthetic trajectory,
    points hosted in frame 0 at textured pixels with (noisy) GT inverse
    depth. Capacities come from cfg.shapes (padding beyond n_points)."""
    from ldso_tpu.math import lie

    rng = np.random.default_rng(seed)
    n_points = n_points or cfg.shapes.max_points
    n_points = min(n_points, cfg.shapes.max_points)
    ds = SyntheticDataset(w=w, h=h, n=max(n_frames, 2), seed=seed)
    intr = ds.intrinsics()
    win = W.empty_window(cfg, h, w, intr)
    for i in range(n_frames):
        img, ts, exp = ds.get_image(i)
        pyr, _ = pyramid.build_pyramid(jnp.asarray(img), 1)
        T = ds.gt_pose_c_w(i)
        if pose_noise > 0 and i > 0:
            T = np.asarray(lie.se3_exp(jnp.asarray(rng.normal(size=6) * pose_noise)),
                           np.float64) @ T
        win = W.insert_frame(win, i, jnp.asarray(T, jnp.float32), pyr[0], exp)

    idep0 = ds.get_idepth(0)
    img0 = np.asarray(win.images[0][..., 0])
    gx = np.asarray(win.images[0][..., 1])
    gy = np.asarray(win.images[0][..., 2])
    gsq = gx ** 2 + gy ** 2
    ok = idep0 > 1e-3
    ok[:10, :] = ok[-10:, :] = False
    ok[:, :10] = ok[:, -10:] = False
    cand = np.argwhere(ok & (gsq > np.percentile(gsq, 60)))
    sel = cand[rng.choice(len(cand), size=n_points, replace=False)]
    uv = np.stack([sel[:, 1], sel[:, 0]], axis=-1).astype(np.float32)

    pat = np.asarray(W.PATTERN_OFFSETS)
    uvp = uv[:, None, :] + pat[None]
    color = np.asarray(interp.bilinear(jnp.asarray(img0), jnp.asarray(uvp)))
    gsq_p = np.asarray(interp.bilinear(jnp.asarray(gsq.astype(np.float32)),
                                       jnp.asarray(uvp)))
    c2 = cfg.ba.outlier_th_sum_component
    weight = np.sqrt(c2 / (c2 + gsq_p)).astype(np.float32)
    idep = idep0[sel[:, 0], sel[:, 1]]
    if idepth_noise > 0:
        idep = idep * (1.0 + rng.normal(size=idep.shape) * idepth_noise)
    win = W.add_points(win, np.arange(n_points), 0, uv, color, weight,
                       idep.astype(np.float32))
    return win, ds
