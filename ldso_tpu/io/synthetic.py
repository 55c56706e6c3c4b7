"""Synthetic textured scenes with exact ground truth.

The reference has no tests (SURVEY.md §4); its de-facto strategy is
trajectory quality on real datasets. This module supplies what the
reference lacks and what CI here is built on: analytically rendered
multi-plane scenes with known camera trajectories, exact inverse-depth
maps, and optional photometric perturbations (response / vignette /
exposure), so every stage — tracker, initializer, tracer, BA, loop — can
be tested against ground truth without any dataset on disk.

World frame: standard CV camera at identity has x right, y down,
z forward. The scene is a "corridor": ground plane below, two side
walls, a backdrop — all value-noise textured.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# Value-noise textures
# ---------------------------------------------------------------------------


def _resize_bilinear(a: np.ndarray, size: int) -> np.ndarray:
    n = a.shape[0]
    x = np.linspace(0, n - 1, size)
    x0 = np.floor(x).astype(int)
    x1 = np.minimum(x0 + 1, n - 1)
    fx = x - x0
    rows = a[x0][:, x0] * ((1 - fx)[:, None] * (1 - fx)[None, :])
    rows += a[x1][:, x0] * (fx[:, None] * (1 - fx)[None, :])
    rows += a[x0][:, x1] * ((1 - fx)[:, None] * fx[None, :])
    rows += a[x1][:, x1] * (fx[:, None] * fx[None, :])
    return rows


def value_noise_texture(rng: np.random.Generator, size: int = 512, octaves: int = 5) -> np.ndarray:
    """Smooth multi-octave noise in [~20, ~235] — rich, trackable gradients.

    A final box blur removes the C1 kinks of bilinear texel interpolation:
    direct photometric methods assume optically blurred (locally smooth)
    image formation, and the analytic gradient channels are only a valid
    local model on such images."""
    tex = np.zeros((size, size))
    amp = 1.0
    total = 0.0
    for o in range(octaves):
        n = 8 << o
        tex += amp * _resize_bilinear(rng.standard_normal((n, n)), size)
        total += amp
        amp *= 0.55
    tex /= total
    for _ in range(2):
        tex = 0.25 * tex + 0.125 * (
            np.roll(tex, 1, 0) + np.roll(tex, -1, 0) + np.roll(tex, 1, 1) + np.roll(tex, -1, 1)
        ) + 0.0625 * (
            np.roll(np.roll(tex, 1, 0), 1, 1) + np.roll(np.roll(tex, 1, 0), -1, 1)
            + np.roll(np.roll(tex, -1, 0), 1, 1) + np.roll(np.roll(tex, -1, 0), -1, 1)
        )
    tex = (tex - tex.min()) / (tex.max() - tex.min())
    return (20.0 + 215.0 * tex).astype(np.float32)


def _sample_wrap(tex: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    t = tex.shape[0]
    u0 = np.floor(u).astype(int)
    v0 = np.floor(v).astype(int)
    fu = u - u0
    fv = v - v0
    u0 %= t
    v0 %= t
    u1 = (u0 + 1) % t
    v1 = (v0 + 1) % t
    return (
        tex[v0, u0] * (1 - fu) * (1 - fv)
        + tex[v0, u1] * fu * (1 - fv)
        + tex[v1, u0] * (1 - fu) * fv
        + tex[v1, u1] * fu * fv
    )


# ---------------------------------------------------------------------------
# Scene = a set of textured planes
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class Plane:
    normal: np.ndarray        # [3], unit, points toward visible side
    offset: float             # plane: normal·X = offset
    e1: np.ndarray            # [3] texture axis 1 (world units per texel via scale)
    e2: np.ndarray            # [3] texture axis 2
    tex: np.ndarray           # [T, T] f32
    tex_scale: float = 0.02   # world units per texel


@dataclasses.dataclass
class SyntheticScene:
    planes: List[Plane]

    def render(self, T_wc: np.ndarray, intr, w: int, h: int, supersample: int = 2):
        """Render from camera-to-world pose T_wc; returns (img [H,W] f32,
        idepth [H,W] f32) — idepth is exact inverse depth in camera frame.

        supersample > 1 renders at higher resolution and box-filters down
        (models sensor integration; without it texture aliasing puts a
        multi-grey-level noise floor under every photometric residual)."""
        if supersample > 1:
            s = supersample
            fx, fy, cx, cy = (float(x) for x in intr)
            intr_ss = (fx * s, fy * s, (cx + 0.5) * s - 0.5, (cy + 0.5) * s - 0.5)
            img_ss, idep_ss = self.render(T_wc, intr_ss, w * s, h * s, supersample=1)
            img = img_ss.reshape(h, s, w, s).mean(axis=(1, 3))
            # inverse depth of the pixel center (exact, not averaged)
            idep = idep_ss[s // 2 :: s, s // 2 :: s] if s % 2 == 1 else None
            if idep is None:
                # even supersample: recompute exact center depths at native res
                _, idep = self.render(T_wc, intr, w, h, supersample=1)
            return img.astype(np.float32), idep
        fx, fy, cx, cy = (float(x) for x in intr)
        u, v = np.meshgrid(np.arange(w, dtype=np.float64), np.arange(h, dtype=np.float64))
        dirs_c = np.stack([(u - cx) / fx, (v - cy) / fy, np.ones_like(u)], axis=-1)  # [H,W,3]
        R = T_wc[:3, :3]
        o = T_wc[:3, 3]
        dirs_w = dirs_c @ R.T

        best_t = np.full((h, w), np.inf)
        img = np.zeros((h, w), dtype=np.float32)
        for p in self.planes:
            denom = dirs_w @ p.normal
            t = (p.offset - o @ p.normal) / np.where(np.abs(denom) < 1e-12, 1e-12, denom)
            hit = (t > 0.05) & (t < best_t)
            X = o[None, None, :] + t[..., None] * dirs_w
            tu = (X @ p.e1) / p.tex_scale
            tv = (X @ p.e2) / p.tex_scale
            col = _sample_wrap(p.tex, tu, tv).astype(np.float32)
            img = np.where(hit, col, img)
            best_t = np.where(hit, t, best_t)
        # camera-frame depth = t * (z-component of dir in camera frame) = t * 1
        idepth = np.where(np.isfinite(best_t), 1.0 / best_t, 0.0).astype(np.float32)
        return img, idepth


def make_scene(seed: int = 0, kind: str = "corridor") -> SyntheticScene:
    rng = np.random.default_rng(seed)
    ex = np.array([1.0, 0, 0])
    ey = np.array([0, 1.0, 0])
    ez = np.array([0, 0, 1.0])
    if kind == "corridor":
        planes = [
            Plane(-ey, -1.5, ex, ez, value_noise_texture(rng)),        # ground y=+1.5
            Plane(ex, -3.0, ey, ez, value_noise_texture(rng)),         # left wall x=-3
            Plane(-ex, -3.0, ey, ez, value_noise_texture(rng)),        # right wall x=+3
            Plane(-ez, -20.0, ex, ey, value_noise_texture(rng), 0.05), # backdrop z=20
        ]
    elif kind == "wall":
        planes = [Plane(-ez, -3.0, ex, ey, value_noise_texture(rng))]  # single wall z=3
    elif kind == "low_texture":
        # adversarial (VERDICT r3 #9): a LOW-CONTRAST span on both walls
        # and the floor for z ∈ [4, 8] — the gradient-starved stretch the
        # reference fails on (selection density collapses, tracking must
        # survive on the remaining texture). Wall texture coords: e2=ez,
        # tex_scale=0.02 → z∈[4,8] ≈ texel columns 200..400 of 512.
        def flatten_span(tex):
            t = tex.copy()
            t[:, 200:400] = 128.0 + 0.06 * (t[:, 200:400] - 128.0)
            return t

        planes = [
            Plane(-ey, -1.5, ex, ez, flatten_span(value_noise_texture(rng))),
            Plane(ex, -3.0, ey, ez, flatten_span(value_noise_texture(rng))),
            Plane(-ex, -3.0, ey, ez, flatten_span(value_noise_texture(rng))),
            Plane(-ez, -20.0, ex, ey, value_noise_texture(rng), 0.05),
        ]
    elif kind == "aliased":
        # adversarial (VERDICT r3 #9): PERCEPTUAL ALIASING — both walls
        # tile the SAME small texture patch with a short period (~1.3
        # world units), so distinct places along the corridor look
        # identical (repeating facade); loop gates must reject the
        # aliased matches (reference failure mode: DetectLoop on
        # repeated structures, LoopClosing.cc:~L90)
        tile = value_noise_texture(rng, size=64, octaves=4)
        tex = np.tile(tile, (8, 8))
        planes = [
            Plane(-ey, -1.5, ex, ez, value_noise_texture(rng)),
            Plane(ex, -3.0, ey, ez, tex.copy()),
            Plane(-ex, -3.0, ey, ez, tex.copy()),
            Plane(-ez, -20.0, ex, ey, value_noise_texture(rng), 0.05),
        ]
    else:
        raise ValueError(kind)
    return SyntheticScene(planes)


# ---------------------------------------------------------------------------
# Trajectories (camera-to-world)
# ---------------------------------------------------------------------------


def _np_so3_exp(w: np.ndarray) -> np.ndarray:
    """Rodrigues in pure numpy (keeps the data generator off the device —
    eager device ops cost a remote compile each on the TPU tunnel)."""
    th = np.linalg.norm(w)
    if th < 1e-12:
        return np.eye(3)
    k = w / th
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


def trajectory(n: int, kind: str = "forward_arc", step: float = 0.06) -> np.ndarray:
    """[N, 4, 4] camera-to-world poses."""
    Ts = []
    for i in range(n):
        s = i * step
        if kind == "forward_arc":
            t = np.array([0.35 * np.sin(0.25 * s * 2 * np.pi / 3), 0.1 * np.sin(0.15 * i), s])
            yaw = 0.04 * np.sin(0.1 * i)
            pitch = 0.02 * np.sin(0.13 * i + 1.0)
            xi = np.concatenate([np.zeros(3), [pitch, yaw, 0.0]])
            R = _np_so3_exp(xi[3:])
        elif kind == "lateral":
            t = np.array([s, 0.0, 0.02 * i])
            R = np.eye(3)
        elif kind == "loop":  # closes back near the start (for loop-closure tests)
            th = 2 * np.pi * i / n
            rad = 2.0
            t = np.array([rad * np.sin(th), 0.0, rad * (1 - np.cos(th))])
            R = _np_so3_exp(np.array([0.0, th, 0.0]))
        elif kind == "out_and_back":
            # drive forward for half the frames, then return along the same
            # path facing the SAME direction (revisits earlier views — the
            # cheapest trackable loop-closure scenario)
            half = n // 2
            z = i * step if i < half else (2 * half - 1 - i) * step
            t = np.array([0.15 * np.sin(0.2 * z * np.pi), 0.0, z])
            R = np.eye(3)
        elif kind == "multi_pass":
            # triangle-wave z: out, back, out again — the corridor is
            # revisited TWICE, so a correct loop detector fires at two
            # separate revisit events (multi-loop precision/recall tests)
            period = max(n // 4, 1)
            phase = i % (2 * period)
            z = (phase if phase < period else 2 * period - phase) * step
            t = np.array([0.15 * np.sin(0.2 * z * np.pi), 0.0, z])
            R = np.eye(3)
        else:
            raise ValueError(kind)
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = t
        Ts.append(T)
    return np.stack(Ts)


# ---------------------------------------------------------------------------
# Dataset-reader-compatible wrapper
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class SyntheticDataset:
    """Implements the common reader protocol (see ldso_tpu/io/datasets.py):
    num_frames, get_image(i) -> (img f32 [H,W], timestamp, exposure), calib.
    Also exposes ground truth for tests: poses_w_c [N,4,4], idepth maps."""

    w: int = 512
    h: int = 384
    n: int = 60
    fov_focal: float = 0.0    # 0 => 0.88·w (~59° horizontal FOV at any size)
    seed: int = 0
    scene_kind: str = "corridor"
    traj_kind: str = "forward_arc"
    exposure_wobble: bool = False
    # abrupt ±40% exposure STEPS every ~15 frames (adversarial: the
    # smooth wobble never stresses the affine-transfer chain the way a
    # real auto-exposure camera does; reference failure mode on TUM-Mono
    # sequences with exposure jumps)
    exposure_steps: bool = False
    cache: bool = True
    supersample: int = 2      # 1 = fast render (throughput benches)

    def __post_init__(self):
        from ldso_tpu import cameras

        self.scene = make_scene(self.seed, self.scene_kind)
        self.poses_w_c = trajectory(self.n, self.traj_kind)
        f = self.fov_focal if self.fov_focal > 0 else 0.88 * self.w
        self.calib = cameras.pinhole_calib(
            self.w, self.h, f, f, self.w / 2 - 0.5, self.h / 2 - 0.5
        )
        self._rng = np.random.default_rng(self.seed + 1)
        if self.exposure_steps:
            steps = np.asarray([1.0, 1.4, 0.7, 1.2, 0.85])
            self._exposures = steps[(np.arange(self.n) // 15) % len(steps)]
        elif self.exposure_wobble:
            self._exposures = 1.0 + 0.3 * np.sin(0.3 * np.arange(self.n))
        else:
            self._exposures = np.ones(self.n)
        self._cache = {}

    @property
    def num_frames(self) -> int:
        return self.n

    def intrinsics(self):
        return np.asarray(self.calib.out_intr, dtype=np.float32)

    def get_image(self, i: int):
        if self.cache and i in self._cache:
            img = self._cache[i][0]
        else:
            img, idep = self.scene.render(self.poses_w_c[i], self.calib.out_intr,
                                          self.w, self.h,
                                          supersample=self.supersample)
            img = img * self._exposures[i]
            if self.cache:
                self._cache[i] = (img, idep)
        return img, float(i) * 0.05, float(self._exposures[i])

    def get_idepth(self, i: int) -> np.ndarray:
        if self.cache and i in self._cache:
            return self._cache[i][1]
        _, idep = self.scene.render(self.poses_w_c[i], self.calib.out_intr, self.w, self.h)
        return idep

    def gt_pose_c_w(self, i: int) -> np.ndarray:
        """world-to-camera (Tcw, the engine's internal convention)."""
        return np.linalg.inv(self.poses_w_c[i])
