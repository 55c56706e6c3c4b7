"""System orchestration: the full odometry pipeline conductor.

TPU-native redesign of the reference's ``FullSystem``
(reference: n-lalanne/LDSO src/frontend/FullSystem.cc, SURVEY.md §3):
a functional core / imperative shell split — every numeric stage
(pyramid, tracking, tracing, activation, BA, marginalization assembly)
is a jitted device program over static-shape pytrees; this module is the
thin host state machine that owns the frame loop, the keyframe decision,
the point lifecycle (immature → active → marginalized/dropped), window
management, and trajectory bookkeeping.

Pipeline per frame (mirrors FullSystem::addActiveFrame → makeKeyFrame):
  pyramid → coarse track vs. reference KF → KF decision →
  [non-KF] epipolar trace of immature points
  [KF]     trace → flag marginalization victims → insert KF →
           activate immature points → windowed photometric BA →
           marginalize points+frames into the dense prior →
           select new candidates → rebuild tracker reference.

Host↔device discipline: ≤2 scalar readbacks per non-KF frame (track
diagnostics), a handful per KF (BA stats, activation gates).
"""

from __future__ import annotations

import dataclasses
import functools
import json
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ldso_tpu import select, tracker, trace as trace_mod
from ldso_tpu.ba import marginal, solve
from ldso_tpu.ba.residuals import assemble
from ldso_tpu.config import LdsoConfig
from ldso_tpu.core import window as win_mod
from ldso_tpu.core.window import PATTERN_OFFSETS, Window
from ldso_tpu.init2f import CoarseInitializer
from ldso_tpu.kernels.interp import bilinear33, in_bounds
from ldso_tpu.kernels.pyramid import build_pyramid, crop_to_multiple
from ldso_tpu.math import lie

_HI = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Jitted helpers
# ---------------------------------------------------------------------------


@jax.jit
def _project_points_to_slot(win: Window, slot):
    """Project every active point into window slot `slot`'s frame.

    Returns (uv' [P,2], idepth' [P], color' [P], valid [P]) — the
    semi-dense reference map for the coarse tracker (reference:
    CoarseTracker::makeCoarseDepthL0)."""
    T = win.current_pose()                                      # [F,4,4]
    T_slot = T[slot]
    T_host_inv = lie.se3_inverse(T)[win.p_host]                 # [P,4,4]
    T_rel = jnp.einsum("ij,pjk->pik", T_slot, T_host_inv, precision=_HI)
    fx, fy, cx, cy = win.c[0], win.c[1], win.c[2], win.c[3]
    xh = jnp.stack([(win.p_uv[:, 0] - cx) / fx, (win.p_uv[:, 1] - cy) / fy,
                    jnp.ones_like(win.p_uv[:, 0])], axis=-1)
    X = jnp.einsum("pij,pj->pi", T_rel[:, :3, :3], xh, precision=_HI) \
        + T_rel[:, :3, 3] * win.p_idepth[:, None]
    z = X[..., 2]
    okz = z > 1e-6
    zs = jnp.where(okz, z, 1.0)
    uvn = jnp.stack([fx * X[..., 0] / zs + cx, fy * X[..., 1] / zs + cy], axis=-1)
    h, w = win.images.shape[1], win.images.shape[2]
    inb = in_bounds(uvn, w, h, 3.0)
    valid = win.p_valid & okz & inb & (win.p_host != slot)
    color = bilinear33(win.images[slot], uvn)[..., 0]
    idep = win.p_idepth / zs
    return uvn, idep, color, valid


@functools.partial(jax.jit, static_argnames=("outlier_sum",))
def _sample_pattern(img3, uv, outlier_sum: float = 2500.0):
    """Host-pattern colors + static gradient weights for new points
    (reference: PointHessian ctor color/weights)."""
    pat = jnp.asarray(PATTERN_OFFSETS)
    hit = bilinear33(img3, uv[:, None, :] + pat[None])          # [N,8,3]
    color = hit[..., 0]
    gsq = jnp.sum(hit[..., 1:3] ** 2, axis=-1)
    weight = jnp.sqrt(outlier_sum / (outlier_sum + gsq))
    return color, weight


@jax.jit
def _relative_to_slots(win: Window, slot):
    """hostToTarget transforms + affine transfer from `slot` to every
    window slot (for immature-point activation)."""
    T = win.current_pose()
    T_rel = jnp.einsum("fij,jk->fik", T, lie.se3_inverse(T[slot]), precision=_HI)
    ea = win.exposure * jnp.exp(win.x[:, 6])
    alpha = ea / ea[slot]                                       # [F] host(slot)→target
    beta = win.x[:, 7] - alpha * win.x[slot, 7]
    return T_rel, alpha, beta


# ---------------------------------------------------------------------------
# Immature point bank (host-side SoA; device work via trace kernels)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class ImmatureBank:
    """Fixed-capacity candidate-point store (reference: the per-KF
    std::vector<ImmaturePoint*>; here one flat bank with host-slot tags)."""

    capacity: int

    def __post_init__(self):
        n = self.capacity
        self.valid = np.zeros(n, dtype=bool)
        self.host_slot = np.zeros(n, dtype=np.int32)
        self.uv = np.zeros((n, 2), dtype=np.float32)
        self.color = np.zeros((n, 8), dtype=np.float32)
        self.weight = np.ones((n, 8), dtype=np.float32)
        self.idepth_min = np.zeros(n, dtype=np.float32)
        self.idepth_max = np.full(n, np.nan, dtype=np.float32)  # NAN = untraced
        self.quality = np.zeros(n, dtype=np.float32)
        self.last_status = np.full(n, trace_mod.UNINITIALIZED, dtype=np.int32)
        self.outlier_count = np.zeros(n, dtype=np.int32)

    def free_slots(self, k: int) -> np.ndarray:
        idx = np.flatnonzero(~self.valid)
        return idx[:k]

    def drop(self, mask: np.ndarray):
        self.valid &= ~mask


# ---------------------------------------------------------------------------
# Host records
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class FrameRecord:
    frame_id: int
    timestamp: float
    ref_kf: int                   # kf_id of the tracking reference
    T_from_ref: np.ndarray        # [4,4] camFromRef (SE3)
    is_kf: bool


@dataclasses.dataclass
class KeyframeRecord:
    kf_id: int
    frame_id: int
    timestamp: float
    T_cw: np.ndarray              # [4,4] worldToCam (refreshed by BA; final at marg)
    slot: int                     # window slot while active; -1 after
    in_window: bool = True
    # filled by the loop-closing subsystem (features, BoW vector)
    features: Optional[dict] = None


@dataclasses.dataclass
class PoseEdge:
    """Relative-pose constraint for the global Sim(3) pose graph
    (reference: Frame::poseRel, recorded at marginalization)."""

    kf_a: int
    kf_b: int
    T_ab: np.ndarray              # [4,4] SE3: a_cam ← b_cam... (T_a · T_b⁻¹)
    kind: str = "odom"            # "odom" | "loop"
    scale: float = 1.0            # Sim3 scale for loop edges


# ---------------------------------------------------------------------------
# The conductor
# ---------------------------------------------------------------------------


class FullSystem:
    """End-to-end monocular direct odometry engine (loop closure is wired
    in by ldso_tpu.loop.system glue; this class is the odometry core)."""

    def __init__(self, cfg: LdsoConfig, intr, w: int, h: int):
        self.cfg = cfg
        L = cfg.shapes.pyr_levels
        m = 1 << (L - 1)
        self.w = (w // m) * m
        self.h = (h // m) * m
        self.intr = np.asarray(intr, dtype=np.float32)
        self.intr_j = jnp.asarray(self.intr)

        self.win = win_mod.empty_window(cfg, self.h, self.w, self.intr)
        D = cfg.shapes.state_dim
        self.HM, self.bM = marginal.empty_prior(D)

        self.slot_kf: List[Optional[int]] = [None] * cfg.shapes.max_frames
        self.kfs: dict[int, KeyframeRecord] = {}
        self.frames: List[FrameRecord] = []
        self.pose_edges: List[PoseEdge] = []
        self.immatures = ImmatureBank(cfg.shapes.max_immature)

        self.initializer = CoarseInitializer(cfg, self.intr)
        self.initialized = False
        self.init_failed = False
        self.is_lost = False
        self._init_frames: List[tuple] = []   # (frame_id, ts, T_first_to_cur)

        self.next_kf_id = 0
        self.frame_count = 0
        self.track_ref: Optional[tracker.TrackerRef] = None
        self.ref_kf: Optional[int] = None
        self.last_rel_ab = np.zeros(2, dtype=np.float32)
        self.T_last_cw: Optional[np.ndarray] = None
        self.T_prelast_cw: Optional[np.ndarray] = None
        self.first_coarse_rmse = -1.0
        self.metrics: List[dict] = []
        # hooks the loop-closing subsystem assigns
        self.on_keyframe = None
        self.loop_closing = None

    # ------------------------------------------------------------------
    # Public API (reference: addActiveFrame / printResult)
    # ------------------------------------------------------------------

    def add_frame(self, img, timestamp: Optional[float] = None,
                  exposure: float = 1.0) -> dict:
        fid = self.frame_count
        self.frame_count += 1
        ts = float(timestamp) if timestamp is not None else float(fid)
        img = np.asarray(img, dtype=np.float32)[: self.h, : self.w]
        pyr, _ = build_pyramid(jnp.asarray(img), self.cfg.shapes.pyr_levels)

        if self.is_lost:
            # relocalization by BoW + PnP re-anchor (new capability — the
            # reference has the database but never recovers, SURVEY §5.3)
            if self.loop_closing is not None:
                rel = self.loop_closing.relocalize(self, pyr)
                if rel is not None:
                    self.is_lost = False
                    self.T_last_cw = rel["T_cw"]
                    self.T_prelast_cw = rel["T_cw"].copy()
                    self.first_coarse_rmse = -1.0
                    return dict(status="relocalized", frame_id=fid,
                                anchor_kf=rel["kf_id"],
                                n_inliers=rel["n_inliers"])
            return dict(status="lost", frame_id=fid)
        if not self.initialized:
            return self._initializer_step(fid, ts, exposure, pyr)
        return self._track_and_map(fid, ts, exposure, pyr)

    def export_trajectory(self):
        """(timestamps [N], T_cw [N,4,4]) for every tracked frame — frame
        poses composed onto their reference KF's FINAL pose (reference:
        FullSystem::printResult composes shells onto optimized KFs)."""
        ts_out, poses = [], []
        for fr in self.frames:
            kf = self.kfs.get(fr.ref_kf)
            if kf is None:
                continue
            ts_out.append(fr.timestamp)
            poses.append(fr.T_from_ref @ kf.T_cw)
        return np.asarray(ts_out), np.asarray(poses)

    def write_metrics(self, path: str):
        with open(path, "w") as f:
            for m in self.metrics:
                f.write(json.dumps(m) + "\n")

    # ------------------------------------------------------------------
    # Initialization path (reference: FullSystem init branch +
    # initializeFromInitializer)
    # ------------------------------------------------------------------

    def _initializer_step(self, fid, ts, exposure, pyr) -> dict:
        init = self.initializer
        if init.frame_id_first is None:
            gsq = [jnp.sum(p[..., 1:3] ** 2, axis=-1) for p in pyr]
            init.set_first(pyr, gsq)
            init.frame_id_first = fid
            self._init_frames = [(fid, ts, np.eye(4))]
            self._first_pyr = pyr
            self._first_exposure = exposure
            self._first_ts = ts
            return dict(status="init_first", frame_id=fid)

        st = init.track(pyr)
        self._init_frames.append((fid, ts, np.asarray(init.T, dtype=np.float64)))
        if st["done"]:
            self._init_from_initializer(fid, ts, exposure, pyr)
            return dict(status="initialized", frame_id=fid, **st)
        # bootstrap divergence → restart from scratch on this frame
        # (reference: initFailed → the runner rebuilds the system)
        if init.frames_tracked > 30 and not init.snapped:
            self.init_failed = True
            init.frame_id_first = None
            init.frames_tracked = 0
            return dict(status="init_reset", frame_id=fid)
        return dict(status="initializing", frame_id=fid, **st)

    def _init_from_initializer(self, fid, ts, exposure, pyr):
        cfg = self.cfg
        res = self.initializer.results()
        rescale = res.get("rescale", 1.0)

        # first KF at world origin, second at the bootstrap pose
        kf0 = self._new_kf(self._init_frames[0][0], self._first_ts, np.eye(4),
                           self._first_pyr[0], self._first_exposure,
                           aff_ab=(0.0, 0.0))
        T1 = np.asarray(res["T_first_to_new"], dtype=np.float64)
        ab1 = res["ab"]
        kf1 = self._new_kf(fid, ts, T1, pyr[0], exposure,
                           aff_ab=(float(ab1[0]), float(ab1[1])))

        # points hosted by KF0
        good = np.asarray(res["good"])
        order = np.flatnonzero(good)
        k = min(len(order), cfg.shapes.max_points)
        order = order[:k]
        uv = np.asarray(res["uv"])[order]
        idepth = np.asarray(res["idepth"])[order]
        color, weight = _sample_pattern(
            self.win.images[kf0.slot], jnp.asarray(uv),
            outlier_sum=float(cfg.ba.outlier_th_sum_component))
        self.win = win_mod.add_points(
            self.win, np.arange(k), kf0.slot, uv,
            np.asarray(color), np.asarray(weight), idepth)

        # polish with one BA round
        self._run_ba()
        self._refresh_kf_poses()

        # record the in-between bootstrap frames (translations rescaled)
        for i, (f_id, f_ts, T) in enumerate(self._init_frames):
            T = T.copy()
            T[:3, 3] /= rescale
            self.frames.append(FrameRecord(f_id, f_ts, kf0.kf_id, T,
                                           is_kf=(i == 0)))
        self.frames[-1] = FrameRecord(fid, ts, kf1.kf_id, np.eye(4), True)

        self._make_new_immatures(kf1.slot, pyr)
        self._update_tracker_ref(kf1)
        self.T_last_cw = np.asarray(self.kfs[kf1.kf_id].T_cw)
        self.T_prelast_cw = np.eye(4)
        self.initialized = True
        if self.on_keyframe is not None:
            self.on_keyframe(self, kf0, self._first_pyr)
            self.on_keyframe(self, kf1, pyr)

    # ------------------------------------------------------------------
    # Steady-state tracking (reference: trackNewCoarse + deliverTrackedFrame)
    # ------------------------------------------------------------------

    def _track_and_map(self, fid, ts, exposure, pyr) -> dict:
        cfg = self.cfg
        ref = self.kfs[self.ref_kf]
        T_ref_cw = ref.T_cw

        # constant-velocity prediction → hypothesis ladder
        if self.T_last_cw is not None and self.T_prelast_cw is not None:
            vel = self.T_last_cw @ np.linalg.inv(self.T_prelast_cw)
            T_pred = vel @ self.T_last_cw
            T_cv = T_pred @ np.linalg.inv(T_ref_cw)
        else:
            T_cv = np.eye(4)
        hyps = tracker.motion_hypotheses(
            jnp.asarray(T_cv, jnp.float32), num=cfg.shapes.num_hypotheses)

        ab0 = jnp.asarray(self.last_rel_ab, jnp.float32)
        tr = tracker.track_frame(pyr, self.track_ref, hyps, ab0,
                                 self.intr_j, cfg, new_exposure=exposure)
        rmse0 = float(tr.rmse[0])
        if self.first_coarse_rmse < 0:
            self.first_coarse_rmse = rmse0
        if not np.isfinite(rmse0) or rmse0 > 4.0 * max(self.first_coarse_rmse, 1e-3):
            self.is_lost = True
            return dict(status="lost", frame_id=fid, rmse=rmse0)

        T_rel = np.asarray(tr.T, dtype=np.float64)
        T_cw = T_rel @ T_ref_cw
        ab_rel = np.asarray(tr.ab)
        self.last_rel_ab = ab_rel.astype(np.float32)
        self.frames.append(FrameRecord(fid, ts, ref.kf_id, T_rel, False))

        # keyframe decision (reference: FullSystem.cc KF criterion —
        # setting_maxShiftWeight* are premultiplied by nominal 640+480)
        flow = np.asarray(tr.flow)
        tc = cfg.tracker
        norm = 1120.0 / (self.w + self.h)
        delta = tc.kf_global_weight * norm * (
            tc.max_shift_weight_t * flow[0]
            + tc.max_shift_weight_r * flow[2]
            + tc.max_shift_weight_rt * flow[1]
        ) + tc.max_affine_weight * abs(float(ab_rel[0]))
        need_kf = delta > 1.0 or 2.0 * self.first_coarse_rmse < rmse0

        status = dict(status="tracked", frame_id=fid, rmse=rmse0,
                      flow=flow.tolist(), need_kf=bool(need_kf),
                      n_active=int(np.sum(np.asarray(self.win.p_valid))))
        # new-frame absolute affine (for tracing / KF insertion)
        a_ref, b_ref = self._kf_affine(ref)
        e_ref = float(self.win.exposure[ref.slot])
        alpha_rel = float(np.exp(ab_rel[0]))
        a_abs = float(np.log(max(alpha_rel * e_ref * np.exp(a_ref) / max(exposure, 1e-6), 1e-12)))
        b_abs = float(ab_rel[1] + alpha_rel * b_ref)

        if need_kf:
            self._make_keyframe(fid, ts, exposure, pyr, T_cw, (a_abs, b_abs),
                                status)
        else:
            self._trace_immatures(pyr[0], T_cw, exposure, (a_abs, b_abs))

        self.T_prelast_cw = self.T_last_cw
        self.T_last_cw = T_cw
        self.metrics.append(dict(frame=fid, **{k: v for k, v in status.items()
                                               if k != "status"}))
        return status

    # ------------------------------------------------------------------
    # Keyframe path (reference: makeKeyFrame)
    # ------------------------------------------------------------------

    def _make_keyframe(self, fid, ts, exposure, pyr, T_cw, aff_ab, status):
        cfg = self.cfg
        self._trace_immatures(pyr[0], T_cw, exposure, aff_ab)

        kf = self._new_kf(fid, ts, T_cw, pyr[0], exposure, aff_ab)
        self.frames[-1] = dataclasses.replace(
            self.frames[-1], ref_kf=kf.kf_id, T_from_ref=np.eye(4), is_kf=True)
        self.win = win_mod.connect_new_frame(self.win, kf.slot)

        bank = self.immatures
        status.update(
            n_imm=int(bank.valid.sum()),
            n_imm_good=int((bank.valid
                            & (bank.last_status == trace_mod.GOOD)).sum()),
            n_imm_q=int((bank.valid & (bank.last_status == trace_mod.GOOD)
                         & (bank.quality > self.cfg.trace.min_quality)).sum()))
        n_before = int(np.asarray(self.win.p_valid).sum())
        self._activate_points(kf)
        n_after_act = int(np.asarray(self.win.p_valid).sum())
        stats = self._run_ba()
        self._refresh_kf_poses()

        marg_slots = self._flag_frames_for_marginalization(stats)
        self._remove_and_marginalize_points(stats, marg_slots)
        n_after_drop = int(np.asarray(self.win.p_valid).sum())
        status.update(n_act=n_after_act - n_before,
                      n_drop=n_after_act - n_after_drop,
                      e_per_res=stats.energy_final / max(stats.num_residuals, 1))
        for slot in marg_slots:
            self._marginalize_frame(slot)

        self._cull_immatures(marg_slots)
        self._make_new_immatures(kf.slot, pyr)
        self._update_tracker_ref(kf)

        status.update(
            ba_energy=stats.energy_final, ba_iters=stats.iterations,
            n_res=stats.num_residuals, kf_id=kf.kf_id,
            n_window=sum(k is not None for k in self.slot_kf))
        if self.on_keyframe is not None:
            self.on_keyframe(self, kf, pyr)

    def _new_kf(self, fid, ts, T_cw, img3, exposure, aff_ab) -> KeyframeRecord:
        slot = next(i for i, k in enumerate(self.slot_kf) if k is None)
        kf = KeyframeRecord(self.next_kf_id, fid, ts,
                            np.asarray(T_cw, dtype=np.float64), slot)
        self.next_kf_id += 1
        self.slot_kf[slot] = kf.kf_id
        self.kfs[kf.kf_id] = kf
        self.win = win_mod.insert_frame(
            self.win, slot, jnp.asarray(T_cw, jnp.float32), img3,
            exposure, aff_ab=aff_ab)
        return kf

    def _kf_affine(self, kf: KeyframeRecord):
        x = np.asarray(self.win.x[kf.slot])
        return float(x[6]), float(x[7])

    def _run_ba(self) -> solve.BAStats:
        anchor = self._oldest_slot()
        self.win, stats = solve.run_ba(self.win, self.HM, self.bM, self.cfg,
                                       anchor_slot=anchor)
        return stats

    def _oldest_slot(self) -> int:
        act = [(kid, s) for s, kid in enumerate(self.slot_kf) if kid is not None]
        return min(act)[1] if act else 0

    def _refresh_kf_poses(self):
        T = np.asarray(self.win.current_pose(), dtype=np.float64)
        for slot, kid in enumerate(self.slot_kf):
            if kid is not None:
                self.kfs[kid].T_cw = T[slot]

    # ------------------------------------------------------------------
    # Window management (reference: flagFramesForMarginalization)
    # ------------------------------------------------------------------

    def _flag_frames_for_marginalization(self, stats: solve.BAStats) -> List[int]:
        cfg = self.cfg
        active = [(self.kfs[k].kf_id, s) for s, k in enumerate(self.slot_kf)
                  if k is not None]
        active.sort()
        if len(active) <= cfg.window.max_kf:
            return []
        newest2 = {s for _, s in active[-2:]}
        slots = [s for _, s in active]
        newest_slot = active[-1][1]

        p_host = np.asarray(self.win.p_host)
        p_valid = np.asarray(self.win.p_valid)
        vp = stats.valid_pair if stats.valid_pair is not None else None

        flagged: List[int] = []
        n_keep = len(active)
        # rule 1: drop frames with almost no points visible in the newest KF
        # or a large affine gap to it (reference: <5% in-view, maxLogAffFac)
        x = np.asarray(self.win.x)
        for s in slots:
            if s in newest2 or n_keep - len(flagged) <= cfg.window.min_kf:
                continue
            hosted = p_valid & (p_host == s)
            n_hosted = int(hosted.sum())
            vis = (int((vp[:, newest_slot] & hosted).sum()) / n_hosted
                   if (vp is not None and n_hosted > 0) else 1.0)
            aff_gap = abs(float(x[s, 6] - x[newest_slot, 6]))
            if n_hosted == 0 or vis < cfg.window.min_inlier_visible_frac \
                    or aff_gap > cfg.window.max_log_aff_fac:
                flagged.append(s)
        # rule 2: spatial-spread heuristic — drop the frame crowded among
        # the others but far from the newest
        while len(active) - len(flagged) > cfg.window.max_kf:
            T = np.asarray(self.win.current_pose(), dtype=np.float64)
            centers = {s: -T[s, :3, :3].T @ T[s, :3, 3] for s in slots}
            best, best_score = None, -np.inf
            for s in slots:
                if s in newest2 or s in flagged:
                    continue
                d_new = np.linalg.norm(centers[s] - centers[newest_slot])
                crowd = sum(1.0 / (1e-5 + np.linalg.norm(centers[s] - centers[o]))
                            for o in slots if o != s and o not in flagged)
                score = np.sqrt(d_new) * crowd
                if score > best_score:
                    best, best_score = s, score
            if best is None:
                break
            flagged.append(best)
        return flagged

    def _remove_and_marginalize_points(self, stats: solve.BAStats,
                                       marg_slots: List[int]):
        """Points that lost their residuals or whose host dies: fold the
        well-constrained ones into the prior, drop the rest (reference:
        flagPointsForRemoval + ef->marginalizePointsF/dropPointsF)."""
        cfg = self.cfg
        p_valid = np.asarray(self.win.p_valid)
        p_host = np.asarray(self.win.p_host)
        res_rows = np.asarray(self.win.res_mask).sum(axis=1)
        dying_host = np.isin(p_host, marg_slots) & p_valid
        no_res = (res_rows == 0) & p_valid
        goners = dying_host | no_res
        if not goners.any():
            return
        hdd = stats.idepth_hessian if stats.idepth_hessian is not None \
            else np.zeros(len(p_valid))
        marg_mask = goners & (hdd > cfg.ba.min_idepth_hessian)
        drop_mask = goners & ~marg_mask
        if marg_mask.any():
            self.HM, self.bM = marginal.marginalize_points(
                self.win, marg_mask, self.HM, self.bM, cfg)
        self.win = win_mod.drop_points(self.win, jnp.asarray(goners))

    def _marginalize_frame(self, slot: int):
        cfg = self.cfg
        kid = self.slot_kf[slot]
        kf = self.kfs[kid]
        kf.T_cw = np.asarray(self.win.current_pose(slot), dtype=np.float64)
        kf.in_window = False
        kf.slot = -1

        # pose-graph odometry edges to the KFs still in the window
        # (reference: Frame::poseRel recorded at marginalization)
        T = np.asarray(self.win.current_pose(), dtype=np.float64)
        others = sorted((self.slot_kf[s], s) for s in range(len(self.slot_kf))
                        if self.slot_kf[s] is not None and s != slot)
        for okid, oslot in others[: cfg.loop.max_edges_per_kf]:
            T_ab = T[slot] @ np.linalg.inv(T[oslot])
            self.pose_edges.append(PoseEdge(kid, okid, T_ab, "odom"))

        aff_prior = np.array([0.0] * 6 + [cfg.ba.affine_prior_a,
                                          cfg.ba.affine_prior_b])
        aff_delta = np.asarray(self.win.x[slot] - self.win.x_zero[slot],
                               dtype=np.float64)
        self.HM, self.bM = marginal.marginalize_frame(
            slot, self.HM, self.bM, frame_prior_diag=aff_prior,
            frame_prior_delta=aff_delta)
        self.win = win_mod.remove_frame(self.win, slot)
        self.slot_kf[slot] = None

    # ------------------------------------------------------------------
    # Immature-point lifecycle (reference: traceNewCoarse, activatePointsMT,
    # makeNewTraces)
    # ------------------------------------------------------------------

    def _trace_immatures(self, img3_new, T_new_cw, exposure, aff_ab):
        cfg = self.cfg
        bank = self.immatures
        if not bank.valid.any():
            return
        T = np.asarray(self.win.current_pose(), dtype=np.float64)
        T_hn = np.einsum("ij,njk->nik", np.asarray(T_new_cw),
                         np.linalg.inv(T)[bank.host_slot]).astype(np.float32)
        x = np.asarray(self.win.x)
        e = np.asarray(self.win.exposure)
        ea_h = e[bank.host_slot] * np.exp(x[bank.host_slot, 6])
        alpha = (exposure * np.exp(aff_ab[0])) / np.maximum(ea_h, 1e-12)
        beta = aff_ab[1] - alpha * x[bank.host_slot, 7]
        ab = np.stack([alpha, beta], axis=-1).astype(np.float32)

        first = np.isnan(bank.idepth_max)
        d_min = np.where(first, 0.0, bank.idepth_min).astype(np.float32)
        d_max = np.where(first, 1e8, bank.idepth_max).astype(np.float32)

        res = trace_mod.trace_points(
            img3_new, jnp.asarray(bank.uv), jnp.asarray(bank.color),
            jnp.asarray(d_min), jnp.asarray(d_max),
            jnp.asarray(bank.valid), jnp.asarray(T_hn), jnp.asarray(ab),
            self.intr_j, num_samples=cfg.shapes.epi_samples,
            gn_iters=cfg.trace.gn_iterations,
            max_pix_search_frac=cfg.trace.max_pix_search_frac,
            min_quality=cfg.trace.min_quality,
            step_size=cfg.trace.step_size)

        st = np.asarray(res.status)
        good = bank.valid & (st == trace_mod.GOOD)
        bank.idepth_min = np.where(good, np.asarray(res.idepth_min),
                                   bank.idepth_min)
        bank.idepth_max = np.where(good, np.asarray(res.idepth_max),
                                   bank.idepth_max)
        bank.quality = np.where(bank.valid, np.asarray(res.quality),
                                bank.quality)
        bank.last_status = np.where(bank.valid, st, bank.last_status)
        bank.outlier_count += (bank.valid & (st == trace_mod.OUTLIER)).astype(np.int32)
        # delete hopeless candidates — OOB only, like the reference
        # (activatePointsMT deletes on IPS_OOB; OUTLIER keeps retrying);
        # persistent outliers get culled after many strikes
        bank.drop(bank.valid & ((st == trace_mod.OOB) | (bank.outlier_count >= 8)))

    def _activate_points(self, new_kf: KeyframeRecord):
        """Promote good candidates to active points (reference:
        activatePointsMT + optimizeImmaturePoint)."""
        cfg = self.cfg
        bank = self.immatures
        p_valid = np.asarray(self.win.p_valid)
        n_free = int((~p_valid).sum())
        n_want = int(cfg.selector.desired_point_density) - int(p_valid.sum())
        n_want = min(n_want, n_free)
        if n_want <= 0:
            return

        can = (bank.valid & (bank.last_status == trace_mod.GOOD)
               & (bank.quality > cfg.trace.min_quality)
               & ~np.isnan(bank.idepth_max)
               & ((bank.idepth_max + bank.idepth_min) > 0))
        if not can.any():
            return

        activated_mask = np.zeros(bank.capacity, dtype=bool)
        chosen_all: List[np.ndarray] = []
        d_all: List[np.ndarray] = []
        host_all: List[int] = []
        for slot in {int(s) for s in np.unique(bank.host_slot[can])}:
            sel = can & (bank.host_slot == slot)
            if not sel.any():
                continue
            T_rel, alpha, beta = _relative_to_slots(self.win, slot)
            d0 = 0.5 * (bank.idepth_min + bank.idepth_max)
            d, Hd, E, cnt = trace_mod.optimize_idepth(
                self.win.images, self.win.frame_valid, T_rel, alpha, beta,
                jnp.asarray(bank.uv), jnp.asarray(bank.color),
                jnp.asarray(np.clip(d0, 1e-3, 50.0)), jnp.asarray(sel),
                self.intr_j, slot, iters=3, huber_th=cfg.ba.huber_th)
            d, Hd, E, cnt = (np.asarray(d), np.asarray(Hd),
                             np.asarray(E), np.asarray(cnt))
            ok = sel & (Hd > cfg.ba.min_idepth_hessian) & (cnt >= 8) \
                & (E < cfg.ba.outlier_th * np.maximum(cnt, 1))
            idx = np.flatnonzero(ok)
            if len(idx):
                chosen_all.append(idx)
                d_all.append(d[idx])
                host_all.extend([slot] * len(idx))

        if not chosen_all:
            return
        idx = np.concatenate(chosen_all)
        d = np.concatenate(d_all)
        hosts = np.asarray(host_all)
        # best quality first, capped at the budget
        order = np.argsort(-bank.quality[idx])[:n_want]
        idx, d, hosts = idx[order], d[order], hosts[order]

        free = np.flatnonzero(~p_valid)
        for slot in np.unique(hosts):
            m = hosts == slot
            k = int(m.sum())
            if k == 0 or len(free) == 0:
                continue
            take = free[:k]
            free = free[k:]
            sel_idx = idx[m][: len(take)]
            color, weight = _sample_pattern(
                self.win.images[int(slot)], jnp.asarray(bank.uv[sel_idx]),
                outlier_sum=float(cfg.ba.outlier_th_sum_component))
            self.win = win_mod.add_points(
                self.win, take, int(slot), bank.uv[sel_idx],
                np.asarray(color), np.asarray(weight), d[m][: len(take)])
            activated_mask[sel_idx] = True
        bank.drop(activated_mask)

    def _cull_immatures(self, marg_slots: List[int]):
        if marg_slots:
            self.immatures.drop(np.isin(self.immatures.host_slot, marg_slots))

    def _make_new_immatures(self, slot: int, pyr):
        """Select fresh candidates on the new KF (reference: makeNewTraces)."""
        cfg = self.cfg
        bank = self.immatures
        gsq1 = jnp.sum(pyr[1][..., 1:3] ** 2, axis=-1)
        gsq2 = jnp.sum(pyr[2][..., 1:3] ** 2, axis=-1)
        n_want = min(int(cfg.selector.desired_immature_density),
                     int((~bank.valid).sum()))
        if n_want <= 0:
            return
        uv, scores, valid = select.select_pixels(
            pyr[0], gsq1, gsq2, num_want=n_want,
            block=cfg.selector.block, pot=5,
            min_cut=cfg.selector.min_grad_hist_cut,
            min_add=cfg.selector.min_grad_hist_add,
            seed=cfg.seed + (self.frame_count & 3))
        uv = np.asarray(uv)
        valid = np.asarray(valid)
        uv = uv[valid]
        if len(uv) == 0:
            return
        color, weight = _sample_pattern(
            pyr[0], jnp.asarray(uv),
            outlier_sum=float(cfg.ba.outlier_th_sum_component))
        slots = bank.free_slots(len(uv))
        k = len(slots)
        bank.valid[slots] = True
        bank.host_slot[slots] = slot
        bank.uv[slots] = uv[:k]
        bank.color[slots] = np.asarray(color)[:k]
        bank.weight[slots] = np.asarray(weight)[:k]
        bank.idepth_min[slots] = 0.0
        bank.idepth_max[slots] = np.nan
        bank.quality[slots] = 0.0
        bank.last_status[slots] = trace_mod.UNINITIALIZED
        bank.outlier_count[slots] = 0

    # ------------------------------------------------------------------
    # Tracker reference (reference: setCoarseTrackingRef + makeCoarseDepthL0)
    # ------------------------------------------------------------------

    def _update_tracker_ref(self, kf: KeyframeRecord):
        uv, idep, color, valid = _project_points_to_slot(
            self.win, jnp.asarray(kf.slot))
        self.track_ref = tracker.make_tracker_ref(
            uv, idep, color, valid, self.cfg.shapes.pyr_levels,
            exposure=float(self.win.exposure[kf.slot]))
        self.ref_kf = kf.kf_id
        self.last_rel_ab = np.zeros(2, dtype=np.float32)
