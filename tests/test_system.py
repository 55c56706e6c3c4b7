"""Full-system integration: end-to-end odometry on a synthetic sequence
(the analog of the reference's integration-by-example strategy, with the
ground truth the reference never had — SURVEY.md §4), plus
checkpoint/resume equivalence (§5.4)."""

import numpy as np
import pytest

from ldso_tpu.config import preset
from ldso_tpu.eval.ate import ate_rmse
from ldso_tpu.io.synthetic import SyntheticDataset
from ldso_tpu.system import FullSystem

CFG = preset("tiny")


def _run(system, ds, start, end):
    for i in range(start, end):
        img, ts, exp = ds.get_image(i)
        st = system.add_frame(img, ts, exp)
        assert st["status"] != "lost", f"lost at frame {i}: {st}"
    return system


def _ate_pct(system, ds):
    ts, poses = system.export_trajectory()
    ids = [fr.frame_id for fr in system.frames][: len(poses)]
    gt = np.stack([ds.gt_pose_c_w(i) for i in ids])
    est_c = np.stack([-(P[:3, :3].T @ P[:3, 3]) for P in poses])
    gt_c = np.stack([-(P[:3, :3].T @ P[:3, 3]) for P in gt])
    rmse, _ = ate_rmse(est_c, gt_c, with_scale=True)
    extent = np.linalg.norm(gt_c.max(0) - gt_c.min(0))
    return 100.0 * rmse / extent, len(poses)


@pytest.fixture(scope="module")
def odometry_run():
    from ldso_tpu.loop.closing import LoopClosing

    ds = SyntheticDataset(w=320, h=240, n=30, traj_kind="forward_arc", seed=0)
    system = FullSystem(CFG, ds.intrinsics(), ds.w, ds.h)
    lc = LoopClosing(CFG, ds.intrinsics(), train_after=3)
    system.on_keyframe = lc.on_keyframe
    system.loop_closing = lc
    _run(system, ds, 0, ds.num_frames)
    return system, ds


class TestEndToEnd:
    def test_tracks_whole_sequence(self, odometry_run):
        system, ds = odometry_run
        assert system.initialized and not system.is_lost
        _, n = _ate_pct(system, ds)
        assert n == ds.num_frames

    def test_ate_within_bounds(self, odometry_run):
        system, ds = odometry_run
        pct, _ = _ate_pct(system, ds)
        # 3.8% after the round-3 BA accept/reject fix; the bound leaves
        # headroom for platform jitter but catches the next convergence
        # regression (round 2 shipped at 7.9% against the old 6.0 bound)
        assert pct < 5.0, f"ATE {pct:.2f}% of extent"

    def test_keyframes_and_points_alive(self, odometry_run):
        system, ds = odometry_run
        assert len(system.kfs) >= 3
        assert int(np.asarray(system.win.p_valid).sum()) > 50
        assert system.immatures.valid.sum() > 20

    def test_marginalization_keeps_window_bounded(self, odometry_run):
        system, _ = odometry_run
        n_in = sum(1 for k in system.kfs.values() if k.in_window)
        assert n_in <= CFG.window.max_kf + 1
        # odometry pose-graph edges recorded at marginalization
        if any(not k.in_window for k in system.kfs.values()):
            assert len(system.pose_edges) > 0

    def test_trajectory_export_tum_roundtrip(self, odometry_run, tmp_path):
        from ldso_tpu.eval.ate import read_tum_trajectory, write_tum_trajectory

        system, _ = odometry_run
        ts, poses = system.export_trajectory()
        p = str(tmp_path / "traj.txt")
        write_tum_trajectory(p, ts, poses)
        ts2, pos2, quat2 = read_tum_trajectory(p)
        assert len(ts2) == len(ts)
        # file stores camToWorld translation == camera center
        centers = np.stack([-(P[:3, :3].T @ P[:3, 3]) for P in poses])
        np.testing.assert_allclose(pos2, centers, atol=1e-4)


class TestLoopSubsystem:
    def test_keyframes_snapshotted_and_vocab_trained(self, odometry_run):
        system, _ = odometry_run
        lc = system.loop_closing
        assert len(lc.snapshots) == len(system.kfs)
        assert lc.vocab is not None
        assert len(lc.db) >= len(system.kfs) - 1

    def test_relocalization_recovers_pose(self, odometry_run):
        from ldso_tpu.kernels.pyramid import build_pyramid
        import jax.numpy as jnp

        system, ds = odometry_run
        lc = system.loop_closing
        # pretend we are lost while seeing (almost) a known keyframe's view
        kf = sorted(system.kfs.values(), key=lambda k: k.kf_id)[-2]
        img, _, _ = ds.get_image(kf.frame_id + 1)
        pyr, _ = build_pyramid(jnp.asarray(
            np.asarray(img, np.float32)[: system.h, : system.w]),
            CFG.shapes.pyr_levels)
        rel = lc.relocalize(system, pyr)
        assert rel is not None, "relocalization failed on a revisited view"
        gt_rel = ds.gt_pose_c_w(kf.frame_id + 1)
        est_c = -rel["T_cw"][:3, :3].T @ rel["T_cw"][:3, 3]
        kf_c = -kf.T_cw[:3, :3].T @ kf.T_cw[:3, 3]
        gt_c = -gt_rel[:3, :3].T @ gt_rel[:3, 3]
        gt_kf_c = -ds.gt_pose_c_w(kf.frame_id)[:3, :3].T @ \
            ds.gt_pose_c_w(kf.frame_id)[:3, 3]
        # recovered offset from the anchor KF matches ground truth offset
        # (up to the odometry's accumulated scale error)
        d_est = np.linalg.norm(est_c - kf_c)
        d_gt = np.linalg.norm(gt_c - gt_kf_c)
        assert d_est < max(4.0 * d_gt, 0.15)


class TestCheckpointResume:
    def test_resume_reproduces_run(self, tmp_path):
        from ldso_tpu.io.checkpoint import load_checkpoint, save_checkpoint

        ds = SyntheticDataset(w=320, h=240, n=22, traj_kind="forward_arc",
                              seed=0)
        sys_a = FullSystem(CFG, ds.intrinsics(), ds.w, ds.h)
        _run(sys_a, ds, 0, 15)
        path = str(tmp_path / "ckpt")
        save_checkpoint(sys_a, path)

        sys_b = load_checkpoint(path, CFG)
        _run(sys_a, ds, 15, 22)
        _run(sys_b, ds, 15, 22)

        _, pa = sys_a.export_trajectory()
        _, pb = sys_b.export_trajectory()
        assert len(pa) == len(pb)
        np.testing.assert_allclose(pa[:, :3, 3], pb[:, :3, 3], atol=1e-3)
