"""Long-horizon validation: marginalization consistency + loop closure.

SURVEY.md §7.2 risk 1 / config 4: FEJ marginalization errors are SILENT —
they show up only as drift or prior-energy blowup over many keyframe
generations. The reference has no tests at all (SURVEY §4); its de-facto
check is trajectory quality over long sequences. These tests are that
check, in CI, on the synthetic renderer:

  * ``test_thirty_marginalizations_consistent`` — ≥28 KF marginalizations
    on a forward trajectory; asserts bounded photometric energy per
    residual at every keyframe (no prior poisoning), bounded absolute
    affine states (the a/b gauge must not random-walk — regression test
    for the absolute affine prior), and final ATE within bounds.
  * ``test_loop_closure_reduces_drift`` — out-and-back revisit: loop
    closure must fire and the pose-graph correction must not worsen ATE
    (the LDSO paper's KITTI-00 shape, scaled down to CI).
"""

import numpy as np
import pytest

from ldso_tpu.config import preset
from ldso_tpu.eval.ate import ate_rmse
from ldso_tpu.io.synthetic import SyntheticDataset
from ldso_tpu.system import FullSystem

CFG = preset("tiny")


def _drive(system, ds, n, allow_lost=False):
    kf_stats = []
    for i in range(n):
        img, ts, exp = ds.get_image(i)
        st = system.add_frame(img, ts, exp)
        if st.get("need_kf"):
            kf_stats.append(st)
        if st["status"] == "lost":
            assert allow_lost, f"lost at frame {i}"
            break
    return kf_stats


def _ate_pct(system, ds):
    ts, poses = system.export_trajectory()
    ids = [fr.frame_id for fr in system.frames][: len(poses)]
    gt = np.stack([ds.gt_pose_c_w(i) for i in ids])
    est_c = np.stack([-(P[:3, :3].T @ P[:3, 3]) for P in poses])
    gt_c = np.stack([-(P[:3, :3].T @ P[:3, 3]) for P in gt])
    rmse, _ = ate_rmse(est_c, gt_c, with_scale=True)
    extent = np.linalg.norm(gt_c.max(0) - gt_c.min(0))
    return 100.0 * rmse / extent


class TestMarginalizationConsistency:
    @pytest.fixture(scope="class")
    def long_run(self):
        # raised kf_global_weight => a KF every ~5 frames => ~35 KF
        # generations in 180 frames
        import dataclasses
        cfg = CFG.replace(tracker=dataclasses.replace(
            CFG.tracker, kf_global_weight=3.5))
        ds = SyntheticDataset(w=320, h=240, n=180, traj_kind="forward_arc",
                              seed=1)
        system = FullSystem(cfg, ds.intrinsics(), ds.w, ds.h)
        kf_stats = _drive(system, ds, ds.num_frames)
        return system, ds, kf_stats

    def test_thirty_marginalizations_consistent(self, long_run):
        system, ds, kf_stats = long_run
        n_marg = sum(1 for k in system.kfs.values() if not k.in_window)
        assert n_marg >= 28, f"only {n_marg} marginalized KFs"
        # prior consistency: the PHOTOMETRIC energy per residual must stay
        # bounded across every keyframe generation — a poisoned
        # marginalization prior drags the state off the images and shows
        # up here as monotone energy growth
        e = np.asarray([s["e_per_res"] for s in kf_stats
                        if np.isfinite(s.get("e_per_res", np.nan))])
        assert len(e) >= 25
        assert (e >= 0.0).all(), f"photometric energy negative: {e.min():.1f}"
        assert np.median(e) < 120.0, f"median energy {np.median(e):.1f}"
        assert e[-5:].mean() < 4.0 * max(e[:5].mean(), 10.0), \
            f"energy growth {e[:5].mean():.1f} -> {e[-5:].mean():.1f}"

    def test_affine_gauge_bounded(self, long_run):
        """The common-mode affine gauge must not random-walk (regression:
        the absolute affine prior, ba/solve.py prior_offset)."""
        system, _, _ = long_run
        x = np.asarray(system.win.x)
        valid = np.asarray(system.win.frame_valid)
        assert np.abs(x[valid, 6]).max() < 0.5, f"a drift {x[valid, 6]}"
        assert np.abs(x[valid, 7]).max() < 8.0, f"b drift {x[valid, 7]}"

    def test_ate_bounded_after_many_marginalizations(self, long_run):
        system, ds, _ = long_run
        pct = _ate_pct(system, ds)
        assert pct < 8.0, f"ATE {pct:.2f}% of extent"

    def test_window_stays_bounded(self, long_run):
        system, _, _ = long_run
        n_in = sum(1 for k in system.kfs.values() if k.in_window)
        assert n_in <= CFG.window.max_kf + 1


class TestLoopClosureLongRun:
    def _run(self, with_loops: bool, n=200):
        from ldso_tpu.loop.closing import LoopClosing

        ds = SyntheticDataset(w=320, h=240, n=n, traj_kind="out_and_back",
                              seed=0)
        system = FullSystem(CFG, ds.intrinsics(), ds.w, ds.h)
        lc = None
        if with_loops:
            lc = LoopClosing(CFG, ds.intrinsics(), train_after=4)
            system.on_keyframe = lc.on_keyframe
            system.loop_closing = lc
        _drive(system, ds, n, allow_lost=True)
        return _ate_pct(system, ds), lc, system

    def test_loop_closure_reduces_drift(self):
        ate_off, _, _ = self._run(False)
        ate_on, lc, system = self._run(True)
        assert len(lc.loops_closed) >= 1, "no loop closed on revisit"
        # pose-graph correction must help (or at minimum not hurt): the
        # revisit leg accumulates scale drift that only the Sim3 loop
        # can remove
        assert ate_on <= ate_off * 1.05, \
            f"loops made ATE worse: {ate_on:.2f}% vs {ate_off:.2f}%"
