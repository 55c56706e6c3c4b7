"""Dataset-format end-to-end fixtures (round-2 gaps #7/#8).

The reference's primary benchmark input is the TUM-monoVO layout —
images.zip + times.txt (with exposures) + camera.txt (FOV model) +
pcalib.txt + vignette.png (reference: examples/run_dso_tum_mono.cc +
Undistort::getUndistorterForFile + PhotometricUndistorter). Nothing in
rounds 1-2 ever drove that full chain; these tests generate a synthetic
TUM-layout dataset on disk — images rendered through a REAL FOV
distortion warp, a gamma response, a radial vignette, and per-frame
exposures — and drive it through the CLI into FullSystem.

Also: strict EuRoC sensor.yaml parsing (malformed files must raise, not
fall back to baked defaults) and the radtan crop path on a fixture.
"""

import os
import zipfile

import numpy as np
import pytest

from test_native import encode_png_gray

GAMMA = 2.2


def _g_inv(p):
    """Inverse response G⁻¹: pixel value -> irradiance (pcalib.txt)."""
    return 255.0 * (np.asarray(p, np.float64) / 255.0) ** GAMMA


def _g(i):
    """Camera response G: irradiance -> pixel value."""
    return 255.0 * np.clip(np.asarray(i, np.float64) / 255.0, 0, 1) ** (1 / GAMMA)


def _radial_vignette(w, h, floor=0.72):
    u, v = np.meshgrid(np.arange(w), np.arange(h))
    r = np.hypot(u - w / 2 + 0.5, v - h / 2 + 0.5)
    return 1.0 - (1.0 - floor) * (r / r.max()) ** 2


def _fov_distorted_view(render, f, cx_r, cy_r, w, h, omega):
    """Produce the RAW (FOV-distorted) image a real ATAN-lens camera
    with intrinsics (f, f, w/2-.5, h/2-.5) would capture of the clean
    pinhole render. Closed-form FOV undistort per raw pixel:
    r_u = tan(r_d·ω) / (2·tan(ω/2))."""
    from scipy.ndimage import map_coordinates

    cx, cy = w / 2 - 0.5, h / 2 - 0.5
    ud, vd = np.meshgrid(np.arange(w, dtype=np.float64),
                         np.arange(h, dtype=np.float64))
    xd, yd = (ud - cx) / f, (vd - cy) / f
    r_d = np.hypot(xd, yd)
    r_u = np.tan(r_d * omega) / (2.0 * np.tan(omega / 2.0))
    s = np.where(r_d < 1e-9, 1.0, r_u / np.maximum(r_d, 1e-12))
    su = f * xd * s + cx_r
    sv = f * yd * s + cy_r
    return map_coordinates(render, [sv, su], order=1, mode="nearest")


def make_tum_fixture(root, n=45, w=320, h=240, omega=0.5,
                     with_distortion=True, seed=3):
    """Synthetic TUM-monoVO dataset on disk; returns (dir, ds_gt)."""
    from ldso_tpu.io.synthetic import SyntheticDataset

    os.makedirs(root, exist_ok=True)
    f = 0.88 * w
    # render a LARGER clean view so the undistortion's wider field stays
    # inside valid pixels (no border clamp junk in the raw images)
    wr, hr = w + 80, h + 60
    ds = SyntheticDataset(w=wr, h=hr, n=n, fov_focal=f, seed=seed,
                          scene_kind="corridor", traj_kind="forward_arc",
                          supersample=1)
    vig = _radial_vignette(w, h)
    expo = 1.0 + 0.1 * np.sin(0.4 * np.arange(n))

    zpath = os.path.join(root, "images.zip")
    rows = []
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_STORED) as zf:
        for i in range(n):
            render, ts, _ = ds.get_image(i)
            if with_distortion:
                raw_irr = _fov_distorted_view(
                    np.asarray(render, np.float64), f,
                    wr / 2 - 0.5, hr / 2 - 0.5, w, h, omega)
            else:
                y0, x0 = (hr - h) // 2, (wr - w) // 2
                raw_irr = np.asarray(render, np.float64)[y0:y0 + h, x0:x0 + w]
            px = np.clip(np.round(_g(raw_irr * expo[i] * vig)), 0, 255)
            zf.writestr(f"{i:05d}.png", encode_png_gray(px.astype(np.uint8)))
            rows.append(f"{i:05d} {ts:.6f} {expo[i]:.6f}")

    with open(os.path.join(root, "times.txt"), "w") as fh:
        fh.write("\n".join(rows) + "\n")
    with open(os.path.join(root, "camera.txt"), "w") as fh:
        if with_distortion:
            fh.write(f"0.88 {f / h:.8f} 0.5 0.5 {omega}\n")
        else:
            fh.write(f"0.88 {f / h:.8f} 0.5 0.5\n")
        fh.write(f"{w} {h}\ncrop\n{w} {h}\n")
    with open(os.path.join(root, "pcalib.txt"), "w") as fh:
        fh.write(" ".join(f"{v:.6f}" for v in _g_inv(np.arange(256))) + "\n")
    with open(os.path.join(root, "vignette.png"), "wb") as fh:
        fh.write(encode_png_gray(np.round(vig * 255).astype(np.uint8)))
    return root, ds


class TestTumPhotometricChain:
    def test_reader_recovers_irradiance(self, tmp_path):
        """Identity geometry: G⁻¹/vignette/exposure chain alone must
        reproduce the rendered irradiance to quantization accuracy
        (reference: PhotometricUndistorter::processFrame semantics —
        output is irradiance·exposure)."""
        from ldso_tpu.io.datasets import TumMonoDataset
        from ldso_tpu.io.synthetic import SyntheticDataset

        root, ds_gt = make_tum_fixture(str(tmp_path), n=3,
                                       with_distortion=False)
        reader = TumMonoDataset(root)
        assert reader.num_frames == 3
        f = 0.88 * 320
        clean = SyntheticDataset(w=400, h=300, n=3, fov_focal=f, seed=3,
                                 scene_kind="corridor",
                                 traj_kind="forward_arc", supersample=1)
        for i in range(3):
            img, ts, expo = reader.get_image(i)
            render, _, _ = clean.get_image(i)
            want = np.asarray(render, np.float64)[30:270, 40:360] * expo
            # 8-bit quantization through the gamma curve costs up to
            # dG⁻¹/dp ≈ γ levels at the bright end
            err = np.abs(img - want)
            assert np.median(err) < 1.5 and np.percentile(err, 99) < 6.0, \
                f"frame {i}: median {np.median(err):.2f} p99 {np.percentile(err, 99):.2f}"
            assert expo == pytest.approx(1.0 + 0.1 * np.sin(0.4 * i), abs=1e-5)

    def test_cli_runs_tum_fixture_end_to_end(self, tmp_path):
        """The reference's primary input format through the whole engine:
        TUM zip + FOV undistortion (crop mode) + response/vignette/
        exposure chain -> FullSystem tracks the sequence with bounded
        ATE (reference: examples/run_dso_tum_mono.cc main loop)."""
        from ldso_tpu import cli
        from ldso_tpu.eval.ate import ate_rmse, read_tum_trajectory

        root, ds_gt = make_tum_fixture(str(tmp_path), n=45)
        out = os.path.join(str(tmp_path), "traj.txt")
        rc = cli.main(["run", "--dataset", "tum", "--path", root,
                       "--preset", "tiny", "--loop-closing", "0",
                       "--output", out])
        assert rc == 0
        ts, pos, quat = read_tum_trajectory(out)
        assert len(ts) >= 35, f"only {len(ts)} poses exported"
        assert np.isfinite(pos).all()
        # ATE vs the renderer ground truth (scale-aligned, monocular)
        gt_c = np.stack(
            [ds_gt.poses_w_c[int(round(t / 0.05))][:3, 3] for t in ts])
        rmse, _ = ate_rmse(pos, gt_c, with_scale=True)
        extent = np.linalg.norm(gt_c.max(0) - gt_c.min(0))
        assert rmse < 0.15 * extent, \
            f"ATE {rmse:.3f} vs extent {extent:.3f}"


class TestEurocStrictParsing:
    YAML_OK = """
cam0:
  T_BS:
    data: [1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1]
rate_hz: 20
resolution: [64, 48]
camera_model: pinhole
intrinsics: [40.0, 40.0, 31.5, 23.5]
distortion_model: radial-tangential
distortion_coefficients: [-0.28, 0.07, 0.0002, 0.00002]
"""

    def _fixture(self, tmp_path, yaml_text):
        cam = tmp_path / "mav0" / "cam0"
        (cam / "data").mkdir(parents=True)
        rng = np.random.default_rng(0)
        rows = ["#timestamp [ns],filename"]
        for i in range(2):
            name = f"{1403636579763555584 + i * 50000000}.png"
            img = rng.integers(0, 256, (48, 64), np.uint8)
            (cam / "data" / name).write_bytes(encode_png_gray(img))
            rows.append(f"{name[:-4]},{name}")
        (cam / "data.csv").write_text("\n".join(rows) + "\n")
        (cam / "sensor.yaml").write_text(yaml_text)
        return str(tmp_path)

    def test_valid_yaml_radtan_crop(self, tmp_path):
        from ldso_tpu.io.datasets import EurocDataset

        ds = EurocDataset(self._fixture(tmp_path, self.YAML_OK))
        assert ds.calib.model == "radtan"
        assert ds.calib.in_intr == (40.0, 40.0, 31.5, 23.5)
        assert ds.calib.in_size == (64, 48)
        img, ts, _ = ds.get_image(0)
        assert img.shape == (48, 64) and np.isfinite(img).all()
        # the crop intrinsics must differ from the raw ones (radtan crop
        # path actually exercised) yet stay plausible
        assert ds.calib.out_intr != ds.calib.in_intr
        assert 10.0 < ds.calib.out_intr[0] < 200.0

    def test_missing_field_raises(self, tmp_path):
        from ldso_tpu.io.datasets import EurocDataset

        bad = self.YAML_OK.replace("intrinsics:", "intrinsics_gone:")
        with pytest.raises(ValueError, match="intrinsics"):
            EurocDataset(self._fixture(tmp_path, bad))

    def test_wrong_arity_raises(self, tmp_path):
        from ldso_tpu.io.datasets import EurocDataset

        bad = self.YAML_OK.replace("[-0.28, 0.07, 0.0002, 0.00002]",
                                   "[-0.28, 0.07]")
        with pytest.raises(ValueError, match="distortion_coefficients"):
            EurocDataset(self._fixture(tmp_path, bad))

    def test_unsupported_model_raises(self, tmp_path):
        from ldso_tpu.io.datasets import EurocDataset

        bad = self.YAML_OK.replace("radial-tangential", "equidistant")
        with pytest.raises(ValueError, match="distortion model"):
            EurocDataset(self._fixture(tmp_path, bad))
