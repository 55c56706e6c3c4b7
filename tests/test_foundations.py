"""Cameras, interpolation, pyramid, photometrics, synthetic scenes, ATE."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldso_tpu import cameras
from ldso_tpu.eval import ate
from ldso_tpu.io import photometric, synthetic
from ldso_tpu.kernels import interp, pyramid
from ldso_tpu.math import lie

RNG = np.random.default_rng(1)


class TestPinhole:
    def test_project_backproject_roundtrip(self):
        intr = jnp.asarray([450.0, 450.0, 320.0, 240.0])
        uv = jnp.asarray(RNG.uniform(0, 600, size=(128, 2)))
        idepth = jnp.asarray(RNG.uniform(0.1, 2.0, size=(128,)))
        X = cameras.backproject(uv, idepth, intr)
        uv_back = cameras.project(X, intr)
        np.testing.assert_allclose(uv_back, uv, atol=1e-9)
        np.testing.assert_allclose(X[:, 2], 1.0 / idepth, atol=1e-12)

    def test_level_intrinsics(self):
        intr = jnp.asarray([400.0, 410.0, 319.5, 239.5])
        l1 = cameras.level_intrinsics(intr, 1)
        np.testing.assert_allclose(l1, [200.0, 205.0, 159.5, 119.5], atol=1e-6)


class TestDistortion:
    @pytest.mark.parametrize(
        "model,params",
        [
            ("fov", (0.9,)),
            ("radtan", (-0.28, 0.07, 0.0002, 0.00002)),
            ("equidistant", (-0.01, 0.02, -0.005, 0.001)),
        ],
    )
    def test_remap_undistorts(self, model, params):
        """An undistorted image of a distorted straight-edge scene: verify the
        remap inverts the distortion on synthetic normalized points."""
        w, h = 320, 240
        intr_in = (260.0, 260.0, 159.5, 119.5)
        calib = cameras.CameraCalib(model, (w, h), intr_in, params, (w, h), (200.0, 200.0, 159.5, 119.5))
        remap = cameras.make_remap(calib)
        assert remap.shape == (h, w, 2)
        # center pixel of output maps near distortion center of input
        cu, cv = remap[120, 160]
        assert abs(cu - 159.5) < 2.0 and abs(cv - 119.5) < 2.0
        # valid fraction is sane
        assert (remap[..., 0] >= 0).mean() > 0.5

    def test_crop_mode_all_inside(self):
        w, h = 320, 240
        intr_in = (260.0, 260.0, 159.5, 119.5)
        params = (0.9,)
        out_intr = cameras.find_crop_intrinsics("fov", (w, h), intr_in, params, (w, h))
        calib = cameras.CameraCalib("fov", (w, h), intr_in, params, (w, h), out_intr)
        remap = cameras.make_remap(calib)
        assert (remap[..., 0] >= 0).all(), "crop mode must keep every output pixel valid"

    def test_parse_calib_text_fov(self):
        txt = "0.5 0.8 0.5 0.5 0.9\n640 480\ncrop\n512 384\n"
        c = cameras.parse_calib_text(txt)
        assert c.model == "fov"
        assert c.in_size == (640, 480)
        assert c.out_size == (512, 384)
        assert c.in_intr[0] == pytest.approx(0.5 * 640)

    def test_parse_calib_text_pinhole_full(self):
        txt = "300 300 160 120\n320 240\nfull\n320 240\n"
        c = cameras.parse_calib_text(txt)
        assert c.model == "pinhole"
        assert c.out_intr[0] == pytest.approx(300.0)


class TestInterp:
    def test_bilinear_exact_on_linear_image(self):
        h, w = 32, 48
        vv, uu = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        img = jnp.asarray(2.0 * uu + 3.0 * vv + 1.0, dtype=jnp.float32)
        uv = jnp.asarray(RNG.uniform(1, 30, size=(256, 2)))
        got = interp.bilinear(img, uv)
        want = 2.0 * uv[:, 0] + 3.0 * uv[:, 1] + 1.0
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_bilinear_multichannel(self):
        img = jnp.asarray(RNG.normal(size=(16, 16, 3)), dtype=jnp.float32)
        uv = jnp.asarray([[3.0, 4.0]])
        np.testing.assert_allclose(interp.bilinear(img, uv)[0], img[4, 3], atol=1e-6)

    def test_in_bounds(self):
        uv = jnp.asarray([[1.5, 1.5], [0.5, 5.0], [30.5, 5.0], [5.0, 5.0]])
        mask = interp.in_bounds(uv, 32, 32, border=1.0)
        assert list(np.asarray(mask)) == [True, False, False, True]

    def test_vs_scipy(self):
        from scipy.ndimage import map_coordinates

        img = RNG.normal(size=(64, 64)).astype(np.float32)
        uv = RNG.uniform(2, 60, size=(100, 2))
        got = interp.bilinear(jnp.asarray(img), jnp.asarray(uv))
        want = map_coordinates(img, [uv[:, 1], uv[:, 0]], order=1)
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestPyramid:
    def test_shapes_and_downsample(self):
        img = jnp.asarray(RNG.normal(size=(64, 96)), dtype=jnp.float32)
        pyr, gsq = pyramid.build_pyramid(img, 4)
        assert [p.shape for p in pyr] == [(64, 96, 3), (32, 48, 3), (16, 24, 3), (8, 12, 3)]
        # downsample = 2x2 mean
        np.testing.assert_allclose(
            pyr[1][..., 0], np.asarray(img).reshape(32, 2, 48, 2).mean(axis=(1, 3)), atol=1e-6
        )

    def test_gradients_on_ramp(self):
        vv, uu = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
        img = jnp.asarray(3.0 * uu - 2.0 * vv, dtype=jnp.float32)
        pyr, gsq = pyramid.build_pyramid(img, 1)
        np.testing.assert_allclose(pyr[0][1:-1, 1:-1, 1], 3.0, atol=1e-5)
        np.testing.assert_allclose(pyr[0][1:-1, 1:-1, 2], -2.0, atol=1e-5)
        np.testing.assert_allclose(gsq[0][1:-1, 1:-1], 13.0, atol=1e-4)

    def test_crop_to_multiple(self):
        img = jnp.zeros((61, 95))
        out = pyramid.crop_to_multiple(img, 4)
        assert out.shape == (56, 88)


class TestPhotometric:
    def test_identity(self):
        raw = jnp.asarray(RNG.uniform(0, 255, size=(24, 24)), dtype=jnp.float32)
        out = photometric.apply_photometric(raw, None, None)
        np.testing.assert_allclose(out, raw)

    def test_lut_and_vignette(self):
        lut = np.linspace(0, 255, 256).astype(np.float32) ** 1.2
        lut = lut / lut.max() * 255.0
        vignette = np.ones((8, 8))
        vignette[0, 0] = 0.5  # attenuated corner (max-normalization keeps the rest at 1)
        calib = photometric.PhotometricCalib.from_arrays(lut, vignette)
        fn = photometric.make_photometric_fn(calib)
        raw = jnp.full((8, 8), 128, dtype=jnp.uint8)
        out = fn(raw)
        # vignette 0.5 at the corner → doubles the response output there
        assert abs(float(out[0, 0]) / float(calib.inv_response[128]) - 2.0) < 1e-3
        assert abs(float(out[4, 4]) / float(calib.inv_response[128]) - 1.0) < 1e-3

    def test_float_input_fractional_lut(self):
        lut = np.linspace(0, 255, 256).astype(np.float32)
        calib = photometric.PhotometricCalib.from_arrays(lut, None)
        out = photometric.apply_photometric(
            jnp.asarray([[100.5]]), jnp.asarray(calib.inv_response), None
        )
        assert abs(float(out[0, 0]) - 100.5) < 1e-3


class TestSynthetic:
    def test_render_consistency(self):
        """Warp frame i's pixels into frame j via GT pose+depth: photometric
        error must be small (validates renderer geometry end-to-end)."""
        ds = synthetic.SyntheticDataset(w=256, h=192, n=4)
        img0, _, _ = ds.get_image(0)
        img1, _, _ = ds.get_image(1)
        idep0 = ds.get_idepth(0)
        intr = jnp.asarray(ds.intrinsics())

        T_10 = jnp.asarray(ds.gt_pose_c_w(1) @ ds.poses_w_c[0], dtype=jnp.float64)

        vv, uu = np.meshgrid(np.arange(192), np.arange(256), indexing="ij")
        sel = (idep0 > 1e-3) & (uu % 4 == 0) & (vv % 4 == 0)
        uv0 = jnp.asarray(np.stack([uu[sel], vv[sel]], axis=-1), dtype=jnp.float64)
        X0 = cameras.backproject(uv0, jnp.asarray(idep0[sel]), intr)
        X1 = (T_10[:3, :3] @ X0.T).T + T_10[:3, 3]
        uv1 = cameras.project(X1, intr)
        ok = np.asarray(interp.in_bounds(uv1, 256, 192, 2.0)) & (np.asarray(X1[:, 2]) > 0.05)
        i0 = np.asarray(img0)[sel][ok]
        i1 = np.asarray(interp.bilinear(jnp.asarray(img1), uv1))[ok]
        # occlusions at plane seams cause outliers; median abs error must be tiny
        med = np.median(np.abs(i0 - i1))
        assert med < 2.0, f"median photometric consistency {med}"
        assert ok.mean() > 0.5

    def test_texture_has_gradient(self):
        ds = synthetic.SyntheticDataset(w=128, h=96, n=1)
        img, _, _ = ds.get_image(0)
        g = np.abs(np.diff(img, axis=1)).mean()
        assert g > 1.0, "texture too flat for direct tracking"


class TestATE:
    def test_umeyama_recovers_sim3(self):
        src = RNG.normal(size=(40, 3))
        R = np.asarray(lie.so3_exp(jnp.asarray([0.2, -0.1, 0.4])))
        s, t = 1.7, np.asarray([1.0, -2.0, 0.5])
        dst = (s * (R @ src.T)).T + t
        s2, R2, t2 = ate.umeyama(src, dst)
        assert abs(s2 - s) < 1e-9
        np.testing.assert_allclose(R2, R, atol=1e-9)
        np.testing.assert_allclose(t2, t, atol=1e-9)
        rmse, _ = ate.ate_rmse(src, dst)
        assert rmse < 1e-9

    def test_tum_io_roundtrip(self, tmp_path):
        n = 10
        poses = []
        for i in range(n):
            T = np.asarray(lie.se3_exp(jnp.asarray(RNG.normal(size=6) * 0.3)), dtype=np.float64)
            poses.append(T)
        path = str(tmp_path / "traj.txt")
        ate.write_tum_trajectory(path, np.arange(n, dtype=float), np.stack(poses))
        ts, pos, quat = ate.read_tum_trajectory(path)
        assert ts.shape == (n,)
        for i in range(n):
            Twc = np.linalg.inv(poses[i])
            np.testing.assert_allclose(pos[i], Twc[:3, 3], atol=1e-5)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
