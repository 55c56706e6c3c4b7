"""Two-frame monocular bootstrap on synthetic sequences."""

import jax.numpy as jnp
import numpy as np
import pytest

from ldso_tpu.config import preset
from ldso_tpu.init2f import CoarseInitializer
from ldso_tpu.io import synthetic
from ldso_tpu.kernels import pyramid
from ldso_tpu.math import lie

CFG = preset("tiny")
LEVELS = CFG.shapes.pyr_levels


class TestInitializer:
    def test_bootstrap_recovers_structure(self):
        n = 10
        ds = synthetic.SyntheticDataset(w=256, h=192, n=n, seed=2)
        ds.poses_w_c = synthetic.trajectory(n, "forward_arc", step=0.08)
        ds._cache = {}
        pyrs = []
        for i in range(n):
            img, _, _ = ds.get_image(i)
            pyrs.append(pyramid.build_pyramid(jnp.asarray(img), LEVELS))

        init = CoarseInitializer(CFG, ds.intrinsics())
        init.set_first(pyrs[0][0], pyrs[0][1])
        done = False
        status = None
        for i in range(1, n):
            status = init.track(pyrs[i][0])
            if status["done"]:
                done = True
                last = i
                break
        assert status is not None and status["snapped"], f"never snapped: {status}"
        assert done, f"never finished init: {status}"
        assert status["n_good"] > CFG.shapes.init_points * 0.4

        res = init.results()
        # pose direction check (scale-free): translation direction vs GT
        T_gt = ds.gt_pose_c_w(last) @ ds.poses_w_c[0]
        t_est = res["T_first_to_new"][:3, 3]
        t_gt = T_gt[:3, 3]
        cos = float(t_est @ t_gt / (np.linalg.norm(t_est) * np.linalg.norm(t_gt) + 1e-12))
        assert cos > 0.98, f"translation direction cos {cos}"
        rot_err = np.linalg.norm(np.asarray(lie.se3_log(jnp.asarray(
            res["T_first_to_new"] @ np.linalg.inv(
                np.diag([1.0, 1, 1, 1]) @ T_gt), jnp.float64)))[3:])
        # rotation is scale-free; must match well
        assert rot_err < 0.02, f"rotation error {rot_err}"

        # idepth field correlates with GT (up to the global scale, which is
        # normalized to mean idepth 1)
        idep_gt = ds.get_idepth(0)
        uv = res["uv"].astype(int)
        good = res["good"]
        gt = idep_gt[uv[:, 1], uv[:, 0]]
        ok = good & (gt > 1e-3)
        est = res["idepth"][ok]
        gtv = gt[ok]
        s = np.median(gtv / est)
        rel = np.abs(est * s - gtv) / gtv
        assert np.median(rel) < 0.15, f"median structure err {np.median(rel)}"


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
