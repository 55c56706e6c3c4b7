"""Loop-closure stack tests: ORB features, Hamming matching, BoW
vocabulary + database, batched Sim3 RANSAC/refine, Sim3 pose graph.

The reference has no tests (SURVEY.md §4); these validate each loop
component against ground truth the way its de-facto behavior demands:
matching must be identity on self-pairs, BoW must rank the same place
above different places, Sim3 must be recovered from noisy 3D-2D
correspondences with outliers, and the pose graph must pull a drifted
trajectory back onto ground truth given exact relative measurements.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldso_tpu.io.synthetic import SyntheticDataset
from ldso_tpu.kernels.pyramid import build_pyramid
from ldso_tpu.loop import bow, match, orb, posegraph, sim3
from ldso_tpu.math import lie


def _image(i=0, w=256, h=192, **kw):
    ds = SyntheticDataset(w=w, h=h, n=max(i + 1, 2), **kw)
    img, _, _ = ds.get_image(i)
    pyr, _ = build_pyramid(jnp.asarray(img), 4)
    return ds, pyr


class TestORB:
    def test_detect_finds_corners(self):
        _, pyr = _image()
        f = orb.detect(pyr[0], max_features=256)
        assert int(f.valid.sum()) > 100
        assert f.desc.shape == (256, 32)
        assert f.desc.dtype == jnp.uint8
        # descriptors are non-degenerate: not all identical
        d = np.asarray(f.desc)[np.asarray(f.valid)]
        assert len(np.unique(d, axis=0)) > len(d) // 2

    def test_fast_score_on_synthetic_corner(self):
        img = np.full((64, 64), 100.0, np.float32)
        img[20:, 20:] = 200.0  # bright quadrant => corner at (20, 20)
        s = np.asarray(orb.fast_score(jnp.asarray(img), threshold=20.0))
        cy, cx = np.unravel_index(s.argmax(), s.shape)
        assert abs(cy - 20) <= 3 and abs(cx - 20) <= 3

    def test_descriptor_repeatability_under_rotation(self):
        # in-plane rotation by 90°: orientation normalization keeps the
        # descriptor of the same physical corner close in Hamming space
        _, pyr = _image()
        img = np.asarray(pyr[0][..., 0])
        h, w = img.shape
        rot = np.rot90(img).copy()  # (u,v) -> (v, w-1-u)
        from ldso_tpu.kernels.pyramid import build_pyramid as bp
        pyr_r, _ = bp(jnp.asarray(rot), 1)
        f0 = orb.detect(pyr[0], max_features=128)
        uv0 = np.asarray(f0.uv)
        uv_r = np.stack([uv0[:, 1], (w - 1) - uv0[:, 0]], axis=-1)
        a_r = orb._orientation(pyr_r[0][..., 0], jnp.asarray(uv_r))
        d_r = orb._brief(pyr_r[0][..., 0], jnp.asarray(uv_r), a_r)
        dist = np.asarray(match.hamming_matrix(f0.desc, d_r))
        diag = np.diag(dist)[np.asarray(f0.valid)]
        assert np.median(diag) < 80  # ≪ 128 (random would be ~128)


class TestMatch:
    def test_self_match_is_identity(self):
        _, pyr = _image()
        f = orb.detect(pyr[0], max_features=256)
        m = match.match(f.desc, f.valid, f.desc, f.valid, ratio=1.0)
        idx = np.asarray(m.idx_b)
        ok = np.asarray(m.valid)
        assert ok.sum() > 100
        assert (idx[ok] == np.flatnonzero(np.ones_like(idx))[ok]).all()

    def test_hamming_matrix_matches_numpy(self):
        rng = np.random.default_rng(0)
        a = rng.integers(0, 256, size=(17, 32), dtype=np.uint8)
        b = rng.integers(0, 256, size=(23, 32), dtype=np.uint8)
        d = np.asarray(match.hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
        ref = np.zeros((17, 23))
        for i in range(17):
            for j in range(23):
                ref[i, j] = bin(int.from_bytes(bytes(a[i] ^ b[j]), "big")).count("1")
        np.testing.assert_allclose(d, ref, atol=0.5)


class TestBoW:
    def _feats(self, i, **kw):
        _, pyr = _image(i, **kw)
        return orb.detect(pyr[0], max_features=256)

    def test_same_place_scores_higher(self):
        f0 = self._feats(0)
        f0b = self._feats(1)            # next frame, nearly same view
        f_far = self._feats(0, seed=5)  # different scene
        descs = np.concatenate([np.asarray(f.desc) for f in (f0, f0b, f_far)])
        vocab = bow.train_vocabulary(descs, k=6, levels=3, seed=0)
        v0 = bow.bow_vector(vocab, f0.desc, f0.valid)
        v0b = bow.bow_vector(vocab, f0b.desc, f0b.valid)
        vf = bow.bow_vector(vocab, f_far.desc, f_far.valid)
        s_same = float(bow.l1_score(v0, v0b))
        s_diff = float(bow.l1_score(v0, vf))
        assert s_same > s_diff + 0.05

    def test_database_query_ranks_revisit_first(self):
        f0 = self._feats(0)
        f1 = self._feats(1)
        f_far = self._feats(0, seed=5)
        descs = np.concatenate([np.asarray(f.desc) for f in (f0, f1, f_far)])
        vocab = bow.train_vocabulary(descs, k=6, levels=3, seed=0)
        db = bow.KeyframeDatabase(vocab)
        db.add(0, bow.bow_vector(vocab, f0.desc, f0.valid))
        db.add(1, bow.bow_vector(vocab, f_far.desc, f_far.valid))
        ids, scores = db.query(bow.bow_vector(vocab, f1.desc, f1.valid))
        assert ids[scores.argmax()] == 0


class TestSim3:
    def _make_problem(self, n=80, outlier_frac=0.25, noise=0.3, seed=3):
        rng = np.random.default_rng(seed)
        intr = np.asarray([300.0, 300.0, 160.0, 120.0], np.float32)
        # ground-truth Sim3 a<-b
        tau = np.asarray([0.3, -0.2, 0.4, 0.1, -0.2, 0.15, np.log(1.3)])
        S_ab = np.asarray(lie.sim3_exp(jnp.asarray(tau)))
        X_b = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                        rng.uniform(2.0, 8.0, n)], axis=-1)
        X_a = (S_ab[:3, :3] @ X_b.T).T + S_ab[:3, 3]

        def proj(X):
            return np.stack([intr[0] * X[:, 0] / X[:, 2] + intr[2],
                             intr[1] * X[:, 1] / X[:, 2] + intr[3]], axis=-1)

        uv_a = proj(X_a) + rng.normal(0, noise, (n, 2))
        uv_b = proj(X_b) + rng.normal(0, noise, (n, 2))
        n_out = int(outlier_frac * n)
        X_b_noisy = X_b.copy()
        X_b_noisy[:n_out] += rng.uniform(-3, 3, (n_out, 3))
        return (intr, S_ab,
                jnp.asarray(X_a, jnp.float32), jnp.asarray(uv_a, jnp.float32),
                jnp.asarray(X_b_noisy, jnp.float32), jnp.asarray(uv_b, jnp.float32))

    def test_umeyama_exact(self):
        intr, S_gt, X_a, uv_a, X_b, uv_b = self._make_problem(outlier_frac=0.0,
                                                              noise=0.0)
        S = np.asarray(sim3.umeyama_sim3(X_a[None], X_b[None]))[0]
        np.testing.assert_allclose(S, S_gt, atol=1e-3)

    def test_ransac_with_outliers(self):
        intr, S_gt, X_a, uv_a, X_b, uv_b = self._make_problem()
        key = jax.random.PRNGKey(0)
        r = sim3.ransac_sim3(X_a, uv_a, X_b, uv_b,
                             jnp.ones(X_a.shape[0], bool),
                             jnp.asarray(intr), key, n_hyps=128, threshold=4.0)
        assert int(r.n_inliers) >= 50
        rf = sim3.refine_sim3(r.S_ab, X_a, uv_a, X_b, uv_b, r.inliers,
                              jnp.ones(X_a.shape[0], bool), jnp.asarray(intr))
        err = np.asarray(lie.sim3_log(
            lie.sim3_mul(lie.sim3_inverse(jnp.asarray(S_gt, jnp.float32)),
                         rf.S_ab)))
        assert np.linalg.norm(err) < 0.05
        # scale recovered
        assert abs(float(lie.sim3_scale(rf.S_ab)) - 1.3) < 0.05


class TestPoseGraph:
    def test_drifted_circle_recovers(self):
        rng = np.random.default_rng(0)
        K = 24
        # ground-truth poses on a circle (worldToCam)
        gt = []
        for i in range(K):
            th = 2 * np.pi * i / K
            Twc = np.eye(4)
            Twc[:3, :3] = np.asarray(lie.so3_exp(jnp.asarray([0.0, th, 0.0])))
            Twc[:3, 3] = [2 * np.sin(th), 0.0, 2 * (1 - np.cos(th))]
            gt.append(np.linalg.inv(Twc))
        gt = np.stack(gt)

        # drifted initialization: accumulate noisy increments
        S = [gt[0]]
        for i in range(1, K):
            inc = gt[i] @ np.linalg.inv(gt[i - 1])
            noise = np.asarray(lie.sim3_exp(jnp.asarray(
                np.concatenate([rng.normal(0, 0.02, 6), [rng.normal(0, 0.01)]]))))
            S.append(noise @ inc @ S[-1])
        S = np.stack(S)

        # exact odometry edges + one exact loop edge (K-1 -> 0)
        edges = [(i, i - 1, gt[i] @ np.linalg.inv(gt[i - 1])) for i in range(1, K)]
        edges.append((K - 1, 0, gt[K - 1] @ np.linalg.inv(gt[0])))
        E = len(edges)
        ei = np.asarray([e[0] for e in edges], np.int32)
        ej = np.asarray([e[1] for e in edges], np.int32)
        S_meas = np.stack([e[2] for e in edges])
        w = np.ones(E)
        fixed = np.zeros(K, bool)
        fixed[0] = True

        out = posegraph.optimize_pose_graph(
            jnp.asarray(S), jnp.asarray(ei), jnp.asarray(ej),
            jnp.asarray(S_meas), jnp.asarray(w), jnp.asarray(fixed),
            lm_iters=15, cg_iters=80)
        S_opt = np.asarray(out.S)

        def traj_err(Ss):
            c_est = np.stack([-(P[:3, :3].T / lie_scale(P)) @ P[:3, 3] for P in Ss])
            c_gt = np.stack([-(P[:3, :3].T) @ P[:3, 3] for P in gt])
            return np.linalg.norm(c_est - c_gt, axis=1).mean()

        def lie_scale(P):
            return np.linalg.norm(P[0, :3])

        assert traj_err(S_opt) < 0.05
        assert traj_err(S_opt) < 0.2 * traj_err(S)


class TestVocabularyConverter:
    """DBoW text-format converter (reference ships vocab/orbvoc.dbow3;
    SURVEY Appendix B requires an offline converter + trainer)."""

    def _train_small(self, seed=0):
        rng = np.random.default_rng(seed)
        desc = rng.integers(0, 256, size=(600, 32), dtype=np.uint8)
        return bow.train_vocabulary(desc, k=4, levels=3, seed=seed), desc

    def test_text_roundtrip_preserves_assignment_and_scores(self):
        vocab, desc = self._train_small()
        text = bow.save_vocabulary_text(vocab)
        vocab2 = bow.load_vocabulary_text(text)
        assert vocab2.k == vocab.k and vocab2.levels == vocab.levels
        q = jnp.asarray(desc[:64])
        ok = jnp.ones(64, bool)
        l1, _ = bow.assign_leaves(vocab, q, ok)
        l2, _ = bow.assign_leaves(vocab2, q, ok)
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
        v1 = bow.bow_vector(vocab, q, ok)
        v2 = bow.bow_vector(vocab2, q, ok)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-5)

    def test_foreign_vocab_with_early_leaves_and_truncation(self):
        # hand-built DBoW text tree: k=2, L=3, one branch ends early
        rng = np.random.default_rng(1)
        d = [" ".join(str(x) for x in rng.integers(0, 256, 32))
             for _ in range(16)]
        lines = ["2 3 0 0"]
        # root children: nodes 1, 2
        lines.append(f"0 0 {d[0]} 0")      # node 1 (internal)
        lines.append(f"0 1 {d[1]} 0.5")    # node 2: EARLY leaf at level 0
        # node 1 children: 3 (internal), 4 (leaf at level 1)
        lines.append(f"1 0 {d[2]} 0")      # node 3
        lines.append(f"1 1 {d[3]} 0.25")   # node 4: early leaf
        # node 3 children: leaves at level 2
        lines.append(f"3 1 {d[4]} 0.75")   # node 5
        lines.append(f"3 1 {d[5]} 1.25")   # node 6
        vocab = bow.load_vocabulary_text("\n".join(lines))
        assert vocab.k == 2 and vocab.levels == 3
        idf = np.asarray(vocab.idf)
        assert idf.sum() > 0
        # every valid leaf got a weight; early leaves propagated down
        q = jnp.asarray(rng.integers(0, 256, size=(8, 32), dtype=np.uint8))
        leaves, _ = bow.assign_leaves(vocab, q, jnp.ones(8, bool))
        assert np.all(np.asarray(vocab.table_valid[-1])[np.asarray(leaves)])

        # truncation to 2 levels folds subtree weights into level-1 leaves
        v2 = bow.load_vocabulary_text("\n".join(lines), truncate_levels=2)
        assert v2.levels == 2
        assert np.isclose(np.asarray(v2.idf).sum(), idf.sum(), atol=1e-5)
